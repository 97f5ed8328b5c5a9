"""sv1_ query-string codec for the Filter AST and ProjectionQuery.

Wire-format spec (reference, read-only):
  - separators:  CloudFabric.Projections/Queries/ProjectionQueryQueryStringExtensions.cs:5-31
       top-level filters joined by '!', filter fields by '|', connector logic
       joined to its filter by '$', nested connector list joined by '.'
  - filter field order: property|operator|value|visible|tag|nested
       CloudFabric.Projections/Queries/FilterQueryStringExtensions.cs:32-81
  - value sanitization map (applied before URL-encoding):
       . -> ;dot;   & -> ;amp;   ! -> ;excl;   $ -> ;dollar;   ' -> ;aps;
       FilterQueryStringExtensions.cs:13-30
  - string values are wrapped in single quotes; non-strings parsed back via
    the priority ladder bool -> int64 -> int32 -> decimal -> datetime(UTC)
    -> uuid (FilterQueryStringExtensions.cs:143-186)
  - version prefix "sv1_" (ProjectionQueryQueryStringExtensions.cs:70-110)
  - orderBy: "key order" pairs joined by ','  (:113-147)

Documented divergence: the reference strips *all* apostrophes from quoted
string values on deserialize (FilterQueryStringExtensions.cs:146-149 runs
Desanitize before unquoting), losing embedded apostrophes. This codec strips
only the outer quotes and then desanitizes, so embedded apostrophes
round-trip; wire format is identical for values without apostrophes.
"""

from __future__ import annotations

import datetime
import decimal
import re
import urllib.parse
import uuid
from typing import Optional

from cloudfabric_eventsourcing_spark.queries.filters import Filter, FilterConnector
from cloudfabric_eventsourcing_spark.queries.projection_query import (
    ProjectionQuery,
    SortInfo,
)

FILTERS_JOIN = "!"
FIELD_JOIN = "|"
LOGIC_JOIN = "$"
NESTED_JOIN = "."
VERSION_PREFIX = "sv1_"

_SANITIZE = ((".", ";dot;"), ("&", ";amp;"), ("!", ";excl;"), ("$", ";dollar;"), ("'", ";aps;"))


def sanitize_value(value: str) -> str:
    for raw, token in _SANITIZE:
        value = value.replace(raw, token)
    return value


def _desanitize_tokens(value: str) -> str:
    for raw, token in _SANITIZE:
        value = value.replace(token, raw)
    return value


def desanitize_value(value: str) -> str:
    return _desanitize_tokens(urllib.parse.unquote_plus(value))


def _value_to_wire(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        serialized = "True" if v else "False"  # .NET bool.ToString()
    elif isinstance(v, datetime.datetime):
        serialized = v.isoformat(sep=" ")
    else:
        serialized = str(v)
    serialized = sanitize_value(serialized)
    if isinstance(v, str):
        serialized = f"'{serialized}'"
    return urllib.parse.quote_plus(serialized)


def _value_from_wire(raw: str):
    """Priority ladder of FilterQueryStringExtensions.cs:153-186."""
    if raw == "":
        return None
    raw = urllib.parse.unquote_plus(raw)
    if raw.startswith("'"):
        s = raw[1:-1] if len(raw) > 1 and raw.endswith("'") else raw[1:]
        return _desanitize_tokens(s)
    value = _desanitize_tokens(raw)
    low = value.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(value)  # covers the reference's int64 + int32 rungs
    except ValueError:
        pass
    try:
        return decimal.Decimal(value)
    except decimal.InvalidOperation:
        pass
    for parse in (_parse_datetime, _parse_uuid):
        parsed = parse(value)
        if parsed is not None:
            return parsed
    return value


def _parse_datetime(value: str) -> Optional[datetime.datetime]:
    try:
        dt = datetime.datetime.fromisoformat(value)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)  # SpecifyKind(Utc)
        return dt
    except ValueError:
        return None


def _parse_uuid(value: str) -> Optional[uuid.UUID]:
    try:
        return uuid.UUID(value)
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Filter <-> wire
# ---------------------------------------------------------------------------

def serialize_filter(f: Filter) -> str:
    prop = "*" if not f.property_name else sanitize_value(f.property_name)
    oper = f.operator if f.operator else "*"
    value = "" if f.value is None else _value_to_wire(f.value)
    nested = NESTED_JOIN.join(serialize_connector(c) for c in f.filters)
    tag = urllib.parse.quote_plus(f.tag or "")
    visible = "true" if f.visible else "false"
    return FIELD_JOIN.join((prop, oper, value, visible, tag, nested))


def serialize_connector(c: FilterConnector) -> str:
    return f"{c.logic}{LOGIC_JOIN}{serialize_filter(c.filter)}"


# Accept BOTH connector dialects on deserialize: the server joins
# logic+filter with '$' (ProjectionQueryQueryStringExtensions.cs:21), but
# the reference's own TS client emits '+' (filter.ts serialize) — a string
# the reference C# server cannot actually parse (FilterConnector
# QueryStringExtensions.cs:12-23 finds neither '$' nor a quote and
# throws).  We keep the server dialect on SERIALIZE and accept the TS
# dialect on DESERIALIZE (superset compatibility, pinned by the
# checked-in fixtures transcribed from the TS codec).  Same for the
# visible token: server "true"/"false", TS client 'T'/'F'.
_NESTED_SPLIT = re.compile(r"\.(?=(?:and|or)[$+])")
_TS_CONNECTOR = re.compile(r"^(and|or)\+")


def deserialize_filter(s: str) -> Filter:
    prop, oper, value, visible, tag, nested = _split_fields(s)
    # Split the connector blob only at '.' immediately followed by a logic
    # token — '.' inside values/names is sanitized to ';dot;' and '$' to
    # ';dollar;' (and %24 in tags). NOTE: the wire format does not encode
    # nesting depth of sibling connectors, so `a AND ((x AND y) OR z)` and
    # `(a AND (x AND y)) OR z` serialize identically; like the reference's
    # flat split (FilterQueryStringExtensions.cs:120-131) deserialization
    # yields the latter (left-fold) shape.
    filters = [
        deserialize_connector(part)
        for part in _NESTED_SPLIT.split(nested)
        if part
    ]
    return Filter(
        property_name=desanitize_value(prop) if prop != "*" else None,
        operator=None if oper == "*" else oper,
        value=_value_from_wire(value),
        tag=urllib.parse.unquote_plus(tag),
        # "true" = server dialect; "T" = TS-client dialect (filter.ts:76)
        visible=visible in ("true", "T"),
        filters=filters,
    )


def _split_fields(s: str) -> tuple[str, str, str, str, str, str]:
    # First five '|' delimit the six fields; everything after the fifth is the
    # nested-connector blob (itself containing no '|' only at depth 0 — nested
    # serialized filters DO contain '|', so split exactly 5 times).
    parts = s.split(FIELD_JOIN, 5)
    if len(parts) != 6:
        raise ValueError(f"malformed filter wire string: {s!r}")
    return tuple(parts)  # type: ignore[return-value]


def deserialize_connector(s: str) -> FilterConnector:
    idx = s.find(LOGIC_JOIN)
    if idx < 0:
        # TS-client dialect: logic joined with '+' (filter.ts serialize)
        m = _TS_CONNECTOR.match(s)
        if m is None:
            raise ValueError(f"malformed connector wire string: {s!r}")
        idx = m.end(1)
    return FilterConnector(s[:idx], deserialize_filter(s[idx + 1 :]))


# ---------------------------------------------------------------------------
# ProjectionQuery <-> query string
# ---------------------------------------------------------------------------

def serialize_filters(query: ProjectionQuery) -> str:
    if not query.filters:
        return ""
    return VERSION_PREFIX + FILTERS_JOIN.join(
        serialize_filter(f) for f in query.filters
    )


def deserialize_filters(query: ProjectionQuery, filters: str) -> None:
    if not filters:
        return
    if filters.startswith("sv"):
        end = filters.index("_", 2)
        version = filters[2:end]
        filters = filters[end + 1 :]
    else:
        version = "1"
    if version != "1":
        raise ValueError(f"unsupported filter wire version: {version}")
    parts = [p for p in filters.split(FILTERS_JOIN) if p]
    if parts:
        query.filters = [deserialize_filter(p) for p in parts]


def serialize_order_by(query: ProjectionQuery) -> str:
    return ",".join(f"{s.key_path} {s.order}" for s in query.order_by)


def deserialize_order_by(query: ProjectionQuery, order_by: str) -> None:
    if not order_by:
        return
    for part in order_by.split(","):
        kv = part.split(" ")
        if len(kv) == 2:
            query.order_by.append(SortInfo(key_path=kv[0], order=kv[1]))


def serialize_query(query: ProjectionQuery) -> str:
    """Full query-string form (ProjectionQueryQueryStringExtensions.cs:33-49)."""
    qs = (
        f"&filters={serialize_filters(query)}"
        f"&limit={'' if query.limit is None else query.limit}"
        f"&offset={query.offset}"
        f"&orderBy={serialize_order_by(query)}"
        f"&searchText={query.search_text}"
    )
    # extension token, only emitted when non-default so baseline strings
    # stay byte-identical to the reference's wire format
    if query.search_mode and query.search_mode != "substring":
        qs += f"&searchMode={query.search_mode}"
    if query.phrase_slop:
        qs += f"&phraseSlop={query.phrase_slop}"
    if query.analyzer and query.analyzer != "whitespace":
        qs += f"&analyzer={query.analyzer}"
    if query.synonyms:
        # term:alt1|alt2;term2:alt — ':' '|' ';' '&' '=' are structural
        # in this param, so tokens containing them cannot round-trip and
        # are rejected (raise, not corrupt).  Keys/alternates lowercase
        # on the wire: matching (expand_synonyms) lowercases, so a
        # mixed-case 'Fast' key would otherwise never match anything.
        merged: dict[str, list[str]] = {}
        for k, v in sorted(query.synonyms.items()):
            if v:
                merged.setdefault(_synonym_token(k), []).extend(
                    _synonym_token(a) for a in v
                )
        groups = ";".join(
            f"{k}:{'|'.join(v)}" for k, v in sorted(merged.items())
        )
        if groups:
            qs += f"&synonyms={groups}"
    return qs


_SYNONYM_RESERVED = frozenset(":|;&=")


def _synonym_token(t: object) -> str:
    """Lowercased synonym term/alternate, validated against the wire
    delimiters — a token carrying ':' '|' ';' '&' or '=' would corrupt
    the param or silently break the round-trip."""
    s = str(t).lower()
    bad = _SYNONYM_RESERVED.intersection(s)
    if bad or not s:
        raise ValueError(
            f"synonym token {t!r} is empty or contains reserved wire "
            f"characters {sorted(bad)}; percent-encode upstream or drop it"
        )
    return s


def deserialize_query(qs: str) -> ProjectionQuery:
    query = ProjectionQuery()
    # split WITHOUT percent-decoding: the filters blob carries its own
    # field-level encoding, and early unquoting would resurrect structural
    # characters ('|', '!') hidden inside %-escaped values
    params: dict[str, str] = {}
    for part in qs.lstrip("&").split("&"):
        key, _, value = part.partition("=")
        if key and key not in params:
            params[key] = value

    def first(key: str) -> str:
        return params.get(key, "")

    deserialize_filters(query, first("filters"))
    deserialize_order_by(query, first("orderBy"))
    if first("limit"):
        query.limit = int(first("limit"))
    if first("offset"):
        query.offset = int(first("offset"))
    if first("searchText"):
        query.search_text = first("searchText")
    if first("searchMode"):
        query.search_mode = first("searchMode")
    if first("phraseSlop"):
        query.phrase_slop = int(first("phraseSlop"))
    if first("analyzer"):
        query.analyzer = first("analyzer")
    if first("synonyms"):
        syn: dict = {}
        for group in first("synonyms").split(";"):
            term, _, alts = group.partition(":")
            if term and alts:
                # lowercase on read too, so hand-built strings with
                # mixed-case keys still match at analysis time; keys
                # colliding after lowercasing MERGE their groups (the
                # serializer merges, so the round-trip stays symmetric)
                group = syn.setdefault(term.lower(), [])
                group.extend(
                    a.lower()
                    for a in alts.split("|")
                    if a and a.lower() not in group
                )
        query.synonyms = syn
    return query
