"""Pure-Python Filter AST evaluator over dict documents — the in-memory
backend's query engine.

Behavioral spec (reference, read-only): the compiled-LINQ in-memory backend
(CloudFabric.Projections/Queries/FilterExpressionExtensions.cs:48-243 and
Implementations/...InMemory/InMemoryProjectionRepository.cs:176-233).

Shares semantics with plans/translator.py (same AST, same case-sensitivity,
null, EXISTS and null-ordering rules) — the two are differential-tested
against each other, mirroring how the reference runs the same suites on 4
backends."""

from __future__ import annotations

import datetime
import decimal
from typing import Any, Optional

from cloudfabric_eventsourcing_spark.queries.filters import Filter, FilterLogic, FilterOperator
from cloudfabric_eventsourcing_spark.queries.projection_query import (
    FacetInfoRequest,
    FacetStats,
    ProjectionQuery,
    SortInfo,
    SortOrder,
)
from cloudfabric_eventsourcing_spark.schema import ProjectionSchema


def _get_path(doc: Any, path: str):
    cur = doc
    for seg in path.split("."):
        if cur is None:
            return None
        if isinstance(cur, dict):
            cur = cur.get(seg)
        else:
            cur = getattr(cur, seg, None)
    return cur


def _coerce_pair(a, b):
    """Comparable coercion: decimals/floats mix, naive/aware datetimes."""
    if isinstance(a, decimal.Decimal) and isinstance(b, float):
        b = decimal.Decimal(str(b))
    elif isinstance(b, decimal.Decimal) and isinstance(a, float):
        a = decimal.Decimal(str(a))
    if isinstance(a, datetime.datetime) and isinstance(b, datetime.datetime):
        if (a.tzinfo is None) != (b.tzinfo is None):
            a = a.replace(tzinfo=None)
            b = b.replace(tzinfo=None)
    return a, b


def _leaf(doc_value, op: str, value) -> bool:
    if op == FilterOperator.Equal:
        if value is None:
            return doc_value is None
        if doc_value is None:
            return False
        a, b = _coerce_pair(doc_value, value)
        return a == b
    if op == FilterOperator.NotEqual:
        if value is None:
            return doc_value is not None
        if doc_value is None:
            return False  # SQL semantics: NULL != x is not TRUE
        a, b = _coerce_pair(doc_value, value)
        return a != b
    if op in FilterOperator.ORDERED_OPS:
        if doc_value is None:
            return False
        a, b = _coerce_pair(doc_value, value)
        return {
            FilterOperator.Greater: a > b,
            FilterOperator.GreaterOrEqual: a >= b,
            FilterOperator.Lower: a < b,
            FilterOperator.LowerOrEqual: a <= b,
        }[op]
    if op in FilterOperator.STRING_OPS:
        if doc_value is None:
            return False
        s, v = str(doc_value), str(value)
        if op == FilterOperator.StartsWith:
            return s.startswith(v)
        if op == FilterOperator.EndsWith:
            return s.endswith(v)
        if op == FilterOperator.Contains:
            return v in s
        s, v = s.lower(), v.lower()
        if op == FilterOperator.StartsWithIgnoreCase:
            return s.startswith(v)
        if op == FilterOperator.EndsWithIgnoreCase:
            return s.endswith(v)
        return v in s
    if op == FilterOperator.ArrayContains:
        if doc_value is None:
            return False
        return any(_leaf(x, FilterOperator.Equal, value) for x in doc_value)
    raise ValueError(f"unknown filter operator: {op!r}")


def eval_filter(f: Filter, doc: dict, schema: Optional[ProjectionSchema] = None) -> bool:
    acc: Optional[bool] = None
    if not f.is_grouping_node:
        acc = _eval_leaf(f, doc, schema)
    for c in f.filters:
        child = eval_filter(c.filter, doc, schema)
        if acc is None:
            acc = child
        elif c.logic == FilterLogic.And:
            acc = acc and child
        elif c.logic == FilterLogic.Or:
            acc = acc or child
        else:
            raise ValueError(f"unknown logic token: {c.logic!r}")
    return True if acc is None else acc


def _eval_leaf(f: Filter, doc: dict, schema: Optional[ProjectionSchema]) -> bool:
    path, op, value = f.property_name, f.operator, f.value
    head, _, rest = path.partition(".")
    head_val = _get_path(doc, head)
    if rest and isinstance(head_val, list):
        # EXISTS over array elements (Array.Exists in the reference,
        # FilterExpressionExtensions.cs:224-243)
        return any(
            _leaf(_get_path(elem, rest), op, value) for elem in head_val
        )
    return _leaf(_get_path(doc, path), op, value)


def eval_search(
    search_text: str,
    doc: dict,
    schema: Optional[ProjectionSchema],
    mode: str = "substring",
    analyzer: str = "whitespace",
    synonyms: Optional[dict] = None,
    phrase_slop: int = 0,
) -> bool:
    if not search_text or search_text == "*" or schema is None:
        return True
    needle = search_text.lower()
    if mode == "tokenized":
        from cloudfabric_eventsourcing_spark.plans.translator import (
            _effective_synonyms,
            expand_synonyms,
            tokenize_terms,
        )

        # AND between analyzer terms, OR across fields per term, OR over
        # each term's synonym group — registered (schema-attached) maps
        # merged with query-time contents, like the Spark side
        # (semantics-identical to translator.search_to_column)
        synonyms = _effective_synonyms(
            schema.searchable_synonym_map_names(), synonyms
        )
        terms = tokenize_terms(needle, analyzer)
        if not terms:
            return False  # zero analyzed terms match nothing (all modes)
        return all(
            any(
                eval_search(v, doc, schema, mode="substring")
                for v in expand_synonyms(term, synonyms)
            )
            for term in terms
        )
    if mode == "match":
        from cloudfabric_eventsourcing_spark.plans.translator import (
            _effective_synonyms,
            expand_synonyms,
            tokenize_terms,
        )

        path_maps = dict(schema.searchable_path_synonym_maps())

        # field-centric AND with the per-property analyzer split
        # (semantics-identical to translator.search_to_column "match":
        # stored tokens per the field's index analyzer, query terms per
        # its search analyzer, doc matches when some field holds ALL
        # terms as whole tokens)
        def field_tokens(v, index_an) -> set:
            if v is None:
                return set()
            return set(tokenize_terms(str(v).lower(), index_an or "whitespace"))

        def field_match(value, s_an, i_an, syn) -> bool:
            terms = tokenize_terms(needle, s_an or analyzer)
            if not terms:
                return False
            toks = field_tokens(value, i_an)
            return all(
                any(v in toks for v in expand_synonyms(term, syn))
                for term in terms
            )

        def array_field_match(values, s_an, i_an, syn) -> bool:
            # mirrors the translator exactly: per-term exists() over the
            # elements, AND across terms — terms may match DIFFERENT
            # elements (translator.py match branch builds F.exists per
            # term), so this must NOT require one element to hold all.
            # Element token sets are built ONCE, not per (term, variant).
            terms = tokenize_terms(needle, s_an or analyzer)
            if not terms:
                return False
            toks_per_elem = [field_tokens(v, i_an) for v in values]
            return all(
                any(
                    any(v in toks for v in expand_synonyms(term, syn))
                    for toks in toks_per_elem
                )
                for term in terms
            )

        for path, s_an, i_an in schema.searchable_path_analyzers():
            # per-field registered maps, like the Spark side
            syn = _effective_synonyms(path_maps.get(path), synonyms)
            head, _, rest = path.partition(".")
            head_val = _get_path(doc, head)
            if rest and isinstance(head_val, list):
                if array_field_match(
                    [_get_path(e, rest) for e in head_val], s_an, i_an, syn
                ):
                    return True
            elif field_match(_get_path(doc, path), s_an, i_an, syn):
                return True
        return False
    if mode == "fuzzy":
        from cloudfabric_eventsourcing_spark.plans.translator import (
            auto_fuzziness,
            tokenize_terms,
        )

        def field_hit(v, term, dist):
            if v is None:
                return False
            toks = [t for t in str(v).lower().split() if t]
            if dist == 0:
                return term in toks
            return any(_levenshtein(t, term) <= dist for t in toks)

        def term_hit(term):
            dist = auto_fuzziness(term)
            for path in schema.searchable_paths():
                head, _, rest = path.partition(".")
                head_val = _get_path(doc, head)
                if rest and isinstance(head_val, list):
                    if any(
                        field_hit(_get_path(e, rest), term, dist)
                        for e in head_val
                    ):
                        return True
                elif field_hit(_get_path(doc, path), term, dist):
                    return True
            return False

        terms = tokenize_terms(needle, analyzer)
        if not terms:
            return False  # zero analyzed terms match nothing (all modes)
        return all(term_hit(t) for t in terms)
    if mode == "phrase_prefix":
        import re

        from cloudfabric_eventsourcing_spark.plans.translator import (
            phrase_prefix_regex,
        )

        pattern = phrase_prefix_regex(needle, phrase_slop)
        if pattern is None:
            return True
        rx = re.compile(pattern)

        def hit(v):
            return v is not None and rx.search(str(v).lower()) is not None

        for path in schema.searchable_paths():
            head, _, rest = path.partition(".")
            head_val = _get_path(doc, head)
            if rest and isinstance(head_val, list):
                if any(hit(_get_path(e, rest)) for e in head_val):
                    return True
            elif hit(_get_path(doc, path)):
                return True
        return False
    for path in schema.searchable_paths():
        head, _, rest = path.partition(".")
        head_val = _get_path(doc, head)
        if rest and isinstance(head_val, list):
            if any(
                needle in str(_get_path(e, rest)).lower()
                for e in head_val
                if _get_path(e, rest) is not None
            ):
                return True
        else:
            v = _get_path(doc, path)
            if v is not None and needle in str(v).lower():
                return True
    return False


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance — mirrors Spark's F.levenshtein / DuckDB's
    levenshtein() (unit costs, no transposition)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def score_doc(
    search_text: str,
    doc: dict,
    schema: Optional[ProjectionSchema],
    mode: str = "substring",
    analyzer: str = "whitespace",
) -> float:
    """TF relevance — semantics-identical to translator.score_column:
    occurrences of each term across searchable columns (array fields sum
    over elements), each field weighted by its `searchable_boost`."""
    if not search_text or search_text == "*" or schema is None:
        return 0.0
    needle = search_text.lower()
    if mode == "tokenized":
        from cloudfabric_eventsourcing_spark.plans.translator import (
            tokenize_terms,
        )

        terms = tokenize_terms(needle, analyzer)
    else:
        terms = [needle]

    def occurrences(v, term):
        if v is None:
            return 0.0
        s = str(v).lower()
        return (len(s) - len(s.replace(term, ""))) / len(term)

    total = 0.0
    for term in terms:
        if not term:
            continue
        for path, boost in schema.searchable_path_boosts():
            head, _, rest = path.partition(".")
            head_val = _get_path(doc, head)
            if rest and isinstance(head_val, list):
                contrib = sum(
                    occurrences(_get_path(e, rest), term) for e in head_val
                )
            else:
                contrib = occurrences(_get_path(doc, path), term)
            total += contrib * boost if boost != 1.0 else contrib
    return total


def bm25ish_stats(
    search_text: str,
    docs: list,
    schema: Optional[ProjectionSchema],
    mode: str = "substring",
    analyzer: str = "whitespace",
    per_field: bool = False,
) -> dict:
    """Corpus statistics for the bm25ish profile computed the Python way:
    N, avg searchable-token doc length, per-term document frequency
    (df_t = docs where the term substring-matches any searchable field —
    the same _term_column predicate the Spark side counts).

    per_field=True adds the field-granular stats the ES-parity variant
    needs: avgdl_f[path] and df_f[path][term] (the single-field
    _field_term_pred / _field_dl_column counterparts)."""
    from cloudfabric_eventsourcing_spark.plans.translator import (
        tokenize_terms,
    )

    needle = (search_text or "").lower()
    terms = [
        t
        for t in (
            tokenize_terms(needle, analyzer) if mode == "tokenized" else [needle]
        )
        if t
    ]
    lengths = [_doc_length(d, schema) for d in docs]
    n = len(docs)
    avgdl = (sum(lengths) / n) if n else 1.0
    dfs = {
        t: sum(
            1 for d in docs if eval_search(t, d, schema, mode="substring")
        )
        for t in terms
    }
    stats = {"n": n, "avgdl": avgdl or 1.0, "df": dfs, "terms": terms}
    if per_field:
        paths = [p for p in schema.searchable_paths()] if schema else []
        stats["avgdl_f"] = {
            p: ((sum(_field_dl(d, p) for d in docs) / n) or 1.0)
            if n
            else 1.0
            for p in paths
        }
        stats["df_f"] = {
            p: {
                t: sum(1 for d in docs if _field_matches(d, p, t))
                for t in terms
            }
            for p in paths
        }
    return stats


def _field_values(doc: dict, path: str) -> list:
    """The value(s) one searchable path yields for a doc (array fields
    fan out over elements) — the shared base of the per-field mirrors."""
    head, _, rest = path.partition(".")
    head_val = _get_path(doc, head)
    if rest and isinstance(head_val, list):
        return [_get_path(e, rest) for e in head_val]
    return [_get_path(doc, path)]


def _field_occurrences(doc: dict, path: str, term: str) -> float:
    total = 0.0
    for v in _field_values(doc, path):
        if v is None:
            continue
        s = str(v).lower()
        total += (len(s) - len(s.replace(term, ""))) / len(term)
    return total


def _field_dl(doc: dict, path: str) -> int:
    return sum(
        len(str(v).lower().split())
        for v in _field_values(doc, path)
        if v is not None
    )


def _field_matches(doc: dict, path: str, term: str) -> bool:
    return any(
        term in str(v).lower()
        for v in _field_values(doc, path)
        if v is not None
    )


def _doc_length(doc: dict, schema: ProjectionSchema) -> int:
    return sum(_field_dl(doc, path) for path in schema.searchable_paths())


def bm25ish_score_doc(
    search_text: str,
    doc: dict,
    schema: Optional[ProjectionSchema],
    stats: dict,
    mode: str = "substring",
    analyzer: str = "whitespace",
    k1: float = 1.2,
    b: float = 0.75,
    per_field: bool = False,
    combine: str = "best_fields",
) -> float:
    """Arithmetic mirror of translator.bm25ish_score on precomputed
    `stats` (bm25ish_stats, same per_field flag) — the differential pin
    for the float profile, which is excluded from hash oracles."""
    import math

    if not search_text or search_text == "*" or schema is None:
        return 0.0
    n = stats["n"]
    total = 0.0
    if per_field:
        fields = list(schema.searchable_path_boosts())
        for term in stats["terms"]:
            field_scores = []
            for path, boost in fields:
                df_t = stats["df_f"][path].get(term, 0)
                idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
                avgdl = stats["avgdl_f"][path] or 1.0
                tf = _field_occurrences(doc, path, term)
                dl = _field_dl(doc, path)
                denom = tf + k1 * (1.0 - b + b * dl / avgdl)
                field_scores.append(boost * idf * tf * (k1 + 1.0) / denom)
            if combine == "best_fields":
                total += max(field_scores) if field_scores else 0.0
            else:
                total += sum(field_scores)
        return total
    avgdl = stats["avgdl"]
    dl = _doc_length(doc, schema)
    for term in stats["terms"]:
        df_t = stats["df"].get(term, 0)
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        tf = score_doc(term, doc, schema, mode="substring")
        denom = tf + k1 * (1.0 - b + b * dl / avgdl)
        total += idf * tf * (k1 + 1.0) / denom
    return total


def highlight_doc(value, search_text: str, mode: str = "substring"):
    """ES-style highlight (translator.highlight_column parity): matched
    terms wrapped in <em>…</em>, or None when nothing matches."""
    import re

    needle = (search_text or "").lower()
    terms = [t for t in (needle.split() if mode == "tokenized" else [needle]) if t]
    if not terms or value is None:
        return None
    s = str(value)
    if not any(t in s.lower() for t in terms):
        return None
    pat = re.compile("(" + "|".join(re.escape(t) for t in terms) + ")", re.IGNORECASE)
    return pat.sub(r"<em>\1</em>", s)


class _NullsKey:
    """Sort key wrapper: Postgres ordering — ASC nulls last, DESC nulls
    first (translator.sort_columns parity)."""

    __slots__ = ("value", "descending")

    def __init__(self, value, descending: bool):
        self.value = value
        self.descending = descending

    def __lt__(self, other: "_NullsKey") -> bool:
        a, b = self.value, other.value
        if a is None and b is None:
            return False
        if a is None:
            return self.descending  # nulls first on desc, last on asc
        if b is None:
            return not self.descending
        a, b = _coerce_pair(a, b)
        return (a > b) if self.descending else (a < b)


def _sort_value(info: SortInfo, doc: dict):
    head, _, rest = info.key_path.partition(".")
    head_val = _get_path(doc, head)
    if rest and isinstance(head_val, list):
        matches = []
        for elem in head_val:
            ok = True
            for sf in info.filters:
                _, _, sub = sf.filter_key_path.partition(".")
                ev, fv = _coerce_pair(_get_path(elem, sub), sf.filter_value)
                if ev != fv:
                    ok = False
                    break
            if ok:
                v = _get_path(elem, rest)
                if v is not None:
                    matches.append(v)
        return min(matches) if matches else None
    return _get_path(doc, info.key_path)


def run_query_docs(
    docs: list[dict],
    query: ProjectionQuery,
    schema: Optional[ProjectionSchema] = None,
) -> tuple[list[dict], int]:
    """Returns (page, total) with the same semantics as translator.run_query."""
    filtered = [
        d
        for d in docs
        if all(eval_filter(f, d, schema) for f in query.filters)
        and eval_search(
                    query.search_text, d, schema, query.search_mode,
                    query.analyzer, query.synonyms, query.phrase_slop,
                )
    ]
    total = len(filtered)
    scoring = (
        query.scoring_profile == "tf"
        and query.search_text
        and query.search_text != "*"
        and schema is not None
    )
    if query.order_by:
        for info in reversed(query.order_by):  # stable multi-key sort
            desc = info.order == SortOrder.Desc
            filtered.sort(key=lambda d, i=info, dd=desc: _NullsKey(_sort_value(i, d), dd))
    elif scoring:
        # ES semantics: no explicit sort -> by relevance, best first
        key_name = schema.key_name
        filtered.sort(
            key=lambda d: (
                -score_doc(
                    query.search_text, d, schema, query.search_mode, query.analyzer
                ),
                str(d.get(key_name)),
            )
        )
    page = filtered[query.offset :]
    if query.limit is not None:
        page = page[: query.limit]
    if schema is not None:
        hidden = {p.name for p in schema.properties if not p.is_retrievable}
        if hidden:
            page = [{k: v for k, v in d.items() if k not in hidden} for d in page]
    return page, total


def facet_stats_docs(
    docs: list[dict], requests: list[FacetInfoRequest]
) -> dict[str, list[FacetStats]]:
    """Facet aggregation over dict documents — semantics-identical to
    translator.facet_stats (A6) for the in-memory backend."""
    out: dict[str, list[FacetStats]] = {}
    for req in requests:
        if req.ranges:
            edges = sorted(req.ranges)
            buckets: dict[tuple, FacetStats] = {}
            for lo, hi in zip(edges, edges[1:]):
                buckets[(lo, hi)] = FacetStats(
                    value=f"{lo}-{hi}", count=0, range_from=float(lo),
                    range_to=float(hi),
                    sum_by_value=0 if req.sum_by_field else None,
                )
            for d in docs:
                v = _get_path(d, req.facet_name)
                if v is None:
                    continue
                for (lo, hi), st in buckets.items():
                    if lo <= v < hi:
                        st.count += 1
                        if req.sum_by_field:
                            st.sum_by_value += _get_path(d, req.sum_by_field) or 0
                        break
            stats = [s for s in buckets.values() if s.count]
            if req.sort == "count":
                stats.sort(key=lambda s: (-s.count, s.range_from))
            else:
                stats.sort(key=lambda s: s.range_from)
            out[req.facet_name] = stats[: req.count]
            continue
        groups: dict = {}
        for d in docs:
            v = _get_path(d, req.facet_name)
            st = groups.get(v)
            if st is None:
                st = groups[v] = FacetStats(
                    value=v, count=0, sum_by_value=0 if req.sum_by_field else None
                )
            st.count += 1
            if req.sum_by_field:
                st.sum_by_value += _get_path(d, req.sum_by_field) or 0
        stats = list(groups.values())
        if req.sort == "count":
            stats.sort(key=lambda s: (-s.count, str(s.value)))
        else:
            stats.sort(key=lambda s: str(s.value))
        out[req.facet_name] = stats[: req.count]
    return out
