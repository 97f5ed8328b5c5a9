"""Server-side synonym-map registry.

The reference declares synonym maps BY NAME per projection property
(`SynonymMaps: string[]` — ProjectionDocumentPropertySchema.cs:23) and
relies on the backing search engine holding the deployed map contents;
the query wire never carries them.  This module is that deployment
surface for the Spark engine: maps are registered once (engine-side),
properties reference them by name via `PropertySchema.synonym_maps`,
and the translator resolves names -> contents at analysis time.

Query-time synonyms (`ProjectionQuery.synonyms`, the sv1 wire param)
remain supported and MERGE OVER the registered maps — a query-time
group extends/overrides the deployed one for its term, mirroring how a
per-request analyzer override would behave in ES.

Token hygiene matches the wire codec: terms and alternates are
lowercased and validated against the sv1 delimiter set at registration
time, so a registered map can always round-trip if echoed into the
query-time param.
"""

from __future__ import annotations

from cloudfabric_eventsourcing_spark.queries.querystring import _synonym_token

_REGISTRY: dict[str, dict[str, list[str]]] = {}


def register_synonym_map(name: str, mapping: dict) -> None:
    """Register (or replace) a named synonym map: {term: [alternates]}.
    Terms/alternates are lowercased and validated like the sv1 wire
    codec's — registration fails loudly rather than silently mismatching
    at search time."""
    if not name or not isinstance(name, str):
        raise ValueError("synonym map name must be a non-empty string")
    clean: dict[str, list[str]] = {}
    for term, alts in mapping.items():
        key = _synonym_token(term)
        vals = [_synonym_token(a) for a in (alts or [])]
        if vals:
            clean.setdefault(key, []).extend(
                v for v in vals if v not in clean.get(key, [])
            )
    _REGISTRY[name] = clean


def unregister_synonym_map(name: str) -> None:
    _REGISTRY.pop(name, None)


def get_synonym_map(name: str) -> dict[str, list[str]]:
    """Contents of a registered map; unknown names raise (a property
    declaring a never-deployed map is a deployment error, not an empty
    expansion)."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"synonym map {name!r} is not registered; deploy it with "
            "register_synonym_map() before referencing it in a schema"
        ) from None


def resolve_synonym_maps(
    names: list, query_synonyms: dict | None = None
) -> dict[str, list[str]]:
    """Merged view of the named maps (in declaration order, later maps
    extending earlier groups) with query-time synonyms merged last.
    Returns {} only when there is nothing to expand."""
    merged: dict[str, list[str]] = {}

    def fold(mapping: dict) -> None:
        for term, alts in mapping.items():
            key = str(term).lower()
            group = merged.setdefault(key, [])
            group.extend(
                str(a).lower() for a in (alts or [])
                if str(a).lower() not in group
            )

    for name in names or []:
        fold(get_synonym_map(name))
    if query_synonyms:
        fold(query_synonyms)
    return merged
