"""ProjectionQuery and result shapes.

Behavioral spec (reference, read-only):
  - ProjectionQuery:        CloudFabric.Projections/Queries/ProjectionQuery.cs:3-21
  - SortInfo/SortingFilter: CloudFabric.Projections/Queries/SortInfo.cs:3-35
  - SortOrder tokens:       CloudFabric.Projections/Queries/SortOrder.cs:3-7
  - FacetInfoRequest:       CloudFabric.Projections/Queries/FacetInfoRequest.cs:3-31
  - result shapes:          CloudFabric.Projections/Queries/ProjectionQueryResult.cs:3-59

Semantics pinned by the reference:
  - top-level ``filters`` list is ANDed, each element parenthesized
    (ProjectionQuery.cs:16-20, PostgresqlProjectionRepository.cs:889-907);
  - ``limit`` None means "no limit" (ProjectionQuery.cs:11-13);
  - ``total_records_found`` counts all matches ignoring limit/offset
    (PostgresqlProjectionRepository.cs:531-538,562-566);
  - ``search_text`` default "*" means match-all (ProjectionQuery.cs:5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Generic, Optional, TypeVar

from cloudfabric_eventsourcing_spark.queries.filters import Filter


class SortOrder:
    Asc = "asc"
    Desc = "desc"


@dataclasses.dataclass
class SortingFilter:
    """Selects array elements participating in a sort; EQUAL-only compare
    (SortInfo.cs:24-35)."""

    filter_key_path: str
    filter_value: Any


@dataclasses.dataclass
class SortInfo:
    """One sort key: dotted key path + "asc"/"desc" + optional array-element
    filters (SortInfo.cs:3-22)."""

    key_path: str
    order: str = SortOrder.Asc
    filters: list[SortingFilter] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class FacetInfoRequest:
    """Facet request (FacetInfoRequest.cs:3-31). The reference declares this
    but no backend implements it; this engine implements it properly
    (SURVEY.md A6)."""

    facet_name: str
    sort: str = "count"
    count: int = 1000
    sum_by_field: Optional[str] = None
    # value buckets for range facets (ProjectionDocumentPropertySchema.FacetableRanges)
    ranges: list[float] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class FacetStats:
    """ProjectionQueryResult.cs:3-11."""

    value: Any = None
    count: Optional[int] = None
    range_from: Optional[float] = None
    range_to: Optional[float] = None
    sum_by_value: Optional[float] = None


@dataclasses.dataclass
class ProjectionQuery:
    """A single-projection query: filters + search + sort + pagination.

    The query model is single-table (no joins / group-by in the reference
    surface — SURVEY.md §2.4/§2.5); facets are the one aggregation extension.
    """

    search_text: str = "*"
    filters: list[Filter] = dataclasses.field(default_factory=list)
    order_by: list[SortInfo] = dataclasses.field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0
    facet_info_to_return: list[FacetInfoRequest] = dataclasses.field(
        default_factory=list
    )
    # ES-only surface retained for API parity; no-ops in the baseline engine
    # (deliberate divergence, SURVEY.md §7).
    fields_to_highlight: list[str] = dataclasses.field(default_factory=list)
    scoring_profile: Optional[str] = None
    #: Functional since round 2 (previously ES-parity no-op):
    #: "substring" (default; None is treated identically): the Postgres
    #: ILIKE-%text% baseline (ConstructSearchQuery —
    #: PostgresqlProjectionRepository.cs:909-925).
    #: "tokenized": whitespace-split terms, EVERY term must match some
    #: searchable column — ES's AND-between-terms semantics
    #: (ElasticSearchQueryFactory.cs:11-129, default_operator AND).
    #: "fuzzy": like tokenized, but a term matches a field when some
    #: whitespace token is within the ES AUTO edit-distance ladder
    #: (0 edits <3 chars, 1 for 3-5, 2 above) — query_string fuzziness.
    #: "phrase_prefix": consecutive terms, last term an open prefix.
    search_mode: str = "substring"
    #: Bounded-gap budget for "phrase_prefix": up to this many intervening
    #: whitespace tokens allowed between each adjacent term pair (the
    #: reference's ES search uses phrase slop 20 —
    #: ElasticSearchQueryFactory.cs:11-129).  0 = strictly consecutive.
    #: Per-gap approximation of ES's total-movement slop; never reorders
    #: (documented divergence, translator.phrase_prefix_regex).
    phrase_slop: int = 0
    #: Term tokenizer for tokenized search: "whitespace" (default),
    #: "uax_url_email" (punctuation-split EXCEPT emails/URLs stay whole —
    #: the reference's url-email-analyzer,
    #: ElasticSearchProjectionIndexer.cs:72-81, SearchAnalyzers.cs:5), or
    #: "standard" (punctuation-split everything, ES standard tokenizer).
    analyzer: str = "whitespace"
    #: Query-time synonym groups for tokenized search: term -> alternates.
    #: A term matches a document when the term OR any alternate matches
    #: (terms stay AND-combined) — the functional form of the reference's
    #: per-property SynonymMaps declarations
    #: (ProjectionDocumentPropertySchema.cs:20-32; applied by ES at
    #: analysis time via the maps deployed server-side — here the map
    #: contents travel with the query, a documented divergence since the
    #: engine has no server-side analyzer registry). Scoring does NOT
    #: count synonym hits (the TF scorer stays term-exact).
    synonyms: dict = dataclasses.field(default_factory=dict)


T = TypeVar("T")


@dataclasses.dataclass
class QueryResultDocument(Generic[T]):
    """One record: document + score/highlights (ProjectionQueryResult.cs:13-27).
    Score defaults to 0 and highlights to {} — the Postgres backend behavior
    that defines the baseline."""

    document: Optional[T] = None
    score: float = 0.0
    highlights: dict[str, list[str]] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class ProjectionQueryResult(Generic[T]):
    """ProjectionQueryResult.cs:29-59."""

    records: list[QueryResultDocument[T]] = dataclasses.field(default_factory=list)
    total_records_found: int = 0
    facets_stats: dict[str, list[FacetStats]] = dataclasses.field(default_factory=dict)
    debug_information: str = ""
