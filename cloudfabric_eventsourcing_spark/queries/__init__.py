"""Query model: Filter AST, sort, ProjectionQuery, codec, builder DSL.

Behavioral spec: /root/reference/CloudFabric.Projections/Queries/*
(Filter.cs, FilterConnector.cs, FilterLogic.cs, FilterOperator.cs,
SortInfo.cs, ProjectionQuery.cs, *QueryStringExtensions.cs).
"""

from cloudfabric_eventsourcing_spark.queries.filters import (
    Filter,
    FilterConnector,
    FilterLogic,
    FilterOperator,
)
from cloudfabric_eventsourcing_spark.queries.projection_query import (
    FacetInfoRequest,
    FacetStats,
    ProjectionQuery,
    ProjectionQueryResult,
    QueryResultDocument,
    SortInfo,
    SortingFilter,
)
from cloudfabric_eventsourcing_spark.queries.builder import P
from cloudfabric_eventsourcing_spark.queries.synonyms import (
    get_synonym_map,
    register_synonym_map,
    unregister_synonym_map,
)

__all__ = [
    "Filter",
    "FilterConnector",
    "FilterLogic",
    "FilterOperator",
    "FacetInfoRequest",
    "get_synonym_map",
    "register_synonym_map",
    "unregister_synonym_map",
    "FacetStats",
    "ProjectionQuery",
    "ProjectionQueryResult",
    "QueryResultDocument",
    "SortInfo",
    "SortingFilter",
    "P",
]
