"""Logical-plan construction: Filter AST -> pyspark Column, query execution."""

from cloudfabric_eventsourcing_spark.plans.translator import (
    apply_query,
    filter_to_column,
    run_query,
    search_to_column,
    sort_columns,
)

__all__ = [
    "apply_query",
    "filter_to_column",
    "run_query",
    "search_to_column",
    "sort_columns",
]
