"""Pythonic filter-builder DSL — the counterpart of the reference's typed
C# lambda filters.

Behavioral spec (reference, read-only):
  - Expression<Func<T,bool>> -> Filter AST translation supporting ==, !=, >,
    >=, <, <=, &&, ||, string StartsWith/EndsWith/Contains (+ ignore-case
    overloads), Enumerable.Any(...) over collections producing dotted paths:
    CloudFabric.Projections/Queries/FilterExpressionExtensions.cs:245-529
  - entry point Where<T>: Queries/ProjectionQueryExpressionExtensions.cs:8-13

Usage:
    from cloudfabric_eventsourcing_spark.queries import P
    f = (P("Name").startswith("Q", ignore_case=True)
         & P("Items").any(P("Amount") >= 5))
    query = ProjectionQuery(filters=[f])

`&` / `|` fold left-associatively exactly like the reference's
Expression.AndAlso/OrElse chain; a parenthesized right-hand tree becomes a
single connector whose child filter carries its own connectors (same
grouping rule as FilterExpressionExtensions.cs:157-173).
"""

from __future__ import annotations

from typing import Any

from cloudfabric_eventsourcing_spark.queries.filters import (
    Filter,
    FilterConnector,
    FilterLogic,
    FilterOperator,
)


class BoolFilter(Filter):
    """A Filter with `&` / `|` composition sugar."""

    def __and__(self, other: Filter) -> "BoolFilter":
        out = _as_bool(self.clone())
        out.filters.append(FilterConnector(FilterLogic.And, other.clone()))
        return out

    def __or__(self, other: Filter) -> "BoolFilter":
        out = _as_bool(self.clone())
        out.filters.append(FilterConnector(FilterLogic.Or, other.clone()))
        return out

    def __invert__(self):
        raise TypeError(
            "negation is not part of the reference filter surface; "
            "invert the operator instead (eq<->ne, gt<->le, ...)"
        )


def _as_bool(f: Filter) -> BoolFilter:
    out = BoolFilter(f.property_name, f.operator, f.value, f.tag, f.visible)
    out.filters = f.filters
    return out


class P:
    """A property path reference; comparison operators yield BoolFilter."""

    def __init__(self, path: str):
        self.path = path

    def _f(self, op: str, value: Any) -> BoolFilter:
        return BoolFilter(self.path, op, value)

    def __eq__(self, value):  # type: ignore[override]
        return self._f(FilterOperator.Equal, value)

    def __ne__(self, value):  # type: ignore[override]
        return self._f(FilterOperator.NotEqual, value)

    def __gt__(self, value):
        return self._f(FilterOperator.Greater, value)

    def __ge__(self, value):
        return self._f(FilterOperator.GreaterOrEqual, value)

    def __lt__(self, value):
        return self._f(FilterOperator.Lower, value)

    def __le__(self, value):
        return self._f(FilterOperator.LowerOrEqual, value)

    def eq(self, value):
        return self._f(FilterOperator.Equal, value)

    def ne(self, value):
        return self._f(FilterOperator.NotEqual, value)

    def is_null(self):
        return self._f(FilterOperator.Equal, None)

    def is_not_null(self):
        return self._f(FilterOperator.NotEqual, None)

    def startswith(self, value: str, ignore_case: bool = False) -> BoolFilter:
        op = (
            FilterOperator.StartsWithIgnoreCase
            if ignore_case
            else FilterOperator.StartsWith
        )
        return self._f(op, value)

    def endswith(self, value: str, ignore_case: bool = False) -> BoolFilter:
        op = (
            FilterOperator.EndsWithIgnoreCase
            if ignore_case
            else FilterOperator.EndsWith
        )
        return self._f(op, value)

    def contains(self, value: str, ignore_case: bool = False) -> BoolFilter:
        op = (
            FilterOperator.ContainsIgnoreCase
            if ignore_case
            else FilterOperator.Contains
        )
        return self._f(op, value)

    def array_contains(self, value) -> BoolFilter:
        return self._f(FilterOperator.ArrayContains, value)

    def isin(self, values) -> BoolFilter:
        """IN-list as an OR-chain of eq — the reference's idiom
        (Demos/.../TaskListsService.cs:252-268, SURVEY.md J3)."""
        values = list(values)
        if not values:
            raise ValueError("isin() requires at least one value")
        out = self._f(FilterOperator.Equal, values[0])
        for v in values[1:]:
            out = out | self._f(FilterOperator.Equal, v)
        return out

    def any(self, inner: Filter) -> BoolFilter:
        """EXISTS over a nested array: prefixes every property path in
        `inner` with this array path (mirrors Enumerable.Any -> dotted path,
        FilterExpressionExtensions.cs:100-112,224-243)."""
        prefixed = _prefix_paths(inner.clone(), self.path)
        return _as_bool(prefixed)


def _prefix_paths(f: Filter, prefix: str) -> Filter:
    if not f.is_grouping_node:
        f.property_name = f"{prefix}.{f.property_name}"
    for c in f.filters:
        _prefix_paths(c.filter, prefix)
    return f
