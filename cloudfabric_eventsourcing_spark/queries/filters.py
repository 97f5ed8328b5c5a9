"""Filter AST.

Behavioral spec (reference, read-only):
  - operator tokens:   CloudFabric.Projections/Queries/FilterOperator.cs:3-18
  - Filter node:       CloudFabric.Projections/Queries/Filter.cs:3-73
  - FilterConnector:   CloudFabric.Projections/Queries/FilterConnector.cs:3-23
  - FilterLogic:       CloudFabric.Projections/Queries/FilterLogic.cs:3-7

A `Filter` is a predicate node: (property_name, operator, value) plus a list
of `FilterConnector`s, each carrying a logic token ("and" | "or") and a child
filter. The tree is evaluated left-associatively: start with the head
predicate, then fold each connector in list order:

    acc = head
    for c in filters: acc = (acc AND/OR c.filter)

A filter whose property name is empty or "*" is a pure grouping node — the
head contributes nothing and evaluation starts from the first connector
(reference: FilterExpressionExtensions.cs:50-65 and
PostgresqlProjectionRepository.cs:687-690).
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import uuid
from typing import Any, Optional


class FilterLogic:
    """Logic tokens joining a connector to the accumulated filter."""

    And = "and"
    Or = "or"


class FilterOperator:
    """The 13 comparison / string / array operator tokens."""

    Equal = "eq"
    NotEqual = "ne"
    Greater = "gt"
    GreaterOrEqual = "ge"
    Lower = "lt"
    LowerOrEqual = "le"
    StartsWith = "string-starts-with"
    EndsWith = "string-ends-with"
    Contains = "string-contains"
    StartsWithIgnoreCase = "string-starts-with-ignore-case"
    EndsWithIgnoreCase = "string-ends-with-ignore-case"
    ContainsIgnoreCase = "string-contains-ignore-case"
    ArrayContains = "array-contains"

    ALL = (
        Equal,
        NotEqual,
        Greater,
        GreaterOrEqual,
        Lower,
        LowerOrEqual,
        StartsWith,
        EndsWith,
        Contains,
        StartsWithIgnoreCase,
        EndsWithIgnoreCase,
        ContainsIgnoreCase,
        ArrayContains,
    )

    STRING_OPS = (
        StartsWith,
        EndsWith,
        Contains,
        StartsWithIgnoreCase,
        EndsWithIgnoreCase,
        ContainsIgnoreCase,
    )

    ORDERED_OPS = (Greater, GreaterOrEqual, Lower, LowerOrEqual)


# Value types a filter value may take (mirrors the reference's object? slot:
# bool / long / int / decimal / DateTime / Guid / string / None).
FilterValue = Optional[Any]


@dataclasses.dataclass
class Filter:
    """One predicate node of the filter tree.

    ``property_name`` may be a dotted path into a nested struct
    ("CreatedBy.UserId") or through a nested array ("Items.Amount" — EXISTS
    semantics, see plans/translator.py).
    """

    property_name: Optional[str] = None
    operator: Optional[str] = None
    value: FilterValue = None
    tag: str = ""
    visible: bool = True
    filters: list["FilterConnector"] = dataclasses.field(default_factory=list)

    # -- combinators (Filter.cs:49-73) ------------------------------------
    def or_(self, property_name, operator=None, value=None) -> "Filter":
        f = (
            property_name
            if isinstance(property_name, Filter)
            else Filter(property_name, operator, value)
        )
        self.filters.append(FilterConnector(FilterLogic.Or, f))
        return self

    def and_(self, property_name, operator=None, value=None) -> "Filter":
        f = (
            property_name
            if isinstance(property_name, Filter)
            else Filter(property_name, operator, value)
        )
        self.filters.append(FilterConnector(FilterLogic.And, f))
        return self

    @property
    def is_grouping_node(self) -> bool:
        return self.property_name in (None, "", "*")

    def clone(self) -> "Filter":
        return Filter(
            self.property_name,
            self.operator,
            self.value,
            self.tag,
            self.visible,
            [FilterConnector(c.logic, c.filter.clone()) for c in self.filters],
        )

    # -- plain-dict (JSON-able) representation ----------------------------
    def to_dict(self) -> dict:
        return {
            "propertyName": self.property_name,
            "operator": self.operator,
            "value": _value_to_jsonable(self.value),
            "tag": self.tag,
            "visible": self.visible,
            "filters": [
                {"logic": c.logic, "filter": c.filter.to_dict()} for c in self.filters
            ],
        }

    @staticmethod
    def from_dict(d: dict) -> "Filter":
        return Filter(
            d.get("propertyName"),
            d.get("operator"),
            _value_from_jsonable(d.get("value")),
            d.get("tag", "") or "",
            d.get("visible", True),
            [
                FilterConnector(c["logic"], Filter.from_dict(c["filter"]))
                for c in d.get("filters", [])
            ],
        )


@dataclasses.dataclass
class FilterConnector:
    """logic ("and"|"or") + the filter it attaches (FilterConnector.cs:3-23)."""

    logic: str
    filter: Filter


def _value_to_jsonable(v: FilterValue):
    if isinstance(v, datetime.datetime):
        return {"$type": "datetime", "$value": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"$type": "decimal", "$value": str(v)}
    if isinstance(v, uuid.UUID):
        return {"$type": "uuid", "$value": str(v)}
    return v


def _value_from_jsonable(v):
    if isinstance(v, dict) and "$type" in v:
        t, raw = v["$type"], v["$value"]
        if t == "datetime":
            return datetime.datetime.fromisoformat(raw)
        if t == "decimal":
            return decimal.Decimal(raw)
        if t == "uuid":
            return uuid.UUID(raw)
    return v
