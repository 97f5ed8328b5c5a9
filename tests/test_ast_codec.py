"""Filter AST + sv1_ query-string codec round-trips.

Mirrors the reference's ProjectionQueryTests.cs:21-128 (round-trip must
preserve the tree) and the wire format of
ProjectionQueryQueryStringExtensions.cs / FilterQueryStringExtensions.cs.
"""

import datetime
import decimal
import uuid

from cloudfabric_eventsourcing_spark.queries import (
    Filter,
    FilterOperator,
    P,
    ProjectionQuery,
    SortInfo,
)
from cloudfabric_eventsourcing_spark.queries import querystring as qs


def test_operator_tokens_complete():
    assert len(FilterOperator.ALL) == 13
    assert FilterOperator.StartsWithIgnoreCase == "string-starts-with-ignore-case"


def test_filter_combinators_build_left_fold():
    f = Filter("a", "eq", 1).and_("b", "gt", 2).or_("c", "lt", 3)
    assert f.property_name == "a"
    assert [c.logic for c in f.filters] == ["and", "or"]


def test_builder_dsl_tree_shape():
    f = (P("Name").startswith("Q", ignore_case=True)) & (
        (P("ItemsCount") > 1) | (P("ItemsCount") == 0)
    )
    assert f.operator == FilterOperator.StartsWithIgnoreCase
    assert len(f.filters) == 1
    inner = f.filters[0].filter
    assert inner.operator == "gt"
    assert inner.filters[0].logic == "or"


def test_builder_any_prefixes_paths():
    f = P("Items").any(P("Amount") >= 5)
    assert f.property_name == "Items.Amount"
    assert f.operator == "ge"


def test_builder_isin_or_chain():
    f = P("x").isin([1, 2, 3])
    assert f.operator == "eq" and f.value == 1
    assert [c.filter.value for c in f.filters] == [2, 3]


def simple_wire_examples():
    return [
        (Filter("my_boolean_property", "eq", True), "my_boolean_property|eq|True|true||"),
        (Filter("s", "eq", "yo"), "s|eq|%27yo%27|true||"),
        (Filter("n", "gt", 100000000), "n|gt|100000000|true||"),
    ]


def test_wire_format_matches_reference_examples():
    # field order + separators pinned by
    # ProjectionQueryQueryStringExtensions.cs:5-31 docs
    for f, expected in simple_wire_examples():
        assert qs.serialize_filter(f) == expected


def test_roundtrip_scalar_values():
    for value in [
        True,
        False,
        7,
        100000000000,
        decimal.Decimal("42.39"),
        "plain string",
        "with.dots!and$specials&'quote",
        uuid.uuid4(),
        datetime.datetime(2024, 3, 1, 12, 30, 15, tzinfo=datetime.timezone.utc),
        None,
    ]:
        f = Filter("prop", "eq", value)
        back = qs.deserialize_filter(qs.serialize_filter(f))
        assert back.value == value, f"value {value!r} -> {back.value!r}"
        assert back.property_name == "prop"
        assert back.operator == "eq"


def test_roundtrip_string_number_stays_string():
    f = Filter("prop", "eq", "123")
    back = qs.deserialize_filter(qs.serialize_filter(f))
    assert back.value == "123" and isinstance(back.value, str)


def test_roundtrip_nested_tree():
    f = (
        Filter("a", "eq", 1)
        .and_(Filter("b", "gt", 2).or_("c", "lt", 3))
        .or_("d", "ne", "x")
    )
    q = ProjectionQuery(filters=[f, Filter("e", "eq", True)])
    wire = qs.serialize_filters(q)
    assert wire.startswith("sv1_")
    q2 = ProjectionQuery()
    qs.deserialize_filters(q2, wire)
    assert len(q2.filters) == 2
    back = q2.filters[0]
    assert back.property_name == "a"
    assert [c.logic for c in back.filters] == ["and", "or"]
    assert back.filters[0].filter.filters[0].filter.property_name == "c"
    assert q2.filters[1].value is True


def test_sibling_connectors_below_depth1_flatten_like_reference():
    # The sv1 wire format does not encode depth of sibling connectors:
    # a AND ((x AND y) OR z) deserializes as the left-fold
    # (a AND (x AND y)) OR z — identical to the reference's flat split
    # (FilterQueryStringExtensions.cs:120-131). Pin that behavior.
    child = Filter("x", "eq", 1).and_("y", "eq", 2).or_("z", "eq", 3)
    root = Filter("a", "eq", 0).and_(child)
    wire = qs.serialize_filter(root)
    back = qs.deserialize_filter(wire)
    assert [c.filter.property_name for c in back.filters] == ["x", "z"]
    assert back.filters[0].filter.filters[0].filter.property_name == "y"


def test_full_query_string_roundtrip():
    q = ProjectionQuery(
        search_text="hello",
        filters=[Filter("Name", "string-starts-with", "Q")],
        order_by=[SortInfo("Name", "desc"), SortInfo("Id", "asc")],
        limit=10,
        offset=5,
    )
    wire = qs.serialize_query(q)
    q2 = qs.deserialize_query(wire)
    assert q2.limit == 10 and q2.offset == 5
    assert q2.search_text == "hello"
    assert [(s.key_path, s.order) for s in q2.order_by] == [
        ("Name", "desc"),
        ("Id", "asc"),
    ]
    assert q2.filters[0].operator == "string-starts-with"
    assert q2.filters[0].value == "Q"


def test_grouping_node_serializes_star():
    f = Filter()
    f.and_("a", "eq", 1)
    wire = qs.serialize_filter(f)
    assert wire.startswith("*|*|")
    back = qs.deserialize_filter(wire)
    assert back.is_grouping_node
    assert back.filters[0].filter.property_name == "a"


def test_filter_dict_roundtrip_typed_values():
    f = (
        Filter("a", "eq", decimal.Decimal("42.39"))
        .and_("b", "lt", datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc))
        .or_("c", "eq", uuid.UUID("12345678-1234-5678-1234-567812345678"))
    )
    back = Filter.from_dict(f.to_dict())
    assert back.value == f.value
    assert back.filters[0].filter.value == f.filters[0].filter.value
    assert back.filters[1].filter.value == f.filters[1].filter.value
    assert isinstance(back.filters[1].filter.value, uuid.UUID)


def test_ts_client_wire_fixtures_deserialize_exactly():
    """Cross-language pin: serialized strings produced by the reference's
    TS client codec (filter.ts / filterConnector.ts — the first four are
    byte-exact from its own jest expectations) must deserialize into the
    exact AST.  The TS client joins connectors with '+' and writes
    visible as T/F — a dialect the reference C# SERVER cannot actually
    parse (FilterConnectorQueryStringExtensions.cs:12-23 throws);
    deserialize here is a documented superset accepting both dialects,
    while serialize stays on the server dialect."""
    import decimal
    import json
    import os

    from cloudfabric_eventsourcing_spark.queries import querystring as qsm

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "ts_wire_fixtures.json"
    )
    with open(path) as fh:
        fixtures = json.load(fh)["fixtures"]
    assert len(fixtures) >= 12

    def to_dict(f):
        return {
            "property": f.property_name,
            "operator": f.operator,
            "value": f.value,
            "visible": f.visible,
            "tag": f.tag,
            "filters": [
                {"logic": c.logic, "filter": to_dict(c.filter)} for c in f.filters
            ],
        }

    def expand(ast):
        out = dict(ast)
        v = out["value"]
        if isinstance(v, dict) and "$decimal" in v:
            out["value"] = decimal.Decimal(v["$decimal"])
        out["filters"] = [
            {"logic": c["logic"], "filter": expand(c["filter"])}
            for c in out["filters"]
        ]
        return out

    for fx in fixtures:
        got = to_dict(qsm.deserialize_filter(fx["wire"]))
        assert got == expand(fx["ast"]), fx["name"]


def test_server_dialect_roundtrip_of_ts_asts():
    """The ASTs deserialized from TS-client strings re-serialize on the
    SERVER dialect and round-trip losslessly (the migration path: accept
    the TS wire once, emit server wire thereafter)."""
    import json
    import os

    from cloudfabric_eventsourcing_spark.queries import querystring as qsm

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "ts_wire_fixtures.json"
    )
    with open(path) as fh:
        fixtures = json.load(fh)["fixtures"]
    for fx in fixtures:
        ast = qsm.deserialize_filter(fx["wire"])
        server_wire = qsm.serialize_filter(ast)
        again = qsm.deserialize_filter(server_wire)
        assert qsm.serialize_filter(again) == server_wire, fx["name"]
