"""Dynamic (runtime) projection schemas with dict documents — port of
DynamicProjectionSchemaTests.cs:212-417 — plus S11 DDL, query-string e2e
(QueryStringTests*), update_documents bulk mutate, and the ReadOnly
selector precedence chain."""

import datetime

import pytest
from pyspark.sql import types as T

from cloudfabric_eventsourcing_spark.eventstore import InMemoryMetadataRepository
from cloudfabric_eventsourcing_spark.projections import (
    IndexSelector,
    InMemoryProjectionRepository,
    ProjectionIndexStateStore,
)
from cloudfabric_eventsourcing_spark.queries import Filter, ProjectionQuery
from cloudfabric_eventsourcing_spark.queries import querystring as qs
from cloudfabric_eventsourcing_spark.schema import (
    ARRAY,
    INT32,
    STRING,
    ProjectionSchema,
    PropertySchema,
    create_table_ddl,
    schema_from_struct,
)

UTC = datetime.timezone.utc


def dynamic_schema() -> ProjectionSchema:
    # assembled at runtime, like DynamicProjectionSchemaTests.cs:212-237
    return ProjectionSchema(
        "orders_projections_dynamic",
        [
            PropertySchema("Id", STRING, is_key=True),
            PropertySchema("PartitionKey", STRING, is_filterable=True),
            PropertySchema("Name", STRING, is_filterable=True, is_searchable=True),
            PropertySchema("ItemsCount", INT32, is_filterable=True),
            PropertySchema("Tags", ARRAY, is_filterable=True, array_element_type=STRING),
        ],
    )


@pytest.fixture
def repo():
    state = ProjectionIndexStateStore(InMemoryMetadataRepository())
    schema = dynamic_schema()
    r = InMemoryProjectionRepository(schema, state)
    r.ensure_index()
    state.update_rebuild_progress(schema.schema_name, schema.index_name(), 0, completed=True)
    return r


def seed(repo):
    repo.upsert({"Id": "d1", "Name": "First order", "ItemsCount": 2, "Tags": ["Dixit", "board"]}, "P")
    repo.upsert({"Id": "d2", "Name": "Second order", "ItemsCount": 0, "Tags": ["space"]}, "P")
    repo.upsert({"Id": "d3", "Name": "Third", "ItemsCount": 5, "Tags": []}, "P")


def test_dynamic_dict_documents_array_contains(repo):
    seed(repo)
    # array-contains on a runtime schema (DynamicProjectionSchemaTests.cs:394-407)
    res = repo.query(ProjectionQuery(filters=[Filter("Tags", "array-contains", "Dixit")]))
    assert res.total_records_found == 1
    assert res.records[0].document["Id"] == "d1"


def test_query_string_e2e_same_results(repo):
    seed(repo)
    q = ProjectionQuery(
        filters=[Filter("ItemsCount", "gt", 0).and_("Name", "string-contains-ignore-case", "ORDER")]
    )
    wire = qs.serialize_query(q)
    direct = {r.document["Id"] for r in repo.query(q).records}
    roundtrip = {r.document["Id"] for r in repo.query(qs.deserialize_query(wire)).records}
    assert direct == roundtrip == {"d1"}


def test_update_documents_bulk_mutate(repo):
    """query-scoped bulk mutate (ProjectionBuilder.UpdateDocuments,
    ProjectionBuilder.cs:129-153)."""
    from cloudfabric_eventsourcing_spark.projections import ProjectionBuilder

    seed(repo)
    b = ProjectionBuilder(repo, IndexSelector.Write)

    def bump(doc):
        doc["ItemsCount"] += 100

    b.update_documents(
        ProjectionQuery(filters=[Filter("ItemsCount", "gt", 0)]),
        "P",
        datetime.datetime.now(UTC).replace(tzinfo=None),
        bump,
    )
    counts = {
        r.document["Id"]: r.document["ItemsCount"]
        for r in repo.query(ProjectionQuery()).records
    }
    assert counts == {"d1": 102, "d2": 0, "d3": 105}


def test_schema_from_struct_roundtrip():
    st = T.StructType(
        [
            T.StructField("Id", T.StringType(), False),
            T.StructField("n", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("nested", T.StructType([T.StructField("a", T.IntegerType())])),
        ]
    )
    schema = schema_from_struct("dyn", st, key="Id")
    assert schema.key_name == "Id"
    back = schema.to_struct_type()
    assert [f.name for f in back.fields] == ["Id", "n", "tags", "nested"]
    assert isinstance(back["tags"].dataType, T.ArrayType)
    assert isinstance(back["nested"].dataType, T.StructType)


def test_create_table_ddl_s11(spark, tmp_path):
    schema = dynamic_schema()
    ddl = create_table_ddl(schema, location=str(tmp_path / "tbl"))
    assert f"CREATE TABLE IF NOT EXISTS `{schema.index_name()}`" in ddl
    assert "`Id` string NOT NULL" in ddl
    assert "PARTITIONED BY (`PartitionKey`)" in ddl
    # the DDL is executable by Spark SQL
    spark.sql(ddl)
    try:
        cols = [r.col_name for r in spark.sql(
            f"DESCRIBE TABLE `{schema.index_name()}`"
        ).collect() if r.col_name and not r.col_name.startswith("#")]
        for name in ("Id", "Name", "ItemsCount", "Tags", "PartitionKey"):
            assert name in cols
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{schema.index_name()}`")


def test_readonly_selector_precedence():
    """ProjectionRepository.cs:306-337: ReadOnly falls back to the most
    recently STARTED rebuild, then the most recently CREATED index."""
    state = ProjectionIndexStateStore(InMemoryMetadataRepository())
    s1 = dynamic_schema()
    r1 = InMemoryProjectionRepository(s1, state)
    r1.ensure_index()  # v1 index exists, never rebuilt

    # ReadOnly with nothing completed/started -> most recently created (v1)
    name, _ = state.resolve_index(s1, IndexSelector.ReadOnly)
    assert name == s1.index_name()

    # evolve: v2 appears, rebuild STARTS on it (not completed)
    s2 = dynamic_schema()
    s2.properties.append(PropertySchema("Extra", STRING))
    r2 = InMemoryProjectionRepository(s2, state)
    r2.ensure_index()
    st = state.get(s2.schema_name)
    for idx in st.indexes_statuses:
        if idx.index_name == s2.index_name():
            idx.rebuild_started_at = datetime.datetime.now(UTC).replace(tzinfo=None)
    state.save(st)
    name, _ = state.resolve_index(s1, IndexSelector.ReadOnly)
    assert name == s2.index_name()  # started beats merely-created

    # v1 completes rebuild -> completed beats started
    state.update_rebuild_progress(s1.schema_name, s1.index_name(), 5, completed=True)
    name, _ = state.resolve_index(s1, IndexSelector.ReadOnly)
    assert name == s1.index_name()


def test_facets_on_in_memory_backend_match_spark(repo, spark):
    """A6 on the dict backend: facet output equals the Spark facet path."""
    from cloudfabric_eventsourcing_spark.plans.translator import facet_stats
    from cloudfabric_eventsourcing_spark.queries import FacetInfoRequest

    seed(repo)
    q = ProjectionQuery(
        facet_info_to_return=[
            FacetInfoRequest("Name", sum_by_field="ItemsCount"),
            FacetInfoRequest("ItemsCount", ranges=[0, 3, 10]),
        ]
    )
    mem = repo.query(q).facets_stats
    docs = [r.document for r in repo.query(ProjectionQuery()).records]
    df = spark.createDataFrame(
        [{k: d.get(k) for k in ("Id", "Name", "ItemsCount")} for d in docs],
        "Id string, Name string, ItemsCount int",
    )
    spk = facet_stats(df, q.facet_info_to_return)
    assert [(s.value, s.count, s.sum_by_value) for s in mem["Name"]] == [
        (s.value, s.count, s.sum_by_value) for s in spk["Name"]
    ]
    assert [(s.value, s.count) for s in mem["ItemsCount"]] == [
        (s.value, s.count) for s in spk["ItemsCount"]
    ]


def test_ensure_index_honors_selector():
    """ensure_index(Write) must resolve through the state machine (and
    raise IndexNotReadyError before any rebuild completes) instead of
    silently resolving the rebuild index."""
    import pytest

    from cloudfabric_eventsourcing_spark.projections import (
        InMemoryProjectionRepository,
    )
    from cloudfabric_eventsourcing_spark.projections.state import (
        IndexNotReadyError,
        IndexSelector,
        ProjectionIndexStateStore,
    )

    state = ProjectionIndexStateStore(InMemoryMetadataRepository())
    s1 = dynamic_schema()
    r1 = InMemoryProjectionRepository(s1, state)
    r1.ensure_index()  # default: bootstrap the rebuild index
    with pytest.raises(IndexNotReadyError):
        r1.ensure_index(IndexSelector.Write)
    state.update_rebuild_progress(s1.schema_name, s1.index_name(), 1, completed=True)
    assert r1.ensure_index(IndexSelector.Write) == s1.index_name()


def test_schema_from_dataclass_mirrors_attribute_factory():
    """schema_from_dataclass = the reference's
    ProjectionDocumentSchemaFactory.FromTypeWithAttributes
    (ProjectionDocumentSchemaFactory.cs:9-20): only prop()-marked fields
    participate, nesting recurses, Optional unwraps, and the result is
    an ordinary ProjectionSchema (hash / index name / struct type)."""
    import dataclasses
    import decimal
    import uuid
    from typing import Optional

    from cloudfabric_eventsourcing_spark.schema import (
        ARRAY,
        DATETIME,
        DECIMAL,
        GUID,
        OBJECT,
        STRING,
        prop,
        schema_from_dataclass,
    )

    @dataclasses.dataclass
    class Item:
        name: str = prop(is_searchable=True)
        added: datetime.datetime = prop(is_sortable=True)
        price: decimal.Decimal = prop()

    @dataclasses.dataclass
    class Address:
        city: str = prop(is_filterable=True)

    @dataclasses.dataclass
    class OrderDoc:
        id: uuid.UUID = prop(is_key=True)
        name: Optional[str] = prop(is_searchable=True, searchable_boost=2.0)
        items: list[Item] = prop(is_filterable=True)
        address: Address = prop()
        tags: list[str] = prop(is_filterable=True)
        internal_note: str = ""  # unmarked -> skipped (IgnoreProperty)

    s = schema_from_dataclass(OrderDoc)
    assert s.schema_name == "OrderDoc"
    assert [p.name for p in s.properties] == [
        "id", "name", "items", "address", "tags",
    ]
    assert s.key_name == "id"
    by = {p.name: p for p in s.properties}
    assert by["id"].type == GUID
    assert by["name"].type == STRING  # Optional unwrapped
    assert by["name"].searchable_boost == 2.0
    assert by["items"].type == ARRAY
    assert [(n.name, n.type) for n in by["items"].nested_properties] == [
        ("name", STRING), ("added", DATETIME), ("price", DECIMAL),
    ]
    assert by["address"].type == OBJECT
    assert by["tags"].array_element_type == STRING
    # ordinary schema: deterministic hash-suffixed index + struct mapping
    assert s.index_name().startswith("orderdoc_")
    st = s.to_struct_type()
    assert st["items"].dataType.elementType["added"].dataType.typeName() == (
        "timestamp"
    )
    # searchable surface composed from both levels
    assert s.searchable_paths() == ["name", "items.name"]


def test_schema_from_dataclass_pep604_union():
    """`str | None` (PEP 604) unwraps like Optional[str] — its origin is
    types.UnionType, not typing.Union, and must not hit the unsupported-
    type error."""
    import dataclasses
    import uuid

    from cloudfabric_eventsourcing_spark.schema import (
        INT64,
        STRING,
        prop,
        schema_from_dataclass,
    )

    @dataclasses.dataclass
    class Doc:
        id: uuid.UUID = prop(is_key=True)
        name: "str | None" = prop(is_searchable=True)
        rank: "int | None" = prop(is_sortable=True)

    s = schema_from_dataclass(Doc)
    by = {p.name: p for p in s.properties}
    assert by["name"].type == STRING
    assert by["rank"].type == INT64


def test_schema_from_dataclass_errors():
    import dataclasses

    from cloudfabric_eventsourcing_spark.schema import (
        prop,
        schema_from_dataclass,
    )

    @dataclasses.dataclass
    class NoKey:
        name: str = prop(is_searchable=True)

    with pytest.raises(ValueError, match="exactly one key"):
        schema_from_dataclass(NoKey)

    @dataclasses.dataclass
    class BadType:
        id: str = prop(is_key=True)
        blob: bytes = prop()

    with pytest.raises(ValueError, match="unsupported type"):
        schema_from_dataclass(BadType)

    with pytest.raises(TypeError, match="not a dataclass"):
        schema_from_dataclass(object)
