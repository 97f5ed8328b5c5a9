"""Structured Streaming projection maintenance (S4/T1/T2/T5/T10) and the
distributed-fold rebuild path."""

import decimal

import pytest
from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.domain import AggregateRepository
from cloudfabric_eventsourcing_spark.eventstore import (
    InMemoryMetadataRepository,
    ParquetEventStore,
)
from cloudfabric_eventsourcing_spark.projections import (
    IndexSelector,
    ParquetProjectionRepository,
    ProjectionsEngine,
    ProjectionIndexStateStore,
)
from cloudfabric_eventsourcing_spark.queries import Filter, ProjectionQuery
from cloudfabric_eventsourcing_spark.streaming import SparkStreamingProjectionsObserver
from tests.domain_fixtures import (
    ORDERS_PARTITION_KEY,
    Order,
    OrderItem,
    OrdersListProjectionBuilder,
    orders_list_schema,
    utcnow,
)

USER = {"userId": "u-1"}


@pytest.fixture
def world(spark, tmp_path):
    store = ParquetEventStore(str(tmp_path / "events"))
    store.initialize()
    state = ProjectionIndexStateStore(InMemoryMetadataRepository())
    schema = orders_list_schema()
    repo = ParquetProjectionRepository(schema, state, str(tmp_path / "proj"), spark)
    repo.ensure_index()
    state.update_rebuild_progress(
        schema.schema_name, schema.index_name(), 0, completed=True
    )
    agg_repo = AggregateRepository(store, Order)
    return store, state, repo, agg_repo


def seed_orders(agg_repo, n=5):
    orders = []
    for i in range(n):
        o = Order(
            f"00000000-0000-0000-0000-0000000000{i:02d}",
            f"Order {i}",
            [OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59"))],
            created_by_email=f"user{i}@gmail.com",
        )
        agg_repo.save(USER, o)
        loaded = agg_repo.load(o.id, ORDERS_PARTITION_KEY)
        loaded.add_item(OrderItem(utcnow(), f"Extra-{i}", decimal.Decimal("1.00") * (i + 1)))
        agg_repo.save(USER, loaded)
        orders.append(o)
    return orders


def test_streaming_projection_maintenance(spark, tmp_path, world):
    store, state, repo, agg_repo = world
    orders = seed_orders(agg_repo, 5)

    engine = ProjectionsEngine(store)
    engine.add_projection_builder(OrdersListProjectionBuilder(repo, IndexSelector.Write))
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt")
    )
    observer.process_all()  # availableNow drain — deterministic (T10)

    res = repo.query(ProjectionQuery(filters=[Filter("ItemsCount", "ge", 2)]))
    assert res.total_records_found == 5
    doc = repo.single(orders[0].id, ORDERS_PARTITION_KEY)
    assert doc["ItemsCount"] == 2
    assert [i["Name"] for i in doc["Items"]] == ["Dixit", "Extra-0"]

    # incremental: append MORE events, drain again from the checkpoint —
    # only the new events are processed (T2 exactly-once)
    loaded = agg_repo.load(orders[0].id, ORDERS_PARTITION_KEY)
    loaded.remove_item("Dixit")
    agg_repo.save(USER, loaded)
    observer.process_all()
    doc = repo.single(orders[0].id, ORDERS_PARTITION_KEY)
    assert doc["ItemsCount"] == 1
    assert [i["Name"] for i in doc["Items"]] == ["Extra-0"]
    # others untouched
    assert repo.single(orders[1].id, ORDERS_PARTITION_KEY)["ItemsCount"] == 2


def test_distributed_fold_rebuild_matches_live(spark, tmp_path, world):
    """The scale path: rebuild the whole projection with one distributed
    groupBy(stream_id) fold over the event log and compare it to the
    row-at-a-time live path (differential: vectorized vs parity engine)."""
    store, state, repo, agg_repo = world
    seed_orders(agg_repo, 5)

    # live path docs
    engine = ProjectionsEngine(store)
    engine.add_projection_builder(OrdersListProjectionBuilder(repo, IndexSelector.Write))
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt2")
    )
    observer.process_all()
    live = {
        r.document["Id"]: r.document
        for r in repo.query(ProjectionQuery()).records
    }

    # distributed fold: events -> per-stream document (declarative, no UDF)
    events = store.to_df(spark)
    placed = (
        events.where(F.col("event_type") == "OrderPlaced")
        .select(
            F.col("stream_id").alias("Id"),
            F.col("partition_key").alias("PartitionKey"),
            F.get_json_object("event_data", "$.order_name").alias("Name"),
        )
    )
    items_delta = events.where(
        F.col("event_type").isin("OrderItemAdded", "OrderItemRemoved")
    ).select(
        "stream_id",
        F.when(F.col("event_type") == "OrderItemAdded", 1).otherwise(-1).alias("delta"),
    )
    placed_counts = events.where(F.col("event_type") == "OrderPlaced").select(
        "stream_id",
        F.coalesce(
            F.json_array_length(F.get_json_object("event_data", "$.items")), F.lit(0)
        ).alias("initial"),
    )
    counts = (
        placed_counts.join(
            items_delta.groupBy("stream_id").agg(F.sum("delta").alias("d")),
            "stream_id",
            "left",
        )
        .select(
            "stream_id",
            (F.col("initial") + F.coalesce(F.col("d"), F.lit(0))).alias("ItemsCount"),
        )
    )
    folded = placed.join(counts, placed.Id == counts.stream_id).select(
        "Id", "PartitionKey", "Name", F.col("ItemsCount").cast("long")
    )
    rows = {r["Id"]: r for r in folded.collect()}

    assert set(rows) == set(live)
    for oid, doc in live.items():
        assert rows[oid]["ItemsCount"] == doc["ItemsCount"]
        assert rows[oid]["Name"] == doc["Name"]


def test_overwrite_from_df_rebuild_sink(spark, tmp_path, world):
    store, state, repo, agg_repo = world
    seed_orders(agg_repo, 3)
    events = store.to_df(spark)
    docs = (
        events.where(F.col("event_type") == "OrderPlaced")
        .select(
            F.col("stream_id").alias("Id"),
            F.col("partition_key").alias("PartitionKey"),
            F.col("created_at").alias("UpdatedAt"),
            F.get_json_object("event_data", "$.order_name").alias("Name"),
            F.lit(1).cast("long").alias("ItemsCount"),
        )
    )
    repo.overwrite_from_df(docs)
    res = repo.query(ProjectionQuery())
    assert res.total_records_found == 3


def test_projection_sql_view(spark, tmp_path, world):
    store, state, repo, agg_repo = world
    seed_orders(agg_repo, 4)
    from cloudfabric_eventsourcing_spark.projections import ProjectionsEngine
    from cloudfabric_eventsourcing_spark.streaming import (
        SparkStreamingProjectionsObserver,
    )
    from tests.domain_fixtures import OrdersListProjectionBuilder

    engine = ProjectionsEngine(store)
    engine.add_projection_builder(OrdersListProjectionBuilder(repo, IndexSelector.Write))
    SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt3")
    ).process_all()
    view = repo.create_or_replace_view()
    rows = spark.sql(
        f"SELECT Name, ItemsCount FROM {view} WHERE ItemsCount >= 2 ORDER BY Name"
    ).collect()
    assert all(r["ItemsCount"] >= 2 for r in rows) and rows
    # nested access through plain SQL
    emails = spark.sql(f"SELECT CreatedBy.Email AS e FROM {view} ORDER BY e").collect()
    assert emails[0]["e"].startswith("user0@")


def test_distributed_observer_never_applies_events_on_driver(
    spark, tmp_path, world
):
    """Pins the scale contract: in the default (distributed) mode the
    driver never hydrates/applies event rows — engine.handle_event is the
    per-event driver loop and must stay cold."""
    store, state, repo, agg_repo = world
    seed_orders(agg_repo, 3)

    engine = ProjectionsEngine(store)
    engine.add_projection_builder(
        OrdersListProjectionBuilder(repo, IndexSelector.Write)
    )

    def boom(event):  # pragma: no cover - failure path
        raise AssertionError("driver-side per-event apply in distributed mode")

    engine.handle_event = boom
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt_nd")
    )
    assert observer.mode == "distributed"
    observer.process_all()
    res = repo.query(ProjectionQuery(filters=[Filter("ItemsCount", "ge", 2)]))
    assert res.total_records_found == 3


def test_distributed_observer_propagates_deletes(spark, tmp_path, world):
    """A builder that hard-deletes a document must produce a tombstone that
    removes the doc from the real index (MERGE delete parity)."""
    store, state, repo, agg_repo = world
    orders = seed_orders(agg_repo, 2)

    class DeletingBuilder(OrdersListProjectionBuilder):
        def on_OrderItemRemoved(self, evt):
            self.repository.delete(
                evt.aggregate_id, evt.partition_key, selector=self.index_selector
            )

    engine = ProjectionsEngine(store)
    engine.add_projection_builder(DeletingBuilder(repo, IndexSelector.Write))
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt_del")
    )
    observer.process_all()
    assert repo.single(orders[0].id, ORDERS_PARTITION_KEY) is not None

    loaded = agg_repo.load(orders[0].id, ORDERS_PARTITION_KEY)
    loaded.remove_item("Dixit")
    agg_repo.save(USER, loaded)
    observer.process_all()
    assert repo.single(orders[0].id, ORDERS_PARTITION_KEY) is None
    assert repo.single(orders[1].id, ORDERS_PARTITION_KEY) is not None


def test_distributed_observer_never_collects_documents(spark, tmp_path, world):
    """Pins the df-native MERGE sink: in distributed mode with a Spark-
    backed repository, no document row crosses the driver — the driver
    upsert/delete entry points must stay cold (upserts land via
    merge_from_df executor writes, tombstones via one anti-join)."""
    store, state, repo, agg_repo = world
    orders = seed_orders(agg_repo, 3)

    class DeletingBuilder(OrdersListProjectionBuilder):
        def on_OrderItemRemoved(self, evt):
            self.repository.delete(
                evt.aggregate_id, evt.partition_key, selector=self.index_selector
            )

    engine = ProjectionsEngine(store)
    engine.add_projection_builder(DeletingBuilder(repo, IndexSelector.Write))

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side document funnel in distributed mode")

    repo._upsert_batch = boom
    repo._delete = boom
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt_nocollect")
    )
    observer.process_all()
    assert repo.single(orders[0].id, ORDERS_PARTITION_KEY)["ItemsCount"] == 2

    # deletes also stay executor-side: tombstone applied by the MERGE
    loaded = agg_repo.load(orders[0].id, ORDERS_PARTITION_KEY)
    loaded.remove_item("Dixit")
    agg_repo.save(USER, loaded)
    observer.process_all()
    assert repo.single(orders[0].id, ORDERS_PARTITION_KEY) is None
    assert repo.single(orders[1].id, ORDERS_PARTITION_KEY) is not None


def test_parity_observer_mode_still_available(spark, tmp_path, world):
    store, state, repo, agg_repo = world
    orders = seed_orders(agg_repo, 2)
    engine = ProjectionsEngine(store)
    engine.add_projection_builder(
        OrdersListProjectionBuilder(repo, IndexSelector.Write)
    )
    observer = SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt_par"), mode="parity"
    )
    observer.process_all()
    doc = repo.single(orders[0].id, ORDERS_PARTITION_KEY)
    assert doc["ItemsCount"] == 2


def test_update_documents_expr_bulk(spark, tmp_path, world):
    """Declarative bulk UPDATE..WHERE: matched docs change in one Spark
    job, unmatched pass through, UpdatedAt stamps only matched rows."""
    import datetime

    from pyspark.sql import functions as F

    store, state, repo, agg_repo = world
    orders = seed_orders(agg_repo, 4)
    engine = ProjectionsEngine(store)
    engine.add_projection_builder(
        OrdersListProjectionBuilder(repo, IndexSelector.Write)
    )
    SparkStreamingProjectionsObserver(
        spark, store, engine, str(tmp_path / "ckpt_upd")
    ).process_all()

    stamp = datetime.datetime(2030, 1, 1)
    repo.update_documents_expr(
        ProjectionQuery(filters=[Filter("Name", "string-contains", "Order 1")]),
        {"Name": F.concat(F.col("Name"), F.lit(" [archived]"))},
        partition_key=ORDERS_PARTITION_KEY,
        updated_at=stamp,
    )
    hit = repo.single(orders[1].id, ORDERS_PARTITION_KEY)
    assert hit["Name"] == "Order 1 [archived]"
    assert hit["UpdatedAt"] == stamp
    other = repo.single(orders[2].id, ORDERS_PARTITION_KEY)
    assert other["Name"] == "Order 2"
    assert other["UpdatedAt"] != stamp
    # idempotent re-read through the query path
    res = repo.query(
        ProjectionQuery(filters=[Filter("Name", "string-ends-with", "[archived]")])
    )
    assert res.total_records_found == 1


def test_read_stream_from_timestamp(spark, tmp_path):
    """Change-feed StartTime parity (CosmosDbEventStoreChangeFeedObserver
    .cs:67-93): read_stream(date_from=ts) subscribes from a point in
    time — earlier events are filtered at the source, and the boundary
    is INCLUSIVE so events sharing the boundary microsecond are not
    skipped (they arrive as duplicates of a replay that ended at ts and
    are absorbed by per-id dedup, like the replay path)."""
    import datetime

    from cloudfabric_eventsourcing_spark.eventstore.event import Event

    store = ParquetEventStore(str(tmp_path / "events"))
    store.initialize()
    t0 = datetime.datetime(2026, 8, 15, 10, 0, 0)
    t1 = datetime.datetime(2026, 8, 15, 11, 0, 0)
    t2 = datetime.datetime(2026, 8, 15, 12, 0, 0)

    def ev(sid, ts):
        return Event(
            aggregate_id=sid, partition_key="pk", timestamp=ts,
            aggregate_type="Thing",
        )

    # stream A: one old event, one AT the boundary; stream B: one at the
    # boundary (tie across streams), one after it
    store.append_to_stream(USER, "s-a", 0, [ev("s-a", t0), ev("s-a", t1)])
    store.append_to_stream(USER, "s-b", 0, [ev("s-b", t1), ev("s-b", t2)])

    seen = []

    def collect(batch, _epoch):
        seen.extend(
            (r["stream_id"], r["created_at"]) for r in batch.collect()
        )

    q = (
        store.read_stream(spark, date_from=t1)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # only boundary-and-later events: t0 filtered, BOTH t1 ties present
    assert sorted(seen) == [("s-a", t1), ("s-b", t1), ("s-b", t2)]

    # without date_from the same store yields everything (control)
    seen2 = []

    def collect2(batch, _epoch):
        seen2.extend(r["created_at"] for r in batch.collect())

    q2 = (
        store.read_stream(spark)
        .writeStream.foreachBatch(collect2)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(seen2) == [t0, t1, t1, t2]
