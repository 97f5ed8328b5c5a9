"""Projection engine tests — ports of the reference scenarios:
live update (OrderTests.cs:133-210), single-doc rebuild (:212-261), full
rebuild (:263-315), UpdatedAt via synthetic event (:611-662), schema
evolution + rebuild invariant (DynamicProjectionSchemaTests.cs:420-555),
rebuild lease (ProjectionRepository.cs:375-442)."""

import datetime
import decimal

import pytest

from cloudfabric_eventsourcing_spark.domain import AggregateRepository
from cloudfabric_eventsourcing_spark.eventstore import (
    InMemoryEventStore,
    InMemoryMetadataRepository,
)
from cloudfabric_eventsourcing_spark.projections import (
    IndexNotReadyError,
    IndexSelector,
    InMemoryProjectionRepository,
    ProjectionsEngine,
    ProjectionsRebuildProcessor,
    ProjectionIndexStateStore,
)
from cloudfabric_eventsourcing_spark.queries import Filter, ProjectionQuery
from cloudfabric_eventsourcing_spark.schema import DECIMAL, PropertySchema
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
def world():
    store = InMemoryEventStore()
    state = ProjectionIndexStateStore(InMemoryMetadataRepository())
    schema = orders_list_schema()
    repo = InMemoryProjectionRepository(schema, state)
    repo.ensure_index()
    # mark the initial index rebuilt so Write selector resolves (fresh
    # system with no history — same as the reference tests' setup path)
    state.update_rebuild_progress(
        schema.schema_name, schema.index_name(), 0, completed=True
    )
    engine = ProjectionsEngine(store)
    engine.add_projection_builder(
        OrdersListProjectionBuilder(repo, IndexSelector.Write)
    )
    engine.start()
    agg_repo = AggregateRepository(store, Order)
    return store, state, repo, engine, agg_repo


def place(agg_repo, oid, name, items=(), email="john@gmail.com"):
    order = Order(oid, name, list(items), created_by_email=email)
    agg_repo.save(USER, order)
    return order


def test_live_projection_update(world):
    store, state, repo, engine, agg_repo = world
    order = place(
        agg_repo,
        "00000000-0000-0000-0000-000000000001",
        "New Year's Gifts",
        [OrderItem(utcnow(), "Caverna", decimal.Decimal("12.00"))],
    )
    doc = repo.single(order.id, ORDERS_PARTITION_KEY)
    assert doc is not None
    assert doc["Name"] == "New Year's Gifts"
    assert doc["ItemsCount"] == 1

    loaded = agg_repo.load(order.id, ORDERS_PARTITION_KEY)
    loaded.add_item(OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59")))
    agg_repo.save(USER, loaded)
    doc = repo.single(order.id, ORDERS_PARTITION_KEY)
    assert doc["ItemsCount"] == 2
    assert [i["Name"] for i in doc["Items"]] == ["Caverna", "Dixit"]

    loaded = agg_repo.load(order.id, ORDERS_PARTITION_KEY)
    loaded.remove_item("Caverna")
    agg_repo.save(USER, loaded)
    doc = repo.single(order.id, ORDERS_PARTITION_KEY)
    assert doc["ItemsCount"] == 1
    assert [i["Name"] for i in doc["Items"]] == ["Dixit"]


def test_projection_query_search_and_count(world):
    store, state, repo, engine, agg_repo = world
    place(agg_repo, "00000000-0000-0000-0000-000000000001", "First queryable order",
          [OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59")),
           OrderItem(utcnow(), "Patchwork", decimal.Decimal("4.85"))])
    place(agg_repo, "00000000-0000-0000-0000-000000000002",
          "Second queryable order with additional parameter")
    # search "ORDER" limit 1 -> total 2, records 1 (OrderTests.cs:369-378)
    res = repo.query(ProjectionQuery(search_text="ORDER", limit=1))
    assert res.total_records_found == 2
    assert len(res.records) == 1
    # ItemsCount > 1 -> exactly 1 (OrderTests.cs:389-393)
    res = repo.query(ProjectionQuery(filters=[Filter("ItemsCount", "gt", 1)]))
    assert res.total_records_found == 1
    assert res.records[0].document["Name"] == "First queryable order"


def test_updated_at_via_synthetic_event(world):
    store, state, repo, engine, agg_repo = world
    order = place(agg_repo, "00000000-0000-0000-0000-000000000001", "X")
    before = repo.single(order.id, ORDERS_PARTITION_KEY)["UpdatedAt"]

    class OtherBuilderTarget:  # new event type the list builder doesn't handle
        pass

    # simulate an order event type not handled by the builder: use a raw
    # Event subclass registered ad hoc
    import dataclasses

    from cloudfabric_eventsourcing_spark.eventstore import Event, register_event_type

    @register_event_type
    @dataclasses.dataclass
    class OrderShipped(Event):
        pass

    ts = utcnow() + datetime.timedelta(seconds=5)
    ev = OrderShipped(
        aggregate_id=order.id,
        partition_key=ORDERS_PARTITION_KEY,
        timestamp=ts,
        aggregate_type="Order",
    )
    store.append_to_stream(USER, order.id, 1, [ev])
    after = repo.single(order.id, ORDERS_PARTITION_KEY)["UpdatedAt"]
    assert after == ts and after != before


def test_single_document_rebuild(world):
    store, state, repo, engine, agg_repo = world
    order = place(agg_repo, "00000000-0000-0000-0000-000000000001", "R",
                  [OrderItem(utcnow(), "Caverna", decimal.Decimal("12.00"))])
    repo.delete(order.id, ORDERS_PARTITION_KEY)
    assert repo.single(order.id, ORDERS_PARTITION_KEY) is None
    engine.rebuild_one(order.id, ORDERS_PARTITION_KEY)
    doc = repo.single(order.id, ORDERS_PARTITION_KEY)
    assert doc is not None and doc["ItemsCount"] == 1


def test_full_rebuild_replay(world):
    store, state, repo, engine, agg_repo = world
    for i in range(7):
        o = place(agg_repo, f"00000000-0000-0000-0000-00000000000{i}", f"Order {i}")
        loaded = agg_repo.load(o.id, ORDERS_PARTITION_KEY)
        loaded.add_item(OrderItem(utcnow(), "Extra", decimal.Decimal("1.00")))
        agg_repo.save(USER, loaded)
    repo.delete_all()
    assert repo.query(ProjectionQuery()).total_records_found == 0
    n = engine.replay_events(chunk_size=3)
    assert n == 14
    res = repo.query(ProjectionQuery())
    assert res.total_records_found == 7
    assert all(r.document["ItemsCount"] == 1 for r in res.records)


def test_replay_handles_duplicate_timestamps(world):
    store, state, repo, engine, agg_repo = world
    shared_ts = utcnow()
    from tests.domain_fixtures import OrderPlaced

    for i in range(6):
        ev = OrderPlaced(
            aggregate_id=f"00000000-0000-0000-0000-00000000001{i}",
            partition_key=ORDERS_PARTITION_KEY,
            timestamp=shared_ts,  # all six share one timestamp
            order_name=f"Dup {i}",
            aggregate_type="Order",
        )
        store.append_to_stream(USER, ev.aggregate_id, 0, [ev])
    repo.delete_all()
    n = engine.replay_events(chunk_size=2)
    assert n == 6  # strict-cursor reference behavior would lose 4 of these
    assert repo.query(ProjectionQuery()).total_records_found == 6


def test_rebuild_processor_with_state_machine(world):
    store, state, repo, engine, agg_repo = world
    for i in range(3):
        place(
            agg_repo,
            f"00000000-0000-0000-0000-00000000002{i}",
            f"P{i}",
            [
                OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59")),
                OrderItem(utcnow(), "Patchwork", decimal.Decimal("4.85")),
            ],
        )

    # evolve the schema: add TotalPrice (DynamicProjectionSchemaTests.cs:420-555)
    new_schema = orders_list_schema()
    new_schema.properties.append(
        PropertySchema("TotalPrice", DECIMAL, is_filterable=True)
    )
    new_repo = InMemoryProjectionRepository(new_schema, state)

    class V2Builder(OrdersListProjectionBuilder):
        def on_OrderPlaced(self, evt):
            super().on_OrderPlaced(evt)

            def mutate(doc):
                doc["TotalPrice"] = sum(
                    (i["Amount"] for i in doc["Items"]), decimal.Decimal(0)
                )

            self.update_document(evt.aggregate_id, evt.partition_key, evt.timestamp, mutate)

    # write selector on the evolved schema must refuse until rebuilt
    state_names_before = new_schema.index_name()
    fresh_repo = InMemoryProjectionRepository(new_schema, state)
    # Write selector must refuse an index whose rebuild never completed
    # (ProjectionRepository.cs:306-337). A brand-new projection name (no
    # state row) is allowed through — that's the reference's bootstrap path
    # — so create the state first, then attempt the write.
    lone_schema = orders_list_schema()
    lone_schema.schema_name = "lonely_projection"
    lone_repo = InMemoryProjectionRepository(lone_schema, state)
    lone_repo.ensure_index()
    with pytest.raises(IndexNotReadyError):
        lone_repo.upsert({"Id": "x"}, "P")

    def engine_factory(index_name):
        e = ProjectionsEngine(store)
        e.add_projection_builder(
            V2Builder(new_repo, IndexSelector.ProjectionRebuild)
        )
        return e

    proc = ProjectionsRebuildProcessor(state, engine_factory, store)
    rebuilt = proc.rebuild_projections_that_require_rebuild()
    assert new_schema.index_name() in rebuilt

    # after completed rebuild, reads resolve to the NEW index and TotalPrice
    # is the exact recomputed sum (rebuild == recompute invariant)
    res = new_repo.query(ProjectionQuery(filters=[Filter("Name", "eq", "P0")]))
    assert res.total_records_found == 1
    # rebuild == full recompute invariant (the reference's 42.39 assertion)
    assert res.records[0].document["TotalPrice"] == decimal.Decimal("11.44")
    st = state.get(new_schema.schema_name)
    completed = [s for s in st.indexes_statuses if s.rebuild_completed_at]
    assert completed
    # lease: nothing left to rebuild
    again = proc.rebuild_projections_that_require_rebuild()
    assert new_schema.index_name() not in again


def test_multi_projection_fanout(world):
    """T6: one event store, several builders — each receives only its
    handled types; unhandled order events reach the second builder as the
    synthetic AggregateUpdated (ProjectionsEngine.cs:111-164)."""
    import dataclasses

    from cloudfabric_eventsourcing_spark.eventstore import Event, register_event_type
    from cloudfabric_eventsourcing_spark.projections import ProjectionBuilder
    from cloudfabric_eventsourcing_spark.schema import (
        GUID,
        INT64,
        STRING,
        ProjectionSchema,
        PropertySchema,
    )

    store, state, repo, engine, agg_repo = world

    counts_schema = ProjectionSchema(
        "order_counts",
        [
            PropertySchema("Id", GUID, is_key=True),
            PropertySchema("PartitionKey", STRING),
            PropertySchema("Placed", INT64),
            PropertySchema("Touched", INT64),
        ],
    )
    counts_repo = InMemoryProjectionRepository(counts_schema, state)
    counts_repo.ensure_index()
    state.update_rebuild_progress(
        counts_schema.schema_name, counts_schema.index_name(), 0, completed=True
    )

    class CountsBuilder(ProjectionBuilder):
        aggregate_types = ("Order",)

        def on_OrderPlaced(self, evt):
            self.upsert_document(
                {"Id": evt.aggregate_id, "Placed": 1, "Touched": 0},
                evt.partition_key,
                evt.timestamp,
            )

        def on_AggregateUpdated(self, evt):
            self.update_document(
                evt.aggregate_id,
                evt.partition_key,
                evt.updated_at,
                lambda d: d.update(Touched=d["Touched"] + 1),
            )

    engine.add_projection_builder(CountsBuilder(counts_repo, IndexSelector.Write))
    order = place(agg_repo, "00000000-0000-0000-0000-0000000000aa", "Fan")
    # OrderItemAdded is handled by the list builder but NOT by CountsBuilder
    # -> CountsBuilder gets the synthetic update instead
    loaded = agg_repo.load(order.id, ORDERS_PARTITION_KEY)
    loaded.add_item(OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59")))
    agg_repo.save(USER, loaded)

    list_doc = repo.single(order.id, ORDERS_PARTITION_KEY)
    counts_doc = counts_repo.single(order.id, ORDERS_PARTITION_KEY)
    assert list_doc["ItemsCount"] == 1
    assert counts_doc["Placed"] == 1
    assert counts_doc["Touched"] == 1  # synthetic event, not the concrete one


def test_rebuild_processor_distributed_path(world, spark):
    """T8 scale mode: the rebuild processor drives the per-stream
    applyInPandas fold + snapshot write instead of the serial cursor loop,
    with per-batch progress updates. Result must equal the serial
    recompute (rebuild == recompute invariant)."""
    store, state, repo, engine, agg_repo = world
    for i in range(4):
        place(
            agg_repo,
            f"00000000-0000-0000-0000-00000000003{i}",
            f"D{i}",
            [
                OrderItem(utcnow(), "Dixit", decimal.Decimal("6.59")),
                OrderItem(utcnow(), "Patchwork", decimal.Decimal("4.85")),
            ],
        )

    new_schema = orders_list_schema()
    new_schema.properties.append(
        PropertySchema("TotalPrice", DECIMAL, is_filterable=True)
    )
    new_repo = InMemoryProjectionRepository(new_schema, state)

    class V2Builder(OrdersListProjectionBuilder):
        def on_OrderPlaced(self, evt):
            super().on_OrderPlaced(evt)

            def mutate(doc):
                doc["TotalPrice"] = sum(
                    (i["Amount"] for i in doc["Items"]), decimal.Decimal(0)
                )

            self.update_document(
                evt.aggregate_id, evt.partition_key, evt.timestamp, mutate
            )

    def engine_factory(index_name):
        e = ProjectionsEngine(store)
        e.add_projection_builder(V2Builder(new_repo, IndexSelector.ProjectionRebuild))
        return e

    proc = ProjectionsRebuildProcessor(
        state, engine_factory, store, spark=spark, rebuild_batches=2
    )
    assert proc.mode == "auto" and proc.spark is not None  # distributed path
    rebuilt = proc.rebuild_projections_that_require_rebuild()
    assert new_schema.index_name() in rebuilt

    res = new_repo.query(ProjectionQuery(filters=[Filter("Name", "eq", "D0")]))
    assert res.total_records_found == 1
    assert res.records[0].document["TotalPrice"] == decimal.Decimal("11.44")
    assert res.records[0].document["ItemsCount"] == 2
    st = state.get(new_schema.schema_name)
    completed = [s for s in st.indexes_statuses if s.rebuild_completed_at]
    assert completed and completed[0].rebuild_events_processed == 4
    assert completed[0].total_events_to_process == 4


def test_threaded_rebuild_waves_drain_pending_rebuilds(tmp_path):
    """rebuild_projections_that_require_rebuild(max_parallel_tasks=N):
    the reference worker's in-process concurrency shape
    (ProjectionsRebuildProcessor.cs:28-59, maxParallelTasks=4) — waves
    of N concurrent rebuilds until a full empty pass.  Three pending
    rebuilds with N=2 forces a mixed wave (1 name + 1 None) whose
    remainder must still drain; the now thread-safe metadata CAS
    guarantees each index is acquired exactly once."""
    import decimal as _dec

    from cloudfabric_eventsourcing_spark.eventstore import (
        JsonFileMetadataRepository,
        ParquetEventStore,
    )

    store = ParquetEventStore(str(tmp_path / "events"))
    store.initialize()
    repo = AggregateRepository(store, Order)
    for i in range(10):
        o = Order(
            f"{i:08d}-0000-0000-0000-0000000000bb",
            f"T{i}",
            [OrderItem(utcnow(), "seed", _dec.Decimal("1.00"))],
        )
        repo.save(USER, o)

    state = ProjectionIndexStateStore(
        JsonFileMetadataRepository(str(tmp_path / "state.json"))
    )
    names = ("thr_proj_a", "thr_proj_b", "thr_proj_c")
    repos = {}
    for nm in names:
        schema = orders_list_schema()
        schema.schema_name = nm
        repos[nm] = InMemoryProjectionRepository(schema, state)
        repos[nm].ensure_index()
    pending = {state.get(nm).indexes_statuses[0].index_name for nm in names}
    assert len(pending) == 3

    def factory(index_name):
        e = ProjectionsEngine(store)
        for nm in names:
            schema = orders_list_schema()
            schema.schema_name = nm
            if schema.index_name() == index_name:
                e.add_projection_builder(
                    OrdersListProjectionBuilder(
                        repos[nm], IndexSelector.ProjectionRebuild
                    )
                )
        assert e._builders, index_name
        return e

    proc = ProjectionsRebuildProcessor(
        state, factory, store, chunk_size=5, mode="serial"
    )
    done = proc.rebuild_projections_that_require_rebuild(max_parallel_tasks=2)
    # every pending index rebuilt EXACTLY once (no double-acquire)
    assert sorted(done) == sorted(pending)
    for nm in names:
        st = state.get(nm)
        assert all(s.rebuild_completed_at for s in st.indexes_statuses), nm


def test_no_cas_lease_fallback_uses_nonce_not_timestamp(monkeypatch):
    """r7 advice pin: for custom metadata repos WITHOUT compare_and_upsert,
    the blind-save + re-read fallback must establish ownership with a
    per-worker nonce.  Two workers sampling the SAME microsecond
    timestamp (frozen clock here) would both pass a timestamp-equality
    check and double-acquire; with the nonce, exactly one wins."""
    import json

    from cloudfabric_eventsourcing_spark.projections import state as state_mod

    class NoCasRepo:
        # deliberately NO compare_and_upsert: exercises the fallback
        def __init__(self):
            self._items = {}

        def load_item(self, item_id, partition_key):
            return self._items.get((item_id, partition_key))

        def upsert_item(self, item_id, partition_key, item):
            self._items[(item_id, partition_key)] = item

    frozen = datetime.datetime(2026, 8, 15, 12, 0, 0)
    monkeypatch.setattr(state_mod, "_utcnow", lambda: frozen)

    repo = NoCasRepo()
    store_a = ProjectionIndexStateStore(repo)
    schema = orders_list_schema()
    schema.schema_name = "nonce_proj"
    st = state_mod.ProjectionIndexState(
        "nonce_proj",
        frozen,
        [state_mod._new_status(schema, schema.properties_hash(), "idx_n1")],
    )
    store_a.save(st)

    # interleave: the instant worker A's blind save lands, worker B's
    # competing blind save (computed from the SAME pre-lease read, same
    # frozen timestamp, its own nonce) overwrites it — the last-writer-
    # wins window the re-read check exists for
    b_nonce = "b-worker-nonce"
    real_upsert = repo.upsert_item
    fired = [False]

    def racing_upsert(item_id, partition_key, item):
        real_upsert(item_id, partition_key, item)
        if not fired[0]:
            fired[0] = True
            b_item = json.loads(json.dumps(item))
            b_item["indexes_statuses"][0]["rebuild_owner_nonce"] = b_nonce
            real_upsert(item_id, partition_key, b_item)

    repo.upsert_item = racing_upsert
    a_state, a_index = store_a.acquire_and_lock_rebuild()

    # the persisted lease carries B's nonce and A's (identical) timestamp:
    # a timestamp-equality ownership check would have WRONGLY let A win
    row = repo.load_item("nonce_proj", ProjectionIndexStateStore.PARTITION)
    assert state_mod._unaiso(row["updated_at"]) == frozen
    assert row["indexes_statuses"][0]["rebuild_owner_nonce"] == b_nonce
    assert a_index is None and a_state is None


def test_two_process_rebuild_workers_split_pending_rebuilds(tmp_path):
    """The reference worker runs maxParallelTasks rebuild processors
    against one state store (ProjectionsRebuildProcessor.cs:28-59); two
    worker PROCESSES sharing a JsonFileMetadataRepository must split two
    pending rebuilds — the CAS lease guarantees no index is acquired
    twice — and both must complete.  Workers synchronize on a barrier
    file so the race is real, not sequential."""
    import decimal as _dec
    import json
    import os
    import subprocess
    import sys
    import time

    from cloudfabric_eventsourcing_spark.eventstore import (
        JsonFileMetadataRepository,
        ParquetEventStore,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    store = ParquetEventStore(str(tmp_path / "events"))
    store.initialize()
    repo = AggregateRepository(store, Order)
    for i in range(30):
        o = Order(
            f"{i:08d}-0000-0000-0000-0000000000aa",
            f"W{i}",
            [OrderItem(utcnow(), "seed", _dec.Decimal("1.00"))],
        )
        repo.save(USER, o)
        loaded = repo.load(o.id, ORDERS_PARTITION_KEY)
        for j in range(3):
            loaded.add_item(OrderItem(utcnow(), f"i{j}", _dec.Decimal("2.00")))
        repo.save(USER, loaded)

    state_path = str(tmp_path / "state.json")
    state = ProjectionIndexStateStore(JsonFileMetadataRepository(state_path))
    names = ("two_proc_proj_a", "two_proc_proj_b")
    for nm in names:
        schema = orders_list_schema()
        schema.schema_name = nm
        InMemoryProjectionRepository(schema, state).ensure_index()
    pending = {
        state.get(nm).indexes_statuses[0].index_name for nm in names
    }
    assert len(pending) == 2

    barrier = str(tmp_path / "go")
    worker = r"""
import json, os, sys, time
root, state_path, store_path, barrier = sys.argv[1:5]
sys.path.insert(0, root)
from cloudfabric_eventsourcing_spark.eventstore import (
    JsonFileMetadataRepository, ParquetEventStore,
)
from cloudfabric_eventsourcing_spark.projections import (
    IndexSelector, InMemoryProjectionRepository, ProjectionsEngine,
    ProjectionsRebuildProcessor, ProjectionIndexStateStore,
)
from tests.domain_fixtures import OrdersListProjectionBuilder, orders_list_schema
state = ProjectionIndexStateStore(JsonFileMetadataRepository(state_path))
store = ParquetEventStore(store_path)
store.initialize()
def factory(index_name):
    e = ProjectionsEngine(store)
    for nm in ("two_proc_proj_a", "two_proc_proj_b"):
        schema = orders_list_schema()
        schema.schema_name = nm
        if schema.index_name() == index_name:
            repo = InMemoryProjectionRepository(schema, state)
            e.add_projection_builder(
                OrdersListProjectionBuilder(repo, IndexSelector.ProjectionRebuild)
            )
    assert e._builders, index_name
    return e
proc = ProjectionsRebuildProcessor(state, factory, store, chunk_size=5, mode="serial")
while not os.path.exists(barrier):
    time.sleep(0.001)
print(json.dumps(proc.rebuild_projections_that_require_rebuild()), flush=True)
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, root, state_path,
             str(tmp_path / "events"), barrier],
            cwd=root, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for _ in range(2)
    ]
    time.sleep(1.0)  # let both interpreters import and reach the barrier
    with open(barrier, "w") as fh:
        fh.write("go")
    results = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]
        results.append(json.loads(out.decode().strip().splitlines()[-1]))

    done = [ix for r in results for ix in r]
    # CAS lease: every pending index rebuilt EXACTLY once across workers
    assert sorted(done) == sorted(pending), results
    # and the race genuinely split: each worker rebuilt exactly one
    assert [len(r) for r in results] == [1, 1], results
    for nm in names:
        st = state.get(nm)
        assert all(s.rebuild_completed_at for s in st.indexes_statuses), nm
