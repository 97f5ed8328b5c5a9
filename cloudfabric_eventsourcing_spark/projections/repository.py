"""Projection repositories: upsert/get/delete/query documents per index.

Behavioral spec (reference, read-only):
  - interface + index resolution: CloudFabric.Projections/ProjectionRepository.cs:11-111,252-373
  - Postgres upsert `INSERT ... ON CONFLICT DO UPDATE`: Implementations/
    .../PostgresqlProjectionRepository.cs:390-470; point get :197-302;
    deletes :304-388; query :472-677
  - in-memory dict backend: InMemoryProjectionRepository.cs:155-233

Backends:
  - InMemoryProjectionRepository — dict-of-dicts + the pure-Python AST
    evaluator (plans/pyeval). The live-maintenance fast path for small
    working sets and the parity backend for tests.
  - ParquetProjectionRepository — one directory per index holding an atomic
    snapshot parquet; upserts are batch MERGEs (read-minus-keys + concat +
    atomic snapshot swap), queries go through Spark + the Column
    translator. This is the single-node stand-in for a Delta table with
    `MERGE INTO` (SURVEY.md S7); on a cluster the same repository API maps
    onto Delta MERGE inside foreachBatch. Documents are stored COLUMNAR —
    an upgrade over the reference's row stores, free with parquet.

Every operation stamps PartitionKey + UpdatedAt like the reference
(PostgresqlProjectionRepository.cs:400-427).
"""

from __future__ import annotations

import datetime
import glob
import os
import threading
import uuid
from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from cloudfabric_eventsourcing_spark.plans import pyeval
from cloudfabric_eventsourcing_spark.plans.translator import facet_stats, run_query as spark_run_query
from cloudfabric_eventsourcing_spark.queries.projection_query import (
    ProjectionQuery,
    ProjectionQueryResult,
    QueryResultDocument,
)
from cloudfabric_eventsourcing_spark.schema import (
    ARRAY,
    BOOLEAN,
    DATETIME,
    DECIMAL,
    DOUBLE,
    GUID,
    INT32,
    INT64,
    OBJECT,
    SINGLE,
    STRING,
    ProjectionSchema,
    PropertySchema,
)
from cloudfabric_eventsourcing_spark.projections.state import (
    IndexSelector,
    ProjectionIndexStateStore,
)

_ARROW_SCALARS = {
    INT32: pa.int32(),
    INT64: pa.int64(),
    SINGLE: pa.float32(),
    DOUBLE: pa.float64(),
    DECIMAL: pa.decimal128(38, 6),
    BOOLEAN: pa.bool_(),
    STRING: pa.string(),
    DATETIME: pa.timestamp("us"),
    GUID: pa.string(),
}


def _arrow_type(p: PropertySchema) -> pa.DataType:
    if p.type == OBJECT:
        return pa.struct([(n.name, _arrow_type(n)) for n in p.nested_properties])
    if p.type == ARRAY:
        if p.nested_properties:
            return pa.list_(
                pa.struct([(n.name, _arrow_type(n)) for n in p.nested_properties])
            )
        return pa.list_(_ARROW_SCALARS[p.array_element_type])
    return _ARROW_SCALARS[p.type]


def arrow_schema(schema: ProjectionSchema) -> pa.Schema:
    return pa.schema([(p.name, _arrow_type(p)) for p in schema.properties])


class ProjectionRepository:
    """Base: index resolution via the state store + document lifecycle."""

    def __init__(self, schema: ProjectionSchema, state_store: ProjectionIndexStateStore):
        self.schema = schema
        self.state_store = state_store

    # -- physical ops implemented by backends -------------------------------
    def _create_index(self, index_name: str, schema: ProjectionSchema) -> None:
        raise NotImplementedError

    def _upsert_batch(self, index_name: str, docs: list[dict]) -> None:
        raise NotImplementedError

    def _get(self, index_name: str, id: str, partition_key: str) -> Optional[dict]:
        raise NotImplementedError

    def _delete(self, index_name: str, id: str, partition_key: str) -> None:
        raise NotImplementedError

    def _delete_all(self, index_name: str, partition_key: Optional[str]) -> None:
        raise NotImplementedError

    def _query(
        self, index_name: str, schema: ProjectionSchema, query: ProjectionQuery,
        partition_key: Optional[str]
    ) -> ProjectionQueryResult[dict]:
        raise NotImplementedError

    # -- public API ---------------------------------------------------------
    def ensure_index(self, selector: str = IndexSelector.ProjectionRebuild) -> str:
        """Create/register the index for this repository's schema and return
        the resolved physical index name. The selector is honored: the
        default (ProjectionRebuild) always resolves the exact-schema-hash
        index (bootstrap semantics); Write/ReadOnly resolve through the
        rebuild state machine and may raise IndexNotReadyError
        (ProjectionRepository.cs:252-373)."""
        name, _ = self.state_store.resolve_index(
            self.schema, selector, self._create_index
        )
        return name

    def _resolve(self, selector: str) -> tuple[str, ProjectionSchema]:
        return self.state_store.resolve_index(self.schema, selector, self._create_index)

    def upsert(
        self,
        document: dict,
        partition_key: str,
        updated_at: Optional[datetime.datetime] = None,
        selector: str = IndexSelector.Write,
    ) -> None:
        self.upsert_batch([document], partition_key, updated_at, selector)

    def upsert_batch(
        self,
        documents: list[dict],
        partition_key: str,
        updated_at: Optional[datetime.datetime] = None,
        selector: str = IndexSelector.Write,
    ) -> None:
        index_name, schema = self._resolve(selector)
        stamped = []
        for doc in documents:
            d = dict(doc)
            d["PartitionKey"] = partition_key
            if "UpdatedAt" in {p.name for p in schema.properties}:
                d["UpdatedAt"] = updated_at or _utcnow()
            stamped.append(d)
        self._upsert_batch(index_name, stamped)

    def single(
        self, id: str, partition_key: str, selector: str = IndexSelector.ReadOnly
    ) -> Optional[dict]:
        index_name, _ = self._resolve(selector)
        return self._get(index_name, id, partition_key)

    def delete(
        self, id: str, partition_key: str, selector: str = IndexSelector.Write
    ) -> None:
        index_name, _ = self._resolve(selector)
        self._delete(index_name, id, partition_key)

    def delete_all(
        self, partition_key: Optional[str] = None, selector: str = IndexSelector.Write
    ) -> None:
        index_name, _ = self._resolve(selector)
        self._delete_all(index_name, partition_key)

    def query(
        self,
        query: ProjectionQuery,
        partition_key: Optional[str] = None,
        selector: str = IndexSelector.ReadOnly,
    ) -> ProjectionQueryResult[dict]:
        index_name, schema = self._resolve(selector)
        return self._query(index_name, schema, query, partition_key)


def _describe_query(index_name, query, partition_key) -> str:
    """Backend-agnostic debug description (the in-memory analogue of the
    translated-query text the Spark backend emits): the reference fills
    DebugInformation with the backend query it ran
    (PostgresqlProjectionRepository.cs:619-652)."""
    parts = [f"index: {index_name}"]
    if partition_key is not None:
        parts.append(f"partition_key: PartitionKey == {partition_key!r}")
    parts.extend(f"filter: {f}" for f in query.filters)
    if query.search_text and query.search_text != "*":
        parts.append(
            f"search: mode={query.search_mode} analyzer={query.analyzer} "
            f"text={query.search_text!r}"
        )
    if query.order_by:
        parts.append(f"order_by: {query.order_by}")
    if query.offset:
        parts.append(f"offset: {query.offset}")
    if query.limit is not None:
        parts.append(f"limit: {query.limit}")
    return "\n".join(parts)


class InMemoryProjectionRepository(ProjectionRepository):
    def __init__(self, schema, state_store, include_debug_information=False):
        super().__init__(schema, state_store)
        self._indexes: dict[str, dict[tuple[str, str], dict]] = {}
        self._lock = threading.Lock()
        self._include_debug_information = include_debug_information

    def _create_index(self, index_name, schema):
        self._indexes.setdefault(index_name, {})

    def _key(self, doc_or_id) -> str:
        key_name = self.schema.key_name
        if isinstance(doc_or_id, dict):
            return str(doc_or_id[key_name])
        return str(doc_or_id)

    def _upsert_batch(self, index_name, docs):
        with self._lock:
            index = self._indexes.setdefault(index_name, {})
            for doc in docs:
                index[(self._key(doc), doc["PartitionKey"])] = doc

    def _get(self, index_name, id, partition_key):
        doc = self._indexes.get(index_name, {}).get((str(id), partition_key))
        return dict(doc) if doc else None

    def _delete(self, index_name, id, partition_key):
        self._indexes.get(index_name, {}).pop((str(id), partition_key), None)

    def _delete_all(self, index_name, partition_key):
        index = self._indexes.get(index_name, {})
        if partition_key is None:
            index.clear()
        else:
            for k in [k for k in index if k[1] == partition_key]:
                del index[k]

    def _query(self, index_name, schema, query, partition_key):
        docs = list(self._indexes.get(index_name, {}).values())
        if partition_key is not None:
            docs = [d for d in docs if d.get("PartitionKey") == partition_key]
        page, total = pyeval.run_query_docs(docs, query, schema)
        scoring = (
            query.scoring_profile == "tf"
            and query.search_text
            and query.search_text != "*"
        )
        hl_fields = [
            f
            for f in query.fields_to_highlight
            if query.search_text
            and query.search_text != "*"
            and schema.property(f) is not None
            and schema.property(f).is_searchable
        ]

        def record(d):
            score = (
                pyeval.score_doc(
                    query.search_text, d, schema, query.search_mode, query.analyzer
                )
                if scoring
                else 0.0
            )
            highlights = {}
            for f in hl_fields:
                hl = pyeval.highlight_doc(
                    d.get(f), query.search_text, query.search_mode
                )
                if hl is not None:
                    highlights[f] = [hl]
            return QueryResultDocument(
                document=dict(d), score=float(score), highlights=highlights
            )
        facets = {}
        if query.facet_info_to_return:
            matched = [
                d
                for d in docs
                if all(pyeval.eval_filter(f, d, schema) for f in query.filters)
                and pyeval.eval_search(
                    query.search_text, d, schema, query.search_mode,
                    query.analyzer, query.synonyms, query.phrase_slop,
                )
            ]
            facets = pyeval.facet_stats_docs(matched, query.facet_info_to_return)
        return ProjectionQueryResult(
            records=[record(d) for d in page],
            total_records_found=total,
            facets_stats=facets,
            debug_information=(
                _describe_query(index_name, query, partition_key)
                if self._include_debug_information
                else ""
            ),
        )


class ParquetProjectionRepository(ProjectionRepository):
    """Snapshot-parquet backend; requires a SparkSession for queries."""

    def __init__(
        self, schema, state_store, base_path: str, spark=None,
        include_debug_information=False,
    ):
        super().__init__(schema, state_store)
        self.base_path = base_path
        self.spark = spark
        # RLock: merge_from_df holds it across its read-compute-swap and
        # re-enters via overwrite_from_df's swap section
        self._lock = threading.RLock()
        self._schemas: dict[str, ProjectionSchema] = {}
        self._include_debug_information = include_debug_information

    # -- snapshot helpers ---------------------------------------------------
    def _dir(self, index_name: str) -> str:
        return os.path.join(self.base_path, index_name)

    def _snapshot_path(self, index_name: str) -> Optional[str]:
        """Current snapshot: either a single parquet file (driver-side
        MERGE path) or a DIRECTORY of part files (distributed rebuild path
        — the Spark-written layout is kept as-is so a 100 TB projection
        never funnels through the driver)."""
        snaps = sorted(
            glob.glob(os.path.join(self._dir(index_name), "snapshot-*.parquet"))
            + glob.glob(os.path.join(self._dir(index_name), "snapshot-*.dir"))
        )
        return snaps[-1] if snaps else None

    def _read(self, index_name: str) -> pa.Table:
        path = self._snapshot_path(index_name)
        schema = self._index_schema(index_name)
        if path is None:
            return arrow_schema(schema).empty_table()
        if os.path.isdir(path):
            import pyarrow.dataset as pa_ds

            return pa_ds.dataset(path, format="parquet").to_table()
        return pq.read_table(path)

    def _index_schema(self, index_name: str) -> ProjectionSchema:
        return self._schemas.get(index_name, self.schema)

    def _next_seq(self, index_name: str) -> int:
        old = self._snapshot_path(index_name)
        if old is None:
            return 0
        return int(os.path.basename(old).split("-")[1].split(".")[0]) + 1

    def _drop_old(self, keep: str) -> None:
        import shutil

        d = os.path.dirname(keep)
        for p in glob.glob(os.path.join(d, "snapshot-*")):
            if p != keep:
                shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)

    def _write_snapshot(self, index_name: str, table: pa.Table) -> None:
        d = self._dir(index_name)
        os.makedirs(d, exist_ok=True)
        seq = self._next_seq(index_name)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
        # coerce any ns timestamps (e.g. INT96 read back from a Spark
        # write) to µs so Spark can read the snapshot
        pq.write_table(table, tmp, coerce_timestamps="us", allow_truncated_timestamps=True)
        out = os.path.join(d, f"snapshot-{seq:08d}.parquet")
        os.rename(tmp, out)
        self._drop_old(out)

    def _create_index(self, index_name, schema):
        os.makedirs(self._dir(index_name), exist_ok=True)
        self._schemas[index_name] = schema

    # -- physical ops -------------------------------------------------------
    def _upsert_batch(self, index_name, docs):
        """Batch MERGE: current MINUS batch-keys UNION batch (Delta
        `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`
        equivalent, SURVEY.md S7)."""
        key = self.schema.key_name
        with self._lock:
            current = self._read(index_name)
            # last-writer-wins within the batch, matching upsert order
            dedup: dict[tuple[str, str], dict] = {}
            for d in docs:
                dedup[(str(d[key]), d["PartitionKey"])] = d
            batch = list(dedup.values())
            if current.num_rows:
                # match on the composite (key, PartitionKey) — two separate
                # is_in masks would wrongly match cross-pairs
                combo = pc.binary_join_element_wise(
                    pc.cast(current[key], pa.string()),
                    current["PartitionKey"],
                    "\x00",
                )
                batch_keys = pa.array([f"{k}\x00{p}" for k, p in dedup])
                kept = current.filter(
                    pc.invert(pc.is_in(combo, value_set=batch_keys))
                )
            else:
                kept = current
            new_rows = pa.Table.from_pylist(
                [_normalize_doc(d) for d in batch], schema=current.schema
            )
            self._write_snapshot(index_name, pa.concat_tables([kept, new_rows]))

    def _get(self, index_name, id, partition_key):
        table = self._read(index_name)
        if table.num_rows == 0:
            return None
        key = self._index_schema(index_name).key_name
        mask = pc.and_(
            pc.equal(pc.cast(table[key], pa.string()), str(id)),
            pc.equal(table["PartitionKey"], partition_key),
        )
        hit = table.filter(mask)
        return hit.to_pylist()[0] if hit.num_rows else None

    def _delete(self, index_name, id, partition_key):
        with self._lock:
            table = self._read(index_name)
            if table.num_rows == 0:
                return
            key = self._index_schema(index_name).key_name
            mask = pc.and_(
                pc.equal(pc.cast(table[key], pa.string()), str(id)),
                pc.equal(table["PartitionKey"], partition_key),
            )
            self._write_snapshot(index_name, table.filter(pc.invert(mask)))

    def _delete_all(self, index_name, partition_key):
        with self._lock:
            table = self._read(index_name)
            if partition_key is None:
                kept = table.schema.empty_table()
            else:
                kept = table.filter(
                    pc.invert(pc.equal(table["PartitionKey"], partition_key))
                )
            self._write_snapshot(index_name, kept)

    def to_df(self, selector: str = IndexSelector.ReadOnly):
        index_name, schema = self._resolve(selector)
        path = self._snapshot_path(index_name)
        if path is None:
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame([], schema.to_struct_type())
        return self.spark.read.parquet(path)

    def create_or_replace_view(
        self, view_name: Optional[str] = None, selector: str = IndexSelector.ReadOnly
    ) -> str:
        """Expose the resolved projection index as a Spark SQL temp view so
        users can `spark.sql` over it directly — the always-available
        escape hatch to the raw DataFrame/SQL surface."""
        name = view_name or self.schema.schema_name
        self.to_df(selector).createOrReplaceTempView(name)
        return name

    def _query(self, index_name, schema, query, partition_key):
        if self.spark is None:
            raise RuntimeError("ParquetProjectionRepository needs a SparkSession for queries")
        path = self._snapshot_path(index_name)
        if path is None:
            return ProjectionQueryResult(records=[], total_records_found=0)
        df = self.spark.read.parquet(path)
        return spark_run_query(
            df, query, schema, partition_key,
            include_debug_information=self._include_debug_information,
        )

    def update_documents_expr(
        self,
        query: ProjectionQuery,
        set_columns: dict,
        partition_key: Optional[str] = None,
        updated_at: Optional[datetime.datetime] = None,
        selector: str = IndexSelector.Write,
    ) -> None:
        """Declarative bulk UPDATE ... WHERE — the scale path for
        ProjectionBuilder.update_documents when the mutation is
        expressible as Column expressions (`{"Price": F.col("Price")*1.1}`).

        One Spark job: the current snapshot is read, matched rows get the
        new column values (non-matched rows pass through unchanged), and
        executors write the replacement snapshot directly — no document
        ever crosses the driver, unlike the callback form which pages
        results through `query()` (the reference's own shape,
        ProjectionBuilder.cs:109-135, kept for arbitrary-Python
        mutations). Equivalent to Delta `UPDATE ... WHERE` / `MERGE WHEN
        MATCHED UPDATE`."""
        from pyspark.sql import functions as F

        from cloudfabric_eventsourcing_spark.plans.translator import (
            filter_to_column,
            search_to_column,
        )

        if self.spark is None:
            raise RuntimeError("update_documents_expr needs a SparkSession")
        index_name, schema = self._resolve(selector)
        # same read-compute-swap atomicity as merge_from_df
        with self._lock:
            df = self.to_df(selector=selector)
            pred = F.lit(True)
            if partition_key is not None:
                pred = pred & (F.col("PartitionKey") == partition_key)
            for f in query.filters:
                pred = pred & filter_to_column(f, schema)
            search = search_to_column(
                query.search_text, schema, query.search_mode,
                query.analyzer, query.synonyms, query.phrase_slop,
            )
            if search is not None:
                pred = pred & search
            updates = dict(set_columns)
            if updated_at is not None and "UpdatedAt" in df.columns:
                updates.setdefault("UpdatedAt", F.lit(updated_at))
            updated = df.withColumns(
                {
                    name: F.when(pred, expr).otherwise(F.col(name))
                    for name, expr in updates.items()
                }
            )
            self.overwrite_from_df(updated, selector=selector)

    def merge_from_df(
        self,
        docs_df,
        selector: str = IndexSelector.Write,
        tombstone_col: Optional[str] = None,
    ) -> None:
        """Df-native MERGE: upsert every row of `docs_df` into the snapshot
        and (when `tombstone_col` names a boolean column) apply tombstone
        rows as deletes — all executor-side, no document ever crosses the
        driver. This is the live-maintenance sink for the distributed
        observer: Delta `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT
        MATCHED INSERT WHEN MATCHED AND tombstone DELETE` over a snapshot
        store (PostgresqlProjectionRepository.cs:390-470 batch upsert +
        :304-388 delete, collapsed into one plan).

        Shape at scale: the changed-key set is bounded by the streams a
        micro-batch touched, so it is broadcast to anti-join the big
        current snapshot (no shuffle of the snapshot); on Delta the same
        call maps to MERGE INTO which rewrites only matched files instead
        of the full snapshot."""
        from pyspark.sql import functions as F

        if self.spark is None:
            raise RuntimeError("merge_from_df needs a SparkSession")
        index_name, schema = self._resolve(selector)
        key = schema.key_name
        # hold the repo lock across read-compute-swap so a concurrent
        # driver-side _upsert_batch/_delete can't land between our snapshot
        # read and the replacement swap and be silently dropped (the lock
        # is re-entered by overwrite_from_df's swap section)
        with self._lock:
            current = self.to_df(selector=selector)
            changed = (
                docs_df.select(
                    F.col(key).cast("string").alias("__mk"),
                    F.col("PartitionKey").alias("__mp"),
                )
                .distinct()
            )
            kept = current.join(
                F.broadcast(changed),
                (current[key].cast("string") == changed["__mk"])
                & (current["PartitionKey"] == changed["__mp"]),
                "left_anti",
            )
            ups = docs_df
            if tombstone_col is not None:
                ups = ups.where(~F.col(tombstone_col)).drop(tombstone_col)
            merged = kept.unionByName(ups.select(*current.columns))
            self.overwrite_from_df(merged, selector=selector)

    def overwrite_from_df(self, df, selector: str = IndexSelector.ProjectionRebuild):
        """Distributed rebuild sink: the Spark job writes the new snapshot
        directory directly (parallel part files, executors never funnel
        through the driver); an atomic rename publishes it (the scale path
        — SURVEY.md §3.3: 'embarrassingly parallel in Spark, unlike the
        reference's single-cursor loop')."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        index_name, _ = self._resolve(selector)
        d = self._dir(index_name)
        os.makedirs(d, exist_ok=True)
        # store convention: timestamps are timezone-NAIVE UTC µs (what the
        # pyarrow MERGE path writes); cast tz-aware columns to NTZ so a
        # Spark-written snapshot reads back identically (session tz is UTC,
        # values unchanged)
        casts = {
            f.name: F.col(f.name).cast("timestamp_ntz")
            for f in df.schema.fields
            if isinstance(f.dataType, T.TimestampType)
        }
        if casts:
            df = df.withColumns(casts)
        tmp = os.path.join(d, f".tmp-spark-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp)
        with self._lock:
            out = os.path.join(d, f"snapshot-{self._next_seq(index_name):08d}.dir")
            os.rename(tmp, out)
            self._drop_old(out)


def _utcnow() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)


def _normalize_doc(doc: dict) -> dict:
    out = {}
    for k, v in doc.items():
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        out[k] = v
    return out
