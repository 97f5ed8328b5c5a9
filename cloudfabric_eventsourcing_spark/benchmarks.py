"""Benchmark support domain: a minimal event type + projection builder used
by bench.py's T-replay measurement (and usable as an example of the event
-> projection pipeline over the synthetic testdata).

Lives in the package (not in bench.py) so executor processes can import it
by reference — event-type registration (`@register_event_type`) must run in
every Python worker for hydration inside distributed folds, and classes
defined in a __main__ script never import there.
"""

from __future__ import annotations

import dataclasses
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.eventstore import (
    Event,
    ParquetEventStore,
    register_event_type,
)
from cloudfabric_eventsourcing_spark.projections.builder import ProjectionBuilder
from cloudfabric_eventsourcing_spark.schema import (
    INT64,
    STRING,
    ProjectionSchema,
    PropertySchema,
)
from cloudfabric_eventsourcing_spark.sources import load_table

BENCH_PARTITION = "BenchEntity"


@register_event_type
@dataclasses.dataclass
class BenchValueEvent(Event):
    """One row of the synthetic `events` table as a domain event."""

    kind: str = ""
    value: float = 0.0


class BenchUserStatsBuilder(ProjectionBuilder):
    """Per-user counters folded one event at a time — the same shape as the
    reference's incremental counter builders (A4/A5,
    OrdersListProjectionBuilder.cs:33-66)."""

    def on_BenchValueEvent(self, evt: BenchValueEvent) -> None:
        doc = self.repository.single(
            evt.aggregate_id, evt.partition_key, selector=self.index_selector
        )
        if doc is None:
            doc = {"Id": evt.aggregate_id, "Purchases": 0, "NEvents": 0,
                   "ValueCents": 0}
        doc["NEvents"] += 1
        if evt.kind == "purchase":
            doc["Purchases"] += 1
        doc["ValueCents"] += int(round(evt.value * 100))
        self.upsert_document(doc, evt.partition_key, evt.timestamp)


def bench_schema() -> ProjectionSchema:
    return ProjectionSchema(
        "bench_user_stats",
        [
            PropertySchema("Id", STRING, is_key=True),
            PropertySchema("PartitionKey", STRING, is_filterable=True),
            PropertySchema("Purchases", INT64),
            PropertySchema("NEvents", INT64),
            PropertySchema("ValueCents", INT64),
        ],
    )


def make_bench_event_store(
    spark, sf_dir: str, path: str, limit: int | None = None
) -> ParquetEventStore:
    """Materialize the synthetic `events` table as a ParquetEventStore:
    stream per user, version = per-user ts order, payload JSON carrying
    (kind, value). One Spark write, fragments land directly as the store's
    part files."""
    events = load_table(spark, sf_dir, "events")
    if limit is not None:
        events = events.orderBy("ts", "event_id").limit(limit)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    records = events.select(
        F.col("event_id").cast("string").alias("id"),
        F.lit(BENCH_PARTITION).alias("partition_key"),
        # NTZ so the parquet logical type is timezone-naive µs — matching
        # the store's arrow schema (session tz is pinned UTC, values equal)
        F.col("ts").cast("timestamp_ntz").alias("created_at"),
        F.col("user_id").cast("string").alias("stream_id"),
        F.row_number().over(w).cast("int").alias("stream_version"),
        F.lit("BenchValueEvent").alias("event_type"),
        F.to_json(
            F.struct(
                F.col("user_id").cast("string").alias("aggregate_id"),
                F.lit(BENCH_PARTITION).alias("partition_key"),
                F.col("event_type").alias("kind"),
                F.col("value"),
                F.date_format(
                    "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                ).alias("timestamp"),
            )
        ).alias("event_data"),
        F.lit("{}").alias("user_info"),
        F.lit(1).alias("eventstore_schema_version"),
    )
    os.makedirs(path, exist_ok=True)
    records.write.mode("overwrite").parquet(path)
    store = ParquetEventStore(path)
    store.initialize()
    return store
