"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

Broadcast handles small dimensions and salting handles hot keys; the third
scale tool is bucketing — pre-shuffling both sides of a *repeated* big-big
join into the same hash layout at write time, so every subsequent join on
the bucket key runs with zero Exchange. On a cluster this is Delta/Iceberg
bucket (or liquid-clustering) layout; Spark's parquet bucketed tables give
the identical planner behavior locally.

The win is per-JOIN, paid once per WRITE: bucket the event log by
stream_id and every projection fold / point correlation joins co-located;
bucket two fact tables by the shared key and the nightly reconciliation
join never shuffles either side.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    managed parquet table. Joins between tables bucketed on the same
    columns with the same ``n_buckets`` plan without an Exchange; matching
    ``sort_cols`` also removes the Sort below a sort-merge join."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the final physical plan (AQE-aware
    after an action, pre-execution plan otherwise) — the metric bucketing
    is meant to drive to zero for the join inputs."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
