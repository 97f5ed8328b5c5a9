"""Sequence packing for LLM training pipelines.

The standard GPT-style data layout concatenates every document (in a
deterministic order) into one token stream and cuts it into fixed
``ctx_len`` chunks; a document is fully described by its global token
offset and the chunk range it spans.  Computing that offset is a global
prefix sum — the textbook scale trap in Spark: the obvious
``SUM(...) OVER (ORDER BY key)`` uses an UNPARTITIONED window, which
funnels all 100 TB through a single task.  ``global_prefix_sum``
implements the two-phase form instead: per-bucket totals (one tiny row
per bucket), an ordered prefix over that tiny frame only, broadcast
back, then a within-bucket cumsum that parallelizes across buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out: str = "running_total",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in ``order_col`` order,
    computed without an unpartitioned window over the data.

    ``order_col`` must be numeric (dense ids, timestamps-as-epoch):
    buckets are ``floor(order/bucket_size)`` so bucket order == key
    order.  Three steps:

    1. per-bucket totals — one aggregate row per bucket (for 100 TB of
       1 KiB docs at the default bucket_size that is ~100k rows);
    2. exclusive prefix over bucket totals — the only ordered window,
       and it runs over the tiny per-bucket frame;
    3. broadcast the bucket offsets back and cumsum WITHIN each bucket
       (window partitioned by bucket — parallel across buckets).
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_size))
    with_b = df.withColumn("_bucket", bucket)
    totals = with_b.groupBy("_bucket").agg(F.sum(value_col).alias("_btotal"))
    prior = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_btotal").over(prior), F.lit(0)).alias("_boffset"),
    )
    within = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_b.join(F.broadcast(offsets), "_bucket")
        .withColumn(out, F.col("_boffset") + F.sum(value_col).over(within))
        .drop("_bucket", "_boffset")
    )


def pack_offsets(
    df: DataFrame,
    ctx_len: int,
    count_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Chunk placement for concatenate-then-cut packing: each document
    occupies ``[start_offset, start_offset + n_tokens)`` of the global
    token stream and spans chunks ``first_chunk..last_chunk`` of size
    ``ctx_len``.  Empty documents occupy no tokens and are pinned to
    ``last_chunk == first_chunk`` rather than the degenerate
    ``first_chunk - 1``."""
    cum = global_prefix_sum(
        df, count_col, order_col, out="_cum", bucket_size=bucket_size
    )
    start = F.col("_cum") - F.col(count_col)
    first = F.floor(start / ctx_len)
    last = F.when(F.col(count_col) == 0, first).otherwise(
        F.floor((F.col("_cum") - 1) / ctx_len)
    )
    return cum.select(
        order_col,
        count_col,
        start.alias("start_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    position_col: str = "position",
    docs_per_shard: int = 1024,
) -> int:
    """Materialize a curated, shuffled corpus as ordered training shards:
    shard k holds positions [k*docs_per_shard, (k+1)*docs_per_shard),
    written as parquet partition directories (shard=k/...), rows sorted
    by position within each shard. A trainer streams shard directories
    in numeric order and gets the exact global order back without any
    reader-side sort.

    Scale shape: one repartition on the shard id (consecutive positions
    co-locate by construction, so shards are dense and equal-sized —
    no skew), a within-partition sort bounded by docs_per_shard, and a
    partitioned write. Returns the shard count.
    """
    shard = F.floor(F.col(position_col) / F.lit(docs_per_shard)).cast("long")
    (
        df.withColumn("shard", shard)
        .repartition("shard")
        .sortWithinPartitions(position_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # Count shards from the just-written parquet, not from `df`: an agg
    # on `df` would re-execute the whole upstream plan (including the
    # deterministic-shuffle exchange) a second time, while the written
    # files answer max(shard) from partition-directory names alone.
    spark = df.sparkSession
    try:
        n = spark.read.parquet(path).agg(F.max("shard")).collect()[0][0]
    except AnalysisException:
        # an empty input writes no data files (only _SUCCESS), and a
        # schemaless parquet dir cannot be read back — zero shards
        return 0
    return 0 if n is None else int(n) + 1
