"""Watermarked windowed aggregation over the event stream (T4 extension).

The reference has no windows at all (SURVEY.md §2.9 T4); Spark gives
tumbling/sliding event-time windows natively. This module wires them to the
event store's stream with a watermark so late events are bounded-state and
dropped deterministically — the scale-path answer to the reference's
"strictly increasing timestamp cursor" anomaly (T3): instead of silently
skipping late events on replay, the stream declares exactly how late an
event may be and the state store evicts finalized windows.

Works identically on a batch DataFrame (watermark is a no-op in batch
mode), so the same plan serves rebuild and live paths.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "created_at",
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) event-time counts.

    On a stream: append-output emits each window exactly once, when the
    watermark passes its end; events later than ``watermark`` are dropped.
    State is bounded by (windows in flight x group cardinality).
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    wcol = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        src.groupBy(wcol, *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n",
        )
    )


def drain_windowed_counts(
    spark,
    event_store,
    checkpoint_dir: str,
    sink,
    ts_col: str = "created_at",
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = ("event_type",),
) -> None:
    """availableNow drain of the windowed aggregation; finalized windows go
    to ``sink(batch_df, epoch_id)`` via foreachBatch (resumable from the
    checkpoint, unlike the memory sink). Each call processes what's new in
    the store and emits windows the advancing watermark has closed."""
    stream = event_store.read_stream(spark)
    agg = windowed_counts(
        stream,
        ts_col=ts_col,
        window=window,
        slide=slide,
        watermark=watermark,
        group_cols=group_cols,
    )
    query = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def deduped_stream(
    df: DataFrame,
    id_cols: Sequence[str] = ("id",),
    ts_col: str = "created_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once event delivery under at-least-once sources:
    `dropDuplicatesWithinWatermark` keys state by `id_cols` and evicts it
    once the watermark passes — bounded state, unlike a plain
    dropDuplicates which remembers every id forever on a stream. The
    streaming counterpart of the replay path's (stream_id, version) dedup
    (T3); in batch mode it degrades to an ordinary dropDuplicates."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    return df.dropDuplicates(list(id_cols))
