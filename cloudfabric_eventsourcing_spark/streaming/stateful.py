"""Custom stateful streaming operator: per-stream projection fold with
state that survives across micro-batches.

This is the pure-streaming alternative (SURVEY.md T5) to the
foreachBatch/MERGE observer: `groupBy(stream_id).applyInPandasWithState`
keeps each stream's running document in Spark-managed state (checkpointed,
exactly-once), so projection maintenance scales horizontally with no
driver-side repository in the hot path.

The fold below maintains the OrdersList-style counters (items count,
event count, max version, last timestamp) declaratively from the event
envelope; payload-dependent folds plug in via the `counter_specs`
mapping event_type -> delta expression evaluated on the pandas batch.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "stream_id string, n_events long, items_count long, "
    "max_version long, last_ts timestamp"
)
STATE_SCHEMA = "n_events long, items_count long, max_version long, last_ts timestamp"

# event_type -> items_count delta (the reference's ItemsCount++/-- handlers,
# OrdersListProjectionBuilder.cs:33-66)
DEFAULT_COUNTER_SPECS = {
    "OrderItemAdded": 1,
    "OrderItemRemoved": -1,
}


def make_stream_fold(counter_specs: Optional[dict[str, int]] = None):
    specs = counter_specs or DEFAULT_COUNTER_SPECS

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (stream_id,) = key
        if state.exists:
            n_events, items_count, max_version, last_ts = state.get
        else:
            n_events, items_count, max_version, last_ts = 0, 0, 0, None
        for pdf in pdfs:
            pdf = pdf.sort_values("stream_version")
            n_events += len(pdf)
            for et, delta in specs.items():
                items_count += int((pdf["event_type"] == et).sum()) * delta
            max_version = max(max_version, int(pdf["stream_version"].max()))
            batch_last = pdf["created_at"].max()
            last_ts = batch_last if last_ts is None else max(last_ts, batch_last)
        state.update((n_events, items_count, max_version, last_ts))
        yield pd.DataFrame(
            [
                {
                    "stream_id": stream_id,
                    "n_events": n_events,
                    "items_count": items_count,
                    "max_version": max_version,
                    "last_ts": last_ts,
                }
            ]
        )

    return fold


def streaming_stream_fold(
    stream_df,
    checkpoint_dir: str,
    counter_specs: Optional[dict[str, int]] = None,
    on_batch=None,
):
    """Wire the stateful fold onto a streaming event DataFrame; each
    micro-batch emits one updated row per touched stream into `on_batch`
    (a foreachBatch callable — e.g. a projection MERGE writer; the memory
    sink cannot recover from a checkpoint, foreachBatch can)."""
    folded = stream_df.groupBy("stream_id").applyInPandasWithState(
        make_stream_fold(counter_specs),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = folded.writeStream.outputMode("update").option(
        "checkpointLocation", checkpoint_dir
    )
    if on_batch is not None:
        writer = writer.foreachBatch(on_batch)
    else:
        writer = writer.format("noop")
    return writer
