"""Watermarked stream-stream interval join (T4/§2.9 extension).

The reference correlates two event kinds only inside hand-written
projection handlers holding per-aggregate state. Spark joins two LIVE
streams declaratively: with event-time watermarks on both sides and a
time-range join condition, the state store keeps each side's rows only
until the other side's watermark passes the interval — bounded state,
deterministic results, and the identical plan runs in batch mode (the
watermark is a no-op there), so rebuild and live paths share one
definition.

Scale shape: the join shuffles both streams on the equi-key once;
per-key per-interval state is evicted by the watermark, so total state
is (event rate x interval width), independent of stream lifetime.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``keys`` where
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Column names must be disjoint apart from ``keys`` (rename before
    joining); ``left_ts``/``right_ts`` must differ. On streams both
    sides are watermarked by ``watermark`` — required by Spark for
    stream-stream joins and the state-eviction bound. ``how`` supports
    the stream-stream-legal types (inner, left_outer with the time bound
    on the right side, ...).
    """
    lsrc = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rsrc = (
        right.withWatermark(right_ts, watermark) if right.isStreaming else right
    )
    cond = None
    for k in keys:
        c = lsrc[k] == rsrc[k]
        cond = c if cond is None else (cond & c)
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    cond = cond & (F.col(right_ts) >= lo) & (F.col(right_ts) <= hi)
    joined = lsrc.join(rsrc, cond, how)
    # drop the duplicated right-side key columns
    return joined.drop(*[rsrc[k] for k in keys])
