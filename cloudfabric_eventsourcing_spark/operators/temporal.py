"""Temporal operators Spark lacks natively: as-of join, range join,
sessionization.

Implementation choices (pyspark_guide.md "Common OLAP patterns"):
  - as-of join: union-and-window, not a pairwise join — tag both sides,
    union on the time axis, partition by key, last_value of the right
    side's payload over rows-unbounded-preceding. One shuffle on
    (key, time), no O(L*R) candidate pairs, no Python. This is the
    scale-correct plan: an equivalent merge_asof via applyInPandas exists
    for per-group pandas semantics but is the slow path.
  - sessionization: lag + gap>threshold cumsum over a (key, time) window —
    two window passes over one shuffle; the strict-> tie (an event exactly
    `gap` after its predecessor stays in-session) matches F.session_window.
  - range join: bucketize the range key, equi-join on bucket, post-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on (direction='backward'; 'forward' = next right row
    with right.on >= left.on), matched within the `by` key.

    Union-and-window: O((L+R) log) with a single hash shuffle on `by` —
    survives any scale where one key's rows fit a partition (salt `by` if a
    key is pathologically hot).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(by),
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, on)],
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).select(*lcols, "__is_left", *[f"__r_{c}" for c in right_cols])
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at equal timestamps so an exact
        # tie matches (<=)
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    out = unioned.select(*lcols, "__is_left", *filled).where(F.col("__is_left") == 1)
    return out.drop("__is_left")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """Per-group `pandas.merge_asof` via cogrouped applyInPandas — the
    Arrow-batched slow path. Use when you need pandas-exact semantics
    (tolerance windows, 'nearest' direction); the union-and-window
    `asof_join` is the scale path for plain backward/forward."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in right_cols
    ]
    out_schema = T.StructType(out_fields)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(on)
        # suffixed copies so right_cols may include the `on` column itself
        r_small = r_pdf[[on]].copy()
        for c in right_cols:
            r_small[f"{c}{suffix}"] = r_pdf[c]
        r_small = r_small.sort_values(on)
        merged = pd.merge_asof(
            l_pdf, r_small, on=on, direction=direction, tolerance=tolerance
        )
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, out_schema)
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key EXCEEDS `gap_minutes` (strict >; an
    event exactly `gap_minutes` after its predecessor stays in the same
    session). The tie case matches Spark's native F.session_window, whose
    windows [ts, ts+gap] merge on touch — verified empirically by
    test_session_gap_boundary_tie_matches_native. Adds `session_seq`
    (0-based per key) and `session_id` (key#seq)."""
    from pyspark.sql import types as T

    # integer µs for exact gap comparisons (double seconds lose sub-µs
    # precision near the boundary). Parquet written without
    # isAdjustedToUTC loads as TIMESTAMP_NTZ, which unix_micros rejects;
    # the cast to TIMESTAMP is value-preserving under the engine's fixed
    # UTC session zone (session.py) and costs nothing at runtime.
    is_ts = isinstance(
        df.schema[ts].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    t = (
        F.unix_micros(F.col(ts).cast("timestamp"))
        if is_ts
        else F.col(ts).cast("double") * 1_000_000
    )
    w = Window.partitionBy(key).orderBy(ts)
    gap_us = t - F.lag(t).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > int(gap_minutes * 60 * 1_000_000)), 1
    ).otherwise(0)
    df = df.withColumn("__new", new_session)
    df = df.withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    ).drop("__new")
    return df.withColumn(
        "session_id", F.concat_ws("#", F.col(key).cast("string"), F.col("session_seq"))
    )


def session_stats(
    df: DataFrame, key: str, ts: str, gap_minutes: float = 30.0
) -> DataFrame:
    """Sessionize + per-session aggregates (count, span, bounds)."""
    s = sessionize(df, key, ts, gap_minutes)
    return s.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (
            (
                F.max(F.unix_micros(F.col(ts).cast("timestamp")))
                - F.min(F.unix_micros(F.col(ts).cast("timestamp")))
            )
            / F.lit(1_000_000.0)
        ).alias("span_seconds"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """left.val BETWEEN right.lo AND right.hi without a cartesian product:
    explode each right interval into the buckets it covers, equi-join on
    the left value's bucket, then exact post-filter. Shuffle is on the
    bucket id; pick bucket_width ~ median interval width."""
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_val) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "__buckets",
        F.sequence(
            F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
            F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    return (
        lb.join(rb, "__bucket")
        .where((F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi)))
        .drop("__bucket")
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regularize an irregular event series onto a fixed time grid with
    forward-fill — the hypertable `time_bucket_gapfill` + `locf` shape
    (TimescaleDB's name for it; the reference has no equivalent, its
    projections re-emit the last state per poll instead).

    Semantics: per key, truncate events to their grid bucket; the
    bucket's value is its LAST event's value in (ts, tiebreak) order;
    every empty bucket between two observed buckets carries the earlier
    bucket's value with ``filled = true``. The series spans each key's
    first to last OBSERVED bucket (no extrapolation beyond either end).

    Scale shape: ONE shuffle (the key-partition window). The
    per-(key, bucket) last-event pick and the fill horizon come from
    the same `lead` pass: a row is its bucket's last event iff the next
    event's bucket differs, and that next bucket IS the fill horizon —
    so no (key, bucket) pre-aggregate, no generated calendar table, no
    join back to the series. Fill expansion is a per-row
    `sequence()` + `explode` (output-proportional, distributed). A
    pathologically sparse key (two events a year apart at minute grain)
    expands to ~0.5M rows from ONE row — bound `unit` to the expected
    gap scale, exactly as a hypertable's chunk interval is chosen.

    Output: (key, bucket timestamp, value, filled boolean).
    """
    if unit not in ("minute", "hour", "day"):
        raise ValueError(f"unsupported gap_fill unit: {unit!r}")
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    step = F.expr(f"INTERVAL 1 {unit}")
    bucketed = df.select(
        F.col(key_col),
        F.date_trunc(unit, F.col(ts_col)).alias("__bucket"),
        F.col(value_col).alias("value"),
        *( [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else []) ),
    ).withColumn("__next_bucket", F.lead("__bucket").over(w))
    last_in_bucket = bucketed.where(
        F.col("__next_bucket").isNull()
        | (F.col("__next_bucket") != F.col("__bucket"))
    )
    expanded = last_in_bucket.select(
        F.col(key_col),
        F.col("__bucket"),
        F.col("value"),
        F.explode(
            F.sequence(
                F.col("__bucket"),
                F.coalesce(F.col("__next_bucket") - step, F.col("__bucket")),
                step,
            )
        ).alias("bucket"),
    )
    return expanded.select(
        F.col(key_col),
        F.col("bucket"),
        F.col("value"),
        (F.col("bucket") != F.col("__bucket")).alias("filled"),
    )
