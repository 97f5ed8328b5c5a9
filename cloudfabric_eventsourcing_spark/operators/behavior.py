"""Behavioral / event-time analytics over the event log: funnel
conversion and retention cohorts.

The reference's event store is routinely fronted by exactly these two
product questions ("of the users who signed up, how many purchased
within a week?", "how many of January's new users were still active in
March?"); the reference answers them only by hand-written projection
handlers folding one stream at a time
(CloudFabric.Projections/ProjectionsEngine.cs event handlers). Here they
are single declarative plans over the whole log.

Scale shape — both operators share it:
  - ONE shuffle on the user key; every per-user scalar (first step
    time, first-seen time) is a window aggregate over that partition,
    never a self-join (a per-user aggregate joined back would re-scan
    the event log — the duplicate-subtree pathology measured in
    PLANS.md round-3).
  - Per-user groups are bounded (one user's events), so window sorts
    are local and skew-bounded; a celebrity user is still one
    partition's worth of rows, and the salting operator
    (operators/skew.py) composes in front if needed.
  - The final aggregates are tiny (steps / cohort-month matrix), fully
    map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    first_step: str,
    second_step: str,
    within_days: int = 7,
) -> DataFrame:
    """Two-step funnel: users who did `first_step`, and of those the
    users whose earliest `second_step` falls within ``within_days``
    AFTER their FIRST `first_step`. Returns one row:
    (n_entered, n_converted, conversion_rate).

    The anchor (first occurrence of step one) and the probe (any
    qualifying step two) are evaluated in one pass: the anchor is a
    window MIN over the user partition, the conversion test a
    conditional aggregate over the same rows.
    """
    w = Window.partitionBy(user_col)
    anchor = F.min(
        F.when(F.col(type_col) == first_step, F.col(ts_col))
    ).over(w)
    flagged = df.withColumn("__anchor", anchor)
    converted = (
        (F.col(type_col) == second_step)
        & F.col("__anchor").isNotNull()
        & (F.col(ts_col) >= F.col("__anchor"))
        & (
            F.col(ts_col)
            <= F.col("__anchor") + F.expr(f"INTERVAL {int(within_days)} DAYS")
        )
    )
    per_user = flagged.groupBy(user_col).agg(
        F.max(F.col("__anchor").isNotNull().cast("int")).alias("__entered"),
        F.max(converted.cast("int")).alias("__converted"),
    )
    return per_user.agg(
        F.sum("__entered").alias("n_entered"),
        F.sum("__converted").alias("n_converted"),
        (
            F.sum("__converted").cast("double")
            / F.greatest(F.sum("__entered"), F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "month",
) -> DataFrame:
    """Retention triangle: users grouped into cohorts by the
    ``granularity`` period (month/week/day — date_trunc units, Monday
    weeks on both Spark and the SQL oracle) they were FIRST seen; one
    row per (cohort_period, activity_period) with the distinct active
    users.

    cohort_period is a window MIN over the user partition (no
    self-join); the COUNT(DISTINCT user) per matrix cell plans as
    Spark's two-phase Expand aggregate — the distinct set shuffles
    (cohort, period, user) triples, already deduplicated map-side,
    never raw events.
    """
    w = Window.partitionBy(user_col)
    first_ts = F.min(F.col(ts_col)).over(w)
    return (
        df.withColumn("cohort_period", F.date_trunc(granularity, first_ts))
        .withColumn("activity_period", F.date_trunc(granularity, F.col(ts_col)))
        .groupBy("cohort_period", "activity_period")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def last_touch_attribution(
    events: DataFrame,
    purchase_type: str = "purchase",
    attribution_window: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value goes to
    the channel (event_type) of the user's latest non-purchase event
    strictly before it — in (ts, id) order, so simultaneous-timestamp
    events resolve deterministically — and within `attribution_window`;
    purchases with no qualifying prior touch attribute to 'direct'.
    Returns (channel, n_purchases, total_value).

    Same single-scan window-anchor shape as funnel/retention (module
    docstring): ONE user-key shuffle, the candidate touch is a
    last(ignorenulls) over the preceding-rows frame — never a
    self-join — and the final channel rollup is a tiny map-side
    combinable aggregate.  If the latest preceding touch is outside
    the window, every older one is too, so the single window pass is
    exact.  Revenue sums exact integer cents (round(value*100) as
    BIGINT) and divides once at the end — the cross-engine float
    lesson every revenue plan here follows."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col) != purchase_type,
        F.struct(
            F.col(ts_col).alias("c_ts"), F.col(type_col).alias("c_type")
        ),
    )
    cand = F.last(touch, ignorenulls=True).over(w)
    purchases = events.withColumn("__cand", cand).where(
        F.col(type_col) == purchase_type
    )
    in_window = F.col("__cand").isNotNull() & (
        F.col("__cand.c_ts")
        >= F.col(ts_col) - F.expr(f"INTERVAL {attribution_window}")
    )
    channel = F.when(in_window, F.col("__cand.c_type")).otherwise(
        F.lit("direct")
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        purchases.select(channel.alias("channel"), cents.alias("__cents"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum("__cents").cast("double") / 100.0).alias("total_value"),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over the event log: for each
    ordered pair of consecutive events WITHIN a user's stream, count
    (src event type -> dst event type) and the conditional probability
    P(dst | src). The classic "what do users do after X?" product
    question; the reference can only answer it with a hand-written
    projection handler folding one stream at a time.

    Scale shape: ONE shuffle on the user key for the lead window
    (per-user groups are bounded, window sorts are local), then the
    map-side-combinable count over an alphabet-squared result — at most
    |event types|^2 rows reach the final tiny aggregate, so the second
    exchange moves kilobytes at any corpus size. The probability
    denominator is a window over that tiny frame, not a second scan.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = df.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = F.sum("n_transitions").over(Window.partitionBy("src"))
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        (
            F.col("n_transitions").cast("double") / total.cast("double")
        ).alias("p"),
    )
