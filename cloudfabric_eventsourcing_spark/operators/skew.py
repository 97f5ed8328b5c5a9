"""Skew mitigation: salted equi-join and two-phase aggregation.

At 100 TB a handful of hot keys (one celebrity user, one default partition
key) can put most of a shuffle into one task. AQE's skew-join splitting
(enabled by build_session) handles sort-merge joins automatically; these
helpers cover the cases AQE doesn't reach — broadcast-ineligible dimension
joins with a hot fact key, and high-cardinality-input aggregations where a
single group dominates.

Salting is deterministic here (pmod of a per-row id, not rand()) so plans
replay identically — important for the exactly-once foreachBatch sinks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where hot keys on ``big`` would skew the shuffle: salt the
    big side into ``salt_buckets`` sub-keys and replicate ``small`` once per
    bucket, so one hot key spreads over ``salt_buckets`` tasks.

    The join result is exactly the plain join (every big row meets every
    matching small row in exactly one bucket). Cost: ``small`` is shuffled
    xsalt_buckets — keep the salted side the big one and buckets modest.
    """
    on = list(on)
    salted_big = big.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(replicated_small, on + [_SALT], how).drop(_SALT)


def salted_agg_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase count/sum aggregation for a skewed group key: partial
    aggregate on (key, salt), then combine partials on key. Spark's hash
    aggregate already map-side-combines, so this only pays off when the
    *post-shuffle reduce* on one key dominates — e.g. collecting distinct
    state per group or when partial aggregation is disabled; counts and
    sums are algebraic so the two-phase result is exact.
    """
    group_cols = list(group_cols)
    partial_aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(c).alias(f"__s_{c}") for c in sum_cols
    ]
    final_aggs = [F.sum("__n").alias("n")] + [
        F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols
    ]
    return (
        df.withColumn(
            _SALT,
            F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
        )
        .groupBy(*group_cols, _SALT)
        .agg(*partial_aggs)
        .groupBy(*group_cols)
        .agg(*final_aggs)
    )
