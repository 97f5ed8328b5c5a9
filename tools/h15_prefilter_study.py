"""Measured effect of the h15/Q7 nation-pair pre-filter pushdown (r8
verdict ask #3).

Old plan: join lineitem to the FULL supplier/customer dims (shuffle
joins), broadcast nation, and apply the direction-pair predicate ABOVE
all five joins — every lineitem row transits the fact-fact shuffle.
New plan (the classic Q7 move, now in __spark_entry__.h15): filter
supplier and customer to the two nations FIRST (2/25 of each dim),
broadcast the filtered dims into the fact scans, and let the fact-fact
join run on the ~8%-sized survivors — broadcast joins preserve the probe
side's partitioning, so lineitem⋈orders still rides the bucketed
orderkey co-location.

Interleaved order-alternating warm A/B in one session (host drift
dominates sequential comparisons — PLANS.md bench-method notes):
rep i runs (old, new) on even i and (new, old) on odd i.

Usage: python tools/h15_prefilter_study.py [sf_dir] [reps]
       (default /tmp/spark_graft_sf10, 6 reps/arm; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    ensure_bucketed_layout,
)

_cents = entry_mod._cents


def h15_old(spark, sf_dir):
    """The pre-r9 plan: predicate above all five joins."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg((F.sum(rev).cast("double") / 10000).alias("volume"))


def _run(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = build_session(app_name="h15_prefilter_study")
    ensure_bucketed_layout(spark, sf_dir)  # bench-path parity
    new_fn = entry_mod.queries()["h15_nation_volume_shipping"]
    arms = {"old": h15_old, "new": new_fn}

    # results must agree before timing means anything
    a = sorted(map(tuple, h15_old(spark, sf_dir).collect()))
    b = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
    assert a == b, "old/new h15 disagree"

    for fn in arms.values():  # warm both plans + page cache
        _run(spark, fn, sf_dir)
    times: dict[str, list[float]] = {k: [] for k in arms}
    for i in range(reps):
        order = ["old", "new"] if i % 2 == 0 else ["new", "old"]
        for k in order:
            times[k].append(_run(spark, arms[k], sf_dir))
    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps, "times": times,
        "median": med, "speedup_old_over_new": med["old"] / med["new"],
    }))


if __name__ == "__main__":
    main()
