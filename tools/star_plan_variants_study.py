"""Interleaved A/B of candidate plan improvements for the biggest
remaining sf10 star-aggregate gaps (r8 verdict: h2 4.24s, h23 3.13s,
h14 2.80s, h27 3.45s absolute).

Variants under test (one lever each, results asserted equal first):

  h2_slimdim   : customer joined to nation FIRST and slimmed to
                 (c_custkey, n_name), broadcast into the fact stream —
                 the fact-fact join output never shuffles on custkey.
  h14_slimdim  : same slim broadcast dim for the distinct-customers
                 aggregate — orders never shuffles on custkey; the only
                 exchange left is the partial-distinct pair shuffle.
  h27_norepart : drop the explicit repartition("l_orderkey") — the
                 li⋈orders join output is already hash-distributed on
                 the order key (bucketed SMJ or shuffle SMJ alike), and
                 HashPartitioning on a SUBSET of the grouping keys
                 satisfies the groupBy AND the window partitionBy, so
                 the explicit exchange is pure overhead.
  h23_ordfilter: pre-filter orders by the broadcast EUROPE-customer set
                 BEFORE the fact-fact join (the h15 move) instead of
                 filtering above it.

Second wave (after h2_slimdim/h14_slimdim were rejected — broadcasting
an UNFILTERED 1.5M-row dim loses; the right lever for a no-predicate
star aggregate is EAGER AGGREGATION below the join instead):

  h2_eageragg  : revenue rolled up to l_orderkey first (exchange-free —
                 lineitem is bucketed by orderkey), joined to co-located
                 orders, rolled up again to o_custkey (ONE narrow 15M-row
                 shuffle with map-side combine) and only the 1.5M-row
                 custkey aggregate meets customer — replacing the 60M-row
                 custkey exchange of the joined fact stream.
  h14_eageragg : orders rolled up to (o_custkey, n_orders) first — the
                 per-custkey aggregate makes countDistinct a plain
                 count(*), deleting the Expand + double-shuffle distinct
                 machinery; the custkey exchange carries 1.5M partial
                 rows instead of 15M pairs.

Method: r6 interleaved order-alternating warm A/B, one session, both
arms per rep (old first on even reps).  Usage:
    python tools/star_plan_variants_study.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    ensure_bucketed_layout,
)

_cents = entry_mod._cents


def h2_slimdim(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cn = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey")
    )
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    return joined.groupBy("n_name").agg(
        (F.sum(rev).cast("double") / 10000).alias("revenue")
    )


def h14_slimdim(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cn = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    return (
        orders.join(F.broadcast(cn), orders.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def h27_norepart(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        1,
    ).otherwise(0)
    fl = (
        li.join(orders.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    return (
        fl.withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn("nlate", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("nsupp") > 1)
               & (F.col("nlate") == 1))
        .join(F.broadcast(supp), fl.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def h23_ordfilter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu_keys = (
        nation.join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    eu_cust = cust.join(
        F.broadcast(eu_keys), cust.c_nationkey == F.col("cn_key")
    ).select("c_custkey")
    supp_nations = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    ord2 = orders.join(
        F.broadcast(eu_cust), orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    vol = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    base = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(ord2, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nations), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                  .otherwise(F.lit(0))).alias("num"),
            F.sum(vol).alias("den"),
        )
        .select(
            "o_year",
            (F.col("num").cast("double") / F.col("den").cast("double"))
            .alias("mkt_share"),
        )
    )


def h2_eageragg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    # orderkey rollup rides the bucketed layout: no exchange, 60M -> 15M
    li_agg = li.groupBy("l_orderkey").agg(F.sum(rev).alias("rev"))
    ord_rev = li_agg.join(
        orders.select("o_orderkey", "o_custkey"),
        li_agg.l_orderkey == F.col("o_orderkey"),
    ).select("o_custkey", "rev")
    cust_rev = ord_rev.groupBy("o_custkey").agg(F.sum("rev").alias("rev"))
    return (
        cust_rev.join(cust, cust_rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum("rev").cast("double") / 10000).alias("revenue"))
    )


def h14_eageragg(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cust_orders")
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cust_orders").alias("n_orders"),
        )
    )


def h3_eageragg(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("spent_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("spent_cents").cast("double") / 100).alias("total_spent"),
            "n_orders",
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(100)
    )


# h2/h14's eager arms were ADOPTED into __spark_entry__ — re-running
# them would compare the plan against itself; only open arms stay live
VARIANTS = {
    "h3_top_customers": h3_eageragg,
}


def _run(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="star_plan_variants_study")
    ensure_bucketed_layout(spark, sf_dir)
    qs = entry_mod.queries()
    out = {}
    for name, new_fn in VARIANTS.items():
        old_fn = qs[name]
        a = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
        b = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
        assert a == b, f"{name}: variant disagrees"
        for fn in (old_fn, new_fn):
            _run(spark, fn, sf_dir)  # warm
        times = {"old": [], "new": []}
        for i in range(reps):
            order = (("old", old_fn), ("new", new_fn)) if i % 2 == 0 else (
                ("new", new_fn), ("old", old_fn))
            for k, fn in order:
                times[k].append(_run(spark, fn, sf_dir))
        med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in times.items()}
        out[name] = {"median": med,
                     "speedup": round(med["old"] / med["new"], 2)}
        print(f"-- {name}: old {med['old']}s new {med['new']}s "
              f"({out[name]['speedup']}x)", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
