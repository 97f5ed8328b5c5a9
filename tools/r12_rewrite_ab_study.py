"""Interleaved A/B for the round-12 rewrites (r11 verdict #1/#2):

  - s04/s05: Column-HOF int8 quantization / integer top-k vs the new
    Arrow/numpy kernel (similarity.py use_arrow) — the r11 bench
    measured the HOF form at 2.2x/96x DuckDB at sf10 because Catalyst's
    interpreted HOF path evaluates the lambda per element per row.
  - h25: join-then-count Q13 vs eager aggregation (orders pre-agg to
    (o_custkey, n) before the customer join) — 18.5x at sf10.
  - h26: COUNT DISTINCT Expand over the lineitem join vs eager
    fact-grain pair distinct + plain count — 20.5x at sf10.

Method matches bench.py: each wall is DataFrame construction + noop
sink, variants run INTERLEAVED (A,B,A,B,...) so host drift lands on
both sides, min-of-N reported (N=3).  Usage:

  python tools/r12_rewrite_ab_study.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.operators import similarity as _sim  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402


def _s04(use_arrow):
    def fn(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        qz = _sim.quantize_embeddings(emb, use_arrow=use_arrow)
        return qz.select(
            "vec_id", "scale", F.posexplode("qvec").alias("i", "q")
        )

    return fn


def _s05(use_arrow):
    def fn(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        query_q = _sim.quantize_embeddings(
            emb.where(F.col("vec_id") == 0), use_arrow=use_arrow
        ).select("qvec").collect()[0][0]
        qz = _sim.quantize_embeddings(emb, use_arrow=use_arrow)
        return _sim.quantized_topk(qz, query_q, k=20, use_arrow=use_arrow)

    return fn


def _h25_old(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def _h26_old(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def _h26_pairs_first(spark, sf_dir):
    # the r11 verdict's literal suggestion (fact-grain distinct FIRST):
    # measured 3x WORSE than join-first at sf10 — it shuffles the whole
    # fact table before the ~13%-selective part filter can prune it
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            pairs.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(bad_supp), pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="r12-rewrite-ab")
    # match bench.py conditions: the suite serves lineitem/orders from
    # the bucketed layout — a plain-parquet A/B is a different experiment
    from cloudfabric_eventsourcing_spark.sources.bucketing import (
        ensure_bucketed_layout,
    )

    ensure_bucketed_layout(spark, sf_dir)
    qs = entry_mod.queries()
    pairs = {
        "s04": (_s04(False), _s04(True)),
        "s05": (_s05(False), _s05(True)),
        "h25": (_h25_old, qs["h25_customer_distribution"]),
        "h26": (_h26_old, qs["h26_brand_supplier_counts"]),
        "h26_pairs_first": (_h26_old, _h26_pairs_first),
    }
    # warm-up
    qs["a1_total_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name, (old, new) in pairs.items():
        walls: dict[str, list[float]] = {"old": [], "new": []}
        for _ in range(reps):
            for label, fn in (("old", old), ("new", new)):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls[label].append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "old_walls": walls["old"],
            "new_walls": walls["new"],
            "old_min": min(walls["old"]),
            "new_min": min(walls["new"]),
            "speedup": round(min(walls["old"]) / min(walls["new"]), 2),
        }
        print(f"-- {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
