"""r14 study (r13 verdict #8): attribute the sf10 walls of the three
worst >=1 s star-aggregate rows (h2 3.4 s, h24, h26) to scan vs
rollup vs exchange vs join stages, so the perf-weak set either gets a
lever or gets written down as the documented local-mode constant.

Method: cumulative plan prefixes of each row's ADOPTED plan, each
noop-materialized, interleaved best-of-2 in ONE session on the bucketed
layout (the bench's serving path).  The delta between consecutive
prefixes attributes the wall.  DuckDB same-session walls for the full
rows give the within-run oracle base.

Usage: SPARK_DRIVER_MEMORY=64g python tools/star_floor_attribution.py \
           [/tmp/spark_graft_sf10]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    ensure_bucketed_layout,
)


def _cents(col):
    return F.col(col).cast("decimal(18,2)") * 100


def _cents2(col):
    from __spark_entry__ import _cents as c

    return c(col)


def stages_h2(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = _cents2("l_extendedprice") * (F.lit(100) - _cents2("l_discount"))

    def s1():  # fact scan, needed columns only
        return li.select("l_orderkey", "l_extendedprice", "l_discount")

    def s2():  # + orderkey rollup (exchange-free on bucketed layout)
        return li.groupBy("l_orderkey").agg(F.sum(rev).alias("rev"))

    def s3():  # + orders join (bucket-co-located)
        return (
            s2()
            .join(
                orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("o_custkey", "rev")
        )

    def s4():  # + custkey rollup (THE real exchange)
        return s3().groupBy("o_custkey").agg(F.sum("rev").alias("rev"))

    def s5():  # full row: customer join + nation broadcast + final agg
        cust_rev = s4()
        return (
            cust_rev.join(cust, cust_rev.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg((F.sum("rev").cast("double") / 10000).alias("revenue"))
        )

    return {"scan": s1, "+ok_rollup": s2, "+orders_join": s3,
            "+custkey_exch": s4, "full": s5}


def stages_h24(spark, sf_dir):
    import __spark_entry__ as e

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("gear")
    )
    orders = load_table(spark, sf_dir, "orders")

    def s1():
        return li.select(
            "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice",
            "l_discount", "l_quantity",
        )

    def s2():  # + part broadcast filter-join
        return s1().join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )

    def s3():  # + orders shuffle join
        return s2().join(orders, F.col("l_orderkey") == orders.o_orderkey)

    def s5():
        return e.QUERIES["h24_product_profit"](spark, sf_dir)

    return {"scan": s1, "+part_bcast": s2, "+orders_join": s3, "full": s5}


def stages_h26(spark, sf_dir):
    import __spark_entry__ as e

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )

    def s1():
        return li.select("l_partkey", "l_suppkey")

    def s2():  # + part broadcast join
        return s1().join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )

    def s3():  # + the fact-grain distinct (THE exchange)
        return s2().select(
            "p_brand", "p_type", "p_size", "l_suppkey"
        ).distinct()

    def s5():
        return e.QUERIES["h26_brand_supplier_counts"](spark, sf_dir)

    return {"scan": s1, "+part_bcast": s2, "+distinct_exch": s3, "full": s5}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    spark = build_session(app_name="star-floor-attribution")
    ensure_bucketed_layout(spark, sf_dir)
    rows = {
        "h2": stages_h2(spark, sf_dir),
        "h24": stages_h24(spark, sf_dir),
        "h26": stages_h26(spark, sf_dir),
    }
    # warm-up
    load_table(spark, sf_dir, "lineitem").count()
    for name, stages in rows.items():
        walls = {}
        for rep in range(2):
            for label, fn in stages.items():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                walls[label] = min(walls.get(label, 1e9), w)
        print(f"== {name}:")
        prev = 0.0
        for label, w in walls.items():
            print(f"   {label:16s} {w:6.2f} s  (delta {w - prev:+6.2f})")
            prev = w
        sys.stdout.flush()


if __name__ == "__main__":
    main()
