"""Measured effect of bucketed co-location on the fact-fact join that
dominates the star-aggregate family's wall.

The round-5 crossover study (PLANS.md) shows the one family where the
32-thread embedded oracle stays ahead of Spark locally: star-join
aggregates (h2-shape: lineitem JOIN orders + dims + group-by).  Spark's
cost there is the shuffle materialization of both fact sides — the very
thing bucketing removes.  sources/bucketing.py pins shuffle-freeness in
tests at toy sf; this tool MEASURES the wall at a scale where the
shuffle matters, on the h2-shaped core:

    SELECT o_orderpriority, count(*), sum(cents(l_extendedprice))
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority

plain parquet vs both facts bucketed+sorted by the join key (32
buckets).  One-time layout cost (the bucketed write) is reported next
to the per-query saving — bucketing pays when the key is joined
repeatedly, which is exactly the event-store/projection workload shape
(stream ids, order ids).

Usage: python tools/bucketed_star_study.py [sf_dir]
       (default /tmp/spark_graft_sf10; writes bucketed tables under a
        throwaway spark-warehouse in /tmp)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    exchange_count,
    write_bucketed,
)


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _query(li, orders):
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("l_extendedprice")).alias("cents"),
        )
    )


def _warm_min3(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    spark = build_session(
        app_name="bucketed_star_study",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/spark_graft_bucket_wh",
            # force the join comparison to be SMJ-vs-SMJ (no broadcast):
            # at real scale neither fact side broadcasts
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )

    t0 = time.perf_counter()
    write_bucketed(li, "s_lineitem", ["l_orderkey"], 32,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "s_orders", ["o_orderkey"], 32,
                   sort_cols=["o_orderkey"])
    layout_s = round(time.perf_counter() - t0, 2)

    plain = _query(li, orders)
    bucketed = _query(spark.table("s_lineitem"), spark.table("s_orders"))

    out = {
        "sf_dir": sf_dir,
        "layout_write_s": layout_s,
        "plain_exchanges": exchange_count(plain),
        "bucketed_exchanges": exchange_count(bucketed),
        "plain_warm_s": _warm_min3(plain),
        "bucketed_warm_s": _warm_min3(bucketed),
    }
    out["speedup"] = round(out["plain_warm_s"] / out["bucketed_warm_s"], 2)
    # same rows either way
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in bucketed.collect()}
    out["results_match"] = a == b
    spark.sql("DROP TABLE IF EXISTS s_lineitem")
    spark.sql("DROP TABLE IF EXISTS s_orders")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
