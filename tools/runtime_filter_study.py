"""Measured effect of Spark's runtime bloom-filter join on the weak
star-aggregate family.

Spark injects a bloom filter built from the small (filtered-dim) side
of a shuffle join into the big side's scan — pruning fact rows BEFORE
the shuffle, which is precisely the cost that keeps the star-aggregate
family behind the embedded oracle locally.  The feature is ON by
default but gated on a 10 GiB application-side scan
(``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``)
— so at local test scales it NEVER fires, while at the 100 TB design
point it always would.  This tool measures what the cluster-scale
behavior would buy by opening the gate at sf10, interleaved
order-alternating warm A/B in one session (host drift dominates
sequential comparisons — see PLANS.md bench-method notes):

    arm off : runtime.bloomFilter.enabled=false
    arm on  : enabled + applicationSideScanSizeThreshold=0
              + creationSideThreshold raised so sf10 dims qualify

Queries: the star-aggregate headliners where a selective dim/fact
filter feeds a fact-side shuffle join.

Usage: python tools/runtime_filter_study.py [sf_dir] [reps]
       (default /tmp/spark_graft_sf10, 5 reps/arm; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    ensure_bucketed_layout,
)

QUERIES = [
    "h2_revenue_by_nation",
    "h8_shipping_priority",
    "h9_order_priority_check",
    "h10_promo_revenue_share",
    "h14_distinct_customers_per_nation",
    "h23_market_share",
    "h25_customer_distribution",
]

ARMS = {
    "off": {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
    },
    "on": {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # the 10 GiB default means "never at local scale"; 0 = the
        # cluster-scale behavior where the fact scan always qualifies
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # default 10 MB excludes sf10 dims; let filtered dims qualify
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "256MB",
    },
}


def _run(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="runtime_filter_study")
    ensure_bucketed_layout(spark, sf_dir)  # bench-path parity
    qs = entry_mod.queries()

    samples: dict[str, dict[str, list[float]]] = {
        q: {a: [] for a in ARMS} for q in QUERIES
    }
    for q in QUERIES:
        fn = qs[q]
        _run(spark, fn, sf_dir)  # warm the scan cache once, untimed
        for rep in range(reps):
            order = ["off", "on"] if rep % 2 == 0 else ["on", "off"]
            for arm in order:
                for k, v in ARMS[arm].items():
                    spark.conf.set(k, v)
                samples[q][arm].append(_run(spark, fn, sf_dir))
        for k in ARMS["on"]:
            spark.conf.unset(k)

    out = {"sf_dir": sf_dir, "reps": reps, "queries": {}}
    for q in QUERIES:
        off = min(samples[q]["off"])
        on = min(samples[q]["on"])
        out["queries"][q] = {
            "off_min_s": round(off, 3),
            "on_min_s": round(on, 3),
            "speedup": round(off / on, 3) if on else None,
        }
    total_off = sum(v["off_min_s"] for v in out["queries"].values())
    total_on = sum(v["on_min_s"] for v in out["queries"].values())
    out["total_off_s"] = round(total_off, 2)
    out["total_on_s"] = round(total_on, 2)
    out["total_speedup"] = round(total_off / total_on, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
