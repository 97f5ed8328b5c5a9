"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>}

Execution is forced with the noop sink (full computation, no driver
collect), so timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402

HEADLINE = [
    "h1_pricing_summary",
    "h2_revenue_by_nation",
    "h3_top_customers",
    "a2_max_stream_version",
    "a4_projection_fold_counts",
    "a5_projection_fold_sum",
    "f10_bool_tree",
    "f13_search_text",
    "o1_multi_sort_limit",
    "p04_minhash_lsh_pairs",
    "s01_ann_brute_force_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    spark = build_session(app_name="cfes-bench")

    qs = entry_mod.queries()
    # warm-up: JVM/codegen/parquet footer caches
    qs["a1_total_count"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
