"""Design-scale proof of o5's claim that "deep pages cost page-one
money" (r10 verdict stretch #9): on a sorted events layout, the
lexicographic keyset cursor predicate must PUSH to the parquet scan
and prune files/row groups, so a page deep in the order reads a small
suffix of the table instead of sorting everything the way OFFSET
paging does.

Method:
  1. Write events sorted by the pagination key — repartitionByRange
     (ts, event_id) + sortWithinPartitions, the layout any event store
     doing seek-pagination would maintain (it is also exactly what the
     bucketed-layout writer does for its sort columns).  Range
     partitioning gives per-FILE min/max on ts; the writer's row
     groups give intra-file stats.
  2. Run keyset_page(limit=100) twice: page one (no cursor) and a deep
     page whose cursor sits at ~the 99.5th percentile of the order
     (position ~page 10^4 at 100M rows / 100 per page... position is
     quantile-derived; exactness of the page NUMBER is irrelevant to
     the pruning property).
  3. Record per-run: wall, the scan node's numOutputRows / numFiles
     (post-pushdown — parquet row-group skipping shows up here), and
     the PushedFilters line from the formatted explain.

Pass = the deep page's scan emits a small fraction of total rows and
touches fewer files, at a wall <= page one's.

Usage: python tools/keyset_pushdown_probe.py [sf_dir] [out_dir]
       (defaults: /tmp/spark_graft_sf100_events /tmp/keyset_probe)
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
from cloudfabric_eventsourcing_spark.plans.translator import (  # noqa: E402
    keyset_page,
)
from cloudfabric_eventsourcing_spark.queries import SortInfo  # noqa: E402


def _scan_metrics(df) -> dict:
    """numOutputRows / numFiles of every scan node in the executed
    plan (the noop write that populated the metrics must have run on
    THIS df's queryExecution)."""
    plan = df._jdf.queryExecution().executedPlan()
    out = {"scan_rows": 0, "scan_files": 0}

    def walk(node):
        name = node.nodeName()
        # FileSourceScanExec renders as "Scan parquet ..." / "FileScan";
        # match on the numFiles metric instead of the name so a rename
        # or a wrapping (ColumnarToRow / InputAdapter) can't hide it
        it = node.metrics().iterator()
        kvs = {}
        while it.hasNext():
            kv = it.next()
            kvs[kv._1()] = kv._2().value()
        if "numFiles" in kvs:
            out["scan_rows"] += kvs.get("numOutputRows", 0)
            out["scan_files"] += kvs.get("numFiles", 0)
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())
        if "QueryStage" in name:
            walk(node.plan())

    walk(plan)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf100_events"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/keyset_probe"
    spark = build_session(app_name="keyset-pushdown-probe")
    events = load_table(spark, sf_dir, "events")

    # ts is cast NTZ -> TIMESTAMP (session tz pinned UTC) for the
    # layout: measured r11, Spark 4.1's parquet reader does NOT
    # row-group-prune TIMESTAMP_NTZ predicates (PushedFilters lists
    # them, the scan still emits every row: 9.8M scanned for a 0.5%
    # tail), while the identical layout with TIMESTAMP prunes to 4,096
    # rows.  Design rule recorded in PLANS.md: pagination keys at scale
    # must be BIGINT or TIMESTAMP, not NTZ.
    sorted_path = os.path.join(out_dir, "events_sorted_ltz")
    if not os.path.exists(os.path.join(sorted_path, "_SUCCESS")):
        t0 = time.time()
        (
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .repartitionByRange(64, "ts", "event_id")
            .sortWithinPartitions("ts", "event_id")
            .write.mode("overwrite")
            .parquet(sorted_path)
        )
        print(json.dumps({"op": "sorted_layout_write",
                          "sec": round(time.time() - t0, 1)}), flush=True)
    ev = spark.read.parquet(sorted_path)
    total = ev.count()

    # deep cursor ~99.5th percentile of ts; exact row boundary read
    # from the sorted layout itself (bounded 1-row collect)
    # ts is TIMESTAMP_NTZ in the sorted copy; session tz is pinned UTC,
    # so the NTZ->TIMESTAMP cast is deterministic
    q_us = ev.selectExpr(
        "percentile_approx(unix_micros(CAST(ts AS TIMESTAMP)), 0.995) AS q"
    ).collect()[0]["q"]
    anchor = (
        ev.where(
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) >= {int(q_us)}")
        )
        .orderBy("ts", "event_id")
        .limit(1)
        .collect()[0]
    )
    cursor = (anchor["ts"], anchor["event_id"])

    order = [SortInfo("ts", "asc"), SortInfo("event_id", "asc")]
    results = {}
    for label, after in (("page_one", None), ("deep_page", cursor)):
        best = None
        for _ in range(2):
            t0 = time.time()
            page = keyset_page(ev, order, after, 100)
            # collect(), not a noop write: the write command runs its
            # OWN queryExecution, so the df handle's SQL metrics never
            # populate (the sf100 probe's lesson); the page is 100 rows
            page.collect()
            wall = time.time() - t0
            m = _scan_metrics(page)
            if best is None or wall < best["wall_sec"]:
                best = {"wall_sec": round(wall, 3), **m}
        try:
            plan = spark._jvm.PythonSQLUtils.explainString(
                page._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = page._jdf.queryExecution().executedPlan().toString()
        pushed = [
            ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln
        ]
        best["pushed_filters"] = pushed[:1]
        results[label] = best
        print(json.dumps({"op": label, "total_rows": total, **best}),
              flush=True)

    p1, dp = results["page_one"], results["deep_page"]
    print(json.dumps({
        "op": "verdict",
        "deep_scan_fraction": round(dp["scan_rows"] / max(total, 1), 5),
        "deep_vs_page1_rows": round(
            dp["scan_rows"] / max(p1["scan_rows"], 1), 5
        ),
        "deep_wall_vs_page1": round(
            dp["wall_sec"] / max(p1["wall_sec"], 1e-9), 3
        ),
        "pruning_works": dp["scan_rows"] < 0.05 * total,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
