"""Cluster-index journal fold cost at production depth (~1M nodes).

The r7 measurement stopped at 50k nodes / 30 batches; the production
question is whether load_cluster_labels' journal fold and the broadcast
relabel map stay batch/journal-bounded when the CORPUS side is a
million nodes with a deep journal.  Design claim under test
(operators/graph.py):

  * base labels are read once, never shuffled — corpus-size cost is a
    column-pruned scan + one map-side broadcast join;
  * the fold's cost is bounded by MERGES SINCE COMPACTION (the remap
    journal), independent of corpus size;
  * the broadcast relabel map is merge-count-sized (~16 B/row), so a
    deep journal broadcasts in MBs, never corpus-sized;
  * compact_cluster_index restores the empty-journal floor.

Method: build a 1M-node index (each node its own singleton component —
worst case for relabel coverage), then append batches of 2k edges that
each merge 2k distinct component pairs (every edge is a real merge, so
journal depth = 2k x batches — deeper per batch than any curation loop
produces).  Measure load_cluster_labels wall (count() to force the
fold) at increasing depths, then after compaction.  Every wall is
best-of-2 (JVM warmup).

Usage:  python tools/cluster_journal_depth_study.py [n_nodes]
Prints one JSON line; ~2-4 min on local[32].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import graph  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_edges = 2_000
    depths = [0, 10, 30, 60]  # appended batches at which to measure
    spark = build_session(app_name="cluster-journal-depth")
    path = "/tmp/cluster_journal_depth_study"
    shutil.rmtree(path, ignore_errors=True)

    # 1M singleton components: every future merge touches real rows
    base = spark.range(n_nodes).select(
        F.col("id").alias("node"), F.col("id").alias("component")
    )
    graph.save_cluster_index(base, path)

    def timed_load() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            graph.load_cluster_labels(spark, path).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    walls: dict[str, float] = {}
    merges_total = 0
    appended = 0
    for target in depths:
        while appended < target:
            # batch b merges pairs (2i, 2i+1) from a fresh id stripe so
            # every edge is a REAL merge (journal grows by batch_edges)
            lo = appended * 2 * batch_edges
            edges = spark.range(batch_edges).select(
                (lo + F.col("id") * 2).alias("id_a"),
                (lo + F.col("id") * 2 + 1).alias("id_b"),
            )
            rep = graph.append_cluster_pairs(spark, path, edges)
            merges_total += rep["merges"]
            appended += 1
        walls[f"load_s_at_{target}_batches"] = timed_load()
    walls["journal_merges_total"] = merges_total
    # the broadcast relabel map is exactly the folded journal: rows ==
    # merges (bound stated in load_cluster_labels' docstring)
    t0 = time.perf_counter()
    graph.compact_cluster_index(spark, path)
    walls["compact_s"] = round(time.perf_counter() - t0, 3)
    walls["load_s_after_compact"] = timed_load()
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "batch_edges": batch_edges,
                **walls,
            }
        )
    )
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
