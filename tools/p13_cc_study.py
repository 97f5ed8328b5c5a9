"""p13 connected-components 32-core regression study (r15 verdict #4).

BENCH_r14: p13 reads 11.2 s at 32 cores vs 5.2 s at 8 (scaling ratio
0.46) — the only real regression of the r14 round.  The pair build is
shared and cached (rep2 of min-of-2 reuses it), so the wall is the CC
label-propagation loop itself: per round it launches THREE jobs
(merged checkpoint, pointer-jump checkpoint, convergence probe) over
frames whose partition counts were inherited from the LSH pair build —
at 32 local threads the scheduling overhead of those tiny tasks
exceeds all useful work.

Variants (strict alternation, labels hash-asserted identical per rep):
  base      — graph.connected_components as committed
  coalesce  — adj/labels checkpoints coalesced to a size-derived
              partition count (rows/target, NOT the local core count:
              scale-adaptive per the optimization rules)
  fused     — coalesce + pointer jump fused into the same round
              (2 jobs/round instead of 3: the jump join is planned on
              top of `merged` before checkpointing, and the probe
              reads the same checkpoint)

Usage: python tools/p13_cc_study.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.operators import graph as _graph  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402

# target edge rows per partition for the slim (n, m) adjacency frame —
# two longs/strings per row; 2M rows is ~50-100 MB, the guide §2.2 band
_ROWS_PER_PART = 2_000_000


def _sized_parts(df, n_rows: int) -> int:
    cur = df.rdd.getNumPartitions()
    want = max(1, min(cur, -(-n_rows // _ROWS_PER_PART)))
    return want


def cc_coalesce(edges, src="id_a", dst="id_b", max_iter=20, fused=False,
                aqe_off=False, bcast=False):
    spark = edges.sparkSession
    if aqe_off:
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _cc_coalesce(edges, src, dst, max_iter, fused, bcast)
    finally:
        if aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", old)


def _cc_coalesce(edges, src="id_a", dst="id_b", max_iter=20, fused=False,
                 bcast=False):
    fwd = edges.select(F.col(src).alias("n"), F.col(dst).alias("m"))
    rev = edges.select(F.col(dst).alias("n"), F.col(src).alias("m"))
    adj = fwd.unionByName(rev).localCheckpoint(eager=True)
    n_edges = adj.count()
    want = _sized_parts(adj, n_edges)
    if want < adj.rdd.getNumPartitions():
        adj = adj.coalesce(want).localCheckpoint(eager=True)

    labels = (
        adj.select("n")
        .distinct()
        .withColumn("component", F.col("n"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_labels = (
            adj.join(F.broadcast(labels) if bcast else labels, on="n")
            .select(F.col("m").alias("n"), "component")
            .withColumn("__own", F.lit(False))
        )
        merged = (
            labels.withColumn("__own", F.lit(True))
            .unionByName(neighbor_labels)
            .groupBy("n")
            .agg(
                F.min("component").alias("component"),
                F.min(
                    F.when(F.col("__own"), F.col("component"))
                ).alias("__prev"),
            )
        )
        if fused:
            # pointer jump planned ON TOP of merged, checkpointed once:
            # 2 jobs/round (checkpoint + probe) instead of 3
            m2 = merged
            parent = m2.select(
                F.col("n").alias("component"), F.col("component").alias("__pc")
            )
            jumped = (
                m2.join(F.broadcast(parent) if bcast else parent, "component")
                .select("n", F.col("__pc").alias("component"), "__prev",
                        F.col("component").alias("__mid"))
                .localCheckpoint(eager=True)
            )
            labels = jumped.select("n", "component")
            changed = (
                jumped.where(F.col("__mid") != F.col("__prev"))
                .limit(1)
                .count()
            )
        else:
            merged = merged.localCheckpoint(eager=True)
            labels = merged.drop("__prev")
            parent = labels.select(
                F.col("n").alias("component"), F.col("component").alias("__pc")
            )
            labels = (
                labels.join(parent, "component")
                .select("n", F.col("__pc").alias("component"))
                .localCheckpoint(eager=True)
            )
            changed = (
                merged.where(F.col("component") != F.col("__prev"))
                .limit(1)
                .count()
            )
        if changed == 0:
            break
    return labels.select(F.col("n").alias("node"), "component")


def _sig(df):
    rows = sorted(tuple(r) for r in df.collect())
    return len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="p13-cc-study")
    sc = spark.sparkContext
    print(f"-- cores: {sc.defaultParallelism}", file=sys.stderr)

    t0 = time.perf_counter()
    pairs = entry_mod._lsh_pairs_materialized(spark, sf_dir)
    n_pairs = pairs.count()
    print(f"-- pair build: {time.perf_counter()-t0:.1f}s, {n_pairs} pairs, "
          f"{pairs.rdd.getNumPartitions()} partitions", file=sys.stderr)

    variants = {
        "base": lambda: _graph.connected_components(pairs),
        "fused": lambda: cc_coalesce(pairs, fused=True),
        "fused+aqeoff": lambda: cc_coalesce(pairs, fused=True, aqe_off=True),
        "fused+bcast": lambda: cc_coalesce(pairs, fused=True, bcast=True),
        "fused+both": lambda: cc_coalesce(pairs, fused=True, aqe_off=True,
                                          bcast=True),
    }
    sigs = {}
    walls = {name: [] for name in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            sc.setJobDescription(f"p13-study {name} r{r}")
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
            sig = _sig(df)
            if name in sigs:
                assert sigs[name] == sig, f"{name} unstable: {sigs[name]} vs {sig}"
            sigs[name] = sig
    ref = sigs["base"]
    for name, sig in sigs.items():
        assert sig == ref, f"{name} labels differ from base: {sig} vs {ref}"
    print(json.dumps({
        "sf_dir": sf_dir,
        "cores": sc.defaultParallelism,
        "n_pairs": n_pairs,
        "labels": ref[0],
        "labels_hash": ref[1],
        "walls": walls,
        "min": {k: min(v) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
