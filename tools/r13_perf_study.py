"""Round-13 perf adjudications (r12 verdict Next #1/#3/#4):

1. **t06 standalone interleave** — t06_repetition_stats tripled
   16.1 -> 43.7 s at sf10 in the r12 suite with UNTOUCHED code while
   its DuckDB oracle stayed flat (+8%).  The suite wall is a composite
   measurement (GC pressure, page-cache state, shuffle-dir residue
   from 60 prior queries); this study re-measures the SAME code
   standalone, interleaved Spark-vs-DuckDB so host drift lands on both
   sides.  If the standalone wall is back at the r11 level, the r12
   number was in-suite interference (the r12 curation-leg lesson
   again) and the fix is bench re-homing, not code.

2. **s01 kernel A/B** — Column-fold cosine vs the new mapInArrow
   sequential-fold kernel (brute_force_topk use_arrow), the s05 kernel
   minus quantization.

3. **p19 DSIR scoring A/B** — current explode -> broadcast-join ->
   per-doc sum vs the t09-lesson candidate: collect the <=16^bucket_hex
   micro-weight table to a dict (bounded meta-read, same pattern as PQ
   codebooks) and fold the per-doc sum in an Arrow kernel, so no gram
   row is ever exploded, joined, or shuffled.

Method matches bench.py: wall = DataFrame construction + noop sink,
variants interleaved (A,B,A,B,...), min-of-N reported.  DuckDB walls
via bench._bench_oracles (single-run per rep, watchdog).  Usage:

  python tools/r13_perf_study.py [sf_dir] [reps] [which,which,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.operators import (  # noqa: E402
    sampling as _samp,
    similarity as _sim,
)
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402


def _wall(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def study_t06(spark, sf_dir: str, reps: int) -> dict:
    qs = entry_mod.queries()
    spark_walls, duck_walls = [], []
    for _ in range(reps):
        spark_walls.append(_wall(qs["t06_repetition_stats"], spark, sf_dir))
        t0 = time.perf_counter()
        bench._bench_oracles(
            sf_dir, timeout_s=300, names=["t06_repetition_stats"]
        )
        duck_walls.append(round(time.perf_counter() - t0, 3))
    return {
        "spark_walls": spark_walls,
        "duck_walls": duck_walls,
        "spark_min": min(spark_walls),
        "duck_min": min(duck_walls),
        "ratio_min": round(min(spark_walls) / min(duck_walls), 2),
        "r12_suite_wall": 43.7,
        "r11_suite_wall": 16.1,
    }


def study_s01(spark, sf_dir: str, reps: int) -> dict:
    def mk(use_arrow):
        def fn(spark, sf_dir):
            emb = load_table(spark, sf_dir, "embeddings")
            query = (
                emb.where(F.col("vec_id") == 0)
                .select("embedding")
                .collect()[0][0]
            )
            return _sim.brute_force_topk(
                emb, query, k=20, use_arrow=use_arrow
            )

        return fn

    walls = {"column": [], "arrow": []}
    for _ in range(reps):
        for label, ua in (("column", False), ("arrow", True)):
            walls[label].append(_wall(mk(ua), spark, sf_dir))
    return {
        **{f"{k}_walls": v for k, v in walls.items()},
        "column_min": min(walls["column"]),
        "arrow_min": min(walls["arrow"]),
        "speedup": round(min(walls["column"]) / min(walls["arrow"]), 2),
    }


def _p19_current(spark, sf_dir):
    # exactly the registry row's shape: target = the English slice
    docs = load_table(spark, sf_dir, "documents")
    return _samp.dsir_log_weights(docs, docs.where("lang = 'en'"))


def _p19_arrow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _samp.dsir_log_weights(
        docs, docs.where("lang = 'en'"), use_arrow=True
    )


def _p19_cached(spark, sf_dir):
    # second candidate (after the Arrow kernel measured 0.82x): keep
    # the JVM join shape but persist the exploded feature rows so the
    # raw corpus is tokenized+md5'd ONCE instead of twice
    docs = load_table(spark, sf_dir, "documents")
    return _samp.dsir_log_weights(
        docs, docs.where("lang = 'en'"), cache_features=True
    )


def study_p19(spark, sf_dir: str, reps: int) -> dict:
    # equality gate first (cheap at any sf: 500-row result)
    a = {
        tuple(r)
        for r in _p19_current(spark, sf_dir).collect()
    }
    b = {
        tuple(r)
        for r in _p19_arrow(spark, sf_dir).collect()
    }
    c = {
        tuple(r)
        for r in _p19_cached(spark, sf_dir).collect()
    }
    walls = {"current": [], "arrow": [], "cached": []}
    for _ in range(reps):
        for label, fn in (
            ("current", _p19_current),
            ("arrow", _p19_arrow),
            ("cached", _p19_cached),
        ):
            walls[label].append(_wall(fn, spark, sf_dir))
    return {
        "results_equal": a == b == c,
        **{f"{k}_walls": v for k, v in walls.items()},
        "current_min": min(walls["current"]),
        "arrow_min": min(walls["arrow"]),
        "cached_min": min(walls["cached"]),
        "speedup_arrow": round(
            min(walls["current"]) / min(walls["arrow"]), 2
        ),
        "speedup_cached": round(
            min(walls["current"]) / min(walls["cached"]), 2
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    which = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["t06", "s01", "p19"]
    )
    spark = build_session(app_name="r13-perf-study")
    from cloudfabric_eventsourcing_spark.sources.bucketing import (
        ensure_bucketed_layout,
    )

    ensure_bucketed_layout(spark, sf_dir)
    # warm-up: one cheap query through the session
    entry_mod.queries()["a1_total_count"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    funcs = {"t06": study_t06, "s01": study_s01, "p19": study_p19}
    for name in which:
        out[name] = funcs[name](spark, sf_dir, reps)
        print(f"-- {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": out}))


if __name__ == "__main__":
    main()
