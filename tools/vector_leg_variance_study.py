"""Vector curation leg adjudication (r15 verdict #9).

The leg's code is UNCHANGED since r12, yet driver runs read 40.3 (r13),
26.1 (r14 @32c), 30.3 (r14 @8c) docs/s.  Since identical code cannot
A/B against itself across commits, the adjudication is a variance
measurement: run the exact bench leg (same cold index, same 4-file
stream, same finish() drain) several times IN ONE SESSION and report
the spread.  If the within-session spread covers the driver's r13->r14
delta, the delta is host weather, not a regression.

Usage: python tools/vector_leg_variance_study.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402
from cloudfabric_eventsourcing_spark.streaming.curation import (  # noqa: E402
    curate_vector_stream,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="vector-leg-variance")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_vecs = emb.count()
    dims = len(emb.select("embedding").first()[0])

    rates = []
    counts = []
    for rep in range(reps):
        d = tempfile.mkdtemp(prefix=f"vecleg{rep}_")
        try:
            vsrc = os.path.join(d, "vincoming")
            emb.withColumn(
                "b", F.pmod(F.xxhash64("vec_id"), F.lit(4))
            ).repartition(4, "b").drop("b").write.parquet(vsrc)
            vec_idx = os.path.join(d, "vidx")
            dedup.save_cosine_index(
                spark.createDataFrame([], "vec_id long, embedding array<float>"),
                vec_idx, dims=dims, bits=10,
            )
            vstream = (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .parquet(vsrc)
            )
            t0 = time.perf_counter()
            q = curate_vector_stream(
                vstream, vec_idx, os.path.join(d, "vcorpus"),
                os.path.join(d, "vckpt"), threshold=0.99,
            )
            # same drain semantics as bench.py finish(): bounded wait,
            # DNF instead of an inflated rate on timeout
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError(f"rep {rep}: stream did not drain")
            wall = time.perf_counter() - t0
            kept = spark.read.parquet(os.path.join(d, "vcorpus")).count()
            rates.append(round(n_vecs / wall, 1))
            counts.append(kept)
            print(json.dumps({"rep": rep, "docs_per_sec": rates[-1],
                              "kept": kept}), flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert len(set(counts)) == 1, f"kept-count unstable: {counts}"
    print(json.dumps({
        "sf_dir": sf_dir, "n_vecs": n_vecs, "reps": rates,
        "min": min(rates), "max": max(rates),
        "spread_pct": round(100 * (max(rates) - min(rates)) / min(rates), 1),
        "kept": counts[0],
    }))


if __name__ == "__main__":
    main()
