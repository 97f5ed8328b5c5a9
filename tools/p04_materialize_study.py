"""p04 banded-materialize A/B: one session, strict alternation
(A,B,B,A,A,B), output equality asserted every rep.

A = materialize=False (the pre-r14-opt configuration)
B = materialize=True  (localCheckpoint the slim banded table)

Every rep materializes the pair count + an order-insensitive signature
(xor of xxhash64 over the canonical row string), so configs are proven
output-identical in the same breath as they are timed.

Usage: python tools/p04_materialize_study.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import dedup as _dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402


def run_once(spark, sf_dir: str, materialize: bool):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    pairs = _dedup.minhash_lsh_pairs(
        df,
        threshold=0.9,
        num_perm=128,
        bands=32,
        max_bucket_size=512,
        broadcast_grams=True,
        materialize=materialize,
    )
    sig_row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64(
                F.concat_ws(
                    "|", F.col("id_a"), F.col("id_b"),
                    F.format_number(F.col("jaccard"), 10),
                )
            )
        ).alias("sig"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    return wall, (sig_row["n"], sig_row["sig"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="p04_materialize_study")
    # warm-up (JVM/codegen/footers)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    sigs = set()
    walls: dict[bool, list[float]] = {False: [], True: []}
    for flag in (False, True, True, False, False, True):
        wall, sig = run_once(spark, sf_dir, flag)
        walls[flag].append(wall)
        sigs.add(sig)
        print(
            f"materialize={flag}: {wall:.2f} s  n={sig[0]} sig={sig[1]}",
            flush=True,
        )
    assert len(sigs) == 1, f"OUTPUT DIVERGED: {sigs}"
    print(
        f"A (off): {sorted(round(w, 2) for w in walls[False])}  "
        f"B (on): {sorted(round(w, 2) for w in walls[True])}  "
        f"output identical across all reps"
    )
    spark.stop()


if __name__ == "__main__":
    main()
