"""r14 study (r13 verdict #2): is the valve-aware min_matching_bands
(censored-band slack) worth adopting in the p04 bench row?

Interleaved A/B in ONE session (within-run ratios only — host weather
swings absolute walls ±50% across sessions):

  A: the committed p04 config (threshold .9, 128/32, star valve 512,
     broadcast_grams)
  B: A + min_matching_bands=c (default 4) with the r14 slack

Each rep materializes count + an order-insensitive bit_xor signature of
(id_a, id_b, round(jaccard, 4)) — so every timed rep IS also the outhist
equality check: adopt only if sig(A) == sig(B).

Usage: SPARK_DRIVER_MEMORY=64g python tools/p04_slack_filter_study.py \
           [/tmp/spark_graft_sf10] [c]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402


def run(docs, cfg):
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(
        docs, threshold=0.9, num_perm=128, bands=32, **cfg
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64(id_a, id_b, "
            "cast(round(jaccard, 4) as string)))"
        ).alias("sig"),
    ).collect()[0]
    return time.perf_counter() - t0, int(row["n"]), row["sig"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = build_session(app_name="p04-slack-study")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = dict(max_bucket_size=512, broadcast_grams=True)
    cfgs = {"A": base, "B": dict(base, min_matching_bands=c)}
    walls: dict[str, list] = {"A": [], "B": []}
    sigs: dict[str, tuple] = {}
    for label in ("A", "B", "B", "A"):
        w, n, s = run(docs, cfgs[label])
        print(f"-- {label}: {w:.1f} s  n={n}  sig={s}", flush=True)
        walls[label].append(w)
        if label in sigs and sigs[label] != (n, s):
            print(f"!! {label} NONDETERMINISTIC: {sigs[label]} vs {(n, s)}")
        sigs[label] = (n, s)
    a = min(walls["A"])
    b = min(walls["B"])
    print(f"A (no filter)  walls={['%.1f' % x for x in walls['A']]} best={a:.1f}")
    print(f"B (c={c}+slack) walls={['%.1f' % x for x in walls['B']]} best={b:.1f}")
    print(f"ratio A/B = {a / b:.2f}x   output_equal = {sigs['A'] == sigs['B']}")
    print(f"A n,sig = {sigs['A']}   B n,sig = {sigs['B']}")


if __name__ == "__main__":
    main()
