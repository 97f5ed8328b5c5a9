"""p04 verify-join engineering study (r12 verdict Next #2).

p04_minhash_lsh_pairs walls 415 s at sf10 — the suite's dominant row.
~45 s is signature+banding; the rest is the exact-verify join
re-attaching gram arrays to the candidate pairs the degenerate tail
buckets produce.  Levers under test, interleaved:

  A. baseline            — the current registry configuration
  B. cache_grams         — persist the gram table across its 3 uses
  C. min_matching_bands=4 — the free band-count pre-filter (the
                            candidate dedup groupBy already counts);
                            the sf10 histogram: 326M candidates, 89%
                            under 4 matching bands, true-pair miss
                            P(Binom(32,.9^4)<4) ~ 5.5e-11
  D. B + C combined

Plus a one-off diagnostic pass: candidate volume and the
matching-band-count histogram (how many candidates are 1-band flukes),
which predicts C's cut before paying for the A/B.

Output-equality gate: C/D must return the SAME pairs as A at the study
sf (deterministic statistic — no RNG).  Usage:

  python tools/p04_verify_study.py [sf_dir] [reps] [hist|ab|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import dedup as _dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402

P04 = dict(threshold=0.9, num_perm=128, bands=32, max_bucket_size=512)


def hist(spark, sf_dir: str) -> dict:
    """Candidate volume + matching-band histogram under the p04 valve:
    replicates minhash_lsh_pairs' candidate stage (star valve included)
    and groups by the co-occurrence count."""
    docs = load_table(spark, sf_dir, "documents")
    grams_df, banded = _dedup._grams_and_bands(
        docs, P04["num_perm"], P04["bands"], 1, "text", "doc_id"
    )
    cap = P04["max_bucket_size"]
    sizes = banded.groupBy("bi", "bh").agg(F.count(F.lit(1)).alias("__n"))
    sized = banded.join(sizes, ["bi", "bh"])
    small = sized.where(F.col("__n") <= cap).drop("__n")
    big = sized.where(F.col("__n") > cap).drop("__n")
    hubs = big.groupBy("bi", "bh").agg(F.min("id").alias("hub"))
    star = (
        big.join(hubs, ["bi", "bh"])
        .where(F.col("id") != F.col("hub"))
        .select(
            F.least("hub", "id").alias("id_a"),
            F.greatest("hub", "id").alias("id_b"),
        )
    )
    a, b = small.alias("a"), small.alias("b")
    cand = a.join(
        b,
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    counted = (
        cand.unionByName(star)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    rows = (
        counted.groupBy("nb").agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy("nb")
        .collect()
    )
    h = {int(r["nb"]): int(r["pairs"]) for r in rows}
    total = sum(h.values())
    return {
        "total_candidates": total,
        "band_count_histogram_head": {k: h[k] for k in sorted(h)[:8]},
        "pairs_at_1_band": h.get(1, 0),
        "cut_at_min2": round(h.get(1, 0) / max(total, 1), 4),
    }


def variants(spark, sf_dir: str, reps: int) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    cases = {
        "baseline": {},
        "bcast": {"broadcast_grams": True},
    }
    walls: dict[str, list[float]] = {k: [] for k in cases}
    for _ in range(reps):
        for name, kw in cases.items():
            t0 = time.perf_counter()
            _dedup.minhash_lsh_pairs(docs, **P04, **kw).write.format(
                "noop"
            ).mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 1))
            print(f"   {name}: {walls[name][-1]}s", file=sys.stderr, flush=True)
    return {
        **{f"{k}_walls": v for k, v in walls.items()},
        **{f"{k}_min": min(v) for k, v in walls.items()},
    }


def equality(spark, sf_dir: str) -> bool:
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, _dedup.minhash_lsh_pairs(docs, **P04).collect()))
    d = sorted(
        map(
            tuple,
            _dedup.minhash_lsh_pairs(
                docs, **P04, cache_grams=True, min_matching_bands=4
            ).collect(),
        )
    )
    return a == d


def outhist(spark, sf_dir: str) -> dict:
    """Band-count histogram restricted to the VERIFIED OUTPUT pairs:
    exactly what min_matching_bands=c would lose at this sf.  One
    baseline-cost pass — candidates keep their __nb through the exact
    verify."""
    docs = load_table(spark, sf_dir, "documents")
    grams_df, banded = _dedup._grams_and_bands(
        docs, P04["num_perm"], P04["bands"], 1, "text", "doc_id"
    )
    cap = P04["max_bucket_size"]
    sizes = banded.groupBy("bi", "bh").agg(F.count(F.lit(1)).alias("__n"))
    sized = banded.join(sizes, ["bi", "bh"])
    small = sized.where(F.col("__n") <= cap).drop("__n")
    big = sized.where(F.col("__n") > cap).drop("__n")
    hubs = big.groupBy("bi", "bh").agg(F.min("id").alias("hub"))
    star = (
        big.join(hubs, ["bi", "bh"])
        .where(F.col("id") != F.col("hub"))
        .select(
            F.least("hub", "id").alias("id_a"),
            F.greatest("hub", "id").alias("id_b"),
        )
    )
    a, b = small.alias("a"), small.alias("b")
    cand = a.join(
        b,
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    counted = (
        cand.unionByName(star)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    ga = grams_df.select(F.col("id").alias("id_a"), F.col("g").alias("ga"))
    gb = grams_df.select(F.col("id").alias("id_b"), F.col("g").alias("gb"))
    pairs = counted.join(ga, "id_a").join(gb, "id_b")
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    union = F.size(F.array_union(F.col("ga"), F.col("gb")))
    j = inter / F.greatest(union, F.lit(1))
    verified = pairs.select("id_a", "id_b", "nb").where(
        j >= P04["threshold"]
    )
    rows = (
        verified.groupBy("nb").agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy("nb")
        .collect()
    )
    h = {int(r["nb"]): int(r["pairs"]) for r in rows}
    total = sum(h.values())
    lost4 = sum(v for k, v in h.items() if k < 4)
    return {
        "output_pairs": total,
        "output_band_histogram_head": {k: h[k] for k in sorted(h)[:8]},
        "lost_at_min4": lost4,
        "lost_at_min4_frac": round(lost4 / max(total, 1), 6),
        "lost_at_min2": h.get(1, 0),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    spark = build_session(app_name="p04-verify-study")
    out: dict = {"sf_dir": sf_dir}
    if mode == "outhist":
        out["outhist"] = outhist(spark, sf_dir)
        print(f"-- outhist: {out['outhist']}", file=sys.stderr, flush=True)
    if mode in ("hist", "all"):
        out["hist"] = hist(spark, sf_dir)
        print(f"-- hist: {out['hist']}", file=sys.stderr, flush=True)
    if mode == "variants":
        # plan-only A/B (broadcast hints can't change results — the
        # sf0.01 oracle gate re-certifies anyway): skip the two full
        # collect runs the equality gate costs
        out["ab"] = variants(spark, sf_dir, reps)
    if mode in ("ab", "all"):
        out["equal_at_this_sf"] = equality(spark, sf_dir)
        print(f"-- equal: {out['equal_at_this_sf']}", file=sys.stderr)
        out["ab"] = variants(spark, sf_dir, reps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
