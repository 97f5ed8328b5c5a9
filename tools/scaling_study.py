"""Measured scaling study for the pipeline operators.

Replicates the sf0.1 `documents` / `embeddings` tables 1x/2x/4x/8x into
/tmp (doc ids offset per replica; replica texts get a per-replica token
prefix so LSH near-dup clusters don't grow k-fold and the study measures
the ALGORITHM's scaling, not planted-duplicate blowup), then times each
operator at every scale and prints a JSON table plus the per-doubling
wall-clock ratio (a linear operator doubles; a quadratic one quadruples).

Results are recorded in PLANS.md ("Measured scaling"); run with
  python tools/scaling_study.py [max_factor]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scaling"
ID_STRIDE = 10_000_000


def materialize(spark, factor: int) -> str:
    out_dir = f"{WORK}/x{factor}"
    if os.path.exists(f"{out_dir}/_OK"):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = load_table(spark, BASE, "documents")
    emb = load_table(spark, BASE, "embeddings")
    d_parts, e_parts = [], []
    for i in range(factor):
        # 24 replica-specific prefix tokens push replica-vs-replica
        # jaccard to ~0.6 (< the 0.9 LSH threshold) so near-dup cluster
        # sizes stay constant as the corpus scales
        prefix = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"rep{i}tok{j}x"), (F.col("doc_id") % 7).cast("string"))
                for j in range(24)
            ],
        )
        rest = [c for c in docs.columns if c not in ("doc_id", "text")]
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                F.concat(prefix, F.lit(" "), F.col("text")).alias("text"),
                *rest,
            )
        )
        e_rest = [c for c in emb.columns if c != "vec_id"]
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                *e_rest,
            )
        )
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    open(f"{out_dir}/_OK", "w").write("ok")
    return out_dir


def timed(fn, *args) -> float:
    t0 = time.time()
    fn(*args)
    return round(time.time() - t0, 2)


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = build_session(app_name="scaling_study")

    from cloudfabric_eventsourcing_spark.operators import dedup, similarity, text
    from cloudfabric_eventsourcing_spark.operators.packing import pack_offsets

    def run_t06(sf):
        docs = load_table(spark, sf, "documents")
        text.repetition_stats(docs).agg(F.sum("n_distinct")).collect()

    def run_p11(sf):
        docs = load_table(spark, sf, "documents")
        text.remove_boilerplate_lines(docs, min_docs=25).agg(
            F.sum(F.length("clean"))
        ).collect()

    def run_p12(sf):
        docs = load_table(spark, sf, "documents")
        counted = docs.select(
            "doc_id", text.token_count_whitespace(F.col("text")).alias("n_tokens")
        )
        pack_offsets(counted, ctx_len=256).agg(F.max("last_chunk")).collect()

    def run_p01(sf):
        docs = load_table(spark, sf, "documents")
        dedup.exact_dedup(docs).count()

    def run_p04(sf):
        docs = load_table(spark, sf, "documents")
        dedup.minhash_lsh_pairs(docs, threshold=0.9).count()

    qvec = [
        float(x)
        for x in load_table(spark, BASE, "embeddings").limit(1).collect()[0][
            "embedding"
        ]
    ]

    def run_s01(sf):
        emb = load_table(spark, sf, "embeddings")
        similarity.brute_force_topk(emb, qvec, k=5).collect()

    def run_p13(sf):
        from cloudfabric_eventsourcing_spark.operators import graph

        docs = load_table(spark, sf, "documents")
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9)
        graph.duplicate_clusters(pairs).count()

    def run_p14(sf):
        from cloudfabric_eventsourcing_spark.operators import sampling

        docs = load_table(spark, sf, "documents")
        sampling.deterministic_shuffle(docs, id_col="doc_id").agg(
            F.max("position")
        ).collect()

    def run_t07(sf):
        docs = load_table(spark, sf, "documents")
        text.vocab_topk(docs, k=100).count()

    ops = {
        "t06_repetition_stats": run_t06,
        "p11_boilerplate_lines": run_p11,
        "p12_pack_offsets": run_p12,
        "p01_exact_dedup": run_p01,
        "p04_minhash_lsh": run_p04,
        "s01_ann_brute_force": run_s01,
        "p13_duplicate_clusters": run_p13,
        "p14_train_shuffle": run_p14,
        "t07_vocab_topk": run_t07,
    }

    factors = [f for f in (1, 2, 4, 8) if f <= max_factor]
    results: dict = {op: {} for op in ops}
    for f in factors:
        sf = materialize(spark, f)
        for op, fn in ops.items():
            fn(sf)  # warm (parquet footer cache, JIT)
            results[op][f] = timed(fn, sf)
        print(f"-- x{f} done", file=sys.stderr)

    table = {
        op: {
            "wall_s": vals,
            "doubling_ratios": [
                round(vals[b] / vals[a], 2)
                for a, b in zip(factors, factors[1:])
                if vals.get(a) and vals.get(b)
            ],
        }
        for op, vals in results.items()
    }
    print(json.dumps({"base": "sf0.1", "factors": factors, "ops": table}))


if __name__ == "__main__":
    main()
