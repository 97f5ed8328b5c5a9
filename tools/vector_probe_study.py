"""Measured flat-in-corpus-size study for the persisted COSINE index
probe (r8 verdict ask #4): PLANS.md asserted curate_vector_stream
inherits the text loop's measured batch-cost flatness, but
index_probe_study.py only measured the MinHash probe.  This is the
embedding twin, same shape:

  probe:    cosine_dedup_against_index(batch, index) — corpus bucketed
            on disk, scan pruned to the batch's probed buckets, batch
            broadcast
  one-shot: cosine_neardup_pairs_lsh(corpus UNION batch) restricted to
            batch-vs-corpus pairs — what you pay without an index
            (re-bucketing the ENTIRE corpus per batch)

Corpora are synthesized deterministically from the sf0.1 embeddings
table (2k vectors, 64 dims) by replication with per-replica
hash-derived perturbation — replicas land in spread-out LSH buckets
like real data, and the id stride keeps every replica distinct.  The
batch is a fixed 500 vectors at every scale: ~2% exact copies of
corpus vectors (true near-dups the probe must find), the rest
perturbed out of near-dup range.

Expectation — and the study's actual finding: flatness is CONDITIONAL
on bucket cardinality.  At bits=8 (256 buckets) a 500-vector multiprobe
batch touches every bucket, partition pruning prunes nothing, and the
probe degrades to a corpus scan + occupancy-sized candidate join — NOT
flat.  At bits sized for the corpus (2^bits >> batch x (bits+1) probes,
occupancy bounded) the probed-partition listing and the candidate count
are both batch-bounded and the probe is ~flat from 100k to 500k while
the one-shot grows.  Operationally: pick bits ~ log2(corpus/target
occupancy) at index creation, and re-bucket (blue/green, the
similarity.retrain path) when the corpus outgrows it — the (dims,
bits, seed) pin makes outgrowing DETECTABLE, not silent.

Usage:  python tools/vector_probe_study.py [sizes...]
        (default 100000 500000, each at bits=8 and bits=16;
         prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cloudfabric_eventsourcing_spark.operators import dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402

WORK = "/tmp/spark_graft_vector_probe_study"
BASE = "/root/testdata/sf0.1"
BATCH_OFFSET = 900_000_000
REPLICA_STRIDE = 1_000_000
DIMS = 64
BITS_ARMS = (8, 16)


def _perturbed(df, replica_col, scale):
    """embedding' = embedding + U(-scale, scale) per element, derived
    from xxhash64(vec_id, replica, i) — deterministic, JVM-side, and
    enough to scatter replicas across LSH buckets at scale=0.05 while
    keeping cosine >= 0.999 impossible vs the original."""
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(DIMS - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("vec_id"), F.col(replica_col), i), F.lit(10_000))
            .cast("double") / 5_000.0 - 1.0
        ) * scale,
    )
    return F.zip_with(
        F.col("embedding"), idx, lambda x, d: x.cast("double") + d
    )


def _corpus(spark, n: int):
    base = load_table(spark, BASE, "embeddings")
    n_base = base.count()
    replicas = (n + n_base - 1) // n_base
    rep = base.select(
        "vec_id", "embedding", F.explode(
            F.sequence(F.lit(0), F.lit(replicas - 1))
        ).alias("r")
    )
    # replicas * n_base rows (>= n; exact when n_base divides n) — no
    # row-limit: a global limit would gather through one task
    return rep.select(
        (F.col("vec_id") + F.col("r") * REPLICA_STRIDE).alias("vec_id"),
        _perturbed(rep, "r", 0.05).alias("embedding"),
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 500_000]
    spark = build_session(app_name="vector_probe_study")

    results = {}
    for n in sizes:
        corpus = _corpus(spark, n).localCheckpoint(eager=True)
        n_corpus = corpus.count()

        # fixed 500-vector batch: 10 exact copies of corpus vectors
        # (true dups), 490 perturbed well out of near-dup range
        seed_rows = corpus.orderBy("vec_id").limit(500)
        batch = seed_rows.select(
            (F.col("vec_id") + F.lit(BATCH_OFFSET)).alias("vec_id"),
            F.when(
                F.pmod(F.col("vec_id"), F.lit(50)) == 0, F.col("embedding")
            ).otherwise(
                _perturbed(seed_rows, "vec_id", 0.2)
            ).alias("embedding"),
        ).localCheckpoint(eager=True)

        for bits in BITS_ARMS:
            idx = os.path.join(WORK, f"n{n}b{bits}")
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.perf_counter()
            dedup.save_cosine_index(corpus, idx, dims=DIMS, bits=bits)
            build_s = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            hits = dedup.cosine_dedup_against_index(
                batch, idx, threshold=0.999
            ).count()
            probe_s = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            union = corpus.unionByName(batch)
            pairs = dedup.cosine_neardup_pairs_lsh(
                union, threshold=0.999, dims=DIMS, bits=bits
            )
            oneshot_hits = pairs.where(
                (F.col("id_b") >= BATCH_OFFSET)
                & (F.col("id_a") < BATCH_OFFSET)
            ).count()
            oneshot_s = round(time.perf_counter() - t0, 2)

            results[f"n{n}_bits{bits}"] = {
                "corpus_vectors": n_corpus,
                "bits": bits,
                "index_build_s": build_s,
                "probe_s": probe_s,
                "probe_batch_hits": hits,
                "oneshot_s": oneshot_s,
                "oneshot_batch_hits": oneshot_hits,
                "speedup": round(oneshot_s / probe_s, 1) if probe_s else None,
            }
            print(f"-- n={n} bits={bits}: probe {probe_s}s ({hits} hits) "
                  f"vs one-shot {oneshot_s}s ({oneshot_hits})",
                  file=sys.stderr)
    print(json.dumps({"batch_vectors": 500, "dims": DIMS,
                      "corpora": results}))


if __name__ == "__main__":
    main()
