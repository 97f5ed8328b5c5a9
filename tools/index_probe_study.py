"""Measured incremental-dedup study: persisted-index probe vs one-shot.

The persisted MinHash index (operators/dedup.py::save_minhash_index /
dedup_against_index) exists for exactly one reason: a daily increment
must not re-pay the full-corpus banding scan.  This tool MEASURES that
claim at two corpus scales so PLANS.md can cite numbers instead of an
argument:

  probe:    dedup_against_index(batch, index)        — corpus already
            banded on disk, batch broadcast against the index scan
  one-shot: minhash_lsh_pairs(corpus UNION batch) restricted to
            batch-vs-corpus pairs — what you pay without an index

The one-shot is NOT charged the full corpus self-join: the batch-only
restriction (id_b in the batch id range, given the join's id_a < id_b)
reaches the banded self-join's probe side, so Catalyst itself prunes
the naive union query into a probe-shaped join.  (With the symmetric
OR form the same pruning falls out of constraint inference:
a.id < b.id makes both disjuncts imply b.id in the batch range —
measured identical.)  What canNOT be pruned away without an index is
re-tokenizing, re-hashing, and re-banding the ENTIRE corpus per batch
— a full corpus scan that the persisted index replaces with a parquet
read of the touched band partitions.  That term is the study's
subject.

The batch is a fixed ~500 docs at every scale (a daily increment does
not grow with the corpus).  Expectation: probe wall ~flat in corpus
size; one-shot wall grows ~linearly with the corpus it re-bands.

Usage:  python tools/index_probe_study.py
        (uses /root/testdata/sf0.1 and /tmp/spark_graft_sf1 if present)
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
from cloudfabric_eventsourcing_spark.operators import dedup  # noqa: E402

WORK = "/tmp/spark_graft_probe_study"
BATCH_OFFSET = 900_000_000


def main() -> None:
    spark = build_session(app_name="index_probe_study")
    corpora = [p for p in ("/root/testdata/sf0.1", "/tmp/spark_graft_sf1",
                           "/tmp/spark_graft_sf10")
               if os.path.exists(p)]
    # the increment: a fixed-size batch, mostly novel (rewritten tokens),
    # ~2% true near-dups of corpus docs — ids offset out of every corpus
    # id range.  Mostly-novel matters: an unmodified doc drawn from this
    # corpus's planted near-dup family matches HUNDREDS of corpus docs,
    # and the resulting exact-verify work (identical in both paths)
    # swamps the corpus-banding term the study isolates.
    base = load_table(spark, corpora[0], "documents").limit(500)
    batch = base.select(
        (F.col("doc_id") + F.lit(BATCH_OFFSET)).alias("doc_id"),
        F.when(
            F.col("doc_id") % 50 != 0,
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", r"\s+"),
                    lambda x: F.when(
                        F.pmod(F.xxhash64(x, F.lit(77)), F.lit(3)) < 2,
                        F.concat(x, F.lit("zq")),
                    ).otherwise(x),
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    ).localCheckpoint(eager=True)

    results = {}
    for sf_dir in corpora:
        corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_corpus = corpus.count()
        idx = os.path.join(WORK, os.path.basename(sf_dir.rstrip("/")))
        if not os.path.exists(os.path.join(idx, "meta")):
            shutil.rmtree(idx, ignore_errors=True)
            t0 = time.perf_counter()
            dedup.save_minhash_index(corpus, idx)
            build_s = round(time.perf_counter() - t0, 2)
        else:
            build_s = None  # reused from a prior run

        t0 = time.perf_counter()
        hits = dedup.dedup_against_index(batch, idx).count()
        probe_s = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        union = corpus.unionByName(batch)
        pairs = dedup.minhash_lsh_pairs(union, threshold=0.9)
        # batch-vs-CORPUS pairs only, in the per-side pushable form
        # (id_a < id_b makes "exactly one side in the batch" equal to
        # "b in batch AND a not"): the probe never reports
        # batch-internal pairs, so the one-shot count must not either
        oneshot_hits = pairs.where(
            (F.col("id_b") >= BATCH_OFFSET) & (F.col("id_a") < BATCH_OFFSET)
        ).count()
        oneshot_s = round(time.perf_counter() - t0, 2)

        results[sf_dir] = {
            "corpus_docs": n_corpus,
            "index_build_s": build_s,
            "probe_s": probe_s,
            "probe_batch_hits": hits,
            "oneshot_s": oneshot_s,
            "oneshot_batch_hits": oneshot_hits,
            "speedup": round(oneshot_s / probe_s, 1) if probe_s else None,
        }
        print(f"-- {sf_dir}: probe {probe_s}s vs one-shot {oneshot_s}s",
              file=sys.stderr)
    print(json.dumps({"batch_docs": 500, "corpora": results}))


if __name__ == "__main__":
    main()
