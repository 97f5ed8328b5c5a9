"""Compaction for the persisted operator indexes (MinHash, cosine-LSH,
IVF) — the small-files maintenance op their append modes need.

Every `mode="append"` write (dedup.save_minhash_index,
dedup.save_cosine_index, similarity.append_to_ivf_index) adds one parquet
file per partition per batch: a year of daily appends leaves ~365 files
in every band/bucket/cell directory, and the PartitionFilters probe's
file-listing advantage — the reason these indexes exist — erodes into
exactly the small-files pathology the event store already solves for
itself (eventstore/store.py compact()).  `compact_index` rewrites the
multi-file partitions back to one file each; results are provably
unchanged (same rows, fewer files — pinned by tests).

Scale shape: only partitions holding more than `max_fragments` files are
touched; each is rewritten by its own small Spark job (scan one
directory, coalesce, write), and jobs run concurrently from a thread
pool — Spark schedules concurrent jobs from separate submitter threads,
so a 2^bits-bucket index compacts wide, not serially.  Swap order within
a partition mirrors the event store: the compacted file becomes visible
BEFORE the fragments vanish, so a reader globbing mid-swap sees
transient duplicate rows, never a partial partition.  Duplicate index
rows are harmless for the dedup indexes (candidates and verdicts
de-duplicate by id) and transient for IVF top-k; run compaction from a
maintenance window if that transient matters.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

# subdirectories that hold row data per index layout; meta/centroids are
# single-file by construction and never need compaction
_DATASET_DIRS = ("bands", "grams", "vectors")


def _data_files(d: str) -> list[str]:
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def _partition_dirs(d: str) -> list[str]:
    return sorted(
        e.path
        for e in os.scandir(d)
        if e.is_dir() and "=" in os.path.basename(e.path)
    )


def _rewrite_dir(spark: SparkSession, d: str, n_files: int) -> None:
    """Rewrite one directory's parquet fragments into `n_files`, visible
    before the fragments are unlinked (readers may transiently see
    duplicate rows, never fewer)."""
    frags = _data_files(d)
    tmp = f"{d}.tmp-compact-{time.time_ns()}"
    # read the files directly (no partition-column inference — the
    # partition value lives in the directory name and stays there)
    spark.read.parquet(*frags).coalesce(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    stamp = time.time_ns()
    for i, f in enumerate(_data_files(tmp)):
        os.rename(
            f, os.path.join(d, f"part-{stamp:020d}-{i:05d}-compacted.parquet")
        )
    for f in frags:
        os.unlink(f)
    shutil.rmtree(tmp, ignore_errors=True)


def compact_index(
    spark: SparkSession,
    path: str,
    max_fragments: int = 1,
    parallelism: int = 8,
) -> dict:
    """Compact a persisted index directory written by save_minhash_index,
    save_cosine_index, or save_ivf_index (+ their append modes).

    Rewrites every partition directory holding more than `max_fragments`
    parquet files down to one file, and flat datasets (the MinHash grams
    table) down to `max(1, ceil(files / 8))`-ish via coalesce to
    max_fragments.  Returns a report:
    {dataset: {"partitions_compacted": n, "files_before": b, "files_after": a}}.
    """
    report: dict = {}
    for name in _DATASET_DIRS:
        d = os.path.join(path, name)
        if not os.path.isdir(d):
            continue
        parts = _partition_dirs(d)
        before = 0
        compacted = 0
        if parts:
            touched = []
            for p in parts:
                n = len(_data_files(p))
                before += n
                if n > max_fragments:
                    touched.append(p)
            with ThreadPoolExecutor(max_workers=parallelism) as pool:
                list(
                    pool.map(
                        lambda p: _rewrite_dir(spark, p, 1), touched
                    )
                )
            compacted = len(touched)
            after = sum(len(_data_files(p)) for p in parts)
        else:
            before = len(_data_files(d))
            if before > max_fragments:
                _rewrite_dir(spark, d, max_fragments)
                compacted = 1
            after = len(_data_files(d))
        report[name] = {
            "partitions_compacted": compacted,
            "files_before": before,
            "files_after": after,
        }
    return report
