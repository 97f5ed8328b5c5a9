"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

Broadcast handles small dimensions and salting handles hot keys; the third
scale tool is bucketing — pre-shuffling both sides of a *repeated* big-big
join into the same hash layout at write time, so every subsequent join on
the bucket key runs with zero Exchange. On a cluster this is Delta/Iceberg
bucket (or liquid-clustering) layout; Spark's parquet bucketed tables give
the identical planner behavior locally.

The win is per-JOIN, paid once per WRITE: bucket the event log by
stream_id and every projection fold / point correlation joins co-located;
bucket two fact tables by the shared key and the nightly reconciliation
join never shuffles either side.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    managed parquet table. Joins between tables bucketed on the same
    columns with the same ``n_buckets`` plan without an Exchange; matching
    ``sort_cols`` also removes the Sort below a sort-merge join."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the final physical plan (AQE-aware
    after an action, pre-execution plan otherwise) — the metric bucketing
    is meant to drive to zero for the join inputs."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


# ---------------------------------------------------------------------------
# Persisted bucketed layout for the star-schema fact tables
#
# The round-5 crossover study (PLANS.md) measured the one query family
# where the embedded single-node oracle stays ahead of Spark locally:
# star-join aggregates, whose cost is the shuffle materialization of the
# lineitem<->orders fact-fact join.  Bucketing both facts by the order
# key at WRITE time removes that shuffle from every subsequent join
# (measured 1.86x on the h2 core at sf10, exchanges 3 -> 1) — and on a
# real cluster it is the difference between shuffling 100 TB per join
# and shuffling nothing.  This block makes that layout a first-class,
# transparently-consumed artifact:
#
#   * ensure_bucketed_layout(spark, sf_dir) builds (or refreshes) the
#     layout under a cache root, one-time cost, manifest-tracked;
#   * load_table() consults the manifest and serves the bucketed table
#     for covered names — every query path (bench, oracle harness,
#     user code) picks it up with zero changes;
#   * sessions that did not build the layout re-attach to it with a
#     CREATE TABLE ... CLUSTERED BY ... LOCATION DDL (the bucket spec
#     lives in the session catalog; the files carry Spark's bucket-id
#     naming, so any session can re-register them).
#
# Cluster mapping: this is exactly Delta/Iceberg `bucket(N, key)`
# partition-transform layout (or Hive bucketed tables); the manifest
# stands in for the table catalog.
# ---------------------------------------------------------------------------

# fact tables and their (bucket_cols, sort_cols), grouped by
# CO-LOCATION: tables in one group only pay off together (bucketing one
# side of the lineitem<->orders join is useless), so each group
# activates as a unit on ITS largest member's size.  The order key is
# THE repeated fact-fact join key of the workload; events bucket by
# user_id because sessionization / per-user folds / funnel / retention
# all partition by it (measured at sf10: x02 1.74 -> 0.95 s, a4-fold
# 0.34 -> 0.26 s, exchanges 1 -> 0).  Per-bucket sort also removes the
# Sort under sort-merge joins / windows and gives row-group min/max
# pruning on the key.
BUCKETED_GROUPS: list[dict[str, tuple[tuple[str, ...], tuple[str, ...]]]] = [
    {
        "lineitem": (("l_orderkey",), ("l_orderkey",)),
        "orders": (("o_orderkey",), ("o_orderkey",)),
    },
    {
        "events": (("user_id",), ("user_id", "ts")),
    },
]
# flat view (all groups merged) — the default spec set
BUCKETED_SPECS: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    name: spec for group in BUCKETED_GROUPS for name, spec in group.items()
}
DEFAULT_N_BUCKETS = 32

# Activation threshold, measured (PLANS.md Round-6 notes): bucketing wins
# 1.55x on the h-family at sf10 (60M-row lineitem) but COSTS ~20% at
# sf0.1 — with a ~15 MB fact the shuffle it saves is cheaper than the
# fixed 32-bucket scan granularity and catalog-analysis overhead it
# adds.  The layout therefore only activates when the largest spec'd
# source table crosses this size; below it, load_table serves plain
# parquet (exactly the call a table catalog's optimizer would make).
# The whole LAYOUT gates on the largest table: co-location needs both
# join sides bucketed, so activating one without the other is useless.
DEFAULT_MIN_SOURCE_BYTES = 100 * 1024 * 1024  # sf1 and up

_MANIFEST = "manifest.json"


def _min_source_bytes() -> int:
    raw = os.environ.get("SPARK_GRAFT_BUCKETED_MIN_BYTES")
    return int(raw) if raw else DEFAULT_MIN_SOURCE_BYTES


def _source_bytes(sf_dir: str, name: str) -> int:
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(p):
            import glob as _glob

            return sum(
                os.stat(f).st_size
                for f in _glob.glob(os.path.join(p, "*.parquet"))
            )
        return os.stat(p).st_size
    except FileNotFoundError:
        return 0


def _layout_active(sf_dir: str, specs: dict) -> bool:
    threshold = _min_source_bytes()
    if threshold <= 0:
        return True
    return max(
        (_source_bytes(sf_dir, name) for name in specs), default=0
    ) >= threshold


def _group_for(name: str) -> dict:
    """The co-location group a table belongs to (for gating): tables not
    in any default group gate on their own size."""
    for group in BUCKETED_GROUPS:
        if name in group:
            return group
    return {name: None}


def _spec_groups(specs: Optional[dict]) -> list[dict]:
    """Default specs split into their co-location groups; a caller's
    custom spec dict is treated as ONE group (they asked for exactly
    that co-located set)."""
    if specs is None or specs is BUCKETED_SPECS:
        return BUCKETED_GROUPS
    return [specs]


def _layout_root() -> str:
    root = os.environ.get("SPARK_GRAFT_BUCKETED_ROOT")
    if root:
        return root
    # <repo>/.bucketed (gitignored): survives across sessions and bench
    # runs on one machine; on a cluster this would be a table location
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".bucketed",
    )


def _digest(sf_dir: str) -> str:
    return hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]


def bucketed_layout_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.abspath(sf_dir).rstrip("/")) or "root"
    return os.path.join(_layout_root(), f"{base}-{_digest(sf_dir)}")


def _catalog_name(sf_dir: str, name: str) -> str:
    return f"cfes_bucketed_{_digest(sf_dir)}_{name}"


def _source_signature(sf_dir: str, name: str) -> list:
    """Cheap staleness probe for an immutable-fixture source: size+mtime
    of the table file (or the newest fragment of a directory dataset)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(p)
    except FileNotFoundError:
        return ["missing"]
    if os.path.isdir(p):
        import glob as _glob

        frags = _glob.glob(os.path.join(p, "*.parquet"))
        return [
            len(frags),
            max((os.stat(f).st_mtime_ns for f in frags), default=0),
            sum(os.stat(f).st_size for f in frags),
        ]
    return [st.st_size, st.st_mtime_ns]


_COMPLETE = "_SPARK_GRAFT_COMPLETE"  # underscore prefix: invisible to scans


def _write_complete_token(tpath: str, sig: list, n_buckets: int) -> None:
    """Per-table completion token, written AFTER saveAsTable finishes.
    A rebuild runs rmtree + saveAsTable while the on-disk manifest still
    lists the table (r6 advice): without the token a concurrent session
    could see manifest + partially-written files and silently serve
    incomplete rows — or, on an n_buckets change, register the stale
    bucket count against new files and corrupt bucketed-join results.
    Serving requires token presence AND token/manifest agreement."""
    tmp = os.path.join(tpath, f".{_COMPLETE}.part")
    with open(tmp, "w") as fh:
        json.dump({"source_sig": sig, "n_buckets": n_buckets}, fh)
    os.replace(tmp, os.path.join(tpath, _COMPLETE))


def _read_complete_token(tpath: str) -> Optional[dict]:
    try:
        with open(os.path.join(tpath, _COMPLETE)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def read_bucketed_manifest(sf_dir: str) -> Optional[dict]:
    path = os.path.join(bucketed_layout_dir(sf_dir), _MANIFEST)
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None


def ensure_bucketed_layout(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    specs: Optional[dict] = None,
) -> dict:
    """Build (or refresh) the bucketed fact layout for ``sf_dir``.

    Idempotent: tables whose source signature matches the manifest are
    left alone, so repeated calls cost one json read + a few stats.
    Returns {"dir", "built": [names rebuilt], "manifest"}.  The manifest
    is written LAST (atomic rename), so a crashed build is invisible to
    readers and simply rebuilt next call.
    """
    from cloudfabric_eventsourcing_spark.sources import tables as _tables

    # per-co-location-group gate: only groups whose largest member
    # crosses the threshold build (see DEFAULT_MIN_SOURCE_BYTES) —
    # below it the layout only adds scan overhead
    active: dict = {}
    for group in _spec_groups(specs):
        if _layout_active(sf_dir, group):
            active.update(group)
    specs = active
    if not specs:
        return {"dir": bucketed_layout_dir(sf_dir), "built": [],
                "manifest": {"n_buckets": n_buckets, "tables": {}}}
    ldir = bucketed_layout_dir(sf_dir)
    os.makedirs(ldir, exist_ok=True)
    manifest = read_bucketed_manifest(sf_dir)
    if manifest is None or manifest.get("n_buckets") != n_buckets:
        manifest = {"n_buckets": n_buckets, "source": os.path.abspath(sf_dir), "tables": {}}
    built: list[str] = []
    for name, (bcols, scols) in specs.items():
        src = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        sig = _source_signature(sf_dir, name)
        entry = manifest["tables"].get(name)
        tpath = os.path.join(ldir, name)
        token = _read_complete_token(tpath)
        if (
            entry
            and entry.get("source_sig") == sig
            and os.path.isdir(tpath)
            and token is not None
            and token.get("source_sig") == sig
            and token.get("n_buckets") == n_buckets
        ):
            continue
        df = _tables.load_parquet(spark, src)
        cat = _catalog_name(sf_dir, name)
        spark.sql(f"DROP TABLE IF EXISTS {cat}")
        if os.path.isdir(tpath):
            shutil.rmtree(tpath)
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bcols)
        )
        if scols:
            writer = writer.sortBy(*scols)
        writer.option("path", tpath).saveAsTable(cat)
        _write_complete_token(tpath, sig, n_buckets)
        manifest["tables"][name] = {
            "bucket_cols": list(bcols),
            "sort_cols": list(scols),
            "schema_ddl": [
                f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
            ],
            "source_sig": sig,
            "path": tpath,
        }
        built.append(name)
    if built:
        tmp = os.path.join(ldir, f".{_MANIFEST}.part")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, os.path.join(ldir, _MANIFEST))
        # cached plain DataFrames for these tables are now stale
        _tables.invalidate_table_cache(sf_dir.rstrip("/"))
    return {"dir": ldir, "built": built, "manifest": manifest}


def bucketed_table(
    spark: SparkSession, sf_dir: str, name: str
) -> Optional[DataFrame]:
    """The bucketed DataFrame for (sf_dir, name), re-registering the
    catalog entry if this session has not seen it — or None when no
    fresh layout covers the table (callers fall back to plain parquet).
    Set SPARK_GRAFT_NO_BUCKETED=1 to force the plain path (A/B tools)."""
    if os.environ.get("SPARK_GRAFT_NO_BUCKETED") == "1":
        return None
    manifest = read_bucketed_manifest(sf_dir)
    if not manifest:
        return None
    # serve-time gate too (per co-location group): a layout built under
    # a different threshold (or for a table that has since shrunk) must
    # not activate below the line
    if not _layout_active(sf_dir, _group_for(name)):
        return None
    entry = manifest["tables"].get(name)
    if not entry or not os.path.isdir(entry["path"]):
        return None
    if entry.get("source_sig") != _source_signature(sf_dir, name):
        return None  # stale layout: serve the source of truth instead
    token = _read_complete_token(entry["path"])
    if (
        token is None
        or token.get("source_sig") != entry.get("source_sig")
        or token.get("n_buckets") != manifest.get("n_buckets")
    ):
        # mid-rebuild (or crashed build): files may be partial, or the
        # manifest's bucket count may not describe them — fall back to
        # plain parquet rather than risk wrong join co-location
        return None
    cat = _catalog_name(sf_dir, name)
    if not spark.catalog.tableExists(cat):
        cols = ", ".join(entry["schema_ddl"])
        bcols = ", ".join(f"`{c}`" for c in entry["bucket_cols"])
        scols = ", ".join(f"`{c}`" for c in entry["sort_cols"])
        sorted_clause = f"SORTED BY ({scols}) " if entry["sort_cols"] else ""
        spark.sql(
            f"CREATE TABLE {cat} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({bcols}) {sorted_clause}"
            f"INTO {manifest['n_buckets']} BUCKETS "
            f"LOCATION '{entry['path']}'"
        )
    return spark.table(cat)
