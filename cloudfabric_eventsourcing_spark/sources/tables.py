"""Parquet table loaders for the synthetic star schema (TESTDATA.md).

Handles a real-world scan concern: parquet files written with
nanosecond-precision timestamps (pandas/pyarrow default). Spark has no
nanosecond timestamp type and refuses such columns unless
`spark.sql.legacy.parquet.nanosAsLong=true`; we read them as int64
nanoseconds and convert to µs TimestampType with `timestamp_micros`,
which matches DuckDB's silent ns->µs truncation, keeping Spark and the
DuckDB oracle bit-identical on the same files.

All conversion is columnar/JVM-side (no UDFs); the extra projection is
codegen'd away, and predicate pushdown still applies to all untouched
columns.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# cache: path -> list of nanosecond-timestamp column names
_NANOS_COLS: dict[str, list[str]] = {}


def _nanos_columns(path: str) -> list[str]:
    if path not in _NANOS_COLS:
        try:
            schema = pq.read_schema(path)
            _NANOS_COLS[path] = [
                f.name for f in schema if str(f.type).startswith("timestamp[ns")
            ]
        except (OSError, IsADirectoryError):
            # directory datasets: inspect one fragment
            import glob
            import os

            frags = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not frags:
                _NANOS_COLS[path] = []
            else:
                schema = pq.read_schema(frags[0])
                _NANOS_COLS[path] = [
                    f.name for f in schema if str(f.type).startswith("timestamp[ns")
                ]
    return _NANOS_COLS[path]


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with nanosecond-timestamp normalization to µs."""
    nanos = _nanos_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for name in nanos:
        # integer `div`, not `/`: float division of ~1.7e18 ns loses
        # sub-µs precision (double mantissa is 53 bits) and can flip a µs
        df = df.withColumn(name, F.expr(f"timestamp_micros(`{name}` div 1000)"))
    return df


# cache: (session, path) -> analyzed DataFrame.  A fresh
# spark.read.parquet costs ~110 ms of driver round-trips (file listing +
# footer schema inference) per call; across a 44-query bench suite
# loading 2-6 tables each that was most of the measured plan-build
# wall.  DataFrames are immutable and the sf dirs are read-only test
# fixtures, so reusing the analyzed plan is safe.  Deliberately NOT in
# load_parquet, whose callers may re-read paths they just rewrote.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def invalidate_table_cache(path: Optional[str] = None) -> int:
    """Drop cached analyzed DataFrames — ALL entries, or just those whose
    parquet path starts with `path` (a table file or a whole sf dir).

    The cache assumes sf dirs are immutable fixtures; any caller that
    rewrites a table's parquet within the same Spark application must
    invalidate here first or load_table hands back a stale plan/schema.
    Returns the number of entries dropped."""
    if path is None:
        n = len(_TABLE_CACHE)
        _TABLE_CACHE.clear()
        return n
    # boundary-aware prefix: invalidating ".../sf1" must not also drop
    # ".../sf10" entries that share the string prefix
    prefix = path.rstrip("/") + "/"
    doomed = [
        k for k in _TABLE_CACHE if k[1] == path or k[1].startswith(prefix)
    ]
    for k in doomed:
        del _TABLE_CACHE[k]
    return len(doomed)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, f"{sf_dir}/{name}.parquet")
    df = _TABLE_CACHE.get(key)
    if df is None:
        # a persisted bucketed layout (sources/bucketing.py) covering
        # this table is served transparently: same rows, shuffle-free
        # fact-fact joins.  Falls back to plain parquet when absent.
        from cloudfabric_eventsourcing_spark.sources import bucketing

        df = bucketing.bucketed_table(spark, sf_dir, name)
        if df is None:
            df = load_parquet(spark, key[1])
        _TABLE_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all tables as temp views for spark.sql use."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
