"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample / sampleBy) is cheap but irreproducible across
engines and partitionings. Training-data curation wants the opposite:
samples that are (a) stratified per group, (b) exactly sized, and
(c) bit-reproducible across runs, engines and cluster layouts — so a
pipeline re-run selects the same documents and an auditor can re-derive
the sample. Hash-rank sampling gives all three: order rows inside each
stratum by a cryptographic hash of their key and keep the first k.
The hash is uniform, so this is a uniform random sample with the hash as
the (fixed) randomness source; salt it to draw an independent sample.

Scale shape: one window per stratum (single shuffle on the stratum key);
no driver-side state, no collect.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by md5 hash-rank
    of ``id_col`` (ties on hash broken by the id itself, so the selection
    is total-ordered and engine-independent). ``salt`` varies the draw."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .drop("__rank")
    )


def weighted_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict,
    total: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic data mixture: draw ``total`` rows with per-stratum
    counts proportional to ``weights`` (rounded), each stratum's rows
    chosen by the same hash-rank as stratified_sample_exact. Strata absent
    from ``weights`` are excluded. The standard pretraining-mixture shape:
    'sample 1B docs at 50% web / 30% code / 20% books', reproducibly.

    Under-full strata yield what they have (the mixture shrinks rather
    than re-balancing — re-run with adjusted weights if exact totals
    matter); counts derive from weights alone, so the plan stays a single
    window + broadcast join, no extra pass over the data."""
    wsum = float(sum(weights.values()))
    ks = [(s, int(round(total * w / wsum))) for s, w in weights.items()]
    mapping = df.sparkSession.createDataFrame(ks, [strata_col, "__k"])
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
        F.col(id_col),
    )
    return (
        df.join(F.broadcast(mapping), strata_col)
        .withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= F.col("__k"))
        .drop("__rank", "__k")
    )


def stratified_sample_fraction(
    df: DataFrame,
    strata_cols: Sequence[str],
    fractions: dict,
    seed: int = 0,
    default_fraction: Optional[float] = None,
    max_strata: int = 100_000,
) -> DataFrame:
    """Approximate per-stratum Bernoulli sampling (Spark-native sampleBy)
    for when exact sizes don't matter and a second scan is too expensive.
    Single stratum column only (sampleBy limitation).

    ``default_fraction`` needs the distinct stratum set on the driver
    (sampleBy takes a literal fraction map).  That is bounded and fine
    for real strata (language, source, quality bucket) but a mistaken
    high-cardinality column (doc id, url) would funnel the corpus into
    the driver — so the collect is capped at ``max_strata`` and fails
    loudly past it rather than OOMing quietly."""
    if len(strata_cols) != 1:
        raise ValueError("sampleBy supports exactly one stratum column")
    col = strata_cols[0]
    if default_fraction is not None:
        # limit(max+1): bounded driver transfer regardless of cardinality
        present = [
            r[0]
            for r in df.select(col).distinct().limit(max_strata + 1).collect()
        ]
        if len(present) > max_strata:
            raise ValueError(
                f"stratum column {col!r} has more than {max_strata} "
                "distinct values — default_fraction materializes the "
                "stratum set on the driver, which is only sane for "
                "low-cardinality strata (language, source, bucket). "
                "Pass an explicit `fractions` map, raise `max_strata` "
                "deliberately, or stratify on a coarser column."
            )
        fractions = {v: fractions.get(v, default_fraction) for v in present}
    return df.sampleBy(col, fractions=fractions, seed=seed)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    out: str = "position",
    prefix_chars: int = 3,
) -> DataFrame:
    """Global training-order shuffle: assign every row a 0-based
    ``position`` in md5-hash order — uniformly random but bit-identical
    across runs, engines and partitionings (``salt`` draws an
    independent permutation). The last step of a curation pipeline:
    examples must reach training in an order uncorrelated with source
    layout, and re-runs must reproduce it.

    A global ``row_number() OVER (ORDER BY hash)`` would funnel the
    corpus through one task. Two-phase instead (same scheme as
    packing.global_prefix_sum): bucket by the hash's first
    ``prefix_chars`` hex chars (fixed-length lowercase hex, so
    lexicographic prefix order == numeric hash order), count per bucket,
    exclusive-prefix the 16^prefix_chars bucket counts on the tiny
    totals frame, broadcast offsets back, row_number within buckets
    (parallel across buckets, ties broken by id for totality).
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    with_h = df.withColumn("__h", h).withColumn(
        "__b", F.conv(F.substring("__h", 1, prefix_chars), 16, 10).cast("long")
    )
    counts = with_h.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    prior = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__off")
    )
    within = Window.partitionBy("__b").orderBy("__h", id_col)
    return (
        with_h.join(F.broadcast(offsets), "__b")
        .withColumn(out, F.col("__off") + F.row_number().over(within) - 1)
        .drop("__h", "__b", "__off")
    )
