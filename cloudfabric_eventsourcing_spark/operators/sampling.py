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
) -> DataFrame:
    """Approximate per-stratum Bernoulli sampling (Spark-native sampleBy)
    for when exact sizes don't matter and a second scan is too expensive.
    Single stratum column only (sampleBy limitation)."""
    if len(strata_cols) != 1:
        raise ValueError("sampleBy supports exactly one stratum column")
    col = strata_cols[0]
    if default_fraction is not None:
        present = [r[0] for r in df.select(col).distinct().collect()]
        fractions = {v: fractions.get(v, default_fraction) for v in present}
    return df.sampleBy(col, fractions=fractions, seed=seed)
