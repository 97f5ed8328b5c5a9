"""Quality classification for training-data curation — the GPT-3 /
CCNet-style filter: a linear classifier over hashed n-gram features,
trained with a high-quality seed corpus as positives and the raw pool
as negatives, then used to score (and Pareto-sample) the whole corpus.

This is the supervised complement to the unsupervised scorers in
operators/text.py (heuristic quality_score, fluency, rarity) and the
importance weights in sampling.dsir_log_weights: where DSIR matches a
target DISTRIBUTION, the classifier learns a target BOUNDARY.

Spark-first shape: everything is pyspark.ml — RegexTokenizer / NGram /
HashingTF featurization and LogisticRegression all execute JVM-side;
training is L-BFGS over treeAggregate'd gradients (the canonical
distributed fit), scoring is one map-only transform.  No Python UDFs
anywhere; probabilities come out through vector_to_array.

At 100 TB: featurization is embarrassingly parallel; each L-BFGS
iteration is one treeAggregate of a `num_features`-sized gradient
(2^18 doubles = 2 MB per partial — tune num_features against executor
memory, not corpus size); scoring is a single pass.  Train on a
SAMPLE (stratified_sample_exact) — the boundary needs thousands of
docs, not billions.

No oracle row: an iterative L-BFGS fit is not SQL-expressible, so this
operator is pinned by pytest (separability, determinism of the Pareto
filter, no-UDF plan) rather than the DuckDB differential — the same
honesty boundary as the streaming operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUALITY_COL = "quality_prob"


def _feature_pipeline(text_col: str, num_features: int, bigrams: bool):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, SQLTransformer

    stages = [
        RegexTokenizer(
            inputCol=text_col,
            outputCol="__toks",
            pattern=r"\s+",
            toLowercase=True,
        )
    ]
    gram_col = "__toks"
    if bigrams:
        stages.append(NGram(n=2, inputCol="__toks", outputCol="__bi"))
        stages.append(
            SQLTransformer(
                statement="SELECT *, concat(__toks, __bi) AS __grams FROM __THIS__"
            )
        )
        gram_col = "__grams"
    stages.append(
        HashingTF(
            inputCol=gram_col, outputCol="__features", numFeatures=num_features
        )
    )
    return Pipeline(stages=stages)


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    bigrams: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the quality boundary: `positive` is the trusted seed (the
    GPT-3 recipe used curated reference corpora), `negative` a sample
    of the raw pool.  Returns a fitted PipelineModel whose last stage
    is the logistic model; feed it to score_quality.

    Class balance is the caller's job (sample the raw pool down to
    roughly the seed's size — stratified_sample_exact keeps that
    reproducible); reg_param defaults to light L2 so the hashed
    features don't memorize the seed."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    # null-tolerant like every text operator here: RegexTokenizer NPEs
    # on null input, so nulls train (and score) as empty documents
    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    train = positive.select(
        txt.alias(text_col), F.lit(1.0).alias("__label")
    ).unionByName(
        negative.select(txt.alias(text_col), F.lit(0.0).alias("__label"))
    )
    feats = _feature_pipeline(text_col, num_features, bigrams)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        regParam=reg_param,
        maxIter=max_iter,
    )
    return Pipeline(stages=[feats, lr]).fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = QUALITY_COL,
) -> DataFrame:
    """Append P(high quality) for every row — one map-only pass, all
    original columns (and their original values, nulls included)
    preserved.  `text_col` names the column of THIS frame to score; it
    is fed to the model under whatever column name the model was fit
    on (read back from the fitted tokenizer), so a frame with a
    different text column name — or an unrelated column that happens
    to collide with the fit name — scores correctly."""
    from pyspark.ml.functions import vector_to_array

    fit_col = model.stages[0].stages[0].getInputCol()
    orig = df.columns
    prep = df.select(
        *[F.col(c).alias(f"__orig_{i}") for i, c in enumerate(orig)]
    ).withColumn(
        fit_col,
        F.coalesce(
            F.col(f"__orig_{orig.index(text_col)}").cast("string"),
            F.lit(""),
        ),
    )
    return model.transform(prep).select(
        *[F.col(f"__orig_{i}").alias(c) for i, c in enumerate(orig)],
        vector_to_array(F.col("probability"))[1].alias(out_col),
    )


def pareto_quality_filter(
    scored: DataFrame,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    salt: str = "",
    quality_col: str = QUALITY_COL,
) -> DataFrame:
    """The GPT-3 retention rule: keep a document iff
    `pareto_draw(alpha) > 1 - score` — high-quality docs survive almost
    surely, low-quality ones with small (score-dependent) probability,
    so the filtered corpus keeps a long quality tail instead of a hard
    cliff.  The Pareto draw is derived from md5(id || salt) through the
    inverse CDF ((1-u)^(-1/alpha) - 1), making the filter
    bit-reproducible across runs, engines and partitionings — the same
    hash-randomness trade as dsir_resample and every sampler here.
    Different `salt` values draw independent filters."""
    from cloudfabric_eventsourcing_spark.operators.sampling import hash_uniform

    u = hash_uniform(id_col, salt)
    draw = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.where(draw > (1.0 - F.col(quality_col)))
