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


def train_language_id(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    num_features: int = 1 << 15,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit a fastText-style trained language identifier: multinomial
    logistic regression over hashed character 2+3-grams — character
    grams, not word grams, because orthography (letter sequences,
    diacritics, script mix) is what separates languages, and they need
    no word tokenizer so non-space-delimited scripts work too.  The
    supervised upgrade to text.py's stopword/charset heuristic
    (t01_language_id stays the oracle-able default; this is what real
    pipelines swap in once they have labeled seed text).

    All pyspark.ml, all JVM: RegexTokenizer in char mode (gaps=False,
    pattern='.') -> two NGram stages -> HashingTF -> multinomial
    LogisticRegression; labels are StringIndexer'd alphabetically so
    the class order is data-independent.  Same scale shape as
    train_quality_classifier: fit on a labeled SAMPLE (thousands of
    docs), score the corpus map-only.

    No oracle row — an iterative multinomial fit is not
    SQL-expressible; pinned by a planted-corpus pytest with held-out
    per-language precision (the L31 honesty boundary)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        HashingTF,
        NGram,
        RegexTokenizer,
        SQLTransformer,
        StringIndexer,
    )

    txt = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    train = labeled.select(txt.alias(text_col), F.col(label_col))
    stages = [
        RegexTokenizer(
            inputCol=text_col, outputCol="__chars",
            pattern=".", gaps=False, toLowercase=True,
        ),
        NGram(n=2, inputCol="__chars", outputCol="__c2"),
        NGram(n=3, inputCol="__chars", outputCol="__c3"),
        SQLTransformer(
            statement="SELECT *, concat(__c2, __c3) AS __grams FROM __THIS__"
        ),
        HashingTF(
            inputCol="__grams", outputCol="__features",
            numFeatures=num_features,
        ),
        StringIndexer(
            inputCol=label_col, outputCol="__label",
            stringOrderType="alphabetAsc",
        ),
        LogisticRegression(
            featuresCol="__features", labelCol="__label",
            family="multinomial", regParam=reg_param, maxIter=max_iter,
        ),
    ]
    return Pipeline(stages=stages).fit(train)


def predict_language(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Append the predicted language label for every row — one map-only
    pass, original columns preserved, nulls predict from the empty
    string (never crash the scoring pass; same contract as
    score_quality).  The prediction index maps back to the label string
    through the fitted StringIndexer's own labels (JVM array lookup,
    no UDF)."""
    from pyspark.ml.feature import StringIndexerModel

    fit_col = model.stages[0].getInputCol()
    labels = next(
        s for s in model.stages if isinstance(s, StringIndexerModel)
    ).labelsArray[0]
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
    # StringIndexer would choke on the unseen label column at transform
    # time if absent — it is a fit-only stage; give it a dummy so the
    # pipeline transform runs, then drop everything but the prediction
    scored = model.transform(
        prep.withColumn(model.stages[-2].getInputCol(), F.lit(labels[0]))
    )
    label_arr = F.array(*[F.lit(str(l)) for l in labels])
    return scored.select(
        *[F.col(f"__orig_{i}").alias(c) for i, c in enumerate(orig)],
        F.element_at(
            label_arr, F.col("prediction").cast("int") + 1
        ).alias(out_col),
    )
