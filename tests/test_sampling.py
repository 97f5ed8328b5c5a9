"""Deterministic stratified sampling (training-data curation)."""

from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.operators import sampling
from cloudfabric_eventsourcing_spark.sources import load_table


def test_exact_sample_sizes_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = sampling.stratified_sample_exact(docs, ["lang"], k=7, id_col="doc_id")
    sizes = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(7, totals[lang])
    # bit-reproducible: a second evaluation (different partitioning) selects
    # the identical ids
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    s2 = sampling.stratified_sample_exact(
        docs.repartition(13), ["lang"], k=7, id_col="doc_id"
    )
    assert sorted(r["doc_id"] for r in s2.collect()) == ids1


def test_salt_draws_independent_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in sampling.stratified_sample_exact(docs, ["lang"], 10, "doc_id").collect()}
    b = {r["doc_id"] for r in sampling.stratified_sample_exact(docs, ["lang"], 10, "doc_id", salt="v2").collect()}
    assert a != b  # overwhelmingly likely for a uniform hash


def test_weighted_mix_counts_and_exclusion(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.weighted_mix(
        docs, "lang", {"en": 0.6, "de": 0.4}, total=20, id_col="doc_id"
    )
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) <= {"en", "de"}  # unlisted strata excluded
    assert sizes.get("en", 0) == min(12, totals.get("en", 0))
    assert sizes.get("de", 0) == min(8, totals.get("de", 0))


def test_fraction_sample_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample_fraction(
        docs, ["lang"], fractions={}, seed=42, default_fraction=0.5
    )
    n, total = out.count(), docs.count()
    assert 0.3 * total < n < 0.7 * total


def test_fraction_sample_guards_high_cardinality_strata(spark, sf_dir):
    """default_fraction materializes the stratum set on the driver; a
    high-cardinality stratum column (doc id) must fail loudly at the
    cap instead of funneling the corpus into driver memory."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="distinct values"):
        sampling.stratified_sample_fraction(
            docs, ["doc_id"], fractions={}, default_fraction=0.5,
            max_strata=10,
        )
    # the cap is a guard, not a behavior change: under it, sampling works
    out = sampling.stratified_sample_fraction(
        docs, ["lang"], fractions={}, default_fraction=0.5, max_strata=10
    )
    assert 0 < out.count() < docs.count()


def test_dsir_weights_semantics(spark):
    """DSIR pins: documents matching the target's vocabulary outweigh
    off-target ones, empty/short docs weigh 0 with 0 grams, n_grams
    counts unigrams + bigrams, weights are identical across runs and
    partitionings (the integer micro-unit reduction), and top-k
    selection is deterministic with ties to the lowest id."""
    target_text = "solar panel energy grid storage battery inverter"
    rows = [
        (1, "solar panel energy storage battery grid output"),   # on-target
        (2, "medieval castle siege trebuchet knight armor moat"), # off
        (3, "solar energy battery"),                              # short, on
        (4, ""),                                                  # empty
        (5, None),                                                # null
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, target_text) for i in range(4)],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in sampling.dsir_log_weights(raw, target).collect()
    }
    assert len(w) == 5
    # 7 tokens -> 7 unigrams + 6 bigrams
    assert w[1][0] == 13 and w[3][0] == 5 and w[4] == (0, 0.0) and w[5] == (0, 0.0)
    assert w[1][1] > w[2][1]          # on-target beats off-target
    assert w[3][1] > w[2][1]          # even the short on-target doc does
    # run-to-run determinism across a repartition (order-independent sum)
    w2 = {
        r["doc_id"]: r["log_weight"]
        for r in sampling.dsir_log_weights(
            raw.repartition(7), target.repartition(3)
        ).collect()
    }
    assert w2 == {k: v[1] for k, v in w.items()}
    # top-k: deterministic, ties broken by lowest id
    weights = spark.createDataFrame(
        [(1, 5, 2.0), (2, 5, 2.0), (3, 5, 1.0)],
        "doc_id long, n_grams long, log_weight double",
    )
    top = sampling.dsir_top_k(weights, 2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]
    # plan: the B-row scoring table broadcasts (the corpus side never
    # shuffles for the join) and nothing drops into Python
    plan = (
        sampling.dsir_log_weights(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_resample_gumbel(spark):
    """Hash-Gumbel resampling: deterministic across runs/partitionings,
    different salts give different draws, high-weight docs dominate
    selection frequency across salts, and the output keeps the full
    weight row."""
    # near-flat weights: the draw is noise-driven, so salts must differ
    flat = spark.createDataFrame(
        [(i, 10, 0.01 * (i % 3)) for i in range(200)],
        "doc_id long, n_grams long, log_weight double",
    )
    s1 = sorted(r["doc_id"] for r in sampling.dsir_resample(flat, 10, salt="a").collect())
    s1b = sorted(r["doc_id"] for r in sampling.dsir_resample(flat.repartition(13), 10, salt="a").collect())
    assert s1 == s1b
    s2 = sorted(r["doc_id"] for r in sampling.dsir_resample(flat, 10, salt="b").collect())
    assert s1 != s2
    # a 10-nat gap: the heavy docs win regardless of salt
    gap = spark.createDataFrame(
        [(i, 10, (5.0 if i < 10 else -5.0)) for i in range(200)],
        "doc_id long, n_grams long, log_weight double",
    )
    heavy = set(range(10))
    for salt in ("a", "b", "c"):
        sel = {r["doc_id"] for r in sampling.dsir_resample(gap, 10, salt=salt).collect()}
        assert len(heavy & sel) >= 9
    assert set(sampling.dsir_resample(gap, 10).columns) == {"doc_id", "n_grams", "log_weight"}


def test_hash_uniform_null_id_raises(spark):
    """A null id must raise, not draw: concat_ws skips nulls, so every
    null-id row would silently hash to md5(salt) and share ONE uniform
    draw — correlating the Gumbel resample and Pareto filter decisions
    across all such rows (advice-pinned)."""
    import pytest

    ok = spark.createDataFrame(
        [(1, 0.5), (2, 0.7)], "doc_id long, log_weight double"
    )
    # healthy path unchanged: distinct ids -> distinct draws
    draws = [
        r["u"]
        for r in ok.select(
            sampling.hash_uniform("doc_id", "s").alias("u")
        ).collect()
    ]
    assert len(set(draws)) == 2 and all(0.0 < u < 1.0 for u in draws)
    bad = spark.createDataFrame(
        [(1, 0.5), (None, 0.7), (None, 0.9)],
        "doc_id long, log_weight double",
    )
    with pytest.raises(Exception, match="null doc_id"):
        bad.select(sampling.hash_uniform("doc_id", "s").alias("u")).collect()
    # and through the consumer everyone actually calls
    with pytest.raises(Exception, match="null doc_id"):
        sampling.dsir_resample(bad, 2, salt="a").collect()
