"""Bucketed co-located joins: same result, zero join-side shuffles."""

import pytest
from pyspark.sql import functions as F

from cloudfabric_eventsourcing_spark.sources import load_table
from cloudfabric_eventsourcing_spark.sources.bucketing import (
    exchange_count,
    write_bucketed,
)


@pytest.fixture
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.mark.slow
def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir, bucketed_tables):
    # force the sort-merge path so the Exchange comparison is join-shaped
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        got = joined.count()

        # plain (non-bucketed) same join shuffles both sides
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "o_totalprice", "l_extendedprice"
        )
        want = plain.count()

        assert got == want
        assert exchange_count(joined) == 0, "bucketed join must not shuffle"
        assert exchange_count(plain) >= 1, "sanity: plain join does shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_reuses_layout(spark, bucketed_tables):
    # groupBy on the bucket key also avoids the shuffle entirely
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg.count()
    assert exchange_count(agg) == 0


def test_persisted_layout_transparent_and_headline_shuffle_pin(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The persisted bucketed layout (ensure_bucketed_layout) is served
    transparently by load_table, produces identical results on a
    HEADLINE query (h2), and removes exactly the two fact-side
    exchanges from its sort-merge plan.  Also pins cross-session
    re-attach: dropping the catalog entry and reloading re-registers
    the layout via DDL with the bucket spec intact."""
    import __spark_entry__ as entry
    from cloudfabric_eventsourcing_spark.sources import bucketing
    from cloudfabric_eventsourcing_spark.sources.tables import (
        invalidate_table_cache,
    )

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_ROOT", str(tmp_path / "bl"))
    # toy-scale fixtures sit far below the size-gated activation line
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", "0")
    h2 = entry.queries()["h2_revenue_by_nation"]
    try:
        # plain run first (no layout exists yet)
        invalidate_table_cache()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain_df = h2(spark, sf_dir)
        plain = sorted(map(tuple, plain_df.collect()))
        plain_ex = exchange_count(plain_df)

        res = bucketing.ensure_bucketed_layout(spark, sf_dir)
        assert set(res["built"]) == {"lineitem", "orders", "events"}
        # second call: fresh layout, no rebuild
        assert bucketing.ensure_bucketed_layout(spark, sf_dir)["built"] == []

        invalidate_table_cache()
        bucket_df = h2(spark, sf_dir)
        got = sorted(map(tuple, bucket_df.collect()))
        assert got == plain
        bucket_ex = exchange_count(bucket_df)
        # the two fact-side (lineitem/orders) exchanges vanish (AQE's
        # executed-plan string repeats stages, so pin the >=2 delta and
        # strict improvement, not an absolute count)
        assert plain_ex - bucket_ex >= 2, (bucket_ex, plain_ex)

        # cross-session re-attach: drop the catalog entries (a fresh
        # session has none) and load again — DDL re-registration path
        for t in ("lineitem", "orders", "events"):
            spark.sql(
                f"DROP TABLE IF EXISTS {bucketing._catalog_name(sf_dir, t)}"
            )
        invalidate_table_cache()
        again = h2(spark, sf_dir)
        assert sorted(map(tuple, again.collect())) == plain
        assert exchange_count(again) == bucket_ex
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("lineitem", "orders", "events"):
            spark.sql(
                f"DROP TABLE IF EXISTS {bucketing._catalog_name(sf_dir, t)}"
            )
        invalidate_table_cache()


def test_persisted_layout_stale_source_falls_back(spark, tmp_path, monkeypatch):
    """A layout whose source signature no longer matches serves NOTHING:
    load_table must return the (newer) source of truth, not stale
    buckets."""
    import shutil

    from cloudfabric_eventsourcing_spark.sources import bucketing, load_table
    from cloudfabric_eventsourcing_spark.sources.tables import (
        invalidate_table_cache,
    )

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_ROOT", str(tmp_path / "bl"))
    # toy-scale fixtures sit far below the size-gated activation line
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", "0")
    sf2 = tmp_path / "sfcopy"
    sf2.mkdir()
    spark.range(100).selectExpr(
        "id AS l_orderkey", "CAST(id AS DOUBLE) AS l_extendedprice"
    ).coalesce(1).write.parquet(str(sf2 / "lineitem.parquet"))
    try:
        bucketing.ensure_bucketed_layout(
            spark, str(sf2), specs={"lineitem": (("l_orderkey",), ())}
        )
        invalidate_table_cache()
        assert load_table(spark, str(sf2), "lineitem").count() == 100
        # source changes underneath: the layout must stop serving
        shutil.rmtree(str(sf2 / "lineitem.parquet"))
        spark.range(150).selectExpr(
            "id AS l_orderkey", "CAST(id AS DOUBLE) AS l_extendedprice"
        ).coalesce(1).write.parquet(str(sf2 / "lineitem.parquet"))
        invalidate_table_cache()
        assert load_table(spark, str(sf2), "lineitem").count() == 150
    finally:
        spark.sql(
            "DROP TABLE IF EXISTS "
            + bucketing._catalog_name(str(sf2), "lineitem")
        )
        invalidate_table_cache()


def test_layout_requires_completion_token(spark, tmp_path, monkeypatch):
    """A rebuild runs rmtree + saveAsTable while the manifest still
    lists the table (r6 advice): mid-rebuild, a concurrent session sees
    manifest + partially-written files.  Serving therefore requires the
    per-table completion token written AFTER saveAsTable — remove it
    (the mid-rebuild state) and bucketed_table must fall back to plain
    parquet; an n_buckets mismatch between token and manifest (the
    bucket-count-change window) must also refuse to serve."""
    import json
    import os

    from cloudfabric_eventsourcing_spark.sources import bucketing, load_table
    from cloudfabric_eventsourcing_spark.sources.tables import (
        invalidate_table_cache,
    )

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_ROOT", str(tmp_path / "bl"))
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", "0")
    sf2 = tmp_path / "sftok"
    sf2.mkdir()
    spark.range(100).selectExpr(
        "id AS l_orderkey", "CAST(id AS DOUBLE) AS l_extendedprice"
    ).coalesce(1).write.parquet(str(sf2 / "lineitem.parquet"))
    specs = {"lineitem": (("l_orderkey",), ())}
    try:
        info = bucketing.ensure_bucketed_layout(spark, str(sf2), specs=specs)
        tpath = info["manifest"]["tables"]["lineitem"]["path"]
        token_path = os.path.join(tpath, bucketing._COMPLETE)
        assert os.path.exists(token_path)
        assert bucketing.bucketed_table(spark, str(sf2), "lineitem") is not None

        # mid-rebuild state: files present, token not yet written
        os.unlink(token_path)
        assert bucketing.bucketed_table(spark, str(sf2), "lineitem") is None
        invalidate_table_cache()
        assert load_table(spark, str(sf2), "lineitem").count() == 100

        # ensure() treats the missing token as rebuild-needed
        info = bucketing.ensure_bucketed_layout(spark, str(sf2), specs=specs)
        assert info["built"] == ["lineitem"]
        assert os.path.exists(token_path)
        assert bucketing.bucketed_table(spark, str(sf2), "lineitem") is not None

        # bucket-count-change window: token disagrees with manifest
        tok = json.load(open(token_path))
        tok["n_buckets"] += 1
        json.dump(tok, open(token_path, "w"))
        assert bucketing.bucketed_table(spark, str(sf2), "lineitem") is None
    finally:
        spark.sql(
            "DROP TABLE IF EXISTS "
            + bucketing._catalog_name(str(sf2), "lineitem")
        )
        invalidate_table_cache()


def test_layout_gates_per_colocation_group(spark, sf_dir, tmp_path, monkeypatch):
    """Each co-location group gates on ITS OWN largest member: with the
    threshold between the lineitem and events source sizes, the
    {lineitem, orders} group builds and serves while {events} stays
    plain — bucketing activates exactly where each group's measured win
    begins (PLANS.md Round-6), not on an unrelated table's size."""
    import os

    from cloudfabric_eventsourcing_spark.sources import bucketing, load_table
    from cloudfabric_eventsourcing_spark.sources.tables import (
        invalidate_table_cache,
    )

    li_sz = bucketing._source_bytes(sf_dir, "lineitem")
    ev_sz = bucketing._source_bytes(sf_dir, "events")
    assert ev_sz < li_sz, "fixture precondition"
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_ROOT", str(tmp_path / "bl"))
    monkeypatch.setenv(
        "SPARK_GRAFT_BUCKETED_MIN_BYTES", str((ev_sz + li_sz) // 2)
    )
    try:
        res = bucketing.ensure_bucketed_layout(spark, sf_dir)
        assert set(res["built"]) == {"lineitem", "orders"}
        invalidate_table_cache()
        li_plan = (
            load_table(spark, sf_dir, "lineitem")
            ._jdf.queryExecution().logical().toString()
        )
        ev_plan = (
            load_table(spark, sf_dir, "events")
            ._jdf.queryExecution().logical().toString()
        )
        assert "cfes_bucketed" in li_plan
        assert "cfes_bucketed" not in ev_plan
    finally:
        for t in ("lineitem", "orders", "events"):
            spark.sql(
                f"DROP TABLE IF EXISTS {bucketing._catalog_name(sf_dir, t)}"
            )
        invalidate_table_cache()


def test_layout_gates_on_source_size(spark, sf_dir, tmp_path, monkeypatch):
    """Size-gated activation: below the threshold ensure_bucketed_layout
    is a no-op and load_table serves plain parquet — the measured sf0.1
    crossover (PLANS.md Round-6) where bucket-scan overhead exceeds the
    shuffle saved.  Raising the gate above the already-built layout also
    deactivates SERVING (a layout built under an older threshold must
    not activate below the line)."""
    from cloudfabric_eventsourcing_spark.sources import bucketing, load_table
    from cloudfabric_eventsourcing_spark.sources.tables import (
        invalidate_table_cache,
    )

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_ROOT", str(tmp_path / "bl"))
    # gate far above the toy fixture: nothing builds, nothing serves
    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", str(10**12))
    res = bucketing.ensure_bucketed_layout(spark, sf_dir)
    assert res["built"] == [] and res["manifest"]["tables"] == {}
    try:
        # now build with the gate open...
        monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", "0")
        assert set(bucketing.ensure_bucketed_layout(spark, sf_dir)["built"]) == {
            "lineitem", "orders", "events",
        }
        # ...and close it again: the existing layout must stop serving
        monkeypatch.setenv("SPARK_GRAFT_BUCKETED_MIN_BYTES", str(10**12))
        invalidate_table_cache()
        df = load_table(spark, sf_dir, "lineitem")
        assert "cfes_bucketed" not in df._jdf.queryExecution().logical().toString()
    finally:
        for t in ("lineitem", "orders", "events"):
            spark.sql(
                f"DROP TABLE IF EXISTS {bucketing._catalog_name(sf_dir, t)}"
            )
        invalidate_table_cache()
