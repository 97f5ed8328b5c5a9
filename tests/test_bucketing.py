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
