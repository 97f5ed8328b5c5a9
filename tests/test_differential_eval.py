"""Differential fuzz: random filter trees + sorts evaluated by BOTH the
Spark Column translator and the pure-Python evaluator must agree — the
engine's counterpart of the reference running one suite over 4 backends."""

import datetime
import random

import pytest
from pyspark.sql import types as T

from cloudfabric_eventsourcing_spark.plans import apply_query
from cloudfabric_eventsourcing_spark.plans.pyeval import run_query_docs
from cloudfabric_eventsourcing_spark.queries import (
    Filter,
    FilterConnector,
    ProjectionQuery,
    SortInfo,
)
from cloudfabric_eventsourcing_spark.schema import (
    ARRAY,
    BOOLEAN,
    DATETIME,
    DOUBLE,
    INT64,
    STRING,
    ProjectionSchema,
    PropertySchema,
)

SCHEMA = ProjectionSchema(
    "fuzz",
    [
        PropertySchema("Id", STRING, is_key=True),
        PropertySchema("s", STRING, is_filterable=True, is_searchable=True),
        PropertySchema("n", INT64, is_filterable=True),
        PropertySchema("d", DOUBLE, is_filterable=True),
        PropertySchema("b", BOOLEAN, is_filterable=True),
        PropertySchema("ts", DATETIME, is_filterable=True),
        PropertySchema("tags", ARRAY, is_filterable=True, array_element_type=STRING),
        PropertySchema(
            "items",
            ARRAY,
            is_filterable=True,
            nested_properties=[
                PropertySchema("name", STRING, is_searchable=True),
                PropertySchema("amount", INT64),
            ],
        ),
    ],
)

WORDS = ["Alpha", "beta", "GAMMA", "delta", "Epsilon", "zeta"]
BASE_TS = datetime.datetime(2024, 1, 1)


def make_docs(rng, n=120):
    docs = []
    for i in range(n):
        docs.append(
            {
                "Id": f"id-{i:03d}",
                "s": rng.choice(WORDS) + rng.choice(["", " suffix", "!"]),
                "n": rng.randint(0, 20),
                "d": round(rng.uniform(-5, 5), 2),
                "b": rng.random() < 0.5,
                "ts": BASE_TS + datetime.timedelta(hours=rng.randint(0, 500)),
                "tags": rng.sample(WORDS, rng.randint(0, 3)),
                "items": [
                    {"name": rng.choice(WORDS), "amount": rng.randint(0, 10)}
                    for _ in range(rng.randint(0, 4))
                ],
                "PartitionKey": "P",
            }
        )
    return docs


def rand_leaf(rng) -> Filter:
    choice = rng.randrange(8)
    if choice == 0:
        return Filter("n", rng.choice(["eq", "ne", "gt", "ge", "lt", "le"]), rng.randint(0, 20))
    if choice == 1:
        return Filter("d", rng.choice(["gt", "le"]), round(rng.uniform(-5, 5), 2))
    if choice == 2:
        op = rng.choice(
            [
                "string-starts-with",
                "string-ends-with",
                "string-contains",
                "string-starts-with-ignore-case",
                "string-contains-ignore-case",
            ]
        )
        return Filter("s", op, rng.choice(["al", "Alpha", "SUFFIX", "a", "!"]))
    if choice == 3:
        return Filter("b", "eq", rng.random() < 0.5)
    if choice == 4:
        return Filter("tags", "array-contains", rng.choice(WORDS))
    if choice == 5:
        return Filter("items.amount", rng.choice(["ge", "lt", "eq"]), rng.randint(0, 10))
    if choice == 6:
        return Filter("items.name", "string-contains-ignore-case", rng.choice(["alp", "ZE"]))
    return Filter("ts", rng.choice(["gt", "le"]), BASE_TS + datetime.timedelta(hours=rng.randint(0, 500)))


def rand_tree(rng, depth=0) -> Filter:
    f = rand_leaf(rng)
    while depth < 2 and rng.random() < 0.5:
        child = rand_tree(rng, depth + 1)
        f.filters.append(FilterConnector(rng.choice(["and", "or"]), child))
    return f


SCHEMA_STRUCT = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField("s", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("amount", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField("PartitionKey", T.StringType()),
    ]
)


def test_differential_random_filters(spark):
    rng = random.Random(20240813)
    docs = make_docs(rng)
    df = spark.createDataFrame(docs, SCHEMA_STRUCT).cache()
    mismatches = []
    for trial in range(40):
        tree = rand_tree(rng)
        query = ProjectionQuery(filters=[tree])
        spark_ids = {r["Id"] for r in apply_query(df, query, SCHEMA).select("Id").collect()}
        py_page, py_total = run_query_docs(docs, query, SCHEMA)
        py_ids = {d["Id"] for d in py_page}
        if spark_ids != py_ids:
            mismatches.append((trial, tree.to_dict(), spark_ids ^ py_ids))
    assert not mismatches, f"backends disagree: {mismatches[:2]}"
    df.unpersist()


def test_differential_sort_and_search(spark):
    rng = random.Random(7)
    docs = make_docs(rng, 60)
    df = spark.createDataFrame(docs, SCHEMA_STRUCT).cache()
    for key, order in [("n", "asc"), ("d", "desc"), ("s", "asc"), ("ts", "desc")]:
        query = ProjectionQuery(
            order_by=[SortInfo(key, order), SortInfo("Id", "asc")], limit=25
        )
        spark_ids = [r["Id"] for r in apply_query(df, query, SCHEMA).select("Id").collect()]
        py_page, _ = run_query_docs(docs, query, SCHEMA)
        assert spark_ids == [d["Id"] for d in py_page], f"sort {key} {order}"
    for needle in ["alpha", "SUFF", "zeta", "nope"]:
        query = ProjectionQuery(search_text=needle)
        spark_ids = {r["Id"] for r in apply_query(df, query, SCHEMA).select("Id").collect()}
        py_page, _ = run_query_docs(docs, query, SCHEMA)
        assert spark_ids == {d["Id"] for d in py_page}, f"search {needle}"
    df.unpersist()


def test_differential_match_mode_fuzz(spark):
    """Randomized Spark-vs-python differential over the match search
    mode: random multi-term queries (incl. terms that analyze away,
    terms spread across array elements, synonyms) × analyzers — the
    guard for exactly the backend-divergence class a round-4 review
    caught in the array branch."""
    from cloudfabric_eventsourcing_spark.plans.pyeval import eval_search

    rng = random.Random(41)
    docs = make_docs(rng, 60)
    df = spark.createDataFrame(docs, SCHEMA_STRUCT).cache()
    pool = [w.lower() for w in WORDS] + ["suffix", "!", "!!", "nope", "al"]
    mismatches = []
    for trial in range(30):
        terms = rng.sample(pool, rng.randint(1, 3))
        analyzer = rng.choice(["whitespace", "standard", "uax_url_email"])
        syn = (
            {rng.choice(pool[:6]): [rng.choice(pool[:6])]}
            if rng.random() < 0.4
            else None
        )
        query = ProjectionQuery(
            search_text=" ".join(terms),
            search_mode="match",
            analyzer=analyzer,
            synonyms=syn,
        )
        spark_ids = {
            r["Id"]
            for r in apply_query(df, query, SCHEMA).select("Id").collect()
        }
        py_ids = {
            d["Id"]
            for d in docs
            if eval_search(
                query.search_text, d, SCHEMA, "match", analyzer, syn
            )
        }
        if spark_ids != py_ids:
            mismatches.append(
                (trial, query.search_text, analyzer, syn, spark_ids ^ py_ids)
            )
    assert not mismatches, f"match-mode backends disagree: {mismatches[:2]}"
    df.unpersist()


def test_differential_phrase_slop_fuzz(spark):
    """Randomized Spark-vs-python differential over phrase_prefix with
    slop: random 2-3 term queries (last term sometimes truncated to an
    open prefix) × slop 0-3 over multi-token docs — the RLIKE gap
    budget and the python gap walker must agree on every doc."""
    from cloudfabric_eventsourcing_spark.plans.pyeval import eval_search

    rng = random.Random(55)
    vocab = ["alpha", "beta", "gamma", "delta", "zeta", "omega", "kappa"]
    docs = [
        {
            "Id": f"id-{i:03d}",
            "s": " ".join(
                rng.choice(vocab) for _ in range(rng.randint(4, 12))
            ),
            "n": 0,
            "d": 0.0,
            "b": False,
            "ts": BASE_TS,
            "tags": [],
            "items": [],
            "PartitionKey": "P",
        }
        for i in range(80)
    ]
    df = spark.createDataFrame(docs, SCHEMA_STRUCT).cache()
    mismatches = []
    for trial in range(30):
        terms = [rng.choice(vocab) for _ in range(rng.randint(2, 3))]
        if rng.random() < 0.5:
            terms[-1] = terms[-1][: rng.randint(2, 4)]
        slop = rng.randint(0, 3)
        query = ProjectionQuery(
            search_text=" ".join(terms),
            search_mode="phrase_prefix",
            phrase_slop=slop,
        )
        spark_ids = {
            r["Id"]
            for r in apply_query(df, query, SCHEMA).select("Id").collect()
        }
        py_ids = {
            d["Id"]
            for d in docs
            if eval_search(
                query.search_text, d, SCHEMA,
                mode="phrase_prefix", phrase_slop=slop,
            )
        }
        if spark_ids != py_ids:
            mismatches.append((trial, terms, slop, spark_ids ^ py_ids))
    assert not mismatches, f"slop backends disagree: {mismatches[:3]}"
    df.unpersist()
