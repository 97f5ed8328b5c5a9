"""sf100 probe of the adopted eager-aggregation star plans (r9 verdict
stretch #10): verify h2/h3/h14's dim-proportional-exchange property
holds an order of magnitude past the sf10 close-out.

Method: materialize the star subset at factor 1000 (tools/
make_scaled_sf.py 1000 /tmp/spark_graft_sf100 customer,orders,lineitem
— ~600M lineitem rows, 14 GB), build the bucketed fact layout (the
adopted h2 plan's exchange-free first rollup rides it), then run each
query min-of-2 construction+noop-exec exactly like bench.py, recording
wall, the shuffle rows/bytes of the custkey exchange (from the SQL
metrics), and the DuckDB oracle wall under a 300 s watchdog.

Pass criteria (PLANS.md records the numbers either way):
  - wall scales ~linearly from the sf10 close-out (10x data -> ~10x
    wall, no superlinear spill cliff);
  - the biggest exchange in each plan carries dim-grain (~15M at
    factor 1000) rows, not fact-grain (~600M) rows.

Usage: python tools/sf100_eager_agg_probe.py [sf_dir] [query,query,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources.bucketing import (  # noqa: E402
    ensure_bucketed_layout,
)

QUERIES = ["h2_revenue_by_nation", "h3_top_customers",
           "h14_distinct_customers_per_nation"]

#: queries whose result is corpus-sized: the metrics pass wraps them in
#: sum(xxhash64(struct(*))) — one row reaches the driver, every output
#: column is still consumed (a bare count() would let Catalyst prune
#: the computation under test), and the wrapper's own exchange is the
#: trailing ~32-row single-long one, trivially distinguishable from the
#: query's real shuffles (r12 verdict stretch #9: the text family needs
#: exchange-bytes evidence at 600M rows like the star family has)
WRAP_CORPUS_SIZED = frozenset(
    {
        "t06_repetition_stats",
        "p19_dsir_weights",
        "t09_lexical_diversity",
        "s04_embedding_quantize",
        "t10_unigram_surprisal",
    }
)


def _exchange_bytes(df) -> list:
    """dataSize of every shuffle Exchange in the executed plan (bytes,
    biggest first), read from the SQL metrics after a collect() on the
    same queryExecution.  Shuffle volume in bytes IS the property under
    test: the adopted eager-agg plans promise it stays dim-proportional
    while the fact side grows."""
    plan = df._jdf.queryExecution().executedPlan()
    out = []

    def walk(node):
        name = node.nodeName()
        if name == "Exchange":  # shuffle; broadcasts are BroadcastExchange
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "dataSize":
                    out.append(kv._2().value())
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())
        if "QueryStage" in name:
            walk(node.plan())

    walk(plan)
    return sorted(out, reverse=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf100"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES
    spark = build_session(app_name="sf100-probe")
    t0 = time.perf_counter()
    layout = ensure_bucketed_layout(spark, sf_dir)
    layout_s = round(time.perf_counter() - t0, 1)
    qs = entry_mod.queries()
    result = {"sf_dir": sf_dir, "bucketed_layout_write_s": layout_s,
              "bucketed_tables": sorted(layout["manifest"]["tables"])}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        # metrics pass: collect() (results are <= 25 rows for the star
        # queries) so the SAME queryExecution that populated the SQL
        # metrics is the one we read exchange row counts from — a noop
        # write executes a clone whose metrics the df handle never
        # sees.  Queries with corpus-sized results (s04's exploded
        # component rows) blow spark.driver.maxResultSize here — their
        # wall is the product; record the metrics as unavailable
        # instead of voiding the run (r12: a 27-task 1 GB collect
        # killed a 20-minute probe).
        exchange = None
        try:
            mdf = qs[name](spark, sf_dir)
            if name in WRAP_CORPUS_SIZED:
                # bit_xor, not sum: summing 600M xxhash64 longs
                # overflows BIGINT under ANSI (measured — the first
                # probe's ArithmeticException)
                mdf = mdf.selectExpr("bit_xor(xxhash64(struct(*))) AS h")
            mdf.collect()
            exchange = _exchange_bytes(mdf)[:4]
        except Exception as exc:  # noqa: BLE001
            exchange = f"metrics collect failed: {type(exc).__name__}"
        result[name] = {
            "wall_s": round(best, 2),
            "exchange_bytes_desc": exchange,
        }
        print(f"-- {name}: {result[name]}", file=sys.stderr, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
