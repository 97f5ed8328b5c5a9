"""p16 (winnowing overlap pairs) design-scale study — r10 verdict ask
#3: the most expensive bench row (59.1 s at sf10 in r10) had no DuckDB
oracle wall and no adopted-plan study.

The r11 decomposition found the cost is NOT the join: the fingerprint
expression chain (zip3 grams -> hash -> zip4 window minima ->
array_distinct) costs 22-32 s to evaluate ONCE at sf10, and the
unmaterialized plan evaluates it THREE times — Spark's Generate
re-evaluates the chain on explode (explode-from-cache is 0.3 s), and
the self-join's two aliases re-evaluate it again each.  The fix is to
eagerly localCheckpoint the fingerprint arrays (materialize=True, the
new default).

Variants, interleaved:
  md5+mat     — the p16 oracle row's config with materialization
  md5+nomat   — the pre-r11 plan (three evaluations)
  xxh64+mat   — the production-default hash with materialization
  md5+valve64 — max_postings=64 on top (counts postings first; at this
                sf the max posting is 447, so the valve only adds cost
                — it exists for corpus-boilerplate skew, not speed)

All variants' pair sets are hash-compared; the DuckDB wall for the p16
oracle SQL runs once per round with NO 30 s cap (this study exists to
record a real wall or an honest DNF).

Usage: python tools/p16_winnowing_study.py [sf_dir] [rounds]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from cloudfabric_eventsourcing_spark.operators import text as _text  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402

VARIANTS = {
    "md5+mat": dict(hash="md5", materialize=True, use_arrow=False),
    "md5+arrow": dict(hash="md5", materialize=True),  # r15 kernel default
    "md5+nomat": dict(hash="md5", materialize=False, use_arrow=False),
    "xxh64+mat": dict(hash="xxh64", materialize=True),
    "md5+valve64": dict(hash="md5", materialize=True, max_postings=64),
}


def _sig(df) -> tuple[int, str]:
    rows = sorted(tuple(r) for r in df.collect())
    return len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session(app_name="p16-winnowing-study")
    docs = load_table(spark, sf_dir, "documents")

    def run(kw):
        return _text.winnowing_overlap_pairs(
            docs, k=3, window=4, min_shared=2, **kw
        )

    # correctness gate: materialization and the (inactive) valve change
    # nothing among the md5 variants.  xxh64 picks DIFFERENT window
    # minima by design (the hash orders grams differently, so the
    # winnowing SELECTION differs — the documented reason the oracle
    # row runs md5); its pair count is reported, not equated.
    sigs = {name: _sig(run(kw)) for name, kw in VARIANTS.items()}
    assert sigs["md5+mat"] == sigs["md5+nomat"], f"materialize changed the answer: {sigs}"
    assert sigs["md5+arrow"] == sigs["md5+mat"], f"arrow kernel changed the answer: {sigs}"
    assert sigs["md5+valve64"][0] <= sigs["md5+mat"][0], sigs
    print(f"mat == nomat: {sigs['md5+mat'][0]} pairs, hash "
          f"{sigs['md5+mat'][1]}; xxh64 selection: {sigs['xxh64+mat'][0]} "
          f"pairs (different minima by design); valve64 keeps "
          f"{sigs['md5+valve64'][0]} (drops boilerplate-fp pairs, "
          f"never invents)", flush=True)

    oracle_sql = entry_mod.oracle_sql()["p16_winnowing_overlap"]
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"{'%r' % (p + '/*.parquet') if os.path.isdir(p) else '%r' % p}"
    )

    walls: dict[str, list[float]] = {v: [] for v in VARIANTS}
    duck: list[float] = []
    for r in range(rounds):
        for name, kw in VARIANTS.items():
            t0 = time.perf_counter()
            run(kw).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        con.execute(oracle_sql).fetchall()
        duck.append(round(time.perf_counter() - t0, 2))
        print(json.dumps({"round": r, **{k: v[-1] for k, v in walls.items()},
                          "duckdb": duck[-1]}), flush=True)

    best = {k: min(v) for k, v in walls.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "walls": walls,
        "best": best,
        "duckdb_best": min(duck),
        "ratio_vs_duckdb": {k: round(v / min(duck), 2)
                            for k, v in best.items()},
    }))


if __name__ == "__main__":
    main()
