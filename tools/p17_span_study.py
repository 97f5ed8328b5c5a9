"""p17 (ExactSubstr duplicated_spans) design-scale A/B study — r10
verdict ask #2: the operator's only sf10 datapoint was 2.2x the DuckDB
wall (26 vs 12 s); get it under 2x or prove the bound.

Variants, interleaved (the r6 method — alternate variants within each
round so host drift hits all arms equally):

  window     — shipped default since r11: string grams built ONCE,
               duplicated positions marked by a partition-wide COUNT
               window over the gram key (one gram shuffle)
  semijoin   — the pre-r11 default: groupBy count + left-semi mark —
               AQE-skew-splittable, but builds and shuffles the gram
               frame twice
  thash      — hash_grams=True, r11 re-implementation: per-token
               xxhash64 folded into the gram key with rotate-xor; no
               gram string ever materialized, 8-byte shuffle keys

Every variant's result is hash-compared against raw's (count + value
hash over sorted rows) — a perf variant that changes the answer is a
bug, not a win.  The DuckDB wall for the same SQL runs once per round.

Usage: python tools/p17_span_study.py [sf_dir] [rounds]
       (defaults: /tmp/spark_graft_sf10, 3)
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
from cloudfabric_eventsourcing_spark.operators import dedup  # noqa: E402
from cloudfabric_eventsourcing_spark.session import build_session  # noqa: E402
from cloudfabric_eventsourcing_spark.sources import load_table  # noqa: E402

VARIANTS = {
    "window": dict(hash_grams=False, mark="window"),
    "semijoin": dict(hash_grams=False, mark="semijoin"),
    "thash": dict(hash_grams=True, mark="window"),
}


def _result_sig(df) -> tuple[int, str]:
    rows = sorted(tuple(r) for r in df.collect())
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="p17-span-study")
    docs = load_table(spark, sf_dir, "documents")

    walls: dict[str, list[float]] = {v: [] for v in VARIANTS}
    oracle_walls: list[float] = []
    sigs: dict[str, tuple[int, str]] = {}

    # correctness gate once, before timing: all variants identical
    for name, kw in VARIANTS.items():
        out = dedup.duplicated_spans(docs, k=8, min_count=2, **kw)
        sigs[name] = _result_sig(out)
        spark.catalog.clearCache()
    assert len(set(sigs.values())) == 1, f"variants disagree: {sigs}"
    print(f"all {len(VARIANTS)} variants identical: "
          f"{sigs['window'][0]} rows, hash {sigs['window'][1]}", flush=True)

    oracle_sql = entry_mod.oracle_sql()["p17_duplicated_spans"]
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            if not os.path.isdir(f"{sf_dir}/{t}.parquet")
            else f"CREATE VIEW {t} AS SELECT * FROM "
                 f"'{sf_dir}/{t}.parquet/*.parquet'"
        )

    for r in range(rounds):
        for name, kw in VARIANTS.items():
            t0 = time.perf_counter()
            dedup.duplicated_spans(
                docs, k=8, min_count=2, **kw
            ).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        con.execute(oracle_sql).fetchall()
        oracle_walls.append(round(time.perf_counter() - t0, 2))
        print(json.dumps({"round": r, **{k: v[-1] for k, v in walls.items()},
                          "duckdb": oracle_walls[-1]}), flush=True)

    best = {k: min(v) for k, v in walls.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "walls": walls,
        "best": best,
        "duckdb_best": min(oracle_walls),
        "ratio_vs_duckdb": {
            k: round(v / min(oracle_walls), 2) for k, v in best.items()
        },
    }))


if __name__ == "__main__":
    main()
