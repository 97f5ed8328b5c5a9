"""Interleaved warm A/B of the T-append scenario with and without the
round-5 crash-safety additions (swap-intent marker + recovery scan).

BENCH_r05 recorded the append family down vs r04 (67.7 vs 79.3 /s
single, 98.0 vs 129.0 /s two-process) in the round that added the
fragment-swap intent marker (b2b5177).  Code inspection says the append
HOT PATH never touches the marker — it costs two extra file ops per
compact() (one marker write + one unlink, at one compact per 64
scenarios) plus a handful of exists/glob calls per maintenance op — so
the drop should be host drift, not the feature.  This tool measures
that claim instead of arguing it:

  * variant "safe"  = current code;
  * variant "fast"  = _replace_fragments without the marker and
    _recover_swap stubbed out (the pre-b2b5177 behavior), monkeypatched
    in-process;
  * batches of the identical scenario run INTERLEAVED (A B A B ...)
    in one process on one tmpfs-ish directory, so slow host drift hits
    both variants equally (the method recorded in PLANS.md for exactly
    this bench family);
  * per-variant throughput = best batch (decaying load spikes
    contaminate both variants' worst batches alike).

Usage: python tools/append_ab_study.py [batches-per-variant] [n-per-batch]
Prints one JSON line {"safe_per_sec", "fast_per_sec", "marker_cost_pct"}.
"""

from __future__ import annotations

import contextlib
import decimal
import json
import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from cloudfabric_eventsourcing_spark.domain import AggregateRepository  # noqa: E402
from cloudfabric_eventsourcing_spark.eventstore import ParquetEventStore  # noqa: E402
from cloudfabric_eventsourcing_spark.eventstore import store as store_mod  # noqa: E402

from tests.domain_fixtures import (  # noqa: E402
    ORDERS_PARTITION_KEY,
    Order,
    OrderItem,
    utcnow,
)

import pyarrow.parquet as pq  # noqa: E402
import uuid as _uuid  # noqa: E402


def _fast_replace_fragments(self, frags, table):
    """Pre-b2b5177 swap: rename in, unlink originals, no intent marker."""
    tmp = os.path.join(self.path, f".tmp-compact-{_uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(table, tmp, row_group_size=4096)
    out = os.path.join(self.path, f"part-{time.time_ns():020d}-compacted.parquet")
    os.rename(tmp, out)
    for f in frags:
        os.unlink(f)
    self._invalidate_version_cache()


@contextlib.contextmanager
def _variant(fast: bool):
    if not fast:
        yield
        return
    orig_replace = ParquetEventStore._replace_fragments
    orig_recover = ParquetEventStore._recover_swap
    ParquetEventStore._replace_fragments = _fast_replace_fragments
    ParquetEventStore._recover_swap = lambda self: None
    try:
        yield
    finally:
        ParquetEventStore._replace_fragments = orig_replace
        ParquetEventStore._recover_swap = orig_recover


def _scenario_batch(n: int) -> float:
    """One bench.py T-append batch on a fresh store dir; returns /s."""
    d = tempfile.mkdtemp(prefix="cfes-ab-")
    try:
        store = ParquetEventStore(os.path.join(d, "events"))
        store.initialize()
        repo = AggregateRepository(store, Order)
        t0 = time.perf_counter()
        for i in range(n):
            o = Order(
                f"{i:08d}-0000-0000-0000-000000000000",
                f"Bench {i}",
                [OrderItem(utcnow(), "Caverna", decimal.Decimal("12.00"))],
            )
            repo.save({"userId": "bench"}, o)
            loaded = repo.load(o.id, ORDERS_PARTITION_KEY)
            for j in range(100):
                loaded.add_item(OrderItem(utcnow(), f"i{j}", decimal.Decimal("6.95")))
            repo.save({"userId": "bench"}, loaded)
            repo.load(o.id, ORDERS_PARTITION_KEY)
            if (i + 1) % 64 == 0:
                store.compact()
        return round(n / (time.perf_counter() - t0), 2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # warm-up batch (imports, fs caches) — discarded
    _scenario_batch(20)
    safe, fast = [], []
    for b in range(batches):
        # alternate which variant runs first: under decaying host load
        # the first position is systematically favored
        order = (False, True) if b % 2 == 0 else (True, False)
        for is_fast in order:
            with _variant(fast=is_fast):
                (fast if is_fast else safe).append(_scenario_batch(n))
    best_safe, best_fast = max(safe), max(fast)
    print(
        json.dumps(
            {
                "n_per_batch": n,
                "batches": batches,
                "safe_samples": safe,
                "fast_samples": fast,
                "safe_per_sec": best_safe,
                "fast_per_sec": best_fast,
                "marker_cost_pct": round(
                    100.0 * (best_fast - best_safe) / best_fast, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
