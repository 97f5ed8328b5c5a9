"""Event stores: in-memory (parity/unit-test backend) and parquet-directory
(the Spark-facing backend).

Behavioral spec (reference, read-only):
  - interface: CloudFabric.EventSourcing.EventStore/IEventStore.cs:7-36
  - append with optimistic concurrency (version precheck in a transaction,
    consecutive versions, single partition key per batch, post-commit push
    to subscribers): PostgresqlEventStore.cs:369-471; in-memory CAS:
    Implementations/...InMemory/InMemoryEventStore.cs:158-213
  - stream scan ordered by version: PostgresqlEventStore.cs:192-297
  - chronological scan (replay source), strict `created_at > date_from`,
    ORDER BY created_at LIMIT n: PostgresqlEventStore.cs:299-367
  - statistics: :53-99; delete-all :101-136; hard delete :137-178
  - subscriber push: :462-481

Scale design (SURVEY.md §7): the parquet store is the single-node stand-in
for a Delta/Iceberg table — an append-only directory of parquet fragments,
one fragment per committed append batch, with a commit lock providing the
transaction boundary. Analytical access goes through Spark
(`to_df`/`read_stream`); point reads (single stream, version checks) use
pyarrow dataset scans with predicate pushdown driver-side, mirroring the
reference's indexed point SQL without spinning a distributed job. On a real
cluster the same API maps onto Delta `MERGE`/append + conflict retry; the
layout (partition_key=... directories) is chosen so partition pruning works
identically there.

Divergence (documented): on version conflict BOTH backends raise
OptimisticConcurrencyError (the reference's Postgres backend throws; its
in-memory backend returns false — we prefer the stricter contract).
"""

from __future__ import annotations

import contextlib
import datetime
import glob
import json
import os
import threading
import time
import uuid
from typing import Callable, Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

from cloudfabric_eventsourcing_spark.eventstore.event import (
    SCHEMA_VERSION,
    Event,
    EventRecord,
    EventStoreStatistics,
    EventStream,
    OptimisticConcurrencyError,
    StreamNotFoundError,
)

Subscriber = Callable[[Event], None]


class EventStore:
    """Abstract store (IEventStore.cs:7-36)."""

    def initialize(self) -> None:
        raise NotImplementedError

    def load_stream(
        self, stream_id: str, partition_key: str, from_version: Optional[int] = None
    ) -> EventStream:
        raise NotImplementedError

    def load_stream_or_throw(self, stream_id: str, partition_key: str) -> EventStream:
        stream = self.load_stream(stream_id, partition_key)
        if not stream.events:
            raise StreamNotFoundError(f"stream {stream_id!r} ({partition_key!r})")
        return stream

    def load_events(
        self,
        partition_key: Optional[str] = None,
        date_from: Optional[datetime.datetime] = None,
        limit: int = 250,
    ) -> list[Event]:
        raise NotImplementedError

    def append_to_stream(
        self,
        user_info: dict,
        stream_id: str,
        expected_version: int,
        events: Iterable[Event],
    ) -> bool:
        raise NotImplementedError

    def get_statistics(self) -> EventStoreStatistics:
        raise NotImplementedError

    def delete_all(self) -> None:
        raise NotImplementedError

    def hard_delete(self, stream_id: str, partition_key: str) -> bool:
        raise NotImplementedError

    # S4: in-process push on append (PostgresqlEventStore.cs:473-481)
    def subscribe(self, handler: Subscriber) -> None:
        self._subscribers.append(handler)

    _subscribers: list[Subscriber]

    # -- shared helpers -----------------------------------------------------
    @staticmethod
    def _prepare_records(
        user_info: dict,
        stream_id: str,
        expected_version: int,
        events: list[Event],
    ) -> list[EventRecord]:
        # single partition key per batch (PostgresqlEventStore.cs:378-381)
        pks = {e.partition_key for e in events}
        if len(pks) != 1:
            raise ValueError(
                "Partition keys for all events in the stream must be the same"
            )
        user_json = json.dumps(user_info or {}, sort_keys=True)
        records = []
        version = expected_version
        for e in events:
            version += 1
            ts = e.timestamp
            if ts.tzinfo is not None:
                ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            records.append(
                EventRecord(
                    id=str(uuid.uuid4()),
                    partition_key=e.partition_key,
                    created_at=ts,
                    stream_id=stream_id,
                    stream_version=version,
                    event_type=e.event_type,
                    event_data=e.payload_json(),
                    user_info=user_json,
                    eventstore_schema_version=SCHEMA_VERSION,
                )
            )
        return records

    def _push(self, events: list[Event]) -> None:
        for e in events:
            for h in self._subscribers:
                h(e)


class InMemoryEventStore(EventStore):
    """Driver-memory backend (parity with the reference's InMemory store)."""

    def __init__(self) -> None:
        self._streams: dict[tuple[str, str], list[EventRecord]] = {}
        self._lock = threading.Lock()
        self._subscribers = []

    def initialize(self) -> None:
        pass

    def load_stream(self, stream_id, partition_key, from_version=None):
        records = sorted(
            self._streams.get((stream_id, partition_key), []),
            key=lambda r: r.stream_version,
        )
        version = records[-1].stream_version if records else 0
        if from_version is not None:
            records = [r for r in records if r.stream_version >= from_version]
        return EventStream(stream_id, version, [r.to_event() for r in records])

    def load_events(self, partition_key=None, date_from=None, limit=250):
        records = [
            r
            for key, recs in self._streams.items()
            for r in recs
            if partition_key is None or key[1] == partition_key
        ]
        if date_from is not None:
            records = [r for r in records if r.created_at > date_from]  # strict >
        records.sort(key=lambda r: r.created_at)
        return [r.to_event() for r in records[:limit]]

    def append_to_stream(self, user_info, stream_id, expected_version, events):
        events = list(events)
        if not events:
            return True  # legal no-op, same contract as the parquet backend
        with self._lock:
            partition_key = events[0].partition_key
            current = self.load_stream(stream_id, partition_key)
            if current.version != expected_version:
                raise OptimisticConcurrencyError(
                    f"stream {stream_id}: expected version {expected_version}, "
                    f"store has {current.version} — another writer appended"
                )
            records = self._prepare_records(
                user_info, stream_id, expected_version, events
            )
            self._streams.setdefault((stream_id, partition_key), []).extend(records)
        self._push(events)
        return True

    def get_statistics(self):
        all_ts = [r.created_at for recs in self._streams.values() for r in recs]
        return EventStoreStatistics(
            total_events_count=len(all_ts),
            first_event_created_at=min(all_ts) if all_ts else None,
            last_event_created_at=max(all_ts) if all_ts else None,
        )

    def delete_all(self):
        self._streams.clear()

    def hard_delete(self, stream_id, partition_key):
        return self._streams.pop((stream_id, partition_key), None) is not None

    # Spark access for the projection/query layers
    def to_df(self, spark):
        from pyspark.sql import types as T

        rows = [
            tuple(getattr(r, f) for f in _ARROW_SCHEMA.names)
            for recs in self._streams.values()
            for r in recs
        ]
        return spark.createDataFrame(rows, schema=_SPARK_SCHEMA_DDL) if rows else (
            spark.createDataFrame([], schema=_SPARK_SCHEMA_DDL)
        )


_ARROW_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("partition_key", pa.string()),
        ("created_at", pa.timestamp("us")),
        ("stream_id", pa.string()),
        ("stream_version", pa.int32()),
        ("event_type", pa.string()),
        ("event_data", pa.string()),
        ("user_info", pa.string()),
        ("eventstore_schema_version", pa.int32()),
    ]
)

_SPARK_SCHEMA_DDL = (
    "id string, partition_key string, created_at timestamp, stream_id string, "
    "stream_version int, event_type string, event_data string, user_info string, "
    "eventstore_schema_version int"
)


class ParquetEventStore(EventStore):
    """Append-only parquet-directory store.

    Layout: `{path}/part-<time_ns>-<uuid>.parquet`, one fragment per
    committed append. The transaction boundary is PER STREAM: a
    `.commit-<streamhash>.lock` file (O_EXCL, plus an in-process mutex)
    serializes writers of one stream while appends to DISJOINT streams
    proceed in parallel — optimistic-concurrency semantics identical to
    the reference's per-stream version check (SURVEY.md §7 "genuinely hard
    parts" #1), throughput scales with writer parallelism like the
    cluster-side Delta mapping would.
    """

    LOCK_TIMEOUT_S = 30.0
    # a .lock file older than this is presumed abandoned (writer crashed
    # between os.open and os.unlink) and is stolen; must comfortably exceed
    # the longest plausible append (an append writes one small fragment,
    # ~ms) so a live-but-slow writer is never raced
    LOCK_STALE_S = 10.0

    def __init__(self, path: str):
        self.path = path
        self._subscribers = []
        self._stream_mutexes: dict[str, threading.Lock] = {}
        self._mutexes_guard = threading.Lock()
        # incremental per-stream version cache: fragments are immutable, so
        # scanning each NEW fragment once (under the commit lock) keeps
        # appends amortized O(1) instead of O(total fragments) — the
        # parquet-store analogue of the reference's stream_id index
        # (PostgresqlEventStore.cs:521-526)
        self._versions: dict[tuple[str, str], int] = {}
        self._stream_fragments: dict[tuple[str, str], list[str]] = {}
        self._seen_fragments: set[str] = set()
        self._cache_guard = threading.Lock()

    def initialize(self) -> None:
        os.makedirs(self.path, exist_ok=True)

    def _stream_mutex(self, key: str) -> threading.Lock:
        with self._mutexes_guard:
            if key not in self._stream_mutexes:
                self._stream_mutexes[key] = threading.Lock()
            return self._stream_mutexes[key]

    # -- dataset helpers ----------------------------------------------------
    def _fragments(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "part-*.parquet")))

    def _dataset(self) -> Optional[pa_ds.Dataset]:
        frags = self._fragments()
        if not frags:
            return None
        return pa_ds.dataset(frags, schema=_ARROW_SCHEMA, format="parquet")

    def _scan(self, filter_expr=None, columns=None) -> pa.Table:
        ds = self._dataset()
        if ds is None:
            return _ARROW_SCHEMA.empty_table()
        return ds.to_table(filter=filter_expr, columns=columns)

    # -- reads --------------------------------------------------------------
    def load_stream(self, stream_id, partition_key, from_version=None):
        # point read through the fragment index: only files containing this
        # stream are opened (mirrors the reference's (stream_id,
        # partition_key) index — PostgresqlEventStore.cs:521-526)
        self._refresh_version_cache()
        frags = [
            f
            for f in self._stream_fragments.get((stream_id, partition_key), [])
            if os.path.exists(f)
        ]
        if not frags:
            return EventStream(stream_id, 0, [])
        expr = (pc.field("stream_id") == stream_id) & (
            pc.field("partition_key") == partition_key
        )
        ds = pa_ds.dataset(frags, schema=_ARROW_SCHEMA, format="parquet")
        table = ds.to_table(filter=expr).sort_by("stream_version")
        version = (
            int(table["stream_version"][-1].as_py()) if table.num_rows else 0
        )
        records = _dedupe_versions(_records_from_table(table))
        if from_version is not None:
            records = [r for r in records if r.stream_version >= from_version]
        return EventStream(stream_id, version, [r.to_event() for r in records])

    def load_events(self, partition_key=None, date_from=None, limit=250):
        expr = None
        if partition_key:
            expr = pc.field("partition_key") == partition_key
        if date_from is not None:
            date_expr = pc.field("created_at") > pa.scalar(
                date_from, type=pa.timestamp("us")
            )
            expr = date_expr if expr is None else (expr & date_expr)
        table = self._scan(expr).sort_by("created_at")
        # a reader globbing mid-compaction-swap can see a row in BOTH the
        # new snapshot and a not-yet-unlinked source fragment; drop the
        # duplicates (same physical event id) before applying the limit.
        # Convert slice-by-slice: outside the swap window (the common case)
        # exactly `limit` rows are materialized, same as pre-dedupe cost —
        # a full-table conversion here made chunked serial replay O(n^2).
        seen: set[str] = set()
        records: list[EventRecord] = []
        offset = 0
        while len(records) < limit and offset < table.num_rows:
            for r in _records_from_table(table.slice(offset, limit)):
                if r.id in seen:
                    continue
                seen.add(r.id)
                records.append(r)
                if len(records) >= limit:
                    break
            offset += limit
        return [r.to_event() for r in records]

    def _refresh_version_cache(self) -> None:
        """Fold versions from fragments not yet seen. Reads only the 3 key
        columns of each new fragment. Thread-safe via the cache guard;
        correctness for stream X relies on X's fragments being stable,
        which X's commit lock guarantees."""
        with self._cache_guard:
            self._refresh_version_cache_locked()

    def _refresh_version_cache_locked(self) -> None:
        for frag in self._fragments():
            if frag in self._seen_fragments:
                continue
            table = pq.read_table(
                frag, columns=["stream_id", "partition_key", "stream_version"]
            )
            touched = set()
            for row in table.to_pylist():
                key = (row["stream_id"], row["partition_key"])
                if row["stream_version"] > self._versions.get(key, 0):
                    self._versions[key] = row["stream_version"]
                touched.add(key)
            for key in touched:
                self._stream_fragments.setdefault(key, []).append(frag)
            self._seen_fragments.add(frag)

    def _invalidate_version_cache(self) -> None:
        with self._cache_guard:
            self._versions.clear()
            self._stream_fragments.clear()
            self._seen_fragments.clear()

    def _max_version(self, stream_id: str, partition_key: str) -> int:
        self._refresh_version_cache()
        return self._versions.get((stream_id, partition_key), 0)

    # -- append (S3) --------------------------------------------------------
    def append_to_stream(self, user_info, stream_id, expected_version, events):
        events = list(events)
        if not events:
            return True
        pk = events[0].partition_key
        import hashlib

        lock_key = hashlib.sha1(f"{stream_id}\x00{pk}".encode()).hexdigest()[:12]
        lock_path = os.path.join(self.path, f".commit-{lock_key}.lock")
        mutex = self._stream_mutex(lock_key)
        deadline = time.monotonic() + self.LOCK_TIMEOUT_S
        if not mutex.acquire(timeout=self.LOCK_TIMEOUT_S):
            raise TimeoutError(f"could not acquire in-process lock for {stream_id}")
        try:
            # appends yield to an in-flight maintenance rewrite (best-effort
            # barrier; durability does NOT depend on it — _replace_all only
            # ever unlinks the fragment list it was built from, so a
            # fragment that slips past this wait still survives the rewrite)
            self._wait_for_maintenance(deadline)
            fd, token = self._acquire_lock_file(lock_path, deadline)
            try:
                current = self._max_version(stream_id, pk)
                if current != expected_version:
                    raise OptimisticConcurrencyError(
                        f"stream {stream_id}: expected version {expected_version}, "
                        f"store has {current} — another writer appended"
                    )
                records = self._prepare_records(
                    user_info, stream_id, expected_version, events
                )
                # the version-cache refresh above may have globbed many
                # fragments; re-stamp the lock before the parquet write so
                # a slow commit is never judged stale mid-flight
                self._touch_lock(lock_path)
                written = self._write_fragment(records)
                # fold the fragment we just wrote into the cache directly —
                # unless a concurrent thread's refresh already globbed and
                # indexed it (double-listing would duplicate the stream's
                # events on point reads)
                with self._cache_guard:
                    if written not in self._seen_fragments:
                        self._seen_fragments.add(written)
                        key = (stream_id, pk)
                        self._versions[key] = records[-1].stream_version
                        self._stream_fragments.setdefault(key, []).append(written)
            finally:
                self._release_lock_file(lock_path, fd, token)
        finally:
            mutex.release()
        self._push(events)
        return True

    # -- lock-file protocol -------------------------------------------------
    def _acquire_lock_file(self, lock_path: str, deadline: float) -> tuple[int, str]:
        """O_EXCL lock file with crash recovery: a lock older than
        LOCK_STALE_S is presumed abandoned and stolen via an atomic
        rename (only one contender wins the rename, so two stealers can
        never both unlink a freshly re-acquired lock). The version
        precheck each writer runs AFTER acquiring the lock is the fence —
        a steal can never commit a stale expected_version.

        Liveness/exclusion hardening:
          - every lock file carries a unique OWNER TOKEN; release unlinks
            only if the file still holds our token, so a stalled holder
            that was legitimately stolen can never remove the new
            holder's lock (`_release_lock_file`);
          - holders REFRESH the lock mtime during long held sections
            (`_touch_lock` in the append path, a heartbeat thread for
            maintenance), so a live-but-slow holder is not seen stale;
          - after winning the steal rename, the stealer re-checks the
            grave's mtime: if the holder refreshed it between our stat
            and rename, the lock was NOT stale — link it back (no-op if
            a new lock already appeared) and back off.

        Reference contract: the Postgres transaction's row lock releases
        automatically on writer death (PostgresqlEventStore.cs:386-409);
        this gives the parquet store the same liveness.
        """
        token = uuid.uuid4().hex
        while True:
            try:
                fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                return fd, token
            except FileExistsError:
                try:
                    age = time.time() - os.stat(lock_path).st_mtime
                    if age > self.LOCK_STALE_S:
                        grave = f"{lock_path}.stale-{uuid.uuid4().hex[:8]}"
                        os.rename(lock_path, grave)  # atomic: one winner
                        try:
                            fresh = (
                                time.time() - os.stat(grave).st_mtime
                                <= self.LOCK_STALE_S
                            )
                        except FileNotFoundError:
                            fresh = False
                        if fresh:
                            # holder heartbeat raced our stat — restore and
                            # treat as held (link keeps the holder's inode,
                            # so its token-verified release still works)
                            with contextlib.suppress(FileExistsError):
                                os.link(grave, lock_path)
                            os.unlink(grave)
                        else:
                            os.unlink(grave)
                            continue  # genuinely stale: retry O_EXCL now
                except FileNotFoundError:
                    continue  # holder released (or another stealer won)
                if time.monotonic() > deadline:
                    raise TimeoutError(f"could not acquire {lock_path}")
                time.sleep(0.01)

    @staticmethod
    def _release_lock_file(lock_path: str, fd: int, token: str) -> None:
        """Close + unlink ONLY a lock we still own (token match): if we
        stalled past LOCK_STALE_S and were stolen, the path now holds the
        new owner's token and must survive our release."""
        os.close(fd)
        try:
            with open(lock_path, "r") as f:
                if f.read() == token:
                    os.unlink(lock_path)
        except FileNotFoundError:
            pass

    @staticmethod
    def _touch_lock(lock_path: str) -> None:
        """Heartbeat: refresh the lock mtime so concurrent contenders never
        judge a live holder stale mid-commit."""
        with contextlib.suppress(FileNotFoundError):
            os.utime(lock_path)

    _MAINT_LOCK = ".maint.lock"

    def _maintenance_lock_path(self) -> str:
        return os.path.join(self.path, self._MAINT_LOCK)

    def _wait_for_maintenance(self, deadline: float) -> None:
        path = self._maintenance_lock_path()
        while os.path.exists(path):
            try:
                if time.time() - os.stat(path).st_mtime > self.LOCK_STALE_S:
                    return  # abandoned maintenance; appends are safe anyway
            except FileNotFoundError:
                return
            if time.monotonic() > deadline:
                raise TimeoutError("maintenance rewrite held the store too long")
            time.sleep(0.01)

    def _write_fragment(self, records: list[EventRecord]) -> str:
        name = f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.path, f".tmp-{name}")
        table = _table_from_records(records)
        pq.write_table(table, tmp)
        out = os.path.join(self.path, name)
        os.rename(tmp, out)
        return out

    # -- maintenance --------------------------------------------------------
    # Durability invariant (the reference's delete/compaction runs inside a
    # Postgres transaction — PostgresqlEventStore.cs:101-178): a rewrite
    # only ever unlinks the EXACT fragment list it was built from, so an
    # append that commits concurrently is never folded away — its fragment
    # simply survives next to the rewritten snapshot. The .maint.lock file
    # additionally (a) serializes maintenance ops against each other and
    # (b) makes appenders briefly yield, shrinking the interleaving window.

    @contextlib.contextmanager
    def _maintenance(self):
        """Exclusive maintenance section with a HEARTBEAT: compact() on a
        large store easily outlives LOCK_STALE_S, so a daemon thread
        refreshes the lock mtime while held — a second maintenance op can
        then never judge a live one stale and run concurrently (e.g.
        hard_delete during compact resurrecting deleted rows). Release is
        token-verified, so even a genuinely-stalled op whose lock WAS
        stolen cannot remove the stealer's lock in its finally."""
        path = self._maintenance_lock_path()
        deadline = time.monotonic() + self.LOCK_TIMEOUT_S
        fd, token = self._acquire_lock_file(path, deadline)
        stop = threading.Event()

        def beat():
            while not stop.wait(self.LOCK_STALE_S / 3):
                self._touch_lock(path)

        beater = threading.Thread(target=beat, daemon=True)
        beater.start()
        try:
            # repair any swap a previous maintenance op left half-done
            # BEFORE this op reads the fragment list: without this, a
            # crash between _replace_fragments' rename-in and unlinks
            # would make the next compact() fold fragments + compacted
            # copy into one file — duplicate events baked permanently,
            # and for a crashed hard_delete the supposedly-deleted rows
            # resurrected into the compacted output
            self._recover_swap()
            yield
        finally:
            stop.set()
            beater.join()
            self._release_lock_file(path, fd, token)

    def compact(self, max_fragments: int = 1) -> None:
        """Fold many small append fragments into one (the parquet-store
        analogue of Delta OPTIMIZE; call periodically from a maintenance
        job)."""
        with self._maintenance():
            frags = self._fragments()
            if len(frags) <= max_fragments:
                return
            # cluster by stream so row-group min/max statistics prune point
            # reads after compaction (the Z-ORDER analogue); chronological
            # order is re-established by readers' own sorts
            ds = pa_ds.dataset(frags, schema=_ARROW_SCHEMA, format="parquet")
            table = ds.to_table().sort_by(
                [("stream_id", "ascending"), ("stream_version", "ascending")]
            )
            self._replace_fragments(frags, table)

    _SWAP_MARKER = ".swap-intent.json"

    def _swap_marker_path(self) -> str:
        return os.path.join(self.path, self._SWAP_MARKER)

    def _recover_swap(self) -> None:
        """Roll forward (or discard) a half-finished _replace_fragments.
        Caller must hold the maintenance lock.  The marker is renamed in
        atomically before the snapshot becomes visible, so: marker +
        snapshot present → finish the unlinks; marker without snapshot →
        nothing swapped, drop the marker.  Leftover `.tmp-compact-*`
        files are pre-swap garbage either way."""
        marker = self._swap_marker_path()
        part = marker + ".part"
        if os.path.exists(part):
            os.unlink(part)
        if os.path.exists(marker):
            with open(marker) as fh:
                intent = json.load(fh)
            if os.path.exists(os.path.join(self.path, intent["out"])):
                for base in intent["frags"]:
                    f = os.path.join(self.path, base)
                    if os.path.exists(f):
                        os.unlink(f)
                self._invalidate_version_cache()
            os.unlink(marker)
        for tmp in glob.glob(os.path.join(self.path, ".tmp-compact-*")):
            os.unlink(tmp)

    def _replace_fragments(self, frags: list[str], table: pa.Table) -> None:
        """Atomically swap exactly `frags` for one compacted snapshot.
        Caller must hold the maintenance lock and must have built `table`
        from exactly `frags`."""
        tmp = os.path.join(self.path, f".tmp-compact-{uuid.uuid4().hex[:8]}.parquet")
        # small row groups -> per-stream point reads skip unrelated groups
        pq.write_table(table, tmp, row_group_size=4096)
        out = os.path.join(
            self.path, f"part-{time.time_ns():020d}-compacted.parquet"
        )
        # intent marker first (atomic via rename): a crash between the
        # snapshot rename and the unlinks is repaired by _recover_swap
        # at the next maintenance op instead of leaving fragments whose
        # rows the next compact would duplicate into the store for good
        marker = self._swap_marker_path()
        with open(marker + ".part", "w") as fh:
            json.dump(
                {
                    "out": os.path.basename(out),
                    "frags": [os.path.basename(f) for f in frags],
                },
                fh,
            )
        os.rename(marker + ".part", marker)
        # snapshot becomes visible BEFORE the originals vanish: a reader
        # globbing mid-swap sees transient DUPLICATE rows — harmless for
        # appenders (max stream_version unchanged, version precheck stays
        # correct) AND for readers (load_stream/load_events dedupe by
        # stream_version / event id) — never a partial store (which would
        # let an appender observe version 0 and re-issue committed versions)
        os.rename(tmp, out)
        for f in frags:
            os.unlink(f)
        os.unlink(marker)
        self._invalidate_version_cache()

    def get_statistics(self):
        table = self._scan(columns=["created_at"])
        if table.num_rows == 0:
            return EventStoreStatistics(0, None, None)
        return EventStoreStatistics(
            total_events_count=table.num_rows,
            first_event_created_at=pc.min(table["created_at"]).as_py(),
            last_event_created_at=pc.max(table["created_at"]).as_py(),
        )

    def delete_all(self):
        with self._maintenance():
            for f in self._fragments():
                os.unlink(f)
            self._invalidate_version_cache()

    def hard_delete(self, stream_id, partition_key):
        expr = ~(
            (pc.field("stream_id") == stream_id)
            & (pc.field("partition_key") == partition_key)
        )
        with self._maintenance():
            frags = self._fragments()
            if not frags:
                return False
            ds = pa_ds.dataset(frags, schema=_ARROW_SCHEMA, format="parquet")
            before = ds.count_rows()
            kept = ds.to_table(filter=expr)
            if kept.num_rows == before:
                return False
            self._replace_fragments(frags, kept)
            return True

    # -- Spark access -------------------------------------------------------
    def to_df(self, spark):
        frags = self._fragments()
        if not frags:
            return spark.createDataFrame([], schema=_SPARK_SCHEMA_DDL)
        return spark.read.schema(_SPARK_SCHEMA_DDL).parquet(self.path)

    def read_stream(self, spark, date_from=None):
        """Structured Streaming source over the store directory (S4 change
        feed — each committed fragment becomes part of a micro-batch).

        `date_from` starts the subscription at a point in time — the
        reference change feed's StartTime
        (CosmosDbEventStoreChangeFeedObserver.cs:67-93): events with
        created_at >= date_from flow, older ones are filtered at the
        source (the predicate sits directly on the scan, so parquet
        row-group stats prune old fragments).  INCLUSIVE on the boundary
        by design: multiple events can share the boundary microsecond,
        and an exclusive start would silently skip the later ones — the
        same reasoning as replay_events' one-µs re-read.  A consumer
        that replayed up to `date_from` therefore sees the boundary
        events twice and must dedup by event id, exactly like the
        replay path (the projections observer's parity mode and the
        distributed MERGE are both idempotent per event id already)."""
        stream = (
            spark.readStream.schema(_SPARK_SCHEMA_DDL)
            .option("maxFilesPerTrigger", 1000)
            .parquet(self.path)
        )
        if date_from is not None:
            from pyspark.sql import functions as F

            stream = stream.where(F.col("created_at") >= F.lit(date_from))
        return stream


def _table_from_records(records: list[EventRecord]) -> pa.Table:
    cols = {
        name: [getattr(r, name) for r in records] for name in _ARROW_SCHEMA.names
    }
    return pa.table(cols, schema=_ARROW_SCHEMA)


def _records_from_table(table: pa.Table) -> list[EventRecord]:
    return [EventRecord(**row) for row in table.to_pylist()]


def _dedupe_versions(records: list[EventRecord]) -> list[EventRecord]:
    """Drop duplicate stream_versions from a version-sorted single-stream
    read: during the compaction swap window (_replace_fragments publishes
    the snapshot BEFORE unlinking sources) a reader can see every event
    twice; without this, aggregate rehydration would apply each event
    twice."""
    out: list[EventRecord] = []
    for r in records:
        if out and out[-1].stream_version == r.stream_version:
            continue
        out.append(r)
    return out
