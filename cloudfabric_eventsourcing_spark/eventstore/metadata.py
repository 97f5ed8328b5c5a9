"""Metadata/items key-value store.

Behavioral spec (reference, read-only):
  - IMetadataRepository: CloudFabric.EventSourcing.EventStore/IMetadataRepository.cs:3-13
  - Postgres DDL `(id varchar UNIQUE, partition_key, data jsonb)` + upsert:
    PostgresqlEventStore.cs:547-555
  - scenarios: CloudFabric.EventSourcing.Tests/MetadataRepositoryTests.cs
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
import threading
from typing import Any, Optional

# Process-wide per-path mutexes for JsonFileMetadataRepository: fcntl
# locks alone cannot serialize THREADS of one process (lockf record locks
# are owned per-process; flock is per open-file-description, but relying
# on it for intra-process exclusion still lets one thread's close() drop
# a lock another thread obtained through a different repository object on
# some platforms).  The threading.Lock serializes threads; the flock
# serializes processes.
_PATH_LOCKS: dict[str, threading.Lock] = {}
_PATH_LOCKS_GUARD = threading.Lock()


def _path_lock(path: str) -> threading.Lock:
    key = os.path.realpath(path)
    with _PATH_LOCKS_GUARD:
        lock = _PATH_LOCKS.get(key)
        if lock is None:
            lock = _PATH_LOCKS[key] = threading.Lock()
        return lock


class InMemoryMetadataRepository:
    def __init__(self) -> None:
        import threading

        self._items: dict[tuple[str, str], Any] = {}
        self._lock = threading.Lock()

    def upsert_item(self, id: str, partition_key: str, item: Any) -> None:
        with self._lock:
            self._items[(id, partition_key)] = item

    def load_item(self, id: str, partition_key: str) -> Optional[Any]:
        return self._items.get((id, partition_key))

    def compare_and_upsert(
        self, id: str, partition_key: str, item: Any, expected: Any
    ) -> bool:
        """Atomic compare-and-swap: write only if the stored value still
        equals ``expected`` (None = key absent).  The optimistic-lock
        primitive the rebuild lease uses (the reference's conditional
        UPDATE ... WHERE updated_at = @seen)."""
        with self._lock:
            if self._items.get((id, partition_key)) != expected:
                return False
            self._items[(id, partition_key)] = item
            return True


class JsonFileMetadataRepository:
    """Single-JSON-file store with atomic replace (small metadata only —
    index state, rebuild progress; not a data path).

    Writes take an advisory fcntl lock around the load-modify-save, so
    CONCURRENT PROCESSES (the reference worker's maxParallelTasks shape,
    ProjectionsRebuildProcessor.cs:28-59) cannot lose each other's
    updates to different keys: without it, two workers leasing two
    different projections could each read the file, apply their own key,
    and the later replace would erase the earlier worker's lease.  Reads
    stay lock-free — the atomic replace guarantees every reader sees a
    complete (if slightly stale) snapshot, and the state store's
    optimistic updated_at re-check handles staleness."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, data: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f)
        os.replace(tmp, self.path)

    @contextlib.contextmanager
    def _file_lock(self):
        """Two-layer mutual exclusion around load-modify-save.

        Layer 1: a process-wide threading.Lock keyed by realpath — two
        THREADS sharing (or independently constructing) a repository on
        the same file serialize here.  lockf record locks are owned
        per-process, so without this a second thread's lockf would
        succeed immediately and, worse, its close() would drop the lock
        out from under the first thread mid-critical-section.

        Layer 2: fcntl.flock on a sidecar .lock file — flock locks
        attach to the open-file-description, so separate PROCESSES (the
        parallel rebuild workers) conflict; closing this fd releases
        only this OFD's lock, never another holder's.
        """
        import fcntl

        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with _path_lock(self.path + ".lock"):
            lock_fd = os.open(self.path + ".lock", os.O_CREAT | os.O_WRONLY)
            try:
                fcntl.flock(lock_fd, fcntl.LOCK_EX)
                yield
            finally:
                os.close(lock_fd)  # releases this OFD's flock

    def upsert_item(self, id: str, partition_key: str, item: Any) -> None:
        with self._file_lock():
            data = self._load()
            data[f"{partition_key}\x00{id}"] = item
            self._save(data)

    def compare_and_upsert(
        self, id: str, partition_key: str, item: Any, expected: Any
    ) -> bool:
        """Cross-process compare-and-swap under the advisory lock: write
        only if the stored value still equals ``expected`` (None = key
        absent).  Two worker processes racing to lease the same rebuild
        serialize here; the loser sees the winner's lease and moves on."""
        with self._file_lock():
            data = self._load()
            key = f"{partition_key}\x00{id}"
            if data.get(key) != expected:
                return False
            data[key] = item
            self._save(data)
            return True

    def load_item(self, id: str, partition_key: str) -> Optional[Any]:
        return self._load().get(f"{partition_key}\x00{id}")
