"""Aggregate snapshots: persisted fold checkpoints.

The reference DECLARES snapshot functionality but ships it commented out
("#region Snapshot Functionality" with dead Load/Save bodies —
PostgresqlEventStore.cs:562-576); like facets (A6), the Spark engine
implements the declared surface properly.  A snapshot stores the folded
aggregate state at version V; a point load becomes snapshot + fold of
the events AFTER V — O(tail) instead of O(stream length), the standard
event-sourcing optimization for long-lived aggregates (the reference's
own benchmark scenario folds 104 events per reload; a year-old cart
folds thousands).

Contract:
- a snapshot is a CACHE of the fold: losing one costs a refold, never
  correctness, and a stale one is caught up by the tail fold.
- hard-deleting a stream must also ``delete`` its snapshot (the
  repository's hard_delete does this when built with a snapshot store);
  a lingering snapshot would resurrect the deleted aggregate.
- writes are atomic (tmp + rename), consistent with the event store's
  crash-safety story.
"""

from __future__ import annotations

import json
import os
import tempfile
import urllib.parse
from typing import Optional


class JsonFileSnapshotStore:
    """One JSON file per (partition_key, stream_id) under ``root`` —
    the point-read/point-write shape of the reference's commented
    container design (ReadItemAsync by stream id + partition key)."""

    def __init__(self, root: str):
        self._root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, partition_key: str, stream_id: str) -> str:
        safe = [urllib.parse.quote(s, safe="") for s in (partition_key, stream_id)]
        return os.path.join(self._root, safe[0], f"{safe[1]}.json")

    def save(
        self,
        partition_key: str,
        stream_id: str,
        version: int,
        aggregate_type: str,
        state: dict,
    ) -> None:
        path = self._path(partition_key, stream_id)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        doc = {
            "stream_id": stream_id,
            "partition_key": partition_key,
            "version": int(version),
            "aggregate_type": aggregate_type,
            "state": state,
        }
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), prefix=".snap-", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f, sort_keys=True)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self, partition_key: str, stream_id: str) -> Optional[dict]:
        path = self._path(partition_key, stream_id)
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except json.JSONDecodeError:
            # torn file from a dead writer pre-rename cannot happen
            # (atomic replace); a corrupt file is treated as absent —
            # snapshots are a cache, the refold is always available
            return None

    def delete(self, partition_key: str, stream_id: str) -> None:
        try:
            os.unlink(self._path(partition_key, stream_id))
        except FileNotFoundError:
            pass
