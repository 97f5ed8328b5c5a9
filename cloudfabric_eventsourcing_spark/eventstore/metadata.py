"""Metadata/items key-value store.

Behavioral spec (reference, read-only):
  - IMetadataRepository: CloudFabric.EventSourcing.EventStore/IMetadataRepository.cs:3-13
  - Postgres DDL `(id varchar UNIQUE, partition_key, data jsonb)` + upsert:
    PostgresqlEventStore.cs:547-555
  - scenarios: CloudFabric.EventSourcing.Tests/MetadataRepositoryTests.cs
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional


class InMemoryMetadataRepository:
    def __init__(self) -> None:
        self._items: dict[tuple[str, str], Any] = {}

    def upsert_item(self, id: str, partition_key: str, item: Any) -> None:
        self._items[(id, partition_key)] = item

    def load_item(self, id: str, partition_key: str) -> Optional[Any]:
        return self._items.get((id, partition_key))


class JsonFileMetadataRepository:
    """Single-JSON-file store with atomic replace (small metadata only —
    index state, rebuild progress; not a data path)."""

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

    def upsert_item(self, id: str, partition_key: str, item: Any) -> None:
        data = self._load()
        data[f"{partition_key}\x00{id}"] = item
        self._save(data)

    def load_item(self, id: str, partition_key: str) -> Optional[Any]:
        return self._load().get(f"{partition_key}\x00{id}")
