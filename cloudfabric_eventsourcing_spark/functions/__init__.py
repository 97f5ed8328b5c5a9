"""Scalar helpers (SURVEY.md §2.8).

  - hash_string_to_uuid: deterministic natural-key -> uuid, matching the
    reference's `AggregateBase.HashStringToGuid`
    (CloudFabric.EventSourcing.Domain/AggregateBase.cs:70-80):
    XXH3-128 (seed 0) of the UTF-8 bytes, canonical digest interpreted
    the way .NET's ``Guid(byte[])`` does (first three fields
    little-endian == ``uuid.UUID(bytes_le=...)``).  The XXH3 core is the
    pure-Python spec implementation in functions/xxh3.py — see its
    docstring for the honest validation scope (XXH64 pinned against the
    JVM, XXH3-128 against the canonical empty-input digest; confirm one
    id against ``xxhsum -H2`` before a bulk migration).
    ``algorithm="sha256"`` keeps the pre-round-9 derivation for data
    keyed by earlier versions of THIS repo.
  - round_to_microseconds: the reference rounds DateTime to µs
    (Utils/DateTimeExtensions.cs:5-10); Spark timestamps are already
    µs-precision UTC, helper provided for driver-side values.
"""

from __future__ import annotations

import datetime
import hashlib
import uuid

from cloudfabric_eventsourcing_spark.functions.xxh3 import (
    xxh3_128_canonical,
)


def hash_string_to_uuid(value: str, algorithm: str = "xxh3") -> uuid.UUID:
    if algorithm == "xxh3":
        # .NET: new Guid(XxHash128.Hash(utf8)) — the canonical digest's
        # first 4+2+2 bytes are read little-endian by the Guid ctor,
        # which is exactly uuid's bytes_le layout
        return uuid.UUID(bytes_le=xxh3_128_canonical(value.encode("utf-8")))
    if algorithm == "sha256":
        digest = hashlib.sha256(value.encode("utf-8")).digest()[:16]
        return uuid.UUID(bytes=digest)
    raise ValueError(f"unknown algorithm: {algorithm!r}")


def round_to_microseconds(dt: datetime.datetime) -> datetime.datetime:
    return dt  # python datetimes are already µs-precision


def new_uuid() -> str:
    return str(uuid.uuid4())


def utc_now() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc)
