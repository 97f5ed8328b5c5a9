"""Scalar helpers (SURVEY.md §2.8).

  - hash_string_to_uuid: deterministic natural-key -> uuid. The reference
    uses xxHash128 of the string as Guid bytes
    (CloudFabric.EventSourcing.Domain/AggregateBase.cs:70-80). We derive the
    16 bytes from sha256 instead (no xxhash-128 in the stack); ids are
    opaque, only determinism matters (documented divergence, SURVEY.md C4).
  - round_to_microseconds: the reference rounds DateTime to µs
    (Utils/DateTimeExtensions.cs:5-10); Spark timestamps are already
    µs-precision UTC, helper provided for driver-side values.
"""

from __future__ import annotations

import datetime
import hashlib
import uuid


def hash_string_to_uuid(value: str) -> uuid.UUID:
    digest = hashlib.sha256(value.encode("utf-8")).digest()[:16]
    return uuid.UUID(bytes=digest)


def round_to_microseconds(dt: datetime.datetime) -> datetime.datetime:
    return dt  # python datetimes are already µs-precision


def new_uuid() -> str:
    return str(uuid.uuid4())


def utc_now() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc)
