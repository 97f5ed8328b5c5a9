from cloudfabric_eventsourcing_spark.eventstore.event import (
    Event,
    EventStream,
    EventStoreStatistics,
    OptimisticConcurrencyError,
    StreamNotFoundError,
    event_type_registry,
    register_event_type,
)
from cloudfabric_eventsourcing_spark.eventstore.store import (
    EventStore,
    InMemoryEventStore,
    ParquetEventStore,
)
from cloudfabric_eventsourcing_spark.eventstore.metadata import (
    InMemoryMetadataRepository,
    JsonFileMetadataRepository,
)
from cloudfabric_eventsourcing_spark.eventstore.snapshots import (
    JsonFileSnapshotStore,
)

__all__ = [
    "Event",
    "EventStream",
    "EventStoreStatistics",
    "OptimisticConcurrencyError",
    "StreamNotFoundError",
    "event_type_registry",
    "register_event_type",
    "EventStore",
    "InMemoryEventStore",
    "ParquetEventStore",
    "InMemoryMetadataRepository",
    "JsonFileMetadataRepository",
    "JsonFileSnapshotStore",
]
