from cloudfabric_eventsourcing_spark.projections.state import (
    IndexNotReadyError,
    IndexStateForSchemaVersion,
    IndexSelector,
    ProjectionIndexState,
    ProjectionIndexStateStore,
)
from cloudfabric_eventsourcing_spark.projections.repository import (
    InMemoryProjectionRepository,
    ParquetProjectionRepository,
    ProjectionRepository,
)
from cloudfabric_eventsourcing_spark.projections.builder import (
    AggregateUpdatedEvent,
    ProjectionBuilder,
)
from cloudfabric_eventsourcing_spark.projections.engine import (
    ProjectionsEngine,
    ProjectionsRebuildProcessor,
)

__all__ = [
    "IndexNotReadyError",
    "IndexStateForSchemaVersion",
    "IndexSelector",
    "ProjectionIndexState",
    "ProjectionIndexStateStore",
    "InMemoryProjectionRepository",
    "ParquetProjectionRepository",
    "ProjectionRepository",
    "AggregateUpdatedEvent",
    "ProjectionBuilder",
    "ProjectionsEngine",
    "ProjectionsRebuildProcessor",
]
