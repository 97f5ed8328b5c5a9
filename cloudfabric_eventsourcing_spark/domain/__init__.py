from cloudfabric_eventsourcing_spark.domain.aggregate import (
    AggregateBase,
    AggregateRepository,
)

__all__ = ["AggregateBase", "AggregateRepository"]
