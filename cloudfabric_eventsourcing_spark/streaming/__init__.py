from cloudfabric_eventsourcing_spark.streaming.observer import (
    SparkStreamingProjectionsObserver,
)

__all__ = ["SparkStreamingProjectionsObserver"]
