from cloudfabric_eventsourcing_spark.sources.tables import (
    TABLE_NAMES,
    invalidate_table_cache,
    load_all,
    load_table,
    register_views,
)

__all__ = [
    "TABLE_NAMES",
    "invalidate_table_cache",
    "load_all",
    "load_table",
    "register_views",
]
