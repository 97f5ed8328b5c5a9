from cloudfabric_eventsourcing_spark.sources.tables import (
    TABLE_NAMES,
    load_all,
    load_table,
    register_views,
)

__all__ = ["TABLE_NAMES", "load_all", "load_table", "register_views"]
