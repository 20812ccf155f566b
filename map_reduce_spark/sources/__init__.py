from map_reduce_spark.sources.tables import (
    TABLES,
    load_spread,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_spread", "load_table", "register_views"]
