from os___mapreduceframework_spark.sources.registry import (
    TABLES,
    dir_entries,
    FINITE_VALUE_SQL,
    embedding_count,
    finite_values,
    embedding_dim,
    load_table,
    register_views,
    ts_bounds_us,
)

__all__ = [
    "TABLES",
    "dir_entries",
    "FINITE_VALUE_SQL",
    "embedding_count",
    "finite_values",
    "embedding_dim",
    "load_table",
    "register_views",
    "ts_bounds_us",
]
