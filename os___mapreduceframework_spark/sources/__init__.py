from os___mapreduceframework_spark.sources.registry import (
    TABLES,
    dir_entries,
    embedding_count,
    embedding_dim,
    load_table,
    register_views,
    ts_bounds_us,
)

__all__ = [
    "TABLES",
    "dir_entries",
    "embedding_count",
    "embedding_dim",
    "load_table",
    "register_views",
    "ts_bounds_us",
]
