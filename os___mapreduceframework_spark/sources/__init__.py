from os___mapreduceframework_spark.sources.registry import (
    TABLES,
    dir_entries,
    FINITE_VALUE_NULLIFY_SQL,
    FINITE_VALUE_SQL,
    finite_value_col,
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
    "FINITE_VALUE_NULLIFY_SQL",
    "FINITE_VALUE_SQL",
    "finite_value_col",
    "embedding_count",
    "finite_values",
    "embedding_dim",
    "load_table",
    "register_views",
    "ts_bounds_us",
]
