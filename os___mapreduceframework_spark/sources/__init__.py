from os___mapreduceframework_spark.sources.registry import (
    TABLES,
    dir_entries,
    load_table,
    register_views,
)

__all__ = ["TABLES", "dir_entries", "load_table", "register_views"]
