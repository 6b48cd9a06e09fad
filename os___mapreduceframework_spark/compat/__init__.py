from os___mapreduceframework_spark.compat.mapreduce import run_map_reduce

__all__ = ["run_map_reduce"]
