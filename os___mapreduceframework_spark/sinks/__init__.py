from os___mapreduceframework_spark.sinks.merge_table import MergeTable

__all__ = ["MergeTable"]
