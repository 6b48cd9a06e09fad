"""Registered query library -- reference-parity queries.

This module holds the flagship Search-parity queries (SURVEY.md section
2.2). Further operator families live in sibling modules imported at the
bottom so a single import wires the whole registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.compat import run_map_reduce
from os___mapreduceframework_spark.operators.search import (
    SEARCH_WORD,
    search_count,
    search_expand,
)
from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table


@query(
    "search_count",
    oracle=f"""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, '{SEARCH_WORD}') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Flagship Search query (Search.cpp:84-125): substring filter -> "
    "count per name -> ascending sort. Scan/filter/project/agg/sort "
    "pipeline, reference parity per SURVEY.md section 2.2 Q1-Q5.",
)
def q_search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search_count(load_table(spark, sf_dir, "part"), SEARCH_WORD, name_col="p_name")


@query(
    "search_expand",
    oracle=f"""
    WITH c AS (
      SELECT p_name AS name, COUNT(*) AS cnt
      FROM part
      WHERE instr(p_name, '{SEARCH_WORD}') > 0
      GROUP BY p_name
    )
    SELECT unnest(list_transform(range(1, cnt + 1), x -> name)) AS name
    FROM c
    ORDER BY name
    """,
    doc="Search output-expansion sink (Search.cpp:113-117): each matching "
    "name repeated cnt times, ascending.",
)
def q_search_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search_expand(load_table(spark, sf_dir, "part"), SEARCH_WORD, name_col="p_name")


@query(
    "mapreduce_search",
    oracle=f"""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, '{SEARCH_WORD}') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Search client through the compat MapReduce API "
    "(RunMapReduceFramework parity, MapReduceFramework.cpp:360-443): "
    "user Map filters+projects (Search.cpp:65-69), user Reduce counts "
    "(Search.cpp:72-78), engine groups by key value equality and sorts "
    "ascending. Arrow fast path (mapInPandas + applyInPandas).",
)
def q_mapreduce_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part").select(
        F.col("p_name").alias("key"), F.lit(SEARCH_WORD).alias("value")
    )

    def map_fn(name, word):
        return [(name, 1)] if word in name else []

    def reduce_fn(name, ones):
        return [(name, len(ones))]

    out = run_map_reduce(
        names,
        map_fn,
        reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
    )
    return out.select(F.col("key").alias("name"), F.col("value").alias("cnt"))


@query(
    "mapreduce_wordcount",
    oracle="""
    SELECT tok AS key, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY tok
    """,
    doc="Classic MapReduce wordcount through the compat API: Map "
    "tokenizes (0..n emissions per record -- the flatMap multiplicity "
    "of MapReduceFramework.cpp:112), Reduce counts, output sorted by "
    "key (MapReduceFramework.cpp:341). The second compat demo beyond "
    "Search, proving arbitrary user callables, not just the reference "
    "client.",
)
def q_mapreduce_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )

    def map_fn(doc_id, text):
        if text is None:  # failed-fetch doc: 0 emissions, like the
            return        # oracle's unnest(string_split(NULL))
        for tok in text.split(" "):
            yield (tok, 1)

    def reduce_fn(tok, ones):
        yield (tok, len(ones))

    out = run_map_reduce(
        docs,
        map_fn,
        reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
    )
    return out.select("key", F.col("value").alias("cnt"))
