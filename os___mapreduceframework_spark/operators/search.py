"""The reference's flagship query: substring search + count + sort.

Reproduces the Search client end-to-end (Search.cpp:84-125):

    scan names -> filter substring (Search.cpp:65)
               -> project (name, 1)  (Search.cpp:66-68)
               -> COUNT per name     (Search.cpp:72-78)
               -> sort asc by name   (MapReduceFramework.cpp:341)
               -> expand: repeat name count times (Search.cpp:113-117)

SQL shape (SURVEY.md section 2.2):

    SELECT name, COUNT(*) AS cnt
    FROM   dir_entries
    WHERE  instr(name, :word) > 0
    GROUP  BY name ORDER BY name

Scale notes: the filter and projection push into the scan; the count is a
partial (map-side) + final hash aggregate -- the same partial/final split
the reference implements by hand as its map/reduce phases. No custom
shuffle code; ordering is Catalyst's range-partitioned sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# the fixture search term: matches the 'widget' part names; lives here
# (registration-free module) so indexing/streaming can import it without
# pulling in -- and registering -- the library query family
SEARCH_WORD = "wid"


def search_count(names: DataFrame, word: str, name_col: str = "name") -> DataFrame:
    """(name, cnt) for names containing ``word``, ascending by name."""
    return (
        names.filter(F.instr(F.col(name_col), F.lit(word)) > 0)
        .groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("name")
    )


def search_expand(names: DataFrame, word: str, name_col: str = "name") -> DataFrame:
    """Exact Search output parity: each matching name repeated cnt times
    (Search.cpp:113-117), ascending by name."""
    counted = search_count(names, word, name_col)
    return counted.select(
        F.explode(F.array_repeat(F.col("name"), F.col("cnt").cast("int"))).alias("name")
    ).orderBy("name")
