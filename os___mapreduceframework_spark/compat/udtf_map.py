"""The reference's Map operator as a Python UDTF (Spark 4).

The reference's ``Map(k1, v1)`` + ``Emit2`` contract
(MapReduceFramework.cpp:112, :298-305; client impl Search.cpp:60-69) is
a user-defined TABLE function: one input row in, 0..n typed rows out.
``run_map_reduce`` (compat.mapreduce) realizes it with ``mapInPandas``;
this module exposes the same contract through Spark 4's first-class
UDTF surface, which buys two things the Pandas path lacks:

- the emission shape is a declared relation, so the UDTF composes with
  plain SQL (``FROM t, LATERAL my_map(t.k, t.v)``) and with any
  downstream Catalyst plan -- the reduce side can be a native aggregate
  with map-side partials instead of an opaque ``applyInPandas``;
- per-row generator semantics with no batch re-assembly in user code.

Arrow transfer is requested when available (``useArrow=True``) so the
row stream is vectorized across the Python boundary.

At scale the guidance is unchanged: a UDTF is still Python in the hot
path; use it when the map logic is genuinely imperative, and express
everything after the emissions relationally so Catalyst owns the
shuffle (the whole point of SURVEY.md section 7.0).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]



def map_as_udtf(
    df: DataFrame,
    map_fn: MapFn,
    mid_schema: str = "key string, value string",
) -> DataFrame:
    """Apply ``map_fn(k1, v1) -> Iterable[(k2, v2)]`` to a two-column
    DataFrame via a lateral UDTF join; returns the (key, value) stream
    of emissions (the reference's post-Map, pre-shuffle relation)."""

    class _MapUDTF:
        def eval(self, k, v):
            yield from map_fn(k, v)

    try:
        m = F.udtf(_MapUDTF, returnType=mid_schema, useArrow=True)
    except Exception:  # Arrow-optimized UDTFs unavailable -> plain path
        m = F.udtf(_MapUDTF, returnType=mid_schema)
    k1, v1 = df.columns[0], df.columns[1]
    return df.lateralJoin(m(F.col(k1).outer(), F.col(v1).outer())).select(
        "key", "value"
    )


@query(
    "udtf_search_count",
    oracle="""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, 'wid') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Search via the UDTF map path: the Search client's Map "
    "(Search.cpp:60-69 -- emit (name, 1) on substring match) runs as a "
    "Spark 4 Python UDTF in a lateral join, and the reduce phase "
    "(Search.cpp:72-78 -- count per name) stays a NATIVE aggregate with "
    "map-side partials, which the opaque applyInPandas reduce of the "
    "compat API cannot give. Same oracle as search_count.",
)
def q_udtf_search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    word = "wid"

    def search_map(name, w):
        if w in name:
            yield name, 1

    # JVM prefilter with the map's EXACT predicate (Python `w in name`
    # == Column.contains for a literal needle): rows the UDTF would
    # emit nothing for never cross the Python boundary, and contains()
    # translates to a parquet StringContains pushdown (instr(...) > 0,
    # tried first, stayed a post-scan DataFilter). The UDTF's emission
    # set is provably unchanged -- it remains the authority on what is
    # emitted; the filter only prunes rows whose emission set is
    # empty. Guide rule: pass only the rows/columns the function needs
    # across the JVM<->Python boundary.
    names = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(word)
    ).select("p_name", F.lit(word).alias("word"))
    emitted = map_as_udtf(names, search_map, "key string, value int")
    return (
        emitted.groupBy(F.col("key").alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("name")
    )
