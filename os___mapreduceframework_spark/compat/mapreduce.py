"""Compatibility API for the reference's engine surface.

``run_map_reduce`` reproduces ``RunMapReduceFramework``
(MapReduceFramework.cpp:360-443) with the semantics pinned in SURVEY.md
section 1.1:

- ``map_fn(k1, v1) -> Iterable[(k2, v2)]`` -- 0..n emissions, the
  reference's ``Map`` + ``Emit2`` (MapReduceFramework.cpp:112, :298-305);
- grouping by **key value equality** (the reference's
  ``!(a<b) && !(b<a)`` over ``operator<``, MapReduceFramework.cpp:29-34,
  :186-193) -- Spark's native group-by-value;
- ``reduce_fn(k2, values) -> Iterable[(k3, v3)]`` -- 0..n emissions, the
  reference's ``Reduce`` + ``Emit3`` (MapReduceFramework.cpp:147,
  :307-310);
- output globally sorted ascending by k3 (MapReduceFramework.cpp:341;
  intra-key value order unspecified, like the reference's unstable
  ``std::sort``).

Everything the reference implements by hand -- the pipelined shuffle
(:166-230), work-stealing scheduler (:106-119), barriers (:382, :408),
memory lifecycle (:394-398, :418-435) -- is Spark's engine here; no
parallelism/threading code exists in this module.

Two execution paths:

- **Arrow fast path** (schema hints given): ``mapInPandas`` for the map
  phase (Arrow-batched; the per-row Python call is the user's own
  callable, unavoidable by definition) and ``groupBy().applyInPandas``
  for the reduce phase -- Spark's hash shuffle groups, partial
  aggregation is not possible for an opaque reduce so the full group is
  delivered, exactly the reference's contract.
- **Pickled-RDD fallback** (opaque Python objects, any ``<``-comparable
  key): ``flatMap -> groupByKey -> flatMap -> sortBy``. Slow path;
  documented as such (SURVEY.md section 7.4).

At 100 TB: the fast path shuffles once on k2 (hash) and once for the
k3 range-sort -- the same two exchanges any Spark agg+sort pays; skewed
k2 groups are the user's responsibility, as in the reference, but AQE
skew handling applies to the sort.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
ReduceFn = Callable[[Any, list[Any]], Iterable[tuple[Any, Any]]]


def run_map_reduce(
    input_data: DataFrame | Iterable[tuple[Any, Any]],
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    *,
    mid_schema: str | None = "key string, value string",
    out_schema: str | None = "key string, value string",
    spark: SparkSession | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Run map -> group-by-key -> reduce -> global sort; return the sorted
    DataFrame (columns ``key``, ``value``).

    ``input_data``: a two-column DataFrame (first column = k1, second =
    v1) or an iterable of (k1, v1) pairs. ``mid_schema``/``out_schema``:
    Spark DDL for the (k2, v2)/(k3, v3) stages -- column names must be
    ``key, value``. Pass ``None`` for either to force the pickled-RDD
    fallback (opaque Python objects). ``parallelism`` mirrors the
    reference's ``multiThreadLevel`` (MapReduceFramework.cpp:360) as a
    shuffle-partition override.
    """
    if isinstance(input_data, DataFrame):
        df = input_data
        spark = spark or df.sparkSession
    else:
        if spark is None:
            raise ValueError("spark= required when input is not a DataFrame")
        pairs = list(input_data)
        df = spark.createDataFrame(
            pd.DataFrame({"key": [k for k, _ in pairs], "value": [v for _, v in pairs]})
            if pairs
            else pd.DataFrame({"key": pd.Series(dtype=object), "value": pd.Series(dtype=object)}),
            schema="key string, value string" if not pairs else None,
        )
    k1, v1 = df.columns[0], df.columns[1]

    if mid_schema is None or out_schema is None:
        return _rdd_path(df, k1, v1, map_fn, reduce_fn, parallelism)

    def map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, vals = [], []
            for k, v in zip(pdf[k1], pdf[v1]):
                for k2, v2 in map_fn(k, v):
                    keys.append(k2)
                    vals.append(v2)
            yield pd.DataFrame({"key": keys, "value": vals})

    mapped = df.mapInPandas(map_batches, schema=mid_schema)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        k2 = pdf["key"].iloc[0]
        keys, vals = [], []
        for k3, v3 in reduce_fn(k2, list(pdf["value"])):
            keys.append(k3)
            vals.append(v3)
        return pd.DataFrame({"key": keys, "value": vals})

    # groupBy().applyInPandas hash-partitions on the key itself; an extra
    # repartition would be a second exchange. Only pre-partition when the
    # caller explicitly overrides parallelism (the reference's
    # multiThreadLevel), mirroring F9.
    if parallelism:
        mapped = mapped.repartition(parallelism, "key")
    reduced = mapped.groupBy("key").applyInPandas(reduce_group, schema=out_schema)
    return reduced.orderBy("key")


def _rdd_path(
    df: DataFrame,
    k1: str,
    v1: str,
    map_fn: MapFn,
    reduce_fn: ReduceFn,
    parallelism: int | None,
) -> DataFrame:
    """Opaque-object fallback: pickled RDD flatMap/groupByKey/flatMap/
    sortBy (SURVEY.md section 7.4 -- the only place RDDs appear)."""
    rdd = df.rdd.map(lambda row: (row[k1], row[v1]))
    out = (
        rdd.flatMap(lambda kv: map_fn(kv[0], kv[1]))
        .groupByKey(numPartitions=parallelism)
        .flatMap(lambda kv: reduce_fn(kv[0], list(kv[1])))
        .sortByKey(ascending=True, numPartitions=parallelism)
    )
    # persist before probing: isEmpty() runs a job and toDF's schema
    # inference samples another -- without a cache each re-executes the
    # user's map/reduce callables (possibly expensive or side-effecting)
    # through the whole pipeline
    out = out.persist()
    if out.isEmpty():  # toDF cannot infer a schema from an empty RDD
        out.unpersist()
        return df.sparkSession.createDataFrame([], schema="key string, value string")
    return out.toDF(["key", "value"])
