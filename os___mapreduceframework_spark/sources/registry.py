"""Sources: parquet fixture tables + the reference's directory-listing scan.

The reference's only sources are an in-memory pair vector
(MapReduceFramework.cpp:370) and the Search client's directory scan
(Search.cpp:98-111: ``opendir``/``readdir`` per CLI dir, one record per
entry per dir, including ``.`` and ``..``; duplicate names across dirs
stay separate records). Here the general source layer is ``spark.read``
(parquet/csv/json/orc -- columnar scan with predicate pushdown and column
pruning for free), and ``dir_entries`` reproduces the Search scan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DIR_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("dir", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan. Filters/projections on the result are pushed
    into the scan by Catalyst (check ``PushedFilters``/``ReadSchema`` in
    ``.explain``).

    ``events.ts`` is a nanosecond parquet timestamp, which Spark's reader
    rejects by default; we read it as raw nanos (``nanosAsLong``) and
    truncate to microseconds (``div 1000`` -- integer division, exact),
    matching DuckDB's own ns->us truncation so oracles agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture table as a temp view for the SQL surface."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def dir_entries(spark: SparkSession, dirs: list[str]) -> DataFrame:
    """The Search client's input relation (Search.cpp:98-111).

    One row per directory entry per directory, INCLUDING ``.`` and ``..``
    (readdir semantics, Search.cpp:102); names duplicated across dirs
    remain separate rows (a degenerate UNION ALL of per-dir scans).

    The listing itself is driver-side (it is CLI-argument-sized metadata,
    like Spark's own file-index listing), but the resulting relation is a
    distributed DataFrame so everything downstream scales.
    """
    rows = []
    for d in dirs:
        rows.append((d, "."))
        rows.append((d, ".."))
        try:
            entries = sorted(os.listdir(d))
        except OSError:
            entries = []
        rows.extend((d, e) for e in entries)
    return spark.createDataFrame(rows, schema=DIR_ENTRIES_SCHEMA)
