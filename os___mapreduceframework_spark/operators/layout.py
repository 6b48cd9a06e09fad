"""Data-layout operators: Z-order (Morton) clustering for multi-
dimensional data skipping (charter extension: 100 TB table layout).

Partition pruning and parquet min/max skipping are one-dimensional: a
table sorted by customer cannot skip files for a date predicate. The
standard fix (Delta/Iceberg `OPTIMIZE ZORDER BY`) interleaves the bits
of several columns into one Morton key and range-partitions + sorts by
it; every key-prefix bucket is then a small hyper-rectangle in BOTH
dimensions, so min/max stats prune files for predicates on either
column. This module computes the Morton key as a pure scan-local
bit-arithmetic expression (JVM codegen, no UDF) and audits the layout
quality: per key-prefix bucket, the spans of both dimensions.

Scale notes: the layout write is ``df.repartitionByRange(N,
zkey).sortWithinPartitions(zkey).write...`` -- one range shuffle, the
same cost as any global sort, paid once at write time; every later scan
with a predicate on either dimension prunes ~sqrt-style instead of
reading everything. The audit query here is the statistics view a table
optimizer would persist; its aggregate is one map-side-combined pass,
state = n_buckets rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

ZBITS = 8  # bits per dimension -> 16-bit Morton key (test-scale domain)
PREFIX_BITS = 5  # bucket = top 5 key bits -> 32 buckets


def morton_expr(x: str, y: str, bits: int = ZBITS) -> str:
    """SQL expr interleaving the low ``bits`` bits of x (even positions)
    and y (odd positions) -- identical syntax in Spark SQL and DuckDB
    (>>, &, * by power-of-two constants)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


# dimensions: customer key and order day-number, folded into an 8-bit
# z-domain so the fixture's value ranges fill every bit position (a
# production layout uses the raw 16-32-bit domains; the interleave
# expression is bits-parameterized and identical either way)
_X = "o_custkey % 256"
# pmod, not %: orders dated before the epoch would otherwise fold
# to a NEGATIVE y whose two's-complement low bits silently bucket
# as y+256 while the min/max span audit reports the raw negative --
# wrong spans on standard TPC-H data (orders from 1992)
_SPARK_Y = "pmod(datediff(o_orderdate, date'1995-01-01'), 256)"
_DUCK_Y = ("((date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)"
           " % 256) + 256) % 256")


@query(
    "layout_zorder_stats",
    oracle=f"""
    WITH z AS (
      SELECT o_custkey % 256 AS x,
             {_DUCK_Y} AS y,
             {morton_expr("(o_custkey % 256)", f"({_DUCK_Y})")} AS zkey
      FROM orders
    )
    SELECT zkey >> {2 * ZBITS - PREFIX_BITS} AS bucket,
           COUNT(*) AS n_rows,
           MIN(x) AS x_min, MAX(x) AS x_max,
           MIN(y) AS y_min, MAX(y) AS y_max
    FROM z
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="Z-order layout audit over orders (customer x order-day): Morton "
    "key from pure bit-interleave expressions (scan-local, codegen, no "
    "UDF), bucketed by the top key bits; each bucket's min/max spans "
    "show the hyper-rectangle both dimensions prune on. This is the "
    "statistics view behind OPTIMIZE ZORDER-style multi-dimensional "
    "data skipping; the write path is repartitionByRange(zkey) + "
    "sortWithinPartitions (one range shuffle, paid once).",
)
def q_layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    z = orders.select(
        F.expr(_X).alias("x"),
        F.expr(_SPARK_Y).alias("y"),
        F.expr(morton_expr(f"({_X})", f"({_SPARK_Y})")).alias("zkey"),
    )
    return (
        z.groupBy(
            F.shiftright("zkey", 2 * ZBITS - PREFIX_BITS).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("bucket")
    )
