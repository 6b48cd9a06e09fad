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


# the OPTIMIZE ZORDER demo's predicate slices: one 1/8 window per
# dimension (32 of 256 values), far from the domain edges
_XP_LO, _XP_HI = 96, 127
_YP_LO, _YP_HI = 32, 63
_ZSHIFT = 2 * ZBITS - PREFIX_BITS  # top PREFIX_BITS of the Morton key
_LINSHIFT = ZBITS - PREFIX_BITS  # top PREFIX_BITS of the x domain


def _skip_stats(spans: DataFrame, layout: str) -> DataFrame:
    """One summary row from a per-bucket span table: how many buckets
    (and how many rows) a min/max-pruned scan must read under the fixed
    x- and y-slice predicates."""
    x_hit = (F.col("x_max") >= _XP_LO) & (F.col("x_min") <= _XP_HI)
    y_hit = (F.col("y_max") >= _YP_LO) & (F.col("y_min") <= _YP_HI)
    return spans.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.count(F.when(x_hit, 1)).alias("n_read_x"),
        F.count(F.when(y_hit, 1)).alias("n_read_y"),
        F.sum(F.when(y_hit, F.col("n"))).cast("bigint").alias("rows_read_y"),
    ).select(
        F.lit(layout).alias("layout"),
        "n_buckets",
        "n_read_x",
        "n_read_y",
        "rows_read_y",
    )


def _duck_skip_leg(src: str, layout: str) -> str:
    return f"""
    SELECT '{layout}' AS layout, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(COUNT(CASE WHEN xmax >= {_XP_LO} AND xmin <= {_XP_HI}
                           THEN 1 END) AS BIGINT) AS n_read_x,
           CAST(COUNT(CASE WHEN ymax >= {_YP_LO} AND ymin <= {_YP_HI}
                           THEN 1 END) AS BIGINT) AS n_read_y,
           CAST(SUM(CASE WHEN ymax >= {_YP_LO} AND ymin <= {_YP_HI}
                         THEN n END) AS BIGINT) AS rows_read_y
    FROM {src}"""


@query(
    "layout_zorder_skipping",
    oracle=f"""
    WITH z AS (
      SELECT o_custkey % 256 AS x,
             {_DUCK_Y} AS y,
             {morton_expr("(o_custkey % 256)", f"({_DUCK_Y})")} AS zkey
      FROM orders
    ),
    b AS (SELECT x >> {_LINSHIFT} AS blin, zkey >> {_ZSHIFT} AS bz, x, y
          FROM z),
    lin AS (SELECT blin, COUNT(*) AS n, MIN(x) AS xmin, MAX(x) AS xmax,
                   MIN(y) AS ymin, MAX(y) AS ymax
            FROM b GROUP BY blin),
    zb AS (SELECT bz, COUNT(*) AS n, MIN(x) AS xmin, MAX(x) AS xmax,
                  MIN(y) AS ymin, MAX(y) AS ymax
           FROM b GROUP BY bz)
    {_duck_skip_leg("lin", "linear")}
    UNION ALL
    {_duck_skip_leg("zb", "zorder")}
    ORDER BY layout
    """,
    doc="OPTIMIZE ZORDER before/after data-skipping audit: orders is "
    "physically REWRITTEN bucket-partitioned by the top Morton-key "
    "bits (repartition on the bucket + partitionBy write -- the "
    "Delta/Iceberg OPTIMIZE ZORDER rewrite shape, one shuffle, paid "
    "once), read back schema-explicit, and per-bucket min/max spans "
    "are compared against the 1-D customer-sorted layout under a "
    "fixed slice predicate per dimension. The measured contrast IS "
    "the point: the linear layout prunes only its sort dimension "
    "(n_read_x small, n_read_y = all buckets), the z-order layout "
    "prunes BOTH (~sqrt-style) -- at 100 TB that is the difference "
    "between reading every file and reading a hyper-rectangle's "
    "worth for the non-sort dimension. rows_read_y sums actual rows "
    "behind the buckets a y-predicate scan cannot skip.",
)
def q_layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os___mapreduceframework_spark.scratch import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    z = orders.select(
        F.expr(_X).alias("x"),
        F.expr(_SPARK_Y).alias("y"),
        F.expr(morton_expr(f"({_X})", f"({_SPARK_Y})")).alias("zkey"),
    ).select(
        "x",
        "y",
        F.shiftright(F.col("x"), _LINSHIFT).alias("blin"),
        F.shiftright("zkey", _ZSHIFT).alias("bz"),
    )
    # the OPTIMIZE rewrite: cluster physically by z-bucket (repartition
    # first so each bucket is one task's contiguous file, the bucketed-
    # layout write shape used by both MERGE sinks)
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = scratch_dir(f"zorder_orders_{tag}")
    z.repartition(F.col("bz")).write.mode("overwrite").partitionBy(
        "bz"
    ).parquet(path)
    # schema-explicit read-back: an empty orders table writes zero
    # bucket dirs and inference would fail (degenerate contract)
    back = spark.read.schema(z.schema).parquet(path)

    def spans(bucket: str) -> DataFrame:
        return back.groupBy(bucket).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )

    return (
        _skip_stats(spans("blin"), "linear")
        .unionAll(_skip_stats(spans("bz"), "zorder"))
        .orderBy("layout")
    )
