"""Relational operator library (SURVEY.md section 2.3 checklist).

The reference's query surface is one pipeline (scan -> filter -> project
-> count -> sort, Search.cpp:84-125); every other relational category is
"absent" there and enters this engine's surface per the charter. Each
operator family below is a registered query with a DuckDB oracle, all
expressed through DataFrame/Catalyst built-ins -- no custom shuffle,
aggregation, join, or sort code anywhere (that entire half of the
reference, MapReduceFramework.cpp:101-347, is Spark's engine here).

FP-stability conventions (so the Spark result and the DuckDB oracle are
bit-equal despite different execution orders):

- money sums go through DECIMAL casts (exact, order-independent), cast
  to double only at the end;
- averages are decimal-sum / count, rounded;
- variance-family outputs are rounded to 6 places;
- timestamps are formatted to strings.

Scale notes are per-query docstrings; the common ones: dimension joins
are broadcast (no shuffle of the fact side), aggregations are
partial+final hash aggregates (map-side combine for free), filters and
projections push into the parquet scan, and every LIMIT/top-k uses
Spark's TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import (
    FINITE_VALUE_SQL,
    finite_values,
    load_table,
)

# decimal casts sized to fixture ranges (prices < 5e5, rates < 0.11,
# quantity <= 50) with ample headroom; sums widen automatically
_PRICE = "decimal(18,4)"
_RATE = "decimal(8,4)"


def _d2dbl(dec_col):
    """Exact decimal -> double, stable across engines.

    Rounding to scale 2 while still in decimal keeps the unscaled value
    small enough (< 2^53 at any realistic SF) that the decimal->double
    conversion is exact in both Spark and DuckDB. Casting a scale-12
    int128 decimal directly can differ by 1 ulp between engines.
    """
    return F.round(dec_col, 2).cast("double")


def _dsum(col, alias: str):
    """Order-independent exact sum of a money/quantity column."""
    return _d2dbl(F.sum(F.col(col).cast(_PRICE))).alias(alias)


def _davg(col, alias: str):
    """Deterministic average: exact decimal sum / count, rounded."""
    return F.round(
        _d2dbl(F.sum(F.col(col).cast(_PRICE))) / F.count(F.lit(1)), 6
    ).alias(alias)


_SQL_DSUM = "CAST(ROUND(SUM(CAST({c} AS DECIMAL(18,4))), 2) AS DOUBLE)"
_SQL_DAVG = f"ROUND({_SQL_DSUM} / COUNT(*), 6)"


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_SQL_DSUM.format(c="l_quantity")} AS sum_qty,
           {_SQL_DSUM.format(c="l_extendedprice")} AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(8,4))
                    * CAST(1 + CAST(l_tax AS DECIMAL(8,4)) AS DECIMAL(8,4))), 2) AS DOUBLE) AS sum_charge,
           {_SQL_DAVG.format(c="l_quantity")} AS avg_qty,
           {_SQL_DAVG.format(c="l_extendedprice")} AS avg_price,
           {_SQL_DAVG.format(c="l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: the canonical partial+final hash aggregate. "
    "8 aggregates over 2 grouping cols; filter pushed to the scan. At "
    "100 TB this is one shuffle of tiny partial-agg rows (6 groups).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_RATE)
    )
    # keep factors at scale 4 so the triple product stays inside decimal
    # precision 38 (otherwise Spark truncates the scale and drifts from
    # the oracle's exact arithmetic)
    charge = (
        F.col("l_extendedprice").cast(_PRICE)
        * (F.lit(1) - F.col("l_discount").cast(_RATE)).cast(_RATE)
        * (F.lit(1) + F.col("l_tax").cast(_RATE)).cast(_RATE)
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _d2dbl(F.sum(disc_price)).alias("sum_disc_price"),
            _d2dbl(F.sum(charge)).alias("sum_charge"),
            _davg("l_quantity", "avg_qty"),
            _davg("l_extendedprice", "avg_price"),
            _davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="COUNT DISTINCT (expand + two-phase agg in Spark; exact).",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           {_SQL_DAVG.format(c="l_quantity")} AS avg_qty,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="min/max/avg/stddev/variance per group (rounded for cross-engine "
    "FP stability).",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            _davg("l_quantity", "avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "median_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90
    FROM events WHERE (value IS NULL OR isfinite(value))
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Exact interpolated quantiles (Spark percentile == DuckDB "
    "quantile_cont). approx_percentile is the 100 TB path; the exact "
    "form is the oracle-checkable one.",
)
def q_median_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        finite_values(load_table(spark, sf_dir, "events"))
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_tol,
           TRUE AS parts_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++, default rsd=0.05) audited "
    "in-plan: the output carries exact countDistinct columns plus "
    "boolean <15%-relative-error flags on the sketch estimates, so an "
    "engine-specific sketch still hash-matches a DuckDB oracle (exact "
    "cols + TRUE flags). At 100 TB the approx path is the one you run "
    "-- no exact-distinct shuffle expansion; the exact columns exist to "
    "make the estimate's contract checkable (observed ~8.6% rel err at "
    "sf0.01).",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_orderkey").alias("ao"),
            F.approx_count_distinct("l_partkey").alias("ap"),
        )
    )

    def tol(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) / F.col(exact) < 0.15

    return g.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        tol("ao", "exact_orders").alias("orders_within_tol"),
        tol("ap", "exact_parts").alias("parts_within_tol"),
    ).orderBy("l_returnflag")


@query(
    "conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="CASE WHEN inside aggregates (conditional aggregation).",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_big"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name,
           COUNT(*) AS n_suppliers,
           CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="Star-schema dim joins: nation/region are broadcast "
    "(F.broadcast), so the fact side never shuffles for the join -- the "
    "only exchange is the final tiny aggregation. The 100 TB-correct "
    "plan for small dims.",
)
def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            _dsum("s_acctbal", "total_acctbal"),
        )
        .orderBy("r_name")
    )


@query(
    "join_fact_fact",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Large fact-fact equi-join: sort-merge/shuffle-hash on the join "
    "key (both sides hash-partitioned on orderkey; AQE picks the "
    "strategy and splits skewed partitions at runtime).",
)
def q_join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both sides are fact-scale: merge-hint so small-SF stats never
    # promote one to a broadcast (the audited q4 trap)
    o = load_table(spark, sf_dir, "orders").hint("merge")
    li = load_table(spark, sf_dir, "lineitem").hint("merge")
    revenue = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_RATE)
    )
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _d2dbl(F.sum(revenue)).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="LEFT SEMI join (EXISTS): no row duplication, right side reduced "
    "to its keys before the join.",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # orders is a fact: merge hint keeps small-SF stats from broadcasting
    # it (at 100 TB the semi join must shuffle both sides; same trap as
    # q4_order_priority, see BASELINE.md)
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="LEFT ANTI join (NOT EXISTS).",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # fact side: never broadcast (see q_join_semi note)
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0), 2) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    doc="LEFT OUTER join preserving unmatched rows (zero-order customers "
    "appear with n_orders=0).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # fact side: never broadcast (see q_join_semi note)
    o = load_table(spark, sf_dir, "orders").hint("merge")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _d2dbl(F.coalesce(F.sum(F.col("o_totalprice").cast(_PRICE)), F.lit(0)))
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "scalar_subquery_filter",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) / COUNT(*) AS v
      FROM customer
    )
    SELECT c_nationkey, COUNT(*) AS n_rich
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.v
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="Scalar-subquery filter (customers above global average balance) "
    "as a 1-row broadcast cross join -- the distributed form of a scalar "
    "subquery; avg computed in decimal for determinism.",
)
def q_scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(
        (_d2dbl(F.sum(F.col("c_acctbal").cast(_PRICE))) / F.count(F.lit(1))).alias("v")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_rich"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# sort / limit / top-k
# --------------------------------------------------------------------------


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject "
    "(per-partition heap + driver merge, no global sort). Tie-broken by "
    "key for determinism.",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 5
    """,
    doc="LIMIT with OFFSET over a deterministic total order.",
)
def q_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(15)
    )


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="UNION (distinct).",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT (distinct).",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="EXCEPT (distinct).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # EXCEPT DISTINCT semantics


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="DISTINCT / dropDuplicates (hash aggregate on all columns).",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# rollup / cube / grouping sets / pivot
# --------------------------------------------------------------------------


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals (grand total + per-flag subtotals). "
    "Engine contract: EMPTY input yields EMPTY output -- Spark's "
    "rollup omits the standard's zero-count grand-total row, and the "
    "oracle mirrors that via HAVING COUNT(*) > 0 (a no-op on any "
    "non-empty input, since every rollup row aggregates >= 1 row).",
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), _dsum("l_quantity", "sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE: all grouping-set combinations. Same empty-input "
    "contract as rollup_agg (empty in, empty out; HAVING pins it).",
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Explicit GROUPING SETS via the SQL surface.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="PIVOT with explicit value list (compiles to conditional "
    "aggregation -- one pass, no extra shuffle). Empty cells pinned "
    "to 0: Spark's pivot().count() yields NULL for a (group, value) "
    "cell with no rows while conditional COUNT yields 0; the COUNT "
    "contract wins.",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0)).alias("F"),
            F.coalesce("O", F.lit(0)).alias("O"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
    ORDER BY p_partkey, metric
    """,
    doc="UNPIVOT via DataFrame.unpivot (melt): wide -> long.",
)
def q_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retail"),
    )
    return (
        p.unpivot("p_partkey", ["size", "retail"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Ranking window functions + top-3-per-group (the scalable "
    "per-group top-k: one hash exchange on the partition key, no "
    "self-join).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_quantity) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
    FROM lineitem
    WHERE l_suppkey < 20
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    doc="Running-total analytic frame (ROWS UNBOUNDED PRECEDING). The "
    "summed measure is the FINAL window-order tiebreak: a ROWS frame "
    "under replayed rows that tie on the whole logical key but carry "
    "corrected quantities would otherwise produce engine-order "
    "prefix sums (rows identical in every column stay interchangeable, "
    "so the dup-replay shape is still deterministic).",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 20)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 4).alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value - LAG(value) OVER w, 6) AS delta,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="LAG/LEAD analytic functions over event time.",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# scalar functions: string / date / JSON / arrays
# --------------------------------------------------------------------------


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           length(p_name) AS name_len,
           substr(p_name, 1, 4) AS prefix,
           concat_ws(':', p_brand, p_type) AS brand_type,
           replace(p_name, ' ', '_') AS snake,
           trim(p_name) AS trimmed,
           CASE WHEN p_name LIKE '%wid%' THEN 1 ELSE 0 END AS has_wid
    FROM part
    WHERE p_partkey < 500
    ORDER BY p_partkey
    """,
    doc="Scalar string surface: upper/lower/length/substr/concat/replace/"
    "trim/LIKE -- all JVM-side, whole-stage-codegen'd.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.lower("p_brand").alias("lbrand"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 4).alias("prefix"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.trim("p_name").alias("trimmed"),
            F.when(F.col("p_name").like("%wid%"), 1).otherwise(0).alias("has_wid"),
        )
        .orderBy("p_partkey")
    )


@query(
    "regexp_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
    FROM part
    WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
    doc="Regex surface: extract/match/replace.",
)
def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
            F.col("p_name").rlike(r"^[a-z]+ ").alias("starts_word"),
            F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        )
        .orderBy("p_partkey")
    )


@query(
    "date_functions",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           MIN(EXTRACT(year FROM o_orderdate)) AS yr,
           MIN(EXTRACT(month FROM o_orderdate)) AS mo,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    ORDER BY month
    """,
    doc="Date/time surface: date_trunc, extract, formatting (timestamps "
    "compared as formatted strings for cross-engine stability).",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
        )
        .agg(
            F.min(F.year("o_orderdate")).alias("yr"),
            F.min(F.month("o_orderdate")).alias("mo"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("month")
    )


@query(
    "json_functions",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
    doc="JSON extraction from string columns (events.props).",
)
def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_bucket")
    )


@query(
    "array_explode_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    ORDER BY word
    """,
    doc="split + explode + count: the array/lateral surface (and the "
    "classic MapReduce wordcount expressed relationally).",
)
def q_array_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("word")
    )


@query(
    "filter_project_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_quantity < 3
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Filter + projection pushed into the parquet scan (PushedFilters "
    "+ pruned ReadSchema in the physical plan -- asserted in tests).",
)
def q_filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") < 3)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
