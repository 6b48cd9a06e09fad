"""Multi-join analytical queries (TPC-H Q3/Q5/Q6/Q10/Q12 shapes,
adapted to the fixture schemas in FIXTURES.md).

The reference has no joins at all (SURVEY.md section 2.3: grep over both
files confirms no second-input operator); these queries are the charter
surface that proves the engine composes scans, selective filters,
broadcast + shuffle joins, partial aggregation, and top-k into the plans
a 100 TB warehouse needs:

- dimension tables (region/nation, and customer/supplier at small SF)
  are broadcast -- the lineitem/orders fact sides are never shuffled for
  a dim join;
- fact-fact joins (orders * lineitem) shuffle on the join key once and
  AQE coalesces the post-shuffle partitions;
- every filter lands in the parquet scan (PushedFilters), every top-k is
  a TakeOrderedAndProject (no global sort of the aggregate output).

FP-stability follows the relational.py conventions: money math in
DECIMAL on both sides, cast to double after a scale-2 round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

_PRICE = "decimal(18,4)"
_RATE = "decimal(8,4)"

# revenue = SUM(l_extendedprice * (1 - l_discount)) in exact decimal
_REVENUE = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE)"
)


def _revenue_col():
    return (
        F.sum(
            F.col("l_extendedprice").cast(_PRICE)
            * (F.lit(1) - F.col("l_discount").cast(_RATE))
        )
        .cast("decimal(38,4)")
        .alias("_rev_dec")
    )


def _rev_to_double(df: DataFrame) -> DataFrame:
    return df.withColumn("revenue", F.round("_rev_dec", 2).cast("double")).drop(
        "_rev_dec"
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REVENUE} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter (1/5 of customers) "
    "broadcast into orders, fact-fact shuffle join to lineitem, "
    "aggregate, top-10. The customer side is broadcast so the orders "
    "scan never shuffles for it; the final top-k is "
    "TakeOrderedAndProject over ~group-count rows, not a global sort.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").hint("merge").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").hint("merge").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    joined = li.join(
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        _revenue_col()
    )
    return (
        _rev_to_double(agg)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REVENUE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-table star join. region->nation->supplier "
    "and customer are broadcast (each orders-of-magnitude smaller than "
    "the facts); the only shuffle joins are orders*customer-key and "
    "lineitem*orders. Region filter prunes 4/5 of nations before any "
    "fact row is touched.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").hint("merge").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").hint("merge")
    joined = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    agg = joined.groupBy("n_name").agg(_revenue_col())
    return _rev_to_double(agg).select("n_name", "revenue").orderBy(
        F.desc("revenue"), "n_name"
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(8,4))), 2) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate, zero joins, one "
    "global agg row. All three predicates push to the parquet scan; "
    "at 100 TB this is the I/O-bound roofline query -- row-group "
    "statistics skip most of the file.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(_PRICE)
                    * F.col("l_discount").cast(_RATE)
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_REVENUE} AS revenue,
           CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,4)), 2) AS DOUBLE) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: quarter of orders, returned lines only, "
    "revenue per customer, top-20. nation broadcast; returnflag filter "
    "pushed to the lineitem scan (dictionary-encoded column -> cheap "
    "row-group skipping at scale).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").hint("merge").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").hint("merge").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        _revenue_col()
    )
    return (
        _rev_to_double(agg)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal").cast(_PRICE), 2).cast("double").alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_shipping_delay",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
           COUNT(*) AS all_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q12 shape (adapted: fixtures lack receipt/commit dates, "
    "so 'late' = shipped >60 days after order date): fact-fact join + "
    "conditional aggregation. One shuffle on the order key; the CASE "
    "aggregates fold into the same partial/final hash aggregate.",
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").hint("merge").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").hint("merge").select("l_orderkey", "l_shipdate")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late_lines"),
            F.count(F.lit(1)).alias("all_lines"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(8,4)))
                 ELSE 0 END)
           / SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4)::DOUBLE
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share for one ship month. The "
    "part dim is broadcast; the month filter pushes to the lineitem "
    "scan so the join touches ~1/80 of the fact. Conditional + total "
    "sums fold into one partial/final aggregate (single output row).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_RATE)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0))
                / F.sum(disc_price),
                4,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 300 (an "
    "IN-subquery over a grouped HAVING), joined back to customer. "
    "Catalyst plans the subquery as an aggregate + semi join on the "
    "order key -- the fact shuffles once for the HAVING aggregate and "
    "the qualifying-key set (tiny) semi-joins the rest.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_PRICE)).alias("qty"))
        .filter(F.col("qty") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(
            orders.join(
                big_orders, orders["o_orderkey"] == big_orders["big_orderkey"], "left_semi"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(_PRICE)), 2)
            .cast("double")
            .alias("total_qty")
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority counts for orders with at least "
    "one late-shipped line. The correlated EXISTS carries a non-equi "
    "conjunct (l_shipdate > o_orderdate + 60 days); Catalyst "
    "decorrelates it into a left-semi join on the order key with the "
    "date comparison as a join residual -- the fact is touched once, "
    "no per-row subquery execution.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    # merge hint: both sides are facts -- without it, small-SF statistics
    # put the 2-column lineitem projection under the broadcast threshold
    # and Catalyst broadcasts a FACT (3.8 s locally, fatal at 100 TB).
    # Sort-merge on the order key is the shape that scales and spills.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .hint("merge")
    )
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT order_count, COUNT(*) AS n_custs
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS order_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY order_count
    ORDER BY n_custs DESC, order_count DESC
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts, "
    "counting only non-urgent orders but keeping order-less customers "
    "(LEFT OUTER with the filter in the join condition, NOT the WHERE "
    "-- moving it to WHERE would silently drop the zero bucket). Two "
    "aggregations: the second groups on the first's output, which is "
    "already tiny, so only the first shuffles meaningful data.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    # merge hint: orders is a fact (same trap as q4 -- the 3-column
    # projection slips under the broadcast threshold at bench SF)
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderpriority")
        .hint("merge")
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return (
        per_cust.groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("order_count"))
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 2500)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    doc="TPC-H Q16 shape: distinct-supplier variety per part "
    "brand/type, excluding low-balance suppliers via NOT IN. NOT IN is "
    "null-aware: Catalyst plans it as a null-aware anti join "
    "(broadcast, since the exclusion set is tiny); the p_size filter "
    "pushes to the part scan before the fact join.",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_brand", "p_type"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    low_bal = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2500)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        li.join(F.broadcast(low_bal), F.col("l_suppkey") == F.col("bad_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_partkey,
                 CAST(0.2 AS DECIMAL(8,4)) * AVG(CAST(l_quantity AS DECIMAL(18,4)))
                   AS qty_threshold
          FROM lineitem GROUP BY l_partkey) pa
      ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS DECIMAL(18,4)) < qty_threshold
    """,
    doc="TPC-H Q17 shape: revenue from small-quantity lines, where "
    "'small' is a correlated per-part average (written as its "
    "decorrelated form: the per-part aggregate joined back to the "
    "fact -- exactly what Catalyst rewrites the correlated scalar "
    "subquery into). NOTE the threshold is FP in practice: DuckDB "
    "evaluates AVG(DECIMAL) and decimal division as DOUBLE, so the "
    "0.2*avg comparison is exact only up to an ulp on the oracle "
    "side -- a boundary tie is measure-zero with continuous "
    "quantities, not impossible. The brand filter prunes the "
    "part side before the join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.lit(0.2).cast(_RATE) * F.avg(F.col("l_quantity").cast(_PRICE))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity").cast(_PRICE) < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(_PRICE)) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {_REVENUE} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: revenue under an OR-of-conjuncts predicate "
    "mixing both join sides. Catalyst keeps the equi-join key "
    "(p_partkey = l_partkey) out of the disjunction, pushes the "
    "single-side residues (brand/size, quantity) beneath the join "
    "where derivable, and evaluates the cross-side disjunction as a "
    "join filter -- a hash join, never a nested loop.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & q.between(20, 40))
    )
    return _rev_to_double(
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(_revenue_col())
    ).select("revenue")


@query(
    "q22_dormant_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_custs,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_bal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) >
          (SELECT AVG(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer
           WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: well-funded customers with no urgent orders, "
    "per market segment. Composes an uncorrelated scalar subquery (the "
    "positive-balance average, computed once and broadcast as a "
    "literal-like single-row side) with a NOT EXISTS anti join on the "
    "urgent-order keys. DECIMAL average keeps the > comparison exact "
    "across engines.",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    # distinct BEFORE the anti-join: the urgent key set is a fact-scale
    # projection (~a fifth of orders); broadcasting it raw was the
    # audited trap. Distinct bounds it by customer cardinality and the
    # merge hint keeps the anti-join a shuffle join at every scale.
    urgent = (
        load_table(spark, sf_dir, "orders").hint("merge")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("urgent_custkey"))
        .distinct()
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(F.col("c_acctbal").cast(_PRICE)).alias("avg_bal"))
    )
    return (
        cust.join(
            urgent, F.col("c_custkey") == F.col("urgent_custkey"), "left_anti"
        )
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast(_PRICE) > F.col("avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum(F.col("c_acctbal").cast(_PRICE)), 2)
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {_REVENUE} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral shipping volume between two nations "
    "by year. Two independent joins against the same nation dim (self- "
    "aliased, both broadcast); the disjunctive nation-pair predicate "
    "prunes after the cheap broadcast joins while the fact side "
    "shuffles only for the orders join and final aggregate.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").hint("merge").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").hint("merge").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return _rev_to_double(
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_revenue_col())
    ).select("supp_nation", "cust_nation", "l_year", "revenue").orderBy(
        "supp_nation", "cust_nation", "l_year"
    )


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(8,4))) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4)::DOUBLE AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_3 suppliers' share of PROMO-part revenue "
    "sold into ASIA-region customers, by order year. Seven-table snow- "
    "flake: every dim broadcasts, the lineitem-orders edge is the only "
    "fact shuffle; the share is a conditional/total aggregate pair "
    "computed in one pass, in DECIMAL.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").hint("merge").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").hint("merge").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    volume = F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_RATE)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(region), F.col("r_regionkey") == F.col("n2_region")
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0))
                / F.sum(volume),
                4,
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {_REVENUE} AS revenue
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    doc="TPC-H Q9 shape (revenue variant -- the fixture has no "
    "partsupp/supplycost): widget-line revenue per supplier nation per "
    "order year. The LIKE filter pushes to the part scan as a contains "
    "filter; part and supplier broadcast; one fact shuffle for the "
    "orders join, one for the aggregate.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").hint("merge").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").hint("merge").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return _rev_to_double(
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_revenue_col())
    ).select("nation", "o_year", "revenue").orderBy("nation", F.desc("o_year"))


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: the top-revenue supplier(s) for one quarter. "
    "The quarter filter pushes to the lineitem scan; per-supplier "
    "revenue aggregates once; the MAX is an uncorrelated scalar "
    "subquery joined back by exact DECIMAL equality (a double compare "
    "would be engine-dependent). Ties all surface, per the spec.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast(_PRICE)
            * (F.lit(1) - F.col("l_discount").cast(_RATE))
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
                    supply_cost
    FROM costs
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size <= 15 AND p_type = 'STANDARD'
      AND supply_cost = (SELECT MIN(c2.supply_cost) FROM costs c2
                         WHERE c2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (adapted: the fixtures have no partsupp table, "
    "so lineitem plays the part-supplier cost relation with "
    "MIN(l_extendedprice) as the supply cost). The correlated "
    "min-cost-per-part subquery decorrelates to a window MIN over the "
    "part key -- one shuffle on l_partkey, reused by the window and "
    "the part join; region/nation/supplier dims are broadcast. At "
    "100 TB the costs aggregate is the only fact shuffle.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    costs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    # correlated MIN over the part -> window MIN on the grouped costs
    # (window input is already hash-partitioned by l_partkey from the
    # groupBy, so no extra exchange)
    best = (
        costs.withColumn(
            "min_cost", F.min("supply_cost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .drop("min_cost")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_type")
    )
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
        # distinct before the top-100 cut: replayed/duplicated dimension
        # rows fan the dim joins out by engine-specific multiplicities
        # (this chain reuses the region-joined supplier dim; the oracle
        # joins nation directly), and LIMIT would then cut different
        # distinct coverage -- the result is a SET under TPC-H key
        # semantics, so pin it as one (no-op on unique dims)
        .dropDuplicates()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
    SELECT l_partkey AS ps_partkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_quantity AS DECIMAL(18,4))) >
      (SELECT CAST(0.001 AS DECIMAL(8,4))
              * SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_quantity AS DECIMAL(18,4)))
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_9')
    ORDER BY part_value DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape (adapted: value = extendedprice*quantity over "
    "lineitem instead of partsupp). HAVING against a scalar subquery "
    "over the whole filtered table: computed as the sum-of-the-group-"
    "sums (exact DECIMAL, so one fact scan feeds both sides) broadcast "
    "back as a one-row threshold. All money math DECIMAL end-to-end; "
    "double only at output.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    supp_keys = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = F.sum(
        F.col("l_extendedprice").cast(_PRICE) * F.col("l_quantity").cast(_PRICE)
    ).alias("_val_dec")
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(supp_keys), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(val)
    )
    # total = sum of the per-part DECIMAL sums: exact, and reuses the
    # grouped result instead of a second fact scan
    threshold = per_part.agg(
        (F.lit("0.001").cast("decimal(8,4)") * F.sum("_val_dec")).alias("_thresh")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("_val_dec") > F.col("_thresh"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round("_val_dec", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "q20_promo_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_9', 'NATION_6')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 40)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (adapted: shipped quantity from lineitem "
    "stands in for partsupp availability). Nested IN subqueries: the "
    "part-name filter broadcast-semi-joins into the fact, a grouped "
    "HAVING picks heavy (supplier, part) pairs, and the distinct "
    "supplier set semi-joins the nation-filtered supplier dim. "
    "l_quantity is integral so the double SUM threshold is exact.",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    heavy_supps = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_6")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy_supps, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 120 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 120 DAY)
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (adapted: the fixtures lack commit/receipt "
    "dates, so 'late' = shipped >120 days after the order date). The "
    "EXISTS / NOT-EXISTS pair over the same fact decorrelates to one "
    "per-order aggregate -- distinct suppliers and distinct LATE "
    "suppliers -- joined back on o_orderkey: a line qualifies iff it "
    "is late, the order has another supplier, and it supplies the "
    "order's only late supplier. The orderkey shuffle from the "
    "orders join is reused by both the aggregate and the join-back, "
    "so the fact shuffles once; no self-join of lineitem survives.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = (
        load_table(spark, sf_dir, "orders").hint("merge")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").hint("merge").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
    )
    per_order = lines.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("nsupp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nlate"),
    )
    qualifying = lines.filter(F.col("late")).join(
        per_order.filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1)),
        "o_orderkey",
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return (
        qualifying.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "basket_pair_support",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    norders AS (SELECT COUNT(DISTINCT o) AS n FROM items),
    pf AS (SELECT p, COUNT(*) AS np FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, COUNT(*) AS n_both
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT p1, p2, n_both,
           ROUND(n_both / (SELECT CAST(n AS DOUBLE) FROM norders), 6) AS support,
           ROUND(n_both * (SELECT CAST(n AS DOUBLE) FROM norders)
                 / (f1.np * CAST(f2.np AS DOUBLE)), 4) AS lift
    FROM pairs
    JOIN pf f1 ON p1 = f1.p
    JOIN pf f2 ON p2 = f2.p
    ORDER BY n_both DESC, p1, p2
    LIMIT 20
    """,
    doc="Market-basket pair mining (association rules): top part pairs "
    "co-occurring in an order, with support and lift. The pair "
    "generation is a self-equi-join on the basket key -- pairs per "
    "basket is O(items_per_basket^2) with small baskets (TPC-H ~4), "
    "never a global cross product; the join co-partitions both sides "
    "on orderkey (one shuffle), and the part-frequency/lift factors "
    "are tiny broadcast relations. The FP-growth pre-pass a "
    "recommender pipeline runs at 100 TB.",
)
def q_basket_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    norders = items.select("o").distinct().agg(F.count(F.lit(1)).alias("n"))
    pf = items.groupBy("p").agg(F.count(F.lit(1)).alias("np"))
    # both sides of the pair join are corpus-scale (distinct basket
    # items): force the co-partitioned merge join -- small-SF stats
    # would happily broadcast one side, which is fatal at 100 TB (the
    # q4 trap, see tests/test_fact_broadcast_audit.py)
    a, b = items.alias("a"), items.hint("merge").alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(F.broadcast(pf.withColumnRenamed("p", "p1").withColumnRenamed("np", "np1")), "p1")
        .join(F.broadcast(pf.withColumnRenamed("p", "p2").withColumnRenamed("np", "np2")), "p2")
        .crossJoin(F.broadcast(norders))
        .select(
            "p1",
            "p2",
            "n_both",
            F.round(F.col("n_both") / F.col("n").cast("double"), 6).alias("support"),
            F.round(
                F.col("n_both") * F.col("n").cast("double")
                / (F.col("np1") * F.col("np2").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "p1", "p2")
        .limit(20)
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(5) OVER (ORDER BY last_order NULLS FIRST,
                            o_custkey NULLS FIRST) AS r_score,
             NTILE(5) OVER (ORDER BY frequency NULLS FIRST,
                            o_custkey NULLS FIRST) AS f_score,
             NTILE(5) OVER (ORDER BY monetary NULLS FIRST,
                            o_custkey NULLS FIRST) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    doc="RFM (recency/frequency/monetary) customer segmentation: one "
    "aggregate over orders, three NTILE(5) rankings (deterministic "
    "tiebreak on the key so both engines split ties identically), "
    "segment-cell counts out. The per-customer aggregate is "
    "map-side-combined; the NTILE windows are global sorts over the "
    "CUSTOMER relation (small relative to orders) -- at 100 TB the "
    "segmentation input is the rolled-up table, never the fact.",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    rfm = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
    )
    # NULLS FIRST pinned on every rank key (Spark's asc default, made
    # explicit; DuckDB defaults to NULLS LAST): a NULL-keyed customer
    # group or an all-NULL monetary sum must land in the same tile on
    # both engines.
    scored = rfm.select(
        "o_custkey",
        F.ntile(5)
        .over(
            W.orderBy(
                F.asc_nulls_first("last_order"), F.asc_nulls_first("o_custkey")
            )
        )
        .alias("r_score"),
        F.ntile(5)
        .over(
            W.orderBy(
                F.asc_nulls_first("frequency"), F.asc_nulls_first("o_custkey")
            )
        )
        .alias("f_score"),
        F.ntile(5)
        .over(
            W.orderBy(
                F.asc_nulls_first("monetary"), F.asc_nulls_first("o_custkey")
            )
        )
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )
