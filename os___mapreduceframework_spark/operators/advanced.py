"""Advanced relational surface: full outer join, correlated subqueries,
higher-order array functions, map functions, lateral explode with
ordinality, deterministic hash-sampling, union-by-name, null handling,
math functions, and an explicit (bounded) cross join.

All absent from the reference (SURVEY.md section 2.3 -- its only
operators are scan/filter/project/count/sort, Search.cpp:65-78); these
complete the engine-side checklist with Spark built-ins only. Scale
notes inline; none of these leave whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
    doc="FULL OUTER join of two pre-aggregated sides. Aggregating "
    "BEFORE the join shrinks both inputs to nation-cardinality, so the "
    "outer join shuffles ~25 rows regardless of fact size -- the "
    "pre-agg-then-join rewrite that matters at 100 TB.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c["nk"] == s["nk"], "full_outer")
        .select(
            F.coalesce(c["nk"], s["nk"]).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    doc="Correlated EXISTS. Catalyst decorrelates it into a left-semi "
    "join on the correlation key -- same plan whether written as "
    "spark.sql EXISTS or DataFrame leftsemi; the filter on orders is "
    "applied before the join so only qualifying order keys shuffle.",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # the filter is selective but unbounded (scales with the orders
    # fact), so the semi-join side must still shuffle, not broadcast
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .hint("merge")
    )
    return (
        cust.join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity > 45)
    ORDER BY p_partkey
    """,
    doc="NOT IN subquery (null-free key, so equivalent to anti join). "
    "Catalyst plans it as a left-anti join; the distinct of the "
    "subquery side happens via aggregate pushdown before the shuffle.",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # ~10% of the lineitem fact survives the filter -- far too big to
    # broadcast at scale; merge hint pins the shuffle plan
    big = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_partkey")
        .hint("merge")
    )
    return (
        part.join(big, part["p_partkey"] == big["l_partkey"], "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "higher_order_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    ORDER BY vec_id
    """,
    doc="Higher-order array functions (transform / filter / aggregate "
    "lambdas) evaluated JVM-side inside codegen -- the idiomatic "
    "replacement for a per-row Python UDF over array columns. Element "
    "order is fixed by the array, so float sums agree with the oracle "
    "bit-for-bit after float->double widening.",
)
def q_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "map_functions",
    oracle="""
    SELECT p_partkey,
           2 AS map_size,
           p_brand AS brand_val,
           CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
    FROM part
    ORDER BY p_partkey
    """,
    doc="Map-typed columns: map_from_entries/element_at/size. The map "
    "column lives only inside the plan (built and consumed JVM-side); "
    "the output is scalar so the oracle compares values, not map "
    "renderings (engines disagree on map literal formatting).",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("brand").alias("k"), F.col("p_brand").alias("v")),
            F.struct(
                F.lit("size_class").alias("k"),
                F.when(F.col("p_size") > 25, "large").otherwise("small").alias("v"),
            ),
        )
    )
    return (
        part.withColumn("m", m)
        .select(
            "p_partkey",
            F.size("m").alias("map_size"),
            F.element_at("m", "brand").alias("brand_val"),
            F.element_at("m", "size_class").alias("size_class"),
        )
        .orderBy("p_partkey")
    )


@query(
    "lateral_posexplode",
    oracle="""
    SELECT p_partkey, i - 1 AS pos, ws[i] AS word
    FROM (SELECT p_partkey, ws, unnest(range(1, len(ws) + 1)) AS i
          FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part))
    ORDER BY p_partkey, pos
    """,
    doc="posexplode: lateral expansion with ordinality. One row per "
    "array element carrying its position -- the generator runs inside "
    "codegen (Generate node), no shuffle until the later sort.",
)
def q_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
        )
        .orderBy("p_partkey", "pos")
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    ORDER BY o_orderkey
    """,
    doc="Deterministic ~12.5% sample via md5 prefix of the key -- the "
    "scale-correct sampling pattern: reproducible across engines and "
    "runs (unlike TABLESAMPLE/rand), stable under repartitioning, and "
    "executed as a pushed scan filter. Used for pipeline debugging "
    "sweeps at 100 TB where a rerun must see the same sample.",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "union_by_name",
    oracle="""
    SELECT key, name, kind FROM (
      SELECT c_custkey AS key, c_name AS name, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_suppkey AS key, s_name AS name, 'supplier' AS kind FROM supplier
    ) ORDER BY kind, key
    """,
    doc="unionByName: schema-aligned union of differently-ordered "
    "projections (column resolution by name, not position). Plain "
    "UNION ALL physically -- no shuffle, inputs concatenated "
    "partition-wise.",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    # deliberately different column order: unionByName must realign
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("key"),
    )
    return cust.unionByName(supp).orderBy("kind", "key")


@query(
    "null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 'tax_free' ELSE 'taxed'
             END AS tax_class,
           IFNULL(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    WHERE l_quantity <= 2
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Null-handling surface: nullif/coalesce/ifnull/isnull -- all "
    "fold into codegen expressions (no branches outside the generated "
    "code).",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
        F.when(F.nullif(F.col("l_tax"), F.lit(0.0)).isNull(), "tax_free")
        .otherwise("taxed")
        .alias("tax_class"),
        F.ifnull(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           ROUND(sqrt(CAST(p_retailprice AS DOUBLE)), 4) AS sqrt_price,
           ROUND(ln(CAST(p_retailprice AS DOUBLE) + 1), 4) AS ln_price,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
           abs(p_size - 25) AS size_dev,
           GREATEST(p_size, 10) AS size_floor10,
           CAST(pow(p_size % 7, 2) AS BIGINT) AS size_mod_sq
    FROM part
    ORDER BY p_partkey
    """,
    doc="Scalar math surface: sqrt/ln/ceil/floor/abs/greatest/pow/mod, "
    "rounded where irrational. All whole-stage-codegen scalar ops.",
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.sqrt(F.col("p_retailprice").cast("double")), 4).alias("sqrt_price"),
        F.round(F.log(F.col("p_retailprice").cast("double") + 1), 4).alias("ln_price"),
        F.ceil("p_retailprice").alias("ceil_price"),
        F.floor("p_retailprice").alias("floor_price"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.pow(F.col("p_size") % 7, 2).cast("bigint").alias("size_mod_sq"),
    ).orderBy("p_partkey")


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS orders_last_90d,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM orders
    WHERE o_custkey < 300
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Value-based RANGE frame (orders within the trailing 90 days -- "
    "frame bounds in seconds over the epoch sort key) and a sliding "
    "3-ROWS moving average. Both frames evaluate in one pass per "
    "partition after the single hash exchange.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w_range = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, 0)
    )
    w_rows = W.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w_range).alias("orders_last_90d"),
        F.round(F.avg("o_totalprice").over(w_rows), 4).alias("moving_avg_3"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER w AS price_quartile,
           CASE WHEN COUNT(*) OVER p = 1 THEN 0
                ELSE ((RANK() OVER w - 1) * 1000000)
                     // (COUNT(*) OVER p - 1) END AS pct_rank_ppm,
           (COUNT(*) OVER wc * 1000000) // COUNT(*) OVER p AS cume_ppm,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_in_priority
    FROM orders
    WHERE o_orderkey <= 3000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey),
           wc AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice NULLS FIRST, o_orderkey
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           p AS (PARTITION BY o_orderpriority)
    ORDER BY o_orderkey
    """,
    doc="Distribution window functions: ntile / percent_rank / "
    "cume_dist / first_value. (o_totalprice ties broken by key so both "
    "engines agree; NULL prices pinned FIRST on both engines -- Spark "
    "defaults asc to NULLS FIRST, DuckDB to NULLS LAST, so an "
    "unpinned nullable sort key silently reshuffles every rank.) The "
    "distribution ranks are emitted as EXACT parts-per-million "
    "integers -- floor((rank-1)*1e6/(n-1)) in pure integer arithmetic "
    "-- because ROUND(percent_rank, k) sits on a .5 boundary whenever "
    "(rank-1)*10^k is a half-multiple of (n-1), and the engines "
    "round halves differently (Spark half-up, DuckDB half-even); "
    "integer floor-division is bit-portable at any scale.",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderpriority").orderBy(
        F.asc_nulls_first("o_totalprice"), "o_orderkey"
    )
    wc = w.rangeBetween(W.unboundedPreceding, W.currentRow)
    p = W.partitionBy("o_orderpriority")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .withColumn("__n", F.count(F.lit(1)).over(p))
        .withColumn("__rk", F.rank().over(w).cast("long"))
        .withColumn("__cc", F.count(F.lit(1)).over(wc))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("price_quartile"),
            # `div` is Spark SQL's exact integer division -- the same
            # arithmetic as DuckDB's `//`, no double rounding anywhere
            F.expr(
                "CASE WHEN __n = 1 THEN 0L "
                "ELSE ((__rk - 1) * 1000000) div (__n - 1) END"
            ).alias("pct_rank_ppm"),
            F.expr("(__cc * 1000000) div __n").alias("cume_ppm"),
            F.first("o_orderkey").over(w).alias("cheapest_in_priority"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           len(list(n_name)) AS n_nations,
           string_agg(n_name, '|' ORDER BY n_name) AS nations_concat
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="Collection aggregates: collect_list (sorted for determinism -- "
    "shuffle arrival order is not stable) and the string_agg/listagg "
    "equivalent via array_join; surfaced as scalars because engines "
    "render array values differently. Collection aggs don't "
    "partial-combine meaningfully; keep them for dimension-sized "
    "groups only.",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
        .select(
            "n_regionkey",
            F.size("nations").alias("n_nations"),
            F.array_join("nations", "|").alias("nations_concat"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Bivariate statistical aggregates: corr / covar_samp / "
    "regr_slope. All decompose into distributive moment sums, so they "
    "partial-aggregate map-side like any SUM. Rounded: moment "
    "accumulation order differs between engines at the ulp level.",
)
def q_agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "qty_disc_covar"
            ),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "price_per_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_min_by_max_by",
    oracle="""
    SELECT o_orderpriority,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           CAST(ROUND(CAST(MAX(o_totalprice) AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Argmin/argmax aggregates (min_by/max_by): the single-pass "
    "replacement for the self-join-on-extremum anti-pattern. "
    "(o_totalprice values are unique per group in the fixtures, so the "
    "tie-unspecified semantics never bite the oracle.)",
)
def q_agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.round(F.max(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "array_set_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS w,
             list_distinct(string_split(text, ' ')) AS dw
      FROM documents
    )
    SELECT doc_id,
           len(dw) AS n_distinct,
           len(list_intersect(dw, ['the', 'a', 'of', 'and', 'to']))
             AS n_stopword_kinds,
           len(w) - len(dw) AS n_repeats
    FROM t
    ORDER BY doc_id
    """,
    doc="Per-row array set operations: array_distinct / array_intersect "
    "against a literal set -- row-local (no shuffle), codegen-resident; "
    "the relational alternative (explode + join + re-group) would "
    "shuffle the whole token stream.",
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "to"]])
    return (
        docs.select(
            "doc_id",
            F.split("text", " ").alias("w"),
            F.array_distinct(F.split("text", " ")).alias("dw"),
        )
        .select(
            "doc_id",
            F.size("dw").alias("n_distinct"),
            F.size(F.array_intersect("dw", stop)).alias("n_stopword_kinds"),
            (F.size("w") - F.size("dw")).alias("n_repeats"),
        )
        .orderBy("doc_id")
    )


@query(
    "try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN l_discount = 0 THEN NULL
                      ELSE l_extendedprice / l_discount END, 4) AS price_per_disc,
           CASE WHEN l_quantity = 0 THEN NULL
                -- trunc: Spark's double->bigint cast truncates, DuckDB's rounds
                ELSE CAST(trunc(l_extendedprice) AS BIGINT)
                     % CAST(trunc(l_quantity) AS BIGINT)
             END AS price_mod_qty
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey <= 2000
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="try_divide/try_mod: NULL-on-error arithmetic instead of "
    "fail-the-job -- the ANSI-mode-safe pattern for dirty data at "
    "scale (a single bad row must not kill a 100 TB pipeline).",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") <= 2000)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(
                F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))
            ),
            4,
        ).alias("price_per_disc"),
        F.try_mod(
            F.col("l_extendedprice").cast("bigint"),
            F.nullif(F.col("l_quantity").cast("bigint"), F.lit(0)),
        ).alias("price_mod_qty"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "cross_join_bounded",
    oracle="""
    SELECT r_name, status, COUNT(*) AS n
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
    GROUP BY r_name, status
    ORDER BY r_name, status
    """,
    doc="Explicit cross join of two bounded dimension-sized inputs "
    "(5 x 3 rows). The ONLY place a cartesian product is acceptable: "
    "both sides provably tiny. Spark plans a broadcast nested loop; "
    "every other query in this engine asserts CartesianProduct absent.",
)
def q_cross_join_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return (
        region.crossJoin(F.broadcast(status))
        .groupBy("r_name", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name", "status")
    )


@query(
    "pandas_udf_scalar_score",
    oracle="""
    SELECT event_id,
           CAST(ROUND(1.0 / (1.0 + EXP(-value / 1000.0)), 6) AS DOUBLE) AS score
    FROM events
    WHERE event_id % 20 = 0
    ORDER BY event_id
    """,
    doc="Scalar Arrow-vectorized @pandas_udf (the charter's named UDF "
    "tier between built-ins and mapInPandas): numpy tanh over Arrow "
    "batches -- one Python call per batch, never per row. Registered "
    "to pin the full UDF-surface matrix alongside the UDTF "
    "(udtf_search_count), grouped applyInPandas (compat API), and "
    "mapInPandas (multimodal) paths; built-ins remain the default hot "
    "path everywhere else. Deterministic sigmoid, so the oracle "
    "matches to 6 decimals.",
)
def q_pandas_udf_scalar_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid_score(v: pd.Series) -> pd.Series:
        x = v.to_numpy(dtype="float64") / 1000.0
        return pd.Series(1.0 / (1.0 + np.exp(-x)))

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") % 20 == 0)
        .select(
            "event_id",
            F.round(sigmoid_score(F.col("value").cast("double")), 6).alias("score"),
        )
        .orderBy("event_id")
    )


@query(
    "pandas_udaf_weighted_mean",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(SUM(o_totalprice * (o_orderkey % 5 + 1))
                 / SUM(CASE WHEN o_totalprice IS NOT NULL
                       THEN o_orderkey % 5 + 1 END), 4) AS DOUBLE)
             AS w_mean_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Grouped-aggregate @pandas_udf (the UDAF tier: whole group in, "
    "scalar out, Arrow-batched) computing a weighted mean per order "
    "priority. Completes the registered UDF matrix: built-ins, scalar "
    "pandas_udf, grouped-agg pandas_udf (this), UDTF, grouped "
    "applyInPandas, mapInPandas. Note the aggregation state is the "
    "GROUP's rows (unlike built-in partial aggs) -- fine for bounded "
    "groups, and the reason the built-in sum/sum form is preferred in "
    "hot paths at 100 TB.",
)
def q_pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, weight: pd.Series) -> float:
        # SQL-aggregate NULL contract: a NULL price contributes neither
        # numerator nor weight (pandas would otherwise smuggle it in as
        # NaN and poison the whole group's mean).
        p = price.to_numpy(dtype="float64")
        w = weight.to_numpy(dtype="float64")
        keep = ~np.isnan(p)
        if not keep.any():
            return None
        return float(np.average(p[keep], weights=w[keep]))

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
        (F.col("o_orderkey") % 5 + 1).cast("double").alias("weight"),
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(weighted_mean("price", "weight"), 4).alias("w_mean_price")
        )
        .orderBy("o_orderpriority")
    )


@query(
    "arrow_map_doc_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="mapInArrow path (the last Python-UDF surface in the matrix: "
    "UDTF, scalar pandas_udf, grouped-agg UDAF, applyInPandas, "
    "mapInPandas, and now raw-Arrow batches): per-doc token/char "
    "counts computed with pyarrow.compute kernels directly on the "
    "RecordBatch -- no pandas materialization at all, the cheapest "
    "possible Python hop (zero-copy Arrow in, vectorized C++ kernels, "
    "Arrow out). The semantics are deliberately built-in-expressible "
    "so the oracle is exact; the point is the API path and its batch "
    "shape, which the heavier custom kernels (multimodal decodes) "
    "build on.",
)
def q_arrow_map_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.split_pattern(batch.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_chars"],
            )

    return docs.mapInArrow(
        stats, schema="doc_id long, n_tokens bigint, n_chars bigint"
    ).orderBy("doc_id")
