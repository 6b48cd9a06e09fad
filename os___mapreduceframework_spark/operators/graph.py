"""Iterative graph analytics over the purchase graph (charter extension).

The reference framework's multi-round shuffle loop (client code re-runs
``RunMapReduceFramework`` per round; MapReduceFramework.cpp:420-442 runs
one map/shuffle/reduce cycle) is the execution shape of iterative graph
algorithms. Near-dup clustering already covers connected components
(dedup.py); this module adds PageRank over the bipartite
customer->supplier purchase graph (edges = distinct (o_custkey,
l_suppkey) pairs through orders |><| lineitem).

Spark-first formulation -- each iteration is pure DataFrame algebra:

- contributions: edges equi-join current ranks, SUM per destination
  (one shuffle on supplier key, map-side combined);
- dangling mass (suppliers have no out-edges): a 1-row aggregate
  cross-joined back in (broadcast nested loop of one row -- no
  driver-side collect of rank values between iterations);
- the iteration count is fixed (k=3) and unrolled, so the DuckDB oracle
  is the same recurrence unrolled as chained CTEs -- an *exact* oracle
  for an "iterative, non-SQL-expressible" algorithm.

Scale notes (100 TB): edges are the big table; they are materialized
once (localCheckpoint -- the edge-cache every production PageRank
uses) and each iteration shuffles only (dst, contribution) partials.
Rank vectors are |nodes|-sized (small relative to edges) and
checkpointed per iteration so every job's plan is one iteration deep
-- without this the fully-lazy unroll re-derives the edge join inside
each iteration and the plan grows ~100x Exchanges by k=3 (measured;
the pattern dedup_near_clusters pins for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

DAMPING = 0.85
N_ITER = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fact-fact join: merge-hinted so neither raw scan broadcasts
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .hint("merge")
    )
    lineitem = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .hint("merge")
    )
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )


def pagerank_suppliers(
    spark: SparkSession, sf_dir: str, n_iter: int = N_ITER, d: float = DAMPING
) -> DataFrame:
    """PageRank over the bipartite purchase graph; returns one row per
    supplier node with its rank normalized by |nodes| (so values are
    O(1) and stable under corpus growth)."""
    # Materialize the per-iteration inputs once (localCheckpoint): the
    # naive fully-lazy unroll re-derives the edge join inside every
    # iteration's contribution aggregate and the plan grows ~100x
    # Exchanges by k=3. Caching the edge relation is what every
    # production PageRank does; rank vectors are checkpointed per
    # iteration to keep each job's plan one-iteration deep.
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    outdeg = e.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
    nc = e.select("c").distinct()
    ns = e.select("s").distinct()
    n_nodes = (
        nc.agg(F.count(F.lit(1)).alias("ncust"))
        .crossJoin(ns.agg(F.count(F.lit(1)).alias("nsupp")))
        .select((F.col("ncust") + F.col("nsupp")).alias("n"))
        .localCheckpoint(eager=True)  # 1 row
    )
    prc = nc.crossJoin(n_nodes).select("c", (F.lit(1.0) / F.col("n")).alias("pr"))
    prs = ns.crossJoin(n_nodes).select("s", (F.lit(1.0) / F.col("n")).alias("pr"))
    ew = e.join(outdeg, "c").localCheckpoint(eager=True)  # (c, s, deg)
    for _ in range(n_iter):
        contrib = (
            ew.join(prc, "c")
            .groupBy("s")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("m"))
        )
        dang = prs.agg(F.sum("pr").alias("dm"))
        base = F.lit(1.0 - d) / F.col("n") + F.lit(d) * F.col("dm") / F.col("n")
        prc = (
            prc.select("c")
            .crossJoin(n_nodes)
            .crossJoin(dang)
            .select("c", base.alias("pr"))
            .localCheckpoint(eager=True)
        )
        prs = (
            prs.select("s")
            .join(contrib, "s", "left")
            .crossJoin(n_nodes)
            .crossJoin(dang)
            .select(
                "s", (base + F.lit(d) * F.coalesce("m", F.lit(0.0))).alias("pr")
            )
            .localCheckpoint(eager=True)
        )
    return prs.crossJoin(n_nodes).select(
        "s", F.round(F.col("pr") * F.col("n"), 6).alias("pr_norm")
    )


def _oracle_pagerank(n_iter: int = N_ITER, d: float = DAMPING) -> str:
    """The same recurrence unrolled as DuckDB CTEs (exact oracle)."""
    cte = [
        """
    e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    od AS (SELECT c, COUNT(*) AS deg FROM e GROUP BY c),
    nc AS (SELECT DISTINCT c FROM e),
    ns AS (SELECT DISTINCT s FROM e),
    nn AS (SELECT (SELECT COUNT(*) FROM nc) + (SELECT COUNT(*) FROM ns) AS n),
    p0c AS (SELECT c, 1.0 / (SELECT n FROM nn) AS pr FROM nc),
    p0s AS (SELECT s, 1.0 / (SELECT n FROM nn) AS pr FROM ns)"""
    ]
    for k in range(n_iter):
        i, j = k, k + 1
        cte.append(f"""
    ct{j} AS (SELECT e.s, SUM(p.pr / od.deg) AS m
              FROM e JOIN p{i}c p USING (c) JOIN od USING (c) GROUP BY e.s),
    dg{j} AS (SELECT SUM(pr) AS dm FROM p{i}s),
    p{j}c AS (SELECT c, (1 - {d}) / (SELECT n FROM nn)
                 + {d} * (SELECT dm FROM dg{j}) / (SELECT n FROM nn) AS pr
              FROM p{i}c),
    p{j}s AS (SELECT p.s, (1 - {d}) / (SELECT n FROM nn)
                 + {d} * ((SELECT dm FROM dg{j}) / (SELECT n FROM nn)
                          + COALESCE(ct.m, 0)) AS pr
              FROM p{i}s p LEFT JOIN ct{j} ct USING (s))""")
    return (
        "WITH "
        + ",".join(cte)
        + f"""
    SELECT s, ROUND(pr * (SELECT n FROM nn), 6) AS pr_norm
    FROM p{n_iter}s
    ORDER BY pr_norm DESC, s
    """
    )


@query(
    "graph_pagerank_suppliers",
    oracle=_oracle_pagerank(),
    doc="PageRank (k=3, d=0.85) over the bipartite customer->supplier "
    "purchase graph; per-iteration dataflow is one shuffled partial-sum "
    "on the destination key plus two 1-row broadcast aggregates "
    "(|nodes|, dangling mass); edges and rank vectors localCheckpoint "
    "per iteration (lineage truncation). The "
    "oracle unrolls the identical recurrence as chained CTEs, making an "
    "iterative algorithm exactly SQL-checkable.",
)
def q_graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_suppliers(spark, sf_dir).orderBy(
        F.col("pr_norm").desc(), "s"
    )


@query(
    "graph_degree_stats",
    oracle="""
    WITH e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    cd AS (SELECT c, COUNT(*) AS deg FROM e GROUP BY c),
    sd AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY s)
    SELECT 'customer_out' AS side, deg, COUNT(*) AS n_nodes
    FROM cd GROUP BY deg
    UNION ALL
    SELECT 'supplier_in' AS side, deg, COUNT(*) AS n_nodes
    FROM sd GROUP BY deg
    ORDER BY side, deg
    """,
    doc="Degree histogram of the purchase graph, both sides -- the "
    "skew-detection pre-pass for any graph job (a power-law in-degree "
    "means the contribution aggregation needs salting at scale). Two "
    "map-side-combined aggregations, output size = distinct degrees.",
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    cd = (
        e.groupBy("c").agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.lit("customer_out").alias("side"), "deg", "n_nodes")
    )
    sd = (
        e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.lit("supplier_in").alias("side"), "deg", "n_nodes")
    )
    return cd.unionByName(sd).orderBy("side", "deg")
