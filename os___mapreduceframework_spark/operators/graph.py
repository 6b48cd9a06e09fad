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
    O(1) and stable under corpus growth).

    The bipartite structure makes two algebraic collapses exact, and
    both matter at 100 TB:

    - customers have NO in-edges, so their rank is the same scalar for
      every customer at every iteration -- carried as a 1-row frame,
      never a |customers| vector;
    - the per-supplier contribution sum therefore factors as
      pr_c * W(s) with W(s) = sum over in-edges of 1/deg(c) --
      ITERATION-INVARIANT, so the edge-sized shuffle runs ONCE (the
      ``W`` build) instead of once per iteration. Each iteration is
      then a 1-row dangling-mass aggregate over the supplier vector
      plus a projection over the checkpointed ``W`` -- no edge traffic.

    Edges and ``W`` are materialized once (localCheckpoint -- the
    edge-cache every production PageRank uses); the general
    non-bipartite iteration dataflow (per-iteration shuffled partial
    sums) is exercised by ``connected_components``' distributed path.

    EAGER-CONSTRUCTION CONTRACT (ADVICE r9): building this DataFrame
    runs the whole iterative recurrence -- n_iter + 1 blocking 1-row
    collects -- and bakes the resulting scalars into the returned plan
    as literals. Callers that merely construct/explain the query pay
    the full iterative cost, and re-executing the returned DataFrame
    reflects the source data AS OF construction time. Both are
    deliberate (the driver recurrence is what deleted ~60% of the
    wall); capture_plans.py documents the same caveat.
    """
    # Lazy checkpoints (round-9): lineage truncation is unchanged (the
    # plan wraps a LogicalRDD either way) but no separate driver-
    # blocking job runs per checkpoint -- the first consumer action
    # materializes them. The r8 form additionally localCheckpoint'd a
    # fresh 1-row scalars frame PER ITERATION; each of those calls
    # plans its whole subtree through Catalyst eagerly even when lazy,
    # and that driver-side planning (not cluster work) was ~60% of the
    # query's wall at sf0.1.
    e = _edges(spark, sf_dir).localCheckpoint(eager=False)
    # outdeg feeds w AND the ncust count below -- checkpoint so the
    # edge-sized groupBy runs once
    outdeg = (
        e.groupBy("c")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # iteration-invariant weighted in-degree: one edge-sized shuffle, ever
    w = (
        e.join(outdeg, "c")
        .groupBy("s")
        .agg(F.sum(F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=False)
    )
    # |distinct customers| IS the outdeg row count and |distinct
    # suppliers| the w row count (the c-join preserves every s: outdeg
    # is derived from e) -- the two extra edge-distinct shuffles the
    # r8 form paid for these counts are deleted, not deferred
    n_row = (
        outdeg.agg(F.count(F.lit(1)).alias("ncust"))
        .crossJoin(w.agg(F.count(F.lit(1)).alias("nsupp")))
        .select((F.col("ncust") + F.col("nsupp")).alias("n"))
        # an empty graph has no ranks (vs 1/0 under ANSI)
        .filter(F.col("n") > 0)
        .collect()
    )
    if not n_row:
        return w.select("s", F.lit(0.0).alias("pr_norm")).filter(F.lit(False))
    n = int(n_row[0]["n"])
    # The per-node state collapses to TWO SCALARS per iteration (base,
    # prc) plus the dangling-mass aggregate; the recurrence runs as a
    # driver loop over 1-row collects -- O(n_iter) metadata-sized
    # collects, the same device every production PageRank uses for its
    # convergence check. Arithmetic is bit-identical to the r8 frame
    # algebra: the dangling mass stays the SAME Spark sum over the same
    # prs projection (so float accumulation order is unchanged), and
    # the scalar updates are the same IEEE double expressions evaluated
    # in Python instead of a 1-row crossJoin (same operand order:
    # (1-d)/n + (d*dm)/n, base + (d*prc)*w(s), round(pr*n, 6)).
    prc = 1.0 / n
    base = 1.0 / n  # iteration-0 supplier rank is the uniform 1/n
    prs = w.select("s", (F.lit(1.0) / F.lit(n)).alias("pr"))
    for _ in range(n_iter):
        dm = prs.agg(F.sum("pr").alias("dm")).collect()[0]["dm"]
        new_base = (1.0 - d) / n + d * dm / n
        prc, base = base, new_base
        prs = w.select(
            "s",
            (F.lit(base) + F.lit(d) * F.lit(prc) * F.col("w")).alias("pr"),
        )
    return prs.select(
        "s", F.round(F.col("pr") * F.lit(n), 6).alias("pr_norm")
    )


def _oracle_pagerank(n_iter: int = N_ITER, d: float = DAMPING) -> str:
    """The recurrence unrolled as DuckDB CTEs (exact oracle) in the
    GENERAL, unfactored form: a per-node rank vector over customers AND
    suppliers, a per-iteration edge-join contribution sum, and a
    dangling-mass term derived structurally (nodes with no out-edges,
    not assumed to be 'the suppliers'). The Spark side computes the
    bipartite-FACTORED collapse (customer rank carried as a scalar,
    supplier updates through the iteration-invariant weighted in-degree
    w(s)); keeping the oracle unfactored means it independently
    validates that algebraic collapse instead of sharing its
    assumptions (ADVICE r4 item 2). Cheap at fixture scale; exact."""
    cte = [
        f"""
    e AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    nodes AS (SELECT 'c' AS side, c AS id FROM (SELECT DISTINCT c FROM e)
              UNION ALL
              SELECT 's' AS side, s AS id FROM (SELECT DISTINCT s FROM e)),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    od AS (SELECT c, COUNT(*) AS deg FROM e GROUP BY c),
    pr0 AS (SELECT side, id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    ]
    for k in range(n_iter):
        i, j = k, k + 1
        cte.append(f"""
    dg{j} AS (SELECT SUM(p.pr) AS dm
              FROM pr{i} p LEFT JOIN od ON p.side = 'c' AND p.id = od.c
              WHERE od.deg IS NULL),
    ct{j} AS (SELECT e.s AS id, SUM(p.pr / od.deg) AS contrib
              FROM e
              JOIN pr{i} p ON p.side = 'c' AND p.id = e.c
              JOIN od ON od.c = e.c
              GROUP BY e.s),
    pr{j} AS (SELECT nodes.side, nodes.id,
                     (1 - {d}) / (SELECT n FROM nn)
                   + {d} * (SELECT dm FROM dg{j}) / (SELECT n FROM nn)
                   + {d} * COALESCE(ct.contrib, 0) AS pr
              FROM nodes
              LEFT JOIN ct{j} ct ON nodes.side = 's' AND nodes.id = ct.id)""")
    return (
        "WITH "
        + ",".join(cte)
        + f"""
    SELECT id AS s, ROUND(pr * (SELECT n FROM nn), 6) AS pr_norm
    FROM pr{n_iter}
    WHERE side = 's'
    ORDER BY pr_norm DESC, s
    """
    )


@query(
    "graph_pagerank_suppliers",
    oracle=_oracle_pagerank(),
    doc="PageRank (k=3, d=0.85) over the bipartite customer->supplier "
    "purchase graph; the edge-sized shuffle runs ONCE (the iteration-"
    "invariant weighted in-degree w(s)), each iteration is one 1-row "
    "dangling-mass aggregate collected to the driver (the standard "
    "convergence-check device) feeding a scalar recurrence, and the "
    "rank vector is a projection over the checkpointed w. The oracle "
    "unrolls the GENERAL unfactored recurrence (per-node vector, "
    "per-iteration edge join) as chained CTEs, independently "
    "validating the Spark side's bipartite factoring rather than "
    "sharing its assumptions.",
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
