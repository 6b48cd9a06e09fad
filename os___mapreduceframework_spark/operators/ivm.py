"""Incremental view maintenance: refresh a materialized aggregate from
the change feed, never re-scanning the base table (charter extension:
the 100 TB pattern where full recompute is the thing you cannot afford).

A materialized view ``M = SELECT key, COUNT(*), SUM(x) GROUP BY key``
over a snapshot table is maintained across a merge by applying only the
table's change feed: inserts add ``(+1, +x)``, deletes add
``(-1, -x_before)``, updates add ``(0, x - x_before)`` -- the classic
delta-rule for distributive aggregates (SUM/COUNT; MIN/MAX need the
over-key re-aggregate, AVG derives from SUM/COUNT). The refresh cost is
O(|delta|), not O(|table|): at 100 TB with a per-mille daily churn this
is the difference between re-reading 100 TB and reading ~100 GB of
change rows.

The change feed comes from ``SnapshotMergeTable.changes(before_image=
True)`` -- before-images are exactly what upsert replay lacks and view
maintenance needs (an update must SUBTRACT its old contribution).
Money sums run in DECIMAL end-to-end (order-independent, exact), per
the registry-wide convention.

The registered query maintains the view across a real merge and
returns M1; the oracle recomputes the same aggregate from the post-
merge state relationally -- so a wrong delta sign, a missed update, or
a double-counted insert all break the hash match.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.scratch import scratch_dir as _scratch
from os___mapreduceframework_spark.sources import load_table

_DEC = "decimal(18,2)"


def maintain_sum_count(
    view: DataFrame, cdf: DataFrame, key: str, col: str
) -> DataFrame:
    """Apply a before-image change feed to a (key, n, total) view.

    ``view`` columns: key, ``n`` (count), ``total`` (decimal sum of
    ``col``). ``cdf`` is ``changes(..., before_image=True)`` output.
    Returns the refreshed view; keys whose count reaches 0 drop out.

    Updates must not move a row across view keys (a key-changing
    update would need splitting into delete+insert before this rule).
    """
    after = F.col(col).cast(_DEC)
    before = F.col(f"{col}__before").cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    # the view key may itself be a VALUE column of the table (here:
    # custkey on an orderkey-keyed table); delete rows carry it only in
    # the before-image, so group on after-image coalesced with before
    key_expr = (
        F.coalesce(F.col(key), F.col(f"{key}__before")).alias(key)
        if f"{key}__before" in cdf.columns
        else F.col(key)
    )
    delta = (
        cdf.select(
            key_expr,
            F.when(F.col("change_type") == "insert", F.lit(1))
            .when(F.col("change_type") == "delete", F.lit(-1))
            .otherwise(F.lit(0))
            .alias("dn"),
            F.when(F.col("change_type") == "insert", after)
            .when(F.col("change_type") == "delete", -before)
            .otherwise(after - before)
            .alias("dx"),
        )
        .groupBy(key)
        .agg(F.sum("dn").alias("dn"), F.sum("dx").cast(_DEC).alias("dx"))
    )
    return (
        view.join(delta, key, "full_outer")
        .select(
            key,
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce(F.col("total"), zero) + F.coalesce(F.col("dx"), zero))
            .cast(_DEC)
            .alias("total"),
        )
        .filter(F.col("n") > 0)
    )


@query(
    "ivm_revenue_by_customer",
    oracle="""
    WITH src AS (
      -- IVM maintainability contract: a NULL price ingests as 0. The
      -- (count, sum) maintained state cannot represent SQL's
      -- SUM-of-all-NULL = NULL (that needs a separate non-null
      -- counter), so NULL measurements are pinned to 0 at ingestion
      -- on BOTH engines.
      SELECT o_orderkey, o_custkey, COALESCE(o_totalprice, 0) AS o_totalprice
      FROM orders
    ),
    state AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
                  THEN CAST(o_totalprice * 2 AS DECIMAL(18,2))
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      FROM src
      WHERE o_orderkey % 11 <> 0
    )
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
    FROM state
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="Incremental view maintenance of revenue-by-customer across a "
    "merge that inserts (keys %7==0), updates (price doubled for "
    "pre-existing %5==0 keys -- fp-exact), and deletes (%11==0): the "
    "view is refreshed ONLY from the before-image change feed "
    "(O(|delta|)), never re-scanning the table; the oracle recomputes "
    "the post-merge aggregate from scratch, so a wrong delta sign, a "
    "missed update, or a double-counted insert breaks the hash match. "
    "DECIMAL sums end-to-end.",
)
def q_ivm_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from os___mapreduceframework_spark.sinks.snapshot_table import (
        SnapshotMergeTable,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        # NULL price ingests as 0 (see the oracle's src CTE): the
        # maintained (count, sum) state has no NULL-sum representation.
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("o_totalprice"),
    )
    path = _scratch("ivm_revenue_by_customer")
    shutil.rmtree(path, ignore_errors=True)  # idempotent per invocation
    table = SnapshotMergeTable(spark, path, keys=["o_orderkey"], n_buckets=16)
    k = F.col("o_orderkey")
    # v0: inserts-to-be (%7==0) absent
    table.overwrite(orders.filter(k % 7 != 0))
    # one merge to v1: insert %7==0, double price of pre-existing
    # %5==0, delete %11==0. Delete keys ride in the updates frame so
    # their buckets count as affected (merge() derives the touched-
    # bucket set from the updates frame); merge_fn then filters them.
    updates = orders.filter((k % 7 == 0) | (k % 5 == 0) | (k % 11 == 0)).select(
        "o_orderkey",
        "o_custkey",
        F.when((k % 5 == 0) & (k % 7 != 0), F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )

    def merge_fn(existing: DataFrame, updates_df: DataFrame) -> DataFrame:
        merged = existing.join(
            updates_df, ["o_orderkey"], "left_anti"
        ).unionByName(updates_df)
        return merged.filter(F.col("o_orderkey") % 11 != 0)

    table.merge(updates, merge_fn=merge_fn)
    # the materialized view at v0, then the O(|delta|) refresh
    m0 = (
        table.read(version=0)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast(_DEC).alias("total"),
        )
    )
    cdf = table.changes(0, 1, before_image=True)
    m1 = maintain_sum_count(m0, cdf, "o_custkey", "o_totalprice")
    return m1.select(
        "o_custkey",
        F.col("n").alias("n_orders"),
        F.col("total").cast("double").alias("revenue"),
    ).orderBy("o_custkey")
