"""Skew mitigation: the salted-join rewrite must equal the plain join
on a deliberately Zipf-skewed key (one hot key holding ~90% of rows),
and must spread the hot key across all salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark.operators.scale import salted_join
from os___mapreduceframework_spark.sources import load_table
from tests.conftest import TEST_SF_DIR


def _skewed_fact(spark):
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    # hot key 0 holds ~90% of rows; remainder spread over 10k keys
    return li.select(
        F.when(F.col("l_orderkey") % 10 < 9, 0)
        .otherwise(F.col("l_orderkey") % 10000)
        .alias("k"),
        "l_quantity",
    )


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(0, 10000).select(
        F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
    )
    plain = (
        fact.join(dim, fact["k"] == dim["dk"])
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("q"),
        )
        .orderBy("grp")
        .collect()
    )
    salted = (
        salted_join(fact, dim, "k", "dk", n_salt=8)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("q"),
        )
        .orderBy("grp")
        .collect()
    )
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]


def test_salt_spreads_hot_key(spark):
    fact = _skewed_fact(spark)
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(8)).cast("int")
    )
    per_salt = (
        salted.filter(F.col("k") == 0).groupBy("__salt").count().collect()
    )
    # the hot key's rows must occupy every salt bucket, none dominant
    assert len(per_salt) == 8
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts) * 0.5
