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


def test_watermark_bounds_streaming_state(spark):
    """Soak: a windowed aggregation over an unbounded deterministic
    rate-micro-batch source must keep state-store rows bounded -- the
    watermark evicts closed windows. Without eviction, state rows grow
    linearly with batches (the 100 TB leak)."""
    import time as _time

    from pyspark.sql import functions as F

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "1000")
        .option("numPartitions", "2")
        .option("startTimestamp", "0")
        .option("advancePerBatch", "1000")  # 1s of event time per batch
        .load()
    )
    agg = (
        src.withWatermark("timestamp", "2 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("noop")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 25
        batches = 0
        while _time.time() < deadline and batches < 12:
            _time.sleep(1)
            p = q.lastProgress
            if p:
                batches = p["batchId"]
        p = q.lastProgress
        assert p is not None and batches >= 6, f"only {batches} batches ran"
        state_rows = p["stateOperators"][0]["numRowsTotal"]
        # ~1 open window + <=2s watermark lag; linear growth would give
        # >= batches rows. Bound generously but sub-linearly.
        assert state_rows <= 6, f"state leaked: {state_rows} rows after {batches} batches"
    finally:
        q.stop()


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join rewrite must actually fire on a hot key: the
    final adaptive plan carries SortMergeJoin(skew=true), meaning the
    oversized reduce partition was split at mapper granularity instead
    of serializing one straggler task. Thresholds are scaled down to
    fixture size (the 100 TB defaults are 256m/5x); the fact side gets
    a round-robin repartition first because AQE can only split a skewed
    partition along mapper boundaries -- a single-mapper shuffle (one
    small parquet split) is unsplittable and AQE correctly declines."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = (
            _skewed_fact(spark)
            .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(20))))
            .repartition(8)
        )
        dim = spark.range(0, 10000, 1, 4).select(
            F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
        )
        j = fact.join(dim, fact["k"] == dim["dk"])
        n = j.count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # the rewrite must not change results: every fact row joins once
        expected = fact.count()
        assert n == expected, (n, expected)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
