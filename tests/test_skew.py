"""Skew mitigation: the salted-join rewrite must equal the plain join
on a deliberately Zipf-skewed key (one hot key holding ~90% of rows),
and must spread the hot key across all salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark.operators.scale import (
    hot_isolated_join,
    hot_key_fanout,
    salted_join,
    salted_join_adaptive,
)
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


def test_adaptive_salted_join_equals_plain_join(spark):
    """Sketch-driven fan-out must not change the join result on the
    Zipf-skewed fact (hot key ~90% of rows, 10k-key cold tail)."""
    fact = _skewed_fact(spark)
    dim = spark.range(0, 10000).select(
        F.col("id").alias("dk"), (F.col("id") % 7).alias("grp")
    )

    def summarize(j):
        return [
            tuple(r)
            for r in j.groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("q"),
            )
            .orderBy("grp")
            .collect()
        ]

    plain = summarize(fact.join(dim, fact["k"] == dim["dk"]))
    adaptive = summarize(salted_join_adaptive(fact, dim, "k", "dk"))
    assert adaptive == plain


def test_adaptive_join_dim_replication_is_heat_proportional(spark):
    """Only the Zipf head is replicated: the hot key's dim row fans out
    >1, cold keys stay single, and total dim inflation is far below the
    blanket n_salt factor."""
    fact = _skewed_fact(spark)
    hot = hot_key_fanout(fact, "k").collect()
    fanout = {r["k"]: r["fanout"] for r in hot}
    assert fanout.get(0, 1) > 1, f"hot key not fanned out: {fanout}"
    assert all(f <= 32 for f in fanout.values())
    # the sketch must not promote the cold tail: head is a tiny subset
    assert len(fanout) < 100, f"sketch promoted {len(fanout)} keys"
    n_dim = 10000
    inflation = (n_dim - len(fanout)) + sum(fanout.values())
    assert inflation < 8 * n_dim * 0.2, inflation


def test_hot_isolated_join_equals_plain_join(spark):
    """Hot-hot skew: both sides share the hot key. The isolation
    rewrite (hot keys -> broadcast branch, cold keys -> shuffle branch,
    disjoint union) must equal the plain inner join."""
    fact = _skewed_fact(spark)
    # right side also carries the hot key plus a cold tail slice
    right = (
        load_table(spark, TEST_SF_DIR, "orders")
        .filter((F.col("o_orderkey") % 100).isin(0, 9))
        .select(
            F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("o_orderkey") % 10000)
            .alias("rk"),
            (F.col("o_orderkey") % 7).alias("grp"),
        )
    )

    def summarize(j):
        return [
            tuple(r)
            for r in j.groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("q"),
            )
            .orderBy("grp")
            .collect()
        ]

    plain = summarize(fact.join(right, fact["k"] == right["rk"]))
    isolated = summarize(hot_isolated_join(fact, right, "k", "rk"))
    assert isolated == plain
    # both branches must carry rows: hot key present on both sides,
    # and at least one cold key matches too
    hot_rows = fact.filter(F.col("k") == 0).count()
    assert hot_rows > 0 and right.filter(F.col("rk") == 0).count() > 0
    cold_match = (
        fact.filter(F.col("k") != 0)
        .join(right.filter(F.col("rk") != 0), F.col("k") == F.col("rk"))
        .count()
    )
    assert cold_match > 0, "cold branch empty -- test data too weak"


def test_hot_isolated_join_plan_shape(spark):
    """The executed plan must contain BOTH a broadcast join (hot
    branch) and a shuffle join (cold branch, merge-hinted) -- the whole
    point of the rewrite is that the hot mass avoids the shuffle."""
    fact = _skewed_fact(spark)
    right = (
        load_table(spark, TEST_SF_DIR, "orders")
        .filter((F.col("o_orderkey") % 100).isin(0, 9))
        .select(
            F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("o_orderkey") % 10000)
            .alias("rk"),
            (F.col("o_orderkey") % 7).alias("grp"),
        )
    )
    j = hot_isolated_join(fact, right, "k", "rk")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]


def test_hot_isolated_join_size_guard_falls_back_to_salted(spark):
    """With broadcast_rows_max=0 the guard must refuse the broadcast:
    the hot branch becomes a salted shuffle join, the result is still
    the plain join, and no raw fact scan sits under a broadcast."""
    from os___mapreduceframework_spark.plans.audit import raw_fact_broadcasts

    fact = _skewed_fact(spark)
    right = (
        load_table(spark, TEST_SF_DIR, "orders")
        .filter((F.col("o_orderkey") % 100).isin(0, 9))
        .select(
            F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("o_orderkey") % 10000)
            .alias("rk"),
            (F.col("o_orderkey") % 7).alias("grp"),
        )
    )
    guarded = hot_isolated_join(fact, right, "k", "rk", broadcast_rows_max=0)
    plain = fact.join(right, fact["k"] == right["rk"])
    got = sorted(tuple(r) for r in guarded.select("k", "grp", "l_quantity").collect())
    want = sorted(tuple(r) for r in plain.select("k", "grp", "l_quantity").collect())
    assert got == want
    offenders = raw_fact_broadcasts(guarded, ("lineitem", "orders.parquet"))
    assert not offenders, offenders


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


def test_lsh_hot_bucket_guard_bounds_pairs_and_keeps_connectivity(spark):
    """VERDICT r4 item 4: a degenerate LSH bucket (constant corpus --
    every doc shares every band signature) must not go quadratic. With
    n identical docs and cap c, per-band pair count is bounded by
    ceil(n/c) * C(c,2) + ceil(n/c) - 1 (sub-cliques + bridges), far
    below C(n,2) -- and the bucket stays ONE connected component, so
    clustering semantics survive the cap."""
    from os___mapreduceframework_spark.operators.dedup import connected_components
    from os___mapreduceframework_spark.operators.minhash import (
        band_signatures,
        bucket_pairs,
        lsh_candidates,
    )

    n, cap = 120, 16
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the corpus").alias("text"),
    )
    pairs = lsh_candidates(docs, cap=cap).collect()
    n_sub = -(-n // cap)  # ceil
    per_bucket_bound = n_sub * (cap * (cap - 1) // 2) + (n_sub - 1)
    # identical docs share all 4 band buckets; pairs are deduped across
    # bands, so the distinct-pair bound is the single-bucket bound
    assert 0 < len(pairs) <= per_bucket_bound
    assert len(pairs) < n * (n - 1) // 2, "guard did not engage"
    # connectivity: the capped pair graph must span one component
    cand = lsh_candidates(docs, cap=cap)
    cc = connected_components(cand, src="doc_a", dst="doc_b")
    assert cc.select("cluster_id").distinct().count() == 1

    # well-distributed data (groups <= cap) is bit-identical to the
    # unguarded all-pairs join
    sigs = band_signatures(docs.filter(F.col("doc_id") < 5))
    guarded = bucket_pairs(sigs, "doc_id", ("band", "sig"), cap=1000)
    a, b = sigs.alias("a"), sigs.alias("b")
    plain = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(map(tuple, plain.collect()))
