"""Scale-pattern tests: salted aggregation equivalence, SQL-interface
parity, IVF ANN structure + recall vs the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.operators.scale import (
    ADAPT_MAX_SALT,
    ADAPT_TARGET,
    IVF_PROBE,
    IVF_TOP_K,
    N_QUERIES,
    hot_key_fanout,
    ivf_detail_topk,
    ivf_index,
    ivf_sampled_detail_topk,
)
from os___mapreduceframework_spark.sources import load_table
from tests.conftest import TEST_SF_DIR

ALL = registry.queries()


def test_salted_count_equals_direct_groupby(spark):
    salted = ALL["salted_token_count"](spark, TEST_SF_DIR).collect()
    direct = (
        load_table(spark, TEST_SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(50)
        .collect()
    )
    assert [tuple(r) for r in salted] == [tuple(r) for r in direct]


def test_adaptive_salted_count_equals_direct_groupby(spark):
    adaptive = ALL["salted_token_count_adaptive"](spark, TEST_SF_DIR).collect()
    direct = (
        load_table(spark, TEST_SF_DIR, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(50)
        .collect()
    )
    assert [tuple(r) for r in adaptive] == [tuple(r) for r in direct]


def test_hot_key_fanout_targets_only_the_zipf_head(spark):
    """The sketch must flag the genuinely hot tokens with a fan-out
    proportional to frequency, and must NOT flag the long tail -- the
    whole point vs fixed-N_SALT is zero extra groups for cold keys."""
    toks = load_table(spark, TEST_SF_DIR, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    hot = {r["tok"]: r["fanout"] for r in hot_key_fanout(toks, "tok").collect()}
    true_counts = {
        r["tok"]: r["n"]
        for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_toks = len(true_counts)
    assert 0 < len(hot) < n_toks, "sketch must select a strict subset"
    for tok, fanout in hot.items():
        assert 2 <= fanout <= ADAPT_MAX_SALT
        # a 1/8 sample estimate is noisy but a flagged key must be at
        # least in the neighborhood of the target
        assert true_counts[tok] > ADAPT_TARGET / 2, (tok, true_counts[tok])
    # the hottest token must be flagged with a frequency-scaled fan-out
    top_tok, top_n = max(true_counts.items(), key=lambda kv: kv[1])
    assert top_tok in hot
    assert hot[top_tok] >= max(2, (top_n // ADAPT_TARGET) // 2)


def test_adaptive_salting_spreads_hot_key_partials(spark):
    """Under the hood the hot token's partial agg must occupy >1
    (tok, salt) group while an unflagged cold token occupies exactly 1."""
    toks = load_table(spark, TEST_SF_DIR, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    hot = hot_key_fanout(toks, "tok")
    salted = (
        toks.join(F.broadcast(hot), "tok", "left")
        .withColumn(
            "salt",
            F.pmod(F.xxhash64("doc_id"), F.coalesce("fanout", F.lit(1))).cast("int"),
        )
        .groupBy("tok", "salt")
        .agg(F.count(F.lit(1)).alias("pn"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )
    groups = {r["tok"]: r["n_groups"] for r in salted.collect()}
    hot_set = {r["tok"] for r in hot.collect()}
    assert hot_set, "fixtures must produce at least one hot token"
    for tok in hot_set:
        assert groups[tok] > 1, f"hot token {tok!r} was not spread"
    for tok, n_groups in groups.items():
        if tok not in hot_set:
            assert n_groups == 1, f"cold token {tok!r} was salted"


def test_ivf_assignment_covers_corpus(spark):
    emb = load_table(spark, TEST_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    assignments, centroids = ivf_index(emb)
    n_vecs = emb.count()
    assert assignments.count() == n_vecs, "every vector must land in a cell"
    cells = {r["cell"] for r in assignments.select("cell").distinct().collect()}
    assert cells <= set(range(8))
    assert centroids.count() == 8


def test_ivf_topk_structure_and_recall(spark):
    """Each query returns <= k neighbors, never itself; recall vs the
    exact brute-force top-k must beat the random-selection floor
    (IVF_PROBE/IVF_K of the corpus scanned -- uniform fixtures are the
    ANN worst case, so the floor is the honest bound)."""
    ivf = ivf_detail_topk(spark, TEST_SF_DIR).collect()
    exact = ALL["ann_bruteforce_topk"](spark, TEST_SF_DIR).collect()

    per_query: dict[int, list] = {}
    for r in ivf:
        per_query.setdefault(r["query_id"], []).append(r)
    assert set(per_query) <= set(range(N_QUERIES))
    for qid, rows in per_query.items():
        assert len(rows) <= IVF_TOP_K
        assert all(r["vec_id"] != qid for r in rows)
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(
        len({r["vec_id"] for r in rows} & exact_sets.get(qid, set()))
        for qid, rows in per_query.items()
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total if total else 0.0
    # random floor ~ IVF_PROBE/IVF_K = 0.25 in expectation; assert a
    # loose lower bound that still catches a broken index join
    assert recall >= 0.05, f"IVF recall {recall:.2f} below sanity floor"


def test_ivf_registered_audit_contract(spark):
    """The registered IVF queries return the one-row audit contract
    (counts + boolean flags) with every flag true at this SF."""
    for name in ("ann_ivf_topk", "ann_ivf_sampled_topk"):
        rows = ALL[name](spark, TEST_SF_DIR).collect()
        assert len(rows) == 1, name
        r = rows[0]
        assert r["n_queries"] == N_QUERIES, (name, r)
        assert r["within_k"] and r["no_self"] and r["recall_ok"], (name, r)


def test_sql_interface_same_plan_shape(spark):
    df = ALL["sql_interface_revenue"](spark, TEST_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "FileScan parquet" in plan


def test_ivf_sampled_training_recall_drift(spark):
    """Sample-trained IVF must keep full coverage (every vector in a
    cell) and its recall vs brute force must stay within the same
    sanity floor as full-corpus training -- centroid quality degrades
    gracefully, it doesn't collapse."""
    sampled = ivf_sampled_detail_topk(spark, TEST_SF_DIR).collect()
    exact = ALL["ann_bruteforce_topk"](spark, TEST_SF_DIR).collect()

    per_query: dict[int, list] = {}
    for r in sampled:
        per_query.setdefault(r["query_id"], []).append(r)
    assert per_query, "sampled IVF returned nothing"
    for qid, rows in per_query.items():
        assert len(rows) <= IVF_TOP_K
        assert all(r["vec_id"] != qid for r in rows)

    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(
        len({r["vec_id"] for r in rows} & exact_sets.get(qid, set()))
        for qid, rows in per_query.items()
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total if total else 0.0
    assert recall >= 0.05, f"sampled-IVF recall {recall:.2f} below floor"
