"""Physical-plan audits: the plans we designed for are the plans Spark
actually runs (pushdown, broadcast, no cartesian blowups, partial
aggregation). 100 TB design assertions, checked at any SF."""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.plans.audit import assert_plan, executed_plan
from os___mapreduceframework_spark.sources import load_table
from tests.conftest import TEST_SF_DIR

ALL = registry.queries()


def test_filter_and_projection_push_into_scan(spark):
    df = ALL["filter_project_pushdown"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    # pruned ReadSchema: only the 4 referenced columns are read
    assert "l_orderkey" in scan and "l_comment" not in scan
    read_schema = scan.split("ReadSchema: ")[1]
    n_cols = read_schema.count(":")
    assert n_cols == 4, f"scan reads {n_cols} columns, want 4: {read_schema[:300]}"
    assert "PushedFilters: []" not in plan


def test_dim_joins_are_broadcast(spark):
    df = ALL["join_broadcast_dims"](spark, TEST_SF_DIR)
    assert_plan(df, contains=("BroadcastHashJoin",), absent=("CartesianProduct",))


def test_topk_avoids_global_sort(spark):
    df = ALL["topk_orders"](spark, TEST_SF_DIR)
    assert_plan(df, contains=("TakeOrderedAndProject",))


def test_q1_partial_aggregation(spark):
    """partial_ prefix in HashAggregate functions = map-side combine."""
    df = ALL["q1_pricing_summary"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "partial_" in plan, plan[:2000]


def test_lsh_candidates_no_cartesian(spark):
    """The LSH pair join must be an equi-join on (band, sig), never a
    cartesian product -- the whole point of banding."""
    df = ALL["dedup_minhash_pairs"](spark, TEST_SF_DIR)
    assert_plan(df, absent=("CartesianProduct",))


def test_range_join_no_cartesian(spark):
    df = ALL["range_join_bucketed"](spark, TEST_SF_DIR)
    assert_plan(df, absent=("CartesianProduct", "BroadcastNestedLoopJoin"))


def test_q3_broadcasts_customer_side(spark):
    """The filtered customer dim must broadcast -- the orders/lineitem
    fact sides never shuffle for a dim join."""
    df = ALL["q3_shipping_priority"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan, "top-10 must not be a global sort"


def test_q5_star_join_no_cartesian(spark):
    df = ALL["q5_local_supplier_volume"](spark, TEST_SF_DIR)
    assert_plan(df, contains=("BroadcastHashJoin",), absent=("CartesianProduct",))


def test_q6_filters_reach_scan(spark):
    df = ALL["q6_forecast_revenue"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    scan = next(line for line in plan.splitlines() if "FileScan parquet" in line)
    read_schema = scan.split("ReadSchema: ")[1]
    assert read_schema.count(":") == 4, read_schema[:300]
    assert "PushedFilters: []" not in plan


def test_exists_decorrelates_to_semi_join(spark):
    df = ALL["subquery_exists"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "LeftSemi" in plan or "ExistenceJoin" in plan, plan[:2000]


def test_partitioned_write_prunes_on_read(spark):
    """Hive-layout write + predicate on the partition column = directory
    pruning (PartitionFilters), not a data filter over all files."""
    from os___mapreduceframework_spark.sources.formats import (
        partitioned_scan_for_audit,
    )

    df = partitioned_scan_for_audit(spark, TEST_SF_DIR)
    plan = executed_plan(df)
    scan = next(line for line in plan.splitlines() if "FileScan" in line)
    pf = scan.split("PartitionFilters: ")[1]
    assert pf.startswith("[isnotnull") or "o_orderstatus" in pf.split("]")[0], pf[:120]


def test_dpp_prunes_partitions_via_join(spark):
    """Dim filtered on a non-partition attribute + fact partitioned on
    the join key = dynamic partition pruning: the fact scan's
    PartitionFilters must contain a runtime dynamicpruningexpression
    (the dim's broadcast reused as a pruning subquery)."""
    from os___mapreduceframework_spark.sources.formats import dpp_join_for_audit

    df = dpp_join_for_audit(spark, TEST_SF_DIR)
    plan = executed_plan(df, run=True)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_join(spark):
    """Runtime bloom-filter join pruning: a selective filter on the
    build side of a shuffle join injects might_contain(bloom) into the
    probe side's scan, cutting shuffle volume before the exchange. The
    size thresholds are lowered so the optimization triggers at test SF
    (at 100 TB the defaults -- creation side <= 10 MB post-filter,
    application side >= 10 GB -- fire on exactly this shape unaided)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, TEST_SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        sel = (
            load_table(spark, TEST_SF_DIR, "orders")
            .filter(F.col("o_totalprice") < 1000.0)
            .select("o_orderkey")
        )
        j = li.join(sel, li["l_orderkey"] == sel["o_orderkey"])
        plan = executed_plan(j, run=True)
        assert "might_contain" in plan, plan[:2000]
        # the bloom probe must sit on the FACT (application) side scan
        probe_side = plan.lower().split("might_contain")[0]
        assert "lineitem" not in probe_side.split("filescan")[-1]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_needs_no_exchange(spark):
    """Both sides bucketed+sorted on the join key: the sort-merge join
    must read bucket layout directly -- zero Exchange operators."""
    from os___mapreduceframework_spark.sources.formats import bucketed_join_for_audit

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join_for_audit(spark, TEST_SF_DIR)
        plan = executed_plan(df)
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, plan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_search_count_whole_stage_codegen(spark):
    """The flagship pipeline stays inside whole-stage codegen (no
    Python/row-at-a-time operators in the hot path)."""
    df = ALL["search_count"](spark, TEST_SF_DIR)
    plan = executed_plan(df, run=True)
    # '*(n)' marks WholeStageCodegen subtrees in the simple plan string;
    # every pipeline stage (scan+filter+partial agg, final agg, sort)
    # should be inside one
    assert "*(1)" in plan and "*(2)" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q4_exists_decorrelates_with_residual(spark):
    """The correlated EXISTS (date comparison against the outer row)
    must become one semi join, not a per-row subquery -- and a
    SORT-MERGE semi join: both sides are facts, so the merge hint must
    hold against small-SF statistics that would broadcast lineitem."""
    df = ALL["q4_order_priority"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "LeftSemi" in plan, plan[:2000]
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark):
    df = ALL["q16_supplier_variety"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_q19_disjunction_keeps_hash_join(spark):
    """OR-of-conjuncts across both join sides: the equi key must stay
    out of the disjunction -- hash join, never a nested loop."""
    df = ALL["q19_disjunctive_predicates"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "HashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q7_q8_snowflake_dims_broadcast(spark):
    """The nation self-aliases and every other dim must broadcast; the
    only shuffle joins are fact-fact edges."""
    for name in ("q7_volume_shipping", "q8_market_share"):
        df = ALL[name](spark, TEST_SF_DIR)
        plan = executed_plan(df)
        assert "BroadcastHashJoin" in plan, (name, plan[:1500])
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q15_scalar_max_is_single_row_broadcast(spark):
    df = ALL["q15_top_supplier"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    # the max-revenue side is a 1-row aggregate joined via broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:1500]


def test_q22_anti_join_and_broadcast_scalar(spark):
    df = ALL["q22_dormant_customers"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "LeftAnti" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


EXPECTED_MAX_SHUFFLES = {
    # query name -> max Exchange operators tolerated in the plan; a
    # regression above this means an extra shuffle crept in
    "search_count": 2,        # agg + final sort
    "q1_pricing_summary": 2,  # agg + final sort
    "q6_forecast_revenue": 1, # single global agg
    "join_broadcast_dims": 2, # agg + sort (joins broadcast, no shuffle)
    "dedup_simhash": 2,       # one agg + final sort
    "salted_token_count": 2,  # two-phase agg (partial agg is map-side)
    "topk_orders": 0,         # TakeOrderedAndProject only
    "q4_order_priority": 4,   # SMJ semi pair (facts never broadcast) + tiny agg + sort
    "q13_customer_distribution": 4,  # SMJ pair (facts never broadcast); 1st agg reuses; 2nd tiny + sort
    "q16_supplier_variety": 3,  # joins broadcast; 2-phase distinct + sort
    "q17_small_quantity_revenue": 2,  # per-part agg + join repartition
    "q19_disjunctive_predicates": 1,  # broadcast join, single global agg
    "q22_dormant_customers": 6,  # urgent-key distinct + merge anti-join (no raw fact broadcast) + avg + agg/sort
    "q14_promo_revenue": 1,   # broadcast dim, single global agg
    "q10_returned_items": 4,  # merge-hinted fact-fact joins (no raw fact broadcast) + agg
    "quality_value_histogram": 4,  # bin agg + sort (AQE reads counted)
    "quality_fk_orphans": 7,  # 3 lazy anti-join single-row aggs + union + sort
    "quality_profile_orders": 4,  # one scan; distinct expansion + final
    "quality_drift_l1": 6,    # bin agg + totals + global agg (pivot-in-agg form)
    "embedding_gram_matrix": 4,  # partial-Gram merge by (i,j) + sort
    "events_gap_fill": 6,     # hourly agg, grid bounds agg, join, window sort
    "merge_upsert_orders": 2, # readback agg/sort; merge I/O is bucket-pruned
    "events_funnel": 2,       # one shuffle on user_id + tiny final agg
    "events_retention_cohorts": 4,  # two user_id aggs (partitioning reused) + join + sort
    "curation_pii_scrub": 1,  # codegen-fused regexes; sort only
    "curation_mix_weights": 4,  # per-source agg + 1-row normalizer + sort
    "merge_time_travel_orders": 2,  # two single-row version summaries
    "multimodal_audio_decode": 1,   # encode/decode fused mapInPandas; sort only
    "split_train_val_test": 1,  # scan-local split expr; sort only
    "sample_stratified": 2,   # per-stratum window + sort
    "class_balance_downsample": 4,  # quota agg + class window + final agg/sort
    "quality_quantile_sketch": 4,  # rollup sketch agg + rank-audit agg + sort
    "curation_decontaminate": 4,   # eval-gram dedup + broadcast-hit agg + sort
    "curation_decontaminate_summary": 8,  # + per-source rollup joins
    "training_chunk_documents": 1, # scan-local chunk expr; sort only
    "embedding_label_centroids": 2,  # one (label,dim) agg + sort
    "embedding_label_cohesion": 5,   # centroid agg chain + per-label agg
    "graph_pagerank_suppliers": 2,   # final plan post-checkpoint: join + sort
    "graph_degree_stats": 11,      # merge-hinted edge join + 2x (edge-distinct + deg agg + hist agg) + union sort
    "sketch_cms_heavy_hitters": 5, # cells agg + exact top-k + probe join
    "layout_zorder_stats": 2,      # bucket agg + sort
    "merge_txn_two_tables": 6,     # two table reads + readback join + sort
    "ivm_revenue_by_customer": 5,  # v0 view agg + cdf join + delta agg + merge join
    "sample_weighted_by_length": 4,  # 1-row max + per-source agg + sort
    "basket_pair_support": 14,     # distinct + forced SMJ pair join + aggs (no fact broadcast)
    "customer_rfm_segments": 2,    # per-customer agg + segment rollup (ntile windows reuse)
    "fuzzy_match_part_names": 5,   # gram join + candidate agg + probe window
    "events_attribution_last_touch": 3,  # user_id window + channel agg + sort
    "text_bpe_pair_stats": 2,      # vocab agg + pair agg (TakeOrdered)
    "multimodal_audio_spectrum": 1,  # fused mapInPandas chain; sort only
    "dedup_containment": 14,       # banded candidates + shingle joins (mirrors ngram_jaccard)
    "text_keywords_per_doc": 8,    # tf + df aggs + term join + doc window
    "events_transition_matrix": 3, # user window + pair agg + sort
    "text_char_entropy": 3,        # Counter partials: (doc,ch) merge + doc window + sort
    "curation_pipeline_v2": 8,     # contamination semi + dedup keeper + source rollup
    "dedup_keep_canonical": 4,     # post-checkpoint: merge-hinted membership join (both sides shuffle) + cluster agg + sort
    "training_shuffle_order": 2,   # per-shard window + (shard,pos) sort
    "quality_mutual_information": 4,  # joint agg + cell-table windows (types x bins rows)
    "dedup_boilerplate_blocks": 4,    # block-hash agg + hash join back + doc agg + sort
    "embedding_pca_variance": 2,      # moment-partial merge; eigensolve is driver-side
    "multimodal_image_decode": 1,     # fused encode/decode mapInPandas; sort only
    "multimodal_video_decode": 1,     # fused encode/decode mapInPandas; sort only
    "events_ohlc_hourly": 2,          # one min_by/max_by bucket agg + sort
    "sketch_bloom_probe": 10,         # dim-side distincts counted twice (dim-sized); probe side scans once
    "embedding_whitening_check": 0,   # moment jobs run at construction; result is a local row
    "text_perplexity_bigram": 8,      # bigram aggs (c2,c1,v) + score joins + per-doc agg + sort
    # three gate subplans + doc_id joins + source rollup; r9: the
    # perplexity gate's lp model table adds one VOCAB-scale exchange
    # (c2 |><| c1 pre-join) while the FACT-scale bigram stream drops
    # from two score exchanges to one -- count up, bytes down
    "curation_pipeline_v3": 15,
    "feature_quantile_bucketize": 3,  # boundary agg (1-row broadcast) + cell agg + sort
    "dedup_embedding_clusters": 2,    # post-checkpoint: label join + sort (CC iterations checkpointed)
    "window_moving_zscore": 2,        # per-series window + class agg
    # r10: banding carries the vectors, so the whole candidate+score
    # pipeline is one REPARTITION_BY_NUM exchange into the (band,
    # bucket) groups; the salt window, s|><|corpus join and the bridge
    # path's two corpus joins are deleted (salt chunking + bridges are
    # index arithmetic inside the scorer). Remaining: band-group
    # repartition + argmax agg + final sort (the id-list join
    # broadcasts). Was 11 in r7-r9.
    "ann_knn_join_all": 3,
}


def test_no_raw_fact_broadcast_in_headline_plans(spark):
    """Every non-streaming headline bench query, planned against the
    BENCH scale factor (realistic file-size statistics), must not
    broadcast a raw fact scan -- the q4 trap as a mechanical gate.
    Streaming entries are excluded because building their result frame
    executes the stream."""
    import os

    from bench import HEADLINE, SF_DIR
    from os___mapreduceframework_spark.plans.audit import raw_fact_broadcasts

    sf_dir = SF_DIR if os.path.isdir(SF_DIR) else TEST_SF_DIR
    for name in HEADLINE:
        if name.startswith("stream_"):
            continue
        offenders = raw_fact_broadcasts(ALL[name](spark, sf_dir))
        assert not offenders, f"{name} broadcasts raw fact(s): {offenders}"


def test_shuffle_budget(spark):
    """Count Exchange operators per headline plan against the designed
    budget -- shuffle regressions are caught mechanically."""
    for name, budget in EXPECTED_MAX_SHUFFLES.items():
        df = ALL[name](spark, TEST_SF_DIR)
        plan = executed_plan(df)
        n = sum(line.count("+- Exchange ") for line in plan.splitlines())
        assert n <= budget, f"{name}: {n} shuffles > budget {budget}\n{plan[:1500]}"


def test_fk_orphans_construction_is_lazy(spark):
    """Building the FK-orphans frame must trigger ZERO Spark jobs: the
    three anti-join counts are lazy single-row aggregates that run
    together at action time, not eager driver-side .count() calls."""
    spark.sparkContext.setJobGroup("fk-orphans-construct", "laziness audit")
    try:
        df = ALL["quality_fk_orphans"](spark, TEST_SF_DIR)
    finally:
        spark.sparkContext.setJobGroup("", "")
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(
        "fk-orphans-construct"
    )
    assert jobs == [], f"construction ran jobs: {jobs}"
    assert df.count() == 3


def test_curation_pipeline_single_scan_no_python(spark):
    """The composed curation pipeline must stay ONE fused plan: a single
    documents scan (gates are projections on it), no Python operators,
    one dedup-window shuffle."""
    df = ALL["curation_pipeline"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert plan.count("FileScan parquet") == 1, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_topk_and_broadcast_count(spark):
    """TF-IDF: the corpus-size side is a 1-row broadcast, the top-25 is
    TakeOrderedAndProject, and the term join is never a cartesian
    product over the token explosion."""
    df = ALL["text_tfidf_top"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_stratified_budget_window_is_partitioned(spark):
    """The stratified budget must hash-partition its window on source
    (parallel across strata) -- never the single-partition global window
    that curation_token_budget deliberately accepts."""
    df = ALL["curation_token_budget_stratified"](spark, TEST_SF_DIR)
    plan = executed_plan(df)
    assert "hashpartitioning(source" in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]


def test_broadcast_offender_parser_sees_nonlast_branches():
    """The tree-art parser must slice subtrees correctly for ':'-
    prefixed (non-last-child) branches -- plain leading-space indent
    sliced an empty subtree and silently missed the broadcast."""
    from os___mapreduceframework_spark.plans.audit import _broadcast_offenders

    plan = (
        "*(5) SortMergeJoin [k], [k], Inner\n"
        ":- *(2) BroadcastExchange HashedRelation\n"
        ":  +- *(1) Filter isnotnull(k)\n"
        ":     +- FileScan parquet lineitem[...]\n"
        "+- *(4) Sort [k ASC]\n"
        "   +- Exchange hashpartitioning(k)\n"
        "      +- FileScan parquet nation[...]\n"
    )
    assert _broadcast_offenders(plan, ("lineitem", "nation")) == ["lineitem"]
    # aggregated subtrees stay exempt
    agg_plan = plan.replace(
        ":  +- *(1) Filter isnotnull(k)\n",
        ":  +- *(1) HashAggregate(keys=[k])\n",
    )
    assert _broadcast_offenders(agg_plan, ("lineitem", "nation")) == []
    # last-child broadcasts (plain-space indent) still parse
    plan2 = (
        "*(5) BroadcastHashJoin [k], [k]\n"
        ":- FileScan parquet nation[...]\n"
        "+- BroadcastExchange HashedRelation\n"
        "   +- FileScan parquet orders.parquet[...]\n"
    )
    assert _broadcast_offenders(plan2, ("orders.parquet",)) == ["orders.parquet"]


def test_ts_bounds_memoized_zero_jobs_after_first(spark):
    """Corpus ts-bounds fetches (retention origin, drift midpoint) must
    share ONE bounded-aggregate fetch per (session, sf_dir): at 100 TB
    each construction-time agg(min/max).head() is a full-column scan
    before the real query (VERDICT r03 item 3). AQE splits the first
    fetch into several Spark jobs, so the pin is: every fetch AFTER the
    first -- including the drift/retention query constructors -- runs
    ZERO jobs."""
    from os___mapreduceframework_spark.sources import ts_bounds_us

    spark._graft_stats_cache = {}  # isolate from earlier tests
    first = ts_bounds_us(spark, TEST_SF_DIR, "events", "ts")
    spark.sparkContext.setJobGroup("ts-bounds-memo", "bounds memo audit")
    try:
        # both consumers constructing again must be pure cache hits
        ALL["quality_drift_l1"](spark, TEST_SF_DIR)
        ALL["events_retention_cohorts"](spark, TEST_SF_DIR)
        again = ts_bounds_us(spark, TEST_SF_DIR, "events", "ts")
    finally:
        spark.sparkContext.setJobGroup("", "")
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("ts-bounds-memo")
    assert jobs == [], f"memoized bounds fetch re-ran jobs: {jobs}"
    assert first == again and first[0] is not None and first[0] <= first[1]


def test_ts_bounds_empty_table_raises_and_skips_cache(spark, tmp_path):
    """ADVICE r4: an empty events table used to memoize (None, None)
    and every consumer then crashed with an opaque TypeError doing
    integer arithmetic on None -- permanently, because the None result
    was cached for the session. Now: a clear ValueError, and the empty
    result is NOT cached so a later-populated table re-probes."""
    import pytest

    from os___mapreduceframework_spark.sources import load_table, ts_bounds_us

    events = load_table(spark, TEST_SF_DIR, "events")
    events.limit(0).write.parquet(str(tmp_path / "events.parquet"))
    spark._graft_stats_cache = {}
    with pytest.raises(ValueError, match="empty or all-NULL"):
        ts_bounds_us(spark, str(tmp_path), "events", "ts")
    assert not any(
        k[0] == "ts_bounds_us" for k in spark._graft_stats_cache
    ), "empty-table bounds result must not be memoized"


def test_embedding_dim_memoized_zero_jobs_after_first(spark):
    """PCA/whitening/gram share one memoized limit-1 dim probe."""
    from os___mapreduceframework_spark.sources import embedding_dim

    spark._graft_stats_cache = {}
    d1 = embedding_dim(spark, TEST_SF_DIR)
    spark.sparkContext.setJobGroup("emb-dim-memo", "dim memo audit")
    try:
        d2 = embedding_dim(spark, TEST_SF_DIR)
    finally:
        spark.sparkContext.setJobGroup("", "")
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("emb-dim-memo")
    assert jobs == [], f"memoized dim probe re-ran jobs: {jobs}"
    assert d1 == d2 and d1 > 0
