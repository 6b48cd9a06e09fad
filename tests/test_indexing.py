"""Trigram / inverted-index search: index-served plans must equal the
scan plans exactly (oracle parity is covered by test_oracle_parity; here
we pin scan-vs-index equivalence on adversarial inputs the fixtures
don't contain)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from os___mapreduceframework_spark.operators.indexing import (
    inverted_index,
    search_count_indexed,
    trigram_index,
)
from os___mapreduceframework_spark.operators.search import search_count


def _names(spark, rows):
    return spark.createDataFrame([(n,) for n in rows], "name string")


NAMES = [
    "widget alpha",
    "widget alpha",  # duplicate -> cnt=2 must survive the index path
    "gadget",
    "wi",  # shorter than the query word
    "abcXabc",  # holds all grams of "abcabc" without containing it
    "abcabc",
    "xyzwidx",  # contains 'wid' mid-string
]


@pytest.mark.parametrize("word", ["wid", "widget", "abcabc", "zzz", "get a"])
def test_indexed_equals_scan(spark, word):
    df = _names(spark, NAMES)
    got = search_count_indexed(df, word).collect()
    want = search_count(df, word).collect()
    assert got == want


def test_false_positive_candidate_is_verified_away(spark):
    # "abcXabc" holds every trigram of "abcabc" -> index candidate, but
    # the verify predicate must reject it (trigram containment is
    # necessary, not sufficient)
    df = _names(spark, ["abcXabc", "abcabc"])
    rows = search_count_indexed(df, "abcabc").collect()
    assert [(r["name"], r["cnt"]) for r in rows] == [("abcabc", 1)]


def test_short_word_falls_back_to_scan(spark):
    df = _names(spark, NAMES)
    got = search_count_indexed(df, "wi").collect()
    want = search_count(df, "wi").collect()
    assert got == want and len(got) >= 3


def test_index_carries_multiplicity(spark):
    # duplicate names are one posting with cnt=2, not two postings
    idx = trigram_index(_names(spark, NAMES))
    wid = idx.filter((F.col("gram") == "wid") & (F.col("name") == "widget alpha"))
    assert [(r["cnt"],) for r in wid.collect()] == [(2,)]


def test_materialized_index_serves_without_base_scan(spark, tmp_path):
    """The deployment shape: once the posting relation is materialized,
    a query is served entirely from it -- the plan must not scan the
    base table (inline builds fuse with the scan instead; module doc)."""
    from os___mapreduceframework_spark.plans.audit import executed_plan
    from os___mapreduceframework_spark.sources import load_table
    from tests.conftest import TEST_SF_DIR

    names = load_table(spark, TEST_SF_DIR, "part")
    path = str(tmp_path / "trigram_idx")
    trigram_index(names, "p_name").write.parquet(path)
    served = search_count_indexed(
        names, "wid", "p_name", index=spark.read.parquet(path)
    )
    assert "part.parquet" not in executed_plan(served)
    assert served.collect() == search_count(names, "wid", "p_name").collect()


def test_inverted_index_distinct_tokens_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["token"]) for r in inverted_index(docs).collect()}
    assert rows == {(1, "a"), (1, "b"), (2, "b"), (2, "c")}


def test_incremental_index_serves_full_corpus_result(spark):
    """Base-half build + appended delta segment must answer the
    flagship query identically to the full-corpus scan (fixtures have
    36/62 names spanning both halves, so partial-cnt summing across
    segments is genuinely exercised)."""
    from os___mapreduceframework_spark import queries as registry
    from os___mapreduceframework_spark.sources import load_table
    from tests.conftest import TEST_SF_DIR

    got = registry.queries()["search_count_index_incremental"](
        spark, TEST_SF_DIR
    ).collect()
    want = search_count(
        load_table(spark, TEST_SF_DIR, "part"), "wid", "p_name"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0


def test_incremental_index_has_split_segments_and_compacts(spark):
    """The appended table must hold >1 partial posting for spanning
    names; compaction folds back to one row per (gram, name) in a NEW
    epoch table with the served result unchanged."""
    from os___mapreduceframework_spark.operators.indexing import (
        _INC_TABLE,
        _ensure_incremental_trigram_table,
        compact_trigram_index,
        search_count_index_segments,
    )
    from tests.conftest import TEST_SF_DIR

    _ensure_incremental_trigram_table(spark, TEST_SF_DIR)
    idx = spark.table(_INC_TABLE)
    seg_counts = (
        idx.groupBy("name", "gram").agg(F.count(F.lit(1)).alias("k"))
    )
    assert seg_counts.filter(F.col("k") > 1).count() > 0, "no split postings"

    before = search_count_index_segments(idx, "wid").collect()
    new_table = compact_trigram_index(spark, _INC_TABLE)
    try:
        assert new_table != _INC_TABLE
        compacted = spark.table(new_table)
        assert compacted.count() < idx.count()
        assert (
            compacted.groupBy("name", "gram")
            .agg(F.count(F.lit(1)).alias("k"))
            .filter(F.col("k") > 1)
            .count()
            == 0
        ), "compaction left duplicate postings"
        after = search_count_index_segments(compacted, "wid").collect()
        assert [tuple(r) for r in after] == [tuple(r) for r in before]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {new_table}")


def test_index_served_query_prunes_buckets(spark):
    """The materialized bucketed index serves the flagship query with
    no base-table scan, and with bucketed scan enabled the query's
    gram IN-filter prunes to its grams' buckets (SelectedBucketsCount
    strictly below the bucket count)."""
    from os___mapreduceframework_spark.operators.indexing import (
        _N_IDX_BUCKETS,
        index_served_search_for_audit,
    )
    from os___mapreduceframework_spark.plans.audit import executed_plan
    from tests.conftest import TEST_SF_DIR

    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = index_served_search_for_audit(spark, TEST_SF_DIR)
        plan = executed_plan(df)
        assert "part.parquet" not in plan, plan[:1500]
        marker = "SelectedBucketsCount: "
        assert marker in plan, plan[:1500]
        n = int(plan.split(marker)[1].split()[0])
        assert 0 < n < _N_IDX_BUCKETS, plan[:1500]
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)


def test_segments_short_word_falls_back_to_unpruned_scan(spark):
    """A 1-2 char query has no trigram; the segmented server must serve
    it from the merged postings (unpruned), matching the scan answer --
    not return an empty frame because gram.isin([]) dropped everything."""
    from os___mapreduceframework_spark.operators.indexing import (
        search_count_index_segments,
        trigram_index,
    )
    from os___mapreduceframework_spark.operators.search import search_count
    from os___mapreduceframework_spark.sources import load_table
    from tests.conftest import TEST_SF_DIR

    names = load_table(spark, TEST_SF_DIR, "part").select(
        F.col("p_name").alias("name")
    )
    idx = trigram_index(names)
    got = {
        (r["name"], r["cnt"])
        for r in search_count_index_segments(idx, "wi").collect()
    }
    want = {
        (r["name"], r["cnt"]) for r in search_count(names, "wi").collect()
    }
    assert got == want and got  # non-empty and scan-identical
