"""Training-export operators: packing invariants, shard balance and
artifact fidelity, HLL sketch accuracy vs exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.operators.training import SEQ_LEN, pack_sequences
from os___mapreduceframework_spark.sources import load_table
from tests.conftest import TEST_SF_DIR

ALL = registry.queries()


def test_pack_sequences_partitions_token_stream(spark):
    """Every document lands in exactly one pack; per-source pack ids
    are contiguous from 0; token totals are preserved; every non-final
    pack's documents START within the pack (boundary-agnostic chunking:
    a doc belongs to the chunk holding its first token)."""
    docs = load_table(spark, TEST_SF_DIR, "documents")
    packed = pack_sequences(docs).collect()
    n_docs = docs.count()
    assert len(packed) == n_docs
    total_toks = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r["toks"] for r in packed) == total_toks

    by_source: dict[str, list] = {}
    for r in packed:
        by_source.setdefault(r["source"], []).append(r)
    for source, rows in by_source.items():
        packs = sorted({r["pack_id"] for r in rows})
        assert packs == list(range(len(packs))), f"{source}: gaps in {packs[:10]}"
        # replay the stream: doc's pack must be floor(start/SEQ_LEN)
        start = 0
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            assert r["pack_id"] == start // SEQ_LEN
            start += r["toks"]


def test_shard_export_covers_and_balances(spark):
    rows = ALL["training_shard_export"](spark, TEST_SF_DIR).collect()
    shards = {r["shard"] for r in rows}
    assert shards <= set("0123456789abcdef")
    n_docs = load_table(spark, TEST_SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # md5 prefixes are uniform: no shard should be wildly oversized
    expected = n_docs / 16
    assert max(r["n_docs"] for r in rows) <= 2.5 * expected


def test_vocab_hll_estimates_close_to_exact(spark):
    rows = {
        r["source"]: r
        for r in ALL["vocab_hll_rollup"](spark, TEST_SF_DIR).collect()
    }
    docs = load_table(spark, TEST_SF_DIR, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
    exact_global = toks.select(F.countDistinct("tok")).first()[0]
    assert rows["ALL"]["exact_distinct_tokens"] == exact_global
    exact_src = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    for source, n in exact_src.items():
        assert rows[source]["exact_distinct_tokens"] == n
    # the in-plan audit flag IS the accuracy assertion (15% tolerance)
    assert all(r["est_within_tol"] for r in rows.values())
