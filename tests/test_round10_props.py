"""Round-10 property tests: the carry-vector scored-pairs pipeline.

The r10 restructure moved salt chunking and bridge-pair derivation from
Spark operators (`_salted_rows` row_number window + lag window + corpus
joins) into index arithmetic inside `_bucket_pair_dot_den`. These tests
pin the structural claim that made that legal: the (pair set, cosine)
output equals the reference composition `bucket_pairs` over the SAME
band rows + per-pair Spark cosine -- on a corpus engineered to exercise
every branch (a hot bucket far over LSH_BUCKET_CAP so chunks AND
bridges exist, ragged vector lengths, NULL/empty vectors).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from os___mapreduceframework_spark.operators.minhash import (
    LSH_BUCKET_CAP,
    _cosine_prenorm,
    _norm,
    bucket_pairs,
    canonical_embeddings,
    embedding_band_buckets,
    embedding_scored_pairs,
)


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """700 vectors: 400 IDENTICAL (one degenerate bucket in every band
    -> 2 chunks of 256/144 per band plus a bridge), 295 deterministic
    pseudo-random, 3 ragged (short), 1 empty, 1 NULL."""
    import math

    rows = []
    dim = 16
    for i in range(400):
        rows.append((i, [1.0] * dim))
    for i in range(400, 695):
        rows.append(
            (i, [math.sin(0.1 * i * (d + 1)) for d in range(dim)])
        )
    rows.append((695, [0.5] * 7))
    rows.append((696, [0.25] * 3))
    rows.append((697, [-1.0] * 5))
    rows.append((698, []))
    rows.append((699, None))
    return spark.createDataFrame(
        rows, "vec_id long, e array<double>"
    )


def _reference_scored(emb, n):
    """The pre-r9 composition: narrow band rows -> bucket_pairs (the
    shared `_salted_rows` window + self-join + lag-window bridges) ->
    per-pair cosine via corpus joins with the Spark zip_with fold."""
    bands = embedding_band_buckets(emb, dim=16, n_vectors=n)
    cand = bucket_pairs(bands, "vec_id", ("band", "bucket"))
    corpus = emb.select("vec_id", "e", _norm("e").alias("nv"))
    ca = corpus.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"), F.col("nv").alias("na")
    )
    cb = corpus.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"), F.col("nv").alias("nb")
    )
    return (
        cand.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _cosine_prenorm(
                    F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
                ),
                4,
            ).alias("cs"),
        )
    )


def test_scored_pairs_match_bucket_pairs_reference(spark, hot_corpus):
    emb = canonical_embeddings(hot_corpus)
    n = emb.count()
    got = {
        (r["id_a"], r["id_b"]): r["cs"]
        for r in embedding_scored_pairs(emb, dim=16, n_vectors=n).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["cs"]
        for r in _reference_scored(emb, n).collect()
    }
    assert set(got) == set(want), (
        f"pair set diverged: {len(got)} vs {len(want)}; "
        f"extra={sorted(set(got) - set(want))[:5]} "
        f"missing={sorted(set(want) - set(got))[:5]}"
    )
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, f"cosines diverged for {len(diffs)} pairs: {list(diffs.items())[:5]}"
    # the hot bucket really exercised chunking: 400 identical vectors
    # > LSH_BUCKET_CAP forces >= 2 sub-buckets and a bridge pair
    assert 400 > LSH_BUCKET_CAP
    # bridge pair between chunk firsts (ids 0 and 256) must be present
    assert (0, LSH_BUCKET_CAP) in got


def test_scored_pairs_min_cs_pushdown_equals_post_filter(spark, hot_corpus):
    emb = canonical_embeddings(hot_corpus)
    n = emb.count()
    full = embedding_scored_pairs(emb, dim=16, n_vectors=n)
    pushed = embedding_scored_pairs(emb, dim=16, n_vectors=n, min_cs=0.45)
    want = {
        (r["id_a"], r["id_b"]): r["cs"]
        for r in full.filter(F.col("cs") >= 0.45).collect()
    }
    got = {(r["id_a"], r["id_b"]): r["cs"] for r in pushed.collect()}
    assert got == want


def test_null_and_empty_vectors_never_pair(spark, hot_corpus):
    emb = canonical_embeddings(hot_corpus)
    n = emb.count()
    pairs = embedding_scored_pairs(emb, dim=16, n_vectors=n).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert 698 not in ids and 699 not in ids


def test_ragged_pairs_score_null(spark, hot_corpus):
    """Mixed-length pairs that collide in a bucket must carry a NULL
    cosine (the zip_with NULL-padded fold semantics)."""
    emb = canonical_embeddings(hot_corpus)
    n = emb.count()
    pairs = embedding_scored_pairs(emb, dim=16, n_vectors=n).collect()
    ragged = {695, 696, 697}
    mixed = [
        r
        for r in pairs
        if (r["id_a"] in ragged) != (r["id_b"] in ragged)
        or (
            r["id_a"] in ragged
            and r["id_b"] in ragged
        )
    ]
    # every cross-length pair is NULL; same-length ragged pairs score
    for r in mixed:
        la = {695: 7, 696: 3, 697: 5}.get(r["id_a"], 16)
        lb = {695: 7, 696: 3, 697: 5}.get(r["id_b"], 16)
        if la != lb:
            assert r["cs"] is None, r


def test_compact_span_registry_tolerates_missing_registry(spark, tmp_path):
    """An empty corpus never fires a micro-batch, so no registry dir is
    ever written; the between-sessions compaction must be a no-op, not
    a PATH_NOT_FOUND (latent since the r9 resume-query registration;
    surfaced by the degenerate-matrix sweep's empty mode)."""
    from os___mapreduceframework_spark.streaming.incremental import (
        compact_span_registry,
    )

    stats = compact_span_registry(spark, str(tmp_path / "no_such_state"))
    assert stats == {
        "rows_before": 0,
        "rows_after": 0,
        "bytes_before": 0,
        "bytes_after": 0,
    }
