"""Round-6 property tests: span-level exact-substring dedup."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from os___mapreduceframework_spark.operators.dedup import exact_span_duplicates


def _spans(spark, docs, w):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )
    out = exact_span_duplicates(df, w=w).collect()
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out
    }


def test_planted_cross_doc_span_found_exactly(spark):
    """A 9-token run shared by two otherwise-unique docs is recovered as
    ONE maximal span per doc, at the exact planted offsets."""
    w = 5
    shared = [f"s{i}" for i in range(9)]
    a = [f"a{i}" for i in range(4)] + shared + [f"A{i}" for i in range(3)]
    b = [f"b{i}" for i in range(7)] + shared + [f"B{i}" for i in range(5)]
    # 1-based inclusive: in a the run spans 5..13, in b 8..16; 9-4=5 windows
    assert _spans(spark, [(1, a), (2, b)], w) == {
        (1, 5, 13, 5),
        (2, 8, 16, 5),
    }


def test_within_doc_repeat_yields_two_spans(spark):
    """The SAME run twice inside one doc (separated by unique filler)
    duplicates its own windows -> two disjoint spans in that doc."""
    w = 5
    run = [f"r{i}" for i in range(6)]
    doc = run + [f"f{i}" for i in range(4)] + run
    assert _spans(spark, [(1, doc)], w) == {
        (1, 1, 6, 2),
        (1, 11, 16, 2),
    }


def test_no_duplication_no_spans(spark):
    docs = [(1, [f"a{i}" for i in range(12)]), (2, [f"b{i}" for i in range(12)])]
    assert _spans(spark, docs, 5) == set()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    run_len=st.integers(min_value=5, max_value=14),
    off_a=st.integers(min_value=0, max_value=6),
    off_b=st.integers(min_value=0, max_value=6),
)
def test_property_planted_span_offsets(spark, run_len, off_a, off_b):
    """For any run length >= w and any offsets, the merged island equals
    the planted run exactly: [off+1, off+run_len], run_len - w + 1
    windows (the paper's recall argument, mechanized)."""
    w = 5
    shared = [f"s{i}" for i in range(run_len)]
    a = [f"a{i}" for i in range(off_a)] + shared + [f"A{i}" for i in range(3)]
    b = [f"b{i}" for i in range(off_b)] + shared + [f"B{i}" for i in range(3)]
    nw = run_len - w + 1
    assert _spans(spark, [(1, a), (2, b)], w) == {
        (1, off_a + 1, off_a + run_len, nw),
        (2, off_b + 1, off_b + run_len, nw),
    }


def test_simhash_hamming_recall_is_one_vs_bruteforce(spark):
    """Pigeonhole banding is EXACT: the banded neighbor query recovers
    every pair within HAM_K of the brute-force all-pairs answer at
    sf0.001 (feasible: ~50 docs), with matching distances."""
    from os___mapreduceframework_spark.operators.dedup import (
        HAM_K,
        _simhash_df,
        q_dedup_simhash_hamming,
    )
    from os___mapreduceframework_spark.sources import load_table
    from tests.conftest import TEST_SF_DIR

    sims = {
        r["doc_id"]: r["simhash"]
        for r in _simhash_df(load_table(spark, TEST_SF_DIR, "documents")).collect()
    }
    ids = sorted(sims)
    brute = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= HAM_K
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q_dedup_simhash_hamming(spark, TEST_SF_DIR).collect()
    }
    assert got == brute
    assert brute, "fixture produced no close pairs; test is vacuous"


def test_simhash_hamming_pigeonhole_adversarial(spark):
    """Hand-built simhash band structure: pairs at distance exactly
    HAM_K (all flipped bits inside distinct bands AND all inside one
    band) are found; distance HAM_K + 1 pairs are dropped even when a
    band still matches (the verify filter, not banding recall, decides
    membership)."""
    from os___mapreduceframework_spark.operators import dedup as d

    base = 0b1010110011010101001101011010  # arbitrary 28-bit pattern
    flips_spread = (1 << 0) | (1 << 7) | (1 << 14)        # 3 bands touched
    flips_oneband = (1 << 0) | (1 << 1) | (1 << 2)        # one band, dist 3
    flips_far = (1 << 0) | (1 << 7) | (1 << 14) | (1 << 21)  # dist 4: out
    docs = [
        (1, base),
        (2, base ^ flips_spread),
        (3, base ^ flips_oneband),
        (4, base ^ flips_far),
    ]
    sim = spark.createDataFrame(docs, "doc_id long, simhash long")
    import pyspark.sql.functions as F

    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(d.HAM_BANDS)])).alias("band"),
    ).select(
        "doc_id",
        "band",
        F.expr(
            f"shiftright(simhash, band * {d.HAM_BAND_BITS}) & {d._HAM_MASK}"
        ).alias("bval"),
    )
    cand = d.bucket_pairs(bands, "doc_id", ("band", "bval"))
    x = sim.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    y = sim.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    got = {
        (r["id_a"], r["id_b"])
        for r in cand.join(x, "id_a")
        .join(y, "id_b")
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= d.HAM_K)
        .collect()
    }
    assert (1, 2) in got and (1, 3) in got
    assert (1, 4) not in got


def test_apply_spans_removes_exactly_the_detected_spans(spark):
    """Apply == detect: for planted cross-doc duplication, the cleaned
    text is the original minus exactly the detected span tokens, and a
    doc that IS one big duplicated run scrubs to the empty string."""
    import pyspark.sql.functions as F

    from os___mapreduceframework_spark.operators.dedup import (
        exact_span_duplicates,
    )

    w = 5
    shared = [f"s{i}" for i in range(9)]
    a = [f"a{i}" for i in range(4)] + shared + [f"A{i}" for i in range(3)]
    b = [f"b{i}" for i in range(7)] + shared + [f"B{i}" for i in range(5)]
    docs = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(shared)),
         (4, " ".join(shared))],
        "doc_id long, text string",
    )
    spans = (
        exact_span_duplicates(docs, w=w)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct(
            F.col("span_start").alias("s"), F.col("span_end").alias("e")
        )).alias("sp"))
    )
    cleaned = {
        r["doc_id"]: r["cleaned"]
        for r in docs.select("doc_id", F.split("text", " ").alias("w"))
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.expr(
                    "filter(w, (x, i) -> sp IS NULL OR "
                    "NOT exists(sp, v -> i + 1 >= v.s AND i + 1 <= v.e))"
                ),
                " ",
            ).alias("cleaned"),
        )
        .collect()
    }
    assert cleaned[1] == " ".join(a[:4] + a[13:])   # shared run excised
    assert cleaned[2] == " ".join(b[:7] + b[16:])
    assert cleaned[3] == "" and cleaned[4] == ""    # whole doc duplicated


def test_null_and_ragged_embeddings_follow_unnest_semantics(spark):
    """A NULL/empty embedding row must be SKIPPED by every numpy batch
    path (the oracle's unnest yields zero dim rows for it) and a ragged
    vector acts zero-padded -- np.vstack on None crashed the whole
    banding job before round 6."""
    import pyspark.sql.functions as F

    from os___mapreduceframework_spark.operators.minhash import (
        embedding_band_buckets,
    )
    from os___mapreduceframework_spark.operators.similarity import (
        _collect_moments,
        _dense_batch,
    )

    E, keep = _dense_batch([[1.0, 2.0], None, [], [3.0]], dim=2)
    assert keep == [0, 3]
    assert E.tolist() == [[1.0, 2.0], [3.0, 0.0]]

    df = spark.createDataFrame(
        [(1, [0.5] * 8), (2, None), (3, []), (4, [0.25] * 8)],
        "vec_id long, e array<double>",
    )
    bb = embedding_band_buckets(df, dim=8, n_vectors=4)
    ids = {r["vec_id"] for r in bb.select("vec_id").distinct().collect()}
    assert ids == {1, 4}, f"NULL/empty vectors leaked into banding: {ids}"

    G, s, n = _collect_moments(df, "e", 8)
    assert n == 2  # only the two real vectors contribute moments


# ---------------------------------------------------------------------------
# keep-first span policy
# ---------------------------------------------------------------------------

from os___mapreduceframework_spark.operators.dedup import (  # noqa: E402
    keep_first_span_duplicates,
)


def _kf_spans(spark, docs, w):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )
    out = keep_first_span_duplicates(df, w=w).collect()
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out
    }


def test_keep_first_spares_the_canonical_occurrence(spark):
    """The same 9-token run in docs 1 and 2: drop-all marks both, but
    keep-first marks ONLY doc 2's copy (doc 1 holds every window's
    least-(doc_id, start) occurrence)."""
    w = 5
    shared = [f"s{i}" for i in range(9)]
    a = [f"a{i}" for i in range(4)] + shared + [f"A{i}" for i in range(3)]
    b = [f"b{i}" for i in range(7)] + shared + [f"B{i}" for i in range(5)]
    assert _kf_spans(spark, [(1, a), (2, b)], w) == {(2, 8, 16, 5)}


def test_keep_first_within_doc_keeps_earliest(spark):
    """A run repeated inside ONE doc keeps its first occurrence and
    removes only the second."""
    w = 5
    run = [f"r{i}" for i in range(6)]
    doc = run + [f"f{i}" for i in range(4)] + run
    assert _kf_spans(spark, [(1, doc)], w) == {(1, 11, 16, 2)}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    run_len=st.integers(min_value=5, max_value=14),
    off_a=st.integers(min_value=0, max_value=6),
    off_b=st.integers(min_value=0, max_value=6),
)
def test_property_keep_first_is_drop_all_minus_canonical(spark, run_len, off_a, off_b):
    """For a run planted once in each of two docs, keep-first removal
    equals the drop-all answer minus doc 1's (canonical) span -- one
    copy of the duplicated substring always survives."""
    w = 5
    shared = [f"s{i}" for i in range(run_len)]
    a = [f"a{i}" for i in range(off_a)] + shared + [f"A{i}" for i in range(3)]
    b = [f"b{i}" for i in range(off_b)] + shared + [f"B{i}" for i in range(3)]
    drop_all = _spans(spark, [(1, a), (2, b)], w)
    keep_first = _kf_spans(spark, [(1, a), (2, b)], w)
    assert keep_first == {s for s in drop_all if s[0] != 1}
    assert keep_first == {(2, off_b + 1, off_b + run_len, run_len - w + 1)}


# ---------------------------------------------------------------------------
# _merge_islands tie-proofing (perturbed x conflict cross-matrix find):
# duplicate (doc_id, start) hit rows used to tie the ROWS-frame window
# orders, and the two window passes could order tied peers differently,
# splitting a phantom island. The fix pre-aggregates to unique keys; this
# pins it against a pure-Python reference for arbitrary multisets of hits.
# ---------------------------------------------------------------------------

from os___mapreduceframework_spark.operators.dedup import (  # noqa: E402
    _merge_islands,
)


def _ref_islands(hits):
    """Pure-Python gaps-and-islands over a multiset of (doc, start, end)."""
    from collections import Counter, defaultdict

    per_doc = defaultdict(Counter)
    for d, s, e in hits:
        per_doc[d][(s, e)] += 1
    out = []
    for d, ctr in per_doc.items():
        cur = None  # [span_start, span_end, n]
        for (s, e), m in sorted(ctr.items()):
            if cur is not None and s <= cur[1] + 1:
                cur[1] = max(cur[1], e)
                cur[2] += m
            else:
                if cur is not None:
                    out.append((d, cur[0], cur[1], cur[2]))
                cur = [s, e, m]
        if cur is not None:
            out.append((d, cur[0], cur[1], cur[2]))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # doc
            st.integers(min_value=1, max_value=30),   # start
            st.integers(min_value=1, max_value=3),    # multiplicity
        ),
        min_size=0,
        max_size=20,
    )
)
def test_property_merge_islands_handles_duplicate_hits(spark, raw):
    w = 5
    hits = [(d, s, s + w - 1) for d, s, m in raw for _ in range(m)]
    df = spark.createDataFrame(
        hits or [(0, 1, 1 + w - 1)][:0],
        "doc_id long, start long, end long",
    ) if hits else spark.createDataFrame([], "doc_id long, start long, end long")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in _merge_islands(df).collect()
    )
    assert got == _ref_islands(hits)


# ---------------------------------------------------------------------------
# kNN direction symmetry: the undirected-scoring rewrite's load-bearing claim
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.integers(min_value=-9, max_value=9).map(float),
                # adversarial magnitudes: mixed 1e6 / 1e-6 components are
                # where float dot products are most order-sensitive
                st.sampled_from([1e6, -1e6, 1e-6, -1e-6, 0.0, 0.1]),
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_property_cosine_is_direction_symmetric_bitwise(spark, vecs):
    """ann_knn_join_all scores each undirected pair ONCE and reuses the
    value for both directions. That is sound only if the verify
    expression is bit-identical under argument swap: zip_with products
    are elementwise (x*y == y*x per slot), the fold order follows the
    ARRAY slot order (unchanged by the swap), and the denominator
    na*nb is one commutative multiply. Pin it on hostile magnitudes."""
    import pyspark.sql.functions as F

    from os___mapreduceframework_spark.operators.minhash import (
        _cosine_prenorm,
        _norm,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    a = emb.select(
        F.col("vec_id").alias("ia"), F.col("e").alias("ea"), _norm("e").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("ib"), F.col("e").alias("eb"), _norm("e").alias("nb")
    )
    both = a.crossJoin(b).select(
        "ia",
        "ib",
        _cosine_prenorm(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias(
            "fwd"
        ),
        _cosine_prenorm(F.col("eb"), F.col("ea"), F.col("nb"), F.col("na")).alias(
            "rev"
        ),
    )
    import math

    for r in both.collect():
        if r.fwd is None:
            assert r.rev is None, (r.ia, r.ib)
        else:
            # bitwise equality, not approx: the rewrite substitutes one
            # for the other inside a round()-then-hash comparison
            assert math.isnan(r.fwd) == math.isnan(r.rev)
            if not math.isnan(r.fwd):
                assert r.fwd == r.rev and str(r.fwd) == str(r.rev), (
                    r.ia,
                    r.ib,
                    r.fwd,
                    r.rev,
                )


def test_plane_index_layout_is_block_general_and_backward_exact():
    """The plane-index layout is the Python<->SQL bridge for the banded
    hyperplane LSH: the SQL ecodes CTE inverts it as
    band = (p % EMB_N_PLANES) // 6, bit = (p % 6) + 6 * (p // EMB_N_PLANES).
    Pin (a) bit-for-bit backward compatibility with the historical
    piecewise form over every (band, bit) in use today, and (b) exact
    round-tripping through the SQL inversion for THREE blocks -- the
    precondition for the round-7 bits-uncap to be a constants change."""
    from os___mapreduceframework_spark.operators.minhash import (
        EMB_BANDS,
        EMB_N_PLANES,
        EMB_PLANES_PER_BAND,
        _emb_plane_index,
    )

    def historical(band, j):
        if j < EMB_PLANES_PER_BAND:
            return EMB_PLANES_PER_BAND * band + j
        return EMB_N_PLANES + EMB_PLANES_PER_BAND * band + (j - EMB_PLANES_PER_BAND)

    seen = set()
    for band in range(EMB_BANDS):
        for j in range(3 * EMB_PLANES_PER_BAND):  # three blocks
            p = _emb_plane_index(band, j)
            if j < 2 * EMB_PLANES_PER_BAND:  # the blocks in use today
                assert p == historical(band, j), (band, j)
            # SQL inversion (ecodes CTE arithmetic)
            assert (p % EMB_N_PLANES) // EMB_PLANES_PER_BAND == band, (band, j)
            assert (p % EMB_PLANES_PER_BAND) + EMB_PLANES_PER_BAND * (
                p // EMB_N_PLANES
            ) == j, (band, j)
            assert p not in seen  # injective: no plane reused
            seen.add(p)
