"""Round-7 property tests: the joint bits+bands LSH knob.

Round 6 capped hyperplane bits at 12 because each added bit alone
costs recall; SCALE_r06_300x.json measured the cap regime (linear
candidate growth past ~131k vectors). Round 7 uncaps bits to 18 and
grows the band count to the minimal recall-holding value per added
bit. These tests pin the three load-bearing invariants:

1. the band table IS the minimal recall-holding schedule (re-derived
   from first principles here, byte-compared to the pinned constants
   that both engines embed);
2. every fixture-scale corpus (n <= 131072) keeps the round-6
   behavior bit-for-bit -- 32 bands, <= 12 bits, identical plane
   indices, identical buckets;
3. extension planes/bands are INVISIBLE below threshold: widening
   nbits only prepends high bits (mask-off identity), and extension
   bands draw from a disjoint plane-index region (injectivity), so no
   base bucket can change at any width.
"""

from __future__ import annotations

import math

import pytest

from os___mapreduceframework_spark.operators.minhash import (
    EMB_ADAPT_REF,
    EMB_BANDS,
    EMB_BANDS_BY_EXTRA_BITS,
    EMB_CAP_BITS,
    EMB_EXT_PLANE_BASE,
    EMB_MAX_PLANES_PER_BAND,
    EMB_N_PLANES,
    EMB_N_PLANES_TOTAL,
    EMB_PLANES_PER_BAND,
    _emb_plane_index,
    _plane_weights,
    emb_adaptive_bands,
    emb_adaptive_bits,
    embedding_band_buckets,
)

# the banding calibration threshold (dedup.COSINE_NEAR_THRESHOLD);
# restated literally here so this file re-derives the schedule without
# importing (and registering) the dedup query family
CALIBRATION_THRESHOLD = 0.45


def test_band_table_is_minimal_recall_holding_schedule():
    """EMB_BANDS_BY_EXTRA_BITS must equal the minimal L(b) with
    recall(b, L) >= recall(12, 32) at the calibration threshold, where
    per-band collision probability is p^bits, p = 1 - acos(s)/pi (the
    random-hyperplane collision probability). Re-derive and compare."""
    p = 1 - math.acos(CALIBRATION_THRESHOLD) / math.pi
    base_recall = 1 - (1 - p**EMB_CAP_BITS) ** EMB_BANDS
    derived = [EMB_BANDS]
    for bits in range(EMB_CAP_BITS + 1, EMB_MAX_PLANES_PER_BAND + 1):
        q = p**bits
        L = math.ceil(math.log(1 - base_recall) / math.log(1 - q))
        derived.append(L)
    assert tuple(derived) == EMB_BANDS_BY_EXTRA_BITS
    # and each entry actually holds the recall floor
    for i, L in enumerate(EMB_BANDS_BY_EXTRA_BITS):
        bits = EMB_CAP_BITS + i
        recall = 1 - (1 - p**bits) ** L
        assert recall >= base_recall, (bits, L, recall, base_recall)
        # minimality: one fewer band would drop below the floor
        # (except the base entry, which defines the floor)
        if i > 0:
            assert 1 - (1 - p**bits) ** (L - 1) < base_recall, (bits, L)


def test_fixture_scale_corpora_keep_round6_parameters():
    """Every corpus size any driver fixture or sub-cap scale fixture
    reaches must keep 32 bands and the round-6 bit widths -- the
    bit-identity guarantee that lets the extension ship without
    touching a single green CORRECTNESS row."""
    round6_bits = lambda n: EMB_PLANES_PER_BAND + sum(  # noqa: E731
        1 for k in range(12 - EMB_PLANES_PER_BAND) if n > (EMB_ADAPT_REF << k)
    )
    for n in (0, 1, 200, 2048, 2049, 4096, 20000, 65536, 65537, 131072):
        assert emb_adaptive_bands(n) == EMB_BANDS, n
        assert emb_adaptive_bits(n) == round6_bits(n) <= EMB_CAP_BITS, n
    # first corpus past the cap: joint growth engages
    assert emb_adaptive_bits(131073) == 13
    assert emb_adaptive_bands(131073) == EMB_BANDS_BY_EXTRA_BITS[1]
    # the 300x fixture (600k vectors): 15 bits / 118 bands
    assert emb_adaptive_bits(600_000) == 15
    assert emb_adaptive_bands(600_000) == EMB_BANDS_BY_EXTRA_BITS[3]
    # monotone, capped
    prev_bits, prev_bands = 0, 0
    for exp in range(1, 24):
        n = 1 << exp
        bits, bands = emb_adaptive_bits(n), emb_adaptive_bands(n)
        assert bits >= prev_bits and bands >= prev_bands
        prev_bits, prev_bands = bits, bands
    assert prev_bits == EMB_MAX_PLANES_PER_BAND
    assert prev_bands == EMB_BANDS_BY_EXTRA_BITS[-1]


def test_plane_index_regions_are_disjoint_and_sql_invertible():
    """Injectivity over the FULL (band, bit) domain -- a collision
    would silently correlate two bits -- plus exact round-trip through
    the SQL ``planes`` CTE decode for both regions."""
    max_bands = EMB_BANDS_BY_EXTRA_BITS[-1]

    def sql_band(p: int) -> int:  # _PLANE_BAND_EXPR verbatim
        if p < EMB_EXT_PLANE_BASE:
            return (p % EMB_N_PLANES) // EMB_PLANES_PER_BAND
        return EMB_BANDS + (p - EMB_EXT_PLANE_BASE) // EMB_MAX_PLANES_PER_BAND

    def sql_bit(p: int) -> int:  # _PLANE_BIT_EXPR verbatim
        if p < EMB_EXT_PLANE_BASE:
            return (p % EMB_PLANES_PER_BAND) + EMB_PLANES_PER_BAND * (
                p // EMB_N_PLANES
            )
        return (p - EMB_EXT_PLANE_BASE) % EMB_MAX_PLANES_PER_BAND

    seen: set[int] = set()
    for band in range(max_bands):
        for j in range(EMB_MAX_PLANES_PER_BAND):
            p = _emb_plane_index(band, j)
            assert 0 <= p < EMB_N_PLANES_TOTAL, (band, j, p)
            assert p not in seen, (band, j, p)
            seen.add(p)
            assert sql_band(p) == band, (band, j, p)
            assert sql_bit(p) == j, (band, j, p)
            if band < EMB_BANDS and j < EMB_PLANES_PER_BAND:
                # historical base layout, bit-for-bit
                assert p == EMB_PLANES_PER_BAND * band + j


def test_planes_cte_decode_matches_python_in_duckdb():
    """Run the actual SQL decode arithmetic (_PLANE_BAND_EXPR /
    _PLANE_BIT_EXPR inside _EMB_BANDS_SQL) in DuckDB over every plane
    index and compare to the Python layout -- the Python<->SQL bridge
    for the extension region, checked in the engine that executes it."""
    duckdb = pytest.importorskip("duckdb")
    from os___mapreduceframework_spark.operators.minhash import (
        _PLANE_BAND_EXPR,
        _PLANE_BIT_EXPR,
    )

    rows = duckdb.sql(
        f"SELECT p, {_PLANE_BAND_EXPR} AS band, {_PLANE_BIT_EXPR} AS bit"
        f" FROM range(0, {EMB_N_PLANES_TOTAL}) r(p) ORDER BY p"
    ).fetchall()
    assert len(rows) == EMB_N_PLANES_TOTAL
    for p, band, bit in rows:
        assert _emb_plane_index(band, bit) == p, (p, band, bit)


def test_widening_only_prepends_high_bits_mask_off_identity(spark):
    """The extension is INVISIBLE below its threshold: for base bands,
    a bucket computed at any wider nbits, masked to the lower width,
    equals the narrow bucket exactly -- extension planes only add high
    bits. Forced via the n_vectors parameter on real Spark dataflows
    (the corpus itself stays tiny)."""
    import random

    rng = random.Random(7)
    dim = 8
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(40)],
        "vec_id long, e array<double>",
    )

    def buckets(n_vectors: int) -> dict:
        rows = embedding_band_buckets(df, dim=dim, n_vectors=n_vectors).collect()
        return {(r["vec_id"], r["band"]): r["bucket"] for r in rows}

    b6 = buckets(100)        # 6 bits, 32 bands (fixture scale)
    b12 = buckets(131072)    # 12 bits, 32 bands (round-6 cap)
    b13 = buckets(131073)    # 13 bits, 50 bands (first extension step)
    b15 = buckets(600_000)   # 15 bits, 118 bands (the 300x fixture)

    assert len(b6) == 40 * 32
    assert len(b13) == 40 * 50
    assert len(b15) == 40 * 118
    for key, v6 in b6.items():
        assert b12[key] & 63 == v6, key
        assert b13[key] & 63 == v6, key
        assert b15[key] & 63 == v6, key
    for key, v12 in b12.items():
        assert b13[key] & ((1 << 12) - 1) == v12, key
        assert b15[key] & ((1 << 12) - 1) == v12, key
    # extension-band buckets agree across widths on their shared bits
    # too (same planes, same region)
    for (vid, band), v13 in b13.items():
        if band >= EMB_BANDS:
            assert b15[(vid, band)] & ((1 << 13) - 1) == v13


def test_extension_band_buckets_match_pure_python_reference(spark):
    """Extension-band signatures (band >= 32) against an independent
    pure-Python recomputation from _plane_weights -- the same weights
    the DuckDB oracle derives in SQL."""
    vecs = {1: [0.5, -0.25, 1.0, 0.125], 2: [-1.0, 2.0, -0.5, 0.75]}
    dim = 4
    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vec_id long, e array<double>"
    )
    n_forced = 131073  # 13 bits / 50 bands
    rows = embedding_band_buckets(df, dim=dim, n_vectors=n_forced).collect()
    got = {(r["vec_id"], r["band"]): r["bucket"] for r in rows}
    assert len(got) == 2 * 50
    for vid, v in vecs.items():
        for band in range(50):
            expect = 0
            for j in range(13):
                w = _plane_weights(_emb_plane_index(band, j), dim)
                s = sum(wi * xi for wi, xi in zip(w, v))
                if s >= 0:
                    expect |= 1 << j
            assert got[(vid, band)] == expect, (vid, band)


# ---------------------------------------------------------------------------
# keep-first span APPLY: exactly one survivor per duplicated span
# ---------------------------------------------------------------------------


def test_keep_first_apply_leaves_exactly_one_span_occurrence(spark):
    """End-to-end keep-first (VERDICT r6 item 7): plant the same token
    run in several docs (and twice within one doc); after
    apply_removal_spans(keep_first_span_duplicates(...)), EXACTLY ONE
    occurrence of each planted span survives in the cleaned corpus --
    the least-(doc_id, start) one -- while the drop-all apply removes
    every occurrence. Non-duplicated tokens are untouched."""
    from os___mapreduceframework_spark.operators.dedup import (
        apply_removal_spans,
        exact_span_duplicates,
        keep_first_span_duplicates,
    )

    w = 5
    span_x = [f"x{i}" for i in range(7)]   # cross-doc duplicated run
    span_y = [f"y{i}" for i in range(6)]   # within-doc duplicated run
    docs = [
        # doc 1: canonical home of span_x
        (1, [f"a{i}" for i in range(5)] + span_x + [f"A{i}" for i in range(5)]),
        # doc 2: second copy of span_x + both copies of span_y
        (2, span_y + [f"b{i}" for i in range(5)] + span_x
            + [f"B{i}" for i in range(5)] + span_y),
        # doc 3: third copy of span_x, plus unique filler
        (3, [f"c{i}" for i in range(6)] + span_x + [f"C{i}" for i in range(6)]),
    ]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )

    def occurrences(cleaned: dict, span: list) -> int:
        needle = " ".join(span)
        return sum(t.count(needle) for t in cleaned.values())

    kept = {
        r["doc_id"]: r["cleaned_text"]
        for r in apply_removal_spans(df, keep_first_span_duplicates(df, w=w))
        .collect()
    }
    assert occurrences(kept, span_x) == 1
    assert occurrences(kept, span_y) == 1
    # the survivor is the least-(doc_id, start) occurrence
    assert " ".join(span_x) in kept[1]
    assert kept[2].startswith(" ".join(span_y))
    # non-duplicated tokens all survive, order intact
    assert kept[3] == " ".join([f"c{i}" for i in range(6)]
                               + [f"C{i}" for i in range(6)])

    dropped = {
        r["doc_id"]: r["cleaned_text"]
        for r in apply_removal_spans(df, exact_span_duplicates(df, w=w))
        .collect()
    }
    assert occurrences(dropped, span_x) == 0
    assert occurrences(dropped, span_y) == 0


def test_scored_pairs_match_bucket_pairs_plus_verify(spark):
    """embedding_scored_pairs (score-in-bucket, the r7 verify-shuffle
    fix) must reproduce EXACTLY the pairs and rounded cosines of the
    r6 composition it replaced: bucket_pairs over the band rows, then
    per-pair _cosine_prenorm against the corpus. A small cap forces
    hot-bucket salting AND bridge pairs through both paths; zero
    vectors pin the NULL-cosine guard."""
    import pyspark.sql.functions as F

    from os___mapreduceframework_spark.operators.minhash import (
        _cosine_prenorm,
        _norm,
        bucket_pairs,
        embedding_band_buckets,
        embedding_scored_pairs,
    )

    dim, cap = 8, 4
    rows = []
    # a hot block: 30 near-identical vectors (same signs everywhere)
    # -> one bucket per band with 30 members >> cap
    for i in range(30):
        rows.append((i, [1.0 + 0.001 * i * (d + 1) for d in range(dim)]))
    # scattered vectors + two zero vectors (cosine NULL guard)
    for i in range(30, 60):
        rows.append(
            (i, [((i * 31 + d * 17) % 7 - 3) * 1.0 for d in range(dim)])
        )
    rows.append((60, [0.0] * dim))
    rows.append((61, [0.0] * dim))
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    n = len(rows)

    scored = {
        (r["id_a"], r["id_b"]): r["cs"]
        for r in embedding_scored_pairs(
            emb, dim=dim, n_vectors=n, cap=cap
        ).collect()
    }

    bands = embedding_band_buckets(emb, dim=dim, n_vectors=n)
    cand = bucket_pairs(bands, "vec_id", ("band", "bucket"), cap=cap)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        _norm("e").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        _norm("e").alias("nb"),
    )
    ref = {
        (r["id_a"], r["id_b"]): r["cs"]
        for r in cand.join(a, "id_a")
        .join(b, "id_b")
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
        .collect()
    }
    assert scored == ref
    # the hot block actually exercised the guard: some pair of its
    # members must be bridge-connected rather than all-pairs
    hot = [(x, y) for (x, y) in ref if x < 30 and y < 30]
    assert len(hot) < 30 * 29 // 2 and len(hot) > 0
    # zero vectors banded together and scored NULL
    assert any(
        v is None for (x, y), v in ref.items() if x == 60 and y == 61
    )
    # min_cs pushdown identity (the 2M-vector disk fix): filtering
    # BELOW the pair de-dup must equal filtering the de-duped stream --
    # every occurrence of a pair carries equal cs, so max-after-filter
    # == filter-after-max. Same hostile corpus: hot block (salted +
    # bridge paths), scattered vectors, zero vectors (NULL cs must be
    # dropped by the pushed filter exactly as the consumer's own
    # threshold would drop the NULL row).
    for floor in (0.30, 0.90):
        pushed = {
            (r["id_a"], r["id_b"]): r["cs"]
            for r in embedding_scored_pairs(
                emb, dim=dim, n_vectors=n, cap=cap, min_cs=floor
            ).collect()
        }
        post = {
            k: v
            for k, v in scored.items()
            if v is not None and v >= floor
        }
        assert pushed == post


# ---------------------------------------------------------------------------
# Gram-matrix vectorized snap: the arbitrary-precision fallback branch.
# The r7 Arrow-batched rewrite int64-sums each chunk under a rigorous
# max|q| * rows < 2^62 bound; vectors past ~1e6 magnitude (products over
# ~4.6e18 milli-units) must take the exact Python-int path instead. No
# fixture reaches that regime, so this test pins it directly, alongside
# ragged rows, NaN products, duplicates, and an all-dims-NULL cell.
def test_gram_matrix_fallback_matches_exact_integer_reference(
    spark, tmp_path
):
    import math

    import pandas as pd

    rows = [
        [2.0e9, -3.0e9, 1.5],          # products to 9e18: fallback regime
        [2.0e9, -3.0e9, 1.5],          # duplicate row counts twice
        # dim 3 exists ONLY here and only as NaN: its cells must still
        # appear in the output, as NULL g (all products dropped)
        [1.25, -0.75, float("nan"), float("nan")],
        [0.0625, 1.0],                 # ragged; 0.0625*1000 = 62.5 exactly
    ]
    pdf = pd.DataFrame(
        {"vec_id": range(len(rows)), "embedding": rows}
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/embeddings.parquet")

    from os___mapreduceframework_spark.operators.similarity import (
        q_embedding_gram_matrix,
    )

    got = {
        (r["i"], r["j"]): r["g"]
        for r in q_embedding_gram_matrix(spark, sf_dir).collect()
    }

    # exact integer reference: per-row snap (half away from zero), skip
    # non-finite, arbitrary-precision sum, then the same /1000 round
    acc: dict = {}
    cells = set()
    for v in rows:
        for i in range(len(v)):
            for j in range(i, len(v)):
                cells.add((i, j))
                p = v[i] * v[j] * 1000.0
                if not math.isfinite(p):
                    continue
                q = int(math.copysign(math.floor(abs(p) + 0.5), p))
                acc[(i, j)] = acc.get((i, j), 0) + q
    ref = {
        c: (round(float(acc[c]) / 1000.0, 3) if c in acc else None)
        for c in cells
    }
    assert got == ref
    # the fallback regime actually produced a > int64 cell
    assert any(abs(x) > 2**62 for x in acc.values())
    # the all-non-finite cell is present with NULL g, not absent
    assert (3, 3) in got and got[(3, 3)] is None
    # the half-away-from-zero case is exercised: the ragged row's
    # 0.0625 * 1.0 product lands on exactly 62.5 milli-units (a dyadic
    # rational), which ROUND takes to 63 and numpy's half-even to 62 --
    # its cell also carries -937.5 from the NaN row's finite dims, so
    # the exact tail is (2*-6e21) - 938 + 63
    assert acc[(0, 1)] % 1000 == (-938 + 63) % 1000


# --- production-threshold (strict) banding: round-7 session-3 family ---

from os___mapreduceframework_spark.operators.minhash import (  # noqa: E402
    EMB_STRICT_BANDS_BY_NBITS,
    EMB_STRICT_RECALL,
    EMB_STRICT_THRESHOLD,
    emb_bands_for_threshold,
    emb_strict_bands,
    embedding_scored_pairs,
)


def test_strict_band_table_is_minimal_recall_holding_schedule():
    """EMB_STRICT_BANDS_BY_NBITS must equal the minimal L(nbits) with
    banded collision probability >= EMB_STRICT_RECALL at cos =
    EMB_STRICT_THRESHOLD for every adaptive width 6..18 -- re-derived
    from the hyperplane collision probability, compared to the pinned
    constants both engines embed, and minimality-checked (L-1 bands
    must NOT reach the recall target)."""
    p = 1 - math.acos(EMB_STRICT_THRESHOLD) / math.pi
    assert len(EMB_STRICT_BANDS_BY_NBITS) == (
        EMB_MAX_PLANES_PER_BAND - EMB_PLANES_PER_BAND + 1
    )
    for i, bands in enumerate(EMB_STRICT_BANDS_BY_NBITS):
        nbits = EMB_PLANES_PER_BAND + i
        q = p**nbits
        assert bands == emb_bands_for_threshold(
            EMB_STRICT_THRESHOLD, nbits, EMB_STRICT_RECALL
        )
        assert 1 - (1 - q) ** bands >= EMB_STRICT_RECALL
        assert 1 - (1 - q) ** (bands - 1) < EMB_STRICT_RECALL
    # the strict family never exceeds the plane pool's band budget
    # (max band count the extension region can serve at full width)
    assert max(EMB_STRICT_BANDS_BY_NBITS) <= EMB_BANDS + (
        EMB_N_PLANES_TOTAL - EMB_EXT_PLANE_BASE
    ) // EMB_MAX_PLANES_PER_BAND
    # table ties to the corpus-size knob through the same bit widths
    assert emb_strict_bands(2000) == EMB_STRICT_BANDS_BY_NBITS[0]
    assert emb_strict_bands(2_000_000) == EMB_STRICT_BANDS_BY_NBITS[10]


def test_strict_near_dup_detects_planted_pairs(spark):
    """Plant 0.999-cosine twins in a random corpus; the strict-banded
    detector (6 bands at this scale) must flag EXACTLY the planted
    pairs at the 0.90 production threshold. Deterministic: fixed RNG
    seed, md5-derived planes -- the banding outcome is a pure function
    of the corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    dim = 32
    rows, planted = [], set()
    vid = 0
    for i in range(40):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((vid, v.tolist()))
        a = vid
        vid += 1
        if i % 4 == 0:  # every 4th vector gets a near-identical twin
            t = v + rng.normal(size=dim) * 0.01
            t /= np.linalg.norm(t)
            rows.append((vid, t.tolist()))
            planted.add((a, vid))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, e array<double>")
    scored = embedding_scored_pairs(
        emb, dim=dim, n_vectors=len(rows), nbands=emb_strict_bands(len(rows))
    )
    got = {
        (r.id_a, r.id_b)
        for r in scored.filter(F.col("cs") >= EMB_STRICT_THRESHOLD).collect()
    }
    assert got == planted
