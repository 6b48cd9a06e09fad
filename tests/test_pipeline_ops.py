"""Unit tests for the LLM-pipeline operators (dedup, similarity,
multimodal) on tiny literal DataFrames -- edge semantics the parity
sweep can't isolate."""

from __future__ import annotations

import pytest

from os___mapreduceframework_spark.operators.dedup import (
    _shingles,
    lsh_candidates,
    minhash_signatures,
)
from os___mapreduceframework_spark.operators.multimodal import (
    decode_media,
    extract_features,
    fake_features,
    with_media_columns,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_shingles_short_text_dropped(spark):
    """Texts with <3 words produce no shingles (guard, not [1,0] descend)."""
    df = _docs(spark, [(1, "one two"), (2, "a b c d")])
    got = {(r.doc_id, r.shingle) for r in _shingles(df).collect()}
    assert got == {(2, "a b c"), (2, "b c d")}


def test_identical_docs_identical_signatures(spark):
    df = _docs(spark, [(1, "w x y z q r s t"), (2, "w x y z q r s t"), (3, "totally different words here now")])
    sigs = minhash_signatures(df).collect()
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r.doc_id, {})[r.h] = r.minhash
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[3]
    assert len(by_doc[1]) == 16


def test_identical_docs_become_lsh_candidates(spark):
    df = _docs(spark, [(1, "w x y z q r s t"), (2, "w x y z q r s t"), (3, "totally different words here now")])
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_fake_features_deterministic_and_bounded():
    f1 = fake_features(b"hello world")
    f2 = fake_features(b"hello world")
    assert f1 == f2
    assert len(f1) == 8
    assert all(0.0 <= v < 1.0 for v in f1)
    assert fake_features(b"other") != f1


def test_decode_media_zero_length_payload_is_value_error():
    """b'' must raise the module-wide ValueError for every modality --
    the wave module's bare EOFError leaked through until r6, so a
    zero-length blob in a 100 TB media column would have crashed the
    mapInPandas batch with an exception type no caller is contracted
    to catch (VERDICT r5 item 8: zero-length binary payloads)."""
    for mt in ["audio/wav", "image/ppm", "video/y4m"]:
        with pytest.raises(ValueError):
            decode_media(b"", mt)
    # fake_features must stay total on zero-length payloads (md5(b"")
    # is well-defined): the feature path never rejects a blob
    f = fake_features(b"")
    assert len(f) == 8 and all(0.0 <= v < 1.0 for v in f)


def test_decode_media_rejects_compressed_codecs():
    """Compressed codecs need PIL/ffmpeg (absent here): a plain
    unsupported-input ValueError, not a stub exception."""
    with pytest.raises(ValueError, match="unsupported media type"):
        decode_media(b"\x89PNG", "image/png")
    with pytest.raises(ValueError, match="unsupported media type"):
        decode_media(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_decode_media_y4m_roundtrip_and_edges():
    """The Y4M parser is a real YUV4MPEG2 reader: round-trips make_y4m,
    honors header tags in any order, and rejects wrong magic, missing
    dims, subsampled chroma, and truncated frames."""
    from os___mapreduceframework_spark.operators.multimodal import make_y4m

    d = decode_media(make_y4m(23), "video/y4m")
    assert (d["width"], d["height"]) == (23 % 6 + 4, 23 % 4 + 3)
    assert d["n_frames"] == 23 % 5 + 2
    assert d["frame_rate"] == "25:1"
    # frame t=1, pixel (x=0, y=0): Y = (5 + 23) % 256
    assert d["frames"][1][0] == (5 * 1 + 23) % 256
    for f in d["frames"]:
        assert len(f) == 3 * d["width"] * d["height"]
    # hand-built minimal stream: 1x1, one frame, tags reordered
    one = b"YUV4MPEG2 C444 H1 W1\nFRAME\n\x07\x08\x09"
    d2 = decode_media(one, "video/y4m")
    assert (d2["width"], d2["height"], d2["n_frames"]) == (1, 1, 1)
    assert list(d2["frames"][0]) == [7, 8, 9]
    with pytest.raises(ValueError, match="magic"):
        decode_media(b"MPEG\n", "video/y4m")
    with pytest.raises(ValueError, match="truncated y4m stream"):
        decode_media(b"YUV4MPEG2 W1 H1 C444", "video/y4m")
    with pytest.raises(ValueError, match="missing W/H"):
        decode_media(b"YUV4MPEG2 C444\nFRAME\n\x00\x00\x00", "video/y4m")
    with pytest.raises(ValueError, match="C444"):
        decode_media(b"YUV4MPEG2 W2 H2 C420\n", "video/y4m")
    with pytest.raises(ValueError, match="FRAME"):
        decode_media(b"YUV4MPEG2 W1 H1 C444\nBOGUS\n\x00\x00\x00", "video/y4m")
    with pytest.raises(ValueError, match="truncated y4m frame"):
        decode_media(b"YUV4MPEG2 W1 H1 C444\nFRAME\n\x00\x00", "video/y4m")
    # FRAME marker with no terminating newline must error, not hang
    with pytest.raises(ValueError, match="FRAME"):
        decode_media(b"YUV4MPEG2 W1 H1 C444\nFRAME", "video/y4m")


def test_decode_media_ppm_roundtrip_and_edges():
    """The P6 parser is a real Netpbm reader: round-trips make_ppm,
    tolerates header comments and extra whitespace, and rejects bad
    magic / truncated rasters."""
    from os___mapreduceframework_spark.operators.multimodal import make_ppm

    d = decode_media(make_ppm(17), "image/ppm")
    assert (d["width"], d["height"]) == (17 % 13 + 4, 17 % 9 + 4)
    assert d["pixels"][0] == 17 % 256  # (x=0,y=0,c=0)
    assert len(d["pixels"]) == 3 * d["width"] * d["height"]
    # comment + multi-whitespace header, 1x2 image
    payload = b"P6\n# a comment\n 1\t2 # trailing\n255\n" + bytes(6)
    d2 = decode_media(payload, "image/ppm")
    assert (d2["width"], d2["height"], d2["pixels"]) == (1, 2, [0] * 6)
    with pytest.raises(ValueError, match="magic"):
        decode_media(b"P5\n1 1\n255\n\x00", "image/ppm")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6\n2 2\n255\n\x00\x00", "image/ppm")
    # truncated headers must error, not hang (b"" is never whitespace,
    # so an unbounded token scan would loop forever)
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6", "image/ppm")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6\n1 1\n255", "image/ppm")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6\n# comment with no newline", "image/ppm")


def test_multimodal_pipeline_shapes(spark):
    df = _docs(spark, [(1, "ab cd"), (2, "x")])
    out = extract_features(with_media_columns(df)).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_bytes, r.n_space_bytes) for r in out] == [(1, 5, 1), (2, 1, 0)]
    assert len(out[0].feat) == 8
    assert out[0].feat == fake_features(b"ab cd")


def test_resize_fits_box_preserving_aspect(spark):
    """Long side lands exactly on the target; output never exceeds the
    box; byte budget caps the resized payload."""
    from os___mapreduceframework_spark.operators.multimodal import (
        RESIZE_TARGET,
        resize_media,
    )

    df = _docs(spark, [(100, "x" * 400), (639, "y" * 10)])
    out = resize_media(with_media_columns(df)).collect()
    assert len(out) == 2
    for r in out:
        assert r.out_w <= RESIZE_TARGET and r.out_h <= RESIZE_TARGET
        assert max(r.out_w, r.out_h) == RESIZE_TARGET
        assert r.n_bytes_out <= r.out_w * r.out_h


def test_frame_sample_capped_at_max_frames(spark):
    from os___mapreduceframework_spark import queries as registry
    from os___mapreduceframework_spark.operators.multimodal import MAX_FRAMES
    from tests.conftest import TEST_SF_DIR

    rows = registry.queries()["multimodal_frame_sample"](
        spark, TEST_SF_DIR
    ).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in per_doc.items():
        n_frames = doc_id % 300 + 30
        assert len(idxs) <= MAX_FRAMES, (doc_id, idxs)
        assert idxs[0] == 0 and all(i < n_frames for i in idxs)


def test_approx_distinct_error_bound(spark, duck):
    """HLL++ estimate within 15% of exact (rsd=0.05 default, ~8.6%
    observed at sf0.01)."""
    from os___mapreduceframework_spark import queries as registry
    from tests.conftest import TEST_SF_DIR

    ap = registry.queries()["approx_distinct"](spark, TEST_SF_DIR).toPandas()
    ex = duck.sql(
        "SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS eo "
        "FROM lineitem GROUP BY 1 ORDER BY 1"
    ).df()
    m = ap.sort_values("l_returnflag").reset_index(drop=True)
    assert (m["exact_orders"] == ex["eo"]).all()
    assert m["orders_within_tol"].all() and m["parts_within_tol"].all()


def test_connected_components_literal_graph(spark):
    """Min-label propagation on a known graph: {1-2, 2-3} and {10-11}
    plus the chain transitivity 1-2-3 -> one cluster labeled 1."""
    from os___mapreduceframework_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], schema="doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_embedding_near_banded_recall_and_precision(spark):
    """The banded-LSH near-dup query must be a strict SUBSET of the
    exact all-pairs form (precision 1.0 by construction: every candidate
    is cosine-verified) with recall >= 0.85 at the fixture's threshold.
    The exact form stays unregistered -- quadratic operators don't
    belong on the user surface."""
    from pyspark.sql import functions as F

    from os___mapreduceframework_spark.operators.dedup import (
        COSINE_NEAR_THRESHOLD,
        embedding_near_exact,
    )
    from os___mapreduceframework_spark.queries import queries
    from os___mapreduceframework_spark.sources import load_table
    from tests.conftest import TEST_SF_DIR

    got = {
        (r["vec_a"], r["vec_b"])
        for r in queries()["dedup_embedding_near"](spark, TEST_SF_DIR).collect()
    }
    emb = load_table(spark, TEST_SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_exact(emb, COSINE_NEAR_THRESHOLD).collect()
    }
    assert got <= exact, f"false positives: {got - exact}"
    assert len(got) >= 0.85 * len(exact), (len(got), len(exact))


# ---------------------------------------------------------------------------
# Property tests: count-min sketch and incremental view maintenance
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tokens=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
        min_size=1,
        max_size=60,
    )
)
def test_property_cms_never_undercounts_and_merges(spark, tokens):
    """For ANY token multiset: (1) every token's CMS estimate >= its
    true count (the sketch's guarantee); (2) the grid built from the
    whole set equals the cell-wise SUM of grids built from any split
    (mergeability -- the property that makes it distributed state)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from os___mapreduceframework_spark.operators.sketches import cms_cells

    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    cells = {(r["j"], r["cell"]): r["n"] for r in cms_cells(df).collect()}
    # (1) point estimates via the same hash family, computed in SQL
    probe = (
        spark.createDataFrame([(t,) for t in set(tokens)], "token string")
        .select("token", *[
            F.expr(
                f"((2 * {j} + 1) * (cast(conv(substr(md5(token), 1, 15), 16, 10)"
                f" as bigint) % 2147483647) + 7919 * {j} + 13)"
                f" % 2147483647 % 512"
            ).alias(f"c{j}")
            for j in range(4)
        ])
        .collect()
    )
    true = Counter(tokens)
    for r in probe:
        est = min(cells[(j, r[f"c{j}"])] for j in range(4))
        assert est >= true[r["token"]]
    # (2) mergeability: split the multiset in half, sum the grids
    half = len(tokens) // 2
    merged = Counter()
    for part in (tokens[:half], tokens[half:]):
        if not part:
            continue
        pdf = spark.createDataFrame([(t,) for t in part], "token string")
        for r in cms_cells(pdf).collect():
            merged[(r["j"], r["cell"])] += r["n"]
    assert dict(merged) == cells


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.dictionaries(
        st.integers(0, 15), st.integers(1, 500), min_size=1, max_size=10
    ),
    changes=st.dictionaries(
        st.integers(0, 25),
        st.one_of(st.none(), st.integers(1, 500)),  # None = delete
        min_size=1,
        max_size=10,
    ),
)
def test_property_ivm_refresh_equals_recompute(spark, tmp_path_factory, base, changes):
    """maintain_sum_count over a real table's change feed == full
    recompute of the view from the post-merge state, for arbitrary
    insert/update/delete batches."""
    from pyspark.sql import functions as F

    from os___mapreduceframework_spark.operators.ivm import maintain_sum_count
    from os___mapreduceframework_spark.sinks.snapshot_table import SnapshotMergeTable

    path = str(tmp_path_factory.mktemp("ivm_prop") / "t")
    t = SnapshotMergeTable(spark, path, keys=["k"], n_buckets=4)
    rows = [(k, k % 3, float(v)) for k, v in base.items()]
    t.overwrite(spark.createDataFrame(rows, "k long, g long, x double"))
    upserts = [
        (k, k % 3, float(v)) for k, v in changes.items() if v is not None
    ]
    deletes = {k for k, v in changes.items() if v is None}
    upd_df = spark.createDataFrame(
        upserts + [(k, k % 3, 0.0) for k in deletes], "k long, g long, x double"
    )

    def merge_fn(existing, updates):
        merged = existing.join(updates, ["k"], "left_anti").unionByName(updates)
        return merged.filter(~F.col("k").isin(list(deletes)) if deletes else F.lit(True))

    t.merge(upd_df, merge_fn=merge_fn)
    m0 = (
        t.read(version=0)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total"),
        )
    )
    got = {
        r["g"]: (r["n"], float(r["total"]))
        for r in maintain_sum_count(
            m0, t.changes(0, 1, before_image=True), "g", "x"
        ).collect()
    }
    want = {
        r["g"]: (r["n"], float(r["total"]))
        for r in t.read(version=1)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("x").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total"),
        )
        .collect()
    }
    assert got == want


def test_decode_media_ppm_property_roundtrip():
    """Property: any (w, h, raster) encodes to a P6 payload the parser
    inverts exactly."""
    from hypothesis import given, settings, strategies as st

    from os___mapreduceframework_spark.operators.multimodal import decode_media

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=20),
        data=st.data(),
    )
    def check(w, h, data):
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
                )
            )
        )
        payload = f"P6\n{w} {h}\n255\n".encode() + raster
        d = decode_media(payload, "image/ppm")
        assert (d["width"], d["height"]) == (w, h)
        assert bytes(d["pixels"]) == raster

    check()


def test_doc_ngrams_parameterized_width(spark):
    """doc_ngrams(n) must emit n-word grams, not module-default 3-grams
    with only the length filter parameterized."""
    from os___mapreduceframework_spark.operators.contamination import doc_ngrams

    df = _docs(spark, [(1, "a b c d e"), (2, "x y z")])
    g5 = doc_ngrams(df, n=5).collect()
    assert {r["doc_id"] for r in g5} == {1}  # doc 2 too short for 5-grams
    assert all(len(r["gram"].split(" ")) == 5 for r in g5)
    g3 = doc_ngrams(df, n=3).collect()
    assert {len(r["gram"].split(" ")) for r in g3} == {3}
    assert {r["doc_id"] for r in g3} == {1, 2}


def test_connected_components_long_chain_converges(spark):
    """Pointer jumping must collapse a chain far deeper than the
    iteration count (depth halves per round; plain one-hop min-label
    propagation would need diameter iterations and silently mislabel)."""
    from os___mapreduceframework_spark.operators.dedup import connected_components

    n = 40  # chain 0-1-2-...-40: diameter >> 8 iterations
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], schema="doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_iter=8).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_distributed_path_matches_driver(spark):
    """Both sides of the size gate must label identically: force the
    distributed pointer-jumping loop (driver_max_edges=0) on the same
    graphs the driver union-find handles, including a chain deeper
    than the iteration count."""
    from os___mapreduceframework_spark.operators.dedup import connected_components

    graphs = [
        [(1, 2), (2, 3), (10, 11)],
        [(i, i + 1) for i in range(40)],  # diameter >> 8 iterations
    ]
    for pairs in graphs:
        edges = spark.createDataFrame(pairs, schema="doc_a long, doc_b long")
        driver = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(edges).collect()
        }
        dist = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                edges, max_iter=8, driver_max_edges=0
            ).collect()
        }
        assert dist == driver


def test_decode_media_rejects_wide_pcm():
    """A 16-bit WAV must raise, not silently split each sample into two
    meaningless bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 4)
    with pytest.raises(ValueError, match="8-bit"):
        decode_media(buf.getvalue(), "audio/wav")


def test_zorder_fold_nonnegative_before_epoch(spark):
    """Orders dated before the 1995 epoch must fold to the same
    non-negative coordinate the Morton bits actually use -- a raw %
    yields a negative y whose span audit lies."""
    from pyspark.sql import functions as F

    from os___mapreduceframework_spark.operators.layout import _SPARK_Y

    df = spark.createDataFrame(
        [("1994-12-31",), ("1995-01-02",)], "d string"
    ).select(F.expr(_SPARK_Y.replace("o_orderdate", "cast(d as date)")).alias("y"))
    ys = [r["y"] for r in df.collect()]
    assert ys == [255, 1]
