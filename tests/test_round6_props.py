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
