"""Property + unit tests for the run_map_reduce compat API vs a pure-Python
oracle (SURVEY.md section 5.2 item 4; semantics from section 1.1)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from os___mapreduceframework_spark.compat import run_map_reduce


def mr_oracle(pairs, map_fn, reduce_fn):
    """10-line dict-of-lists oracle (FIXTURES.md section B)."""
    groups = defaultdict(list)
    for k, v in pairs:
        for k2, v2 in map_fn(k, v):
            groups[k2].append(v2)
    out = []
    for k2, vals in groups.items():
        out.extend(reduce_fn(k2, vals))
    return sorted(out)


def canon(rows):
    """Order-insensitive within key: reference's unstable sort
    (MapReduceFramework.cpp:341) leaves intra-key order unspecified."""
    return sorted((str(k), str(v)) for k, v in rows)


pair_lists = st.lists(
    st.tuples(st.text(alphabet="abcxyz", max_size=4), st.text(alphabet="01", max_size=2)),
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=pair_lists)
def test_wordcount_shape_matches_oracle(spark, pairs):
    """flatMap multiplicities + value-equality grouping + ascending sort."""

    def map_fn(k, v):  # emit one pair per char of the key: 0..n emissions
        return [(ch, 1) for ch in k]

    def reduce_fn(k, vals):
        return [(k, sum(vals))]

    got = run_map_reduce(
        pairs,
        map_fn,
        reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
        spark=spark,
    ).collect()
    assert canon([(r.key, r.value) for r in got]) == canon(mr_oracle(pairs, map_fn, reduce_fn))
    keys = [r.key for r in got]
    assert keys == sorted(keys)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=pair_lists)
def test_rdd_fallback_matches_oracle(spark, pairs):
    """Opaque-object path: same semantics through pickled RDDs."""

    def map_fn(k, v):
        return [(k + v, len(v))] if k else []

    def reduce_fn(k, vals):
        return [(k, max(vals))] if len(vals) > 1 else [(k, min(vals))]

    got = run_map_reduce(
        pairs, map_fn, reduce_fn, mid_schema=None, out_schema=None, spark=spark
    ).collect()
    assert canon([(r.key, r.value) for r in got]) == canon(mr_oracle(pairs, map_fn, reduce_fn))


def test_reduce_may_emit_zero_or_many(spark):
    """Reduce is flatMap-shaped (0..n emissions, MapReduceFramework.cpp:147)."""

    def map_fn(k, v):
        return [(k, v)]

    def reduce_fn(k, vals):
        if k == "drop":
            return []
        return [(f"{k}#{i}", v) for i, v in enumerate(sorted(vals))]

    got = run_map_reduce(
        [("drop", "1"), ("keep", "a"), ("keep", "b")],
        map_fn,
        reduce_fn,
        spark=spark,
    ).collect()
    assert [(r.key, r.value) for r in got] == [("keep#0", "a"), ("keep#1", "b")]


def test_empty_input(spark):
    got = run_map_reduce(
        [], lambda k, v: [(k, v)], lambda k, vs: [(k, len(vs))], spark=spark
    ).collect()
    assert got == []


def test_search_client_via_compat(spark):
    """The reference's Search client expressed through the compat API
    (Search.cpp:60-82): filter in Map, count in Reduce."""
    entries = [("d1", "foo.txt"), ("d2", "foo.txt"), ("d1", "bar"), ("d2", "xfoo")]
    # reference Map: key=filename, value=searchWord; emit (name, 1) on match
    pairs = [(name, "foo") for _, name in entries]

    def map_fn(name, word):
        return [(name, 1)] if word in name else []

    def reduce_fn(name, ones):
        return [(name, len(ones))]

    got = run_map_reduce(
        pairs,
        map_fn,
        reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
        spark=spark,
    ).collect()
    assert [(r.key, r.value) for r in got] == [("foo.txt", 2), ("xfoo", 1)]


def test_parallelism_override_controls_partitions(spark):
    """parallelism mirrors the reference's multiThreadLevel
    (MapReduceFramework.cpp:360, hard-coded 5 in Search.cpp:112): the
    reduce stage runs with exactly that many partitions, and results
    are identical regardless."""
    from os___mapreduceframework_spark.compat import run_map_reduce

    data = [(f"k{i % 7}", str(i)) for i in range(100)]
    df = spark.createDataFrame(data, schema="key string, value string")

    def map_fn(k, v):
        return [(k, 1)]

    def reduce_fn(k, vals):
        return [(k, len(vals))]

    out5 = run_map_reduce(
        df, map_fn, reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
        parallelism=5,
    )
    out_default = run_map_reduce(
        df, map_fn, reduce_fn,
        mid_schema="key string, value long",
        out_schema="key string, value long",
    )
    assert out5.collect() == out_default.collect()
    assert [r["key"] for r in out5.collect()] == sorted(f"k{i}" for i in range(7))
