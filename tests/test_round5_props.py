"""Property tests for the round-5 primitives.

``bucket_pairs`` (the LSH hot-bucket guard) and ``_bpe_merge_expr``
(the scan-local BPE apply fold) both replace a simple formulation with
a scale-safe one; these properties pin that the replacement preserves
the semantics the consumers rely on, for arbitrary inputs the fixture
sweeps cannot produce.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference BPE apply: greedy left-to-right non-overlapping."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    pair=st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
)
def test_bpe_merge_fold_equals_greedy_reference(spark, words, pair):
    from os___mapreduceframework_spark.operators.text import _bpe_merge_expr

    a, b = pair
    df = spark.createDataFrame([(w,) for w in words], ["word"]).select(
        "word",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    got = {
        r["word"]: list(r["m"])
        for r in df.select(
            "word", _bpe_merge_expr(F.col("syms"), F.lit(a), F.lit(b)).alias("m")
        ).collect()
    }
    for w in set(words):
        assert got[w] == _greedy_merge(list(w), a, b), (w, a, b, got[w])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    members=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    cap=st.integers(min_value=1, max_value=8),
)
def test_bucket_pairs_bound_subset_connectivity(spark, members, cap):
    """For ONE bucket with arbitrary members and any cap:

    - guarded pairs are a subset of the all-pairs clique;
    - pair count respects the O(n*cap) bound
      (ceil(n/cap) * C(cap,2) + ceil(n/cap) - 1);
    - the pair graph spans the bucket (single connected component);
    - cap >= n reproduces the clique exactly.
    """
    from os___mapreduceframework_spark.operators.minhash import bucket_pairs

    ids = sorted(set(members))
    n = len(ids)
    sigs = spark.createDataFrame(
        [(i, 0, "s") for i in ids], ["doc_id", "band", "sig"]
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in bucket_pairs(sigs, "doc_id", ("band", "sig"), cap=cap).collect()
    }
    clique = {(x, y) for x in ids for y in ids if x < y}
    assert pairs <= clique
    n_sub = -(-n // cap)
    assert len(pairs) <= n_sub * (cap * (cap - 1) // 2) + (n_sub - 1)
    # connectivity via union-find over the guarded pairs
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        parent[find(x)] = find(y)
    assert len({find(i) for i in ids}) == 1 or n == 1
    if cap >= n:
        assert pairs == clique
