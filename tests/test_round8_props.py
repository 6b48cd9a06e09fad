"""Round-8 property pins.

1. ``embedding_scored_pairs`` rejects the min_cs + dedup=False mix
   (ADVICE r7: a dup-invariant consumer passing a floor would silently
   truncate neighbor lists below it -- no caller may combine them).
"""

from __future__ import annotations

import pytest

from os___mapreduceframework_spark.operators.minhash import (
    embedding_scored_pairs,
)


def test_scored_pairs_reject_min_cs_without_dedup(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, e array<double>"
    )
    with pytest.raises(ValueError, match="min_cs with dedup=False"):
        embedding_scored_pairs(emb, dim=2, n_vectors=2, dedup=False, min_cs=0.3)
