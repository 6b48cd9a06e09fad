"""UDTF map path: reference Map/Emit2 semantics through Spark 4 UDTFs.

Pins the contract of SURVEY.md section 1.1 on the UDTF realization:
0..n emissions per input row (flatMap multiplicity), typed emission
schema, and equivalence with both the native search_count query and the
compat-API mapreduce_search on the same input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.compat.udtf_map import map_as_udtf
from tests.conftest import TEST_SF_DIR


def test_multiplicity_zero_one_many(spark):
    df = spark.createDataFrame(
        [("skip", "x"), ("one", "x"), ("fan", "x")], "k string, v string"
    )

    def m(k, v):
        if k == "one":
            yield k, 1
        elif k == "fan":
            for i in range(3):
                yield f"{k}{i}", i

    out = map_as_udtf(df, m, "key string, value int").collect()
    got = sorted((r.key, r.value) for r in out)
    assert got == [("fan0", 0), ("fan1", 1), ("fan2", 2), ("one", 1)]


def test_udtf_search_equals_native_and_compat(spark):
    qs = registry.queries()
    native = qs["search_count"](spark, TEST_SF_DIR).collect()
    via_udtf = qs["udtf_search_count"](spark, TEST_SF_DIR).collect()
    via_compat = qs["mapreduce_search"](spark, TEST_SF_DIR).collect()
    as_pairs = lambda rows: [(r[0], int(r[1])) for r in rows]
    assert as_pairs(via_udtf) == as_pairs(native)
    assert as_pairs(via_compat) == as_pairs(native)


def test_udtf_reduce_side_is_native_partial_agg(spark):
    """The aggregate after the UDTF must keep map-side partials -- the
    hybrid's advantage over an opaque applyInPandas reduce."""
    from os___mapreduceframework_spark.plans.audit import executed_plan

    qs = registry.queries()
    plan = executed_plan(qs["udtf_search_count"](spark, TEST_SF_DIR))
    assert "partial_" in plan, plan[:2000]
