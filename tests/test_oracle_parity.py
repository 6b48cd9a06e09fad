"""Mirror of the driver's correctness gate: every registered query with a
DuckDB oracle must hash-match it (here at sf0.001 for speed; the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from os___mapreduceframework_spark import queries as registry
from tests.conftest import TEST_SF_DIR, assert_matches_oracle

ALL = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = ALL[name](spark, TEST_SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = ALL[name](spark, TEST_SF_DIR)
    assert df.count() >= 0
