"""Shared test fixtures: one SparkSession per test run + an oracle-compare
helper mirroring the driver's DuckDB check (SURVEY.md section 5.2)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os___mapreduceframework_spark.session import get_session
from os___mapreduceframework_spark.sources import TABLES

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="tests", parallelism=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{TEST_SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Canonical form: columns sorted by name, every value stringified,
    rows sorted -- order-insensitive, like the driver's value hash."""
    df = df[sorted(df.columns)]

    def cell(v):
        if hasattr(v, "tolist"):  # numpy array/scalar (duckdb .df() arrays)
            v = v.tolist()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v) if not isinstance(v, dict) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        if isinstance(v, bytes):
            return v.hex()
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    got = spark_df.toPandas()
    want = duck_con.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"schema mismatch: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} duckdb={len(want)}"
    g, w = _canon(got), _canon(want)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
