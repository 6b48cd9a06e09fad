"""MergeTable: bucket-scoped copy-on-write MERGE semantics.

The contract under test is the one that matters at 100 TB: a merge's
I/O is proportional to the buckets its update keys hash into, never to
the table -- pinned here by asserting untouched buckets' files are
byte-identical (same paths, sizes, mtimes) across a merge.
"""

from __future__ import annotations

import os
import pathlib
import tempfile

import pytest
from pyspark.sql import functions as F

from os___mapreduceframework_spark.sinks import MergeTable


def _table(spark, n_buckets=8):
    path = tempfile.mkdtemp(prefix="merge_table_") + "/t"
    return MergeTable(spark, path, keys=["k"], n_buckets=n_buckets)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _file_state(path):
    out = {}
    for p in pathlib.Path(path).rglob("*.parquet"):
        st = p.stat()
        out[str(p)] = (st.st_size, st.st_mtime_ns)
    return out


def test_upsert_updates_matched_inserts_unmatched(spark):
    t = _table(spark)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"))
    t.merge(spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"))
    assert _rows(t.read()) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_merge_creates_table_when_missing(spark):
    t = _table(spark)
    t.merge(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert _rows(t.read()) == [(1, "a")]


def test_merge_rewrites_only_affected_buckets(spark):
    t = _table(spark, n_buckets=8)
    base = spark.range(0, 400).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t.overwrite(base)
    before = _file_state(t.path)
    # one update key -> exactly one affected bucket
    t.merge(spark.createDataFrame([(7, -1)], "k long, v long"))
    after = _file_state(t.path)
    from pyspark.sql import Row

    bucket = spark.createDataFrame([Row(k=7)]).select(
        F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
    ).collect()[0]["b"]
    touched_dir = f"__bucket={bucket}"
    untouched_before = {p: s for p, s in before.items() if touched_dir not in p}
    untouched_after = {p: s for p, s in after.items() if touched_dir not in p}
    assert untouched_before == untouched_after, "untouched buckets were rewritten"
    assert {p for p in before if touched_dir in p} != {
        p for p in after if touched_dir in p
    } or before != after, "affected bucket was not rewritten"
    got = dict((r["k"], r["v"]) for r in t.read().collect())
    assert got[7] == -1 and got[8] == 16 and len(got) == 400


def test_delete_scoped_and_removes_emptied_bucket(spark):
    t = _table(spark, n_buckets=4)
    t.overwrite(spark.range(0, 100).select(F.col("id").alias("k"), F.lit("x").alias("v")))
    before = _file_state(t.path)
    # delete EVERY row of one bucket: its partition dir must disappear
    t.delete(F.pmod(F.xxhash64("k"), F.lit(4)) == 2)
    after = _file_state(t.path)
    assert not any("__bucket=2" in p for p in after)
    untouched = {p: s for p, s in before.items() if "__bucket=2" not in p}
    assert untouched == {p: s for p, s in after.items()}
    n_deleted = (
        spark.range(0, 100).filter(F.pmod(F.xxhash64("id"), F.lit(4)) == 2).count()
    )
    assert n_deleted > 0 and t.read().count() == 100 - n_deleted


def test_merge_replay_idempotent(spark):
    t = _table(spark)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    upd = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    t.merge(upd)
    once = _rows(t.read())
    t.merge(upd)  # replayed batch (foreachBatch at-least-once delivery)
    assert _rows(t.read()) == once


def test_delete_keeps_null_predicate_rows(spark):
    """DELETE removes rows where the predicate IS TRUE; rows where it
    evaluates NULL must be kept (SQL DELETE semantics), even when they
    share a bucket with true matches."""
    t = _table(spark, n_buckets=1)  # one bucket: everything co-located
    t.overwrite(
        spark.createDataFrame(
            [(1, "old"), (2, None), (3, "new")], "k long, status string"
        )
    )
    t.delete(F.col("status") == "old")
    got = {(r["k"], r["status"]) for r in t.read().collect()}
    assert got == {(2, None), (3, "new")}


def test_empty_table_round_trip(spark):
    """An EMPTY table is still a table: at scale a selective backfill
    or a full purge routinely leaves zero rows, and the next merge must
    find the table (not re-seed it). The _schema.json metadata carries
    the schema parquet inference can no longer provide."""
    t = _table(spark)
    empty = spark.createDataFrame([], "k long, v string")
    t.overwrite(empty)
    assert t.exists()
    assert t.read().count() == 0
    assert t.read().columns == ["k", "v"]
    # merge into the EXISTING empty table upserts (not first-write)
    t.merge(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert _rows(t.read()) == [(1, "a")]
    # delete back down to zero rows; the table stays readable
    t.delete(F.col("k") >= 0)
    assert t.exists() and t.read().count() == 0
    t.merge(spark.createDataFrame([(2, "b")], "k long, v string"))
    assert _rows(t.read()) == [(2, "b")]
