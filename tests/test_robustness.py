"""Harness-contract robustness: path quirks, registry idempotence,
empty-result paths, and clean failure on bad input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.operators.search import search_count
from os___mapreduceframework_spark.sources import load_table
from tests.conftest import TEST_SF_DIR


def test_registry_idempotent():
    first = registry.queries()
    second = registry.queries()
    assert set(first) == set(second)
    assert all(first[k] is second[k] for k in first)
    assert set(registry.oracle_sql()) <= set(first)


def test_trailing_slash_sf_dir(spark):
    a = registry.queries()["search_count"](spark, TEST_SF_DIR).collect()
    b = registry.queries()["search_count"](spark, TEST_SF_DIR + "/").collect()
    assert a == b


def test_nonexistent_sf_dir_raises_cleanly(spark):
    with pytest.raises(AnalysisException):
        load_table(spark, "/root/testdata/sf-nope", "part").collect()


def test_search_word_with_no_matches_is_empty(spark):
    part = load_table(spark, TEST_SF_DIR, "part")
    out = search_count(part, "zzz-no-such-substring", name_col="p_name")
    assert out.count() == 0


def test_every_query_returns_stable_schema(spark):
    """Two invocations of the same query produce the same schema (the
    driver smoke-checks schema stability)."""
    for name in ["search_count", "q1_pricing_summary", "dedup_simhash"]:
        fn = registry.queries()[name]
        s1 = fn(spark, TEST_SF_DIR).schema
        s2 = fn(spark, TEST_SF_DIR).schema
        assert s1 == s2, name


def test_filters_on_empty_result_compose(spark):
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    empty = li.filter(F.col("l_quantity") < -1)
    agg = empty.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    assert agg.count() == 0


def test_streaming_dir_source_tails_new_entries(spark):
    """The dir_entries Python Data Source also streams: a first
    availableNow run drains existing entries; files created afterwards
    are picked up by a second run resuming from the same checkpoint
    (mtime-watermark offsets persist)."""
    import os
    import tempfile

    from os___mapreduceframework_spark.sources.dir_source import (
        DirEntriesDataSource,
    )

    spark.dataSource.register(DirEntriesDataSource)
    root = tempfile.mkdtemp(prefix="dir_stream_")
    watched = os.path.join(root, "watched")
    os.makedirs(watched)
    ckpt = os.path.join(root, "ckpt")

    for f in ("a.txt", "b.txt"):
        open(os.path.join(watched, f), "w").write("x")

    def drain():
        seen = []

        def capture(batch_df, batch_id):
            seen.extend((r["dir"], r["name"]) for r in batch_df.collect())

        q = (
            spark.readStream.format("dir_entries")
            .option("paths", watched)
            .load()
            .writeStream.foreachBatch(capture)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return sorted(n for _, n in seen)

    assert drain() == ["a.txt", "b.txt"]

    # later-created entries arrive incrementally on resume
    import time

    time.sleep(0.01)  # ensure a strictly larger mtime_ns
    open(os.path.join(watched, "c.txt"), "w").write("x")
    assert drain() == ["c.txt"]


def test_worker_import_ship_failure_warns(monkeypatch):
    """A failed addPyFile of the package zip must warn, not pass silently
    (VERDICT r5 item 5): external sessions then fail much later with an
    opaque worker ImportError unless the cause is surfaced here."""
    import warnings

    class _FakeSC:
        def addPyFile(self, path):  # pragma: no cover - never reached
            raise AssertionError("addPyFile should not be reached")

    class _FakeSpark:
        sparkContext = _FakeSC()

    def _boom(*a, **k):
        raise OSError("disk full (forced by test)")

    monkeypatch.setattr(registry.shutil, "make_archive", _boom)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registry._ensure_worker_imports(_FakeSpark())
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("addPyFile" in m and "disk full" in m for m in msgs)
    # the guard flag is still set: the failure is reported once, not per query
    assert _FakeSpark.sparkContext._graft_pyfiles_sent is True
