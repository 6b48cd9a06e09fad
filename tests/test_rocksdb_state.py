"""RocksDB state store: the at-scale backend for streaming state.

The default HDFS-backed state store keeps every key in executor JVM
heap -- fine for fixture-sized state, fatal at 100 TB where dedup state
is one entry per distinct document. Spark ships a RocksDB provider that
keeps state off-heap/on-disk with incremental checkpointing; these tests
pin that the engine's stateful operators run unchanged on it (the
provider is pure configuration, the operator code is identical) and that
the provider is actually in effect, not silently fallen back.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from os___mapreduceframework_spark.streaming.incremental import (
    documents_stream,
    incremental_dedup,
)
from tests.conftest import TEST_SF_DIR

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _dedup_with_provider(spark, provider: str | None):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    if provider:
        spark.conf.set(key, provider)
    try:
        docs = documents_stream(spark, TEST_SF_DIR).select(
            "doc_id", F.md5("text").alias("fp")
        )
        out = incremental_dedup(docs)
        name = f"rocksdb_sink_{abs(hash(provider)) % 10_000}"
        ckpt = tempfile.mkdtemp(prefix="rocksdb_ckpt_")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        rows = sorted(
            (int(r.doc_id), int(r.cluster_id), int(r.is_duplicate))
            for r in spark.table(name).collect()
        )
        return rows, q.lastProgress, ckpt
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_rocksdb_matches_default_provider(spark):
    default_rows, _, _ = _dedup_with_provider(spark, None)
    rocks_rows, progress, ckpt = _dedup_with_provider(spark, ROCKSDB)
    assert rocks_rows == default_rows
    # the provider really ran: RocksDB-specific metrics appear in the
    # state operator progress, and sst/log files land in the checkpoint
    state_ops = progress["stateOperators"]
    assert state_ops, progress
    custom = state_ops[0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in custom), sorted(custom)[:10]
    state_dir = os.path.join(ckpt, "state")
    assert os.path.isdir(state_dir)
