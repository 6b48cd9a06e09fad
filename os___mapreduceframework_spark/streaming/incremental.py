"""Incremental (streaming) deduplication: cluster ids assigned as
documents arrive.

The batch dedup operators (operators.dedup) recompute clusters from the
full corpus; a production ingest pipeline instead sees documents as a
stream and must answer "is this a duplicate of anything seen so far?"
at arrival time. That is arbitrary keyed state -- exactly what
``applyInPandasWithState`` provides: the stream is hash-partitioned by
content fingerprint, each fingerprint group owns a tiny state record
(the canonical doc_id first seen for that fingerprint), and every
incoming document is emitted immediately with its cluster assignment.

Semantics (first-seen-wins, the standard ingest-dedup contract):

- the first document observed for a fingerprint becomes the cluster
  canonical; ties inside one micro-batch break by min(doc_id) so the
  assignment is deterministic under any partitioning;
- every later document with the same fingerprint is marked a duplicate
  of that canonical, including later micro-batches (state persists);
- state per fingerprint is one long -- at 100 TB the state store holds
  one entry per *distinct* document, it never stores text. With a
  RocksDB state store backend and watermark-based TTL (drop fingerprints
  older than the dedup horizon) the state stays bounded on unbounded
  streams.

The reference has no streaming surface (SURVEY.md section 2.3); this is
charter scope. Its grouping contract is the reference's shuffle
(MapReduceFramework.cpp:166-230): all values of one key meet in one
place -- here, one state partition, incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.streaming.windows import run_to_completion

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (one file -> one
    micro-batch with availableNow; multi-file dirs replay as several
    batches, which tests/test_streaming_incremental.py exercises)."""
    return (
        spark.readStream.format("parquet")
        .schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def incremental_dedup(docs: DataFrame) -> DataFrame:
    """Streaming first-seen dedup over a (doc_id, fp) stream.

    ``docs`` must have columns ``doc_id`` (long) and ``fp`` (string
    fingerprint). Returns a streaming frame of
    ``(doc_id, cluster_id, is_duplicate)`` in update mode: one row per
    incoming document, emitted in the micro-batch it arrives in.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assign(key, pdfs, state: GroupState):
        if state.exists:
            (canonical,) = state.get
        else:
            canonical = None
        out = []
        for pdf in pdfs:
            # deterministic within a batch: process ids ascending so the
            # batch-local canonical is min(doc_id), not arrival order
            for doc_id in sorted(int(d) for d in pdf["doc_id"]):
                if canonical is None:
                    canonical = doc_id
                out.append((doc_id, canonical, int(doc_id != canonical)))
        state.update((canonical,))
        yield pd.DataFrame(out, columns=["doc_id", "cluster_id", "is_duplicate"])

    return docs.groupBy("fp").applyInPandasWithState(
        assign,
        outputStructType="doc_id long, cluster_id long, is_duplicate int",
        stateStructType="canonical long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_incremental_dedup",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
           CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT)
             AS is_duplicate
    FROM documents
    ORDER BY doc_id
    """,
    doc="Incremental dedup over the documents stream: keyed state per "
    "content fingerprint assigns first-seen cluster ids at arrival time "
    "(applyInPandasWithState). The fixture arrives as one micro-batch, so "
    "first-seen == min(doc_id) and the batch window oracle applies; the "
    "cross-batch first-seen contract is pinned by "
    "tests/test_streaming_incremental.py.",
)
def q_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = documents_stream(spark, sf_dir).select(
        "doc_id", F.md5("text").alias("fp")
    )
    out = run_to_completion(incremental_dedup(docs), "update")
    return out.orderBy("doc_id")
