#!/usr/bin/env python
"""Span-dedup registry growth measurement (VERDICT r7 item 5).

`stream_incremental_spans`' state is the window-hash registry — it
grows with corpus spans and is NOT watermarked away (it is the dedup
memory). This script measures that growth directly, at 1x (sf0.1
documents) and 30x (scale_table replica fixture, built on the fly):

  * per micro-batch: registry bytes on disk (the on_batch hook) — the
    operator question is "does per-batch growth track NOVEL windows,
    not traffic";
  * after drain: append-log rows vs distinct hashes (re-append
    amplification), then `compact_span_registry` (fold to one row per
    hash) and a retention pass (retain_batches) — the two policy
    levers documented in SCALING.md round-8.

The registry is a parquet table, not a Spark state store, so the
HDFS-vs-RocksDB provider axis of SCALE_r07_stream*.json does not
apply; size-bytes here are provider-independent by construction.
Growth numbers (rows, bytes) are load-insensitive; wall seconds are
recorded but carry the shared-box caveat.

Usage: python scripts/span_registry_growth.py --out SCALE_r08_stream_spans.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

WORK = "/tmp/spark_graft_scale/span_registry_growth"
N_FILES = 10


def dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(d)
        for f in fs
    ) if os.path.isdir(d) else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_r08_stream_spans.json")
    ap.add_argument("--retain", type=int, default=5)
    args = ap.parse_args()

    from os___mapreduceframework_spark.session import get_session
    from os___mapreduceframework_spark.streaming.incremental import (
        compact_span_registry,
        incremental_span_dedup,
    )
    from scripts.make_scale_fixture import _strides, scale_table
    from scripts.stream_scale_bench import split_table

    spark = get_session(app_name="span_registry_growth")
    shutil.rmtree(WORK, ignore_errors=True)

    # 30x documents fixture (documents only — the stream's sole input)
    dir_30x = os.path.join(WORK, "sf3.0docs")
    os.makedirs(dir_30x, exist_ok=True)
    t = scale_table(
        "/root/testdata/sf0.1", "documents", 30, _strides("/root/testdata/sf0.1")
    )
    pq.write_table(t, os.path.join(dir_30x, "documents.parquet"))

    report = {
        "files_per_source": N_FILES,
        "retain_batches": args.retain,
        "note": "registry is a parquet table (foreachBatch), not a "
        "state store — provider-independent; rows/bytes are the "
        "load-insensitive signals on this shared box",
        "scales": {},
    }
    for label, src in (("1x", "/root/testdata/sf0.1"), ("30x", dir_30x)):
        docs_dir = os.path.join(WORK, label, "docs_src")
        n_rows = split_table(src, "documents", docs_dir, N_FILES)
        state = os.path.join(WORK, label, "state")
        registry_dir = os.path.join(state, "window_registry")
        growth: list[dict] = []

        def on_batch(batch_id: int) -> None:
            growth.append(
                {"batch": batch_id, "registry_bytes": dir_bytes(registry_dir)}
            )

        docs = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(docs_dir)
            .selectExpr("doc_id", "text")
        )
        t0 = time.perf_counter()
        spans = incremental_span_dedup(docs, state, on_batch=on_batch)
        n_spans = spans.count()
        wall = round(time.perf_counter() - t0, 2)

        reg = spark.read.parquet(registry_dir)
        log_rows, distinct = reg.count(), reg.select("h").distinct().count()
        compact = compact_span_registry(spark, state)
        retained = compact_span_registry(
            spark, state, retain_batches=args.retain
        )
        report["scales"][label] = {
            "doc_rows": n_rows,
            "spans": n_spans,
            "wall_s": wall,
            "per_batch_registry_bytes": growth,
            "append_log_rows": log_rows,
            "distinct_hashes": distinct,
            "reappend_amplification": round(log_rows / max(1, distinct), 3),
            "compaction": compact,
            "retention_pass": retained,
        }
        print(f"# {label}: {json.dumps(report['scales'][label])[:400]}",
              file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps({"out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
