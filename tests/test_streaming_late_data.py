"""Late-data semantics under event-time watermarks (append mode).

The registered stream_* queries run in complete mode over a one-file
source, which can never exercise the watermark's actual job: bounding
state and rejecting data that arrives after its window was finalized.
This replays a THREE-batch stream and pins the append-mode contract
the 100 TB deployment relies on:

1. a window below the watermark is evicted, emitted ONCE, and a row
   for it arriving in a LATER batch is dropped (the guarantee: an
   already-emitted window is never re-opened or re-emitted);
2. windows not yet below the watermark are WITHHELD at query end.

Note the documented weaker edge this deliberately does NOT assert: a
row later than the watermark whose window state has not been evicted
yet (same batch as the eviction) MAY still be merged -- Spark's
watermark bounds state, it is not a row-level filter guarantee.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pandas as pd
from pyspark.sql import functions as F


def _write(src: str, name: str, stamps: list[str]) -> None:
    pd.DataFrame({"ts": [pd.Timestamp(s) for s in stamps], "v": [1] * len(stamps)}).to_parquet(
        os.path.join(src, name),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    time.sleep(1.1)  # distinct mod-times order the micro-batches


def test_append_mode_drops_post_eviction_late_rows_and_withholds_open_windows(spark):
    root = tempfile.mkdtemp(prefix="late_data_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    # b1: rows at 00:30 and 03:30 -> watermark after b1 = 02:30
    _write(src, "b1.parquet", ["2024-01-01 00:30", "2024-01-01 03:30"])
    # b2 (processed at wm 02:30): evicts + emits window [00:00, 01:00)
    _write(src, "b2.parquet", ["2024-01-01 04:30"])
    # b3: a row for the ALREADY-EMITTED 00:00 window -> must be dropped
    _write(src, "b3.parquet", ["2024-01-01 00:40"])

    ev = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_data_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.awaitTermination()
    rows = [
        (r["window"]["start"].strftime("%H:%M"), r["n"])
        for r in spark.table("late_data_sink").collect()
    ]
    shutil.rmtree(root, ignore_errors=True)
    # [00:00) emitted exactly once, with only the on-time row; the b3
    # arrival for the finalized window was rejected (not re-emitted,
    # not resurrected as new state)
    assert rows == [("00:00", 1)], rows
