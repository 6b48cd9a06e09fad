"""Temporal-validity ingestion contract (sources.VALID_TS_SQL).

A clock-skewed event time makes watermark semantics depend on
micro-batch layout: a far-future row advances the watermark past the
whole live corpus, so every LATER batch's rows are dropped as late --
the output then depends on which batch delivered the outlier, which at
cluster scale is file-listing order. The contract bounds event time to
[1990-01-01, 2090-01-01) at the streaming source (events_stream), and
every streaming oracle mirrors the predicate.

The first test pins the filter itself; the second replays the actual
poisoning scenario and shows the contract restores batch-layout
invariance (the hazard test asserts the HAZARD too, so if a future
Spark version changes watermark behavior we notice).
"""

from __future__ import annotations

import os
import tempfile
import time

import pandas as pd
from pyspark.sql import functions as F

from os___mapreduceframework_spark.sources import valid_event_times


def _write(src: str, name: str, stamps: list[str]) -> None:
    pd.DataFrame(
        {"ts": [pd.Timestamp(s) for s in stamps], "v": [1] * len(stamps)}
    ).to_parquet(
        os.path.join(src, name),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    time.sleep(1.1)  # distinct mod-times order the micro-batches


def test_valid_event_times_bounds(spark):
    df = spark.createDataFrame(
        [
            ("1969-06-01 12:34:56",),  # negative epoch
            ("1989-12-31 23:59:59",),  # just below the window
            ("1990-01-01 00:00:00",),  # inclusive lower bound
            ("2024-01-01 00:00:00",),  # live data
            ("2089-12-31 23:59:59",),  # last valid instant
            ("2098-07-04 08:00:00",),  # far future
        ],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    kept = [r.ts.isoformat() for r in valid_event_times(df).collect()]
    assert sorted(kept) == [
        "1990-01-01T00:00:00",
        "2024-01-01T00:00:00",
        "2089-12-31T23:59:59",
    ]


def _run_windowed_count(spark, src: str, bounded: bool):
    ev = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    if bounded:
        ev = valid_event_times(ev)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"tv_sink_{int(time.time() * 1e6)}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    return {(r["window"].start.isoformat(), r["n"]) for r in out}


def test_future_outlier_poisons_watermark_and_contract_restores(spark):
    root = tempfile.mkdtemp(prefix="temporal_validity_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    # b1 carries the clock-garbage row: watermark after b1 = 2098-..-1h,
    # far past every live row below
    _write(src, "b1.parquet", ["2098-07-04 08:00:00"])
    _write(src, "b2.parquet", ["2024-01-01 00:30", "2024-01-01 00:40"])
    _write(src, "b3.parquet", ["2024-01-01 02:30"])

    # UNBOUNDED: the outlier in b1 poisons the watermark to 2098-1h.
    # Spark's late filter lags one batch, so b2's rows still land (and
    # their window is then force-finalized under the poisoned
    # watermark), but b3's live row is silently DROPPED -- its window
    # never appears. Which rows survive therefore depends on which
    # micro-batch delivered the outlier: batch-layout-dependent output.
    # (Pinning the hazard itself: if Spark's late-row handling changes,
    # this assertion tells us the contract's rationale moved.)
    poisoned = _run_windowed_count(spark, src, bounded=False)
    assert not any(w.startswith("2024-01-01T02:00") for w, _ in poisoned)

    # BOUNDED at ingestion: the outlier never reaches the watermark,
    # both live windows emit with full counts -- batch layout no longer
    # matters
    bounded = _run_windowed_count(spark, src, bounded=True)
    assert ("2024-01-01T00:00:00", 2) in bounded
    # the 02:00 window may be withheld (append mode, still open) only if
    # no later data advanced the watermark; with max live ts 02:30 the
    # watermark ends at 01:30, so [00:00,01:00) is finalized and
    # [02:00,03:00) is withheld -- assert exactly that contract
    assert all(w.startswith("2024-01-01T00:00") for w, _ in bounded)
