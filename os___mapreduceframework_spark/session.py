"""SparkSession factory.

Replaces the reference's parallelism control (``multiThreadLevel`` param,
MapReduceFramework.cpp:360-361; thread creation :248/:260/:287) with Spark
session configuration: the scheduler, work-stealing (batch-of-10 claims,
MapReduceFramework.cpp:106-119), stage barriers (:382, :408) and the
pipelined shuffle (:166-230) are all provided by Spark's engine and AQE.

Scale notes (100 TB design): AQE is on so shuffle partition counts,
skew-join splitting and broadcast demotion re-plan at runtime from real
sizes; locally we pin ``spark.sql.shuffle.partitions`` to the core count
to avoid the 200-partition default. On a real cluster the same code runs
unchanged -- only master/memory/partition settings move to spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "os___mapreduceframework_spark",
    parallelism: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``parallelism`` mirrors the reference's ``multiThreadLevel``
    (MapReduceFramework.cpp:360); it sets both the local core count and
    the shuffle partition count. Defaults to $SPARK_GRAFT_CPUS or all
    cores.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize per-batch overhead on the
        # Pandas-UDF paths (compat API, multimodal, stateful streaming)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # size scan splits to the fixture SF so single-file tables still
        # scan in parallel (sf0.1 lineitem is ~11 MB -- one task at the
        # 128 MB default); on a real cluster at 100 TB the default is
        # right and this moves to spark-submit with the other sizing
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"),
        )
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # ContextCleaner starvation fix (r10, VERDICT r9 item 1): shuffle
        # files / checkpoint blocks of dereferenced plans are only
        # reclaimed after a driver GC, and a 32 g heap never GCs within a
        # multi-query session, so long sessions accumulate dead shuffle
        # state until the tail degrades (clusters read 7.4 s in-suite vs
        # ~2 s isolated in BENCH_r09). The r9 fix attempt (periodic GC
        # alone) traded the tail for stop-the-world full-GC pauses on
        # every query (+6.7 s suite) and was rejected; the missing half
        # is ExplicitGCInvokesConcurrent, which turns the cleaner's
        # System.gc() into a CONCURRENT G1 cycle (weak refs processed at
        # remark, mutator barely pauses). Interval is env-tunable; the
        # Spark default "30min" effectively disables it for an A/B
        # within a bench-length session.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "60s"),
        )
        .config(
            "spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent"
        )
        # plan-string metadata (DataFilters/PushedFilters/ReadSchema) is
        # truncated at this many chars BEFORE the golden-plan normalizer
        # sees it; at the 100-char default the "..." cut lands mid
        # expression-id, so the normalized snapshot shifts whenever id
        # widths change (tests/plans goldens become order-dependent)
        .config("spark.sql.maxMetadataStringLength", "10000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
