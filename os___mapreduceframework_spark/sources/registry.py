"""Sources: parquet fixture tables + the reference's directory-listing scan.

The reference's only sources are an in-memory pair vector
(MapReduceFramework.cpp:370) and the Search client's directory scan
(Search.cpp:98-111: ``opendir``/``readdir`` per CLI dir, one record per
entry per dir, including ``.`` and ``..``; duplicate names across dirs
stay separate records). Here the general source layer is ``spark.read``
(parquet/csv/json/orc -- columnar scan with predicate pushdown and column
pruning for free), and ``dir_entries`` reproduces the Search scan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DIR_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("dir", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)


def normalize_events(df: DataFrame) -> DataFrame:
    """Assert-and-adapt for ``events.ts``: the fixtures have shipped as
    both parquet ``timestamp[ns]`` (which Spark reads only as raw int64
    nanos under ``nanosAsLong``) and native ``timestamp[us]``. Branch on
    the *loaded* dtype rather than assuming a frozen fixture schema:
    long -> truncate nanos to micros (integer ``div``, exact, matching
    DuckDB's own ns->us truncation so oracles agree); timestamp -> pass
    through untouched.
    """
    from pyspark.sql import functions as F

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        # parquet timestamp[us] without tz loads as TIMESTAMP_NTZ; the
        # operator surface (unix_micros, windows, watermarks) is written
        # against TIMESTAMP. Under a UTC session (pinned at load) the
        # cast is wall-clock-identity, so oracles agree.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Ingestion contract for numeric MEASUREMENTS (the events.value column):
# NaN/+-Inf are sensor garbage -- a single one poisons sums and means,
# crashes integer bucketization (CAST(NaN AS INT) errors on DuckDB,
# int(round(nan)) raises in Python state code), and shifts quantiles in
# engine-specific ways (Spark sorts NaN last-and-counted, DuckDB's
# quantile ignores it). Queries that aggregate/bucketize/rank the value
# column therefore drop non-finite rows AT INGESTION, identically in
# both engines; NULLs pass through (each query's NULL semantics are its
# own, already pinned by the adversarial sweep). DuckDB side of the
# same contract:
FINITE_VALUE_SQL = "(value IS NULL OR isfinite(value))"

# Ingestion contract for STREAMING event time (the sibling of the
# finite-measurement contract, for the ts column): a clock-skewed
# client row (negative-epoch 1969, or a far-future year-2098 ts) makes
# watermark semantics BATCH-ORDER-DEPENDENT -- a future outlier
# advances the watermark past the entire live corpus so every
# subsequent batch's rows are dropped as late, and whether a pre-epoch
# row survives depends on which micro-batch delivered it. Batch
# processing is order-independent, so the bound applies only at the
# STREAMING source (events_stream); every streaming oracle mirrors the
# same predicate. Window chosen far outside any plausible corpus so it
# never clips real data, only clock garbage.
VALID_TS_SQL = (
    "(ts >= TIMESTAMP '1990-01-01 00:00:00' "
    "AND ts < TIMESTAMP '2090-01-01 00:00:00')"
)


def finite_values(df: DataFrame, col: str = "value") -> DataFrame:
    """Drop rows whose measurement is NaN/+-Inf, keep NULLs -- the
    Spark half of FINITE_VALUE_SQL. isnan() covers NaN (comparisons
    with NaN are engine-quirky); equality covers the two infinities."""
    from pyspark.sql import functions as F

    c = F.col(col)
    return df.filter(
        c.isNull()
        | (
            ~F.isnan(c)
            & (c != F.lit(float("inf")))
            & (c != F.lit(float("-inf")))
        )
    )


def valid_event_times(df: DataFrame, col: str = "ts") -> DataFrame:
    """Drop rows whose event time falls outside the temporal validity
    window -- the Spark half of VALID_TS_SQL, applied at the streaming
    ingestion boundary (events_stream) where an out-of-window ts would
    make watermark eviction depend on micro-batch layout."""
    from pyspark.sql import functions as F

    c = F.col(col)
    return df.filter(
        (c >= F.lit("1990-01-01 00:00:00").cast("timestamp"))
        & (c < F.lit("2090-01-01 00:00:00").cast("timestamp"))
    )


# the row-preserving variant: rows that matter STRUCTURALLY (a click
# that anchors an attribution window) survive with the garbage
# measurement nullified (SUM/AVG skip NULL identically on both
# engines). SQL half: CASE WHEN isfinite(value) THEN value END.
FINITE_VALUE_NULLIFY_SQL = "(CASE WHEN isfinite(value) THEN value END)"


def finite_value_col(col: str = "value"):
    """Column expression mapping NaN/+-Inf to NULL, finite to itself,
    NULL to NULL -- the Spark half of FINITE_VALUE_NULLIFY_SQL."""
    from pyspark.sql import functions as F

    c = F.col(col)
    return F.when(
        ~F.isnan(c) & (c != F.lit(float("inf"))) & (c != F.lit(float("-inf"))),
        c,
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan. Filters/projections on the result are pushed
    into the scan by Catalyst (check ``PushedFilters``/``ReadSchema`` in
    ``.explain``).

    ``events`` goes through :func:`normalize_events`; ``nanosAsLong`` is
    set so a nanosecond fixture loads at all (it is a no-op for us/ms
    timestamp columns).
    """
    cache = getattr(spark, "_graft_table_cache", None)
    if cache is None:
        cache = {}
        spark._graft_table_cache = cache
    key = (os.path.abspath(sf_dir), name)
    if key in cache:
        return cache[key]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the NTZ->LTZ cast in normalize_events is only wall-clock-exact
        # under UTC; pin it in case the hosting session didn't
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = normalize_events(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    cache[key] = df
    return df


def _stats_cache(spark: SparkSession) -> dict:
    cache = getattr(spark, "_graft_stats_cache", None)
    if cache is None:
        cache = {}
        spark._graft_stats_cache = cache
    return cache


def ts_bounds_us(
    spark: SparkSession, sf_dir: str, table: str = "events", col: str = "ts"
) -> tuple[int, int]:
    """Memoized (min, max) ``unix_micros`` of a timestamp column.

    Retention/drift/gap queries anchor their buckets at corpus bounds;
    each used to run its own construction-time ``agg(min/max).head()``
    -- at 100 TB that is a full-column scan per query BEFORE the real
    plan. Memoizing per (session, sf_dir, table, col) makes it ONE
    bounded-aggregate job per session, shared by every consumer
    (pinned by tests/test_plans.py::test_ts_bounds_memoized_one_job).

    Raises ``ValueError`` on an empty (or all-NULL) column: every
    consumer immediately does integer arithmetic on the bounds
    ((lo + hi) // 2 midpoints, bucket origins), so a (None, None)
    return surfaced only as an opaque downstream TypeError -- and got
    memoized for the session (ADVICE r4 item 4). The empty result is
    NOT cached, so a table populated later in the session re-probes.
    """
    from pyspark.sql import functions as F

    cache = _stats_cache(spark)
    key = ("ts_bounds_us", os.path.abspath(sf_dir), table, col)
    if key not in cache:
        row = (
            load_table(spark, sf_dir, table)
            .agg(
                F.min(F.unix_micros(col)).alias("lo"),
                F.max(F.unix_micros(col)).alias("hi"),
            )
            .head()
        )
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"{table}.{col} in {sf_dir} is empty or all-NULL; "
                "timestamp bounds are undefined (retention/drift/gap "
                "queries cannot anchor their buckets)"
            )
        cache[key] = (row["lo"], row["hi"])
    return cache[key]


def embedding_dim(
    spark: SparkSession, sf_dir: str, table: str = "embeddings",
    col: str = "embedding",
) -> int:
    """Memoized embedding dimensionality probe (first-row semantics:
    a leading NULL vector reads as dim 0, matching the previous inline
    ``head()`` probes). One limit-1 job per (session, sf_dir, table)."""
    cache = _stats_cache(spark)
    key = ("embedding_dim", os.path.abspath(sf_dir), table, col)
    if key not in cache:
        head = load_table(spark, sf_dir, table).select(col).head()
        cache[key] = len(head[0]) if head and head[0] is not None else 0
    return cache[key]


def embedding_count(
    spark: SparkSession, sf_dir: str, table: str = "embeddings"
) -> int:
    """Memoized DISTINCT vec_id count of the embeddings table: drives
    the adaptive LSH bucket width (operators/minhash.py
    emb_adaptive_bits). Distinct, not raw rows, because the banded
    family canonicalizes to one vector per id (duplicate-replay
    contract) and the oracle derives nbits from the canonical count.
    One job per (session, sf_dir, table), memoized so every banded
    query doesn't re-run it."""
    cache = _stats_cache(spark)
    key = ("embedding_count", os.path.abspath(sf_dir), table)
    if key not in cache:
        cache[key] = (
            load_table(spark, sf_dir, table).select("vec_id").distinct().count()
        )
    return cache[key]


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each fixture table as a temp view for the SQL surface."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def dir_entries(spark: SparkSession, dirs: list[str]) -> DataFrame:
    """The Search client's input relation (Search.cpp:98-111).

    One row per directory entry per directory, INCLUDING ``.`` and ``..``
    (readdir semantics, Search.cpp:102); names duplicated across dirs
    remain separate rows (a degenerate UNION ALL of per-dir scans).

    The listing itself is driver-side (it is CLI-argument-sized metadata,
    like Spark's own file-index listing), but the resulting relation is a
    distributed DataFrame so everything downstream scales.
    """
    rows = []
    for d in dirs:
        # '.'/'..' come FROM a successful readdir: a directory whose
        # opendir fails contributes no rows at all (Search.cpp:98-111
        # never enters the read loop), so the parity rows are emitted
        # only after the listing succeeds
        try:
            entries = sorted(os.listdir(d))
        except OSError:
            continue
        rows.append((d, "."))
        rows.append((d, ".."))
        rows.extend((d, e) for e in entries)
    return spark.createDataFrame(rows, schema=DIR_ENTRIES_SCHEMA)
