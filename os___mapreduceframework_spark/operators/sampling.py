"""Deterministic sampling / splitting operators (charter extension).

A training-data pipeline's last mile: assign corpus rows to
train/val/test splits, draw stratified samples for eval sets, and
rebalance skewed label distributions. All of it must be DETERMINISTIC
at 100 TB -- ``rand()``-based sampling is irreproducible across
retries/speculative tasks and unauditable; every operator here derives
its randomness from md5 of a stable key (the same scan-stable trick as
the dedup/ANN hash family, operators/minhash.py), so re-running a task
yields the same sample and the DuckDB oracle reproduces the selection
bit-for-bit.

Scale notes:

- split assignment is a scan-local expression: zero shuffles beyond
  the output sort -- the split column is computable at read time
  forever after (the property that lets you re-derive any historical
  split without storing it).
- stratified sampling ranks within strata (one hash-partitioned
  window per stratum, parallel across strata) -- never a global sort.
- class balancing computes per-class quotas from one tiny aggregate
  (broadcast back) and keeps each class's md5-first quota rows; the
  heavy side shuffles once on the class key.

The reference has no sampling surface (Search.cpp is its whole query
corpus); this family is charter scope like dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

# md5-derived uniform bucket in [0, 1000): the split fractions below are
# exact bucket thresholds, so split sizes are reproducible percentages
_SPLIT_BUCKETS = 1000
_TRAIN_LT = 800  # [0, 800)  -> train (80%)
_VAL_LT = 900    # [800, 900) -> val  (10%), rest test (10%)

_MD5_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
    f" % {_SPLIT_BUCKETS}"
)
_MD5_BUCKET_DUCK = (
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT"
    f" % {_SPLIT_BUCKETS}"
)


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_MD5_BUCKET_DUCK} < {_TRAIN_LT} THEN 'train'
                WHEN {_MD5_BUCKET_DUCK} < {_VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
    doc="Deterministic train/val/test split (80/10/10): md5-bucket of "
    "the stable doc key -> threshold mapping, a scan-local expression "
    "with no shuffle (the sort is presentation only). Reproducible "
    "under task retry and re-derivable years later without storing the "
    "assignment -- the property rand()-splits lack. Spark and DuckDB "
    "compute the identical bucket (verified md5 bit-parity trick from "
    "the dedup family).",
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_MD5_BUCKET_SPARK)
    return docs.select(
        "doc_id",
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


SAMPLE_FRAC_NUM = 1  # keep 1/10 of each stratum
SAMPLE_FRAC_DEN = 10


@query(
    "sample_stratified",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source, doc_id
    FROM r
    WHERE rn <= (n * {SAMPLE_FRAC_NUM} + {SAMPLE_FRAC_DEN} - 1) // {SAMPLE_FRAC_DEN}
    ORDER BY source, doc_id
    """,
    doc="Stratified sampling with EXACT per-stratum quotas: within each "
    "source stratum, rank rows by md5 of the stable key and keep the "
    "first ceil(n/10) -- a deterministic 10% whose size is exact per "
    "stratum (frac-of-Bernoulli sampling only hits the quota in "
    "expectation). One hash-partitioned window per stratum, parallel "
    "across strata; no global sort anywhere.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wn = W.partitionBy("source")
    quota = F.ceil(
        F.count(F.lit(1)).over(wn) * SAMPLE_FRAC_NUM / SAMPLE_FRAC_DEN
    )
    return (
        docs.select(
            "source",
            "doc_id",
            F.row_number().over(w).alias("rn"),
            quota.alias("quota"),
        )
        .filter(F.col("rn") <= F.col("quota"))
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@query(
    "class_balance_downsample",
    oracle="""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    m AS (SELECT MIN(n) AS quota FROM c),
    r AS (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY md5(event_id::VARCHAR), event_id) AS rn
      FROM events
    )
    SELECT r.event_type,
           COUNT(*) AS n_kept,
           CAST(SUM(r.event_id) AS BIGINT) AS checksum
    FROM r, m
    WHERE r.rn <= m.quota
    GROUP BY r.event_type
    ORDER BY r.event_type
    """,
    doc="Class-balanced downsampling: every event_type keeps exactly "
    "min-class-count rows, selected deterministically by md5 rank of "
    "the stable event key. The quota is one tiny aggregate (rows = "
    "#classes) broadcast back; the fact shuffles once on the class key "
    "for the per-class window. Output is the per-class manifest (count "
    "+ id checksum) proving the selection, not the sampled payload -- "
    "the selection predicate is re-derivable at read time.",
)
def q_class_balance_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(F.min("n").alias("quota"))
    w = W.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ranked = ev.select(
        "event_type", "event_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("event_id").cast("bigint").alias("checksum"),
        )
        .orderBy("event_type")
    )


# 13 hex chars of md5 = 52 bits -> exact in a double; u in [0, 1)
_SPARK_U = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)"
    " / cast(4503599627370496 as double)"
)
_DUCK_U = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
    " / CAST(4503599627370496 AS DOUBLE)"
)


@query(
    "sample_weighted_by_length",
    oracle=f"""
    WITH m AS (SELECT MAX(n_chars) AS maxc FROM documents),
    s AS (
      SELECT doc_id, source, n_chars,
             {_DUCK_U} AS u,
             n_chars / (SELECT CAST(maxc AS DOUBLE) FROM m) AS p,
             (SELECT maxc FROM m) * 1000000 // GREATEST(n_chars, 1) AS inv_p_fp
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS checksum,
           CAST(((SUM(inv_p_fp) + 5000) // 10000) / 100.0 AS DOUBLE)
             AS est_total
    FROM s
    WHERE u < p
    GROUP BY source
    ORDER BY source
    """,
    doc="Deterministic weighted Bernoulli sampling (probability "
    "proportional to document length): the inclusion coin is 52 md5 "
    "bits of the key -- re-derivable, retry/speculation-safe, "
    "auditable, unlike rand(). Inclusion is a scan-local predicate "
    "(the max-weight normalizer is a 1-row broadcast); the "
    "Horvitz-Thompson inverse-probability sum estimates the population "
    "size, checked by the oracle. The size-biased sample is the "
    "standard curation move when long documents matter more.",
)
def q_sample_weighted_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").alias("maxc"))
    s = docs.crossJoin(F.broadcast(maxc)).select(
        "doc_id",
        "source",
        F.expr(_SPARK_U).alias("u"),
        (F.col("n_chars") / F.col("maxc").cast("double")).alias("p"),
        # 1/p as a FIXED-POINT integer (maxc*1e6 div n_chars): the
        # Horvitz-Thompson sum is then an exact bigint sum -- order-
        # independent, unlike a double sum whose rounding at the .005
        # boundary could depend on partitioning. greatest(n_chars, 1)
        # keeps the expression total under ANSI mode for an empty doc
        # (the u < p filter already excludes it, but relying on the
        # optimizer pushing that filter below this projection is
        # fragile); the final rounding is integer arithmetic too, since
        # Spark's round (BigDecimal HALF_UP on the decimal repr) and
        # DuckDB's ROUND (std::round on the binary double) disagree on
        # decimal-tie values like 1.005
        F.expr("div(maxc * 1000000, greatest(n_chars, 1))").alias("inv_p_fp"),
    )
    return (
        s.filter(F.col("u") < F.col("p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").cast("bigint").alias("checksum"),
            (F.floor((F.sum("inv_p_fp") + 5000) / 10000) / 100.0)
            .cast("double")
            .alias("est_total"),
        )
        .orderBy("source")
    )
