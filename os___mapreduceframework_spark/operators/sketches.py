"""Count-min sketch: fixed-size mergeable frequency state (charter
extension: approximate algorithms for 100 TB streams/corpora).

The HLL vocabulary rollup (training.py) covers mergeable *distinct*
counting; this module adds the mergeable *frequency* sketch. A count-min
sketch is a D x W counter grid; every token increments one cell per
hash row, and a token's estimate is the MIN over its D cells --
never an undercount, overcount bounded by eps*N (eps ~ e/W). The grid
is tiny (D*W counters), merges by cell-wise +, and builds map-side:
exactly the partial-aggregate shape Spark's hash aggregate gives for
free when the grouping key is (row, cell). At 100 TB the shuffle
carries at most partitions x D x W partial cells -- corpus-size-
independent, the same argument as the HLL and Gram-matrix operators.

Hashing reuses the minhash module's md5-derived universal family
(operators/minhash.py:36-40), so the DuckDB oracle computes the SAME
deterministic sketch bit-for-bit -- the approximate operator is
*exactly* oracled, estimates and error-bound flags both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.operators.minhash import _MH_PRIME
from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

CMS_D = 4  # hash rows
CMS_W = 512  # cells per row
TOP_K = 10


def _h(j: int, x: str) -> str:
    """Row-j cell index of pre-hashed token value ``x`` (SQL, both engines)."""
    return f"((2 * {j} + 1) * {x} + 7919 * {j} + 13) % {_MH_PRIME} % {CMS_W}"


_SPARK_X = (
    f"cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint) % {_MH_PRIME}"
)
_DUCK_X = f"('0x' || substr(md5(token), 1, 15))::BIGINT % {_MH_PRIME}"


def cms_cells(tokens: DataFrame) -> DataFrame:
    """Build the sketch as a (j, cell, n) relation: explode each token
    occurrence into its D cells, then one map-side-combined aggregate.
    Partial state per task is at most D*W cells regardless of input."""
    rows = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(_h(j, "x")).cast("long").alias("cell"))
            for j in range(CMS_D)
        ]
    )
    return (
        tokens.select(F.expr(_SPARK_X).cast("long").alias("x"))
        .select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    tx AS (SELECT token, {_DUCK_X} AS x FROM tok),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT {j} AS j, {_h(j, 'x')} AS cell, COUNT(*) AS n"
        f" FROM tx GROUP BY cell" for j in range(CMS_D)
      )}
    ),
    tot AS (SELECT COUNT(*) AS total FROM tok),
    top AS (
      SELECT token, ANY_VALUE(x) AS x, COUNT(*) AS true_cnt
      FROM tx GROUP BY token
      ORDER BY true_cnt DESC, token LIMIT {TOP_K}
    ),
    est AS (
      SELECT t.token, t.true_cnt,
             MIN(c.n) AS cms_est
      FROM top t
      JOIN cells c
        ON (c.j = 0 AND c.cell = {_h(0, "t.x")})
        OR (c.j = 1 AND c.cell = {_h(1, "t.x")})
        OR (c.j = 2 AND c.cell = {_h(2, "t.x")})
        OR (c.j = 3 AND c.cell = {_h(3, "t.x")})
      GROUP BY t.token, t.true_cnt
    )
    SELECT token, true_cnt, cms_est,
           (cms_est >= true_cnt) AS no_undercount,
           (cms_est <= true_cnt + 2.0 * (SELECT total FROM tot) / {CMS_W})
             AS within_bound
    FROM est
    ORDER BY true_cnt DESC, token
    """,
    doc=f"Count-min sketch ({CMS_D}x{CMS_W}) over the corpus token "
    "stream, audited against the exact top-10 heavy hitters: estimate, "
    "no-undercount guarantee, and the eps*N overcount bound, all "
    "deterministic (md5-derived hash family) so the oracle recomputes "
    "the identical sketch. The grid is fixed-size mergeable state -- "
    "the frequency analog of the HLL vocabulary rollup.",
)
def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cells = cms_cells(tokens)
    total = tokens.agg(F.count(F.lit(1)).alias("total"))
    top = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "token")
        .limit(TOP_K)
        .withColumn("x", F.expr(_SPARK_X).cast("long"))
    )
    # expand each top token to its D (j, cell) probes and take MIN over
    # the matching cells; cells relation is D*W rows -> broadcast
    probes = top.select(
        "token",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_h(j, "x")).cast("long").alias("cell"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("token", "true_cnt", F.col("p.j").alias("j"), F.col("p.cell").alias("cell"))
    est = (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("token", "true_cnt")
        .agg(F.min("n").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "token",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("true_cnt")).alias("no_undercount"),
            (
                F.col("cms_est")
                <= F.col("true_cnt") + 2.0 * F.col("total") / CMS_W
            ).alias("within_bound"),
        )
        .orderBy(F.desc("true_cnt"), "token")
    )


@query(
    "text_bpe_pair_stats",
    oracle="""
    WITH tok AS (
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    ),
    pairs AS (
      SELECT substr(token, CAST(i AS INT), 2) AS pair, n
      FROM tok, unnest(range(1, length(token))) AS u(i)
      WHERE length(token) >= 2
    )
    SELECT pair, CAST(SUM(n) AS BIGINT) AS weight
    FROM pairs
    GROUP BY pair
    ORDER BY weight DESC, pair
    LIMIT 15
    """,
    doc="BPE-training pair statistics: corpus-weighted adjacent-symbol "
    "pair counts, the argmax of which is the next merge rule. Computed "
    "over the DISTINCT token vocabulary weighted by occurrence count "
    "-- at 100 TB the pair explosion runs over the (tiny) vocab table, "
    "not the corpus; the corpus is touched once for the token counts "
    "(map-side-combined agg). Each training iteration re-runs this "
    "with the learned merges applied; the statistics pass shown here "
    "is the per-iteration cost.",
)
def q_text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.length("token") >= 2)
    )
    pairs = tok.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("weight"))
        .orderBy(F.desc("weight"), "pair")
        .limit(15)
    )


BLOOM_M = 4096  # bits
BLOOM_K = 3  # hash functions


def _bloom_pos_duck(j: int) -> str:
    return (
        f"('0x' || substr(md5({j}::VARCHAR || ':' || key::VARCHAR), 1, 15))"
        f"::BIGINT % {BLOOM_M}"
    )


def _bloom_pos_spark(j: int) -> str:
    return (
        f"cast(conv(substr(md5(concat('{j}', ':', cast(key as string))), 1, 15),"
        f" 16, 10) as bigint) % {BLOOM_M}"
    )


@query(
    "sketch_bloom_probe",
    oracle=f"""
    WITH members AS (SELECT DISTINCT c_custkey AS key FROM customer),
    mpos AS (
      SELECT DISTINCT {_bloom_pos_duck(0)} AS pos FROM members
      UNION SELECT DISTINCT {_bloom_pos_duck(1)} FROM members
      UNION SELECT DISTINCT {_bloom_pos_duck(2)} FROM members
    ),
    probes AS (SELECT DISTINCT p_partkey AS key FROM part),
    pp AS (
      SELECT DISTINCT key, pos FROM (
        SELECT key, {_bloom_pos_duck(0)} AS pos FROM probes
        UNION ALL SELECT key, {_bloom_pos_duck(1)} FROM probes
        UNION ALL SELECT key, {_bloom_pos_duck(2)} FROM probes
      )
    ),
    chk AS (
      SELECT pp.key,
             SUM(CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END) = COUNT(*)
               AS bloom_hit
      FROM pp LEFT JOIN mpos m ON m.pos = pp.pos
      GROUP BY pp.key
    ),
    verdicts AS (
      SELECT c.key, c.bloom_hit, mem.key IS NOT NULL AS is_member
      FROM chk c LEFT JOIN members mem ON mem.key = c.key
    )
    SELECT {BLOOM_M} AS m_bits, {BLOOM_K} AS k_hashes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mpos) AS n_set_bits,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(COUNT(*) FILTER (is_member) AS BIGINT) AS n_true_members,
           CAST(COUNT(*) FILTER (bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(COUNT(*) FILTER (bloom_hit AND NOT is_member) AS BIGINT)
             AS n_false_positives,
           COUNT(*) FILTER (is_member AND NOT bloom_hit) = 0
             AS no_false_negatives
    FROM verdicts
    """,
    doc="Bloom-filter build + probe (the semi-join pre-filter a "
    "distributed engine ships a fact scan through before an expensive "
    "join): membership bitset over customer keys (m=4096 bits, k=3 "
    "md5-derived hashes -- a DISTINCT over set bit positions, bounded "
    "by m however large the member table), probed by the part key "
    "domain, which overlaps customer numerically, so both true "
    "members and potential false positives exist. The bitset joins "
    "BROADCAST (<= m rows, metadata-sized -- the justified broadcast); "
    "the probe side streams. Output pins the sketch's exact contract: "
    "deterministic hit/FP counts (md5 makes the filter bit-identical "
    "in DuckDB) and the zero-false-negative guarantee as a flag.",
)
def q_sketch_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    members = customer.select(F.col("c_custkey").alias("key")).distinct()
    probes = part.select(F.col("p_partkey").alias("key")).distinct()

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "key",
            F.explode(
                F.array(
                    *[F.expr(_bloom_pos_spark(j)) for j in range(BLOOM_K)]
                )
            ).alias("pos"),
        )

    mpos = positions(members).select("pos").distinct()
    pp = positions(probes).distinct()
    chk = (
        pp.join(F.broadcast(mpos.withColumn("set1", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg((F.sum(F.when(F.col("set1").isNotNull(), 1).otherwise(0))
              == F.count(F.lit(1))).alias("bloom_hit"))
    )
    # ground-truth membership join is hash/merge, NOT broadcast: the
    # member set is table-cardinality (only the <= m-row BITSET gets
    # the justified broadcast above)
    verdicts = chk.join(
        members.withColumn("mem1", F.lit(1)).hint("merge"), "key", "left"
    ).select("bloom_hit", F.col("mem1").isNotNull().alias("is_member"))
    n_members = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    n_set_bits = mpos.agg(F.count(F.lit(1)).cast("bigint").alias("n_set_bits"))
    return (
        verdicts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.count(F.when(F.col("is_member"), 1)).alias("n_true_members"),
            F.count(F.when(F.col("bloom_hit"), 1)).alias("n_bloom_hits"),
            F.count(F.when(F.col("bloom_hit") & ~F.col("is_member"), 1)).alias(
                "n_false_positives"
            ),
            (F.count(F.when(F.col("is_member") & ~F.col("bloom_hit"), 1)) == 0).alias(
                "no_false_negatives"
            ),
        )
        .crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_set_bits))
        .select(
            F.lit(BLOOM_M).alias("m_bits"),
            F.lit(BLOOM_K).alias("k_hashes"),
            "n_members",
            "n_set_bits",
            "n_probes",
            "n_true_members",
            "n_bloom_hits",
            "n_false_positives",
            "no_false_negatives",
        )
    )
