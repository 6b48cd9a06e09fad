"""Fuzzy similarity join (entity resolution): match dirty strings
against a catalog by trigram-set Jaccard, bucketed so no pair outside a
shared trigram is ever scored.

The dedup family's LSH joins are SELF-joins; this is the two-relation
variant every ingestion pipeline needs -- resolve free-text entity
mentions (misspelled, truncated) against a canonical catalog. Same
scale argument as the trigram search index (operators/indexing.py):
candidates come from an equi-join on shared trigrams (bucketable,
skew-bounded by the hottest gram), the quadratic all-pairs comparison
never happens, and the exact Jaccard verify runs on candidates only.

The probe set here is synthesized deterministically from the catalog
itself (every 29th part name with its first character dropped --
a reproducible 'dirty feed'), so the oracle can rebuild the identical
workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.sources import load_table

JACCARD_MIN = 0.5
PROBE_MOD = 29

# distinct character trigrams (strings shorter than 3 key under
# themselves via the greatest() clamp) -- Spark SQL and DuckDB forms
# of the same construction
_SPARK_GRAMS = (
    "array_distinct(transform(sequence(1, greatest(length({c}) - 2, 1)),"
    " i -> substring({c}, i, 3)))"
)
_DUCK_GRAMS = (
    "list_distinct(list_transform(range(1, GREATEST(length({c}) - 2, 1) + 1),"
    " i -> substr({c}, CAST(i AS INT), 3)))"
)


@query(
    "fuzzy_match_part_names",
    oracle=f"""
    WITH catalog AS (SELECT DISTINCT p_name AS name FROM part),
    probes AS (
      -- canonical probe string per id (MIN): a replayed part row with
      -- a corrected name must not fan one probe into two gram streams
      -- whose any_value()/intersection mix is engine-order-dependent
      SELECT p_partkey AS probe_id, MIN(substr(p_name, 2)) AS dirty
      FROM part WHERE p_partkey % {PROBE_MOD} = 0
      GROUP BY p_partkey
    ),
    cg AS (
      SELECT name, grams, len(grams) AS ng
      FROM (SELECT name, {_DUCK_GRAMS.format(c="name")} AS grams FROM catalog)
    ),
    cgr AS (SELECT name, ng, unnest(grams) AS gram FROM cg),
    pg AS (
      SELECT probe_id, dirty, grams, len(grams) AS np
      FROM (SELECT probe_id, dirty, {_DUCK_GRAMS.format(c="dirty")} AS grams
            FROM probes)
    ),
    pgr AS (SELECT probe_id, dirty, np, unnest(grams) AS gram FROM pg),
    cand AS (
      SELECT p.probe_id, ANY_VALUE(p.dirty) AS dirty, c.name,
             ANY_VALUE(p.np) AS np, ANY_VALUE(c.ng) AS ng,
             -- DISTINCT: the intersection is a SET size; replayed/
             -- duplicated probe rows would otherwise multiply the
             -- row count past np + ng and 0-out the union denominator
             COUNT(DISTINCT gram) AS inter
      FROM pgr p JOIN cgr c USING (gram)
      GROUP BY p.probe_id, c.name
    ),
    scored AS (
      SELECT probe_id, dirty, name,
             ROUND(inter / CAST(np + ng - inter AS DOUBLE), 4) AS jaccard
      FROM cand
      WHERE inter / CAST(np + ng - inter AS DOUBLE) >= {JACCARD_MIN}
    )
    SELECT probe_id, dirty, name AS matched_name, jaccard
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY jaccard DESC, name) AS rn
          FROM scored)
    WHERE rn = 1
    ORDER BY probe_id
    """,
    doc="Fuzzy entity-resolution join: dirty probe strings (deterministic "
    "first-char-dropped part names) matched to the catalog by trigram-"
    "set Jaccard >= 0.5, best match per probe. Candidates from a "
    "shared-trigram equi-join (group per (probe, name) counts the "
    "intersection); |union| = np + ng - inter needs no second pass. "
    "No all-pairs comparison anywhere -- the two-relation analog of "
    "the LSH dedup joins.",
)
def q_fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    catalog = part.select(F.col("p_name").alias("name")).distinct()
    # canonical probe per id (oracle's probes CTE): MIN of the dirty
    # variants, so conflicting duplicate part rows stay deterministic
    probes = (
        part.filter(F.col("p_partkey") % PROBE_MOD == 0)
        .groupBy(F.col("p_partkey").alias("probe_id"))
        .agg(F.min(F.expr("substring(p_name, 2)")).alias("dirty"))
    )
    cgr = catalog.select(
        "name", F.expr(_SPARK_GRAMS.format(c="name")).alias("grams")
    ).select("name", F.size("grams").alias("ng"), F.explode("grams").alias("gram"))
    pgr = probes.select(
        "probe_id", "dirty", F.expr(_SPARK_GRAMS.format(c="dirty")).alias("grams")
    ).select(
        "probe_id",
        "dirty",
        F.size("grams").alias("np"),
        F.explode("grams").alias("gram"),
    )
    cand = (
        pgr.join(cgr, "gram")
        .groupBy("probe_id", "name")
        .agg(
            F.any_value("dirty").alias("dirty"),
            F.any_value("np").alias("np"),
            F.any_value("ng").alias("ng"),
            # set-intersection size, robust to duplicated probe rows
            # (ingestion replays): row counts would inflate past the
            # union and divide by zero
            F.countDistinct("gram").alias("inter"),
        )
    )
    jac = F.col("inter") / (F.col("np") + F.col("ng") - F.col("inter")).cast("double")
    scored = cand.filter(jac >= JACCARD_MIN).select(
        "probe_id", "dirty", "name", F.round(jac, 4).alias("jaccard")
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("jaccard"), "name")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", "dirty", F.col("name").alias("matched_name"), "jaccard")
        .orderBy("probe_id")
    )
