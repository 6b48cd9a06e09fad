"""Index-accelerated search: trigram posting lists for substring search,
token inverted index for multi-term document search.

The reference's Search client answers ONE substring query by scanning
every name (Search.cpp:65, the whole corpus flows through Map). That is
the right plan for one ad-hoc query, and ``search_count`` keeps it. At
100 TB with a *repeated* query workload the scan-per-query plan is the
bottleneck; the classic fix is an inverted index built once and shared
by every query:

- **substring search** -> trigram index: each distinct name is keyed by
  its character 3-grams; a query word's candidate set is the
  intersection of the posting lists of the word's own trigrams (trigram
  containment is necessary, not sufficient, so candidates are verified
  with the exact ``instr`` predicate -- the verify runs on the
  candidates only, not the corpus). Same result as ``search_count`` by
  construction; equivalence is pinned in tests and the registered
  query shares search_count's oracle SQL.
- **token search** -> inverted index: (token, doc_id) postings; a
  multi-term AND query is a semi-join against the terms' posting lists
  with a match-count-equals-term-count gate. Token equality is exact,
  so no verify pass is needed.

Scale notes (100 TB): the index build is one explode + groupBy shuffle
over the corpus -- the same cost as one scan-query, amortized over the
query workload. The posting table is written bucketed/sorted by
``gram``/``token`` (join_bucketed_colocated shows the mechanism), so a
query's posting lookup prunes to its terms' buckets and never touches
the base table: per-query cost becomes O(candidates), not O(corpus).
Posting lists stay as ROWS (gram, name) / (token, doc_id), never
collect_list arrays -- the hottest term's postings would be a
multi-GB array on the driver-side path, but as rows they are just a
partitioned relation (the df summary below aggregates counts only).
Here the index is built inline in the same job because the fixture
harness gives each query a cold session; the build-once artifact is the
``.write.bucketBy`` form of the same frame.

An observed Catalyst bonus: in the inline form the verify predicate
(``instr(name, word) > 0``) is pushed through the group-and-explode
index build into the base scan, so the fused plan costs no more than
the direct scan -- the index machinery is free until materialized, and
pays off once it is (tests/test_indexing.py pins that the materialized
index serves queries without touching the base table at all).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from os___mapreduceframework_spark.operators.search import SEARCH_WORD, search_count
from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.scratch import scratch_dir
from os___mapreduceframework_spark.sources import load_table


def _trigrams_expr(col: str) -> str:
    """SQL expr: distinct character 3-grams of ``col`` (names shorter
    than 3 chars key under themselves -- substring() clamps)."""
    return (
        f"array_distinct(transform(sequence(1, greatest(length({col}) - 2, 1)),"
        f" i -> substring({col}, i, 3)))"
    )


def trigram_index(names: DataFrame, name_col: str = "name") -> DataFrame:
    """Build the substring-search index: one row per (gram, name), with
    the name's multiplicity ``cnt`` carried on every posting so
    index-served queries never rejoin the base relation.

    At scale this frame is materialized once via
    ``.write.bucketBy(N, "gram").sortBy("gram")`` and reused.
    """
    counts = names.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.select(
        "name", "cnt", F.explode(F.expr(_trigrams_expr("name"))).alias("gram")
    )


def search_count_indexed(
    names: DataFrame, word: str, name_col: str = "name", index: DataFrame | None = None
) -> DataFrame:
    """``search_count`` served from the trigram index: same
    (name, cnt) result, but the corpus is touched only through the
    posting lists of ``word``'s trigrams.

    Words shorter than 3 chars have no trigram and fall back to the
    scan plan (their selectivity is too low for an index anyway).
    """
    if len(word) < 3:
        return search_count(names, word, name_col)
    grams = sorted({word[i : i + 3] for i in range(len(word) - 2)})
    idx = index if index is not None else trigram_index(names, name_col)
    return (
        idx.filter(F.col("gram").isin(grams))
        # postings are distinct per (name, gram) so a plain count gates
        # "name contains ALL the query's grams"
        .groupBy("name", "cnt")
        .agg(F.count(F.lit(1)).alias("g"))
        .filter(
            (F.col("g") == len(grams))
            # trigram containment is necessary, not sufficient ("abcXabc"
            # holds all grams of "abcabc"): verify on candidates only
            & (F.instr(F.col("name"), F.lit(word)) > 0)
        )
        .select("name", "cnt")
        .orderBy("name")
    )


def inverted_index(docs: DataFrame) -> DataFrame:
    """(token, doc_id) postings over whitespace tokens, one row per
    distinct token per document."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )


@query(
    "search_count_indexed",
    oracle=f"""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, '{SEARCH_WORD}') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Flagship Search query served from a trigram inverted index "
    "instead of a corpus scan: candidates = names holding every trigram "
    "of the query word, verified with the exact substring predicate. "
    "Same oracle as search_count -- the index changes the plan, not the "
    "answer. The build-once/query-many split is the 100 TB strategy for "
    "a repeated search workload (module doc).",
)
def q_search_count_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "part")
    return search_count_indexed(names, SEARCH_WORD, name_col="p_name")


@query(
    "text_inverted_postings",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                        AS token
               FROM documents)
    SELECT token, COUNT(DISTINCT doc_id) AS df
    FROM t
    GROUP BY token
    ORDER BY df DESC, token
    LIMIT 25
    """,
    doc="Inverted-index build over the documents table, summarized as "
    "the document-frequency table (top 25 by df): explode distinct "
    "tokens -> count DISTINCT docs per token (df is a per-document "
    "statistic, so replayed/duplicated rows cannot inflate it). The "
    "full (token, doc_id) posting relation is the reusable index "
    "artifact; df is the statistic query planners order AND-terms by "
    "(rarest first).",
)
def q_text_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        inverted_index(docs)
        .groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), "token")
        .limit(25)
    )


SEARCH_TERMS = ("vector", "spark", "merge")  # fixture vocabulary tokens


@query(
    "text_search_all_terms",
    oracle=f"""
    SELECT DISTINCT doc_id
    FROM documents
    WHERE {" AND ".join(
        f"list_contains(string_split(text, ' '), '{t}')" for t in SEARCH_TERMS
    )}
    ORDER BY doc_id
    """,
    doc="Multi-term AND search served from the (token, doc_id) inverted "
    "index: semi-join the terms' posting lists, keep docs matching "
    "every term (match-count gate over DISTINCT tokens -- postings are "
    "a set, so replayed/duplicated document rows cannot inflate the "
    "per-doc match count past the term count; oracle mirrors with "
    "DISTINCT doc_id). Token equality is exact so no verify pass is "
    "needed. At 100 TB each term lookup is a bucket-pruned posting "
    "scan; intersection cost is the smallest posting list, not the "
    "corpus.",
)
def q_text_search_all_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    postings = inverted_index(docs)
    return (
        postings.filter(F.col("token").isin(list(SEARCH_TERMS)))
        .groupBy("doc_id")
        .agg(F.countDistinct("token").alias("k"))
        .filter(F.col("k") == len(SEARCH_TERMS))
        .select("doc_id")
        .orderBy("doc_id")
    )


_N_IDX_BUCKETS = 16


def _ensure_trigram_table(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the part-name trigram index as a bucketed+sorted
    catalog table, once per sf_dir (marker conf, same idempotence
    scheme as the bucketed join tables). This is the build-once
    artifact the module doc describes: bucketBy(gram) makes a query's
    posting lookup a bucket-pruned scan, sortBy(gram) gives row-group
    min/max pruning within each bucket."""
    marker = spark.conf.get("spark.graft.trigram_index.for", "")
    if marker == sf_dir and spark.catalog.tableExists("trigram_idx_part"):
        return
    names = load_table(spark, sf_dir, "part")
    (
        trigram_index(names, "p_name")
        .write.mode("overwrite")
        .bucketBy(_N_IDX_BUCKETS, "gram")
        .sortBy("gram")
        .option("path", scratch_dir("trigram_idx_part"))
        .saveAsTable("trigram_idx_part")
    )
    spark.conf.set("spark.graft.trigram_index.for", sf_dir)


def search_count_index_segments(idx: DataFrame, word: str) -> DataFrame:
    """Serve the flagship query from a SEGMENTED posting relation --
    base build plus any number of appended deltas, where a name's
    multiplicity is split across segments (each segment row carries its
    own partial ``cnt``). Segments merge per (name, gram) by summing
    partial counts; after the merge every gram of a name carries the
    name's total, so ``max`` recovers it while the gram count gates
    all-grams containment. With a single compacted segment this
    degenerates to exactly ``search_count_indexed``'s plan shape.

    Words shorter than 3 chars have no trigram; served from the merged
    index WITHOUT gram pruning (an unpruned posting scan -- the same
    fallback contract as ``search_count_indexed``, which rescans the
    corpus; here the segments ARE the corpus of record).
    """
    if len(word) < 3:
        return (
            idx.groupBy("name", "gram")
            .agg(F.sum("cnt").alias("cnt"))
            .groupBy("name")
            .agg(F.max("cnt").alias("cnt"))
            .filter(F.instr(F.col("name"), F.lit(word)) > 0)
            .select("name", "cnt")
            .orderBy("name")
        )
    grams = sorted({word[i : i + 3] for i in range(len(word) - 2)})
    return (
        idx.filter(F.col("gram").isin(grams))
        .groupBy("name", "gram")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("g"), F.max("cnt").alias("cnt"))
        .filter(
            (F.col("g") == len(grams))
            & (F.instr(F.col("name"), F.lit(word)) > 0)
        )
        .select("name", "cnt")
        .orderBy("name")
    )


def append_trigram_postings(
    spark: SparkSession, delta_names: DataFrame, name_col: str, table: str
) -> None:
    """Incremental index refresh: append the DELTA's postings as a new
    segment of the bucketed index table (same bucket spec, so appended
    files land in the same gram-buckets and lookups stay bucket-pruned).
    No existing file is touched -- at 100 TB this is a delta-sized
    write, not an index rebuild. Names already indexed simply gain a
    second partial-cnt posting per gram; the segment-aware serve path
    (search_count_index_segments) sums them.
    """
    (
        trigram_index(delta_names, name_col)
        .write.mode("append")
        .bucketBy(_N_IDX_BUCKETS, "gram")
        .sortBy("gram")
        .option("path", scratch_dir(table))
        .saveAsTable(table)
    )


def compact_trigram_index(spark: SparkSession, table: str) -> str:
    """Periodic compaction: fold all segments back to one row per
    (gram, name) by summing partial counts, written as a NEW
    epoch-versioned bucketed table (write-new-then-swap -- never
    overwrite a table while reading it; the old epoch stays readable
    for in-flight queries, the production pattern for index rollover).
    Returns the new table name; callers swap their reads to it.
    """
    epoch = int(spark.conf.get(f"spark.graft.{table}.epoch", "0")) + 1
    new_table = f"{table}_v{epoch}"
    (
        spark.table(table)
        .groupBy("name", "gram")
        .agg(F.sum("cnt").alias("cnt"))
        .select("name", "cnt", "gram")
        .write.mode("overwrite")
        .bucketBy(_N_IDX_BUCKETS, "gram")
        .sortBy("gram")
        .option("path", scratch_dir(new_table))
        .saveAsTable(new_table)
    )
    spark.conf.set(f"spark.graft.{table}.epoch", str(epoch))
    return new_table


_INC_TABLE = "trigram_idx_part_inc"
# deterministic corpus split for the incremental demo: base = md5-even
# half of part names, delta = the rest (scan-stable, no RNG)
_BASE_PRED = "substring(md5(cast(p_partkey as string)), 1, 1) in " + str(
    tuple("01234567")
)


def _ensure_incremental_trigram_table(spark: SparkSession, sf_dir: str) -> None:
    """Build the base-segment index from half the corpus, then APPEND
    the other half's postings -- the base+delta lifecycle, idempotent
    per sf_dir via the same marker-conf scheme as the full table."""
    marker = spark.conf.get("spark.graft.trigram_index_inc.for", "")
    if marker == sf_dir and spark.catalog.tableExists(_INC_TABLE):
        return
    names = load_table(spark, sf_dir, "part")
    base = names.filter(F.expr(_BASE_PRED))
    delta = names.filter(~F.expr(_BASE_PRED))
    (
        trigram_index(base, "p_name")
        .write.mode("overwrite")
        .bucketBy(_N_IDX_BUCKETS, "gram")
        .sortBy("gram")
        .option("path", scratch_dir(_INC_TABLE))
        .saveAsTable(_INC_TABLE)
    )
    append_trigram_postings(spark, delta, "p_name", _INC_TABLE)
    spark.conf.set("spark.graft.trigram_index_inc.for", sf_dir)


@query(
    "search_count_index_incremental",
    oracle=f"""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, '{SEARCH_WORD}') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Flagship Search query served from an INCREMENTALLY maintained "
    "trigram index: the bucketed table is built from half the corpus "
    "and the other half's postings are APPENDED as a delta segment "
    "(delta-sized write, no rebuild); the segment-aware serve path "
    "sums partial counts per (name, gram) before the all-grams gate. "
    "Same oracle as search_count -- refresh changes the index "
    "lifecycle, not the answer. compact_trigram_index() folds segments "
    "back to one row per posting via epoch-versioned "
    "write-new-then-swap (tests/test_indexing.py pins append/compact "
    "equivalence).",
)
def q_search_count_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_incremental_trigram_table(spark, sf_dir)
    return search_count_index_segments(spark.table(_INC_TABLE), SEARCH_WORD)


def index_served_search_for_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_trigram_table(spark, sf_dir)
    names = load_table(spark, sf_dir, "part")
    return search_count_indexed(
        names, SEARCH_WORD, "p_name", index=spark.table("trigram_idx_part")
    )


@query(
    "search_count_index_served",
    oracle=f"""
    SELECT p_name AS name, COUNT(*) AS cnt
    FROM part
    WHERE instr(p_name, '{SEARCH_WORD}') > 0
    GROUP BY p_name
    ORDER BY p_name
    """,
    doc="Flagship Search query served from the MATERIALIZED bucketed "
    "trigram index (build-once/query-many: the index is a "
    "bucketBy(gram)+sortBy catalog table, built once per sf_dir). The "
    "plan never scans the base table; with bucketed scan enabled the "
    "grams' IN-filter prunes to its buckets (SelectedBucketsCount, "
    "pinned in tests/test_indexing.py) and sortBy gives row-group "
    "pruning inside each. Per-query cost is O(query grams' postings) "
    "-- the amortized-index deployment the inline variant "
    "(search_count_indexed) only simulates.",
)
def q_search_count_index_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_served_search_for_audit(spark, sf_dir)
