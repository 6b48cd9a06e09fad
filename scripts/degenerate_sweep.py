#!/usr/bin/env python
"""Degenerate-cardinality parity sweep: every query on EMPTY and
SINGLETON tables.

At 100 TB a selective filter or a cold partition routinely hands an
operator zero rows, and a freshly bootstrapped pipeline hands it one.
Neither shape ever occurs in the synthetic fixtures, so divergences
(driver-side sampling from an empty table, stddev-of-one NaN vs NULL,
division by a zero total, min/max of nothing feeding a range) stay
latent. This sweep makes the hunt mechanical, mirroring
scripts/adversarial_sweep.py: build the fixture, run the full registry
through the exact preflight compare, report divergences/errors.

Fixtures (schemas copied from sf0.001 so column types are identical):

- empty: every table with 0 rows. Contract: no crash, and Spark and
  DuckDB agree on the result (usually 0 rows; global aggregates may
  legitimately emit one NULL/0 row -- engines must agree which).
- one: every table LIMIT 1 (deterministic min-key row). FKs may
  dangle -- that is the point; joins must survive it.
- dup: every table UNION ALL'd with itself (2 bit-identical copies of
  every row). The ingestion-retry shape: at 100 TB replayed batches
  routinely double rows, and any query that assumes key uniqueness
  (window ties, merge sources, asof picks, canonical votes) must still
  agree with the oracle -- identical tied rows make ANY tiebreak
  value-identical, so a divergence here is a real order-dependence or
  uniqueness-assumption bug, never noise.

- conflict: every table UNION ALL'd with a key-preserving,
  payload-perturbed copy of itself (the retry-after-partial-update
  shape: a replayed batch carrying corrected values). Ties become REAL
  conflicts; any per-key winner pick must be deterministic and
  oracle-identical.

Usage: python scripts/degenerate_sweep.py [empty|one|dup|conflict] [names_substring]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BASE = os.environ.get("SPARK_GRAFT_ADV_BASE", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# deterministic "first" row per table so the singleton fixture is stable
_ORDER_KEY = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


# conflict mode: the copy keeps every key/FK but perturbs payload
# columns -- the retry-after-partial-update shape (a replayed batch
# carrying CORRECTED values). Unlike dup's bit-identical copies, ties
# here are REAL conflicts: any query that picks a per-key winner
# (first/any_value/dropDuplicates/limit ties) must pick it
# deterministically and identically to its oracle. Deltas are exactly
# representable in binary (0.25, 2^-10) so value hashing stays exact.
_CONFLICT_SELECT = {
    "region": "r_regionkey, r_name || '~' AS r_name",
    "nation": "n_nationkey, n_name || '~' AS n_name, n_regionkey",
    "customer": "c_custkey, c_name || '~' AS c_name, c_nationkey, "
    "c_acctbal + 0.25 AS c_acctbal, c_mktsegment",
    "supplier": "s_suppkey, s_name || '~' AS s_name, s_nationkey, "
    "s_acctbal + 0.25 AS s_acctbal",
    "part": "p_partkey, p_name || '~' AS p_name, p_brand, p_type, "
    "p_size, p_retailprice + 0.25 AS p_retailprice",
    "orders": "o_orderkey, o_custkey, o_orderstatus, "
    "o_totalprice + 0.25 AS o_totalprice, o_orderdate, o_orderpriority",
    "lineitem": "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
    "l_quantity + 0.25 AS l_quantity, "
    "l_extendedprice + 0.25 AS l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate",
    "events": "event_id, ts, user_id, event_type, "
    "value + 0.25 AS value, props",
    "documents": "doc_id, text || ' conflictmark' AS text, lang, "
    "source, n_chars",
    "embeddings": "vec_id, list_transform(embedding, "
    "x -> CAST(x + 0.0009765625 AS FLOAT)) AS embedding, label",
}


def build_dir(mode: str) -> str:
    out = tempfile.mkdtemp(prefix=f"sf_degenerate_{mode}_")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if mode == "empty":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') WHERE 1=0) "
                f"TO '{dst}' (FORMAT parquet)"
            )
        elif mode == "dup":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') UNION ALL "
                f"SELECT * FROM read_parquet('{src}')) "
                f"TO '{dst}' (FORMAT parquet)"
            )
        elif mode == "conflict":
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') UNION ALL "
                f"SELECT {_CONFLICT_SELECT[t]} FROM read_parquet('{src}')) "
                f"TO '{dst}' (FORMAT parquet)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') "
                f"ORDER BY {_ORDER_KEY[t]} LIMIT 1) "
                f"TO '{dst}' (FORMAT parquet)"
            )
    return out


def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = str(r[i])
            vals.append("nan" if v.lower() == "nan" else v)
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    modes = ["empty", "one", "dup", "conflict"]
    if len(sys.argv) > 1 and sys.argv[1] in modes:
        modes = [sys.argv[1]]
        only = sys.argv[2] if len(sys.argv) > 2 else ""
    else:
        only = sys.argv[1] if len(sys.argv) > 1 else ""

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # SPARK_GRAFT_PERTURB=1: run every mode under the hostile physical
    # config of scripts/perturbed_sweep.py (odd worker count, 3 shuffle
    # partitions, 64 KB splits, 7-row Arrow batches) -- the cross cell
    # that caught the span island-merge tie bug (perturbed x conflict).
    if os.environ.get("SPARK_GRAFT_PERTURB"):
        builder = (
            SparkSession.builder.master("local[5]")
            .config("spark.sql.shuffle.partitions", "3")
            .config("spark.sql.files.maxPartitionBytes", "65536")
            .config("spark.sql.files.openCostInBytes", "0")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
        )
    spark = builder.getOrCreate()
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    total_bad = 0
    for mode in modes:
        sf_dir = build_dir(mode)
        print(f"== mode={mode} dir={sf_dir}")
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        bad = 0
        t0 = time.time()
        for i, (name, fn) in enumerate(qs.items(), 1):
            if only and only not in name:
                continue
            if name not in oracles:
                continue
            try:
                df = fn(spark, sf_dir)
                a = norm(df.columns, [tuple(r) for r in df.collect()])
            except Exception as e:
                # documented degenerate-input contract: bucket-anchored
                # queries (retention/drift/gap) REFUSE an empty or
                # all-NULL timestamp column with a clear error rather
                # than emit buckets anchored at undefined bounds
                # (sources/registry.py ts_bounds_us, ADVICE r4 item 4)
                if "timestamp bounds are undefined" in str(e):
                    print(f"{i} OK-CONTRACT {name}: refused (ts bounds undefined)")
                    continue
                print(f"{i} SPARK-ERR {name}: {str(e)[:160]}")
                bad += 1
                continue
            try:
                o = con.execute(oracles[name])
                b = norm([d[0] for d in o.description], o.fetchall())
            except Exception as e:
                print(f"{i} ORACLE-ERR {name}: {str(e)[:160]}")
                bad += 1
                continue
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(
                    f"{i} DIVERGE {name}: spark={len(a)} oracle={len(b)} "
                    f"first_diff={diffs[0] if diffs else ('row-count',)}"
                )
                bad += 1
            else:
                print(f"{i} OK  {name} rows={len(a)}")
        print(f"DONE mode={mode} bad={bad} total_sec={time.time() - t0:.0f}")
        con.close()
        total_bad += bad
    return 1 if total_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
