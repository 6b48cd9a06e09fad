#!/usr/bin/env python
"""Adversarial-data parity sweep: every query, on data with the edges
the synthetic fixtures never produce.

The driver's correctness gate runs on clean generated data; three
review passes found latent Spark/DuckDB divergences that only trigger
on edge rows (empty text, NULL source, duplicate (user_id, ts), ...).
This script makes that hunt mechanical: copy sf0.001 into a scratch
dir, INJECT the edge rows, and run the full registry through the exact
preflight compare. A divergence here is a real portability bug on
plausible data, even though the clean-fixture gate stays green.

Injected edges (schemas preserved; ts kept non-null for watermarks):

- documents: empty text, single-word text, an exact duplicate of
  doc 0's text, NULL source, NULL lang.
- events: duplicate (user_id, ts) pair with distinct event_ids, NULL
  value, NULL event_type, NULL props, an FK-orphan user_id.
- embeddings: a ZERO vector (cosine is undefined -- both engines must
  agree it is NULL, not NaN vs DuckDB's -1.0) and an exact duplicate
  of vec 0's vector (cos == 1.0 ties).

Usage: python scripts/adversarial_sweep.py [names_substring]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# override with SPARK_GRAFT_ADV_BASE=/root/testdata/sf0.1 for the
# large-fixture pass (VERDICT r4 item 7); default stays the fast gate
BASE = os.environ.get("SPARK_GRAFT_ADV_BASE", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_adversarial_dir() -> str:
    out = tempfile.mkdtemp(prefix="sf_adversarial_")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "documents":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM (VALUES
                    ((SELECT max(doc_id) + 1 FROM read_parquet('{src}')), '', 'en', 'src0', 0::BIGINT),
                    ((SELECT max(doc_id) + 2 FROM read_parquet('{src}')), 'word', 'en', NULL, 4::BIGINT),
                    ((SELECT max(doc_id) + 3 FROM read_parquet('{src}')),
                     (SELECT text FROM read_parquet('{src}') WHERE doc_id = 0),
                     'en', 'src1',
                     (SELECT n_chars FROM read_parquet('{src}') WHERE doc_id = 0)),
                    ((SELECT max(doc_id) + 4 FROM read_parquet('{src}')), 'a b', NULL, 'src2', 3::BIGINT),
                    ((SELECT max(doc_id) + 5 FROM read_parquet('{src}')), '   ', 'en', 'src0', 3::BIGINT),
                    ((SELECT max(doc_id) + 6 FROM read_parquet('{src}')), 'héllo wörld ünïcode tæxt みんな', 'de', 'src1', 29::BIGINT),
                    -- NULL text (round 6): a failed fetch/decode row;
                    -- split/explode/md5 must agree engine-to-engine on
                    -- skipping vs propagating it
                    ((SELECT max(doc_id) + 7 FROM read_parquet('{src}')), NULL, 'en', 'src0', 0::BIGINT),
                    -- pathological docs (round 6 session 4): a LONG
                    -- highly self-repetitive doc (1600 tokens, every
                    -- span window duplicated hundreds of times -- the
                    -- boilerplate page shape), a whitespace-run doc
                    -- (split(' ') emits EMPTY tokens on both engines),
                    -- and a single 5000-char token (no spaces at all)
                    ((SELECT max(doc_id) + 8 FROM read_parquet('{src}')),
                     trim(repeat('spam ham eggs bacon ', 400)), 'en', 'src1', 7999::BIGINT),
                    ((SELECT max(doc_id) + 9 FROM read_parquet('{src}')),
                     'a  b ' || chr(9) || ' c  ', 'en', 'src2', 9::BIGINT),
                    ((SELECT max(doc_id) + 10 FROM read_parquet('{src}')),
                     repeat('x', 5000), 'en', 'src0', 5000::BIGINT)
                  ) v(doc_id, text, lang, source, n_chars)
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "events":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM (
                    SELECT (SELECT max(event_id) + 1 FROM read_parquet('{src}')) AS event_id, ts, user_id,
                           event_type, value, props
                    FROM read_parquet('{src}') WHERE event_id = 0
                  )
                  UNION ALL
                  SELECT (SELECT max(event_id) + 2 FROM read_parquet('{src}')), ts, user_id, NULL, NULL, NULL
                  FROM read_parquet('{src}') WHERE event_id = 1
                  UNION ALL
                  SELECT (SELECT max(event_id) + 3 FROM read_parquet('{src}')), ts, 999999999::BIGINT, 'view',
                         value, props
                  FROM read_parquet('{src}') WHERE event_id = 2
                  UNION ALL
                  -- out-of-histogram-domain values: clamping paths on
                  -- both engines must agree (negative and >1000)
                  SELECT (SELECT max(event_id) + 4 FROM read_parquet('{src}')), ts, user_id, event_type,
                         -5.5, props
                  FROM read_parquet('{src}') WHERE event_id = 3
                  UNION ALL
                  SELECT (SELECT max(event_id) + 5 FROM read_parquet('{src}')), ts, user_id, event_type,
                         123456.75, props
                  FROM read_parquet('{src}') WHERE event_id = 4
                  UNION ALL
                  -- IEEE specials (VERDICT r5 item 8): Spark and DuckDB
                  -- differ subtly on NaN (Spark: NaN==NaN in group/join
                  -- keys and sorts LAST; DuckDB: NaN groups too and
                  -- sorts last) and on Inf arithmetic (Inf-Inf=NaN in
                  -- both) -- any aggregate/histogram/clamp path that
                  -- disagrees shows up as a hash mismatch here
                  SELECT (SELECT max(event_id) + 6 FROM read_parquet('{src}')), ts, user_id, event_type,
                         'NaN'::DOUBLE, props
                  FROM read_parquet('{src}') WHERE event_id = 5
                  UNION ALL
                  SELECT (SELECT max(event_id) + 7 FROM read_parquet('{src}')), ts, user_id, event_type,
                         'Infinity'::DOUBLE, props
                  FROM read_parquet('{src}') WHERE event_id = 6
                  UNION ALL
                  SELECT (SELECT max(event_id) + 8 FROM read_parquet('{src}')), ts, user_id, event_type,
                         '-Infinity'::DOUBLE, props
                  FROM read_parquet('{src}') WHERE event_id = 7
                  UNION ALL
                  -- clock-skew rows (round 6 session 4): a NEGATIVE-
                  -- epoch timestamp (pre-1970 client clock) and a
                  -- far-future one. Negative epoch micros are where
                  -- truncating vs flooring integer division, lpad'd
                  -- string sort keys, and time-bucket anchors diverge
                  -- between engines; the future row stretches every
                  -- (min ts, max ts)-derived grid/origin
                  SELECT (SELECT max(event_id) + 9 FROM read_parquet('{src}')),
                         TIMESTAMP '1969-06-01 12:34:56', user_id,
                         event_type, value, props
                  FROM read_parquet('{src}') WHERE event_id = 8
                  UNION ALL
                  SELECT (SELECT max(event_id) + 10 FROM read_parquet('{src}')),
                         TIMESTAMP '2098-07-04 08:00:00', user_id,
                         event_type, value, props
                  FROM read_parquet('{src}') WHERE event_id = 9
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "embeddings":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT (SELECT max(vec_id) + 1 FROM read_parquet('{src}')) AS vec_id,
                         list_transform(embedding, x -> 0.0::FLOAT)
                           AS embedding,
                         label
                  FROM read_parquet('{src}') WHERE vec_id = 0
                  UNION ALL
                  SELECT (SELECT max(vec_id) + 2 FROM read_parquet('{src}')), embedding, label
                  FROM read_parquet('{src}') WHERE vec_id = 0
                  UNION ALL
                  -- huge-magnitude vector: quantization/normalization
                  -- paths must not silently overflow or diverge
                  SELECT (SELECT max(vec_id) + 3 FROM read_parquet('{src}')),
                         list_transform(embedding, x -> x * 1000000.0::FLOAT),
                         label
                  FROM read_parquet('{src}') WHERE vec_id = 1
                  UNION ALL
                  -- NULL vector (failed encoder -- round 6): one such
                  -- row CRASHED the np.vstack banding batch before the
                  -- unnest-mirroring skip; every embedding consumer
                  -- must either skip it like the oracle's unnest does
                  -- or agree engine-to-engine on its NULL propagation
                  SELECT (SELECT max(vec_id) + 4 FROM read_parquet('{src}')),
                         NULL::FLOAT[], label
                  FROM read_parquet('{src}') WHERE vec_id = 2
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "customer":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  -- dimension row with every non-key attribute NULL
                  -- (round 6): NULL nationkey breaks the dim->dim hop,
                  -- NULL mktsegment is a NULL group/filter key, NULL
                  -- acctbal a NULL measure in dim-side aggregates
                  SELECT (SELECT max(c_custkey) + 1 FROM read_parquet('{src}')),
                         'Customer#null', NULL::INTEGER, NULL::DOUBLE,
                         NULL::VARCHAR
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "supplier":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT (SELECT max(s_suppkey) + 1 FROM read_parquet('{src}')),
                         'Supplier#null', NULL::INTEGER, NULL::DOUBLE
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "part":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  -- NULL type/size/price: p_type feeds LIKE filters and
                  -- grouping, p_size range predicates, retailprice sums
                  SELECT (SELECT max(p_partkey) + 1 FROM read_parquet('{src}')),
                         'null part', (SELECT p_brand FROM read_parquet('{src}') LIMIT 1),
                         NULL::VARCHAR, NULL::INTEGER, NULL::DOUBLE
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "orders":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  -- NULL FK + NULL measure (round 6): a half-ingested
                  -- order. NULL custkey must behave identically in
                  -- joins (never matches), outer joins (row kept),
                  -- grouping (NULLs group together) and windows on
                  -- both engines across the ~100 TPC-H-shaped queries
                  SELECT (SELECT max(o_orderkey) + 1 FROM read_parquet('{src}')),
                         NULL::BIGINT, o_orderstatus, NULL::DOUBLE,
                         ts, o_orderpriority
                  FROM (SELECT o_orderstatus, o_orderdate AS ts, o_orderpriority
                        FROM read_parquet('{src}') LIMIT 1)
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        elif t == "lineitem":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  -- FK-orphan line (points at the NULL-custkey order's
                  -- key space) with NULL part/supp keys and NULL price
                  SELECT (SELECT max(l_orderkey) + 999 FROM read_parquet('{src}')),
                         NULL::BIGINT, NULL::BIGINT, 1,
                         l_quantity, NULL::DOUBLE, l_discount, l_tax,
                         l_returnflag, l_linestatus, l_shipdate
                  FROM read_parquet('{src}') LIMIT 1
                ) TO '{dst}' (FORMAT parquet)
                """
            )
        else:
            shutil.copyfile(src, dst)
    return out


def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = str(r[i])
            # NaN spellings differ (Spark 'nan' via python float; DuckDB
            # 'nan'); normalize case so only REAL divergences surface
            vals.append("nan" if v.lower() == "nan" else v)
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = build_adversarial_dir()
    print("adversarial dir:", sf_dir)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
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
    print(f"DONE bad={bad} total_sec={time.time() - t0:.0f}")
    shutil.rmtree(sf_dir, ignore_errors=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
