#!/usr/bin/env python
"""Pre-snapshot gate: simulate the driver's correctness sweep.

Runs every registered query through the EXACT harness contract — a
plain SparkSession (not the repo's factory), ``__spark_entry__``'s
``queries()`` / ``oracle_sql()``, DuckDB views over the fixture
parquet — and compares sorted-column/sorted-row stringified values,
which is what the driver's value-hash reduces to.

Usage:
    python scripts/preflight_sweep.py [limit] [sf_dir]

Run this (plus ``pytest tests/ -q``) before every end-of-round commit;
both rounds 1 and 2 shipped a broken final commit that this gate would
have caught.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in idx) for r in rows)


def main() -> int:
    # argv[1]: integer -> check only the first N (sweep-order prefix);
    # comma-separated names -> check only those (targeted re-verify)
    limit, only = 0, None
    if len(sys.argv) > 1:
        if sys.argv[1].isdigit():
            limit = int(sys.argv[1])
        else:
            only = set(sys.argv[1].split(","))
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    names = list(qs)[: limit or len(qs)]
    if only is not None:
        missing = only - set(names)
        if missing:
            print(f"UNKNOWN query names: {sorted(missing)}", flush=True)
            return 1
        names = [n for n in names if n in only]
    bad = 0
    t_start = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf)
            s = norm(df.columns, df.collect())
            if name in oracles:
                res = con.execute(oracles[name])
                o = norm([d[0] for d in res.description], res.fetchall())
                ok, tag = s == o, "OK " if s == o else "MISMATCH"
            else:
                ok, tag = True, "ROWSONLY"
            if not ok:
                bad += 1
            print(f"{i + 1:3d} {tag} {name} rows={len(s)} {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — gate must report, not die
            bad += 1
            print(f"{i + 1:3d} ERROR {name}: {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
    print(f"DONE bad={bad} total_sec={time.time() - t_start:.0f}", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
