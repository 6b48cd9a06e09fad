#!/usr/bin/env python
"""Physical-plan perturbation sweep: the full oracle compare under a
hostile execution configuration.

A query can pass the clean preflight and still carry order-dependent or
batch-boundary-dependent semantics (an arbitrary-winner dedup, a
per-pandas-batch accumulator, a first()-style pick): the fixed config
just happens to produce the matching order. At 100 TB none of the
physical knobs this sweep perturbs are stable -- AQE re-plans shuffle
partition counts at runtime, input split sizes follow file layout, and
Arrow batch sizes follow executor memory pressure -- so semantics that
depend on any of them WILL diverge in production even though every
fixed-config test is green.

Perturbations (vs the preflight/driver config of local[8] x 8 shuffle
partitions, default 128 MB splits, 10k-row Arrow batches):

- spark.sql.shuffle.partitions=3: different hash layout for every
  shuffle -> different reduce-side encounter order.
- spark.sql.files.maxPartitionBytes=65536 (+ openCostInBytes=0):
  every scan fractures into many tiny splits -> different map-side
  order and many more partitions than rows in some tables.
- spark.sql.execution.arrow.maxRecordsPerBatch=7: every pandas_udf /
  mapInPandas / applyInPandas sees many tiny batches -> any logic
  that accidentally assumes "one batch = one group/partition"
  surfaces.
- local[5]: odd worker count, different task interleaving.

The compare itself is byte-identical to scripts/preflight_sweep.py
(sorted-column / sorted-row stringified values vs the DuckDB oracle,
which is what the driver's value-hash reduces to): a divergence here is
a real nondeterminism bug, never noise.

Usage: python scripts/perturbed_sweep.py [limit|names_csv] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in idx) for r in rows)


def main() -> int:
    limit, only = 0, None
    if len(sys.argv) > 1:
        if sys.argv[1].isdigit():
            limit = int(sys.argv[1])
        else:
            only = set(sys.argv[1].split(","))
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[5]")
        .config("spark.sql.shuffle.partitions", "3")
        .config("spark.sql.files.maxPartitionBytes", "65536")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    bad, t0 = 0, time.time()
    for i, (name, fn) in enumerate(qs.items(), 1):
        if limit and i > limit:
            break
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        tq = time.time()
        try:
            df = fn(spark, sf)
            a = norm(df.columns, [tuple(r) for r in df.collect()])
        except Exception as ex:
            print(f"{i} SPARK-ERR {name}: {str(ex)[:160]}")
            bad += 1
            continue
        try:
            o = con.execute(oracles[name])
            b = norm([d[0] for d in o.description], o.fetchall())
        except Exception as ex:
            print(f"{i} ORACLE-ERR {name}: {str(ex)[:160]}")
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
            print(f"{i} OK  {name} rows={len(a)} {time.time() - tq:.1f}s")
    print(f"DONE bad={bad} total_sec={time.time() - t0:.0f}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
