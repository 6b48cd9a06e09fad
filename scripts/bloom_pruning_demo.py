#!/usr/bin/env python
"""Bloom-filter join-pruning demonstration on the snapshot sink's
change feed (VERDICT r6 item 9a).

The shape under test is the canonical CDC-incremental recompute: a
MERGE lands on a snapshot table (here: customers), ``changes(v1, v2)``
yields the changed keys, and a downstream consumer re-derives only the
fact rows of changed keys::

    orders  JOIN  changed_customer_keys  ON o_custkey = c_custkey

At 100 TB the fact side is the expensive part: without pruning, EVERY
orders row crosses the join exchange only to be dropped by the probe.
Spark's runtime bloom filter (InjectRuntimeFilter) builds a bloom over
the change feed's keys during planning and pushes
``might_contain(bloom, xxhash64(o_custkey))`` into the fact side's
scan+filter, so non-matching rows die BEFORE the shuffle.

This script measures that, not just asserts the plan (the plan-shape
assertion lives in tests/test_plans.py::test_runtime_bloom_filter_join):
it runs the join with the bloom rule off and on, and reads the
fact-side exchange's "shuffle records written" from the SQL status
REST API. Expected: records drop from ~|orders| to ~|orders of changed
customers| (the bloom's false-positive rate adds a sliver), wall time
drops with it.

Config notes, applied identically to both arms so the comparison is
fair:
  * autoBroadcastJoinThreshold=-1 -- at fixture scale the changed-key
    side is broadcastable and Spark would (correctly) prefer a
    broadcast join, which prunes via the join itself; the demo models
    the 100 TB regime where a week of changed keys exceeds the
    broadcast threshold and the join must shuffle.
  * applicationSideScanSizeThreshold=0 (default 10 GB) -- the fixture
    fact is ~100 MB; at 100 TB the default fires unaided on exactly
    this shape.

Usage: python scripts/bloom_pruning_demo.py --out SCALE_r07_bloom.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from os___mapreduceframework_spark.session import get_session
from os___mapreduceframework_spark.sinks.snapshot_table import SnapshotMergeTable

FIXTURE = os.environ.get("SPARK_GRAFT_BLOOM_SF", "/tmp/spark_graft_scale/sf3.0")
WORK = "/tmp/spark_graft_scale/bloom_demo"


def _rest_json(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read().decode())


def _metric_int(value: str) -> int:
    # SQL REST metric values render like "4,500,000" or
    # "total (min, med, max (stageId: taskId))\n123 (0, 1, 2 ...)"
    head = value.split("\n")[-1].strip().split(" ")[0]
    digits = "".join(c for c in head if c.isdigit())
    return int(digits) if digits else 0


def _exchange_records(spark, execution_id: int) -> list[int]:
    """'shuffle records written' of every Exchange node, descending --
    the max is the fact side (the changed-key side is ~1000x smaller)."""
    for ex in _rest_json(spark, "sql?details=true&length=200"):
        if ex.get("id") != execution_id:
            continue
        recs = []
        for node in ex.get("nodes", []):
            if "Exchange" not in node.get("nodeName", ""):
                continue
            for m in node.get("metrics", []):
                if m.get("name") == "shuffle records written":
                    recs.append(_metric_int(m.get("value", "0")))
        return sorted(recs, reverse=True)
    return []


def _latest_execution_id(spark) -> int:
    ids = [ex.get("id", -1) for ex in _rest_json(spark, "sql?length=200")]
    return max(ids) if ids else -1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_r07_bloom.json")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--changed-keys", type=int, default=2000)
    args = ap.parse_args()

    spark = get_session(
        app_name="bloom_pruning_demo",
        extra_conf={"spark.ui.enabled": "true"},  # metrics source (REST)
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "100MB",
    )

    # -- build the change feed: full customers v1, small merge -> v2 ------
    shutil.rmtree(WORK, ignore_errors=True)
    cust = spark.read.parquet(os.path.join(FIXTURE, "customer.parquet"))
    table = SnapshotMergeTable(
        spark, os.path.join(WORK, "customers"), keys=["c_custkey"]
    )
    table.overwrite(cust)
    delta = (
        cust.orderBy("c_custkey")
        .limit(args.changed_keys)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(1.0))
    )
    table.merge(delta)
    feed_path = os.path.join(WORK, "feed")
    # versions are 0-based: overwrite seeds v0, the merge lands v1
    table.changes(0, 1).write.mode("overwrite").parquet(feed_path)
    # InjectRuntimeFilter only fires when the creation side is a
    # SELECTIVE filter over a scan -- keep the change-type predicate
    # visible to the optimizer (an IN counts; localCheckpoint wouldn't)
    changed = (
        spark.read.parquet(feed_path)
        .filter(F.col("change_type").isin("insert", "update"))
        .select(F.col("c_custkey").alias("key"))
    )
    n_changed = changed.count()

    orders = spark.read.parquet(os.path.join(FIXTURE, "orders.parquet"))
    n_orders = orders.count()

    def run_join() -> tuple[float, int, bool]:
        j = orders.join(changed, orders["o_custkey"] == changed["key"]).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        t0 = time.perf_counter()
        j.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        exec_id = _latest_execution_id(spark)
        recs = _exchange_records(spark, exec_id)
        return wall, (max(recs) if recs else -1), ("might_contain" in plan)

    report = {
        "fixture": FIXTURE,
        "n_orders": n_orders,
        "n_changed_keys": n_changed,
        "runs": args.runs,
        "arms": {},
    }
    for arm, enabled in (("bloom_off", "false"), ("bloom_on", "true")):
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", enabled
        )
        walls, fact_recs, injected = [], [], False
        for _ in range(args.runs):
            w, r, inj = run_join()
            walls.append(round(w, 3))
            fact_recs.append(r)
            injected = injected or inj
        report["arms"][arm] = {
            "wall_s_min": min(walls),
            "wall_s": walls,
            "fact_exchange_records": fact_recs[-1],
            "might_contain_in_plan": injected,
        }
        print(f"# {arm}: min {min(walls):.3f}s fact-exchange "
              f"{fact_recs[-1]:,} rows injected={injected}",
              file=sys.stderr, flush=True)

    off = report["arms"]["bloom_off"]["fact_exchange_records"]
    on = report["arms"]["bloom_on"]["fact_exchange_records"]
    if off > 0 and on >= 0:
        report["shuffle_rows_pruned_pct"] = round(100.0 * (1 - on / off), 2)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "arms"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
