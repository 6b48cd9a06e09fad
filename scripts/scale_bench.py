#!/usr/bin/env python
"""Scaling-curve bench: time a set of queries at several fixture sizes
and report per-query time ratios vs the smallest size (VERDICT r5 item
1 -- the repo's 100 TB claims were plan-audited but never *measured*
above sf0.1; this measures them).

Fixture dirs come from scripts/make_scale_fixture.py. The headline
check: a linear-dataflow query at a 10x fixture should take <= ~15x its
base min (10x data + amortized fixed overhead headroom on a shared
box); anything steeper is flagged SUPERLINEAR and needs a named cause.
Streaming queries carry large fixed startup costs, so their ratios read
low -- the interesting direction for them is "did state size blow up",
which the state-shape goldens pin separately.

Timing protocol matches bench.py: noop-sink materialization (full
column evaluation, no collect), min of N runs per (query, sf) as the
stable capability measure on a shared box.

Usage:
    python scripts/make_scale_fixture.py --factor 10 --dest /tmp/spark_graft_scale/sf1.0
    python scripts/scale_bench.py --out SCALE_r06.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.session import get_session

# heavy families from the r5 verdict's top-expense audit + linear
# controls whose dataflow is a single scan->shuffle->agg (if THOSE go
# superlinear the harness itself is suspect)
DEFAULT_QUERIES = [
    # linear controls
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_fact_fact",
    "dedup_exact",
    "dedup_exact_spans",
    "text_tfidf_top",
    "ann_lsh_topk",
    "training_pack_sequences",
    # heavy families under test
    "dedup_minhash_pairs",
    "ann_knn_join_all",
    "dedup_embedding_clusters",
    "embedding_kmeans_clusters",
    "text_bpe_train_merges",
    "text_perplexity_bigram",
    "graph_pagerank_suppliers",
    "curation_pipeline_v3",
    "hot_isolated_join_agg",
    # streaming (fixed startup dominates; included for state blowup)
    "stream_tumbling_agg",
    "stream_incremental_dedup",
]

DEFAULT_DIRS = [
    "/root/testdata/sf0.1",
    "/tmp/spark_graft_scale/sf0.3",
    "/tmp/spark_graft_scale/sf1.0",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", default=DEFAULT_DIRS)
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="SCALE_r06.json")
    ap.add_argument(
        "--budget-sec",
        type=float,
        default=420.0,
        help="per-(query,sf) sample budget: if the first run exceeds "
        "this, remaining runs are skipped (the number is already "
        "conclusive for a scaling check)",
    )
    args = ap.parse_args()

    for d in args.dirs:
        if not os.path.isdir(d):
            print(f"missing fixture dir {d}; run make_scale_fixture.py", file=sys.stderr)
            return 2

    spark = get_session(app_name="scale_bench")
    qs = registry.queries()
    base_dir = args.dirs[0]

    # JVM/codegen/python-worker warmup, same as bench.py
    region = spark.read.parquet(os.path.join(base_dir, "region.parquet"))
    materialize(region)
    materialize(region.mapInPandas(lambda it: it, schema=region.schema))

    results: dict[str, dict[str, float]] = {}
    samples: dict[str, dict[str, list[float]]] = {}
    for name in args.queries:
        results[name] = {}
        samples[name] = {}
        for d in args.dirs:
            runs = []
            for i in range(args.runs):
                t0 = time.perf_counter()
                materialize(qs[name](spark, d))
                runs.append(round(time.perf_counter() - t0, 3))
                if runs[-1] > args.budget_sec:
                    break
            results[name][d] = min(runs)
            samples[name][d] = runs
            print(f"# {name} @ {os.path.basename(d)}: {min(runs):.3f}s {runs}",
                  file=sys.stderr, flush=True)

    def _sf(d: str) -> float:
        return float(os.path.basename(d.rstrip("/"))[2:])

    base_sf = _sf(base_dir)
    report = {"base_dir": base_dir, "dirs": args.dirs, "runs": args.runs,
              "stat": "min", "queries": {}}
    for name in args.queries:
        base_t = results[name][base_dir]
        entry = {"sec": {os.path.basename(d): results[name][d] for d in args.dirs},
                 "samples": {os.path.basename(d): samples[name][d] for d in args.dirs},
                 "ratio_vs_base": {}}
        worst = 0.0
        for d in args.dirs[1:]:
            data_x = _sf(d) / base_sf
            time_x = results[name][d] / base_t if base_t > 0 else float("inf")
            entry["ratio_vs_base"][os.path.basename(d)] = {
                "data_x": round(data_x, 2),
                "time_x": round(time_x, 2),
            }
            worst = max(worst, time_x / data_x)
        entry["worst_time_per_data_x"] = round(worst, 2)
        entry["superlinear"] = worst > 1.5
        report["queries"][name] = entry

    flagged = sorted(n for n, e in report["queries"].items() if e["superlinear"])
    report["superlinear_queries"] = flagged
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "scale_bench", "out": args.out,
                      "superlinear": flagged}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
