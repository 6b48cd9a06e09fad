#!/usr/bin/env python
"""Time every registered query ONCE at a given fixture dir and report
the slowest -- the round-5 full-registry sf0.1 scan caught a 317 s
quadratic demo query the headline bench never ran; this generalizes it
to any fixture (round 6 runs it at the generated sf1.0 to catch
queries whose scaling the 19-query scale_bench sample missed).

Usage: python scripts/full_registry_scan.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1.0"
    out = sys.argv[2] if len(sys.argv) > 2 else "REGISTRY_SCAN.json"
    spark = get_session(app_name="full_registry_scan")
    qs = registry.queries()
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(sorted(qs), 1):
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"{i:3d} OK  {name} {times[name]:.1f}s", file=sys.stderr, flush=True)
        except Exception as exc:  # keep scanning; report at the end
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"{i:3d} ERR {name}: {errors[name][:120]}",
                  file=sys.stderr, flush=True)
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:15]
    report = {
        "sf_dir": sf_dir,
        "n_ok": len(times),
        "n_err": len(errors),
        "total_sec": round(sum(times.values()), 1),
        "slowest": slowest,
        "errors": errors,
        "times": times,
    }
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"metric": "full_registry_scan", "sf_dir": sf_dir,
                      "ok": len(times), "err": len(errors),
                      "total_sec": report["total_sec"],
                      "slowest3": slowest[:3]}))
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
