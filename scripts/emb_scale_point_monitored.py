#!/usr/bin/env python
"""Wrapper around emb_scale_point.py that samples free disk + load
every 15 s while the point runs, so the sidecar records peak transient
disk (the binding constraint on this 79 GB-free box) and the load
profile OVER the run, not just at its start — SCALE_r07_strict.json's
strict_600k entries showed start-time load does not predict steal over
a 10-minute run.

Usage: python scripts/emb_scale_point_monitored.py QUERY DIR RUNS BUDGET_SEC [OUT]
Prints (and optionally writes) one JSON object: the child's record plus
{"disk_free_gb": {"start","min"}, "peak_transient_gb", "load_profile"}.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def free_gb() -> float:
    return shutil.disk_usage("/tmp").free / (1 << 30)


def main() -> int:
    name, d = sys.argv[1], sys.argv[2]
    runs = sys.argv[3] if len(sys.argv) > 3 else "1"
    budget = sys.argv[4] if len(sys.argv) > 4 else "7200"
    out_path = sys.argv[5] if len(sys.argv) > 5 else None

    start_free = free_gb()
    stats = {"min_free": start_free, "loads": []}
    stop = threading.Event()

    def sampler() -> None:
        while not stop.wait(15):
            stats["min_free"] = min(stats["min_free"], free_gb())
            stats["loads"].append(round(os.getloadavg()[0], 1))

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "emb_scale_point.py"),
         name, d, runs, budget],
        capture_output=True, text=True,
    )
    stop.set()
    t.join(timeout=1)
    try:
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        rec = {"query": name, "dir": d,
               "error": f"child rc={proc.returncode}: {proc.stderr[-300:]}"}
    loads = stats["loads"]
    rec["disk_free_gb"] = {"start": round(start_free, 1),
                           "min": round(stats["min_free"], 1)}
    rec["peak_transient_gb"] = round(start_free - stats["min_free"], 1)
    rec["load_profile"] = {
        "samples": len(loads),
        "min": min(loads) if loads else None,
        "median": sorted(loads)[len(loads) // 2] if loads else None,
        "max": max(loads) if loads else None,
    }
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
