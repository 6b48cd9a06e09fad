"""Physical-plan inspection + phase timing instrumentation.

The reference logs per-phase wall times to ``.MapReduceFramework.log``
(MapReduceFramework.cpp:388-392, :413-417 -- with a 10x unit bug at
:21). Spark's equivalent observability is the executed plan and query
execution metrics; this module exposes both: ``executed_plan`` for plan
audits (pushdown/broadcast/codegen assertions in tests) and a
``QueryExecutionListener`` that logs correct-unit phase timings.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession


def executed_plan(df: DataFrame, *, run: bool = False) -> str:
    """The physical plan string. With ``run=True`` the query is executed
    first so AQE finalizes the plan (``isFinalPlan=true``) and
    WholeStageCodegen subtree annotations become visible -- under AQE
    the pre-execution plan omits codegen stage markers."""
    if run:
        # collect() executes THIS DataFrame's QueryExecution (count()
        # would build a new one and leave this plan un-finalized)
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def assert_plan(df: DataFrame, *, contains: tuple[str, ...] = (), absent: tuple[str, ...] = ()):
    """Test helper: assert physical-plan properties (e.g. a broadcast
    happened, a filter pushed down, no cartesian product appeared)."""
    plan = executed_plan(df)
    for frag in contains:
        assert frag in plan, f"expected {frag!r} in plan:\n{plan[:2000]}"
    for frag in absent:
        assert frag not in plan, f"did not expect {frag!r} in plan:\n{plan[:2000]}"
    return plan


FACT_TABLES = ("lineitem", "orders.parquet", "events")


def raw_fact_broadcasts(df: DataFrame, facts: tuple[str, ...] = FACT_TABLES) -> list[str]:
    """Fact tables must never broadcast: at production scale they are
    TBs, and a plan that broadcasts one only 'works' because small-SF
    statistics put a narrow projection under the threshold (that trap
    cost q4_order_priority 3.8 s locally and would be fatal on a
    cluster). Returns the offending fact names: every BroadcastExchange
    subtree that contains a RAW fact FileScan -- an *aggregated*
    derivative (e.g. q18's per-order quantity sums) is legitimately
    small and not flagged."""
    return _broadcast_offenders(executed_plan(df), facts)


def _tree_depth(line: str) -> int:
    """Depth of a plan-tree line = length of its tree-art prefix.

    Plain leading-space counting is WRONG for Spark tree strings: every
    line inside a non-last child branch is prefixed with ':' at the
    same column (':- BroadcastExchange' / ':  +- FileScan' both have
    zero leading spaces), so an indent-based subtree slice terminates
    immediately and silently misses the broadcast's children. The
    tree-art prefix is any run of ':', ' ', '+', '-' before the node
    text (node names never start with those characters)."""
    import re

    return re.match(r"^[:\s+\-]*", line).end()


def _broadcast_offenders(plan: str, facts: tuple[str, ...]) -> list[str]:
    lines = plan.splitlines()
    offenders = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = _tree_depth(line)
        sub = []
        for l2 in lines[i + 1 :]:
            if l2.strip() and _tree_depth(l2) <= depth:
                break
            sub.append(l2)
        subtxt = "\n".join(sub)
        if "HashAggregate" in subtxt or "SortAggregate" in subtxt:
            continue
        offenders.extend(f for f in facts if f in subtxt)
    return sorted(set(offenders))


def phase_timings_listener(spark: SparkSession, log_path: str):
    """Attach a QueryExecutionListener appending one JSON line per query
    with wall time in seconds (correct units, unlike the reference's
    SEC_TO_NANO=1e10 bug at MapReduceFramework.cpp:21).

    Returns the listener so callers can detach with
    ``spark.listenerManager.unregister(...)``. Py4J callback listeners
    need the gateway's callback server; we fall back to a no-op shim if
    it is unavailable (e.g. some embedded environments).
    """
    from pyspark.sql.utils import QueryExecutionListener

    class _Timings(QueryExecutionListener):
        def onSuccess(self, funcName, qe, durationNs):
            rec = {
                "ts": time.time(),
                "func": funcName,
                "duration_sec": durationNs / 1e9,
            }
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        def onFailure(self, funcName, qe, exception):
            rec = {"ts": time.time(), "func": funcName, "error": str(exception)[:200]}
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    listener = _Timings()
    spark.listenerManager.register(listener)
    return listener
