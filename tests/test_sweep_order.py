"""Pin the driver-sweep rotation contract (VERDICT.md round-3 item 1).

The driver's correctness harness checks ~50 queries per round in the
order ``queries()`` yields them. ``_sweep_order()`` must therefore put
every query that has no ``CORRECTNESS_r*.json`` row yet ahead of all
already-checked queries, so each round's budget lands on fresh coverage.
"""

from __future__ import annotations

import glob
import json
import os

from os___mapreduceframework_spark import queries as registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checked_from_disk() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            seen |= set(json.load(f))
    return seen


def test_never_checked_queries_sweep_first():
    order = list(registry.queries())
    checked = _checked_from_disk()
    never = [n for n in order if n not in checked]
    if not never:  # every query has a driver row -> nothing to rotate
        return
    # every never-checked query precedes every checked query
    last_never = max(order.index(n) for n in never)
    first_checked = min(
        (order.index(n) for n in order if n in checked), default=len(order)
    )
    assert last_never < first_checked, (
        f"checked query at {first_checked} precedes never-checked at {last_never}"
    )


def test_driver_budget_filled_with_fresh_queries():
    """The first 50 slots (the driver's per-round budget) must all be
    never-checked while >=50 never-checked queries remain."""
    order = list(registry.queries())
    checked = _checked_from_disk()
    never = [n for n in order if n not in checked]
    if len(never) >= 50:
        assert all(n not in checked for n in order[:50])


def test_oracle_sql_order_matches_queries_order():
    """The driver zips queries() with oracle_sql(); relative order must
    agree so the sweep pairs each query with its own oracle."""
    qpos = {n: i for i, n in enumerate(registry.queries())}
    prev = -1
    for name in registry.oracle_sql():
        assert qpos[name] > prev
        prev = qpos[name]


def test_every_query_still_oracled():
    """Round-3 invariant: zero rows-only queries (all DuckDB-oracled)."""
    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert set(qs) == set(oracles)
