"""Pin the driver-sweep rotation contract (VERDICT.md round-3 item 1,
round-4 ADVICE item 1).

The driver's correctness harness checks ~50 queries per round in the
order ``queries()`` yields them. ``_sweep_order()`` must therefore put
every query that has no PASSING ``CORRECTNESS_r*.json`` row yet ahead
of all green queries, so each round's budget lands on fresh coverage —
and a query whose latest driver row FAILED (errored / no_oracle /
hash mismatch) counts as unchecked, so known-broken queries re-sweep
first until green instead of rotating behind fresh coverage forever.
"""

from __future__ import annotations

import glob
import json
import os
import re

from os___mapreduceframework_spark import queries as registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_rows() -> dict[str, dict]:
    latest: dict[str, tuple[int, dict]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if name not in latest or rnd >= latest[name][0]:
                    latest[name] = (rnd, row)
    return {n: row for n, (_, row) in latest.items()}


def _green_from_disk() -> set[str]:
    return {
        n
        for n, row in _latest_rows().items()
        if row.get("err") is None
        and (row.get("hash_match") or row.get("spark_rows") is not None)
    }


def test_unchecked_and_failed_queries_sweep_first():
    order = list(registry.queries())
    green = _green_from_disk()
    pending = [n for n in order if n not in green]
    if not pending:  # every query has a green driver row -> nothing to rotate
        return
    # every pending (never-checked OR last-failed) query precedes every green one
    last_pending = max(order.index(n) for n in pending)
    first_green = min(
        (order.index(n) for n in order if n in green), default=len(order)
    )
    assert last_pending < first_green, (
        f"green query at {first_green} precedes pending at {last_pending}"
    )


def test_failed_rows_count_as_unchecked():
    """A row with err set (canon crash, no_oracle) or a hash mismatch must
    NOT mark its query as driver-checked (ADVICE r4: a failing query could
    otherwise never re-sweep to a passing row)."""
    checked = registry._driver_checked()
    for name, row in _latest_rows().items():
        if row.get("err") is not None or row.get("hash_match") is False:
            assert name not in checked, f"{name} failed latest sweep but marked checked"


def test_latest_round_wins():
    """A query that failed in an early round but passed later is checked."""
    assert registry._row_passed(
        {"err": None, "hash_match": True, "spark_rows": 3}
    )
    assert not registry._row_passed({"err": "no_oracle", "spark_rows": 3})
    assert not registry._row_passed(
        {"err": None, "hash_match": False, "spark_rows": 3}
    )
    # rows-only (no oracle registered): err-free with rows counts
    assert registry._row_passed(
        {"err": None, "hash_match": None, "spark_rows": 3}
    )


def test_driver_budget_filled_with_fresh_queries():
    """The first 50 slots (the driver's per-round budget) must all be
    pending while >=50 pending queries remain; with fewer pending, they
    must still fill the head of the sweep."""
    order = list(registry.queries())
    green = _green_from_disk()
    pending = [n for n in order if n not in green]
    head = order[: min(50, len(pending))]
    assert all(n not in green for n in head)


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
