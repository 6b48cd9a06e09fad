"""Scoreboard drift gate: the docs must track the registry.

Rounds 1 and 2 both shipped stale counts/inventories (flagged in the
round verdicts); this makes the sync mechanical instead of remembered.
"""

from __future__ import annotations

import os
import re

from os___mapreduceframework_spark import queries as registry

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(_ROOT, name)) as f:
        return f.read()


def test_every_registered_query_is_in_readme():
    readme = _read("README.md")
    missing = sorted(n for n in registry.queries() if f"`{n}`" not in readme)
    assert not missing, f"README.md inventory is missing: {missing}"


def test_roadmap_query_count_matches_registry():
    n = len(registry.queries())
    m = re.search(r"\*\*(\d+) registered queries\*\*", _read("ROADMAP.md"))
    assert m, "ROADMAP.md no longer states a registered-query count"
    assert int(m.group(1)) == n, (
        f"ROADMAP.md says {m.group(1)} registered queries; registry has {n}"
    )


def test_every_oracle_matches_a_registered_query():
    q, o = registry.queries(), registry.oracle_sql()
    assert set(o) <= set(q)


def test_skips_manifest_matches_gates():
    """SKIPS.md (VERDICT r8 item 6) must track the two real skip
    gates: the fact-broadcast ALLOWED subset (one parametrized skip per
    name) and the protobuf gate. A name added to ALLOWED without a
    manifest row — or a stale manifest row for a name no longer
    allowed — fails here, the same drift discipline as SCALE_INDEX."""
    skips = _read("SKIPS.md")
    from tests.test_fact_broadcast_audit import ALLOWED

    for name in ALLOWED:
        assert f"`{name}`" in skips, (
            f"SKIPS.md is missing a row for ALLOWED broadcast query {name}"
        )
    # stale-row check: every backticked query-like token in the
    # bounded-broadcast table must still be in ALLOWED
    table = skips.split("## 2.")[1].split("## Not skips")[0]
    listed = {m for m in re.findall(r"\| `([a-z0-9_]+)` \|", table)}
    assert listed == set(ALLOWED), (
        f"SKIPS.md broadcast table drifted: listed={sorted(listed)} "
        f"vs ALLOWED={sorted(ALLOWED)}"
    )
    # the protobuf row must exist, and must stay consistent with the
    # gate's actual state in this container
    assert "test_transform_with_state_gated_on_protobuf" in skips
    from os___mapreduceframework_spark.streaming.transform_state import (
        PROTOBUF_AVAILABLE,
    )

    if PROTOBUF_AVAILABLE:
        raise AssertionError(
            "protobuf is now available: transformWithStateInPandas "
            "self-registers, so update SKIPS.md (the gate row is stale)"
        )


def test_scale_index_is_fresh_and_complete():
    """Every SCALE_r*.json sidecar has an index row and the committed
    SCALE_INDEX.md matches the generator's output (VERDICT r7 item 6:
    the 100 TB story should be readable from one table)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "gen_scale_index.py"),
         "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stderr
