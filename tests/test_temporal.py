"""SCD2 interval semantics: per-user histories are contiguous,
non-overlapping, and close with exactly one open (current) version."""

from __future__ import annotations

from os___mapreduceframework_spark import queries as registry
from tests.conftest import TEST_SF_DIR


def test_scd2_intervals_contiguous_one_current(spark):
    rows = registry.queries()["scd2_user_state"](spark, TEST_SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.version)
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        opens = [r for r in hist if r.valid_to is None]
        assert len(opens) == 1 and opens[0] is hist[-1], user
        for prev, cur in zip(hist, hist[1:]):
            assert prev.valid_to == cur.valid_from, user
            assert prev.valid_from <= prev.valid_to, user


def test_asof_join_returns_latest_row_as_is(spark):
    """ASOF must return the latest qualifying right ROW intact: a NULL
    field in that row stays NULL, never backfilled from an older row
    (per-column carry would mix fields of different rows)."""
    from os___mapreduceframework_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 0, 5, 7), (1, 1, 10, None)], "k long, t long, v1 long, v2 long"
    )
    left = spark.createDataFrame(
        [(1, 2, "late"), (1, 0, "tie"), (2, 5, "nomatch")],
        "k long, t long, tag string",
    )
    got = {
        r["tag"]: (r["v1"], r["v2"])
        for r in asof_join(left, right, "k", "k", "t", "t", ["v1", "v2"]).collect()
    }
    assert got == {
        "late": (10, None),   # latest row as-is, v2 NOT backfilled to 7
        "tie": (5, 7),        # inclusive at equal time
        "nomatch": (None, None),
    }
