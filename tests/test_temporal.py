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


def test_property_asof_join_matches_duckdb(spark):
    """Randomized differential test: the union+window ASOF composition
    must agree with DuckDB's native ASOF LEFT JOIN row-for-row,
    including NULL value fields and no-match left rows."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from os___mapreduceframework_spark.operators.temporal import asof_join

    keys = st.integers(0, 3)
    times = st.integers(0, 20)
    vals = st.one_of(st.none(), st.integers(-5, 5))

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
        right=st.lists(
            st.tuples(keys, times, vals, vals), min_size=1, max_size=12
        ),
    )
    def check(left, right):
        # right (k, t) must be unique: ties are resolved upstream per
        # the helper's contract (DuckDB picks an arbitrary tied row)
        seen = set()
        right = [
            r for r in right if (r[0], r[1]) not in seen
            and not seen.add((r[0], r[1]))
        ]
        ldf = spark.createDataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            "k long, t long, lid long",
        )
        rdf = spark.createDataFrame(right, "k long, t long, v1 long, v2 long")
        got = {
            (r["lid"], r["v1"], r["v2"])
            for r in asof_join(
                ldf, rdf, "k", "k", "t", "t", ["v1", "v2"]
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "l",
            pd.DataFrame(
                [(k, t, i) for i, (k, t) in enumerate(left)],
                columns=["k", "t", "lid"],
            ),
        )
        con.register(
            "r", pd.DataFrame(right, columns=["k", "t", "v1", "v2"])
        )
        want = {
            (int(lid), None if pd.isna(v1) else int(v1),
             None if pd.isna(v2) else int(v2))
            for lid, v1, v2 in con.execute(
                "SELECT l.lid, r.v1, r.v2 FROM l ASOF LEFT JOIN r "
                "ON l.k = r.k AND l.t >= r.t"
            ).fetchall()
        }
        assert got == want, (left, right)

    check()


def test_property_range_bucketize_matches_theta_join(spark):
    """Randomized differential test: bucketize-to-cells +/- 1 + exact
    filter must produce exactly the theta-join pair set (the bucket
    trick may never lose a pair at cell borders or invent one)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    W_US = 1000  # small window so borders are actually exercised

    @settings(
        max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(
        evs=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 5000)),
            min_size=2,
            max_size=14,
            unique=True,
        )
    )
    def check(evs):
        rows = [(u, i, us) for i, (u, us) in enumerate(evs)]
        ev = spark.createDataFrame(rows, "user_id long, event_id long, us long")
        a = ev.select(
            "user_id",
            F.col("event_id").alias("id_a"),
            F.col("us").alias("us_a"),
            F.explode(
                F.array(
                    (F.col("us") / W_US).cast("long") - 1,
                    (F.col("us") / W_US).cast("long"),
                    (F.col("us") / W_US).cast("long") + 1,
                )
            ).alias("cell"),
        )
        b = ev.select(
            "user_id",
            F.col("event_id").alias("id_b"),
            F.col("us").alias("us_b"),
            (F.col("us") / W_US).cast("long").alias("cell"),
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in a.join(b, ["user_id", "cell"])
            .filter(
                (F.col("id_b") > F.col("id_a"))
                & (F.abs(F.col("us_b") - F.col("us_a")) < W_US)
            )
            .collect()
        }
        want = {
            (i, j)
            for i, (u1, t1) in enumerate(evs)
            for j, (u2, t2) in enumerate(evs)
            if j > i and u1 == u2 and abs(t2 - t1) < W_US
        }
        assert got == want, evs

    check()
