"""Search client parity tests -- the reference's workload edge cases
(FIXTURES.md section B; Search.cpp:98-125)."""

from __future__ import annotations

from os___mapreduceframework_spark.operators.search import search_count, search_expand
from os___mapreduceframework_spark.sources import dir_entries
from os___mapreduceframework_spark.sources.registry import DIR_ENTRIES_SCHEMA


def _entries(spark, rows):
    return spark.createDataFrame(rows, schema=DIR_ENTRIES_SCHEMA)


def test_duplicate_names_across_dirs_counted(spark):
    """Name in k>1 dirs -> count k; expansion repeats k times
    (Search.cpp:98-111, :113-117)."""
    df = _entries(spark, [("d1", "foo.txt"), ("d2", "foo.txt"), ("d1", "bar")])
    out = search_count(df, "foo").collect()
    assert [(r.name, r.cnt) for r in out] == [("foo.txt", 2)]
    expanded = [r.name for r in search_expand(df, "foo").collect()]
    assert expanded == ["foo.txt", "foo.txt"]


def test_no_match_empty_output(spark):
    """Map emits nothing -> key absent from output (Search.cpp:65-69)."""
    df = _entries(spark, [("d1", "alpha"), ("d1", "beta")])
    assert search_count(df, "zzz").count() == 0


def test_output_sorted_ascending(spark):
    """Global ascending sort by key (MapReduceFramework.cpp:341)."""
    df = _entries(
        spark,
        [("d1", "zeta-x"), ("d1", "alpha-x"), ("d2", "mid-x"), ("d2", "alpha-x")],
    )
    names = [r.name for r in search_count(df, "x").collect()]
    assert names == sorted(names) == ["alpha-x", "mid-x", "zeta-x"]


def test_dir_entries_includes_dot_and_dotdot(spark, tmp_path):
    """readdir includes '.' and '..' (Search.cpp:102); empty dir still
    contributes both."""
    d = tmp_path / "empty"
    d.mkdir()
    rows = dir_entries(spark, [str(d)]).collect()
    assert sorted(r.name for r in rows) == [".", ".."]


def test_dir_entries_end_to_end(spark, tmp_path):
    """Whole Search pipeline over a real directory listing."""
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    (d1 / "hit_one").touch()
    (d1 / "miss").touch()
    (d2 / "hit_one").touch()
    (d2 / "hit_two").touch()
    df = dir_entries(spark, [str(d1), str(d2)])
    out = [(r.name, r.cnt) for r in search_count(df, "hit").collect()]
    assert out == [("hit_one", 2), ("hit_two", 1)]


def test_pluggable_dir_source_matches_driver_listing(spark, tmp_path):
    """The Python Data Source API source (one partition per directory,
    listing on executors) returns exactly the driver-side dir_entries
    relation, including '.'/'..' and cross-dir duplicates."""
    from os___mapreduceframework_spark.sources.dir_source import read_dir_entries
    from os___mapreduceframework_spark.sources.registry import dir_entries

    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    (d1 / "common.txt").write_text("x")
    (d2 / "common.txt").write_text("y")
    (d1 / "only_a.log").write_text("z")

    dirs = [str(d1), str(d2)]
    via_source = sorted(map(tuple, read_dir_entries(spark, dirs).collect()))
    via_driver = sorted(map(tuple, dir_entries(spark, dirs).collect()))
    assert via_source == via_driver
    assert (str(d1), "common.txt") in via_source
    assert (str(d2), "common.txt") in via_source
    assert (str(d1), ".") in via_source


def test_pluggable_dir_source_search_end_to_end(spark, tmp_path):
    """Search flagship over the pluggable source: reference pipeline
    (Search.cpp:84-125) with the scan running as a real Spark source."""
    from os___mapreduceframework_spark.operators.search import search_count
    from os___mapreduceframework_spark.sources.dir_source import read_dir_entries

    d = tmp_path / "files"
    d.mkdir()
    for n in ["widget_a.txt", "widget_b.txt", "gear.txt"]:
        (d / n).write_text("")
    out = search_count(read_dir_entries(spark, [str(d)]), "widget", name_col="name")
    rows = [(r["name"], r["cnt"]) for r in out.collect()]
    assert rows == [("widget_a.txt", 1), ("widget_b.txt", 1)]


def test_dir_stream_offsets_same_tick_and_replay(tmp_path):
    """Offset logic unit test: a file landing in the SAME mtime tick as
    the committed watermark must still be emitted exactly once, and
    replay(start, end) must reproduce exactly (start, end] -- no rows
    from later batches."""
    import os

    from os___mapreduceframework_spark.sources.dir_source import (
        DirEntriesStreamReader,
    )

    d = str(tmp_path)
    r = DirEntriesStreamReader({"paths": d})
    t0 = 1_000_000_000_000_000_000

    def mk(name, ns):
        p = os.path.join(d, name)
        open(p, "w").write("x")
        os.utime(p, ns=(ns, ns))

    mk("a.txt", t0)
    rows1, off1 = r.read(r.initialOffset())
    assert sorted(n for _d, n in rows1) == ["a.txt"]
    assert off1["mtime_ns"] == t0 and [d, "a.txt"] in off1["at"]
    # second file lands at the SAME tick after the commit
    mk("b.txt", t0)
    rows2, off2 = r.read(off1)
    assert sorted(n for _d, n in rows2) == ["b.txt"]  # not dropped, not dup
    # third batch: later tick
    mk("c.txt", t0 + 5)
    rows3, off3 = r.read(off2)
    assert sorted(n for _d, n in rows3) == ["c.txt"]
    # replay of batch 2 yields exactly b.txt -- c.txt (committed to a
    # later batch) must NOT leak into the replay
    replay = sorted(n for _d, n in r.readBetweenOffsets(off1, off2))
    assert replay == ["b.txt"]
    # idempotent: nothing new at off3
    rows4, off4 = r.read(off3)
    assert list(rows4) == [] and off4["mtime_ns"] == off3["mtime_ns"]


def test_dir_entries_unlistable_dir_contributes_no_rows(spark, tmp_path):
    """A directory whose listing fails must contribute ZERO rows --
    '.'/'..' parity rows come from a successful readdir (the reference
    never enters the loop when opendir fails)."""
    from os___mapreduceframework_spark.sources.registry import dir_entries

    good = tmp_path / "good"
    good.mkdir()
    (good / "f.txt").write_text("x")
    rows = dir_entries(
        spark, [str(good), str(tmp_path / "no_such_dir")]
    ).collect()
    dirs = {r["dir"] for r in rows}
    assert dirs == {str(good)}
    assert sorted(r["name"] for r in rows) == [".", "..", "f.txt"]
