"""Query registry: the engine's public query surface.

Every operator from SURVEY.md section 2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) a DuckDB
oracle string. ``__spark_entry__.py`` exposes this registry to the
driver's correctness harness (row-count + schema + order-insensitive
value-hash at sf0.01).

Conventions that keep the Spark result and the DuckDB oracle hash-equal:

- every computed column is aliased identically on both sides;
- money sums are computed in DECIMAL on both sides (order-independent,
  exact) and cast to double only at the end;
- other double outputs are rounded to a fixed scale on both sides;
- timestamp outputs are formatted to strings on both sides.
"""

from __future__ import annotations

import functools
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver's rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to Python workers (once per SparkContext).

    A hosting session we didn't build (the driver's harness) has the
    package on the *driver's* sys.path only; cloudpickle serializes
    package-defined functions (multimodal Pandas UDFs, the live-search
    Python data source) by reference, so the worker needs the module
    importable too. ``addPyFile`` of a package zip makes every query
    self-contained regardless of who owns the session.
    """
    sc = spark.sparkContext
    if getattr(sc, "_graft_pyfiles_sent", False):
        return
    try:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        # PID-keyed archive path: a fixed shared path races when two
        # processes (bench + correctness sweep) make_archive at once,
        # and addPyFile could ship a partially written zip
        from os___mapreduceframework_spark.scratch import scratch_dir

        archive = shutil.make_archive(
            scratch_dir("os___mapreduceframework_spark_pyfiles"),
            "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir),
        )
        sc.addPyFile(archive)
    except Exception:
        pass  # best-effort: sessions built by our own factory already work
    sc._graft_pyfiles_sent = True


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_worker_imports(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order IS sweep order: the driver's correctness harness
    checks ~50 queries per round in registration order, so coverage
    rotates round to round. Rounds 1-2 drove the flagship/compat,
    dedup/ANN, relational (TPC-H), text, curation, analytics, and
    advanced families to green driver rows; round 3 rotates the
    never-driver-checked families to the front (quality, temporal,
    indexing, training/MERGE, sources/formats, skew/IVF, streaming,
    multimodal) while the already-proven families register after.
    """
    global _LOADED
    if _LOADED:
        return
    # round-3 rotation: never-driver-checked families first
    import os___mapreduceframework_spark.operators.quality  # noqa: F401
    import os___mapreduceframework_spark.operators.temporal  # noqa: F401
    import os___mapreduceframework_spark.operators.indexing  # noqa: F401
    import os___mapreduceframework_spark.operators.training  # noqa: F401
    import os___mapreduceframework_spark.sources.formats  # noqa: F401
    import os___mapreduceframework_spark.operators.scale  # noqa: F401
    import os___mapreduceframework_spark.streaming.windows  # noqa: F401
    import os___mapreduceframework_spark.streaming.incremental  # noqa: F401
    import os___mapreduceframework_spark.streaming.joins  # noqa: F401
    import os___mapreduceframework_spark.operators.multimodal  # noqa: F401
    import os___mapreduceframework_spark.streaming.live_search  # noqa: F401
    import os___mapreduceframework_spark.streaming.scd2  # noqa: F401
    import os___mapreduceframework_spark.streaming.snapshot_cdc  # noqa: F401
    import os___mapreduceframework_spark.streaming.transform_state  # noqa: F401
    import os___mapreduceframework_spark.operators.sampling  # noqa: F401
    # driver-proven families (green rows in CORRECTNESS_r01/r02)
    import os___mapreduceframework_spark.operators.library  # noqa: F401
    import os___mapreduceframework_spark.compat.udtf_map  # noqa: F401
    import os___mapreduceframework_spark.operators.dedup  # noqa: F401
    import os___mapreduceframework_spark.operators.similarity  # noqa: F401
    import os___mapreduceframework_spark.operators.relational  # noqa: F401
    import os___mapreduceframework_spark.operators.text  # noqa: F401
    import os___mapreduceframework_spark.operators.curation  # noqa: F401
    import os___mapreduceframework_spark.operators.analytics  # noqa: F401
    import os___mapreduceframework_spark.operators.advanced  # noqa: F401
    # round-3 late additions (will lead the r04 rotation)
    import os___mapreduceframework_spark.operators.contamination  # noqa: F401
    import os___mapreduceframework_spark.operators.graph  # noqa: F401
    import os___mapreduceframework_spark.operators.sketches  # noqa: F401
    import os___mapreduceframework_spark.operators.layout  # noqa: F401
    import os___mapreduceframework_spark.operators.ivm  # noqa: F401
    import os___mapreduceframework_spark.operators.fuzzy  # noqa: F401

    _LOADED = True
