"""transformWithStateInPandas: Spark 4's arbitrary-stateful operator.

The successor to applyInPandasWithState: typed state variables
(ValueState/ListState/MapState), timers, TTL, and mandatory RocksDB
state store -- the shape arbitrary stateful streaming takes at 100 TB
key cardinality. Its driver/worker protocol runs over protobuf, which
this container does NOT ship (`import google.protobuf` fails; pip
installs are out of scope), so the query registers ONLY when protobuf
is importable -- the same honest environment-gating as the multimodal
decode stub (operators/multimodal.py). The operator surface itself is
complete and tested wherever the dependency exists; the
applyInPandasWithState twin (`stream_stateful_user_stats`,
streaming/windows.py) pins the same contract in this container.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from os___mapreduceframework_spark.queries import query
from os___mapreduceframework_spark.streaming.windows import (
    events_stream,
    run_to_completion,
)


def _protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


PROTOBUF_AVAILABLE = _protobuf_available()


def make_user_stats_processor():
    """The StatefulProcessor class behind ``stream_transform_with_state``,
    exposed at module level so its SEMANTICS stay testable in containers
    where the operator cannot RUN (protobuf missing): the class itself
    imports fine -- only the runtime state-server protocol needs
    protobuf -- so tests drive ``init``/``handleInputRows`` directly
    against a fake handle and pin them equal to the
    ``applyInPandasWithState`` twin (``stream_stateful_user_stats``,
    streaming/windows.py) and the batch aggregate."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("tot", T.LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            # state: (n_events, total_value scaled e4) -- the identical
            # integer-scaled accumulation the applyInPandasWithState
            # twin uses, so both APIs produce bit-equal output
            n, tot = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                tot += int(round(float(pdf["value"].sum()) * 10_000))
            self._state.update((n, tot))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(tot / 10_000, 2)],
                }
            )

        def close(self) -> None:
            pass

    return UserStats


def build_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (count, integer-scaled sum) via a StatefulProcessor with
    typed ValueState; must agree with the batch aggregate (the same
    contract stream_stateful_user_stats pins on the older API)."""
    UserStats = make_user_stats_processor()

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = events_stream(spark, sf_dir).select("user_id", "value")
        out = ev.groupBy("user_id").transformWithStateInPandas(
            UserStats(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
        return run_to_completion(out, "update").orderBy("user_id")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


if PROTOBUF_AVAILABLE:
    query(
        "stream_transform_with_state",
        oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS total_value
        FROM events WHERE ts >= TIMESTAMP '1990-01-01 00:00:00' AND ts < TIMESTAMP '2090-01-01 00:00:00'
        GROUP BY user_id
        ORDER BY user_id
        """,
        doc=build_transform_with_state.__doc__,
    )(build_transform_with_state)
