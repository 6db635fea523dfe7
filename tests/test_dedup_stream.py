"""Streaming dedup (streaming/dedup_stream.py): duplicates dropped within
the watermark delay, state evicted (and re-emission allowed) once the
watermark passes — bounded-state semantics across real micro-batches."""

from __future__ import annotations

import datetime as dt
import itertools
import os

import pytest
from pyspark.sql import types as T

from kafka_connect_ftp_spark.streaming.dedup_stream import (
    dedup_exact_stream,
    dedup_within_watermark,
)

_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)

_ctr = itertools.count()
T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


@pytest.fixture
def feeder(spark, tmp_path):
    """File-source stream + a function appending one micro-batch of rows."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def feed(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    return stream, feed


def _start(spark, dedup, tmp_path):
    name = f"dedup_{next(_ctr)}_{os.getpid()}"
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    return q, lambda: {
        (r.key, r.ts, r.payload) for r in spark.table(name).collect()
    }


def test_watermarked_dedup_drops_then_evicts(spark, feeder, tmp_path):
    stream, feed = feeder
    q, result = _start(
        spark,
        dedup_within_watermark(stream, ["key"], delay="10 minutes"),
        tmp_path,
    )
    try:
        # batch 1: key a twice in-batch, key b once
        feed([("a", _ts(0), "first"), ("a", _ts(1), "dup-in-batch"), ("b", _ts(2), "b1")])
        q.processAllAvailable()
        # batch 2: key a again within the 10-minute delay -> dropped
        feed([("a", _ts(60), "dup-next-batch"), ("c", _ts(61), "c1")])
        q.processAllAvailable()
        got = result()
        assert {(k, p) for k, _, p in got} == {("a", "first"), ("b", "b1"), ("c", "c1")}

        # batch 3: advance event time far past the delay -> watermark moves,
        # key a's state is evicted
        feed([("d", _ts(3600), "d1")])
        q.processAllAvailable()
        # batch 4: key a re-appears after eviction -> emitted again
        feed([("a", _ts(3601), "post-eviction")])
        q.processAllAvailable()
        keys_a = {p for k, _, p in result() if k == "a"}
        assert keys_a == {"first", "post-eviction"}
    finally:
        q.stop()


def test_exact_stream_dedup_never_reemits(spark, feeder, tmp_path):
    stream, feed = feeder
    q, result = _start(spark, dedup_exact_stream(stream, ["key"]), tmp_path)
    try:
        feed([("a", _ts(0), "first"), ("a", _ts(1), "dup")])
        q.processAllAvailable()
        feed([("a", _ts(7200), "much-later-dup"), ("b", _ts(7201), "b1")])
        q.processAllAvailable()
        got = {(k, p) for k, _, p in result()}
        assert got == {("a", "first"), ("b", "b1")}
    finally:
        q.stop()
