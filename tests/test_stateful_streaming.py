"""applyInPandasWithState operator test: running per-user stats over the
events stream must converge to the batch ground truth, and state must
accumulate ACROSS micro-batches (verified with two sequential file drops
into the streamed directory)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import pytest

from kafka_connect_ftp_spark.streaming.stateful import (
    running_user_stats,
    running_user_stats_tws,
)

SF = "/root/testdata/sf0.001"


def _events_batch(spark):
    from kafka_connect_ftp_spark.session import load_tables

    return load_tables(spark, SF, "events")["events"]


def _protobuf_available() -> bool:
    try:  # the TWS Python runner needs protobuf for its state protocol
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "op",
    [
        running_user_stats,
        pytest.param(
            running_user_stats_tws,
            marks=pytest.mark.skipif(
                not _protobuf_available(),
                reason="transformWithStateInPandas needs protobuf (not in this container)",
            ),
        ),
    ],
    ids=["applyInPandasWithState", "transformWithStateInPandas"],
)
def test_running_stats_match_batch_across_batches(spark, tmp_path, op):
    # split the table into two files dropped sequentially so the operator
    # must carry state between micro-batches
    events = _events_batch(spark)
    part1 = events.filter(F.col("event_id") % 2 == 0)
    part2 = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    part1.select("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "p1")
    )
    for f in os.listdir(str(tmp_path / "p1")):
        if f.endswith(".parquet"):
            shutil.copy(str(tmp_path / "p1" / f), f"{src}/batch1.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .format("parquet")
        .load(src)
    )
    out = op(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(f"user_stats_{op.__name__}")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # drop the second half → state must ACCUMULATE on top of batch 1
        part2.select("user_id", "ts", "value").coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "p2")
        )
        for f in os.listdir(str(tmp_path / "p2")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / "p2" / f), f"{src}/batch2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends a row per key per batch: the LAST
    # row per key is the final state
    final = (
        spark.sql(f"SELECT * FROM user_stats_{op.__name__}")
        .groupBy("user_id")
        .agg(F.max_by("n_events", "n_events").alias("n_events"),
             F.max_by("total_value", "n_events").alias("total_value"))
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in final.collect()}
    expect = {
        r.user_id: (r.n, round(r.total, 4))
        for r in _events_batch(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expect
