"""Incremental corpus data card (streaming/stats_stream.py): merge
across batches equals a one-shot card, replay is skipped
(effectively-once), crash-orphan versions are harmless, and the real
foreachBatch wiring runs on a file stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.distinct_sketch import hll_group_distinct
from kafka_connect_ftp_spark.streaming.stats_stream import (
    batch_card,
    make_card_step,
    read_card,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


BATCH1 = [
    (1, "alpha beta gamma", "s0"),
    (2, "alpha alpha delta", "s0"),
    (3, "epsilon zeta", "s1"),
]
BATCH2 = [
    (4, "beta beta eta", "s0"),
    (5, "theta iota", "s1"),
    (6, "", "s1"),
]


def test_incremental_merge_equals_one_shot_card(spark, tmp_path):
    card_dir = str(tmp_path / "card")
    step = make_card_step(card_dir)
    step(_docs(spark, BATCH1), 0)
    step(_docs(spark, BATCH2), 1)
    got = {r.source: r for r in read_card(spark, card_dir).collect()}

    whole = {r.source: r for r in batch_card(_docs(spark, BATCH1 + BATCH2)).collect()}
    assert set(got) == {"s0", "s1"}
    for s in got:
        assert got[s].n_docs == whole[s].n_docs
        assert got[s].n_bytes == whole[s].n_bytes
        assert got[s].n_tokens == whole[s].n_tokens
    # the sketch union is lossless: incremental estimate == one-shot
    toks = _docs(spark, BATCH1 + BATCH2).select(
        "source", F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("tk")
    )
    exact = {r.source: r.est_distinct for r in hll_group_distinct(toks, "source", "tk").collect()}
    for s in got:
        assert got[s].est_distinct_tokens == exact[s]
    assert got["s0"].n_docs == 3 and got["s1"].n_docs == 3
    # the empty doc counts as a doc with 0 tokens
    assert got["s1"].n_tokens == 4


def test_replayed_batch_is_skipped(spark, tmp_path):
    card_dir = str(tmp_path / "card")
    step = make_card_step(card_dir)
    step(_docs(spark, BATCH1), 0)
    step(_docs(spark, BATCH2), 1)
    before = {r.source: (r.n_docs, r.n_tokens) for r in read_card(spark, card_dir).collect()}
    step(_docs(spark, BATCH2), 1)  # at-least-once re-delivery
    step(_docs(spark, BATCH1), 0)  # even older replay
    after = {r.source: (r.n_docs, r.n_tokens) for r in read_card(spark, card_dir).collect()}
    assert after == before


def test_orphan_version_from_crash_is_overwritten(spark, tmp_path):
    card_dir = str(tmp_path / "card")
    step = make_card_step(card_dir)
    step(_docs(spark, BATCH1), 0)
    # simulate a crash mid-write of v2: part files landed but the job
    # commit (_SUCCESS) never happened — the version must NOT be current
    batch_card(_docs(spark, BATCH2)).withColumn(
        "last_batch_id", F.lit(1).cast("long")
    ).write.parquet(str(tmp_path / "card" / "v000002"))
    (tmp_path / "card" / "v000002" / "_SUCCESS").unlink()
    # accumulated batch-0 state is still visible (the old marker-flip
    # design lost it here), and the replayed batch overwrites the orphan
    assert {r.source: r.n_docs for r in read_card(spark, card_dir).collect()} == {
        "s0": 2,
        "s1": 1,
    }
    step(_docs(spark, BATCH2), 1)
    got = {r.source: r.n_docs for r in read_card(spark, card_dir).collect()}
    assert got == {"s0": 3, "s1": 3}


def test_old_versions_are_pruned_to_retention(spark, tmp_path):
    card_dir = tmp_path / "card"
    step = make_card_step(str(card_dir), keep_versions=2)
    for i in range(4):
        step(_docs(spark, [(10 + i, f"tok{i}", "s0")]), i)
    versions = sorted(p.name for p in card_dir.iterdir() if p.name.startswith("v"))
    # 4 commits, retention 2: only v3 and v4 survive
    assert versions == ["v000003", "v000004"]
    got = {r.source: r.n_docs for r in read_card(spark, str(card_dir)).collect()}
    assert got == {"s0": 4}


def test_read_card_before_first_batch_is_none(spark, tmp_path):
    assert read_card(spark, str(tmp_path / "nope")) is None


def test_foreachbatch_wiring_on_a_real_stream(spark, tmp_path):
    from kafka_connect_ftp_spark.streaming.stats_stream import start_card_stream

    src = tmp_path / "in"
    src.mkdir()
    _docs(spark, BATCH1).coalesce(1).write.json(str(src / "b1"))
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .json(str(src / "*"))
    )
    card_dir = str(tmp_path / "card")
    q = start_card_stream(
        stream, card_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        _docs(spark, BATCH2).coalesce(1).write.json(str(src / "b2"))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.source: r.n_docs for r in read_card(spark, card_dir).collect()}
    assert got == {"s0": 3, "s1": 3}


def test_version_discovery_survives_seven_digit_versions(spark, tmp_path):
    from kafka_connect_ftp_spark.hadoop_fs import committed_versions

    d = tmp_path / "state"
    for v in (999999, 1000000):
        p = d / f"v{v:06d}"
        p.mkdir(parents=True)
        (p / "_SUCCESS").touch()
    assert committed_versions(spark, str(d)) == [999999, 1000000]


def test_card_matches_model_under_random_replay_schedules(spark, tmp_path):
    """Random batch/replay schedules vs a dict model: a batch counts
    IFF its id exceeds every previously-applied id (the foreachBatch
    replay rule) — counts can never double, whatever the schedule."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        card_dir = str(tmp_path / f"card{trial}")
        step = make_card_step(card_dir)
        model: dict[str, list[int]] = {}
        max_done = -1
        next_id = 0
        for _ in range(8):
            # 40%: replay an already-delivered id; else a fresh one
            if next_id and rng.random() < 0.4:
                bid = rng.randrange(next_id)
            else:
                bid = next_id
                next_id += 1
            rows = [
                (100 * bid + i, f"w{bid} " * (i + 1), f"s{i % 2}")
                for i in range(rng.randint(1, 3))
            ]
            step(_docs(spark, [(d, t.strip(), s) for d, t, s in rows]), bid)
            if bid > max_done:
                max_done = bid
                for d, t, s in rows:
                    acc = model.setdefault(s, [0, 0])
                    acc[0] += 1
                    acc[1] += len(t.split())
        got = {
            r.source: [r.n_docs, r.n_tokens]
            for r in read_card(spark, card_dir).collect()
        }
        assert got == model, f"trial {trial}"
