"""Streaming quality gate (streaming/quality_gate.py): two micro-batches
through dedup → repetition gate → pre-trained classifier → Pareto keep,
with the dedup state carried across batches and the admitted set equal
to what the batch operators would admit."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import types as T

from kafka_connect_ftp_spark.operators.quality_model import (
    load_quality_model,
    save_quality_model,
    train_quality_classifier,
)
from kafka_connect_ftp_spark.streaming.quality_gate import (
    gate_micro_batch,
    start_quality_gate,
)

_GOOD = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
_JUNK = ["zzz", "qqq", "xxx", "kkk", "www", "jjj", "vvv", "ppp"]

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _text(vocab, seed, n=24):
    rng = random.Random(seed)
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def model(spark, tmp_path_factory):
    pos = spark.createDataFrame(
        [(i, _text(_GOOD, i)) for i in range(40)], _SCHEMA
    )
    neg = spark.createDataFrame(
        [(1000 + i, _text(_JUNK, 100 + i)) for i in range(40)], _SCHEMA
    )
    trained = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=25)
    # through the persistence round-trip: the stream scores from the
    # loaded artifact, the production train-once/score-many shape
    path = str(tmp_path_factory.mktemp("qgate") / "model")
    save_quality_model(trained, path)
    return load_quality_model(spark, path)


def test_two_micro_batches_gate_and_carry_dedup_state(spark, model, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def feed(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = start_quality_gate(stream, model, out, ckpt, alpha=9.0)
    try:
        # batch 1: two clean reference-like docs, one junk-vocab doc,
        # one GOOD-vocab doc that is pure 2-gram loop (repetition gate)
        feed(
            [
                (1, _text(_GOOD, 1)),
                (2, _text(_GOOD, 2)),
                (3, _text(_JUNK, 3)),
                (4, "quick fox " * 12),
            ]
        )
        q.processAllAvailable()
        # batch 2: doc 1 RE-DELIVERED (at-least-once upstream) plus two
        # new clean docs and another junk doc
        feed(
            [
                (1, _text(_GOOD, 1)),
                (5, _text(_GOOD, 5)),
                (6, _text(_GOOD, 6)),
                (7, _text(_JUNK, 7)),
            ]
        )
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = spark.read.parquet(out)
    got = {r.doc_id: r.quality_score for r in admitted.collect()}
    # clean docs admitted, each EXACTLY once (doc 1's re-delivery was
    # dropped by the carried dedup state, not re-scored and re-emitted)
    assert admitted.count() == len(got)
    assert set(got) == {1, 2, 5, 6}
    # junk scored ~0 -> Pareto at alpha=9 rejects (P(keep|0) = 2^-9);
    # the repetitive GOOD-vocab doc was cut by the repetition gate
    # BEFORE scoring, so its absence is the gate, not the classifier
    assert all(s > 0.9 for s in got.values())

    # stream == batch: the same rows through the bare micro-batch gate
    # admit the same ids (determinism of the hash-seeded Pareto rule)
    allrows = spark.createDataFrame(
        [
            (1, _text(_GOOD, 1)),
            (2, _text(_GOOD, 2)),
            (3, _text(_JUNK, 3)),
            (4, "quick fox " * 12),
            (5, _text(_GOOD, 5)),
            (6, _text(_GOOD, 6)),
            (7, _text(_JUNK, 7)),
        ],
        _SCHEMA,
    )
    batch_ids = {
        r.doc_id for r in gate_micro_batch(allrows, model).select("doc_id").collect()
    }
    assert batch_ids == set(got)


def test_idempotent_replay_rewrites_identically(spark, model, tmp_path):
    from kafka_connect_ftp_spark.streaming.quality_gate import (
        make_quality_gate_step,
    )

    out = str(tmp_path / "out_i")
    gate = make_quality_gate_step(model, out, alpha=9.0, idempotent=True)
    batch = spark.createDataFrame(
        [(1, _text(_GOOD, 1)), (2, _text(_GOOD, 2)), (3, _text(_JUNK, 3))],
        _SCHEMA,
    )
    gate(batch, 0)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]
    # replay: the gate is deterministic, the epoch partition is
    # rewritten with identical rows — never appended
    gate(batch, 0)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == first


# five terminal-punctuated >=3-word lines each: the c4 page rule
# (rule_gate default min_sentences=5) must be satisfiable by the prose
_EN_PROSE = (
    "the committee published the annual report this morning and that was fine.\n"
    "several members of the board have asked to be heard before the vote.\n"
    "the final decision will be announced with the other findings next week.\n"
    "many people that follow the debate have strong views on the plan.\n"
    "the chair thanked the members of the committee for their patient work."
)
_DE_PROSE = (
    "die regierung hat heute einen neuen haushaltsplan mit vielen details vorgestellt.\n"
    "die opposition will den entwurf im parlament mit mehreren anträgen ändern.\n"
    "viele bürger haben dazu bereits eine sehr klare meinung geäußert.\n"
    "die debatte über das thema dürfte noch mehrere wochen dauern.\n"
    "am ende wird das parlament über den gesamten entwurf abstimmen müssen."
)


def test_routed_rule_stage_admits_non_english_prose(spark, tmp_path):
    # round 9: with routed_profiles the stream's rule stage becomes
    # classify-then-route — German prose passes c4+gopher under its own
    # language's params where the English-parameterized families would
    # reject it wholesale. Stream output == gate_micro_batch output
    # (same function), pinned over one micro-batch.
    from pyspark.sql import functions as F

    from kafka_connect_ftp_spark.operators.lang_id import (
        NORM_KEEP_ROUTED,
        SEED_TEXTS_ROUTED,
        seed_frame,
        train_char_profiles,
    )
    from kafka_connect_ftp_spark.operators.rule_gate import rule_gate

    # model trained to accept prose vocabulary (en+de) vs junk
    prose_words = sorted(set((_EN_PROSE + " " + _DE_PROSE).replace("\n", " ").replace(".", "").split()))
    pos = spark.createDataFrame(
        [(i, _text(prose_words, i)) for i in range(40)], _SCHEMA
    )
    neg = spark.createDataFrame(
        [(1000 + i, _text(_JUNK, 100 + i)) for i in range(40)], _SCHEMA
    )
    model = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=25)
    profiles = train_char_profiles(
        seed_frame(spark, SEED_TEXTS_ROUTED), norm_keep=NORM_KEEP_ROUTED
    ).cache()

    batch = spark.createDataFrame(
        [(11, _EN_PROSE), (12, _DE_PROSE), (13, _text(_JUNK, 13))], _SCHEMA
    )
    routed_ids = {
        r.doc_id
        for r in gate_micro_batch(batch, model, routed_profiles=profiles).collect()
    }
    assert routed_ids == {11, 12}, routed_ids
    # the naive composition (same c4+gopher families, English params for
    # every row) rejects the German page — the mis-gating routing fixes
    naive = rule_gate(batch, top_ns=(2,), dup_ns=(5,)).filter(
        F.col("c4_keep") & F.col("gopher_keep")
    )
    assert {r.doc_id for r in naive.collect()} == {11}

    # stream parity: one micro-batch through start_quality_gate with
    # routed_profiles admits exactly the gate_micro_batch set
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src)
    batch.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = start_quality_gate(stream, model, out, ckpt, routed_profiles=profiles)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == routed_ids
