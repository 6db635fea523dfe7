"""Streaming span dedup (streaming/span_dedup_stream.py): cross-batch
span-hash state, stream==batch parity on id-ordered arrival, glue
preservation through the stream, and replay byte-identity at every
crash point — the same bars the near-dup/quality stream stages meet.
Reference scope note: the reference connector's keyed per-path state +
at-least-once delivery (SURVEY §2.8 T3/T5) is the pattern; the span
gate applies it to the C4 curation operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.span_dedup import dedup_spans
from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
    dedup_spans_micro_batch,
    make_span_dedup_step,
    read_span_state,
)

_BOILER = "All rights reserved by the example corporation"
_B1 = [
    (1, f"alpha beta gamma\n\n{_BOILER}\n\ndelta epsilon"),
    (2, f"{_BOILER}\n\nunique second paragraph here"),
]
_B2 = [
    (3, f"fresh third document content\n\n{_BOILER}"),
    (4, "entirely novel paragraphs only\n\nanother novel one"),
]


def _df(spark, rows, extra=None):
    if extra is None:
        return spark.createDataFrame(rows, "doc_id long, text string")
    return spark.createDataFrame(
        [(i, t, extra) for i, t in rows], "doc_id long, text string, src string"
    )


def test_cross_batch_span_removal_and_batch_parity(spark, tmp_path):
    """Spans admitted by batch 1 are dropped from batch 2 (including
    batch 1's INTERNAL first-occurrence rule), and the two-batch stream
    result equals the batch operator over the concatenated corpus."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    step = make_span_dedup_step(spark, out, state)

    step(_df(spark, _B1), 0)
    step(_df(spark, _B2), 1)

    got = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in dedup_spans(_df(spark, _B1 + _B2), "paragraph").collect()
    }
    assert got == want
    # the boilerplate survived exactly once, in doc 1 (its first arrival)
    assert _BOILER in got[1][0]
    assert _BOILER not in got[2][0] and _BOILER not in got[3][0]
    # untouched docs round-trip byte-identically
    assert got[4][0] == _B2[1][1]


def test_metadata_columns_ride_through(spark, tmp_path):
    """Extra batch columns (source tags etc.) survive the rebuild; only
    text_col is replaced."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state)
    step(_df(spark, _B1, extra="crawl-7"), 0)
    rows = spark.read.parquet(out).collect()
    assert {r.src for r in rows} == {"crawl-7"}
    assert set(rows[0].asDict()) == {
        "doc_id", "text", "src", "n_spans", "n_dropped"
    }


def test_sentence_unit_glue_preserved_through_stream(spark, tmp_path):
    """The sentence unit's round-11 exactness contract holds in the
    stream: a batch with nothing deduplicated is delivered byte-
    identical, mixed glue intact."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state, unit="sentence")
    rows = [(1, "One two three.\n\nFour five!  Six seven?\tEight."),
            (2, "no terminal punctuation at all")]
    step(_df(spark, rows), 0)
    got = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got == dict(rows)


def test_replay_is_byte_identical_even_with_torn_state(spark, tmp_path):
    """Crash-replay bar: re-running a batch — including after a torn
    own-epoch state write — delivers the identical rows and rewrites
    the identical state (exclude_epoch makes the torn subset
    invisible)."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state, idempotent=True)
    step(_df(spark, _B1), 0)

    first_out = sorted(
        (r.doc_id, r.text, r.n_spans, r.n_dropped)
        for r in spark.read.parquet(f"{out}/epoch=0").collect()
    )
    first_state = sorted(
        r.h for r in spark.read.parquet(f"{state}/epoch=0").collect()
    )

    # torn epoch=1 state write from a CRASHED first attempt of batch 1.
    # The dangerous content is a hash of one of doc 4's OWN novel spans:
    # if the replay could see its own epoch, doc 4's span would be
    # dropped as a "duplicate of itself" and the delivered rows would
    # differ from the first attempt. Seed exactly that hash.
    doc4_h = spark.sql(
        "select xxhash64('entirely novel paragraphs only') as h"
    ).collect()[0].h
    spark.createDataFrame([(doc4_h,)], "h long").write.mode(
        "overwrite"
    ).parquet(f"{state}/epoch=1")
    # replay of batch id 1: the torn own-epoch must be invisible, so
    # doc 4 keeps its span and round-trips byte-identically
    step(_df(spark, _B2), 1)
    replay = {
        r.doc_id: r.text for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    assert replay[4] == _B2[1][1]          # torn hash did NOT self-collide
    assert _BOILER not in replay[3]        # cross-batch dedup still applied
    # a second replay is byte-identical
    step(_df(spark, _B2), 1)
    assert replay == {
        r.doc_id: r.text for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    # and batch 0 replay is idempotent too
    step(_df(spark, _B1), 0)
    assert first_out == sorted(
        (r.doc_id, r.text, r.n_spans, r.n_dropped)
        for r in spark.read.parquet(f"{out}/epoch=0").collect()
    )
    assert first_state == sorted(
        r.h for r in spark.read.parquet(f"{state}/epoch=0").collect()
    )


def test_first_batch_and_state_read_edges(spark, tmp_path):
    """No state dir -> None (genuine first batch); reserved-column and
    bad-unit guards raise; admitted-hash delta matches the eligible
    distinct spans."""
    assert read_span_state(spark, str(tmp_path / "missing")) is None

    batch = _df(spark, _B1)
    out, admitted = dedup_spans_micro_batch(batch, None)
    # 4 distinct eligible paragraph keys across _B1 (boiler counted once)
    assert admitted.distinct().count() == 4
    assert out.count() == 2

    with pytest.raises(ValueError, match="unit"):
        dedup_spans_micro_batch(batch, None, unit="word")
    with pytest.raises(ValueError, match="reserved"):
        dedup_spans_micro_batch(batch.withColumn("n_spans", F.lit(1)), None)


def test_bucketed_state_semantics_replay_and_plan(spark, tmp_path):
    """buckets=N: identical cross-batch semantics, replay overwrites
    ONLY its own epoch partition (measured round 11: insertInto ignores
    the per-write dynamic-overwrite option and the session default is
    STATIC — a plain overwrite insert would wipe every other epoch, so
    the writer uses a static-partition INSERT OVERWRITE), the anti-join
    reads the state side bucket-aligned with NO state-side Exchange,
    and a fresh catalog (session restart) re-registers the table over
    the existing files with its partitions recovered."""
    import re

    from kafka_connect_ftp_spark.streaming.bucketed_state import (
        SPAN_SPEC,
        table_name,
    )
    from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
        write_span_state,
    )

    out = str(tmp_path / "o")
    state = str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state, buckets=8)
    step(_df(spark, _B1), 0)
    step(_df(spark, _B2), 1)
    got = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in dedup_spans(_df(spark, _B1 + _B2), "paragraph").collect()
    }
    assert got == want  # byte-parity with the plain mode / batch operator

    name = table_name(SPAN_SPEC, state)
    t = spark.table(name)
    epoch0 = sorted(r.h for r in t.filter("epoch = 0").collect())
    assert len(epoch0) == 4
    # replay of epoch 1 must not touch epoch 0
    step(_df(spark, _B2), 1)
    assert epoch0 == sorted(r.h for r in t.filter("epoch = 0").collect())

    # plan pin: with broadcast disabled, the ONLY exchange is the
    # (small) batch side shuffling into bucket alignment
    seen = read_span_state(spark, state, exclude_epoch=2, buckets=8)
    probe = spark.range(100).select(F.xxhash64("id").alias("h"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            probe.join(seen, "h", "left_anti")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
    assert "Bucketed: true" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    # "session restart": the catalog entry is disposable — drop it and
    # re-read; the table re-registers over the files with partitions
    # recovered (MSCK)
    spark.sql(f"DROP TABLE {name}")
    seen2 = read_span_state(spark, state, buckets=8)
    # 4 spans admitted by batch 0 + 3 fresh ones by batch 1
    assert seen2.count() == 7

    # guards: bucket-count mismatch, plain-mode read of a bucketed dir
    with pytest.raises(ValueError, match="mis-bucket"):
        read_span_state(spark, state, buckets=16)
    with pytest.raises(ValueError, match="BUCKETED"):
        read_span_state(spark, state)


def test_bucketed_mode_rejects_plain_dirs_and_quotes(spark, tmp_path):
    import os

    from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
        write_span_state,
    )

    # a plain-mode state dir cannot be reopened as bucketed
    plain = str(tmp_path / "plain")
    admitted = spark.range(3).select(F.xxhash64("id").alias("h"))
    write_span_state(spark, admitted, plain, 0)
    with pytest.raises(ValueError, match="PLAIN-mode"):
        read_span_state(spark, plain, buckets=8)
    # quote guard (the CREATE TABLE LOCATION interpolation)
    with pytest.raises(ValueError, match="quote"):
        read_span_state(spark, str(tmp_path / "we'rd"), buckets=8)


def test_in_batch_duplicate_ids_resolve_to_one_document(spark, tmp_path):
    """An at-least-once upstream delivering one id twice INSIDE a batch
    must yield exactly one rebuilt document (deterministic pick — the
    near-dup stage's shared guard), never a garbled merge of both
    copies' spans."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state)
    dup = _df(
        spark,
        [(1, "alpha paragraph\n\nbeta paragraph"),
         (1, "alpha paragraph\n\nbeta paragraph"),
         (2, "another unrelated document")],
    )
    step(dup, 0)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
    got1 = [r for r in rows if r.doc_id == 1][0]
    # one copy's spans exactly — not four spans from two merged copies
    assert got1.n_spans == 2
    assert got1.text == "alpha paragraph\n\nbeta paragraph"


def test_start_span_dedup_forwards_buckets(spark, tmp_path):
    """Round 12 (ADVICE r11): the one-call stream entry point exposes
    the bucketed external state table — start_span_dedup(buckets=N)
    reaches make_span_dedup_step, the BUCKETS marker is written, and
    the cross-batch dedup semantics hold through a real stream.
    Without the passthrough, pointing the wrapper at a bucketed state
    dir raised on every batch (BUCKETS-marker check)."""
    import os

    from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
        start_span_dedup,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def feed(rows):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = start_span_dedup(stream, out, state, ckpt, buckets=4)
    try:
        feed(_B1)
        q.processAllAvailable()
        feed(_B2)
        q.processAllAvailable()
    finally:
        q.stop()

    # bucketed layout, not plain epoch dirs at the root
    assert os.path.exists(os.path.join(state, "BUCKETS"))
    with open(os.path.join(state, "BUCKETS")) as fh:
        assert fh.read().strip() == "4"
    # stream == batch over the concatenated corpus (monotone ids)
    got = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in dedup_spans(_df(spark, _B1 + _B2), "paragraph").collect()
    }
    assert got == want
    # the accumulated state is readable back in bucketed mode only
    assert read_span_state(spark, state, buckets=4).count() > 0
    with pytest.raises(ValueError, match="BUCKETED"):
        read_span_state(spark, state)
