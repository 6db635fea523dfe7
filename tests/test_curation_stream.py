"""Composed one-checkpoint curation stream
(streaming/curation_stream.py): near-dup filter + quality gate in a
single foreachBatch — cross-batch semantics, replay byte-identity
through BOTH gates at the composed level, and parity with the batch
pipeline on id-ordered arrival."""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import types as T

from kafka_connect_ftp_spark.operators.quality_model import (
    load_quality_model,
    save_quality_model,
    train_quality_classifier,
)
from kafka_connect_ftp_spark.streaming.curation_stream import (
    make_curation_step,
    start_curation,
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


_B1 = [
    (1, _text(_GOOD, 1)),
    (2, _text(_GOOD, 2)),
    (3, _text(_JUNK, 3)),       # near-dup-admitted, quality-REJECTED
    (4, "quick fox " * 12),     # near-dup-admitted, repetition-cut
]
_B2 = [
    (1, _text(_GOOD, 1)),        # exact re-delivery of doc 1
    (9, _text(_GOOD, 2) + " v9"),  # near-dup of doc 2
    (5, _text(_GOOD, 5)),
    (6, _text(_JUNK, 6)),
]


@pytest.fixture(scope="module")
def model(spark, tmp_path_factory):
    pos = spark.createDataFrame([(i, _text(_GOOD, i)) for i in range(40)], _SCHEMA)
    neg = spark.createDataFrame(
        [(1000 + i, _text(_JUNK, 100 + i)) for i in range(40)], _SCHEMA
    )
    trained = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=25)
    path = str(tmp_path_factory.mktemp("curation") / "model")
    save_quality_model(trained, path)
    return load_quality_model(spark, path)


def test_composed_two_batches_one_checkpoint(spark, model, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def feed(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = start_curation(stream, model, out, state, ckpt, alpha=9.0)
    try:
        feed(_B1)
        q.processAllAvailable()
        feed(_B2)
        q.processAllAvailable()
    finally:
        q.stop()

    curated = spark.read.parquet(out)
    got = {r.doc_id for r in curated.collect()}
    # clean docs once each: 1's re-delivery self-collided on band keys
    # (no separate id-dedup state needed), 9 collided with admitted 2,
    # junk was Pareto-rejected, the loop doc repetition-cut
    assert got == {1, 2, 5} and curated.count() == 3
    # the band state carries the NEAR-DUP-admitted set — including the
    # quality-REJECTED docs 3/4/6 (staged semantics: a later near-dup of
    # a rejected document is still a duplicate), never the collided 9
    state_ids = {r.doc_id for r in spark.read.parquet(state).select("doc_id").collect()}
    assert state_ids == {1, 2, 3, 4, 5, 6}


def test_replay_byte_identical_through_both_gates(spark, model, tmp_path):
    out = str(tmp_path / "out_r")
    state = str(tmp_path / "state_r")
    step = make_curation_step(spark, model, out, state, alpha=9.0)
    b1 = spark.createDataFrame(_B1, _SCHEMA)

    def snapshot():
        return sorted(
            (r.doc_id, r.text, float(r.quality_score))
            for r in spark.read.parquet(out).collect()
        )

    step(b1, 0)
    first = snapshot()
    assert [d for d, _, _ in first] == [1, 2]

    # crash BETWEEN sink and state writes: the state append never
    # happened; the replayed batch must rewrite the epoch byte-identically
    shutil.rmtree(state)
    step(b1, 0)
    assert snapshot() == first
    # crash AFTER the state write: total self-collision, both writes
    # skipped, the original epoch partition survives untouched
    step(b1, 0)
    assert snapshot() == first


def test_composed_equals_batch_on_id_ordered_arrival(spark, model, tmp_path):
    from kafka_connect_ftp_spark.streaming.neardup_stream import filter_micro_batch
    from kafka_connect_ftp_spark.streaming.quality_gate import gate_micro_batch

    out = str(tmp_path / "out_p")
    state = str(tmp_path / "state_p")
    step = make_curation_step(spark, model, out, state, alpha=9.0)
    step(spark.createDataFrame(_B1, _SCHEMA), 0)
    step(spark.createDataFrame(_B2, _SCHEMA), 1)
    stream_ids = {r.doc_id for r in spark.read.parquet(out).collect()}

    # batch mode over the union (one copy of the re-delivered doc):
    # near-dup dedup keeps min doc_id per component, then the same gate
    full = spark.createDataFrame([r for r in _B1 + _B2 if r[0] != 1] + [_B1[0]], _SCHEMA)
    nd, _ = filter_micro_batch(full, None)
    batch_ids = {r.doc_id for r in gate_micro_batch(nd, model).select("doc_id").collect()}
    assert stream_ids == batch_ids


def test_torn_state_write_cannot_lose_delivered_rows(spark, model, tmp_path):
    # round-7 review finding: a crash DURING the band-state write can
    # leave a torn subset of the batch's band keys visible. If the
    # replay read them, partially-covered docs would self-collide and
    # the idempotent epoch rewrite would DROP their delivered rows.
    # With the own-epoch exclusion the replay recomputes from the
    # pre-batch state and rewrites sink + state whole.
    import os

    out = str(tmp_path / "out_t")
    state = str(tmp_path / "state_t")
    step = make_curation_step(spark, model, out, state, alpha=9.0)
    b1 = spark.createDataFrame(_B1, _SCHEMA)
    step(b1, 0)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]
    full_state = {
        (r.doc_id, r.band, r.bsig) for r in spark.read.parquet(state).collect()
    }
    # tear the epoch-0 state: rewrite the dir with a strict SUBSET of
    # the batch's band keys (doc 1's first band only) — exactly what a
    # crash mid-commit leaves visible
    subset = [r for r in sorted(full_state) if r[0] == 1][:1]
    assert subset and len(subset) < len(full_state)
    spark.createDataFrame(
        subset, "doc_id long, band int, bsig long"
    ).write.mode("overwrite").parquet(os.path.join(state, "epoch=0"))
    torn = {(r.doc_id, r.band, r.bsig) for r in spark.read.parquet(state).collect()}
    assert torn == set(subset) != full_state
    # replay: delivered rows intact, state rebuilt whole
    step(b1, 0)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == first
    after = {(r.doc_id, r.band, r.bsig) for r in spark.read.parquet(state).collect()}
    assert after == full_state


def test_composed_step_routes_languages(spark, model, tmp_path):
    """Review 9b: the composed one-checkpoint step exposes the round-9
    classify-then-route rule stage — step output == gate_micro_batch
    output with the same routed_profiles over the same batch, and the
    German prose page survives only because routing applied its own
    language's params (the module-level word-soup fixtures fail the
    full doc rules under ANY language, so this test carries prose)."""
    from kafka_connect_ftp_spark.operators.lang_id import (
        NORM_KEEP_ROUTED,
        SEED_TEXTS_ROUTED,
        seed_frame,
        train_char_profiles,
    )
    from kafka_connect_ftp_spark.streaming.curation_stream import make_curation_step
    from kafka_connect_ftp_spark.streaming.quality_gate import gate_micro_batch

    en_prose = (
        "the committee published the annual report this morning and that was fine.\n"
        "several members of the board have asked to be heard before the vote.\n"
        "the final decision will be announced with the other findings next week.\n"
        "many people that follow the debate have strong views on the plan.\n"
        "the chair thanked the members of the committee for their patient work."
    )
    de_prose = (
        "die regierung hat heute einen neuen haushaltsplan mit vielen details vorgestellt.\n"
        "die opposition will den entwurf im parlament mit mehreren anträgen ändern.\n"
        "viele bürger haben dazu bereits eine sehr klare meinung geäußert.\n"
        "die debatte über das thema dürfte noch mehrere wochen dauern.\n"
        "am ende wird das parlament über den gesamten entwurf abstimmen müssen."
    )
    prose_words = sorted(
        set((en_prose + " " + de_prose).replace("\n", " ").replace(".", "").split())
    )
    pos = spark.createDataFrame(
        [(i, _text(prose_words, i)) for i in range(40)], _SCHEMA
    )
    neg = spark.createDataFrame(
        [(1000 + i, _text(_JUNK, 100 + i)) for i in range(40)], _SCHEMA
    )
    pmodel = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=25)
    profiles = train_char_profiles(
        seed_frame(spark, SEED_TEXTS_ROUTED), norm_keep=NORM_KEEP_ROUTED
    ).cache()
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(11, en_prose), (12, de_prose), (13, _text(_JUNK, 13))], _SCHEMA
    )
    step = make_curation_step(
        spark, pmodel, out_dir, state_dir, routed_profiles=profiles
    )
    step(batch, 0)
    got = {r.doc_id for r in spark.read.parquet(f"{out_dir}/epoch=0").collect()}
    want = {
        r.doc_id
        for r in gate_micro_batch(batch, pmodel, routed_profiles=profiles).collect()
    }
    assert got == want == {11, 12}, (got, want)


def test_blocklist_stage_runs_first_and_skips_band_state(spark, model, tmp_path):
    """Round 10: the composed stream exposes the URL blocklist as stage
    0 — a blocked document is neither delivered NOR signed into the
    band state, so a later CLEAN near-duplicate of a blocked page is
    not treated as a duplicate."""
    from pyspark.sql import functions as F

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    step = make_curation_step(
        spark, model, out, state, alpha=9.0, blocklist=bl, url_col="url"
    )
    urls = {
        1: "https://ok.example.org/a",
        2: "https://cdn.bad.example.com/p",   # blocked (suffix)
        5: "https://ok.example.org/b",
    }
    b1 = spark.createDataFrame(
        [(i, t, urls.get(i, "https://ok.example.org/x")) for i, t in _B1],
        "doc_id long, text string, url string",
    )
    step(b1, 0)
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 2 not in got1 and 1 in got1
    # band state carries no keys for the blocked doc
    state_ids = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert 2 not in state_ids
    # a near-duplicate of the BLOCKED text arriving later from a clean
    # host is admitted (it was never in the state)
    blocked_text = dict(_B1)[2]
    b2 = spark.createDataFrame(
        [(20, blocked_text, "https://ok.example.org/c")],
        "doc_id long, text string, url string",
    )
    step(b2, 1)
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 20 in got2
    # replay of batch 1 is byte-identical (blocklist is deterministic)
    before = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(f"{out}/epoch=1").collect()
    )
    step(b2, 1)
    after = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(f"{out}/epoch=1").collect()
    )
    assert before == after


def test_span_stage_dedups_across_batches_and_persists_on_empty(
    spark, model, tmp_path
):
    """Round 11: the composed stream exposes C4 span dedup as stage 0b.
    A paragraph admitted in batch 0 is stripped from batch 1's
    documents BEFORE the gates run; blocked docs never reach the span
    state; and an all-near-dup batch still persists its span
    admissions (staged semantics — the span gate ran)."""
    from pyspark.sql import functions as F

    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    span_state = str(tmp_path / "span_state")
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    step = make_curation_step(
        spark, model, out, state, alpha=9.0,
        blocklist=bl, url_col="url",
        span_unit="paragraph", span_state_dir=span_state,
    )
    boiler = "all rights reserved by the example site"
    blocked_only = "paragraph seen only on the blocked host"
    b0 = spark.createDataFrame(
        [
            (1, f"{_text(_GOOD, 1)}\n\n{boiler}", "https://ok.example.org/a"),
            (2, f"{blocked_only}\n\n{boiler}", "https://bad.example.com/p"),
        ],
        "doc_id long, text string, url string",
    )
    step(b0, 0)
    got0 = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert got0 == {1: f"{_text(_GOOD, 1)}\n\n{boiler}"}  # doc 2 blocked
    # the blocked doc's unique paragraph is NOT in the span state
    hashes = {r.h for r in spark.read.parquet(span_state).collect()}
    blocked_h = spark.sql(
        f"select xxhash64('{blocked_only}') as h"
    ).collect()[0].h
    assert blocked_h not in hashes and len(hashes) == 2
    # batch 1: the boiler paragraph is stripped from a fresh doc before
    # any gate, and the doc is otherwise delivered intact
    b1 = spark.createDataFrame(
        [(5, f"{_text(_GOOD, 5)}\n\n{boiler}", "https://ok.example.org/b")],
        "doc_id long, text string, url string",
    )
    step(b1, 1)
    got1 = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }
    assert got1 == {5: _text(_GOOD, 5)}
    # delivered schema carries no stage diagnostics
    assert "n_spans" not in spark.read.parquet(f"{out}/epoch=1").columns
    # batch 2 re-delivers doc 5's pre-strip text: its only span is
    # already in the span state, the doc rebuilds to empty and is
    # dropped (an empty text has no shingles for the near-dup filter
    # to catch) — nothing is delivered, but the span stage still
    # persists its (empty) epoch so the staged-semantics contract of
    # "span state written whenever the stage ran" holds
    b2 = spark.createDataFrame(
        [(5, f"{_text(_GOOD, 5)}", "https://ok.example.org/c")],
        "doc_id long, text string, url string",
    )
    step(b2, 2)
    assert not os.path.exists(f"{out}/epoch=2")  # nothing delivered
    assert os.path.exists(f"{span_state}/epoch=2")  # span stage persisted
    # replay byte-identity with the span stage on
    step(b1, 1)
    assert got1 == {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{out}/epoch=1").collect()
    }


def test_whitespace_only_rebuilt_shell_is_dropped(spark, model, tmp_path):
    """Round 12 (ADVICE r11): a doc whose CONTENT spans are all known
    duplicates but which keeps a first-seen whitespace-only span
    rebuilds to whitespace-only text (e.g. '\\t' under the line unit).
    F.trim strips only spaces, so the old filter delivered it as a
    shingle-less shell the near-dup stage cannot catch; the rlike(\\S)
    filter drops it."""
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    span_state = str(tmp_path / "span_state")
    step = make_curation_step(
        spark, model, out, state, alpha=9.0,
        span_unit="line", span_state_dir=span_state,
    )
    seen_line = _text(_GOOD, 1)
    b0 = spark.createDataFrame([(1, seen_line)], _SCHEMA)
    step(b0, 0)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}
    # doc 7: both content lines already admitted, the tab line is kept
    # (first seen, but trim()-nonempty) -> rebuilds to exactly "\t"
    b1 = spark.createDataFrame(
        [(7, f"{seen_line}\n\t\n{seen_line}")], _SCHEMA
    )
    step(b1, 1)
    assert not os.path.exists(f"{out}/epoch=1")  # shell dropped, not delivered
    # the span stage still persisted its epoch (staged semantics)
    assert os.path.exists(f"{span_state}/epoch=1")


def test_blocklist_join_mode_passthrough(spark, model, tmp_path):
    """Round 12 (VERDICT r11 #2): the composed step exposes the shuffle
    blocklist path — same decisions as broadcast mode — and rejects
    unknown modes at build time."""
    bl = spark.createDataFrame([("bad.example.com",)], "domain string")
    with pytest.raises(ValueError, match="blocklist_join_mode"):
        make_curation_step(
            spark, model, str(tmp_path / "x"), str(tmp_path / "y"),
            blocklist=bl, blocklist_join_mode="bucketed",
        )
    urls = {
        1: "https://ok.example.org/a",
        2: "https://cdn.bad.example.com/p",   # blocked (suffix)
    }
    b1 = spark.createDataFrame(
        [(i, t, urls.get(i, "https://ok.example.org/x")) for i, t in _B1],
        "doc_id long, text string, url string",
    )
    got = {}
    for mode in ("broadcast", "shuffle"):
        out, state = str(tmp_path / f"out_{mode}"), str(tmp_path / f"st_{mode}")
        step = make_curation_step(
            spark, model, out, state, alpha=9.0,
            blocklist=bl, url_col="url", blocklist_join_mode=mode,
        )
        step(b1, 0)
        got[mode] = sorted(
            (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
        )
    assert got["broadcast"] == got["shuffle"]
    assert 2 not in {d for d, _ in got["shuffle"]}


def test_band_state_buckets_passthrough(spark, model, tmp_path):
    """Round 12: the composed step exposes the bucketed band state —
    same admitted/curated set as plain mode across two batches, state
    stored as the CLUSTERED BY (band, bsig) table."""
    got = {}
    for buckets in (None, 4):
        tag = "plain" if buckets is None else "buck"
        out = str(tmp_path / f"out_{tag}")
        state = str(tmp_path / f"st_{tag}")
        step = make_curation_step(
            spark, model, out, state, alpha=9.0, band_state_buckets=buckets
        )
        step(spark.createDataFrame(_B1, _SCHEMA), 0)
        step(spark.createDataFrame(_B2, _SCHEMA), 1)
        got[tag] = sorted(
            (r.doc_id, r.text) for r in spark.read.parquet(out).collect()
        )
    assert got["plain"] == got["buck"]
    assert [d for d, _ in got["buck"]] == [1, 2, 5]
    assert os.path.exists(str(tmp_path / "st_buck" / "BUCKETS"))
    assert os.path.exists(str(tmp_path / "st_buck" / "bucketed"))


def test_composed_auto_compaction_fires_on_both_stores(spark, model, tmp_path):
    """compact_every on the composed step folds BOTH state stores from
    inside the step (including on the all-duplicate early-return path)
    and changes no decision."""
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    span_state = str(tmp_path / "span_state")
    step = make_curation_step(
        spark, model, out, state, alpha=9.0,
        span_unit="paragraph", span_state_dir=span_state,
        compact_every=2,
    )
    texts = [_text(_GOOD, s) for s in (1, 2, 5, 6)]
    for i, t in enumerate(texts):
        step(spark.createDataFrame([(10 + i, t)], _SCHEMA), i)

    def eps(d):
        return sorted(
            int(e.split("=")[1])
            for e in os.listdir(d)
            if e.startswith("epoch=")
        )

    # batch 1 fired (inputs [0] alone -> no-op), batch 3 folded [0, 1]
    assert eps(state) == [-1, 2, 3]
    assert eps(span_state) == [-1, 2, 3]
    # a near-dup of a FOLDED-epoch doc is still rejected; batch 4 is an
    # even batch so the cadence does not fire
    step(spark.createDataFrame([(30, texts[0])], _SCHEMA), 4)
    assert not os.path.exists(f"{out}/epoch=4")
    assert eps(state) == [-1, 2, 3] and eps(span_state) == [-1, 2, 3, 4]
    # batch 5: all-duplicate again AND an odd batch — the early-return
    # path must hit the hook too. Band store: inputs [-1] alone (top-2
    # non-negative protected) -> no-op; span store folds [-1, 2, 3]
    step(spark.createDataFrame([(31, texts[1])], _SCHEMA), 5)
    assert eps(state) == [-1, 2, 3]
    # span store folds [2, 3]; the prior consolidation stays (review
    # r12 amortization — negatives squeeze at the max_consolidated-th
    # fire, not every fire)
    assert eps(span_state) == [-2, -1, 4, 5]
