"""Epoch compaction for the dedup state stores
(streaming/state_compaction.py): folding old per-batch epochs into one
consolidated negative-epoch partition must preserve the key set
EXACTLY, keep every replay contract intact (negative epochs are never
excluded; the newest epochs stay foldable-replay targets), converge
after a crash at any point, and keep bucketed span state bucketed."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.streaming.neardup_stream import (
    make_near_dup_step,
    read_band_state,
)
from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
    make_span_dedup_step,
    read_span_state,
)
from kafka_connect_ftp_spark.streaming.state_compaction import (
    _plan,
    compact_epoch_state,
)

_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (3, "phi chi psi omega alef bet gimel dalet he vav"),
    (4, "one two three four five six seven eight nine ten"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _epochs(d):
    return sorted(
        int(e.split("=")[1]) for e in os.listdir(d) if e.startswith("epoch=")
    )


def test_plan_protects_newest_and_skips_singletons():
    assert _plan([0, 1, 2, 3], 2) == ([0, 1], -1)
    assert _plan([5, 6], 2) is None           # all protected
    assert _plan([0, 5, 6], 2) is None        # one input folds to one
    assert _plan([], 2) is None
    # review r12 amortization: consolidated (negative) partitions are
    # NOT re-folded on every fire — each fire is O(folded window), and
    # negatives are squeezed only once max_consolidated accumulate
    assert _plan([-1, 0, 1, 2], 2) is None          # [0] alone: no gain
    assert _plan([-1, 0, 1, 2, 3], 2) == ([0, 1], -2)   # negs left alone
    assert _plan([-3, -1, 5, 6], 2) is None         # 2 negs < threshold
    assert _plan([-3, -1, 5, 6], 2, max_consolidated=2) == ([-3, -1], -4)
    negs = list(range(-8, 0))
    assert _plan(negs + [0, 1, 5, 6], 2) == (sorted(negs + [0, 1]), -9)


def test_band_state_compaction_preserves_dedup_exactly(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_near_dup_step(spark, out, state, idempotent=True)
    for i, row in enumerate(_DOCS[:3]):
        step(_df(spark, [row]), i)
    before = {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    }
    assert _epochs(state) == [0, 1, 2]

    res = compact_epoch_state(spark, state, keep_epochs=2)
    assert res == {"folded": [0], "target": -1} or res["folded"] == []
    # with 3 epochs and keep=2 only one input exists -> no-op; force a
    # fourth epoch so two fold
    step(_df(spark, [_DOCS[3]]), 3)
    res = compact_epoch_state(spark, state, keep_epochs=2)
    assert res["folded"] == [0, 1] and res["target"] == -1
    assert _epochs(state) == [-1, 2, 3]
    after = {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    }
    assert after == before | {
        tuple(r)
        for r in spark.read.parquet(f"{state}/epoch=3").collect()
    }
    # the replay read still sees every folded key (negative epoch is
    # never excluded), so a near-dup of an EARLY admitted doc is still
    # dropped by a later batch
    seen = read_band_state(spark, state, _df(spark, []), exclude_epoch=4)
    assert {tuple(r) for r in seen.collect()} == after
    dup = [(9, _DOCS[0][1])]  # near-dup of doc 1 (folded epoch 0)
    step(_df(spark, dup), 4)
    assert not os.path.exists(f"{out}/epoch=4")  # all-duplicate batch
    # idempotent: an immediate re-run has nothing to fold
    assert compact_epoch_state(spark, state, keep_epochs=2)["folded"] == []


def test_compaction_converges_after_crash_between_write_and_delete(
    spark, tmp_path
):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_near_dup_step(spark, out, state, idempotent=True)
    for i, row in enumerate(_DOCS):
        step(_df(spark, [row]), i)
    before = {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    }
    compact_epoch_state(spark, state, keep_epochs=2)
    # simulate the crash: resurrect BOTH deleted inputs (the fold had
    # committed, the deletes had not) — duplicate keys, never lost ones
    consolidated = spark.read.parquet(f"{state}/epoch=-1")
    for e in (0, 1):
        spark.read.parquet(f"{state}/epoch=-1").limit(2).write.parquet(
            f"{state}/epoch={e}"
        )
    assert _epochs(state) == [-1, 0, 1, 2, 3]
    # keys unchanged as a SET even mid-crash (duplicates are harmless
    # to the semi/anti-join consumers)
    assert {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    } == before
    # re-run folds the leftovers into the next negative slot; the
    # previous consolidation is NOT re-read (review r12 amortization —
    # duplicate keys across negative partitions are harmless and get
    # squeezed at the max_consolidated-th fire); set still exact
    res = compact_epoch_state(spark, state, keep_epochs=2)
    assert res == {"folded": [0, 1], "target": -2}
    assert _epochs(state) == [-2, -1, 2, 3]
    assert {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    } == before
    # the negative squeeze itself, forced with a low threshold
    res = compact_epoch_state(
        spark, state, keep_epochs=2, max_consolidated=2
    )
    assert res == {"folded": [-2, -1], "target": -3}
    assert _epochs(state) == [-3, 2, 3]
    assert {
        tuple(r) for r in spark.read.parquet(state).drop("epoch").collect()
    } == before


def test_bucketed_span_state_compaction(spark, tmp_path):
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state, buckets=4, idempotent=True)
    for i, row in enumerate(_DOCS):
        step(_df(spark, [row]), i)
    data = f"{state}/bucketed"
    before = {r.h for r in read_span_state(spark, state, buckets=4).collect()}
    assert _epochs(data) == [0, 1, 2, 3]

    res = compact_epoch_state(spark, state, keep_epochs=2, buckets=4)
    assert res == {"folded": [0, 1], "target": -1}
    assert _epochs(data) == [-1, 2, 3]
    assert not os.path.exists(f"{state}/compact_tmp")
    # key set exact; consolidated rows visible through the table AND
    # never dropped by a replay's own-epoch exclusion
    assert {
        r.h for r in read_span_state(spark, state, buckets=4).collect()
    } == before
    assert {
        r.h
        for r in read_span_state(
            spark, state, buckets=4, exclude_epoch=4
        ).collect()
    } == before
    # a span admitted in FOLDED epoch 0 still dedups batch 4: the
    # redelivered doc's only span is dropped and it rebuilds empty
    redelivery = [(9, _DOCS[0][1])]
    step(_df(spark, redelivery), 4)
    got = spark.read.parquet(f"{out}/epoch=4").collect()
    assert len(got) == 1 and got[0].text == "" and got[0].n_dropped == 1
    # wrong bucket count still rejected through the compactor
    with pytest.raises(ValueError, match="buckets"):
        compact_epoch_state(spark, state, keep_epochs=2, buckets=8)
    # and plain-mode compaction of a bucketed dir is refused
    with pytest.raises(ValueError, match="BUCKETED"):
        compact_epoch_state(spark, state, keep_epochs=2)


def test_bucketed_compaction_preserves_no_exchange_plan(spark, tmp_path):
    """The point of bucketed state is the state-side-Exchange-free
    anti-join; folding partitions must not cost that plan property."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_span_dedup_step(spark, out, state, buckets=4, idempotent=True)
    for i, row in enumerate(_DOCS):
        step(_df(spark, [row]), i)
    compact_epoch_state(spark, state, keep_epochs=2, buckets=4)
    seen = read_span_state(spark, state, buckets=4)
    probe = spark.range(10).select(F.xxhash64("id").alias("h"))
    plan = (
        probe.repartition(4, F.col("h"))
        .join(seen, "h", "left_anti")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one Exchange (the probe side); the state scan is
    # bucket-aligned
    assert plan.count("Exchange") == 1, plan


def test_keep_epochs_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="keep_epochs"):
        compact_epoch_state(spark, str(tmp_path), keep_epochs=0)
    # absent dir: nothing to do, no error
    assert compact_epoch_state(spark, str(tmp_path / "nope"))["folded"] == []


def test_bucketed_band_state_compaction(spark, tmp_path):
    """Round 12: the compactor handles the bucketed BAND state too —
    the STATE_SPEC marker tells it which columns/clustering the table
    carries, so no kind parameter exists to get wrong."""
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_near_dup_step(spark, out, state, idempotent=True, buckets=4)
    for i, row in enumerate(_DOCS):
        step(_df(spark, [row]), i)
    batch = _df(spark, [])
    before = {
        (r.doc_id, r.band, r.bsig)
        for r in read_band_state(spark, state, batch, buckets=4).collect()
    }
    assert _epochs(f"{state}/bucketed") == [0, 1, 2, 3]
    res = compact_epoch_state(spark, state, keep_epochs=2, buckets=4)
    assert res == {"folded": [0, 1], "target": -1}
    assert _epochs(f"{state}/bucketed") == [-1, 2, 3]
    after = {
        (r.doc_id, r.band, r.bsig)
        for r in read_band_state(spark, state, batch, buckets=4).collect()
    }
    assert after == before
    # a near-dup of a doc admitted in FOLDED epoch 0 is still dropped
    step(_df(spark, [(9, _DOCS[0][1])]), 4)
    assert not os.path.exists(f"{out}/epoch=4")


def test_in_step_auto_compaction(spark, tmp_path):
    """compact_every=N on the step builders folds from inside the step
    (after the state write — never concurrent with the stream's own
    reads) and changes no decision: near-dup and span steps produce the
    identical delivered set with and without the cadence."""
    # near-dup step, cadence 2 over 4 batches -> two folds fired
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    step = make_near_dup_step(
        spark, out, state, idempotent=True, compact_every=2
    )
    for i, row in enumerate(_DOCS):
        step(_df(spark, [row]), i)
    # cadence math: batch 1 fires with epochs [0,1] -> input [0] alone
    # (no gain, no-op); batch 3 fires with [0,1,2,3] -> folds [0,1]
    # into -1. The KEYS stay exact throughout:
    assert _epochs(state) == [-1, 2, 3]
    step(_df(spark, [(9, _DOCS[0][1])]), 4)  # near-dup of folded doc 1
    assert not os.path.exists(f"{out}/epoch=4")
    # span step with bucketed state + cadence: parity with plain/no-fold
    out2, st2 = str(tmp_path / "o2"), str(tmp_path / "s2")
    sstep = make_span_dedup_step(
        spark, out2, st2, buckets=4, idempotent=True, compact_every=2
    )
    ref_out, ref_st = str(tmp_path / "o3"), str(tmp_path / "s3")
    rstep = make_span_dedup_step(spark, ref_out, ref_st, idempotent=True)
    two_para = [
        (i, f"{t}\n\n{_DOCS[0][1]}") for i, t in _DOCS  # shared 2nd para
    ]
    for i, row in enumerate(two_para):
        sstep(_df(spark, [row]), i)
        rstep(_df(spark, [row]), i)
    got = {
        r.doc_id: (r.text, r.n_dropped)
        for r in spark.read.parquet(out2).collect()
    }
    want = {
        r.doc_id: (r.text, r.n_dropped)
        for r in spark.read.parquet(ref_out).collect()
    }
    assert got == want
    assert -1 in _epochs(f"{st2}/bucketed")  # a fold actually happened
