"""Streaming near-dup filter (streaming/neardup_stream.py): cross-batch
collisions dropped via the band-key state, in-batch duplicates resolved
by the batch CC rule, and parity with batch-mode dedup on id-ordered
arrival."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz under the harvest moon and nobody minds the rain"
)
_OTHER = (
    "completely different content about distributed query planning and "
    "shuffle partitioning strategies for petabyte scale analytics jobs"
)
_THIRD = (
    "yet another unrelated document concerning the migration habits of "
    "arctic terns across two polar summers every single year"
)


def _mutate(s: str, i: int) -> str:
    # one word appended: high jaccard on 8-char shingles -> near-dup
    return s + f" v{i}"


@pytest.fixture
def feeder(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def feed(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    return spark.readStream.schema(_SCHEMA).parquet(src), feed


def test_cross_batch_and_in_batch_near_dups(spark, feeder, tmp_path):
    from kafka_connect_ftp_spark.streaming.neardup_stream import (
        start_near_dup_filter,
    )

    stream, feed = feeder
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = start_near_dup_filter(stream, out, state, ckpt)
    try:
        # batch 1: 1 and 2 are near-dups of each other; 10 distinct
        feed([(1, _BASE), (2, _mutate(_BASE, 2)), (10, _OTHER)])
        q.processAllAvailable()
        # batch 2: 20 near-dups doc 1 (cross-batch -> dropped by state),
        # 30 distinct (admitted), 40/41 in-batch near-dups (one admitted)
        feed(
            [
                (20, _mutate(_BASE, 20)),
                (30, _THIRD),
                (40, _mutate(_OTHER, 40)),
                (41, _mutate(_OTHER, 41)),
            ]
        )
        q.processAllAvailable()
    finally:
        q.stop()

    admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
    # wait: 40/41 are near-dups of _OTHER which doc 10 already admitted
    # in batch 1 -> BOTH dropped by the cross-batch state
    assert admitted == {1, 10, 30}

    # the state table carries band keys ONLY for admitted docs
    state_docs = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert state_docs == admitted


def test_stream_equals_batch_on_id_ordered_arrival(spark, feeder, tmp_path):
    # on id-ordered arrival the stream's first-arrival-wins equals batch
    # mode's keep-min-id: same admitted set
    from kafka_connect_ftp_spark.operators.dedup_cluster import dedup_decision
    from kafka_connect_ftp_spark.operators.text_dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kafka_connect_ftp_spark.streaming.neardup_stream import (
        start_near_dup_filter,
    )

    rows_b1 = [(1, _BASE), (2, _mutate(_BASE, 2)), (3, _OTHER)]
    rows_b2 = [(4, _mutate(_BASE, 4)), (5, _THIRD), (6, _mutate(_THIRD, 6))]

    stream, feed = feeder
    out = str(tmp_path / "out2")
    state = str(tmp_path / "state2")
    ckpt = str(tmp_path / "ckpt2")
    q = start_near_dup_filter(stream, out, state, ckpt)
    try:
        feed(rows_b1)
        q.processAllAvailable()
        feed(rows_b2)
        q.processAllAvailable()
    finally:
        q.stop()
    stream_admitted = {r.doc_id for r in spark.read.parquet(out).collect()}

    full = spark.createDataFrame(rows_b1 + rows_b2, _SCHEMA)
    sig = minhash_signatures(full, "doc_id", "text")
    keep = dedup_decision(lsh_candidate_pairs(sig), full.select("doc_id"))
    batch_admitted = {r.doc_id for r in keep.filter("keep").collect()}

    assert stream_admitted == batch_admitted


def test_idempotent_replay_never_duplicates(spark, tmp_path):
    # drive the batch step directly: a crash replay is "call the step
    # again with the same (batch, batch_id)". Both crash points are
    # covered by construction — same-epoch overwrite (crash between
    # sink and state writes) and self-collision empty-skip (crash after
    # the state write).
    from kafka_connect_ftp_spark.streaming.neardup_stream import make_near_dup_step

    out = str(tmp_path / "out_i")
    state = str(tmp_path / "state_i")
    step = make_near_dup_step(spark, out, state, idempotent=True)

    b1 = spark.createDataFrame(
        [(1, _BASE), (2, _mutate(_BASE, 2)), (3, _OTHER)], _SCHEMA
    )
    step(b1, 0)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [1, 3]
    # replay AFTER the state write: docs collide with their own band
    # keys, nothing is admitted, the original epoch partition survives
    step(b1, 0)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == first
    # a later batch lands in its own epoch partition
    b2 = spark.createDataFrame([(5, _THIRD)], _SCHEMA)
    step(b2, 1)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 3, 5]


def test_legacy_flat_state_migrates_not_vanishes(spark, tmp_path):
    # ADVICE r7 regression: a round-6 state dir holds FLAT parquet files
    # (no epoch= partition). Once the upgraded step writes its first
    # epoch=N subdir, Spark partition discovery silently ignores every
    # root-level file — all pre-upgrade band keys would vanish and
    # near-dups of previously-admitted docs would be re-admitted. The
    # fix migrates flat files into the reserved epoch=-1 partition on
    # read, so legacy keys keep filtering.
    import glob
    import os

    from kafka_connect_ftp_spark.operators.text_dedup import (
        band_signatures,
        minhash_signatures,
    )
    from kafka_connect_ftp_spark.streaming.neardup_stream import make_near_dup_step

    out = str(tmp_path / "out_m")
    state = str(tmp_path / "state_m")
    # legacy layout: the admitted doc's band keys as ROOT-level parquet
    legacy = spark.createDataFrame([(1, _BASE)], _SCHEMA)
    band_signatures(minhash_signatures(legacy, "doc_id", "text")).coalesce(
        1
    ).write.mode("overwrite").parquet(state)
    assert glob.glob(os.path.join(state, "*.parquet"))  # flat files exist

    step = make_near_dup_step(spark, out, state, idempotent=True)
    # near-dup of the legacy-admitted doc 1 plus one fresh doc: the
    # legacy state must drop 9 and admit only 30
    b = spark.createDataFrame([(9, _mutate(_BASE, 9)), (30, _THIRD)], _SCHEMA)
    step(b, 0)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [30]
    # flat files were physically moved into epoch=-1 (idempotent rename)
    assert not glob.glob(os.path.join(state, "*.parquet"))
    assert glob.glob(os.path.join(state, "epoch=-1", "*.parquet"))
    # and both generations of state keep filtering on the NEXT batch
    b2 = spark.createDataFrame(
        [(40, _mutate(_BASE, 40)), (41, _mutate(_THIRD, 41)), (50, _OTHER)],
        _SCHEMA,
    )
    step(b2, 1)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [30, 50]


def test_uncommitted_state_dir_reads_empty_not_wedged(spark, tmp_path):
    # ADVICE r6 regression: a crash during the very FIRST state append
    # can leave the state dir existing but holding no committed parquet
    # (only _temporary). Schema inference would then raise
    # UNABLE_TO_INFER_SCHEMA on every replay — a permanently wedged
    # stream. With the explicit state schema the dir reads as empty and
    # the replayed batch proceeds as the genuine first batch.
    import os

    from kafka_connect_ftp_spark.streaming.neardup_stream import make_near_dup_step

    out = str(tmp_path / "out_w")
    state = str(tmp_path / "state_w")
    os.makedirs(os.path.join(state, "_temporary"))  # crash artifact only
    step = make_near_dup_step(spark, out, state, idempotent=True)
    b1 = spark.createDataFrame([(1, _BASE), (3, _OTHER)], _SCHEMA)
    step(b1, 0)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 3]
    # and the state committed this time: a near-dup in the next batch drops
    b2 = spark.createDataFrame([(9, _mutate(_BASE, 9))], _SCHEMA)
    step(b2, 1)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 3]


def test_in_batch_redelivery_admits_one_copy(spark):
    """Review 9b: an at-least-once upstream delivering the same id twice
    INSIDE one micro-batch must not emit two copies — the band state
    only covers cross-batch re-delivery."""
    from kafka_connect_ftp_spark.streaming.neardup_stream import filter_micro_batch

    batch = spark.createDataFrame(
        [
            (1, "unique prose about rivers and mountains flowing far"),
            (1, "unique prose about rivers and mountains flowing far"),
            (2, "a completely different document concerning city planning"),
        ],
        "doc_id long, text string",
    )
    admitted, bands = filter_micro_batch(batch, None)
    rows = admitted.collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]  # one copy each
    assert bands.select("doc_id").distinct().count() == 2


def test_in_batch_redelivery_pick_is_deterministic(spark):
    """ADVICE r9: when one micro-batch carries the same id with
    DIFFERENT payloads (upstream corruption), the admitted variant must
    be deterministic — min full-row content hash — so a crash replay of
    the batch re-signs the SAME variant."""
    import hashlib

    from kafka_connect_ftp_spark.streaming.neardup_stream import filter_micro_batch

    variants = [
        "unique prose about rivers and mountains flowing far variant alpha",
        "unique prose about rivers and mountains flowing far variant beta",
    ]
    batch = spark.createDataFrame(
        [(7, v) for v in variants], "doc_id long, text string"
    )
    # the guard orders by sha2(to_json(struct(all cols))) and keeps min
    expect = min(
        variants,
        key=lambda v: hashlib.sha256(
            f'{{"doc_id":7,"text":"{v}"}}'.encode()
        ).hexdigest(),
    )
    for _ in range(2):  # same pick on replay
        admitted, _ = filter_micro_batch(batch, None)
        rows = admitted.collect()
        assert len(rows) == 1 and rows[0].text == expect


def test_in_batch_guard_tolerates_unjsonable_columns(spark):
    """ADVICE r10: the deterministic-pick guard hashes the row via
    to_json, which REJECTS some column types at analysis time (e.g. a
    map with non-string keys) — a schema that streamed fine before the
    guard must still stream. Unhashable columns are excluded from the
    pick hash; the guard still admits exactly one copy per id, and the
    pick stays deterministic across the hashable columns."""
    from kafka_connect_ftp_spark.streaming.neardup_stream import filter_micro_batch

    batch = spark.createDataFrame(
        [
            (1, "unique prose about rivers and mountains flowing far", {10: "a"}),
            (1, "unique prose about rivers and mountains flowing far", {20: "b"}),
            (2, "a completely different document concerning city planning", {30: "c"}),
        ],
        "doc_id long, text string, meta map<int,string>",
    )
    for _ in range(2):  # analysis must not raise; one copy per id
        admitted, bands = filter_micro_batch(batch, None)
        rows = admitted.collect()
        assert sorted(r.doc_id for r in rows) == [1, 2]
        assert bands.select("doc_id").distinct().count() == 2


def test_unjsonable_tiebreak_is_deterministic(spark):
    """Round 12 (VERDICT r11 #5): rows that differ ONLY in a
    non-JSON-serializable column (map with int keys) hash equal, and
    the old guard picked arbitrarily among them — a crash replay could
    deliver a different variant. The orderable-rewrite secondary key
    (map -> entry array sorted by key) makes the pick deterministic:
    the same variant wins whatever the input row order or the map's
    physical entry build order."""
    from kafka_connect_ftp_spark.streaming.neardup_stream import (
        deterministic_id_pick,
    )

    text = "unique prose about rivers and mountains flowing far"
    # two variants of id 1 differing ONLY in the int-keyed map; present
    # the batch in both row orders and with the map entries built in
    # both insertion orders
    v_small = {5: "x", 90: "y"}
    v_big = {7: "z"}
    orders = [
        [(1, text, v_small), (1, text, v_big)],
        [(1, text, v_big), (1, text, dict(reversed(list(v_small.items()))))],
    ]
    picks = set()
    for rows in orders:
        batch = spark.createDataFrame(
            rows, "doc_id long, text string, meta map<int,string>"
        )
        got = deterministic_id_pick(batch).collect()
        assert len(got) == 1
        picks.add(tuple(sorted(got[0].meta.items())))
    assert len(picks) == 1  # same variant from every presentation
    # nested: map inside an array differing between variants — still one
    # deterministic pick, no analysis error
    from pyspark.sql import functions as F

    nested = spark.createDataFrame(
        [(3, text, [{1: 10}]), (3, text, [{2: 20}])],
        "doc_id long, text string, m array<map<int,int>>",
    )
    a = deterministic_id_pick(nested).collect()
    b = deterministic_id_pick(nested.orderBy(F.rand(42))).collect()
    assert len(a) == len(b) == 1 and a[0].m == b[0].m


def test_bucketed_band_state_semantics_replay_and_plan(spark, tmp_path):
    """Round 12: the band state gets the span state's bucketed external
    table (shared streaming/bucketed_state.py) — value-parity with
    plain mode, replay overwrites ONLY its own epoch partition, the
    collision semi-join reads the state with NO state-side Exchange,
    and a fresh catalog re-registers the table over the existing files
    with partitions recovered."""
    from pyspark.sql import functions as F

    from kafka_connect_ftp_spark.streaming.bucketed_state import (
        band_spec,
        table_name,
    )
    from kafka_connect_ftp_spark.streaming.neardup_stream import (
        make_near_dup_step,
        read_band_state,
    )

    rows1 = [
        (1, "unique prose about rivers and mountains flowing far away"),
        (2, "a completely different document concerning city planning"),
    ]
    rows2 = [
        (3, rows1[0][1] + " x"),  # near-dup of admitted doc 1
        (4, "entirely novel fourth document text with fresh words"),
    ]

    def _run(state_root, buckets):
        out = f"{state_root}/out"
        state = f"{state_root}/state"
        step = make_near_dup_step(
            spark, out, state, idempotent=True, buckets=buckets
        )
        step(spark.createDataFrame(rows1, "doc_id long, text string"), 0)
        step(spark.createDataFrame(rows2, "doc_id long, text string"), 1)
        return out, state

    out_p, _ = _run(str(tmp_path / "plain"), None)
    out_b, state_b = _run(str(tmp_path / "buck"), 4)
    plain_ids = sorted(r.doc_id for r in spark.read.parquet(out_p).collect())
    buck_ids = sorted(r.doc_id for r in spark.read.parquet(out_b).collect())
    assert plain_ids == buck_ids == [1, 2, 4]  # 3 collided cross-batch

    spec = band_spec("bigint")
    name = table_name(spec, state_b)
    t = spark.table(name)
    epoch0 = sorted((r.doc_id, r.band, r.bsig) for r in t.filter("epoch = 0").collect())
    assert epoch0
    # replay of epoch 1 must not touch epoch 0 (static-partition insert)
    step = make_near_dup_step(
        spark, out_b, state_b, idempotent=True, buckets=4
    )
    step(spark.createDataFrame(rows2, "doc_id long, text string"), 1)
    assert epoch0 == sorted(
        (r.doc_id, r.band, r.bsig) for r in t.filter("epoch = 0").collect()
    )
    assert sorted(r.doc_id for r in spark.read.parquet(out_b).collect()) == buck_ids

    # state-side-Exchange-free semi-join: probe repartitioned on the
    # bucket keys joins the state scan with exactly one Exchange
    batch = spark.createDataFrame(rows1, "doc_id long, text string")
    seen = read_band_state(spark, state_b, batch, buckets=4)
    probe = spark.range(20).select(
        (F.col("id") % 4).cast("int").alias("band"),
        F.xxhash64("id").alias("bsig"),
    )
    plan = (
        probe.repartition(4, F.col("band"), F.col("bsig"))
        .join(seen, ["band", "bsig"], "left_semi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan

    # catalog restart: drop the table entry, read again — partitions
    # recovered via MSCK over the existing LOCATION
    spark.sql(f"DROP TABLE {name}")
    seen2 = read_band_state(spark, state_b, batch, buckets=4)
    assert seen2.count() == t.count()

    # a span-state dir cannot be reopened as band state (spec marker)
    from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
        write_span_state,
    )

    span_dir = str(tmp_path / "span")
    admitted = spark.range(3).select(F.xxhash64("id").alias("h"))
    write_span_state(spark, admitted, span_dir, 0, buckets=4)
    with pytest.raises(ValueError, match="span_state"):
        read_band_state(spark, span_dir, batch, buckets=4)
    # and plain-mode reads of a bucketed band dir are refused
    with pytest.raises(ValueError, match="BUCKETED"):
        read_band_state(spark, state_b, batch)


def test_bucketed_open_refuses_flat_legacy_dirs_and_survives_marker_crash(
    spark, tmp_path
):
    """Review r12: (a) a legacy FLAT-layout plain state dir (root-level
    parquet, pre-epoch) must be REFUSED by bucketed mode — writing
    markers over it would create an empty table beside the flat files
    and every accumulated key would silently vanish from the dedup
    check; (b) a crash between the two marker writes must not brick
    the dir — STATE_SPEC is written before BUCKETS, and a SPEC-only
    dir reopens correctly as its own kind."""
    import os

    from kafka_connect_ftp_spark.streaming.bucketed_state import (
        band_spec,
        ensure_table,
        load_spec,
    )
    from kafka_connect_ftp_spark.streaming.neardup_stream import (
        read_band_state,
    )

    # (a) flat legacy dir
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, 0, 123)], "doc_id long, band int, bsig long"
    ).coalesce(1).write.parquet(flat)
    # flatten: move part files up, drop the _SUCCESS-style layout Spark
    # wrote (simulates the genuine pre-epoch layout)
    batch = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="FLAT-layout"):
        read_band_state(spark, flat, batch, buckets=4)
    # the refusal must not have half-initialized the dir
    assert not os.path.exists(os.path.join(flat, "BUCKETS"))

    # (b) simulated crash: SPEC written, BUCKETS not — reopening with
    # the same spec completes initialization; with a different spec
    # (span) it still raises the mismatch, never the legacy fallback
    crash = str(tmp_path / "crash")
    os.makedirs(crash)
    spec = band_spec("bigint")
    import json

    with open(os.path.join(crash, "STATE_SPEC"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "prefix": spec.prefix,
                    "columns": [list(c) for c in spec.columns],
                    "bucket_cols": list(spec.bucket_cols),
                }
            )
        )
    assert load_spec(crash) == spec
    name = ensure_table(spark, crash, 4, spec)
    assert os.path.exists(os.path.join(crash, "BUCKETS"))
    assert spark.catalog.tableExists(name)
    from kafka_connect_ftp_spark.streaming.bucketed_state import SPAN_SPEC

    with pytest.raises(ValueError, match="band_state"):
        ensure_table(spark, str(tmp_path / "crash"), 4, SPAN_SPEC)
