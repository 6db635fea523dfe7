"""Sequence-packing operator: budget respected, every document packed
exactly once, oversize docs isolated + flagged, deterministic output, and
sane fill ratios on the real documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.packing import pack_sequences, packing_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return docs, pack_sequences(docs, max_tokens=256, n_shards=8)


def test_budget_never_exceeded(packed_docs):
    _, packed = packed_docs
    over = (
        packed.filter(~F.col("truncated"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("total"))
        .filter(F.col("total") > 256)
    )
    assert over.count() == 0


def test_every_doc_packed_exactly_once(packed_docs):
    docs, packed = packed_docs
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_oversize_docs_isolated_and_flagged(spark):
    rows = [(1, 10), (2, 300), (3, 20), (4, 256)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(df, max_tokens=256, n_shards=2)
    flagged = {r.doc_id: r.truncated for r in packed.collect()}
    assert flagged[2]  # strictly over budget → isolated + flagged
    # exactly max_tokens is a PERFECT fit, not a truncation
    assert not flagged[4] and not flagged[1] and not flagged[3]
    seq_of = {r.doc_id: r.seq_id for r in packed.collect()}
    # an oversize doc never shares a sequence
    members = [d for d, s in seq_of.items() if s == seq_of[2]]
    assert members == [2]
    # and the perfect-fit doc's sequence is exactly full
    full = [d for d, s in seq_of.items() if s == seq_of[4]]
    assert full == [4]


def test_positions_are_contiguous_concatenation_order(packed_docs):
    _, packed = packed_docs
    bad = (
        packed.groupBy("seq_id")
        .agg(F.sort_array(F.collect_list("position")).alias("ps"), F.count("*").alias("n"))
        .filter(F.expr("ps <> sequence(0, int(n) - 1)"))
    )
    assert bad.count() == 0


def test_deterministic(packed_docs):
    docs, packed = packed_docs
    again = pack_sequences(docs, max_tokens=256, n_shards=8)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_fill_ratio_beats_naive(packed_docs):
    docs, packed = packed_docs
    stats = packing_stats(packed, max_tokens=256).collect()[0]
    naive_fill = (
        docs.filter(F.col("n_tokens") < 256)
        .agg(F.avg(F.col("n_tokens") / 256.0))
        .collect()[0][0]
    )
    assert stats.n_documents == docs.count()
    assert stats.mean_fill_ratio > naive_fill  # packing must beat 1 doc/seq
    assert stats.mean_fill_ratio > 0.7


def test_hot_shard_all_bins_open_stays_fast(spark):
    # pathological single shard: every doc is over half the budget, so no
    # two share a bin and ALL bins stay open — the first-fit linear scan
    # was O(n·bins)=O(n²) interpreted Python here (minutes at this size);
    # the bisect best-fit must finish comfortably inside the bound
    import time

    n = 60_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.lit(130) + F.pmod(F.col("id"), F.lit(120))).cast("long").alias("n_tokens"),
    )
    t0 = time.time()
    packed = pack_sequences(df, max_tokens=256, n_shards=1)
    assert packed.count() == n
    assert time.time() - t0 < 60
    # every sequence holds exactly one doc (nothing fits together)
    assert packed.select("seq_id").distinct().count() == n


def test_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=0)


def test_null_token_count_rejected_loudly(spark):
    # a NaN reaching the shard worker would crash with an opaque int()
    # error (or silently vanish); the operator must name the offending doc
    import pytest
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([(1, 5), (2, None)], "doc_id long, n_tokens int")
    with pytest.raises(Exception, match="null token count"):
        pack_sequences(df, max_tokens=10).collect()


def test_concat_chunks_matches_hand_computation(spark):
    """pack_concat_chunks (round 9b): per-stream running offsets, window
    indices incl. boundary-straddling and zero-token documents."""
    from kafka_connect_ftp_spark.operators.packing import pack_concat_chunks

    docs = spark.createDataFrame(
        [
            # stream a: 6 + 3 + 5 tokens, budget 8 -> doc 2 straddles
            (1, "a", 6), (2, "a", 3), (3, "a", 5),
            # stream b: exact-boundary doc, then zero-token doc AT a
            # boundary, then a 17-token doc spanning 3 windows
            (10, "b", 8), (11, "b", 0), (12, "b", 17),
        ],
        "doc_id long, source string, n_tokens long",
    )
    out = {
        r.doc_id: (r.pack_off, r.pack_seq_first, r.pack_seq_last)
        for r in pack_concat_chunks(docs, budget=8).collect()
    }
    assert out[1] == (0, 0, 0)          # [0,6) in window 0
    assert out[2] == (6, 0, 1)          # [6,9) straddles 0->1
    assert out[3] == (9, 1, 1)          # [9,14) inside window 1
    assert out[10] == (0, 0, 0)         # [0,8) exactly fills window 0
    assert out[11] == (8, 1, 1)         # zero tokens at offset 8 -> window 1
    assert out[12] == (8, 1, 3)         # [8,25) spans windows 1..3
    # determinism across partition layouts
    out7 = {
        r.doc_id: (r.pack_off, r.pack_seq_first, r.pack_seq_last)
        for r in pack_concat_chunks(docs.repartition(5), budget=8).collect()
    }
    assert out7 == out
    import pytest

    with pytest.raises(ValueError, match="budget"):
        pack_concat_chunks(docs, budget=0)
