"""MERGE upsert emulation tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.merge import merge_upsert


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )


def test_scd1_replace_and_insert(spark, target):
    source = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_custom_when_matched_accumulates(spark, target):
    source = spark.createDataFrame(
        [(2, "b", 5.0), (4, "d", 40.0)], "id long, name string, v double"
    )

    def add_values(matched, src):
        s = src.select(F.col("id"), F.col("v").alias("src_v"))
        return (
            matched.join(s, "id")
            .select("id", "name", (F.col("v") + F.col("src_v")).alias("v"))
        )

    out = {r.id: r.v for r in merge_upsert(target, source, ["id"], when_matched=add_values).collect()}
    assert out == {1: 10.0, 2: 25.0, 3: 30.0, 4: 40.0}


def test_schema_mismatch_rejected(spark, target):
    bad = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        merge_upsert(target, bad, ["id"])


def test_duplicate_source_keys_rejected(spark, target):
    # SQL MERGE raises on multiple source rows per key; a silent union
    # would leave duplicate target rows that later merges propagate
    import pytest

    src = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id long, name string, v double"
    )
    with pytest.raises(ValueError, match="multiple rows for merge key"):
        merge_upsert(target, src, ["id"])


def test_corpus_diff_statuses(spark):
    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "same", "s0"), (2, "will change", "s0"), (3, "gone", "s1")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, "same", "s0"), (2, "changed!", "s0"), (4, "fresh", "s1")],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_payload_never_shuffles(spark):
    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    old = spark.createDataFrame([(1, "x" * 10)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x" * 10)], "doc_id long, text string")
    diff = corpus_diff(old, new)
    # the join carries (id, hash) only: the hash projections sit BELOW
    # the join in the tree (children print after the parent), so payloads
    # reduce to a long before any exchange
    plan = diff._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.find("Join")
    assert join_at >= 0 and plan.find("xxhash64") > join_at
    assert diff.columns == ["doc_id", "status"]


def test_corpus_diff_validation(spark):
    import pytest

    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    a = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    b = spark.createDataFrame([(1, 2)], "doc_id long, other long")
    with pytest.raises(ValueError, match="no shared columns"):
        corpus_diff(a, b)
    with pytest.raises(ValueError, match="not present"):
        corpus_diff(a, b, compare_cols=["text"])


def test_corpus_diff_null_position_shift_is_a_change(spark):
    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    old = spark.createDataFrame([(1, "a", None)], "doc_id long, text string, source string")
    new = spark.createDataFrame([(1, None, "a")], "doc_id long, text string, source string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # a bare multi-arg xxhash64 skips NULLs and would call this unchanged
    assert got == {1: "changed"}


def test_corpus_diff_duplicate_ids_fold_not_fan_out(spark):
    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "copy"), (1, "copy"), (2, "x")], "doc_id long, text string"
    )
    same = spark.createDataFrame(
        [(1, "copy"), (1, "copy"), (2, "x")], "doc_id long, text string"
    )
    fewer = spark.createDataFrame([(1, "copy"), (2, "x")], "doc_id long, text string")
    # one row per id, never m x n join fan-out
    assert {r.doc_id: r.status for r in corpus_diff(old, same).collect()} == {
        1: "unchanged",
        2: "unchanged",
    }
    # losing one of two identical copies IS a change (count in the digest:
    # xor alone would cancel identical pairs to the same value)
    assert {r.doc_id: r.status for r in corpus_diff(old, fewer).collect()}[1] == "changed"


def test_corpus_diff_paired_duplicates_cannot_cancel(spark):
    # round-6 verdict regression: with an xor-only digest, old {r1,r1,r2}
    # vs new {r3,r3,r2} (same id, same count 3) cancels to identical
    # digests — the common shape when doc_id is a content hash and exact
    # duplicates arrive in pairs. The sum column breaks the cancellation.
    from kafka_connect_ftp_spark.operators.merge import corpus_diff

    old = spark.createDataFrame(
        [(1, "r1"), (1, "r1"), (1, "r2")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "r3"), (1, "r3"), (1, "r2")], "doc_id long, text string"
    )
    assert {r.doc_id: r.status for r in corpus_diff(old, new).collect()} == {1: "changed"}
