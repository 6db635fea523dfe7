"""Reusable dedup API tests: known near-duplicates must surface as LSH
candidates with high estimated Jaccard; unrelated docs must not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.text_dedup import (
    estimated_jaccard,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE + " extra"),          # near-dup of 0
        (2, BASE.replace("quick", "quack")),  # near-dup of 0
        (3, "completely different content about spark dataframes and shuffles everywhere"),
        (4, "another unrelated text concerning parquet files and column pruning today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dups_found_unrelated_not(docs):
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=16)
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig, band_size=4).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert (3, 4) not in pairs


def test_estimated_jaccard_ranks_similarity(docs):
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=64)
    pairs = docs.select(F.lit(0).alias("doc_a"), F.lit(1).alias("doc_b")).limit(1).unionAll(
        docs.select(F.lit(0).alias("doc_a"), F.lit(3).alias("doc_b")).limit(1)
    )
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in estimated_jaccard(sig, pairs).collect()}
    assert est[(0, 1)] > 0.5 > est[(0, 3)]


def test_md5_hash_fn_variant(docs):
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=8, hash_fn="md5")
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig, band_size=2).collect()}
    assert (0, 1) in pairs


def test_exact_dedup_groups_copies(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 5), (3, "b", 5)], "id long, s string, n long"
    )
    rows = {r.keeper: r.n_copies for r in exact_dedup(df, "id", ["s", "n"]).collect()}
    assert rows == {1: 2, 3: 1}


def test_exact_dedup_null_position_significant(spark):
    # Spark's hash functions skip NULL args, so ('x', NULL) and (NULL, 'x')
    # would otherwise hash identically and collapse distinct rows
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "x", None)],
        "id long, a string, b string",
    )
    rows = {r.keeper: r.n_copies for r in exact_dedup(df, "id", ["a", "b"]).collect()}
    assert rows == {1: 2, 2: 1}  # 1&3 identical; 2 is NOT their duplicate


def test_hot_bucket_tiling_exact_and_bounded(spark):
    """A mass-duplicated text (one hot LSH bucket) tiled under a tiny cap
    must yield exactly the uncapped pair set, and no tile may hold more
    than two cap-sized chunks."""
    from kafka_connect_ftp_spark.operators.text_dedup import (
        minhash_signatures,
        tiled_bucket_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "the exact same boilerplate text every time") for i in range(40)]
        + [(100 + i, f"unique text number {i} with its own words") for i in range(5)],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, band_size=4, bucket_cap=8).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, band_size=4, bucket_cap=1_000_000).collect()
    }
    assert capped == uncapped
    assert len(capped) >= 40 * 39 // 2  # the hot clique is fully present

    # direct tile bound: 40 members, cap 8 -> 5 chunks of ~8; every tile
    # materializes at most 2 chunks
    members = docs.select(F.lit(0).alias("b"), "doc_id")
    pairs = tiled_bucket_pairs(members, ["b"], bucket_cap=8)
    assert pairs.count() == 45 * 44 // 2


def test_band_size_must_divide(docs):
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=16)
    with pytest.raises(ValueError):
        lsh_candidate_pairs(sig, band_size=5)
