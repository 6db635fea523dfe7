"""Independent cross-check of the reusable minhash/LSH API
(operators/text_dedup.py): the banded candidate-pair set and the Jaccard
estimator are recomputed in pure Python from the collected signatures and
must agree exactly — evidence independent of both Spark SQL and the
DuckDB oracle (which share the hash definitions).

Also pins the estimator's endpoints: identical texts estimate 1.0 and are
always candidates; shingle-disjoint texts estimate ~0 and share no band.
"""

from __future__ import annotations

import itertools
import random

import pytest

from kafka_connect_ftp_spark.operators.text_dedup import (
    estimated_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]


def _corpus(seed: int, n_docs: int = 24):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        body = " ".join(rng.choice(WORDS) for _ in range(rng.randint(5, 40)))
        rows.append((i, body))
        if rng.random() < 0.3:  # plant exact and near duplicates
            rows.append((100 + i, body))
        if rng.random() < 0.2:
            rows.append((200 + i, body + " extra tail words"))
    return rows


def _python_band_pairs(sigs: dict[int, tuple], band_size: int) -> set[tuple[int, int]]:
    """Brute-force banded LSH from the signature table itself: docs pair
    iff any band's value-tuple matches (Spark hashes the tuple to a bsig;
    equal tuples give equal bsigs, and xxhash64 collisions at n≈50 docs
    are negligible)."""
    n = len(next(iter(sigs.values())))
    pairs = set()
    for b in range(n // band_size):
        buckets: dict[tuple, list[int]] = {}
        for doc, m in sigs.items():
            buckets.setdefault(m[b * band_size : (b + 1) * band_size], []).append(doc)
        for ids in buckets.values():
            pairs.update(
                (a, c) for a, c in itertools.combinations(sorted(ids), 2)
            )
    return pairs


@pytest.mark.parametrize("seed", [7, 19, 42])
def test_lsh_pairs_match_pure_python_band_grouping(spark, seed):
    df = spark.createDataFrame(_corpus(seed), "doc_id long, text string")
    sig = minhash_signatures(df, "doc_id", "text", n_hashes=16)
    m_cols = [f"m{i}" for i in range(16)]
    sigs = {r.doc_id: tuple(r[c] for c in m_cols) for r in sig.collect()}

    got = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig, band_size=4).collect()}
    assert got == _python_band_pairs(sigs, band_size=4)

    est = estimated_jaccard(sig, lsh_candidate_pairs(sig, band_size=4)).collect()
    for r in est:
        a, b = sigs[r.doc_a], sigs[r.doc_b]
        expect = sum(x == y for x, y in zip(a, b)) / 16
        assert r.est_jaccard == pytest.approx(expect)
        assert 0.0 < r.est_jaccard <= 1.0  # a candidate shares >= 1 band


def test_estimator_endpoints(spark):
    df = spark.createDataFrame(
        [
            (1, "identical body of words repeated here"),
            (2, "identical body of words repeated here"),
            (3, "zz qq xx vv kk jj ww completely different"),
        ],
        "doc_id long, text string",
    )
    sig = minhash_signatures(df, "doc_id", "text", n_hashes=16)
    pairs = lsh_candidate_pairs(sig, band_size=4)
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in estimated_jaccard(sig, pairs).collect()}
    assert est[(1, 2)] == 1.0
    # doc 3 shares no 8-char shingle with 1/2 -> never a candidate
    assert set(est) == {(1, 2)}
