"""BM25 + RRF (operators/bm25.py): exactness vs a pure-Python
reference of the Lucene-parameterized Okapi formula, shortlist fusion
semantics, determinism across partitionings, plan shape (map-side
scoring, broadcast stats, bounded windows)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.bm25 import bm25_scores, rrf_fuse

_DOCS = [
    (1, "join join filter window scan data table row"),
    (2, "filter filter filter value small batch"),
    (3, "scan scan scan scan join"),
    (4, ""),                      # empty -> dl 0, score 0
    (5, None),                    # NULL text profiles as empty
    (6, "window window window join filter scan scan"),
    (7, "the quick brown fox jumps over the lazy dog"),  # no query terms
]
_TERMS = ("join", "filter", "scan")
_K1, _B = 1.2, 0.75


def _py_bm25(texts, terms, k1=_K1, b=_B):
    toks = {i: [w for w in (t or "").lower().split(" ") if w] for i, t in texts}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        out[i] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string").cache()


def test_bm25_matches_pure_python(spark, docs):
    ref = _py_bm25(_DOCS, _TERMS)
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, _TERMS).collect()}
    assert set(got) == set(ref)
    for i in ref:
        assert got[i] == pytest.approx(ref[i], abs=1e-12), i
    # zero-hit and empty/null docs score exactly 0
    assert got[4] == 0.0 and got[5] == 0.0 and got[7] == 0.0
    # determinism across partition layouts
    got7 = {r.doc_id: r.bm25 for r in bm25_scores(docs.repartition(5), _TERMS).collect()}
    assert got7 == got


def test_bm25_contracts(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, ())
    with pytest.raises(ValueError, match="distinct"):
        bm25_scores(docs, ("join", "join"))
    with pytest.raises(ValueError, match="quotes"):
        bm25_scores(docs, ("it's",))
    with pytest.raises(ValueError, match="k1"):
        bm25_scores(docs, _TERMS, k1=0)
    with pytest.raises(ValueError, match="collide"):
        bm25_scores(docs.withColumnRenamed("doc_id", "_dl"), _TERMS, id_col="_dl")


def test_bm25_plan_is_map_side_with_broadcast_stats(spark, docs, tmp_path):
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    plan = (
        bm25_scores(spark.read.parquet(path), _TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row stats frame
    assert "SortMergeJoin" not in plan


def test_rrf_fuse_matches_hand_computation(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, 8.0), (3, 6.0), (4, 4.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7), (6, 0.6)], "doc_id long, score double"
    )
    out = {
        r.doc_id: (r.a_rank, r.b_rank, r.rrf)
        for r in rrf_fuse([("a", a), ("b", b)], k=60, top=3).collect()
    }
    # shortlists: a -> 1,2,3 ; b -> 3,5,1. Union = {1,2,3,5}; 4 and 6
    # are outside every top-3 and absent
    assert set(out) == {1, 2, 3, 5}
    assert out[1] == (1, 3, pytest.approx(1 / 61 + 1 / 63))
    assert out[2] == (2, None, pytest.approx(1 / 62))
    assert out[3] == (3, 1, pytest.approx(1 / 63 + 1 / 61))
    assert out[5] == (None, 2, pytest.approx(1 / 62))


def test_rrf_tie_breaks_on_id(spark):
    a = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 1.0)], "doc_id long, score double"
    )
    out = {r.doc_id: r.a_rank for r in rrf_fuse([("a", a)], top=2).collect()}
    assert out == {3: 1, 5: 2}  # equal scores rank by id asc; 7 cut


def test_rrf_contracts(spark):
    a = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="distinct"):
        rrf_fuse([("a", a), ("a", a)])
    with pytest.raises(ValueError, match="top"):
        rrf_fuse([("a", a)], top=0)


def test_bm25_property_matches_python(spark):
    # property check: random corpora and query subsets through the
    # operator equal the pure-Python Okapi reference
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["join", "scan", "filter", "row", "batch", "merge", "x"]

    @settings(
        max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(
        st.lists(
            st.lists(st.sampled_from(vocab), max_size=12).map(" ".join),
            min_size=1,
            max_size=8,
        ),
        st.sets(st.sampled_from(vocab[:4]), min_size=1, max_size=3),
    )
    def check(texts, terms):
        terms = tuple(sorted(terms))
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ref = _py_bm25(rows, terms)
        got = {r.doc_id: r.bm25 for r in bm25_scores(docs, terms).collect()}
        assert set(got) == set(ref)
        for i in ref:
            assert got[i] == pytest.approx(ref[i], abs=1e-12), (texts, terms, i)

    check()
