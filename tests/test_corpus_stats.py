"""Corpus composition report (operators/corpus_stats.py)."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.operators.corpus_stats import corpus_stats


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "one two three", "web"),
        (2, "one two three", "web"),      # exact duplicate inside web
        (3, "four five", "web"),
        (4, "six seven eight nine ten", "code"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_groups_plus_rollup_row(docs):
    out = {r.source: r for r in corpus_stats(docs).collect()}
    assert set(out) == {"web", "code", "__all__"}
    assert out["web"].n_docs == 3 and out["code"].n_docs == 1
    assert out["__all__"].n_docs == 4
    assert out["__all__"].n_tokens == 3 + 3 + 2 + 5


def test_dup_ratio_and_share(docs):
    out = {r.source: r for r in corpus_stats(docs).collect()}
    # web: 3 docs, 2 distinct texts -> 1/3 duplicated mass
    assert out["web"].dup_ratio == round(1 - 2 / 3, 4)
    assert out["code"].dup_ratio == 0.0
    assert out["__all__"].share == 1.0
    assert 0 < out["code"].share < out["web"].share


def test_quantiles_are_token_lengths(docs):
    out = {r.source: r for r in corpus_stats(docs).collect()}
    assert out["code"].len_p50 == 5
    assert out["web"].len_p50 in (2, 3)  # approx_percentile on {3,3,2}


def test_group_named_all_does_not_corrupt_share(spark):
    # the rollup row is identified by grouping(), not a sentinel compare,
    # so a user group literally called "__all__" cannot hijack the
    # share denominator
    df = spark.createDataFrame(
        [(1, "a b", "__all__"), (2, "c d e f", "web")],
        "doc_id long, text string, source string",
    )
    rows = corpus_stats(df).collect()
    totals = [r for r in rows if r.source == "__all__" and r.share == 1.0]
    assert len(totals) == 1 and totals[0].n_docs == 2  # the true rollup
    web = next(r for r in rows if r.source == "web")
    assert 0 < web.share < 1


def test_approx_distinct_dup_ratio_close_to_exact(docs):
    from kafka_connect_ftp_spark.operators.corpus_stats import corpus_stats

    exact = {r[0]: r.dup_ratio for r in corpus_stats(docs).collect()}
    approx = {r[0]: r.dup_ratio for r in corpus_stats(docs, approx_distinct=True).collect()}
    assert exact.keys() == approx.keys()
    # HLL++ default rsd ~2%; at test cardinalities the ratio must land
    # within a loose band of the exact value
    for k, v in exact.items():
        assert abs(approx[k] - v) < 0.1, (k, approx[k], v)


def test_null_group_bucketed(spark):
    df = spark.createDataFrame(
        [(1, "a b", None), (2, "c d", "web")], "doc_id long, text string, source string"
    )
    out = {r.source for r in corpus_stats(df).collect()}
    assert out == {"__null__", "web", "__all__"}
