"""Unigram-LM quality scoring (operators/lm_score.py): hand-computed
probabilities on a tiny corpus, self-scoring vs reference-corpus scoring,
and OOV handling."""

from __future__ import annotations

import math

import pytest

from kafka_connect_ftp_spark.operators.lm_score import train_unigram_lm, unigram_scores

ALPHA = 0.5


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_unigram_lm_counts_and_smoothing(spark):
    docs = _docs(spark, [(1, "a a b"), (2, "a c")])
    lm = {r.token: r for r in train_unigram_lm(docs, alpha=ALPHA).collect()}
    # corpus: a=3, b=1, c=1; total=5, vocab=3
    assert {t: r.n for t, r in lm.items()} == {"a": 3, "b": 1, "c": 1}
    denom = 5 + ALPHA * 4
    assert lm["a"].log_prob == pytest.approx(math.log((3 + ALPHA) / denom))
    assert lm["b"].log_prob == pytest.approx(math.log((1 + ALPHA) / denom))
    assert lm["a"].log_prob_oov == pytest.approx(math.log(ALPHA / denom))


def test_self_scored_corpus_ranks_common_words_higher(spark):
    docs = _docs(
        spark,
        [(1, "the the the the cat"), (2, "zyx qwv"), (3, "the cat"), (4, "")],
    )
    out = {r.doc_id: r for r in unigram_scores(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    # common-word docs beat rare-word docs; perplexity = exp(-avg)
    assert out[1].avg_logprob > out[2].avg_logprob
    assert out[3].perplexity == pytest.approx(math.exp(-out[3].avg_logprob))
    # empty doc: present, zero tokens, NULL score
    assert out[4].n_tokens == 0 and out[4].avg_logprob is None

    # hand-check doc 3: corpus a: the=5, cat=2, zyx=1, qwv=1 -> total 9, vocab 4
    denom = 9 + ALPHA * 5
    expect = (math.log((5 + ALPHA) / denom) + math.log((2 + ALPHA) / denom)) / 2
    assert out[3].avg_logprob == pytest.approx(expect)


def test_scoring_against_reference_lm_uses_oov_probability(spark):
    ref = _docs(spark, [(1, "good text good text")])
    lm = train_unigram_lm(ref, alpha=ALPHA)
    target = _docs(spark, [(10, "good novel")])
    out = unigram_scores(target, lm).collect()[0]
    # ref: good=2, text=2; total=4, vocab=2; novel is OOV
    denom = 4 + ALPHA * 3
    expect = (math.log((2 + ALPHA) / denom) + math.log(ALPHA / denom)) / 2
    assert out.avg_logprob == pytest.approx(expect)
    assert out.n_tokens == 2
