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


# --------------------------------------------------- bigram Stupid Backoff


def test_stupid_backoff_hand_computed_against_reference_model(spark):
    from kafka_connect_ftp_spark.operators.lm_score import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    ref = _docs(spark, [(1, "a b a"), (2, "a c")])
    model = train_stupid_backoff(ref)
    # counts: uni a=3,b=1,c=1 (total 5, vocab 3); bigrams (a,b),(b,a),(a,c)
    assert {(r.w1, r.w2): r.nb for r in model.bigrams.collect()} == {
        ("a", "b"): 1,
        ("b", "a"): 1,
        ("a", "c"): 1,
    }
    scored = _docs(spark, [(10, "a b a c d"), (11, "a"), (12, "")])
    out = {r.doc_id: r for r in stupid_backoff_scores(scored, model).collect()}
    denom = 5 + ALPHA * 4
    expect_10 = (
        math.log((3 + ALPHA) / denom)  # first token 'a': unigram floor
        + math.log(1 / 3)  # (a,b) seen: nb=1 / n_a=3
        + math.log(1 / 1)  # (b,a) seen
        + math.log(1 / 3)  # (a,c) seen
        + (math.log(0.4) + math.log((0 + ALPHA) / denom))  # (c,d): backoff, d OOV
    ) / 5
    assert out[10].sb_n_tokens == 5 and out[10].sb_backoff_n == 1
    assert out[10].sb_logscore == pytest.approx(expect_10)
    assert out[10].sb_ppl == pytest.approx(math.exp(-out[10].sb_logscore))
    # single-token doc: unigram term only, no bigram positions
    assert out[11].sb_n_tokens == 1 and out[11].sb_backoff_n == 0
    assert out[11].sb_logscore == pytest.approx(math.log((3 + ALPHA) / denom))
    # token-less doc survives with a NULL score (the unigram convention)
    assert out[12].sb_n_tokens == 0 and out[12].sb_logscore is None


def test_stupid_backoff_self_scoring_never_backs_off(spark):
    from kafka_connect_ftp_spark.operators.lm_score import stupid_backoff_scores

    docs = _docs(spark, [(1, "x y x z"), (2, "y z y"), (3, "x")])
    out = stupid_backoff_scores(docs).collect()
    # every bigram in the corpus is in the self-trained table by definition
    assert {r.sb_backoff_n for r in out} == {0}
    assert {r.doc_id: r.sb_n_tokens for r in out} == {1: 4, 2: 3, 3: 1}


def test_stupid_backoff_prefers_fluent_order(spark):
    from kafka_connect_ftp_spark.operators.lm_score import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    ref = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
    model = train_stupid_backoff(ref)
    scored = _docs(spark, [(100, "the cat sat"), (101, "sat the mat cat")])
    out = {r.doc_id: r for r in stupid_backoff_scores(scored, model).collect()}
    # in-order trigram beats scrambled words: scrambled pairs back off
    assert out[100].sb_logscore > out[101].sb_logscore
    assert out[100].sb_backoff_n == 0 and out[101].sb_backoff_n > 0


def test_stupid_backoff_null_text_scores_like_empty(spark):
    from kafka_connect_ftp_spark.operators.lm_score import (
        stupid_backoff_scores,
        train_stupid_backoff,
    )

    model = train_stupid_backoff(_docs(spark, [(1, "a b")]))
    out = {
        r.doc_id: r
        for r in stupid_backoff_scores(
            _docs(spark, [(10, None), (11, "a b")]), model
        ).collect()
    }
    # NULL text == empty text: no phantom (NULL, NULL) OOV position
    # (size(NULL array) is -1, which a `= 0` guard would miss)
    assert out[10].sb_n_tokens == 0 and out[10].sb_logscore is None
    assert out[11].sb_n_tokens == 2
