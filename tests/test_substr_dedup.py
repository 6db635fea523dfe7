"""Duplicated-substring masking (operators/substr_dedup.py) vs an
independent pure-Python ExactSubstr reference: identical masks on a
randomized corpus with planted duplicated spans, hand-checked edges,
and a hot-gram scale smoke."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.substr_dedup import mask_duplicated_substrings


def _py_reference(texts: dict[int, str], l: int) -> dict[int, tuple[int, int, str]]:
    """Independent recomputation: count L-grams corpus-wide, mask every
    position covered by a duplicated gram occurrence."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in texts.items()}
    from collections import Counter

    counts: Counter = Counter()
    for tk in toks.values():
        for i in range(len(tk) - l + 1):
            counts[" ".join(tk[i : i + l])] += 1
    out = {}
    for d, tk in toks.items():
        masked: set[int] = set()
        for i in range(len(tk) - l + 1):
            if counts[" ".join(tk[i : i + l])] >= 2:
                masked.update(range(i, i + l))
        kept = " ".join(w for j, w in enumerate(tk) if j not in masked)
        out[d] = (len(tk), len(masked), kept)
    return out


def _run(spark, texts, l):
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_masked, r.kept_text)
        for r in mask_duplicated_substrings(df, l=l).collect()
    }


def test_matches_python_reference_on_planted_corpus(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(200)]
    boiler = " ".join(rng.choices(vocab, k=14))  # a 14-token shared span
    texts = {}
    for d in range(30):
        body = rng.choices(vocab, k=rng.randint(5, 40))
        if d % 3 == 0:  # every third doc carries the boilerplate
            at = rng.randint(0, len(body))
            body = body[:at] + boiler.split(" ") + body[at:]
        texts[d] = " ".join(body)
    for l in (5, 10):
        assert _run(spark, texts, l) == _py_reference(texts, l), f"l={l}"


def test_hand_checked_edges(spark):
    texts = {
        1: "a b c d e unique tail one",
        2: "a b c d e other tail two",  # shares the 5-gram "a b c d e"
        3: "short doc",  # < l tokens: never masked
        4: "x x x x x x x x x x",  # self-repeated gram IS duplicated
    }
    got = _run(spark, texts, 5)
    assert got[1] == (8, 5, "unique tail one")
    assert got[2] == (8, 5, "other tail two")
    assert got[3] == (2, 0, "short doc")
    # doc 4: "x x x x x" occurs 6 times within the doc -> all masked
    assert got[4] == (10, 10, "")


def test_no_duplicates_means_no_masking(spark):
    texts = {i: " ".join(f"d{i}t{j}" for j in range(20)) for i in range(5)}
    got = _run(spark, texts, 5)
    for d, t in texts.items():
        assert got[d] == (20, 0, t)


def test_hot_gram_scale_smoke(spark):
    # one boilerplate 10-gram shared by 20k docs: the gram count is a
    # hot key (map-side combined) and the mask explode is bounded by
    # L x occurrences — must complete and mask exactly the span
    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the shared legal disclaimer text spans exactly ten tokens here "),
            F.lit("unique"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = mask_duplicated_substrings(docs, l=10)
    agg = out.agg(
        F.sum("n_masked").alias("m"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert agg.n == n and agg.m == 10 * n
    one = out.filter("doc_id = 7").collect()[0]
    assert one.kept_text == "unique7"


def test_null_text_yields_empty_not_negative(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id bigint, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.n_masked, r.kept_text) for r in
           mask_duplicated_substrings(df, l=5).collect()}
    assert got[1] == (0, 0, "")
    assert got[2] == (2, 0, "a b")


def test_null_id_fails_loudly(spark):
    # review finding: a NULL id's grams would count into dup_grams but
    # never match the mask join back — the doc would return UNMASKED
    df = spark.createDataFrame(
        [(None, "a b c d e f"), (2, "a b c d e f")],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        mask_duplicated_substrings(df, l=5).collect()


def test_property_matches_reference_on_random_corpora(spark):
    # hypothesis cross-check against the independent pure-Python twin:
    # a tiny vocabulary makes duplicated grams actually occur
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "bb", "ccc", "d"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=6)

    @settings(max_examples=prop_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(corpus=corpus, l=st.integers(min_value=1, max_value=4))
    def check(corpus, l):
        texts = dict(enumerate(corpus))
        assert _run(spark, texts, l) == _py_reference(texts, l)

    check()
