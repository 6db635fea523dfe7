"""Heavy-hitter n-grams (operators/heavy_hitters.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.heavy_hitters import (
    heavy_hitter_ngrams,
    ngram_stream,
)


@pytest.fixture()
def docs(spark):
    boiler = "all rights reserved"
    rows = [(i, f"doc {i} unique words here {boiler}") for i in range(50)]
    rows += [(100 + i, f"totally different text {i}") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_ngram_is_the_planted_boilerplate(docs):
    top = heavy_hitter_ngrams(docs, n=3, top_k=3).collect()
    assert top[0].ngram == "all rights reserved"
    assert top[0]["count"] == 50  # EXACT corpus count, not a sketch estimate


def test_matches_exact_naive_topk(spark, docs):
    # with a generous candidate cap the two-phase result equals the
    # exact naive groupBy-count top-k
    naive = (
        ngram_stream(docs, 2)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "ngram")
        .limit(10)
        .collect()
    )
    got = heavy_hitter_ngrams(docs, n=2, top_k=10).collect()
    assert [(r.ngram, r["count"]) for r in got] == [(r.ngram, r["count"]) for r in naive]


def test_short_docs_emit_no_ngrams(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "")], "doc_id long, text string")
    assert ngram_stream(df, 3).count() == 0  # shorter than n — no phantom rows


def test_validation(docs):
    with pytest.raises(ValueError, match="top_k"):
        heavy_hitter_ngrams(docs, top_k=0)
    with pytest.raises(ValueError, match="candidates_per_partition"):
        heavy_hitter_ngrams(docs, top_k=50, candidates_per_partition=10)
    with pytest.raises(ValueError, match="n must"):
        ngram_stream(docs, 0)
