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


def test_arrow_phase1_parity_with_pandas_reference():
    # round 13: phase 1 moved mapInPandas -> mapInArrow. The vectorized
    # pre-aggregation must produce the SAME (gram, count) sets per batch
    # as the pandas coding it replaced — pinned Spark-free over a
    # synthetic batch sequence (the batch boundary is the only thing
    # Spark adds). Survivor sets after eviction may legally differ on
    # count TIES (nsmallest breaks ties by the value_counts iteration
    # order, which neither library specifies), which is why the parity
    # pin is the pre-aggregation, and end-to-end top-k equality against
    # the naive exact plan stays pinned through Spark by
    # test_matches_exact_naive_topk above (phase 2 rescores candidates
    # exactly, so tie-differing survivor sets yield identical output in
    # the no-eviction regime).
    import random

    import pandas as pd
    import pyarrow as pa

    rng = random.Random(13)
    vocab = [f"g{i}" for i in range(500)]
    batches = [
        [rng.choice(vocab) for _ in range(rng.randint(1, 400))] for _ in range(30)
    ]
    for b in batches:
        pandas_items = set(pd.Series(b).value_counts().items())
        vc = pa.array(b, type=pa.string()).value_counts()
        arrow_items = set(
            zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        )
        assert pandas_items == arrow_items
