"""Hot-key scale smokes for the corpus operators: the skew designs must
actually absorb a pathologically repeated key, not just pass unit tests.
(Sibling of test_neardup.py::test_scale_smoke_one_hot_block.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.span_dedup import dedup_spans
from kafka_connect_ftp_spark.operators.text_dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)


def test_span_dedup_hot_span_smoke(spark):
    """50k documents all sharing one boilerplate paragraph: the shared
    span's hash is a 50k-row hot key. The min-struct aggregation combines
    it map-side (a row_number window would buffer all 50k in one reducer
    partition); exactly one copy survives, every unique span is kept."""
    n = 50_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the shared boilerplate navigation bar\n\nunique content "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = dedup_spans(docs, "paragraph")
    agg = out.agg(
        F.sum("n_dropped").alias("dropped"), F.sum("n_spans").alias("spans")
    ).collect()[0]
    assert agg.spans == 2 * n
    assert agg.dropped == n - 1  # every later copy of the hot span
    # doc 0 keeps both paragraphs; every other doc keeps only its unique one
    first = out.filter("doc_id = 0").collect()[0]
    assert first.n_dropped == 0 and "boilerplate" in first.text
    later = out.filter("doc_id = 1").collect()[0]
    assert later.n_dropped == 1 and "boilerplate" not in later.text


def test_lsh_hot_bucket_smoke(spark):
    """A 2000-document identical-text clique lands in one LSH bucket per
    band; under bucket_cap=256 the tiler must still emit the exact
    2000*1999/2 pair clique without any single-task O(n²) expansion."""
    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same boilerplate body every single time").alias("text"),
    )
    sig = minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    pairs = lsh_candidate_pairs(sig, band_size=4, bucket_cap=256)
    assert pairs.count() == n * (n - 1) // 2
