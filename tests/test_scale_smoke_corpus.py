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


def test_kmv_hot_group_smoke(spark):
    """500k docs in one group but only 200 distinct texts: the
    partition-local dedup + k-min must collapse the duplication BEFORE
    any exchange (the shuffle carries at most groups x k rows per
    partition), and the full-set regime estimates stay exact."""
    from kafka_connect_ftp_spark.operators.overlap import corpus_overlap

    n, distinct = 500_000, 200
    docs = spark.range(n).select(
        F.when(F.col("id") < n // 2, "hot").otherwise("cold").alias("source"),
        F.concat(F.lit("text-"), (F.col("id") % distinct).cast("string")).alias(
            "text"
        ),
    )
    [row] = corpus_overlap(docs, "source", k=1024).collect()
    # both halves see all 200 distinct texts -> identical sets
    assert row.est_distinct_a == distinct and row.est_distinct_b == distinct
    assert row.est_jaccard == 1.0
    assert row.est_common == distinct


def test_sharded_bloom_scales_to_100k_keys(spark):
    """Sibling of test_bloom.py::test_build_scales_to_100k_keys for the
    sharded layout: one distributed pass builds all shards, columnar
    staging scatters them, and membership stays false-negative-free."""
    from kafka_connect_ftp_spark.operators.bloom import (
        bloom_build_sharded,
        bloom_might_contain_sharded,
        optimal_num_bits,
        optimal_num_hashes,
    )

    n, shards = 100_000, 8
    m = optimal_num_bits(n, 0.01)
    m = ((m + 64 * shards - 1) // (64 * shards)) * 64 * shards
    k = optimal_num_hashes(n, m)
    keys = spark.range(n).select(F.concat(F.lit("s-"), F.col("id")).alias("k"))
    sk = bloom_build_sharded(keys, "k", num_bits=m, num_hashes=k, n_shards=shards)
    sample = keys.sample(0.01, seed=7)
    flagged = bloom_might_contain_sharded(
        sample, "k", sk, num_bits=m, num_hashes=k, n_shards=shards
    )
    assert flagged.filter(~F.col("might_contain")).count() == 0


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


def test_repetition_hot_document_smoke(spark):
    """One pathological 100k-token document next to normal ones: the
    gram stream for that doc is ~500k rows, but every aggregation keys
    on doc_id so the hot doc's work collapses map-side and the profile
    still comes back with exact fractions (the doc is 'a b' repeated, so
    its duplicate fractions are known in closed form)."""
    from kafka_connect_ftp_spark.operators.repetition import repetition_signals

    big = " ".join(["a", "b"] * 50_000)
    docs = spark.createDataFrame(
        [(0, big), (1, "c d e f g h"), (2, "x y x y")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.asDict()
        for r in repetition_signals(docs, top_ns=(2,), dup_ns=(5,)).collect()
    }
    r = got[0]
    assert r["n_tokens"] == 100_000
    # 100k tokens, 2 distinct -> (100000-2)/100000
    assert abs(r["dup_token_frac"] - 0.99998) < 1e-6
    # 5-grams: 99996 occurrences, 2 distinct patterns -> ~all duplicates
    assert r["dup_5gram_frac"] > 0.9999
    # top 2-gram "a b" covers half the bigram slots: count 50000, len 3,
    # chars = 199999 -> 150000/199999
    assert abs(r["top_2gram_frac"] - 150000 / 199999) < 1e-5
    assert got[1]["dup_5gram_frac"] == 0.0


def test_dsir_hot_bucket_smoke(spark):
    """100k documents whose grams all collapse into a handful of hot
    buckets (tiny B, shared vocabulary): the count aggregations must
    stay bounded by B — hot buckets combine map-side — and scoring is
    a broadcast join, so the pipeline survives pathological collision
    rates (collisions are part of the DSIR method, not an error)."""
    from kafka_connect_ftp_spark.operators.dsir import (
        dsir_logratio,
        dsir_scores,
        dsir_select,
    )

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta token"),
            (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    target = docs.filter(F.col("doc_id") % 10 == 0)
    table = dsir_logratio(target, docs, n_buckets=16).localCheckpoint(eager=False)
    assert table.count() == 16
    out = dsir_select(dsir_scores(docs, table, n_buckets=16), 1000)
    kept = out.filter("dsir_keep").count()
    assert kept == 1000
    assert out.count() == n


def test_dsir_fraction_regime_smoke(spark):
    """100k docs, select 80% via the threshold path (VERDICT r7 #1 —
    DSIR's canonical fraction regime): exact count, and the plan never
    funnels n=80k through TakeOrdered or broadcasts 80k ids — only the
    bounded boundary correction may appear."""
    import re

    from kafka_connect_ftp_spark.operators.dsir import (
        dsir_logratio,
        dsir_scores,
        dsir_select,
    )

    n_docs = 100_000
    n = 80_000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta token"),
            (F.col("id") % 37).cast("string"),
        ).alias("text"),
    )
    target = docs.filter(F.col("doc_id") % 10 == 0)
    table = dsir_logratio(target, docs, n_buckets=16).localCheckpoint(eager=False)
    # auto would route n=80k to topk (under the default topk_max=100k);
    # force the fraction path — the regime under test
    out = dsir_select(dsir_scores(docs, table, n_buckets=16), n, mode="threshold")
    assert out.filter("dsir_keep").count() == n
    plan = out._jdf.queryExecution().executedPlan().toString()
    limits = [int(m) for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)]
    assert all(lim <= n_docs // 50 for lim in limits), limits


def test_curation_stream_hot_band_smoke(spark, tmp_path):
    """50k docs through the composed curation step with a HOT BAND — an
    identical-text clique spanning batches (VERDICT r7 #5). The scale
    property: cross-batch collisions are dropped by a band-key semi-join
    BEFORE any pair generation (25k re-deliveries of one admitted doc
    never build a 25k-clique), state grows only with ADMITTED docs
    (bounded: n_bands x admitted), and a replay of the hot batch is
    byte-identical at this scale."""
    import glob
    import hashlib

    from kafka_connect_ftp_spark.operators.quality_model import (
        train_quality_classifier,
    )
    from kafka_connect_ftp_spark.streaming.curation_stream import make_curation_step

    schema = "doc_id long, text string"
    # distinct shingle-diverse texts as a pure SQL projection —
    # deterministic across recomputations (no Python, no RNG)
    _TEXT = (
        "concat_ws(' ', md5(cast(id AS string)),"
        " md5(cast(id + 1000000 AS string)),"
        " md5(cast(id + 2000000 AS string)),"
        " md5(cast(id + 3000000 AS string)))"
    )
    hot = "the one hot document every mirror re-serves verbatim forever and ever"
    pos = spark.createDataFrame(
        [(i, f"good tidy prose sample number {i} reads well") for i in range(40)],
        schema,
    )
    neg = spark.createDataFrame(
        [(1000 + i, "zzz qqq xxx " * 8) for i in range(40)], schema
    )
    model = train_quality_classifier(pos, neg, n_features=1 << 12, max_iter=10)

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    step = make_curation_step(spark, model, out, state)

    # batch 0: the hot doc + 25k distinct docs
    b0 = spark.range(25_000).selectExpr(
        "id AS doc_id", f"{_TEXT} AS text"
    ).unionByName(spark.createDataFrame([(99_999, hot)], schema))
    step(b0, 0)
    n_state0 = spark.read.parquet(state).count()
    # every batch-0 doc is distinct -> all near-dup-admitted; state is
    # bounded by n_bands(=4) x admitted and is non-trivial
    assert 25_001 <= n_state0 <= 4 * 25_001

    # batch 1: 25k re-deliveries/near-dups of the hot doc (the hot band)
    # + one genuinely new doc
    b1 = spark.range(25_000).selectExpr(
        "id + 200000 AS doc_id",
        f"'{hot}' AS text",
    ).unionByName(
        spark.createDataFrame(
            [(500_000, "a genuinely new document about arctic tern migration")],
            schema,
        )
    )
    step(b1, 1)
    got1 = spark.read.parquet(f"{out}/epoch=1")
    # every hot re-delivery dropped by the cross-batch semi-join; state
    # grew by the ONE admitted doc's bands only
    assert {r.doc_id for r in got1.select("doc_id").collect()} <= {500_000}
    n_state1 = spark.read.parquet(state).count()
    assert n_state1 - n_state0 <= 4

    def fingerprint():
        files = sorted(
            p for p in glob.glob(f"{out}/epoch=1/*") + glob.glob(f"{state}/epoch=1/*")
            if not p.endswith("_SUCCESS") and "/_" not in p.rsplit("/", 1)[-1]
        )
        h = hashlib.sha256()
        for p in files:
            with open(p, "rb") as fh:
                h.update(fh.read())
        return h.hexdigest()

    before = fingerprint()
    step(b1, 1)  # crash replay of the hot batch
    assert fingerprint() == before


def test_url_dedup_hot_url_smoke(spark):
    """60k captures of ONE canonical URL (tracking params vary): the
    min_by keeper aggregation combines map-side, so a hot URL cannot
    funnel 60k rows into one reducer's buffer the way a row_number
    window would. Exactly one representative survives."""
    from kafka_connect_ftp_spark.operators.url_norm import dedup_by_url

    n = 60_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://hot.example/page?utm_source=s"),
            F.col("id").cast("string"),
        ).alias("url"),
    ).unionByName(
        spark.range(100).select(
            (F.col("id") + n).alias("doc_id"),
            F.concat(F.lit("http://cold.example/p"), F.col("id").cast("string")).alias("url"),
        )
    )
    out = dedup_by_url(df)
    assert out.count() == 101  # 1 hot representative + 100 cold
    hot = out.filter("url_norm = 'http://hot.example/page'").collect()
    assert len(hot) == 1 and hot[0].doc_id == 0


def test_bm25_rrf_volume_smoke(spark):
    """100k synthetic docs through bm25_scores + a 2-system rrf_fuse:
    the corpus-stats aggregate and map-side scoring must hold at volume
    (nothing corpus-proportional reaches the driver — the only collect
    is the fused shortlist union, <= 2*top rows), and the fused winner
    must be the doc constructed to dominate both systems."""
    from kafka_connect_ftp_spark.operators.bm25 import bm25_scores, rrf_fuse

    n = 100_000
    # doc 0 is query-term dense and short; everything else mentions one
    # query term inside long filler, so doc 0 tops bm25 decisively
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") == 0, F.lit("join filter join scan join filter")
        )
        .otherwise(
            F.concat(
                F.lit("filler words without signal repeated over and over "),
                F.lit("more filler padding text here again and again join "),
                F.col("id").cast("string"),
            )
        )
        .alias("text"),
    )
    lex = bm25_scores(docs, ("join", "filter", "scan")).withColumnRenamed(
        "bm25", "score"
    )
    # second system: a deterministic pseudo-score that also ranks doc 0
    # first (hash-derived for everyone else)
    dense = docs.select(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit(2.0))
        .otherwise((F.xxhash64("doc_id") % 1000).cast("double") / 1000.0)
        .alias("score"),
    )
    fused = rrf_fuse([("lex", lex), ("dense", dense)], k=60, top=10).collect()
    assert len(fused) <= 20
    best = max(fused, key=lambda r: r.rrf)
    assert best.doc_id == 0 and best.lex_rank == 1 and best.dense_rank == 1
    assert best.rrf == 2 / 61
