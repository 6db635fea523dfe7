"""The shared registry plan memo (plans/__init__.py _PLAN_MEMO):
pure queries rebuild once per (session, sf_dir) and return the same
plan object; impure queries (driver actions / persisted intermediates /
side effects) must never be memoized; execution of a memoized plan
still recomputes from the parquet inputs (no InMemoryRelation in the
executed plan)."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.plans import _MEMO_QUERIES, _PLAN_MEMO, registry

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_memoized_query_returns_same_plan_object(spark, reg):
    fn = reg["q1_pricing_summary"].fn
    a = fn(spark, SF)
    b = fn(spark, SF)
    assert a is b


def test_memo_keyed_by_sf_dir(spark, reg):
    fn = reg["dedup_exact"].fn
    a = fn(spark, SF)
    c = fn(spark, SF2)
    assert a is not c
    assert fn(spark, SF) is a  # the SF entry survives the SF2 build


def test_memo_keyed_by_session_identity(spark, reg):
    fn = reg["window_rank_family"].fn
    a = fn(spark, SF)
    # a different session object (newSession shares the context but is a
    # distinct session) must get a fresh plan — plans hold session state
    other = spark.newSession()
    b = fn(other, SF)
    assert a is not b


def test_impure_queries_are_not_memoized(spark, reg):
    # ngram_jaccard_pairs / minhash_lsh_pairs lazily localCheckpoint an
    # intermediate; memoizing them would reuse materialized blocks
    # across invocations (result caching). Guard the EXCLUSION, not
    # just the inclusion.
    for name in ("ngram_jaccard_pairs", "minhash_lsh_pairs"):
        assert name not in _MEMO_QUERIES
        fn = reg[name].fn
        assert not hasattr(fn, "__wrapped__"), name
    # and the side-effecting / driver-action families stay out
    for name in (
        "crawl_corpus_family",
        "dedup_cluster_decision",
        "pq_adc_topk",
        "ann_ivf_family",
        "bpe_train_tokenize",
        "vocab_coverage",
        "streaming_rollup_family",
        "embedding_cosine_topk",
        "embedding_norms",
        "decontamination_flags",
        "quality_model_flags",
    ):
        assert name not in _MEMO_QUERIES, name


def test_memoized_plan_recomputes_from_inputs(spark, reg):
    # the memoized frame must not acquire cached/materialized state: its
    # executed plan reads the parquet scan every time (no
    # InMemoryRelation / LogicalRDD anywhere in the optimized plan)
    df = reg["dedup_exact"].fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in optimized
    assert "LogicalRDD" not in optimized


def test_corpus_report_memoized_and_pure(spark, reg):
    # round 12: corpus_report became a pure plan constructor (overlap
    # pair arithmetic + rates bridge moved in-plan) and joined the memo
    # set. Pin BOTH properties: the memo hit, and that the memoized plan
    # holds no materialized/driver-local state (a LocalRelation would
    # mean data-derived rows were frozen at build time — result caching).
    fn = reg["corpus_report"].fn
    assert "corpus_report" in _MEMO_QUERIES
    a = fn(spark, SF)
    assert fn(spark, SF) is a
    analyzed = a._jdf.queryExecution().analyzed().toString()
    assert "InMemoryRelation" not in analyzed
    assert "LogicalRDD" not in analyzed
    assert "LocalRelation" not in analyzed


@pytest.mark.parametrize(
    "name",
    ["ingest_snapshot_delta", "scalar_funcs", "lineitem_reshape_family"],
)
def test_literal_logicalrdd_queries_memoized_and_pure(spark, reg, name):
    # round 12: these queries joined the memo set. Their analyzed plans
    # DO carry LogicalRDD nodes — but only from createDataFrame over
    # compile-time literal fixtures (empty ingest state / paired-
    # duplicate diff rows / the 4-entry blocklist / the price-band
    # table), never sf-data-derived rows; pin that the memo hit exists
    # and nothing MATERIALIZED (InMemoryRelation) or checkpoint-scanned
    # rides the plan.
    fn = reg[name].fn
    assert name in _MEMO_QUERIES
    a = fn(spark, SF)
    assert fn(spark, SF) is a
    analyzed = a._jdf.queryExecution().analyzed().toString()
    assert "InMemoryRelation" not in analyzed
    assert "Checkpoint" not in analyzed
    # the parquet scan is live lineage (recomputed per execution)
    assert "parquet" in analyzed.lower()


def test_ngram_no_cross_invocation_cache_reuse(spark, reg):
    # round 12: ngram_jaccard_pairs' counts intermediate was .cache()d —
    # CacheManager matches plan-identical frames across invocations
    # (sameResult canonicalization), so invocation 2 silently read
    # invocation 1's materialized counts (its plan carried an
    # InMemoryTableScan): cross-invocation result reuse, the exact
    # thing the memo exclusion exists to prevent. Now a lazy
    # localCheckpoint: fresh RDD per invocation. Pin it: execute one
    # invocation (materializing whatever it materializes), then a
    # second build must be a distinct frame whose plan holds no
    # CacheManager substitution.
    fn = reg["ngram_jaccard_pairs"].fn
    a = fn(spark, SF)
    a.write.format("noop").mode("overwrite").save()
    b = fn(spark, SF)
    assert a is not b
    # optimizedPlan, not analyzed (ADVICE r12): CacheManager substitution
    # happens in QueryExecution.withCachedData, AFTER analysis — an
    # analyzed() assertion can never see InMemoryRelation and guards
    # nothing. optimizedPlan() and executedPlan() are both post-
    # substitution, so either would carry the cache hit.
    for plan in (
        b._jdf.queryExecution().optimizedPlan().toString(),
        b._jdf.queryExecution().executedPlan().toString(),
    ):
        assert "InMemoryRelation" not in plan
        assert "InMemoryTableScan" not in plan


def test_memo_bounded(spark, reg):
    from kafka_connect_ftp_spark.plans import _PLAN_MEMO_MAX

    assert len(_PLAN_MEMO) <= _PLAN_MEMO_MAX


def test_memo_list_matches_registry_names(reg):
    # every memo name must be a live registry entry — a renamed query
    # silently losing its memo would re-pay build cost unnoticed
    assert _MEMO_QUERIES <= set(reg.keys())
