"""Connected-components dedup clustering tests.

Every semantic case runs BOTH paths: the driver union-find (default for
bounded edge sets) and the distributed pointer-jumping loop (forced via
driver_threshold=0) — the two must be label-identical.
"""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.operators.dedup_cluster import (
    connected_components,
    dedup_decision,
)

BOTH_PATHS = pytest.mark.parametrize(
    "threshold", [1_000_000, 0], ids=["driver_union_find", "distributed_loop"]
)


@BOTH_PATHS
def test_chain_and_triangle_merge(spark, threshold):
    # chain 1-2-3-4 and triangle 10-11-12 plus isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comps = {
        r.doc_id: r.cluster
        for r in connected_components(pairs, driver_threshold=threshold).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_decision_keeps_min_and_singletons(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "doc_a long, doc_b long")
    corpus = spark.createDataFrame([(i,) for i in [1, 5, 7, 9]], "doc_id long")
    rows = {r.doc_id: (r.cluster, r.keep) for r in dedup_decision(pairs, corpus).collect()}
    assert rows == {1: (1, True), 5: (5, True), 7: (5, False), 9: (5, False)}


def test_paths_agree_on_long_chain(spark):
    # a 300-node chain: the shape that forced pointer jumping — both
    # paths must produce the identical min-label clustering
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a long, doc_b long"
    )
    fast = {
        r.doc_id: r.cluster for r in connected_components(pairs).collect()
    }
    slow = {
        r.doc_id: r.cluster
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == slow
    assert set(fast.values()) == {0}


@BOTH_PATHS
def test_string_doc_ids(spark, threshold):
    # content-hash ids are strings; both paths must handle any orderable
    # id type (the union-find compares with Python <, which orders UTF-8
    # strings identically to Spark's comparator)
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    comps = {
        r.doc_id: r.cluster
        for r in connected_components(pairs, driver_threshold=threshold).collect()
    }
    assert comps == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_pair_set(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_on_real_minhash_pairs(spark):
    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    pairs = registry()["minhash_lsh_pairs"].fn(spark, sf)
    docs = load_tables(spark, sf, "documents")["documents"].select("doc_id")
    decision = dedup_decision(pairs, docs)
    n_docs = docs.count()
    assert decision.count() == n_docs
    kept = decision.filter("keep").count()
    assert 0 < kept <= n_docs
    # every cluster representative is kept, and is its own minimum
    bad = decision.filter("cluster > doc_id").count()
    assert bad == 0
