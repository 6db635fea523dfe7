"""Deterministic split operator: proportions, stability under corpus
growth (the property rand() lacks), stratum uniformity, plan purity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.splits import assign_splits

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")


def test_every_row_assigned_and_proportions_close(docs):
    out = assign_splits(docs, WEIGHTS)
    n = docs.count()
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) <= set(WEIGHTS) and sum(counts.values()) == n
    assert counts["train"] / n == pytest.approx(0.8, abs=0.08)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.06)


def test_assignment_stable_under_corpus_growth(docs):
    # the defining property: adding documents never moves existing ones
    subset = docs.filter("doc_id % 3 = 0")
    full = {r.doc_id: r.split for r in assign_splits(docs, WEIGHTS).collect()}
    small = {r.doc_id: r.split for r in assign_splits(subset, WEIGHTS).collect()}
    assert all(full[k] == v for k, v in small.items())


def test_salt_reshuffles(docs):
    a = {r.doc_id: r.split for r in assign_splits(docs, WEIGHTS, salt="v1").collect()}
    b = {r.doc_id: r.split for r in assign_splits(docs, WEIGHTS, salt="v2").collect()}
    assert a != b  # different epoch salt → a genuinely new split
    # but each is internally deterministic
    a2 = {r.doc_id: r.split for r in assign_splits(docs, WEIGHTS, salt="v1").collect()}
    assert a == a2


def test_strata_see_the_same_proportions(docs):
    # hash independence: every lang stratum concentrates around the weights
    out = assign_splits(docs, WEIGHTS)
    per = (
        out.groupBy("lang")
        .agg(
            (F.sum(F.when(F.col("split") == "train", 1).otherwise(0)) / F.count("*")).alias("tr"),
            F.count("*").alias("n"),
        )
        .filter("n >= 50")
        .collect()
    )
    assert per, "expected at least one stratum with 50+ docs"
    for r in per:
        assert r.tr == pytest.approx(0.8, abs=0.12)


def test_pure_projection_no_shuffle(docs):
    plan = assign_splits(docs, WEIGHTS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_weights_rejected(docs):
    with pytest.raises(ValueError):
        assign_splits(docs, {})
    with pytest.raises(ValueError):
        assign_splits(docs, {"train": 1.0, "val": -0.1})


# -- leakage-safe clustered splits -------------------------------------------


def test_clustered_split_keeps_near_dups_together(spark, docs):
    from kafka_connect_ftp_spark.operators.dedup_cluster import connected_components
    from kafka_connect_ftp_spark.operators.splits import assign_splits_clustered

    ids = [r.doc_id for r in docs.limit(40).collect()]
    # three multi-member clusters, incl. a chain (transitive closure)
    pairs = spark.createDataFrame(
        [
            (ids[0], ids[1]), (ids[1], ids[2]), (ids[2], ids[3]),
            (ids[10], ids[11]),
            (ids[20], ids[21]), (ids[20], ids[22]),
        ],
        "doc_a long, doc_b long",
    )
    clusters = connected_components(pairs)
    out = assign_splits_clustered(docs, clusters, WEIGHTS)
    got = {r.doc_id: r.split for r in out.collect()}
    for group in ([ids[i] for i in (0, 1, 2, 3)], [ids[10], ids[11]], [ids[20], ids[21], ids[22]]):
        assert len({got[d] for d in group}) == 1, f"cluster {group} straddles splits"


def test_clustered_split_singletons_match_plain_assignment(spark, docs):
    from kafka_connect_ftp_spark.operators.dedup_cluster import connected_components
    from kafka_connect_ftp_spark.operators.splits import assign_splits_clustered

    ids = [r.doc_id for r in docs.limit(4).collect()]
    pairs = spark.createDataFrame([(ids[0], ids[1])], "doc_a long, doc_b long")
    clustered = {
        r.doc_id: r.split
        for r in assign_splits_clustered(docs, connected_components(pairs), WEIGHTS).collect()
    }
    plain = {r.doc_id: r.split for r in assign_splits(docs, WEIGHTS).collect()}
    # only the two clustered docs may move; every singleton is unchanged
    moved = {d for d in plain if clustered[d] != plain[d]}
    assert moved <= {ids[0], ids[1]}
    # cluster members agree with the cluster key's own plain assignment
    rep = min(ids[0], ids[1])
    assert clustered[ids[0]] == clustered[ids[1]] == plain[rep]


def test_clustered_split_rejects_reserved_columns(spark, docs):
    from kafka_connect_ftp_spark.operators.dedup_cluster import connected_components
    from kafka_connect_ftp_spark.operators.splits import assign_splits_clustered

    ids = [r.doc_id for r in docs.limit(2).collect()]
    clusters = connected_components(
        spark.createDataFrame([(ids[0], ids[1])], "doc_a long, doc_b long")
    )
    poisoned = docs.withColumn("_asc_cluster", F.lit(1))
    with pytest.raises(ValueError, match="reserved column"):
        assign_splits_clustered(poisoned, clusters, WEIGHTS)
