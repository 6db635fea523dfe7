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
