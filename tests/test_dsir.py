"""DSIR importance resampling (operators/dsir.py): exactness vs a
pure-Python reference (same md5 buckets, same smoothing), selection
semantics, determinism, and plan-shape scale pins."""

from __future__ import annotations

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.dsir import (
    dsir_logratio,
    dsir_scores,
    dsir_select,
    gram_buckets,
)

B = 64
ALPHA = 0.5

_TARGETY = [
    "spark shuffles partition data across the cluster",
    "broadcast joins avoid the shuffle for small tables",
    "partition pruning skips files the query never needs",
]
_RAWY = [
    "the cat sat on the mat all afternoon",
    "a recipe for sourdough needs patience and flour",
    "spark shuffles partition data across the cluster",  # target-like raw doc
    "migrating birds cross two continents every year",
]


def _py_bucket(gram: str) -> int:
    return (int(hashlib.md5(gram.encode()).hexdigest()[:13], 16)) % B


def _py_grams(text: str) -> list[str]:
    toks = [t for t in text.split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_logratio() -> dict[int, float]:
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for t in _TARGETY:
        for g in _py_grams(t):
            ct[_py_bucket(g)] = ct.get(_py_bucket(g), 0) + 1
    for t in _RAWY:
        for g in _py_grams(t):
            cr[_py_bucket(g)] = cr.get(_py_bucket(g), 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    return {
        b: math.log((ct.get(b, 0) + ALPHA) / (nt + ALPHA * B))
        - math.log((cr.get(b, 0) + ALPHA) / (nr + ALPHA * B))
        for b in range(B)
    }


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TARGETY)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(_RAWY)], "doc_id long, text string"
    )
    return target, raw


def test_scores_match_pure_python_reference(spark, frames):
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B, alpha=ALPHA)
    got_table = {r.bucket: r.log_ratio for r in table.collect()}
    ref_table = _py_logratio()
    assert set(got_table) == set(range(B))
    for b in range(B):
        assert got_table[b] == pytest.approx(ref_table[b], abs=1e-12)

    scored = dsir_scores(raw, table, n_buckets=B)
    got = {r.doc_id: r.dsir_logw for r in scored.collect()}
    for i, t in enumerate(_RAWY):
        ref = sum(ref_table[_py_bucket(g)] for g in _py_grams(t))
        assert got[100 + i] == pytest.approx(ref, rel=1e-9)
    # the target-like raw document must outscore every other raw doc
    assert got[102] == max(got.values())


def test_empty_and_null_text_score_zero(spark, frames):
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B, alpha=ALPHA)
    odd = spark.createDataFrame(
        [(1, ""), (2, None), (3, "spark shuffles partition data")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.dsir_logw for r in dsir_scores(odd, table, n_buckets=B).collect()}
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] != 0.0


def test_select_is_deterministic_and_weight_monotone(spark, frames):
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B, alpha=ALPHA)
    scored = dsir_scores(raw, table, n_buckets=B)
    a = {r.doc_id: r.dsir_keep for r in dsir_select(scored, 2).collect()}
    b = {
        r.doc_id: r.dsir_keep
        for r in dsir_select(scored.repartition(7), 2).collect()
    }
    assert a == b and sum(a.values()) == 2
    # pushing a doc's weight far up must pull it into the sample
    boosted = scored.withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") == 103, F.lit(1e6)).otherwise(F.col("dsir_logw")),
    )
    kept = {r.doc_id for r in dsir_select(boosted, 2).collect() if r.dsir_keep}
    assert 103 in kept
    # different salt -> (potentially) different gumbels, same size
    c = dsir_select(scored, 2, salt="v2").filter("dsir_keep").count()
    assert c == 2


def test_contract_violations(spark, frames):
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_logratio(target, raw, n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_logratio(target, raw, alpha=0.0)
    # round 12: the bucket-space guard moved in-plan (assert_true over a
    # broadcast table count) so plan CONSTRUCTION no longer executes the
    # logratio lineage; the same message now raises at execution
    mismatch = dsir_scores(raw, table, n_buckets=B * 2)
    with pytest.raises(Exception, match="bucket space"):
        mismatch.collect()
    with pytest.raises(ValueError, match="n must be"):
        dsir_select(dsir_scores(raw, table, n_buckets=B), 0)


@pytest.fixture()
def scored_300(spark, frames):
    # a wider frame than `frames` so threshold/topk routing has room:
    # weights vary by id so the Gumbel keys spread out
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B, alpha=ALPHA)
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("spark shuffles data token"), (F.col("id") % 23).cast("string")
        ).alias("text"),
    )
    return dsir_scores(docs, table, n_buckets=B)


def test_threshold_equals_topk_across_layouts(spark, scored_300):
    # VERDICT r7 #1: the fraction regime must select EXACTLY the set the
    # top-k path selects — pinned across n values spanning all three
    # correction branches (d==0, d>0, d<0) and three partition layouts.
    # Fast default (the conftest prop_examples rationale): every n — the
    # branch coverage — always runs, against the two layout extremes;
    # SPARK_GRAFT_SLOW=1 adds the mid layout back.
    layouts = (1, 7, 32) if os.environ.get("SPARK_GRAFT_SLOW") == "1" else (1, 32)
    for n in (1, 7, 150, 240, 299):
        ref = {
            r.doc_id
            for r in dsir_select(scored_300, n, mode="topk").collect()
            if r.dsir_keep
        }
        assert len(ref) == n
        for parts in layouts:
            got = {
                r.doc_id
                for r in dsir_select(
                    scored_300.repartition(parts), n, mode="threshold"
                ).collect()
                if r.dsir_keep
            }
            assert got == ref, f"n={n} parts={parts}"


def test_threshold_n_at_least_total_keeps_all(spark, scored_300):
    out = dsir_select(scored_300, 10_000, mode="threshold")
    assert out.filter("dsir_keep").count() == 300 == out.count()


def test_threshold_plan_has_no_corpus_proportional_funnel(spark, scored_300):
    # the fraction path's bulk decision is a map-side filter; any
    # TakeOrderedAndProject left in the plan is the bounded boundary
    # correction — its limit must be the |n - c_hi| band, never n
    import re

    n = 200
    out = dsir_select(scored_300, n, mode="threshold")
    assert out.filter("dsir_keep").count() == n
    plan = out._jdf.queryExecution().executedPlan().toString()
    limits = [int(m) for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)]
    assert all(lim < n // 2 for lim in limits), (limits, n)
    # auto mode routes large-n to the threshold path (no TakeOrdered(n))
    auto = dsir_select(scored_300, n, topk_max=100)
    aplan = auto._jdf.queryExecution().executedPlan().toString()
    alims = [int(m) for m in re.findall(r"TakeOrderedAndProject\(limit=(\d+)", aplan)]
    assert all(lim < n // 2 for lim in alims), (alims, n)
    with pytest.raises(ValueError, match="mode"):
        dsir_select(scored_300, 5, mode="bogus")
    with pytest.raises(ValueError, match="accuracy"):
        dsir_select(scored_300, 200, mode="threshold", accuracy=10)


def test_plan_shape_bounded_shuffles(spark, frames):
    # scale pins: the ratio table joins BROADCAST (never a corpus-keyed
    # shuffle of text), and the top-k compiles to TakeOrderedAndProject
    # (bounded per-partition prune), not a global Sort
    target, raw = frames
    table = dsir_logratio(target, raw, n_buckets=B)
    out = dsir_select(dsir_scores(raw, table, n_buckets=B), 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_threshold_mode_null_weight_keeps_false(spark):
    # ADVICE r8: a NULL weight row must come out dsir_keep=False in the
    # threshold regime exactly as in top-k (NULL > t and NULL|false are
    # NULL without the coalesce) — the two regimes may never differ
    rows = [(i, float(i)) for i in range(50)] + [(99, None)]
    scored = spark.createDataFrame(rows, "doc_id long, dsir_logw double")
    for mode in ("topk", "threshold"):
        got = {
            r.doc_id: r.dsir_keep
            for r in dsir_select(scored, 10, mode=mode).collect()
        }
        assert got[99] is False, (mode, got[99])
        assert all(v is not None for v in got.values()), mode
