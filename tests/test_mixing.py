"""Corpus-mixing operator: weighted-sample proportions track weights,
determinism, mixing rates incl. multi-epoch, plan shape (top-n not full
sort for the sample; no corpus shuffle for the mix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.mixing import mix_corpora, weighted_sample

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")


def test_weighted_sample_follows_weights(spark):
    # two strata, weight 9 vs 1 → heavy stratum dominates the sample
    rows = [(i, 9.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, 200, weight_col="w")
    heavy = got.filter("doc_id < 500").count()
    assert got.count() == 200
    # E[heavy] ≈ 178 under ES sampling; allow wide but meaningful margin
    assert heavy > 140


def test_weighted_sample_deterministic_and_salt_sensitive(docs):
    df = docs.withColumn("w", F.lit(1.0))
    a = {r.doc_id for r in weighted_sample(df, 50, weight_col="w").collect()}
    b = {r.doc_id for r in weighted_sample(df, 50, weight_col="w").collect()}
    c = {r.doc_id for r in weighted_sample(df, 50, weight_col="w", salt="v2").collect()}
    assert a == b and a != c and len(a) == 50


def test_weighted_sample_uses_topk_not_full_sort(docs):
    df = docs.withColumn("w", F.lit(1.0))
    plan = (
        weighted_sample(df, 10, weight_col="w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_zero_weight_never_selected(spark):
    rows = [(i, 0.0 if i % 2 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, 50, weight_col="w")
    assert got.filter("w = 0").count() == 0


def test_mix_rates_and_epochs(docs):
    n = docs.count()
    mixed = mix_corpora(
        {"a": (docs, 1.5), "b": (docs, 0.25)},
    )
    by = {(r.source, r.epoch): r["count"] for r in mixed.groupBy("source", "epoch").count().collect()}
    assert by[("a", 0)] == n  # full epoch
    assert by[("a", 1)] == pytest.approx(n * 0.5, abs=n * 0.15)
    assert by[("b", 0)] == pytest.approx(n * 0.25, abs=n * 0.15)
    # re-running selects the same rows (deterministic mix)
    again = mix_corpora({"a": (docs, 1.5), "b": (docs, 0.25)})
    key = lambda df: sorted((r.source, r.epoch, r.doc_id) for r in df.collect())
    assert key(mixed) == key(again)


def test_rates_for_token_budgets_bridge(spark):
    from kafka_connect_ftp_spark.operators.mixing import rates_for_token_budgets

    docs2 = spark.createDataFrame(
        [(i, "web", "one two three four five") for i in range(100)]  # 500 toks
        + [(1000 + i, "code", "a b c d e f g h i j") for i in range(50)],  # 500 toks
        "doc_id long, source string, text string",
    )
    rates = rates_for_token_budgets(docs2, {"web": 250.0, "code": 1000.0})
    assert rates == {"web": 0.5, "code": 2.0}
    capped = rates_for_token_budgets(
        docs2, {"web": 250.0, "code": 1000.0}, allow_epochs=False
    )
    assert capped == {"web": 0.5, "code": 1.0}

    # documented contract: corpus sources with no budget entry are dropped
    # via an explicit 0.0 rate (not omitted — callers index the dict)
    partial = rates_for_token_budgets(docs2, {"web": 250.0})
    assert partial == {"web": 0.5, "code": 0.0}

    # the rates feed mix_corpora; the sampled token mass tracks the budget
    mixed = mix_corpora(
        {
            "web": (docs2.filter("source = 'web'").drop("source"), rates["web"]),
        }
    )
    toks = mixed.select(
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert 150 <= toks <= 350  # 250 expected, hash-sampling variance

    with pytest.raises(ValueError, match="absent"):
        rates_for_token_budgets(docs2, {"nope": 1.0})
    with pytest.raises(ValueError, match=">= 0"):
        rates_for_token_budgets(docs2, {"web": -1.0})


def test_mix_rejects_bad_rates(docs):
    with pytest.raises(ValueError):
        mix_corpora({"a": (docs, -0.5)})
    with pytest.raises(ValueError):
        mix_corpora({})


def test_temperature_rates_alpha_one_is_proportional():
    from kafka_connect_ftp_spark.operators.mixing import temperature_rates

    totals = {"web": 8000, "code": 1500, "ref": 500}
    rates = temperature_rates(totals, budget=5000, alpha=1.0)
    # proportional sampling: every source at the same rate budget/N
    assert all(abs(r - 0.5) < 1e-12 for r in rates.values())


def test_temperature_rates_upweight_rare_sources():
    from kafka_connect_ftp_spark.operators.mixing import temperature_rates

    totals = {"web": 8000, "ref": 500}
    r1 = temperature_rates(totals, budget=1000, alpha=1.0)
    r3 = temperature_rates(totals, budget=1000, alpha=0.3)
    # lower alpha shifts budget toward the rare source
    assert r3["ref"] > r1["ref"] and r3["web"] < r1["web"]
    # budget conserved: sum(rate * n) == budget
    for rates in (r1, r3):
        assert abs(sum(rates[s] * totals[s] for s in totals) - 1000) < 1e-6


def test_temperature_rates_epoch_cap_and_validation():
    import pytest as _pt

    from kafka_connect_ftp_spark.operators.mixing import temperature_rates

    totals = {"web": 10_000, "ref": 10}
    capped = temperature_rates(totals, budget=9000, alpha=0.1, allow_epochs=False)
    assert capped["ref"] == 1.0  # would repeat; consumed whole instead
    uncapped = temperature_rates(totals, budget=9000, alpha=0.1)
    assert uncapped["ref"] > 1.0
    with _pt.raises(ValueError):
        temperature_rates({}, budget=1)
    with _pt.raises(ValueError):
        temperature_rates(totals, budget=1, alpha=0.0)
    with _pt.raises(ValueError):
        temperature_rates(totals, budget=-1)
    assert temperature_rates({"a": 0, "b": 0}, budget=5) == {"a": 0.0, "b": 0.0}
