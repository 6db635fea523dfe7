"""Per-group caps (operators/capping.py): correctness vs a pure-Python
oracle, deterministic tiebreaks, NULL-group handling, and the
WindowGroupLimit partial-prune plan pin (the hot-domain safety)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.capping import cap_per_group


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, domain, score): one giant domain, one small, one NULL
        *[(i, "big.com", i % 7) for i in range(20)],
        *[(100 + i, "small.org", i) for i in range(2)],
        (200, None, 5),
        (201, None, 9),
        (202, None, 1),
    ]
    return spark.createDataFrame(rows, "doc_id long, domain string, score long")


def test_caps_each_group_ranked_by_order_col(docs):
    out = cap_per_group(docs, "domain", 3, order_col="score", descending=True)
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r.domain, []).append(r)
    assert len(by_dom["big.com"]) == 3
    # scores are i % 7 over i in [0, 20): two 6-scores (i=6,13), then the
    # 5-scores — the cap must keep exactly the top-ranked three
    assert sorted(r.score for r in by_dom["big.com"]) == [5, 6, 6]


def test_exact_survivors_deterministic(docs):
    out1 = sorted(
        r.doc_id
        for r in cap_per_group(docs, "domain", 3, order_col="score", descending=True)
        .filter("domain = 'big.com'")
        .collect()
    )
    out2 = sorted(
        r.doc_id
        for r in cap_per_group(
            docs.repartition(7), "domain", 3, order_col="score", descending=True
        )
        .filter("domain = 'big.com'")
        .collect()
    )
    # score 6 occurs at doc_id 6, 13; next-best score 5 at 5, 12, 19 → tiebreak 5
    assert out1 == out2 == [5, 6, 13]


def test_small_and_null_groups(docs):
    out = cap_per_group(docs, "domain", 3, order_col="score", descending=True)
    small = out.filter("domain = 'small.org'").count()
    nulls = out.filter("domain is null").count()
    assert small == 2  # under the cap: untouched
    assert nulls == 3  # NULL group capped like any other (3 <= 3 kept)
    assert cap_per_group(docs, "domain", 2).filter("domain is null").count() == 2


def test_preexisting_rn_column_survives(spark):
    df = spark.createDataFrame(
        [(1, "a", 99), (2, "a", 88)], "doc_id long, domain string, _rn long"
    )
    out = cap_per_group(df, "domain", 5)
    assert "_rn" in out.columns
    assert sorted(r._rn for r in out.collect()) == [88, 99]


def test_rejects_bad_cap(docs):
    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(docs, "domain", 0)


def test_plan_uses_window_group_limit_with_partial(docs):
    plan = (
        cap_per_group(docs, "domain", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    # the map-side partial prune is what makes a hot domain safe
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1]
