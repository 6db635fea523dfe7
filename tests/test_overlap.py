"""KMV corpus-overlap estimation (operators/overlap.py): exactness in
the full-set regime, estimator accuracy in the sketch regime, WindowGroupLimit
plan pin, duplicate/NULL handling."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.overlap import (
    corpus_overlap,
    corpus_overlap_frame,
    kmv_sketches,
)


def _corpus(spark, specs):
    """specs: {source: iterable of text}."""
    rows = [(src, t) for src, texts in specs.items() for t in texts]
    return spark.createDataFrame(rows, "source string, text string")


def test_exact_in_full_set_regime(spark):
    # k >= every group's distinct count -> sketches are the full hash
    # sets and every estimate is exact
    a = [f"doc-{i}" for i in range(60)]          # 60 distinct
    b = [f"doc-{i}" for i in range(40, 100)]     # 60 distinct, 20 shared
    docs = _corpus(spark, {"old": a, "new": b})
    [row] = corpus_overlap(docs, "source", k=512).collect()
    assert (row.group_a, row.group_b) == ("new", "old")
    assert row.est_distinct_a == 60 and row.est_distinct_b == 60
    assert row.est_jaccard == round(20 / 100, 4)
    assert row.est_common == 20


def test_duplicates_and_nulls_dont_inflate(spark):
    docs = _corpus(spark, {"a": ["x", "x", "x", "y"], "b": ["x", None]})
    [row] = corpus_overlap(docs, "source", k=64).collect()
    assert row.est_distinct_a == 2  # x, y — triplicate x counts once
    assert row.est_distinct_b == 1  # NULL text excluded
    assert row.est_jaccard == 0.5   # {x} of {x, y}
    assert row.est_common == 1


def test_sketch_regime_estimates_within_tolerance(spark):
    # 1000 vs 1000 docs, 500 shared -> true J = 500/1500 ≈ 0.333;
    # k=256 gives stderr ~ 1/sqrt(256) ≈ 0.06
    a = [f"doc-{i}" for i in range(1000)]
    b = [f"doc-{i}" for i in range(500, 1500)]
    docs = _corpus(spark, {"old": a, "new": b})
    [row] = corpus_overlap(docs, "source", k=256).collect()
    assert abs(row.est_jaccard - 1 / 3) < 0.15
    assert abs(row.est_distinct_a - 1000) / 1000 < 0.3
    assert abs(row.est_common - 500) / 500 < 0.5


def test_disjoint_and_multiway(spark):
    docs = _corpus(
        spark, {"a": ["1", "2"], "b": ["3", "4"], "c": ["1", "3"]}
    )
    rows = {(r.group_a, r.group_b): r for r in corpus_overlap(docs, "source", k=64).collect()}
    assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rows[("a", "b")].est_jaccard == 0.0
    assert rows[("a", "b")].est_common == 0
    assert rows[("a", "c")].est_jaccard == round(1 / 3, 4)


def test_null_group_is_its_own_group(spark):
    # matches cap_per_group's contract; a missing source must not crash
    # the whole report
    docs = _corpus(spark, {"a": ["x", "y"]}).union(
        spark.createDataFrame([(None, "x"), (None, "z")], "source string, text string")
    )
    rows = {(r.group_a, r.group_b): r for r in corpus_overlap(docs, "source", k=64).collect()}
    [(pair, row)] = rows.items()
    assert None in pair and "a" in pair
    assert row.est_common == 1  # shared "x"


def test_sketch_plan_uses_window_group_limit(spark):
    docs = _corpus(spark, {"a": ["1", "2"], "b": ["3"]})
    plan = (
        kmv_sketches(docs, "source", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1]


def test_no_exchange_below_local_prune(spark):
    # the scale claim: the partition-local dedup+k-min (MapInPandas)
    # runs BEFORE any exchange, so no shuffle ever carries the
    # corpus-wide distinct key space. The plan string prints top-down,
    # so every Exchange must appear ABOVE the MapInPandas node.
    docs = _corpus(spark, {"a": ["1", "2"], "b": ["3"]})
    plan = (
        kmv_sketches(docs, "source", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    below_prune = plan.split("MapInPandas", 1)[1]
    assert "Exchange" not in below_prune


def test_rejects_bad_k(spark):
    docs = _corpus(spark, {"a": ["1"]})
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketches(docs, "source", k=1)
    with pytest.raises(ValueError, match="k must be"):
        corpus_overlap_frame(docs, "source", k=1)


# ---- plan-only variant (round 12): value parity with the driver path ----


def _rows(df):
    return sorted(
        (
            (r.group_a, r.group_b, r.est_jaccard, r.est_distinct_a,
             r.est_distinct_b, r.est_common)
            for r in df.collect()
        ),
        key=lambda t: (t[0] is not None, t[0] or "", t[1] or ""),
    )


@pytest.mark.parametrize(
    "specs, k",
    [
        # full-set (exact) regime
        (
            {
                "old": [f"doc-{i}" for i in range(60)],
                "new": [f"doc-{i}" for i in range(40, 100)],
            },
            512,
        ),
        # sketch (estimator) regime — k below the pairwise union size
        (
            {
                "old": [f"doc-{i}" for i in range(1000)],
                "new": [f"doc-{i}" for i in range(500, 1500)],
            },
            256,
        ),
        # multiway + disjoint pairs
        ({"a": ["1", "2"], "b": ["3", "4"], "c": ["1", "3"]}, 64),
    ],
)
def test_frame_matches_driver_path(spark, specs, k):
    docs = _corpus(spark, specs)
    assert _rows(corpus_overlap_frame(docs, "source", k=k)) == _rows(
        corpus_overlap(docs, "source", k=k)
    )


def test_frame_null_group_matches_driver_path(spark):
    docs = _corpus(spark, {"a": ["x", "y"]}).union(
        spark.createDataFrame([(None, "x"), (None, "z")], "source string, text string")
    )
    frame = _rows(corpus_overlap_frame(docs, "source", k=64))
    assert frame == _rows(corpus_overlap(docs, "source", k=64))
    [(ga, gb, *_)] = frame
    assert ga is None and gb == "a"  # NULL group ordered first, like the driver path
