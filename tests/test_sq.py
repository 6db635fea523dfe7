"""Scalar quantization (operators/sq.py): exactness vs a pure-Python
reference, round-trip error bounds, retrieval quality on the real
embeddings table, degenerate dims, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.sq import (
    sq_decode_col,
    sq_encode,
    sq_encode_col,
    sq_topk,
    train_sq,
)
from kafka_connect_ftp_spark.session import load_tables

SF = "/root/testdata/sf0.001"

VECS = [
    (0, [0.0, 10.0, -1.0, 5.0]),
    (1, [1.0, 20.0, -1.0, 0.0]),
    (2, [2.0, 15.0, -1.0, 2.5]),
]


def _py_sq(vecs):
    dims = len(vecs[0])
    vmin = [min(v[i] for v in vecs) for i in range(dims)]
    vmax = [max(v[i] for v in vecs) for i in range(dims)]
    vdiff = [b - a for a, b in zip(vmin, vmax)]

    def enc(v):
        out = []
        for x, m, w in zip(v, vmin, vdiff):
            if w == 0:
                out.append(0)
            else:
                t = min(max((x - m) / w, 0.0), 1.0)
                out.append(int(t * 255 + 0.5))
        return out

    def dec(c):
        return [m + k / 255.0 * w for k, m, w in zip(c, vmin, vdiff)]

    return vmin, vdiff, enc, dec


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(VECS, "vec_id long, v array<double>")


def test_train_encode_decode_match_pure_python(spark, small):
    vmin, vdiff = train_sq(small)
    pmin, pdiff, penc, pdec = _py_sq([v for _, v in VECS])
    assert vmin == pmin and vdiff == pdiff
    got = {r.vec_id: list(r.codes) for r in sq_encode(small, (vmin, vdiff)).collect()}
    for i, v in VECS:
        assert got[i] == penc(v), i
    # codes in byte range; degenerate dim (index 2, constant -1) -> 0
    assert all(0 <= c <= 255 for cs in got.values() for c in cs)
    assert all(cs[2] == 0 for cs in got.values())
    # decode of a degenerate dim is EXACT; others within half a step
    dec = small.select(
        "vec_id",
        sq_decode_col(sq_encode_col("v", vmin, vdiff), vmin, vdiff).alias("d"),
        "v",
    )
    for r in dec.collect():
        assert r.d[2] == -1.0
        for a, b, w in zip(r.d, r.v, vdiff):
            assert abs(a - b) <= (w / 255.0) / 2 + 1e-9


def test_topk_recall_on_real_embeddings(spark):
    from kafka_connect_ftp_spark.operators.ann import brute_force_topk

    raw = load_tables(spark, SF, "embeddings")["embeddings"]
    emb = raw.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bounds = train_sq(emb)
    codes = sq_encode(emb, bounds)
    q = [float(x) for x in emb.orderBy("vec_id").first().v]
    exact = [r.vec_id for r in brute_force_topk(raw, q, top_k=10).collect()]
    approx = [r.vec_id for r in sq_topk(codes, bounds, q, k=10).collect()]
    # 8-bit per-dim quantization: near-exact retrieval at this scale
    assert len(set(exact) & set(approx)) >= 8
    assert approx[0] == exact[0]  # the self-match survives quantization


def test_contracts_and_plan(spark, small):
    bounds = train_sq(small)
    with pytest.raises(ValueError, match="query dim"):
        sq_topk(sq_encode(small, bounds), bounds, [1.0], k=2)
    with pytest.raises(ValueError, match="k must be"):
        sq_topk(sq_encode(small, bounds), bounds, [0.0] * 4, k=0)
    with pytest.raises(ValueError, match="empty corpus"):
        train_sq(small.filter("vec_id < 0"))
    plan = (
        sq_encode(small, bounds)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan
