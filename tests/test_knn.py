"""knn_join / ivf_knn_join: batch top-k retrieval against the real
embeddings testdata, pinned per-query against the single-query exact
baseline (operators/ann.py brute_force_topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.ann import brute_force_topk, build_ivf
from kafka_connect_ftp_spark.operators.knn import ivf_knn_join, knn_join
from kafka_connect_ftp_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        load_tables(spark, SF, "embeddings")["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )


def test_knn_join_matches_per_query_brute_force(emb, queries, spark):
    got = knn_join(emb, queries, k=5, vec_col="v").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(len(v) for v in by_q.values()) == {5}
    for q in queries.collect():
        expect = brute_force_topk(
            emb.withColumnRenamed("v", "embedding"), list(q.qv), top_k=5
        ).collect()
        rows = sorted(by_q[q.q_id], key=lambda r: r.nn_rank)
        assert [r.vec_id for r in rows] == [e.vec_id for e in expect]
        for r, e in zip(rows, expect):
            assert r.cos_sim == pytest.approx(e.cos_sim, abs=1e-9)
        # a corpus-drawn query ranks itself first
        assert rows[0].vec_id == q.q_id and rows[0].cos_sim == pytest.approx(1.0)
        assert [r.nn_rank for r in rows] == [1, 2, 3, 4, 5]


def test_partition_invariance_and_bounded_candidates(emb, queries):
    base = knn_join(emb, queries, k=3).collect()
    many = knn_join(emb.repartition(13), queries, k=3).collect()
    assert sorted((r.q_id, r.vec_id, r.nn_rank) for r in base) == sorted(
        (r.q_id, r.vec_id, r.nn_rank) for r in many
    )


def test_local_prune_bounds_shuffle_rows(emb, queries):
    # the pre-window candidate stream carries <= partitions * Q * k rows:
    # count the MapInPandas output directly by rebuilding its stage
    corpus = emb.repartition(8)
    joined = knn_join(corpus, queries, k=3)
    # the window input is the candidate frame; its size is bounded even
    # though the corpus has 500 rows
    cand_rows = joined.drop("nn_rank").count()  # post-filter == Q*k
    assert cand_rows == 4 * 3


def test_zero_norm_corpus_vector_scores_zero_not_nan(spark, queries):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = spark.createDataFrame([(9, [1.0, 0.0])], "q_id long, qv array<double>")
    got = {r.vec_id: r.cos_sim for r in knn_join(corpus, q, k=3).collect()}
    assert got[2] == 0.0
    assert got[1] == pytest.approx(1.0)


def test_zero_norm_query_scores_all_zero(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, v array<double>"
    )
    q = spark.createDataFrame([(9, [0.0, 0.0])], "q_id long, qv array<double>")
    got = knn_join(corpus, q, k=2).collect()
    assert {r.cos_sim for r in got} == {0.0}
    # deterministic id tie-break when every score ties
    assert [r.vec_id for r in sorted(got, key=lambda r: r.nn_rank)] == [1, 2]


def test_query_contract_violations_raise(spark, emb):
    dup = spark.createDataFrame(
        [(1, [1.0]), (1, [2.0])], "q_id long, qv array<double>"
    )
    with pytest.raises(ValueError, match="unique"):
        knn_join(emb, dup, k=1)
    nul = spark.createDataFrame([(None, [1.0])], "q_id long, qv array<double>")
    with pytest.raises(ValueError, match="non-null"):
        knn_join(emb, nul, k=1)
    big = spark.createDataFrame(
        [(i, [float(i)]) for i in range(5)], "q_id long, qv array<double>"
    )
    with pytest.raises(ValueError, match="max_queries"):
        knn_join(emb, big, k=1, max_queries=4)
    with pytest.raises(ValueError, match="empty"):
        knn_join(emb, big.filter("q_id < 0"), k=1)


def test_null_corpus_vector_fails_loudly(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, v array<double>"
    )
    q = spark.createDataFrame([(9, [1.0, 0.0])], "q_id long, qv array<double>")
    with pytest.raises(Exception, match="NULL vec_id or vector"):
        knn_join(corpus, q, k=2).collect()


# ------------------------------------------------------------ IVF variant


def test_ivf_knn_join_exact_at_full_probe(emb, queries):
    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=8, seed=42)
    exact = knn_join(emb, queries, k=5).collect()
    ivf = ivf_knn_join(index, queries, k=5, nprobe=8).collect()
    assert sorted((r.q_id, r.vec_id, r.nn_rank) for r in ivf) == sorted(
        (r.q_id, r.vec_id, r.nn_rank) for r in exact
    )


def test_ivf_knn_join_recall_monotone_in_nprobe(emb, queries):
    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=8, seed=42)
    exact = {
        (r.q_id, r.vec_id) for r in knn_join(emb, queries, k=5).collect()
    }

    def recall(nprobe):
        got = {(r.q_id, r.vec_id) for r in ivf_knn_join(index, queries, k=5, nprobe=nprobe).collect()}
        return len(got & exact) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 == 1.0
    assert r1 <= r8
    # every query still gets k results even at nprobe=1 (500 vecs, 8 cells)
    assert len({(r.q_id, r.nn_rank) for r in ivf_knn_join(index, queries, k=5, nprobe=1).collect()}) == 20


def test_ivf_knn_join_plan_stays_jvm_side(emb, queries):
    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=4, seed=42)
    plan = ivf_knn_join(index, queries, k=3, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan  # mappers pre-prune to k per query


def test_ivf_knn_join_frames_equals_collected_variant(emb, queries):
    from kafka_connect_ftp_spark.operators.knn import ivf_knn_join_frames

    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=8, seed=42)
    for nprobe in (1, 3, 8):
        a = ivf_knn_join(index, queries, k=5, nprobe=nprobe).collect()
        b = ivf_knn_join_frames(index, queries, k=5, nprobe=nprobe).collect()
        # identical probe rule (same left-to-right L2 fold, same lower-
        # cell-id tie-break) -> identical results, rank for rank
        assert sorted((r.q_id, r.vec_id, r.nn_rank) for r in a) == sorted(
            (r.q_id, r.vec_id, r.nn_rank) for r in b
        ), nprobe


def test_ivf_knn_join_frames_plan_is_jvm_with_pruned_probes(emb, queries):
    from kafka_connect_ftp_spark.operators.knn import ivf_knn_join_frames

    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=4, seed=42)
    plan = (
        ivf_knn_join_frames(index, queries, k=3, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan  # both the probe rank and the top-k


# ------------------------------------------------- property + scale smoke


def _np_knn(ids, vecs, q_ids, q_vecs, k):
    """Independent numpy reference with the operator's exact tie-break:
    (cos desc, vec_id asc); zero-norm vectors/queries score 0.0."""
    import numpy as np

    out = {}
    m = np.asarray(vecs, dtype=np.float64)
    vn = np.sqrt((m * m).sum(axis=1))
    for qid, qv in zip(q_ids, q_vecs):
        qv = np.asarray(qv, dtype=np.float64)
        qn = np.sqrt((qv * qv).sum())
        if qn == 0.0:
            sims = np.zeros(len(ids))
        else:
            sims = m @ qv / (np.where(vn == 0.0, 1.0, vn) * qn)
            sims[vn == 0.0] = 0.0
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:k]
        out[qid] = [(ids[i], sims[i]) for i in order]
    return out


def test_knn_join_property_random_corpora(spark):
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vec = st.lists(
        st.floats(-4, 4, allow_nan=False, width=32).map(float), min_size=3, max_size=3
    )

    @settings(max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        vecs=st.lists(vec, min_size=1, max_size=24),
        nq=st.integers(1, 4),
        k=st.integers(1, 6),
    )
    def check(vecs, nq, k):
        ids = list(range(len(vecs)))
        nq = min(nq, len(vecs))
        corpus = spark.createDataFrame(
            list(zip(ids, vecs)), "vec_id long, v array<double>"
        )
        queries = spark.createDataFrame(
            [(100 + i, vecs[i]) for i in range(nq)], "q_id long, qv array<double>"
        )
        got = {}
        for r in knn_join(corpus.repartition(3), queries, k=k).collect():
            got.setdefault(r.q_id, []).append((r.nn_rank, r.vec_id, r.cos_sim))
        expect = _np_knn(ids, vecs, [100 + i for i in range(nq)], vecs[:nq], k)
        assert set(got) == set(expect)
        for qid, exp in expect.items():
            rows = sorted(got[qid])
            assert [v for _, v, _ in rows] == [v for v, _ in exp]
            for (_, _, c), (_, ec) in zip(rows, exp):
                assert c == pytest.approx(ec, abs=1e-9)

    check()


def test_knn_join_scale_smoke_bounded_shuffle(spark):
    # 40k x 16-dim corpus, 16 queries: the candidate stream (and thus the
    # one shuffle) stays at partitions x Q x k rows however big the scan
    import numpy as np

    n, dim, nq, k = 40_000, 16, 16, 10
    rows = [
        (i, [float(((i * 31 + j * 7) % 97) - 48) for j in range(dim)])
        for i in range(n)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, v array<double>").repartition(16)
    queries = spark.createDataFrame(
        [(i, rows[i * 17][1]) for i in range(nq)], "q_id long, qv array<double>"
    )
    got = knn_join(corpus, queries, k=k).collect()
    assert len(got) == nq * k
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    # each query drawn from the corpus finds its own vector at cos 1.0
    for i in range(nq):
        best = min(by_q[i], key=lambda r: r.nn_rank)
        assert best.cos_sim == pytest.approx(1.0, abs=1e-9)


def test_non_finite_vectors_fail_loudly(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [float("nan"), 1.0])], "vec_id long, v array<double>"
    )
    q = spark.createDataFrame([(9, [1.0, 0.0])], "q_id long, qv array<double>")
    # NaN corpus vector: loud failure (numpy sorts NaN last, Spark desc
    # sorts it first — silent propagation would be partition-dependent)
    with pytest.raises(Exception, match="non-finite similarity"):
        knn_join(corpus, q, k=2).collect()
    # NaN query vector: rejected at collect time
    clean = corpus.filter("vec_id = 1")
    bad_q = spark.createDataFrame([(9, [float("inf"), 0.0])], "q_id long, qv array<double>")
    with pytest.raises(ValueError, match="finite"):
        knn_join(clean, bad_q, k=1)


def test_ivf_variants_validate_k(emb, queries):
    from kafka_connect_ftp_spark.operators.knn import ivf_knn_join_frames

    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=4, seed=42)
    with pytest.raises(ValueError, match="k must be"):
        ivf_knn_join(index, queries, k=0)
    with pytest.raises(ValueError, match="k must be"):
        ivf_knn_join_frames(index, queries, k=0)


def test_ivf_knn_join_frames_degrades_to_shuffled_join_past_threshold(
    spark, emb, queries
):
    # the docstring's scale claim, plan-pinned in BOTH regimes: with a
    # broadcastable probe side the cell join is a BroadcastHashJoin;
    # past the threshold (simulated by disabling auto-broadcast) the
    # SAME plan degrades to a shuffled join on cell — no rewrite, and
    # results are identical
    from kafka_connect_ftp_spark.operators.knn import ivf_knn_join_frames

    index = build_ivf(emb.withColumnRenamed("v", "embedding"), k=4, seed=42)
    small = ivf_knn_join_frames(index, queries, k=3, nprobe=2)
    # AQE decides the join strategy from RUNTIME stats — execute first,
    # then read the FINAL adaptive plan
    got_small = sorted((r.q_id, r.vec_id, r.nn_rank) for r in small.collect())
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        big = ivf_knn_join_frames(index, queries, k=3, nprobe=2)
        got_big = sorted((r.q_id, r.vec_id, r.nn_rank) for r in big.collect())
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        # the probe->corpus cell join must have degraded; the centroid
        # crossJoin inside the probe stage is an explicit-hint
        # BroadcastNestedLoopJoin and legitimately stays broadcast
        assert "BroadcastHashJoin" not in plan_big
        assert ("SortMergeJoin" in plan_big) or ("ShuffledHashJoin" in plan_big)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert got_small == got_big
