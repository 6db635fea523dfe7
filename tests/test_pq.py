"""Product-quantization tests (operators/pq.py): hand-checked encode
argmins, expression-path == BLAS-path equality, the zero-error exactness
regime (every vector is a centroid), trained-codebook recall vs brute
force, the provably-exact IVF-PQ configuration, and a plan assertion
that the ADC search path is Python-free."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.pq import (
    PqCodebook,
    adc_dist_col,
    adc_table,
    codebook_from_first_ids,
    ivf_pq_search,
    pq_adc_search,
    pq_encode,
    pq_encode_arrow,
    train_pq,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


@pytest.fixture(scope="module")
def emb(spark):
    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    return _vecs(spark, rows), rows


def test_encode_picks_nearest_centroid_hand_checked(spark):
    # 2 subspaces of 2 dims, centroids = first 2 vectors' subvectors
    df = _vecs(
        spark,
        [
            (0, [0.0, 0.0, 10.0, 10.0]),
            (1, [5.0, 5.0, 0.0, 0.0]),
            (2, [0.1, 0.2, 0.3, 0.1]),  # near c0 in sub0, near c1 in sub1
            (3, [4.0, 6.0, 9.0, 9.0]),  # near c1 in sub0, near c0 in sub1
        ],
    )
    cb = codebook_from_first_ids(df, m=2, ksub=2)
    got = {r.vec_id: list(r.code) for r in pq_encode(df, cb).collect()}
    assert got[2] == [0, 1]
    assert got[3] == [1, 0]
    # the codebook vectors themselves encode to their own index
    assert got[0] == [0, 0] and got[1] == [1, 1]


def test_encode_tie_breaks_to_lowest_centroid_index(spark):
    # duplicate centroid subvectors: c0 == c1 in subspace 0 -> code 0
    df = _vecs(
        spark,
        [(0, [1.0, 1.0, 0.0, 0.0]), (1, [1.0, 1.0, 9.0, 9.0]), (2, [1.0, 1.0, 8.0, 8.0])],
    )
    cb = codebook_from_first_ids(df, m=2, ksub=2)
    got = {r.vec_id: list(r.code) for r in pq_encode(df, cb).collect()}
    assert got[2][0] == 0


def test_expression_and_arrow_paths_agree(spark, emb):
    df, _ = emb
    cb = codebook_from_first_ids(df, m=4, ksub=8)
    a = {r.vec_id: list(r.code) for r in pq_encode(df, cb).collect()}
    b = {r.vec_id: list(r.code) for r in pq_encode_arrow(df, cb).collect()}
    assert a == b


def test_adc_exact_when_vectors_are_centroids(spark):
    # every vector IS a centroid -> zero quantization error -> ADC
    # distance equals the true squared distance for every row
    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(4)]
    df = _vecs(spark, rows)
    cb = codebook_from_first_ids(df, m=3, ksub=4)
    query = [0.25, -0.5, 0.75, 0.1, -0.2, 0.3]
    got = {
        r.vec_id: r.adc_dist
        for r in pq_adc_search(pq_encode(df, cb), cb, query, top_k=4).collect()
    }
    for i, v in rows:
        true = sum((q - x) ** 2 for q, x in zip(query, v))
        assert got[i] == pytest.approx(true, rel=1e-12)


def test_adc_table_matches_column_path(spark, emb):
    df, rows = emb
    cb = codebook_from_first_ids(df, m=2, ksub=4)
    query = rows[7][1]
    table = adc_table(cb, query)
    enc = {r.vec_id: list(r.code) for r in pq_encode(df, cb).collect()}
    got = {
        r.vec_id: r.adc_dist
        for r in pq_adc_search(pq_encode(df, cb), cb, query, top_k=120).collect()
    }
    for i, code in enc.items():
        want = sum(table[j][c] for j, c in enumerate(code))
        assert got[i] == pytest.approx(want, rel=1e-12)


def _recall(df, rows, cb, query_idx, top_k=10):
    query = rows[query_idx][1]
    got = {
        r.vec_id
        for r in pq_adc_search(pq_encode(df, cb), cb, query, top_k=top_k).collect()
    }
    truth = sorted(
        (sum((q - x) ** 2 for q, x in zip(query, v)), i) for i, v in rows
    )[:top_k]
    return len(got & {i for _, i in truth}) / top_k


def test_trained_codebook_recall_improves_with_ksub(spark, emb):
    df, rows = emb
    coarse = train_pq(df, m=2, ksub=2, seed=1)
    fine = train_pq(df, m=2, ksub=32, seed=1)
    r_coarse = _recall(df, rows, coarse, query_idx=3)
    r_fine = _recall(df, rows, fine, query_idx=3)
    assert r_fine >= r_coarse
    assert r_fine >= 0.5  # 32 centroids over 120 vectors finds most of top-10


def test_ivf_pq_exact_in_exhaustive_regime(spark, emb):
    # nprobe = n_cells and rerank >= corpus: both funnel stages are
    # exhaustive and the exact rerank makes the result equal brute force
    from kafka_connect_ftp_spark.operators.ann import brute_force_topk, build_ivf

    df, rows = emb
    index = build_ivf(df, vec_col="embedding", k=4, seed=42)
    cb = train_pq(df, m=2, ksub=4, seed=7)
    codes = pq_encode(df, cb)
    assigned = index.assigned.join(codes, "vec_id")
    query = rows[11][1]
    got = ivf_pq_search(
        assigned, index.centroids, cb, query, top_k=5, nprobe=4, rerank=200
    ).select("vec_id", F.round("cos_sim", 9).alias("c")).collect()
    want = brute_force_topk(df, query, top_k=5).select(
        "vec_id", F.round("cos_sim", 9).alias("c")
    ).collect()
    assert [(r.vec_id, r.c) for r in got] == [(r.vec_id, r.c) for r in want]


def test_adc_search_plan_is_python_free(spark, emb):
    df, _ = emb
    cb = codebook_from_first_ids(df, m=2, ksub=4)
    enc = pq_encode(df, cb)
    plan = (
        pq_adc_search(enc, cb, [0.0] * 8, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "TakeOrderedAndProject" in plan


def test_dimension_and_size_validation(spark):
    df = _vecs(spark, [(0, [1.0, 2.0, 3.0]), (1, [1.0, 1.0, 1.0])])
    with pytest.raises(ValueError):
        codebook_from_first_ids(df, m=2, ksub=2)  # 3 % 2 != 0
    with pytest.raises(ValueError):
        codebook_from_first_ids(df, m=3, ksub=5)  # only 2 vectors
    cb = PqCodebook(m=1, dsub=3, centroids=[[[0.0, 0.0, 0.0]]])
    with pytest.raises(ValueError):
        adc_table(cb, [1.0, 2.0])  # query dim mismatch


def test_materialized_index_round_trip_and_pruning(spark, emb, tmp_path_factory):
    from kafka_connect_ftp_spark.operators.ann import build_ivf
    from kafka_connect_ftp_spark.operators.pq import (
        ivf_pq_search_indexed,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )

    df, rows = emb
    index = build_ivf(df, vec_col="embedding", k=4, seed=42)
    cb = train_pq(df, m=2, ksub=8, seed=3)
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    write_ivf_pq_index(index, cb, path)
    codes, vectors, centroids, cb2 = read_ivf_pq_index(spark, path)

    # round trip: codebook and centroids survive json exactly
    assert cb2.m == cb.m and cb2.dsub == cb.dsub
    assert cb2.centroids == cb.centroids and centroids == index.centroids

    # search over the opened index == search over the in-memory frame
    query = rows[11][1]
    assigned = index.assigned.join(pq_encode(df, cb), "vec_id")
    want = ivf_pq_search(
        assigned, index.centroids, cb, query, top_k=5, nprobe=2, rerank=50
    ).collect()
    got = ivf_pq_search_indexed(
        codes, vectors, centroids, cb2, query, top_k=5, nprobe=2, rerank=50
    ).collect()
    assert [(r.vec_id, round(r.cos_sim, 9)) for r in got] == [
        (r.vec_id, round(r.cos_sim, 9)) for r in want
    ]

    # the ADC phase's scan is partition-pruned to the probed cells and
    # its ReadSchema carries codes only — never the vector column
    plan = (
        ivf_pq_search_indexed(
            codes, vectors, centroids, cb2, query, top_k=5, nprobe=2, rerank=50
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("PartitionFilters: [") >= 2  # codes AND vectors scans
    codes_scan = [
        seg for seg in plan.split("FileScan parquet")[1:] if "/codes" in seg[:2000]
    ]
    assert codes_scan and all("v:" not in seg[:500] for seg in codes_scan)


def test_nan_and_null_inputs_raise_on_both_encode_paths(spark):
    # ADVICE r5: without a shared NaN policy the expression path yields
    # a NULL code on NaN (array_min/array_position) while numpy argmin
    # picks a real index — the test-pinned-equal paths would diverge and
    # a NULL code would silently drop the row from the ascending top-k.
    # Policy: both paths raise on NULL vectors / NaN-NULL elements.
    cb = PqCodebook(
        m=2, dsub=2, centroids=[[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
    )
    bad_rows = [
        [(1, [0.1, 0.2, float("nan"), 0.4])],  # NaN element
        [(1, None)],  # NULL vector
    ]
    for rows in bad_rows:
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        with pytest.raises(Exception, match="(?i)pq_encode|null|nan"):
            pq_encode(df, cb).collect()
        with pytest.raises(Exception, match="(?i)pq_encode|null|nan"):
            pq_encode_arrow(df, cb).collect()
    # a NULL element inside the array also raises on both paths
    df = spark.createDataFrame(
        [(1, [0.1, None, 0.3, 0.4])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="(?i)pq_encode|null|nan"):
        pq_encode(df, cb).collect()
    with pytest.raises(Exception, match="(?i)pq_encode|null|nan"):
        pq_encode_arrow(df, cb).collect()


def test_indexed_funnel_recall_matrix_production_knobs(spark, tmp_path_factory):
    # VERDICT r5 #4: recall vs brute force at PRODUCTION-shaped knobs
    # (small nprobe, bounded rerank) on a clustered corpus — not just the
    # degenerate nprobe=n_cells/full-rerank exactness point. Pattern:
    # faiss IVFPQ evaluation (recall@k as a function of nprobe/rerank).
    import random as _r

    from kafka_connect_ftp_spark.operators.ann import brute_force_topk, build_ivf
    from kafka_connect_ftp_spark.operators.pq import (
        ivf_pq_search_indexed,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )

    rng = _r.Random(7)
    n_clusters, per, dim = 12, 100, 24
    centers = [
        [rng.gauss(0.0, 10.0) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for c, ctr in enumerate(centers):
        for i in range(per):
            rows.append(
                (c * per + i, [x + rng.gauss(0.0, 0.5) for x in ctr])
            )
    df = _vecs(spark, rows)

    index = build_ivf(df, k=n_clusters, seed=5)
    cb = train_pq(df, m=6, ksub=16, seed=11)
    path = str(tmp_path_factory.mktemp("ivfpq_prod") / "index")
    write_ivf_pq_index(index, cb, path)
    codes, vectors, centroids, cb2 = read_ivf_pq_index(spark, path)

    queries = [
        [x + rng.gauss(0.0, 0.5) for x in centers[c]] for c in (0, 3, 7, 10)
    ]
    top_k = 10

    def recall_at(nprobe, rerank):
        hits = 0
        for q in queries:
            truth = {r.vec_id for r in brute_force_topk(df, q, top_k=top_k).collect()}
            got = {
                r.vec_id
                for r in ivf_pq_search_indexed(
                    codes, vectors, centroids, cb2, q,
                    top_k=top_k, nprobe=nprobe, rerank=rerank,
                ).collect()
            }
            hits += len(truth & got)
        return hits / (top_k * len(queries))

    r1 = recall_at(nprobe=1, rerank=32)
    r2 = recall_at(nprobe=2, rerank=64)
    r4 = recall_at(nprobe=4, rerank=128)
    # nprobe=1 probes the query's own L2 cell but the FINAL ranking is
    # cosine, so some true neighbors live in direction-similar other
    # cells (the classic metric gap a single probe can't cover —
    # observed 0.625 here); widening the funnel closes it (0.95 / 1.0)
    assert r1 >= 0.5, r1
    assert r2 >= 0.85, r2
    assert r4 >= 0.95, r4
    assert r1 <= r2 <= r4
