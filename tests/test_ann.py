"""IVF ANN tests: trained coarse quantizer, probe search, recall vs the
exact baseline on the real embeddings testdata."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.operators.ann import brute_force_topk, build_ivf, ivf_search
from kafka_connect_ftp_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_tables(spark, SF, "embeddings")["embeddings"]


@pytest.fixture(scope="module")
def index(emb):
    return build_ivf(emb, k=8, seed=42)


def test_every_vector_assigned_exactly_one_cell(emb, index):
    assert index.assigned.count() == emb.count()
    assert index.assigned.select("vec_id").distinct().count() == emb.count()
    cells = {r.cell for r in index.assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(index.centroids) == 8


def test_probe_search_returns_topk_from_probed_cells(emb, index):
    query = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    hits = ivf_search(index, query, top_k=5, nprobe=2).collect()
    assert len(hits) == 5
    # results ordered best-first and drawn only from probed cells
    sims = [r.cos_sim for r in hits]
    assert sims == sorted(sims, reverse=True)
    assert len({r.cell for r in hits}) <= 2
    # the query vector itself lives in a probed cell → perfect self-match
    assert hits[0].cos_sim == pytest.approx(1.0, abs=1e-9)


def test_recall_improves_with_nprobe(emb, index):
    query = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    exact = {r.vec_id for r in brute_force_topk(emb, query, top_k=10).collect()}

    def recall(nprobe):
        got = {r.vec_id for r in ivf_search(index, query, top_k=10, nprobe=nprobe).collect()}
        return len(got & exact) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 == 1.0  # probing all cells == exact
    assert r1 <= r8
