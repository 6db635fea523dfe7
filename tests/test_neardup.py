"""Tiled near-dup pair generation (operators/neardup.py).

The cap must (a) bound how many rows any single applyInPandas task sees,
(b) fan a hot block out into many tiles, and (c) change NOTHING about the
result — tiling is an execution strategy, not an approximation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.neardup import (
    blocked_near_dup_pairs,
    tile_assignments,
)


def _mk_embeddings(spark, n_hot=300, n_cold=40, dim=8, seed=7):
    """One hot block (label 0, n_hot rows) + one small block (label 1)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_hot):
        rows.append((i, [float(x) for x in rng.normal(size=dim)], 0))
    for i in range(n_cold):
        rows.append((10_000 + i, [float(x) for x in rng.normal(size=dim)], 1))
    return spark.createDataFrame(rows, "vec_id long, v array<double>, label int")


def _brute_force_pairs(df):
    """Uncapped in-block all-pairs oracle, computed driver-side."""
    rows = df.collect()
    by_block = {}
    for r in rows:
        by_block.setdefault(r.label, []).append((r.vec_id, np.array(r.v)))
    out = set()
    for vecs in by_block.values():
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                ia, va = vecs[i]
                ib, vb = vecs[j]
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if cos >= 0.3:
                    a, b = min(ia, ib), max(ia, ib)
                    out.add((a, b, round(cos, 4)))
    return out


def test_hot_block_is_split_into_bounded_tiles(spark):
    df = _mk_embeddings(spark)
    cap = 50
    tiled = tile_assignments(df, block_col="label", id_col="vec_id", block_cap=cap)
    sizes = (
        tiled.groupBy("label", "tile_i", "tile_j")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hot = [r for r in sizes if r.label == 0]
    cold = [r for r in sizes if r.label == 1]
    # hot block (300 rows, cap 50 -> 6 chunks) fans out into 21 tiles
    assert len(hot) == 6 * 7 // 2
    # a tile holds at most two hash-chunks; allow hash imbalance headroom
    assert max(r.n for r in hot) <= int(2.5 * cap)
    # the under-cap block stays a single tile with zero replication
    assert len(cold) == 1 and cold[0].n == 40


def test_tiled_pairs_equal_uncapped_result(spark):
    df = _mk_embeddings(spark)
    expected = _brute_force_pairs(df)
    assert expected, "fixture should produce at least one pair"
    for cap in (50, 10_000):  # capped (6 chunks) and uncapped (1 chunk)
        got = {
            (r.vec_a, r.vec_b, round(r.cos_sim, 4))
            for r in blocked_near_dup_pairs(df, block_cap=cap).collect()
        }
        assert got == expected, f"cap={cap}"


def test_scale_smoke_one_hot_block(spark):
    """A pathologically hot block (every row in one quantizer cell) must
    complete with bounded tiles — the exact scenario that OOMs the
    uncapped design (a 12k² similarity matrix in one worker)."""
    rng = np.random.default_rng(1)
    n, dim, cap = 12_000, 8, 1024
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)], 0) for i in range(n)],
        "vec_id long, v array<double>, label int",
    )
    tiles = (
        tile_assignments(df, block_cap=cap)
        .groupBy("tile_i", "tile_j")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    nchunks = -(-n // cap)  # 12
    assert len(tiles) == nchunks * (nchunks + 1) // 2
    assert max(r.c for r in tiles) <= int(2.5 * cap)
    # near-identical planted pair must survive the tiling regardless of
    # which chunks the ids hash into
    v = [float(x) for x in rng.normal(size=dim)]
    planted = spark.createDataFrame(
        [(100_001, v, 0), (100_002, [x * 1.001 for x in v], 0)],
        "vec_id long, v array<double>, label int",
    )
    got = blocked_near_dup_pairs(df.union(planted), block_cap=cap, threshold=0.9999)
    assert (100_001, 100_002) in {(r.vec_a, r.vec_b) for r in got.collect()}


def test_null_block_rows_still_pair(spark):
    # unassigned vectors (NULL block) are a group like any other; the
    # null-safe counts join must not silently drop them
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], None), (2, [1.0, 0.001], None), (3, [0.0, 1.0], 7)],
        "vec_id long, v array<double>, label int",
    )
    got = {(r.vec_a, r.vec_b) for r in blocked_near_dup_pairs(df, block_cap=10).collect()}
    assert got == {(1, 2)}


def test_pair_appears_in_exactly_one_tile(spark):
    # no dedup step exists downstream — the tiling itself must be disjoint
    df = _mk_embeddings(spark, n_hot=120, n_cold=0)
    pairs = blocked_near_dup_pairs(df, block_cap=30, threshold=-1.1)  # keep ALL pairs
    n = pairs.count()
    assert n == 120 * 119 // 2
    assert pairs.select("vec_a", "vec_b").distinct().count() == n


# ----------------------------------------------------------- SemDeDup


def _clustered_emb(spark):
    # 3 well-separated direction clusters; ids 0/1/2 are an exact-dup
    # trio in cluster A (identical direction, slightly different
    # magnitudes — close in L2 too, so the k-means coarse stage cannot
    # scatter them across cells, the documented approximation), 10/11 a
    # near-dup pair in cluster B, the rest distinct. Noise sigma is wide
    # enough (3.0 on magnitude-10 bases) that no noise vector is within
    # cos >= 0.99 of a dup group or another noise vector — the
    # similarity here is DIRECTIONAL, so small per-dim noise would
    # otherwise make everything in a cluster a "duplicate"
    import random

    rng = random.Random(8)
    base_a = [10.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 10.0, 0.0, 0.0]
    base_c = [0.0, 0.0, 10.0, 0.0]
    rows = [
        (0, base_a),
        (1, [x * 1.05 for x in base_a]),
        (2, [x * 1.1 for x in base_a]),
        (10, [0.1, 10.0, 0.0, 0.0]),
        (11, [0.1001, 10.0, 0.0, 0.0]),
    ]
    nid = 20
    for base in (base_a, base_b, base_c):
        for _ in range(6):
            rows.append(
                (nid, [x + rng.gauss(0.0, 3.0) for x in base])
            )
            nid += 1
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def test_semdedup_collapses_groups_keeps_singletons(spark):
    from kafka_connect_ftp_spark.operators.neardup import semdedup_flags

    emb = _clustered_emb(spark)
    out = semdedup_flags(emb, n_clusters=3, eps=0.01, seed=42).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == emb.count()  # one row per vector
    # the exact-dup trio is one group with exactly one keeper
    trio = [by_id[i] for i in (0, 1, 2)]
    assert len({r.group for r in trio}) == 1
    assert sum(r.keep for r in trio) == 1
    # the near-dup pair likewise
    pair = [by_id[i] for i in (10, 11)]
    assert len({r.group for r in pair}) == 1
    assert sum(r.keep for r in pair) == 1
    # singletons keep themselves
    singles = [r for r in out if r.vec_id >= 20]
    assert all(r.keep and r.group == r.vec_id for r in singles)


def test_semdedup_keeper_is_least_centroid_similar(spark):
    from kafka_connect_ftp_spark.operators.neardup import semdedup_flags

    # one cluster; a dup trio where vec 3 is angled slightly AWAY from
    # the centroid direction while still within eps of the others ->
    # the paper's rule keeps the least prototypical member (vec 3),
    # NOT the lowest id
    rows = [
        (1, [10.0, 0.0, 0.0, 0.0]),
        (2, [10.0, 0.0, 0.0, 0.0]),
        (3, [10.0, 0.9, 0.0, 0.0]),
        (4, [9.0, -0.1, 0.3, 0.0]),  # a distinct singleton pulling the centroid
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )
    out = {r.vec_id: r for r in semdedup_flags(emb, n_clusters=1, eps=0.05, seed=1).collect()}
    trio = [out[i] for i in (1, 2, 3)]
    assert len({r.group for r in trio}) == 1
    keepers = [r.vec_id for r in trio if r.keep]
    least = min(trio, key=lambda r: (r.centroid_sim, r.vec_id)).vec_id
    assert keepers == [least]


def test_semdedup_single_cluster_is_exact(spark):
    # n_clusters=1 collapses to all-pairs: the keep set must match a
    # pure-Python brute-force SemDeDup on the same vectors
    import itertools
    import math

    from kafka_connect_ftp_spark.operators.neardup import semdedup_flags

    emb = _clustered_emb(spark)
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    eps = 0.01

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    # brute-force union-find over >= 1-eps pairs
    parent = {i: i for i in rows}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in itertools.combinations(sorted(rows), 2):
        if cos(rows[a], rows[b]) >= 1 - eps:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    centroid = [
        sum(v[j] for v in rows.values()) / len(rows) for j in range(4)
    ]
    groups = {}
    for i in rows:
        groups.setdefault(find(i), []).append(i)
    expect_keep = set()
    for members in groups.values():
        expect_keep.add(
            min(members, key=lambda i: (cos(rows[i], centroid), i))
        )

    got = semdedup_flags(emb, n_clusters=1, eps=eps, seed=42)
    got_keep = {r.vec_id for r in got.filter("keep").collect()}
    assert got_keep == expect_keep


def test_semdedup_null_block_rows_survive(spark):
    # vectors with a NULL block value are a cell like any other — the
    # centroid join must be null-safe or they vanish from the output
    from kafka_connect_ftp_spark.operators.neardup import semdedup_flags

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], None),
            (2, [1.0, 0.0001], None),
            (3, [0.0, 1.0], 7),
        ],
        "vec_id bigint, embedding array<double>, label int",
    )
    out = semdedup_flags(emb, eps=0.01, block_col="label").collect()
    assert {r.vec_id for r in out} == {1, 2, 3}
    by_id = {r.vec_id: r for r in out}
    assert by_id[1].group == by_id[2].group  # the NULL-block near-dup pair
    assert sum(r.keep for r in (by_id[1], by_id[2])) == 1
    assert by_id[3].keep
