"""Blocked all-pairs embedding similarity with a hard per-task size cap.

``blocked_near_dup_pairs`` computes every within-block pair with
``cos >= threshold``, where a *block* is a coarse partition (quantizer
cell, LSH bucket, label). The naive design — one ``applyInPandas`` group
per block — materializes an ``n_block x n_block`` similarity matrix in a
single Python worker, so one hot block (skewed data, degenerate
clustering) means O(n²) memory on one executor and an OOM at scale.

Here a block larger than ``block_cap`` rows is deterministically split
into ``nchunks = ceil(n / block_cap)`` chunks (``xxhash64(id) mod
nchunks``), and every unordered chunk pair ``(i <= j)`` becomes one
*tile* task. Each row is replicated into its ``nchunks`` tiles — the
standard triangle/tile decomposition of a blocked matrix product:

- **exact**: every in-block pair lands in exactly one tile (the tile of
  its two chunk ids), so no candidate is ever dropped — the result is
  identical to the uncapped operator, and the SQL oracle stays green;
- **bounded**: a tile holds at most two chunks, so a task's similarity
  matrix is ~``block_cap²`` entries no matter how hot the block is;
- **parallel**: a hot block fans out into ``nchunks·(nchunks+1)/2``
  independent tasks instead of serializing on one worker — this is also
  what recovers parallelism at small scale factors where only a handful
  of blocks exist.

Blocks at or under the cap keep ``nchunks = 1`` — a single tile, zero
replication — so the common case pays nothing.

Reference scope note: the reference connector (kafka-connect-ftp) has no
similarity operators at all (SURVEY §2.11); this is a north-star
extension for LLM-corpus near-dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIR_SCHEMA = "vec_a long, vec_b long, cos_sim double"


def tile_assignments(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    block_cap: int = 2048,
) -> DataFrame:
    """Replicate each row into its chunk-pair tiles within its block.

    Adds ``chunk`` (this row's chunk id), ``tile_i``/``tile_j`` (the tile
    the replica belongs to, ``tile_i <= tile_j``). Exposed separately from
    the pair computation so tests can assert the cap actually bounds tile
    sizes.
    """
    counts = df.groupBy(block_col).agg(F.count(F.lit(1)).alias("_block_n"))
    nchunks = F.ceil(F.col("_block_n") / F.lit(block_cap)).cast("int")
    # null-safe join: a NULL block (unassigned vectors) is a group like
    # any other — a plain equi-join would silently drop those rows
    sized = F.broadcast(
        counts.withColumn("_nchunks", nchunks).withColumnRenamed(block_col, "_cblk")
    )
    return (
        df.join(sized, F.col(block_col).eqNullSafe(F.col("_cblk")))
        .drop("_cblk")
        .withColumn("chunk", F.pmod(F.xxhash64(F.col(id_col)), F.col("_nchunks")).cast("int"))
        .withColumn("_other", F.explode(F.sequence(F.lit(0), F.col("_nchunks") - 1)))
        .withColumn("tile_i", F.least("chunk", "_other"))
        .withColumn("tile_j", F.greatest("chunk", "_other"))
        .drop("_block_n", "_nchunks", "_other")
    )


def blocked_near_dup_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.3,
    block_cap: int = 2048,
) -> DataFrame:
    """All within-block pairs with cosine similarity >= ``threshold``.

    ``df`` must carry ``id_col`` (long), ``vec_col`` (array<double>) and
    ``block_col``. Returns ``vec_a < vec_b`` pairs with raw (unrounded)
    ``cos_sim``. See module doc for the tiled execution design.
    """
    tiled = tile_assignments(df, block_col, id_col, block_cap).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        block_col,
        "chunk",
        "tile_i",
        "tile_j",
    )

    def tile_pairs(key, pdf):
        _, tile_i, tile_j = key
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        pdf = pdf.sort_values("_id")
        if tile_i == tile_j:
            ids = pdf["_id"].to_numpy()
            m = np.stack(pdf["_v"].to_numpy())
            nrm = np.sqrt((m * m).sum(axis=1))
            sim = (m @ m.T) / np.outer(nrm, nrm)
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = sim[ia, ib] >= threshold
            return pd.DataFrame(
                {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]], "cos_sim": sim[ia, ib][keep]}
            )
        a = pdf[pdf["chunk"] == tile_i]
        b = pdf[pdf["chunk"] == tile_j]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        ids_a, ids_b = a["_id"].to_numpy(), b["_id"].to_numpy()
        ma, mb = np.stack(a["_v"].to_numpy()), np.stack(b["_v"].to_numpy())
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        sim = (ma @ mb.T) / np.outer(na, nb)
        ia, ib = np.nonzero(sim >= threshold)
        xa, xb = ids_a[ia], ids_b[ib]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(xa, xb),
                "vec_b": np.maximum(xa, xb),
                "cos_sim": sim[ia, ib],
            }
        )

    return tiled.groupBy(block_col, "tile_i", "tile_j").applyInPandas(
        tile_pairs, _PAIR_SCHEMA
    )


def semdedup_flags(
    emb: DataFrame,
    *,
    n_clusters: int = 16,
    eps: float = 0.03,
    seed: int = 42,
    block_cap: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by embedding —
    cluster the corpus, find within-cluster pairs with
    ``cos >= 1 - eps``, and keep ONE representative per duplicate
    group: the member LEAST similar to its cluster centroid (the
    paper's choice — the least prototypical copy preserves the most
    diversity), ties broken by lowest id.

    Clustering: k-means (``n_clusters``) by default; ``n_clusters=1``
    is the exact all-pairs regime (corpus-mean centroid, no KMeans);
    ``block_col`` names a PRECOMPUTED partition column instead (shard,
    topic label, an earlier quantizer's cell) — deterministic, no
    training step, centroids = per-block means. The block path is what
    the oracle-gated plan uses.

    Returns one row per input vector: ``(vec_id, cell, group,
    centroid_sim, keep)`` — ``group`` is the duplicate-group id (min
    reachable vec_id; singletons group with themselves and are kept).

    Scale shape (100 TB): clustering runs once at index-build cost
    (per-block means are one dim-bounded aggregate); within-cluster
    pair generation is the tiled/capped :func:`blocked_near_dup_pairs`
    (no task ever materializes more than ~block_cap² similarities, hot
    clusters fan out); the group decision is the size-adaptive
    connected components of ``operators/dedup_cluster.py``; the
    representative choice is one min_by aggregation over (group, sim,
    id) triples. The vectors themselves never shuffle after the pair
    stage. Approximation boundary, per the paper: duplicates split
    across DIFFERENT cells are not compared — cell granularity trades
    that recall against per-cluster pair cost."""
    from kafka_connect_ftp_spark.operators.dedup_cluster import connected_components

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    cent_df = None
    if block_col is not None:
        assigned = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.col(block_col).alias("cell"),
        )
    elif n_clusters == 1:
        # the exact regime: no coarse stage (Spark ML KMeans needs k>=2)
        # — every vector in one cell whose centroid is the corpus mean
        assigned = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.lit(0).alias("cell"),
        )
    else:
        from kafka_connect_ftp_spark.operators.ann import build_ivf

        index = build_ivf(emb, vec_col=vec_col, id_col=id_col, k=n_clusters, seed=seed)
        assigned = index.assigned
        spark = emb.sparkSession
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(index.centroids)],
            "cell int, _c array<double>",
        )
    if cent_df is None:
        # per-cell mean centroid from the data itself: one aggregate
        # whose state is bounded by cells × dim (map-side combined)
        cent_df = (
            assigned.select("cell", F.posexplode("v").alias("_pos", "_x"))
            .groupBy("cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(_pos, _m))), s -> s._m)"
                ).alias("_c")
            )
        )
    pairs = blocked_near_dup_pairs(
        assigned,
        block_col="cell",
        id_col="vec_id",
        vec_col="v",
        threshold=1.0 - eps,
        block_cap=block_cap,
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    comps = connected_components(pairs).select(
        F.col("doc_id").alias("vec_id"), F.col("cluster").alias("group")
    )
    # per-vector cosine to its own cell centroid, map-side against the
    # BROADCAST centroid frame (cells × dim floats — tiny at any real k)
    dot = "aggregate(zip_with(v, _c, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    nrm = "sqrt(aggregate(transform({0}, x -> x * x), 0.0D, (acc, x) -> acc + x))"
    scored = (
        # null-safe: a NULL block (unassigned vectors) is a cell like any
        # other — blocked_near_dup_pairs already pairs within it, and an
        # inner equi-join here would silently DROP those rows from the
        # one-row-per-vector output
        assigned.join(
            F.broadcast(cent_df.withColumnRenamed("cell", "_ccell")),
            F.col("cell").eqNullSafe(F.col("_ccell")),
        )
        .drop("_ccell")
        .withColumn(
            "centroid_sim",
            F.when(
                (F.expr(nrm.format("v")) == 0.0) | (F.expr(nrm.format("_c")) == 0.0),
                F.lit(0.0),
            ).otherwise(
                F.expr(dot) / (F.expr(nrm.format("v")) * F.expr(nrm.format("_c")))
            ),
        )
        .select("vec_id", "cell", "centroid_sim")
    )
    grouped = scored.join(comps, "vec_id", "left").withColumn(
        "group", F.coalesce(F.col("group"), F.col("vec_id"))
    )
    keeper = grouped.groupBy("group").agg(
        F.expr("min_by(vec_id, struct(centroid_sim, vec_id))").alias("_keep_id")
    )
    return (
        grouped.join(keeper, "group")
        .select(
            "vec_id",
            "cell",
            "group",
            "centroid_sim",
            (F.col("vec_id") == F.col("_keep_id")).alias("keep"),
        )
    )
