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
