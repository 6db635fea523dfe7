"""Deterministic train/validation/test splits for training corpora.

Split assignment must be a PURE FUNCTION of the document id — not
``rand()`` — so that (a) re-running the pipeline on a grown corpus never
moves an old document across splits (no eval contamination), (b) any
worker can recompute the assignment without coordination, and (c) the
split survives repartitioning/retries. The assignment hashes
``md5(salt || id)`` into [0, 1) and cuts that interval by the requested
weights — map-side column expressions only, no shuffle, no state.

``stratify_by`` does NOT re-sample; it is exposed for *verification*:
because md5 is uniform and independent of any feature, each stratum's
observed proportions concentrate around the weights (tested), which is
what per-stratum sampling would give without its coordination cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 52)


def split_column(
    id_col: Column | str,
    weights: dict[str, float],
    *,
    salt: str = "v1",
) -> Column:
    """A string column assigning each row to a named split.

    ``weights`` maps split name → positive weight (normalized internally);
    iteration order fixes the interval layout, so pass the same dict (or
    an ordered equal) to reproduce assignments.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    total = float(sum(weights.values()))
    src = F.col(id_col) if isinstance(id_col, str) else id_col
    # top 13 hex chars = 52 uniform bits → exact double in [0, 1)
    u = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), src.cast("string"))), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(_DENOM)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Append the deterministic split assignment column."""
    return df.withColumn(out_col, split_column(id_col, weights, salt=salt))


def assign_splits_clustered(
    df: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe splits: hash the duplicate-CLUSTER key, not the doc
    id, so near-duplicates can never straddle a split boundary (an
    id-hash split puts ~weight% of every near-dup cluster's members in
    eval — the textbook train/test contamination).

    ``clusters`` is a ``(id_col, cluster_col)`` frame — the output of
    ``dedup_cluster.connected_components`` over the near-dup pair graph
    (every cluster member mapped to the cluster's min id). Documents
    absent from ``clusters`` are singletons and hash on their own id,
    so with the same salt they land exactly where :func:`assign_splits`
    puts them — adding cluster-awareness moves ONLY clustered docs.

    Scale: one equi-join on ``id_col`` (the pair graph is tiny relative
    to the corpus, so the cluster side broadcasts or AQE picks the
    strategy) + the same map-side hash; still a pure function of
    content-stable inputs, so re-runs and repartitions never move a
    document."""
    clash = {"_asc_id", "_asc_cluster"} & set(df.columns)
    if clash:
        raise ValueError(
            f"df already has reserved column(s) {sorted(clash)}; rename them "
            "(assign_splits_clustered uses these as join temporaries)"
        )
    reps = clusters.select(
        F.col(id_col).alias("_asc_id"), F.col(cluster_col).alias("_asc_cluster")
    )
    joined = df.join(reps, df[id_col] == F.col("_asc_id"), "left")
    key = F.coalesce(F.col("_asc_cluster"), df[id_col])
    return (
        joined.withColumn(out_col, split_column(key, weights, salt=salt))
        .drop("_asc_id", "_asc_cluster")
    )
