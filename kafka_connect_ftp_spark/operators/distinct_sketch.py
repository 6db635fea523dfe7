"""Mergeable distinct-count sketches: HLL (Apache DataSketches, the
Spark 3.5+ ``hll_sketch_agg`` family) over corpus keys.

Where this sits next to the existing sketch operators: KMV
(``operators/overlap.py``) answers PAIRWISE overlap/Jaccard between
sources; Misra-Gries (``operators/heavy_hitters.py``) answers top-k.
HLL answers "how many DISTINCT x" with a fixed ``2^lgk``-byte state
that is **losslessly mergeable by union**: store one sketch column per
shard/day/source, and any later rollup (all-time distinct tokens, a
month of crawls, train+val unions) is a tiny union-aggregation over
stored sketches — the corpus is never rescanned. That incremental
data-card maintenance is the operator's point; one-shot exact counts
would just use ``count_distinct``.

Scale shape: the sketch aggregation is a standard two-phase Spark agg
(partial sketches map-side, merged on the group key), so the shuffle
carries ``groups × 2^lgk`` bytes regardless of key cardinality. All
JVM-side built-ins; the sketch column is a plain BINARY column any
table format stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_group_distinct(
    df: DataFrame, group_col: str, key_col: str, *, lgk: int = 12
) -> DataFrame:
    """Per-group distinct-``key_col`` estimates WITH the mergeable
    sketch: ``(group_col, hll BINARY, est_distinct BIGINT)``. ``lgk``
    (4-21) trades state (2^lgk bytes) for error (~1.04/sqrt(2^lgk);
    lgk=12 ≈ 1.6%). Persist ``hll`` beside the group for later
    :func:`hll_rollup` calls."""
    if not 4 <= lgk <= 21:
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    per = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll")
    )
    return per.select(
        group_col,
        "hll",
        F.hll_sketch_estimate("hll").cast("long").alias("est_distinct"),
    )


def hll_rollup(sketches: DataFrame, *, group_col: str | None = None) -> DataFrame:
    """Union stored sketches — the rescan-free rollup. With
    ``group_col``, one row per group (e.g. union daily sketches to
    monthly); without, a single ``__all__`` row. Input needs an ``hll``
    binary column from :func:`hll_group_distinct` (sketches built with
    ANY mix of lgk merge at the smallest lgk; pass
    ``allowDifferentLgConfigK`` semantics are the union agg's default
    False — keep one lgk per sketch family)."""
    union = F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll")
    if group_col is None:
        out = sketches.agg(union).select(
            F.lit("__all__").alias("group"),
            "hll",
            F.hll_sketch_estimate("hll").cast("long").alias("est_distinct"),
        )
        return out
    return (
        sketches.groupBy(group_col)
        .agg(union)
        .select(
            group_col,
            "hll",
            F.hll_sketch_estimate("hll").cast("long").alias("est_distinct"),
        )
    )
