"""Skew mitigation: salted aggregation and salted joins.

AQE (``spark.sql.adaptive.skewJoin``) splits skewed *partitions* at
runtime, but a single hot KEY still lands on one reducer. These operators
implement the classic salting patterns for that case:

- ``salted_aggregate``: two-phase aggregation — append a random salt to
  the key, partially aggregate (key, salt), then aggregate the partials.
  Correct for decomposable aggregates (sum/count/min/max); avg is derived
  as sum/count at the outer level.
- ``salted_join``: explode the build (small/dim) side once per salt value
  and salt the probe side randomly, so a hot probe key spreads over
  ``n_salts`` reducers. Build-side rows replicate ×n_salts — keep the
  build side the smaller one.

Salting trades shuffle volume (replication, extra column) for balance; use
only on keys whose frequency justifies it (detect via a cheap
``groupBy(key).count`` sample or AQE metrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — per-row, non-deterministic by
    design (balance, not reproducibility)."""
    return df.withColumn(col_name, (F.rand() * n_salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> (combiner, partial expression):
    combiner is "sum"|"min"|"max" applied to the per-salt partials.
    Example: {"n": ("sum", F.count(F.lit(1))), "total": ("sum", F.sum("x"))}
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (_, expr) in aggs.items()]
    )
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[combiners[comb](f"_p_{name}").alias(name) for name, (comb, _) in aggs.items()]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated
    ×``n_salts``, eliminating single-key reducer hot spots.

    Only probe-preserving join types are valid: the build side exists in
    ``n_salts`` replicas, so right/full outer would surface each
    unmatched replica as its own null-probe row (up to n_salts duplicates
    per build key)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated build "
            "side would emit one null-probe row per unmatched salt replica"
        )
    salted_probe = with_salt(probe, n_salts)
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_probe.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")
