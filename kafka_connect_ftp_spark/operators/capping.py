"""Per-group document caps: keep at most ``n`` rows per group — the
corpus-curation step that stops a handful of giant domains (or sources,
or URL prefixes) from dominating a training mixture.

Scale design: the filter is ``row_number() <= n`` over a per-group
window, which Catalyst rewrites with **WindowGroupLimit** (Spark 3.5+):
every map task pre-prunes to its local top-n per group BEFORE the
shuffle, so a domain with a billion pages ships ``n`` rows per mapper
instead of a billion rows into one reducer — the same partial-limit
shape that makes the changelog/argmax rank-1 plans hot-key-safe
(docs/SCALING.md, "aggregation-over-window" rule; WindowGroupLimit is
the one window form that IS skew-safe). The ordering column decides
WHICH n survive (e.g. a quality score, descending), with ``doc_id`` as
the deterministic tiebreaker so reruns keep the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    *,
    order_col: str = "doc_id",
    descending: bool = False,
    tiebreak_col: str = "doc_id",
) -> DataFrame:
    """Keep the first ``n`` rows per ``group_col`` value, ranked by
    ``order_col`` (then ``tiebreak_col`` for determinism). NULL groups
    form their own group and are capped like any other."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(order, F.col(tiebreak_col).asc())
    rn = "_rn"
    while rn in df.columns:  # collision-proof scratch name
        rn += "_"
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n)
        .drop(rn)
    )
