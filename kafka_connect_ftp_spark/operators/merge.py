"""MERGE INTO emulation for plain-parquet targets (no Delta/Iceberg jars
in this build): the standard anti-join + union rewrite.

``merge_upsert`` is the generalized form of the snapshot plan's state
merge (ingest/snapshot.py — updated rows replace, others carry over):

    MERGE INTO target USING source ON key
      WHEN MATCHED THEN UPDATE SET *        (last-write-wins by default)
      WHEN NOT MATCHED THEN INSERT *

With a real lakehouse table format the same call maps 1:1 onto MERGE
INTO; the rewrite here costs one shuffle on the key (plus the rewrite of
untouched rows, which Delta avoids via file pruning — noted so nobody
mistakes this for free at 100 TB; partition the target and merge per
partition to bound the rewrite).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    when_matched: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Upsert ``source`` rows into ``target`` on ``keys``.

    Default matched-behavior replaces the whole row with the source row
    (SCD1). Pass ``when_matched(matched_target, source) -> DataFrame`` for
    custom update logic (it receives the matched target rows and the full
    source; must return rows in target schema).

    NOTE: the duplicate-key guard below is an EAGER extra action — it
    aggregates ``source`` once before the merge plan itself evaluates it
    again. If ``source`` is expensive to recompute, or non-deterministic
    (e.g. derived from ``rand()`` or an uncheckpointed shuffle whose
    re-evaluation could yield different rows — letting the check pass
    while the merge still materializes duplicates), ``cache()`` or
    ``localCheckpoint()`` it first so both the guard and the merge see
    one frozen frame.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target={sorted(target.columns)} source={sorted(source.columns)}"
        )
    # SQL MERGE raises on multiple source rows per key; silently unioning
    # them would leave duplicate target rows that every later merge
    # propagates. Same check, same contract.
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        keyvals = {k: dup[0][k] for k in keys}
        raise ValueError(f"source has multiple rows for merge key {keyvals}")
    untouched = target.join(source.select(*keys), keys, "left_anti")
    if when_matched is None:
        merged = source
    else:
        matched = target.join(source.select(*keys), keys, "left_semi")
        updated = when_matched(matched, source)
        inserts = source.join(target.select(*keys), keys, "left_anti")
        merged = updated.unionByName(inserts)
    return untouched.unionByName(merged.select(*target.columns))
