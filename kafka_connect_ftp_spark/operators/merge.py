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


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Audit diff between two corpus snapshots: one row per id present
    in either side, ``status`` in {'added', 'removed', 'changed',
    'unchanged'} — what changed between pipeline runs, the corpus-grain
    analog of the ingest snapshot's per-file change detection.

    Scale: both sides reduce to a per-id digest BEFORE the full-outer
    join, so payloads (text, embeddings, binaries) never shuffle — the
    join carries a handful of longs per document. ``compare_cols``
    defaults to every shared non-id column. NULLs are position-exact:
    each column is folded as ``coalesce(cast(string), sentinel)``
    because xxhash64 SKIPS null arguments — a bare multi-column hash
    would report ('a', NULL) → (NULL, 'a') as unchanged. Duplicate ids
    (legal in crawl corpora: doc_id = content hash) fold into an
    order-insensitive multiset digest — bit_xor of row hashes AND their
    wrapping sum, plus count — so a side whose duplicate ROWS differ
    still reads as changed: xor alone is multiplicity-mod-2 (old
    {r1,r1,r2} vs new {r3,r3,r2} xors identically because paired
    duplicates cancel — and doc_id = content hash makes exact-duplicate
    PAIRS the common shape), but their sums differ unless every row
    hash collides, so the (xor, sum, count) triple only misses
    engineered 64-bit collisions."""
    if compare_cols is None:
        compare_cols = sorted((set(old.columns) & set(new.columns)) - {id_col})
    if not compare_cols:
        raise ValueError("no shared columns to compare; pass compare_cols")
    missing = [c for c in [id_col, *compare_cols] if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns {missing} not present on both sides")

    def digest(df: DataFrame, name: str) -> DataFrame:
        row_h = F.xxhash64(
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
                for c in compare_cols
            ]
        )
        return (
            df.select(F.col(id_col), row_h.alias("_h"))
            .groupBy(id_col)
            .agg(
                F.bit_xor("_h").alias(f"{name}_h"),
                # sum alongside the xor: xor cancels on PAIRED duplicate
                # rows, sum doesn't. decimal(38,0) keeps the sum exact
                # (would need ~10^19 rows per id to overflow 38 digits);
                # try_sum caps the pathological case as NULL instead of
                # an ANSI abort
                F.try_sum(F.col("_h").cast("decimal(38,0)")).alias(f"{name}_s"),
                F.count(F.lit(1)).alias(f"{name}_n"),
            )
        )

    # null-safe id equality (review 9b): each side's NULL-id rows digest
    # into one group, but a plain equality join never matches NULL to
    # NULL — an unchanged NULL-id document would report as BOTH 'added'
    # and 'removed', over-counting churn every run
    do = digest(old, "_old").withColumnRenamed(id_col, "_old_id")
    dn = digest(new, "_new").withColumnRenamed(id_col, "_new_id")
    joined = (
        do.join(dn, F.col("_old_id").eqNullSafe(F.col("_new_id")), "full_outer")
        .withColumn(id_col, F.coalesce("_old_id", "_new_id"))
        .drop("_old_id", "_new_id")
    )
    return joined.select(
        id_col,
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(
            (F.col("_old_h") != F.col("_new_h"))
            # null-safe: try_sum yields NULL on decimal(38,0) overflow, and
            # a plain != would make the whole predicate NULL-degrade to the
            # xor+count checks alone — an overflowed side must read as
            # "changed", not silently weaken the paired-duplicate guarantee
            | ~F.col("_old_s").eqNullSafe(F.col("_new_s"))
            | (F.col("_old_n") != F.col("_new_n")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
