"""Data layout maintenance: Z-order (Morton) clustering for write-path
locality, and small-file compaction for incrementally-built tables.

A 100 TB table sorted by one column prunes scans on that column only;
queries filtering on a SECOND column read everything. Interleaving the
bits of several columns into one Morton key and range-partitioning +
sorting the write by that key gives every file a narrow min/max envelope
on EVERY participating dimension, so parquet file/row-group statistics
prune multi-column predicates — the layout idea behind Delta Lake's
``OPTIMIZE ZORDER BY`` and the classic UB-tree, re-expressed as plain
Spark expressions (no engine fork needed: the key is just a column).

Pipeline use: lay out training shards by (source, quality-bucket) or
(date-bucket, domain-hash) so curation re-runs that slice on either
dimension touch a fraction of the files.

Everything is JVM-side bit arithmetic (``shiftright``/``&``/``|`` folds
— whole-stage codegen, no Python, no shuffle beyond the one
``repartitionByRange`` the clustered write requires).

Columns are first rank-normalized OR caller-bucketed to ``bits``-bit
non-negative ints; ``zorder_key`` then interleaves them LSB-first
(column 0 owns bit positions 0, n, 2n, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.hadoop_fs import data_file_sizes


def zorder_key(
    cols: list[Column | str], *, bits: int = 16, null_bucket: int | None = None
) -> Column:
    """The Morton key of ``len(cols)`` pre-bucketed int columns.

    Each input must already be a NON-NEGATIVE int below ``2**bits``
    (use :func:`bucketize` for arbitrary numerics); values at or above
    the cap would silently collide, so callers own the bucketing.
    Returns a BIGINT column: bit ``i`` of column ``j`` lands at output
    position ``i * len(cols) + j``. ``bits * len(cols)`` must fit 63.

    NULL policy (round 10 — a NULL dimension used to NULL-poison the
    whole key, and ``repartitionByRange`` piles every NULL-key row into
    ONE partition: a skew cliff on exactly the nullable-score curation
    tables this layout targets): ``null_bucket=k`` routes a NULL
    dimension to bucket ``k`` (pick ``0`` or ``2**bits - 1`` so NULLs
    sort to a key-range edge), letting null-bearing rows still
    interleave — and therefore distribute — on their other dimensions.
    With the default ``null_bucket=None`` a NULL dimension fails the
    job loudly at execution instead of silently skewing the write.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits * n_cols = {bits * n} exceeds a signed 64-bit key")
    if null_bucket is not None and not 0 <= null_bucket < (1 << bits):
        raise ValueError(f"null_bucket must be in [0, 2**{bits}), got {null_bucket}")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        if null_bucket is not None:
            col = F.coalesce(col, F.lit(int(null_bucket)).cast("long"))
        else:
            col = F.when(
                col.isNull(),
                F.raise_error(
                    F.lit(
                        f"zorder_key: NULL in dimension {j} — pass "
                        "null_bucket= to route NULLs (or filter them); a "
                        "NULL Morton key would skew the clustered write "
                        "into one partition"
                    )
                ).cast("long"),
            ).otherwise(col)
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return key


def zorder_key_sql(
    col_names: list[str], *, bits: int = 16, null_bucket: int | None = None
) -> str:
    """The same interleave as a portable SQL expression (explicit
    shift-and-mask sum, no engine bit builtins beyond ``>>``/``<<``/
    ``&``) — used by the oracle-checked plan so the key definition is
    hash-pinned across engines. Each extracted bit is widened to BIGINT
    BEFORE the left shift: engines that keep INT32 arithmetic for INT32
    operands (DuckDB) would otherwise overflow at shift positions >= 31,
    while the Spark twin casts to long up front. ``null_bucket`` mirrors
    :func:`zorder_key`'s NULL routing as a ``COALESCE`` (SQL has no
    raise-on-NULL analog; the None form simply propagates NULL)."""
    n = len(col_names)
    cols = (
        col_names
        if null_bucket is None
        else [f"COALESCE({c}, {int(null_bucket)})" for c in col_names]
    )
    terms = [
        f"((CAST(({c} >> {i}) & 1 AS BIGINT)) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " | ".join(terms) + ")"


def bucketize(col: Column | str, lo: float, hi: float, *, bits: int = 16) -> Column:
    """Map a numeric column into ``[0, 2**bits)`` by linear scaling over
    ``[lo, hi]`` (clamped; NULL stays NULL so callers can route NULLs
    explicitly). ``lo``/``hi`` come from table stats — at scale, from the
    catalog, not a per-write scan."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    cap = (1 << bits) - 1
    scaled = F.floor((c - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * (1 << bits))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(cap)).cast("long")
    # greatest/least SKIP nulls (greatest(NULL, 0) = 0) — guard so a NULL
    # input stays NULL instead of silently landing in bucket 0. NaN gets
    # the same route (review 9b): floor(NaN) casts to 0, which would
    # cluster NaN rows into bucket 0 indistinguishably from lo-valued
    # rows — the exact silent landing this guard exists to prevent
    return F.when(c.isNull() | F.isnan(c), F.lit(None).cast("long")).otherwise(
        clamped
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    key: Column,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Morton ``key``: one range shuffle on
    the key (Spark samples the key distribution, so files get balanced
    row counts even when the key space is sparse) + an in-partition sort,
    then parquet. Each output file covers a contiguous Z-range —
    a narrow min/max envelope on every interleaved dimension — which is
    what parquet footer stats need for multi-column skipping."""
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def plan_compaction(spark, path: str, *, target_file_bytes: int = 512 * 1024 * 1024) -> dict:
    """The compaction decision for a parquet dir: current file count /
    bytes and the target file count ``ceil(total / target)``. Compression
    ratio carries over (the estimate is from CURRENT file bytes, not
    in-memory row size). ``needed`` is False when the layout is already
    at-or-under the target count — rewriting would burn a full read+write
    of the table for nothing."""
    if target_file_bytes < 1:
        raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
    sizes = data_file_sizes(spark, path)
    total = sum(sizes)
    n_target = max(1, -(-total // target_file_bytes))
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "n_target": n_target,
        "needed": len(sizes) > n_target,
    }


def _compacted_frame(df: DataFrame, n: int, sort_by: list[str] | None) -> DataFrame:
    """The rewrite plan compact_table executes (factored so tests pin
    the REAL code path): coalesce — zero shuffle — by default, range
    shuffle + in-partition sort with ``sort_by``."""
    if sort_by:
        return df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    return df.coalesce(n)


def compact_table(
    spark,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 512 * 1024 * 1024,
    sort_by: list[str] | None = None,
    mode: str = "error",
    force: bool = False,
) -> dict:
    """Rewrite a fragmented parquet dir into ~``target_file_bytes`` files
    — the housekeeping every incrementally-built curation table needs
    (each micro-batch/tick appends small files; a 100 TB table drifts
    to millions of them, and scan task scheduling + footer reads come to
    dominate). Returns the :func:`plan_compaction` report plus
    ``compacted`` (False = already at/under target, rewrite skipped
    unless ``force``) and ``n_files_after``.

    Never in-place: reading and overwriting ONE path in the same job
    deletes input files under the running scan, and a crash mid-write
    loses the table — a safe in-place swap needs a table format with an
    atomic commit (Delta/Iceberg). Write to ``dest_path`` and flip
    whatever pointer the caller owns (the versioned-dir + marker
    convention of ingest/pipeline.py).

    Without ``sort_by`` the rewrite is a ``coalesce`` — NO shuffle: each
    output task reads ~total/n bytes of small files and streams one big
    file back out, so compacting costs one pass of I/O. With ``sort_by``
    it is a ``repartitionByRange`` + in-partition sort (one shuffle),
    which restores cluster layout (file-skipping envelopes) at the same
    time — for multi-dimension layout use :func:`write_zordered` with a
    Morton key instead."""
    plan = plan_compaction(spark, src_path, target_file_bytes=target_file_bytes)
    # already at-or-under the target count: skip the rewrite entirely
    # (a periodic maintenance job must not re-pay a full table pass per
    # run); `force=True` rewrites anyway, e.g. to apply a new sort_by
    if not plan["needed"] and not force:
        return {**plan, "compacted": False, "n_files_after": plan["n_files"]}
    out = _compacted_frame(spark.read.parquet(src_path), plan["n_target"], sort_by)
    out.write.mode(mode).parquet(dest_path)
    return {
        **plan,
        "compacted": True,
        "n_files_after": len(data_file_sizes(spark, dest_path)),
    }


def file_envelope_report(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` for a written table — the layout
    quality metric: the mean (max-min)/global-range per dimension is the
    expected fraction of files a point/range predicate must touch.
    Diagnostic tool (one narrow scan of the table); not a hot-path op."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("_file").agg(*aggs)
