"""Streaming C4-style span dedup: the batch operator's corpus-wide
"keep only the first occurrence of every span" rule applied
incrementally, so a continuously-curated corpus gets the same span-
level boilerplate removal the batch pipeline applies
(operators/span_dedup.py) — previously the streaming curation face had
near-dup + quality + blocklist stages but no span stage, so a stream-
built corpus kept every repeated license block the batch build removed.

Semantics: a span (paragraph/line/sentence — same units, same
glue-preserving sentence splitter, same trailing-whitespace-stripped
dedup key as the batch operator) is kept iff its key was never admitted
by ANY earlier batch and this is its first occurrence (min ``(doc_id,
idx)``) within the current batch. With monotone doc_ids across batches
this equals the batch operator run over the concatenated corpus — the
stream==batch parity the quality gate and near-dup stages already pin.

State is the minimum possible: ONE 8-byte xxhash64 per admitted span,
partitioned ``epoch=N`` per batch exactly like the near-dup band state
(neardup_stream.py), with the same crash-recovery argument: the state
read EXCLUDES the calling batch's own epoch, so a replay recomputes
against exactly the pre-batch state and rewrites sink and state
byte-identically no matter how torn the first attempt was. At 100 TB
the state is (distinct spans ever admitted) longs; bucket it on ``h``
(the ingest bucket_state pattern, ingest/pipeline.py) to make the
per-batch anti-join bucket-local instead of a full state shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.span_dedup import (
    _SPLITTERS,
    span_key,
    span_units,
)


def read_span_state(
    spark,
    state_dir: str,
    *,
    exclude_epoch: int | None = None,
) -> DataFrame | None:
    """Read the admitted-span-hash state, or None for the genuine first
    batch. Reading WITH an explicit schema matters for crash recovery:
    a state dir that exists but holds no committed file (crash during
    the very first write left only _temporary) would otherwise raise
    UNABLE_TO_INFER_SCHEMA on every replay — permanently wedging the
    stream — where an explicit schema reads it as empty.

    ``exclude_epoch`` drops the calling batch's own ``epoch=N`` rows: a
    crash DURING that write can leave a torn subset of the batch's span
    hashes visible, and a replay reading them would drop the partially-
    covered documents' own spans as "duplicates" of themselves."""
    from pyspark.errors import AnalysisException

    try:
        seen = spark.read.schema("h long, epoch integer").parquet(state_dir)
    except AnalysisException as exc:
        # ONLY the genuine first-batch case may proceed stateless; any
        # other read failure (corrupt footer, FS hiccup) must fail the
        # batch, or every span would bypass the cross-batch check and
        # boilerplate already removed upstream would re-enter the corpus
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        return None
    if exclude_epoch is not None:
        seen = seen.filter(
            F.col("epoch").isNull() | (F.col("epoch") != exclude_epoch)
        )
    return seen.drop("epoch")


def dedup_spans_micro_batch(
    batch: DataFrame,
    seen_hashes: DataFrame | None,
    *,
    unit: str = "paragraph",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """One batch through the span gate. Returns ``(rebuilt_docs,
    admitted_hashes)``: ``rebuilt_docs`` is the batch with ``text_col``
    rebuilt from surviving spans (byte-exact when nothing was dropped)
    plus ``n_spans``/``n_dropped`` counters; ``admitted_hashes`` is the
    one-column ``h`` frame of span keys this batch admitted (the state
    delta). ``seen_hashes`` is the accumulated state or None for the
    first batch. Exposed separately so tests and batch backfills run
    the exact stream transformation."""
    if unit not in _SPLITTERS:
        raise ValueError(f"unit must be one of {sorted(_SPLITTERS)}, got {unit!r}")
    clash = {"n_spans", "n_dropped"} & (set(batch.columns) - {text_col})
    if clash:
        raise ValueError(f"batch carries reserved column(s) {sorted(clash)}")
    sep = _SPLITTERS[unit][1]
    units = span_units(
        batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        unit,
    )
    key = span_key(unit)
    eligible = (F.length(key) >= min_chars) & (F.trim(F.col("span")) != "")
    # metadata-only decision frame (the batch operator's design): only
    # (hash, doc_id, idx) shuffle; the first IN-BATCH occurrence per
    # hash is a min-struct aggregation (map-side combine, no window)
    meta = units.select(
        F.xxhash64(key).alias("h"), "doc_id", "idx", eligible.alias("elig")
    )
    fresh = meta.filter("elig")
    if seen_hashes is not None:
        fresh = fresh.join(seen_hashes, "h", "left_anti")
    winners = (
        fresh.groupBy("h")
        .agg(F.min(F.struct("doc_id", "idx")).alias("w"))
        .select(
            "h",
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.idx").alias("idx"),
            F.lit(True).alias("is_winner"),
        )
    )
    decided = units.join(
        winners.drop("h"), ["doc_id", "idx"], "left"
    ).withColumn("keep", ~eligible | F.coalesce(F.col("is_winner"), F.lit(False)))
    rebuilt = decided.groupBy("doc_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("idx", "span")))
                ),
                lambda s: s.span,
            ),
        ).alias("_rebuilt_text"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
    )
    out = (
        batch.join(
            rebuilt.withColumnRenamed("doc_id", id_col), id_col, "inner"
        )
        .withColumn(text_col, F.col("_rebuilt_text"))
        .drop("_rebuilt_text")
    )
    return out, winners.select("h")


def make_span_dedup_step(
    spark,
    out_dir: str,
    state_dir: str,
    *,
    unit: str = "paragraph",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
    idempotent: bool = False,
):
    """Build the foreachBatch function (exposed so tests can drive a
    replayed batch directly — a crash replay IS calling the step again
    with the same (batch, batch_id)). ``idempotent=True`` writes each
    batch to its own ``epoch=N`` partition with overwrite (the
    idempotent_parquet_sink pattern) — combined with the state read
    excluding the own epoch, a replay after a crash at ANY point
    rewrites both the sink epoch and the state epoch byte-identically."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        seen = read_span_state(spark, state_dir, exclude_epoch=batch_id)
        out, admitted = dedup_spans_micro_batch(
            batch, seen,
            unit=unit, id_col=id_col, text_col=text_col, min_chars=min_chars,
        )
        # checkpoint once: the decision chain feeds BOTH the delivery
        # and the state delta; without it the whole plan re-executes
        # per writer (deterministic, but twice the work per batch)
        out = out.localCheckpoint(eager=True)
        admitted = admitted.localCheckpoint(eager=True)
        if idempotent:
            if out.isEmpty():
                return
            out.write.mode("overwrite").parquet(f"{out_dir}/epoch={batch_id}")
        else:
            out.write.mode("append").parquet(out_dir)
        # per-epoch overwrite, not a flat append: a replay rewrites its
        # OWN epoch idempotently and read_span_state's exclude_epoch
        # makes a torn first attempt invisible to it (module doc)
        admitted.write.mode("overwrite").parquet(f"{state_dir}/epoch={batch_id}")

    return _step


def start_span_dedup(
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    *,
    unit: str = "paragraph",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 1,
    idempotent: bool = False,
    trigger: str | None = None,
):
    """Wire the step into writeStream.foreachBatch. ``trigger`` is a
    processing-time interval ('5 seconds') or None for as-fast-as-
    possible micro-batches."""
    step = make_span_dedup_step(
        stream.sparkSession, out_dir, state_dir,
        unit=unit, id_col=id_col, text_col=text_col,
        min_chars=min_chars, idempotent=idempotent,
    )
    writer = stream.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()
