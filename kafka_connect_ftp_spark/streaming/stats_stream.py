"""Incremental corpus data card: per-source composition stats
maintained ACROSS micro-batches — the streaming face of
``operators/corpus_stats.py`` + ``operators/distinct_sketch.py``.

A continuously-ingesting corpus wants its data card (docs/bytes/tokens
per source, distinct-token estimates) kept current without periodic
full rescans. Counts are trivially mergeable (sum); distinct counts are
NOT — which is exactly what the HLL sketch column solves: the card
stores one ``2^lgk``-byte sketch per source, each micro-batch merges
its batch-local sketch in by union, and the estimate stays as good as a
full rescan's.

Durability/replay (the versioned-state convention of
``ingest/pipeline.py``): the card lives as versioned parquet dirs
``v%06d`` under ``card_dir`` with a ``_CURRENT`` marker written through
Spark. Each version records ``last_batch_id``; a re-delivered
micro-batch (foreachBatch replays after crashes) is detected and
SKIPPED, so counts can never double — effectively-once card
maintenance on top of an at-least-once stream. A crash between version
write and marker flip leaves an orphan dir, never a wrong card (the
re-run merges from the still-current version and overwrites the
orphan).

Scale: per-batch work is one aggregation of the micro-batch plus a
merge against the card (rows = sources — tiny); nothing rescans
history, and the merge shuffle is bounded by source count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKS = "filter(split({c}, ' '), x -> x <> '')"


def batch_card(batch: DataFrame, *, text_col: str = "text", source_col: str = "source", lgk: int = 12) -> DataFrame:
    """The card rows for ONE batch: ``(source, n_docs, n_bytes,
    n_tokens, hll)``. Two bounded aggregations (doc grain + token
    grain) — the token explode never shuffles text."""
    toks = F.expr(_TOKS.format(c=text_col))
    per_doc = (
        batch.select(
            F.col(source_col).alias("source"),
            F.octet_length(text_col).cast("long").alias("_bytes"),
            F.size(toks).cast("long").alias("_ntok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_bytes").alias("n_bytes"),
            F.sum(F.greatest("_ntok", F.lit(0))).alias("n_tokens"),
        )
    )
    sketches = (
        batch.select(F.col(source_col).alias("source"), F.explode(toks).alias("_tk"))
        .groupBy("source")
        .agg(F.hll_sketch_agg(F.col("_tk"), F.lit(lgk)).alias("hll"))
    )
    return per_doc.join(sketches, "source", "left")


def _current_version(spark: SparkSession, card_dir: str) -> int | None:
    try:
        row = spark.read.text(f"{card_dir}/_CURRENT").first()
        return int(row.value) if row is not None else None
    except Exception as e:  # noqa: BLE001
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def read_card(spark: SparkSession, card_dir: str) -> DataFrame | None:
    """The current card, or None before the first batch: ``(source,
    n_docs, n_bytes, n_tokens, hll, est_distinct_tokens,
    last_batch_id)``."""
    v = _current_version(spark, card_dir)
    if v is None:
        return None
    df = spark.read.parquet(f"{card_dir}/v{v:06d}")
    return df.withColumn(
        "est_distinct_tokens",
        F.when(
            F.col("hll").isNull(), F.lit(0)
        ).otherwise(F.hll_sketch_estimate("hll")).cast("long"),
    )


def make_card_step(card_dir: str, *, text_col: str = "text", source_col: str = "source", lgk: int = 12):
    """Build the ``foreachBatch`` function (exposed so tests and batch
    backfills can drive replay scenarios directly)."""

    def _step(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cur_v = _current_version(spark, card_dir)
        prev = None
        if cur_v is not None:
            prev = spark.read.parquet(f"{card_dir}/v{cur_v:06d}")
            max_done = prev.agg(F.max("last_batch_id")).first()[0]
            if max_done is not None and batch_id <= max_done:
                return  # at-least-once replay: already merged, skip
        fresh = batch_card(batch, text_col=text_col, source_col=source_col, lgk=lgk)
        fresh = fresh.withColumn("last_batch_id", F.lit(batch_id).cast("long"))
        if prev is None:
            merged = fresh
        else:
            merged = (
                prev.select("source", "n_docs", "n_bytes", "n_tokens", "hll", "last_batch_id")
                .unionByName(fresh)
                .groupBy("source")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("n_bytes").alias("n_bytes"),
                    F.sum("n_tokens").alias("n_tokens"),
                    F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"),
                    F.max("last_batch_id").alias("last_batch_id"),
                )
            )
        next_v = (cur_v or 0) + 1
        merged.write.mode("overwrite").parquet(f"{card_dir}/v{next_v:06d}")
        # marker flip LAST: readers only ever see fully-written versions
        spark.createDataFrame([(str(next_v),)], "value string").coalesce(1).write.mode(
            "overwrite"
        ).text(f"{card_dir}/_CURRENT")

    return _step


def start_card_stream(
    docs_stream: DataFrame,
    card_dir: str,
    *,
    checkpoint_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    lgk: int = 12,
    trigger_seconds: float | None = None,
):
    """Wire the card maintenance onto a streaming documents frame."""
    writer = docs_stream.writeStream.foreachBatch(
        make_card_step(card_dir, text_col=text_col, source_col=source_col, lgk=lgk)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
