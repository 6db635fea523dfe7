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
``v%06d`` under ``card_dir``; the CURRENT version is the highest one
whose Spark job commit finished (``_SUCCESS`` present) — no separate
marker file, because a marker flip through a Spark overwrite is
delete-then-write and a crash inside that window would silently reset
the card, whereas the committer writes ``_SUCCESS`` only after every
part file is in place. Each version records ``last_batch_id``; a
re-delivered micro-batch (foreachBatch replays after crashes) is
detected and SKIPPED, so counts can never double — effectively-once
card maintenance on top of an at-least-once stream. A crash mid-write
leaves a ``_SUCCESS``-less orphan dir, never a wrong card (the replayed
batch merges from the still-current version and overwrites the orphan).
Versions older than ``keep_versions`` (clamped >= 2 so a reader mid-scan
of the just-superseded version never has files deleted under it) are
pruned after each commit, bounding the directory at O(keep) files.

Scale: per-batch work is one aggregation of the micro-batch plus a
merge against the card (rows = sources — tiny); nothing rescans
history, and the merge shuffle is bounded by source count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.hadoop_fs import committed_versions, prune_versions

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
    versions = committed_versions(spark, card_dir)
    return versions[-1] if versions else None


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


def make_card_step(
    card_dir: str,
    *,
    text_col: str = "text",
    source_col: str = "source",
    lgk: int = 12,
    keep_versions: int = 2,
):
    """Build the ``foreachBatch`` function (exposed so tests and batch
    backfills can drive replay scenarios directly)."""
    keep_versions = max(2, keep_versions)  # see module doc: reader safety

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
        # the commit IS the flip: _SUCCESS lands last, so readers only
        # ever resolve fully-written versions (module doc)
        merged.write.mode("overwrite").parquet(f"{card_dir}/v{next_v:06d}")
        # prune committed versions older than the retention window; the
        # new version is already current, so anything pruned is at least
        # keep_versions flips stale
        prune_versions(spark, card_dir, current=next_v, keep=keep_versions)

    return _step


def start_card_stream(
    docs_stream: DataFrame,
    card_dir: str,
    *,
    checkpoint_dir: str,
    text_col: str = "text",
    source_col: str = "source",
    lgk: int = 12,
    keep_versions: int = 2,
    trigger_seconds: float | None = None,
):
    """Wire the card maintenance onto a streaming documents frame."""
    writer = docs_stream.writeStream.foreachBatch(
        make_card_step(
            card_dir,
            text_col=text_col,
            source_col=source_col,
            lgk=lgk,
            keep_versions=keep_versions,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
