"""Incremental LLM-data quality gating: the batch pipeline's document
gates (Gopher repetition signals + the trained reference-vs-crawl
classifier + the GPT-3 Pareto acceptance rule) applied to a STREAM of
arriving documents, so a continuously-ingesting corpus is curated as it
lands instead of in periodic full rescans.

Composition (mirrors examples/llm_data_prep.py steps 1a/1b', but
incremental):

1. ``dropDuplicates`` on the document id — streaming state carries the
   set of ids already admitted ACROSS micro-batches, so an upstream
   re-delivery (the FTP ingest is at-least-once; SURVEY.md §2.8 T5)
   can never pass the gate twice. Id spaces are bounded per corpus; for
   unbounded keys swap in ``dedup_within_watermark``.
2. ``foreachBatch``: per micro-batch, compute ``repetition_signals``
   (per-document — needs no cross-document state, which is what makes
   it streamable as-is), drop loop/boilerplate text, score survivors
   with a PRE-TRAINED quality model (``load_quality_model`` — training
   stays a batch job; the stream only does the map-side JVM transform)
   and keep by the deterministic hash-seeded ``pareto_keep``, then
   append to the curated sink. Every step inside the batch function is
   the exact operator the batch pipeline runs, so stream and batch
   curation can never disagree on a given document.

Scale notes: the per-batch work is two bounded jobs over the
micro-batch (the gram shuffle of repetition_signals at micro-batch
size, and the map-side score/filter/append); the only cross-batch
state is the dedup key set. The Pareto rule is seeded by id hash, not
an RNG, so a document admitted by the stream is exactly the document
the batch pipeline would have admitted.

Round 9: pass ``routed_profiles`` (CT rank profiles trained once with
the union alphabet — a batch job) and the rule stage becomes the batch
example's classify-then-route shape inside each micro-batch: map-side
language ID, one ``rule_gate(lang_col=...)`` pass with per-row routed
stopwords/line-end/alpha params, repetition thresholds off the same
gram pass, plus the language-sensitive ``c4_keep AND gopher_keep``
families the unrouted gate cannot apply without mis-gating non-English
prose. Stream and batch still cannot disagree: the stream calls the
same ``gate_micro_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.quality_model import (
    pareto_keep,
    score_quality,
)
from kafka_connect_ftp_spark.operators.repetition import repetition_signals


def gate_micro_batch(
    batch: DataFrame,
    model,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = 0.2,
    dup5_max: float = 0.5,
    alpha: float = 9.0,
    routed_profiles: DataFrame | None = None,
) -> DataFrame:
    """The per-batch gate, exposed separately so tests (and batch
    backfills) can run the exact transformation the stream applies:
    repetition gate → model score → Pareto keep. Returns the admitted
    rows with their ``quality_score``.

    ``routed_profiles`` (round 9 — CT rank profiles trained with
    ``NORM_KEEP_ROUTED``, a once-per-pipeline batch job) switches the
    rule stage to the batch example's classify-then-route shape: the
    trained script+CT classifier names each document's language
    MAP-SIDE inside the micro-batch, and ONE ``rule_gate(lang_col=...)``
    pass applies that language's stopword list / line-end regex / alpha
    class per row — the repetition thresholds ride the same gram pass
    (one scan replaces the separate repetition stage), plus the
    language-sensitive ``c4_keep AND gopher_keep`` families the
    unrouted gate cannot apply without mis-gating non-English prose."""
    if routed_profiles is None:
        rep_ok = (
            repetition_signals(batch, id_col=id_col, text_col=text_col, top_ns=(2,), dup_ns=(5,))
            .filter(
                (F.col("top_2gram_frac") <= top2_max)
                & (F.col("dup_5gram_frac") <= dup5_max)
            )
            .select(id_col)
        )
    else:
        from kafka_connect_ftp_spark.operators.lang_id import (
            NORM_KEEP_ROUTED,
            classify_lang_routed,
        )
        from kafka_connect_ftp_spark.operators.rule_gate import rule_gate

        # MATERIALIZE at the classify→gate boundary (micro-batch-bounded):
        # ct_lang is a large expression tree, and a filter on the gate's
        # lang-routed columns (c4_keep/gopher_keep/g_stop_hits) would
        # otherwise have predicate pushdown re-inline the whole
        # classifier into every routed CASE branch — measured minutes of
        # driver-side optimization on a 3-row batch (rule_gate docstring)
        langed = classify_lang_routed(
            batch.select(id_col, text_col),
            routed_profiles,
            id_col=id_col,
            text_col=text_col,
            norm_keep=NORM_KEEP_ROUTED,
            keep_cols=(text_col,),
        ).localCheckpoint(eager=True)
        rep_ok = (
            rule_gate(
                langed,
                id_col=id_col,
                text_col=text_col,
                lang_col="ct_lang",
                top_ns=(2,),
                dup_ns=(5,),
            )
            .filter(
                (F.col("top_2gram_frac") <= top2_max)
                & (F.col("dup_5gram_frac") <= dup5_max)
                & F.col("c4_keep")
                & F.col("gopher_keep")
            )
            .select(id_col)
        )
    kept = batch.join(rep_ok, id_col, "left_semi")
    scored = score_quality(kept, model, text_col=text_col)
    return scored.filter(pareto_keep(id_col=id_col, alpha=alpha))


def make_quality_gate_step(
    model,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = 0.2,
    dup5_max: float = 0.5,
    alpha: float = 9.0,
    idempotent: bool = False,
    routed_profiles: DataFrame | None = None,
):
    """Build the foreachBatch function (exposed so tests can drive a
    replayed batch directly). ``idempotent=True`` writes each batch to
    its own ``epoch=N`` partition with overwrite — the
    ``idempotent_parquet_sink`` pattern: the gate is a deterministic
    function of the batch (hash-seeded Pareto, no RNG), so a crash
    replay rewrites the identical partition instead of appending
    duplicates. ``routed_profiles`` enables the classify-then-route
    rule stage (:func:`gate_micro_batch`)."""

    def _gate(batch: DataFrame, batch_id: int) -> None:
        admitted = gate_micro_batch(
            batch,
            model,
            id_col=id_col,
            text_col=text_col,
            top2_max=top2_max,
            dup5_max=dup5_max,
            alpha=alpha,
            routed_profiles=routed_profiles,
        )
        if idempotent:
            if admitted.isEmpty():
                return
            admitted.write.mode("overwrite").parquet(f"{out_dir}/epoch={batch_id}")
        else:
            admitted.write.mode("append").parquet(out_dir)

    return _gate


def start_quality_gate(
    stream: DataFrame,
    model,
    out_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top2_max: float = 0.2,
    dup5_max: float = 0.5,
    alpha: float = 9.0,
    idempotent: bool = False,
    routed_profiles: DataFrame | None = None,
):
    """Start the curation stream: dedup-by-id (state carried across
    micro-batches) → :func:`gate_micro_batch` → parquet to ``out_dir``
    (epoch-partitioned effectively-once when ``idempotent``, plain
    append otherwise). Returns the StreamingQuery."""
    deduped = stream.dropDuplicates([id_col])
    gate = make_quality_gate_step(
        model,
        out_dir,
        id_col=id_col,
        text_col=text_col,
        top2_max=top2_max,
        dup5_max=dup5_max,
        alpha=alpha,
        idempotent=idempotent,
        routed_profiles=routed_profiles,
    )
    return (
        deduped.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
