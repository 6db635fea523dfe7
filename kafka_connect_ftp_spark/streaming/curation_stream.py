"""One-checkpoint streaming curation: the near-dup filter
(streaming/neardup_stream.py) COMPOSED with the quality gate
(streaming/quality_gate.py) inside a single ``foreachBatch`` — one
stream, one checkpoint, one recovery story, instead of staging the two
gates through an intermediate table with two checkpoints whose
failure/replay windows have to be reasoned about independently
(examples/streaming_curation.py ran the staged form through round 6).

Per micro-batch:

0. (optional) URL/domain blocklist — stage 0a, cheapest cut first; and
   C4-style span dedup against the cross-batch span-hash state
   (streaming/span_dedup_stream.py) — stage 0b, the batch pipeline's
   order (examples/llm_data_prep.py).
1. ``filter_micro_batch`` — drop documents whose LSH band keys collide
   with anything previously admitted (cross-batch state) or with an
   earlier in-batch near-duplicate (the batch CC rule). Exact
   re-deliveries are near-duplicates of themselves, so the band state
   also subsumes the staged pipeline's dropDuplicates-by-id state.
2. ``gate_micro_batch`` — repetition gate → pre-trained classifier →
   deterministic Pareto keep, on the near-dup survivors.
3. Sink: curated docs to ``out_dir/epoch=<batch_id>`` (overwrite — the
   idempotent-epoch pattern), THEN the band keys of the near-dup
   survivors (quality-rejected ones included: the staged semantics — a
   later near-duplicate of a quality-rejected document is still a
   duplicate) appended to ``state_dir``.

Replay safety, by the same argument as the single gates but now
composed: every transformation is a deterministic function of (batch,
prior-epochs state) — MinHash/banding are seeded hashes, the Pareto
rule is id-hash-seeded, no RNG anywhere, and the state read EXCLUDES
the batch's own epoch (``read_band_state(exclude_epoch=...)``) — so a
replay after a crash at ANY point (before the sink, between sink and
state, or mid-state-write leaving a torn subset of band keys visible)
recomputes from exactly the pre-batch state and rewrites both the
curated epoch and the state epoch byte-identically. Pinned at the
composed level, including the torn-state case, by
tests/test_curation_stream.py.

Scale: identical to the parts — per-batch bounded jobs (the gram/band
shuffles at micro-batch size, map-side scoring), cross-batch state is
~n_bands longs per ADMITTED document and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.text_dedup import (
    band_signatures,
    minhash_signatures,
)
from kafka_connect_ftp_spark.streaming.neardup_stream import (
    filter_micro_batch,
    read_band_state,
)
from kafka_connect_ftp_spark.streaming.quality_gate import gate_micro_batch


def make_curation_step(
    spark,
    model,
    out_dir: str,
    state_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_width: int = 8,
    band_size: int = 4,
    top2_max: float = 0.2,
    dup5_max: float = 0.5,
    alpha: float = 9.0,
    routed_profiles: DataFrame | None = None,
    blocklist: DataFrame | None = None,
    url_col: str = "url",
    blocklist_join_mode: str = "broadcast",
    span_unit: str | None = None,
    span_state_dir: str | None = None,
    span_state_buckets: int | None = None,
    band_state_buckets: int | None = None,
    compact_every: int | None = None,
):
    """Build the composed foreachBatch function (exposed so tests can
    drive a replayed batch directly — a crash replay IS calling the
    step again with the same (batch, batch_id)).

    ``routed_profiles`` passes through to ``gate_micro_batch`` (review
    9b: the composed one-checkpoint stream subsumes the staged
    pipeline, so it must expose the round-9 classify-then-route rule
    stage too, not just the English-parameterized default).

    ``blocklist`` (round 10, with ``url_col``): a domain-blocklist
    frame applied as stage 0, BEFORE the near-dup filter — the batch
    pipeline's cheapest-cut-first order (examples/llm_data_prep.py
    0a), and blocked documents must not enter the band state either
    (they were never admitted, so a later clean near-duplicate of a
    blocked page is NOT a duplicate). A static frame joined inside
    foreachBatch; deterministic per row, so the replay argument is
    unchanged.

    ``span_unit`` + ``span_state_dir`` (round 11): C4-style span dedup
    as stage 0b, matching the batch pipeline's order (blocklist → span
    dedup → gates; examples/llm_data_prep.py). Spans are admitted into
    the span-hash state for EVERY document that reaches the stage,
    whether or not a later gate drops the document — the staged
    semantics, same rationale as quality-rejected docs entering the
    band state. Blocked documents never reach it. The per-doc
    n_spans/n_dropped counters are stage diagnostics and are dropped
    so the delivered schema is unchanged.

    ``blocklist_join_mode`` (round 12): passes through to
    ``filter_by_blocklist``'s ``join_mode``. The step skips that
    function's broadcast-size count guard (setup-time sizing — counting
    the same static frame every micro-batch is waste), which made the
    guard's own escape hatch unreachable: a composed stream whose entry
    set is past broadcast size had no path to the shuffle mode. Pass
    ``'shuffle'`` here for huge entry sets (one batch repartition on
    the host key, no broadcast — url_filter.py docstring).

    ``band_state_buckets`` (round 12): like ``span_state_buckets`` but
    for the near-dup band state — bucketed external table CLUSTERED BY
    (band, bsig), state-side-Exchange-free collision check
    (streaming/bucketed_state.py).

    ``compact_every=N`` (round 12): fold old epochs of BOTH state
    stores every N-th batch (state_compaction.maybe_compact — runs at
    the end of the step, after every state write, so never concurrent
    with this stream's own reads)."""
    if (span_unit is None) != (span_state_dir is None):
        raise ValueError("span_unit and span_state_dir must be set together")
    if blocklist_join_mode not in ("broadcast", "shuffle"):
        raise ValueError(
            "blocklist_join_mode must be broadcast|shuffle, got "
            f"{blocklist_join_mode!r}"
        )

    def _step(batch: DataFrame, batch_id: int) -> None:
        if blocklist is not None:
            from kafka_connect_ftp_spark.operators.url_filter import (
                filter_by_blocklist,
            )

            # max_broadcast_entries=None: the count guard would re-count
            # the same static frame EVERY micro-batch; sizing a stream's
            # blocklist is a setup-time decision, made once by the caller
            # (who can opt into join_mode='shuffle' — docstring above)
            batch = filter_by_blocklist(
                batch, blocklist, url_col=url_col,
                join_mode=blocklist_join_mode, max_broadcast_entries=None,
            )
        admitted_spans = None
        if span_unit is not None:
            from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
                dedup_spans_micro_batch,
                read_span_state,
            )

            seen_spans = read_span_state(
                spark, span_state_dir,
                exclude_epoch=batch_id, buckets=span_state_buckets,
            )
            batch, admitted_spans = dedup_spans_micro_batch(
                batch, seen_spans,
                unit=span_unit, id_col=id_col, text_col=text_col,
            )
            batch = batch.drop("n_spans", "n_dropped")
            # a document whose EVERY span was a known duplicate rebuilds
            # to empty OR whitespace-only text (a kept first-seen blank
            # span between dropped content spans); it must be dropped
            # here, not delivered — such text has no shingles, so the
            # near-dup filter can't catch it and an empty shell would
            # reach the sink. rlike(\S), not trim: Spark's trim strips
            # only the space character, and a tab/newline-only shell
            # would slip through (the url_norm convention)
            batch = batch.filter(
                F.coalesce(F.col(text_col), F.lit("")).rlike(r"\S")
            )
            # the rebuilt batch feeds the whole near-dup/gate chain (and
            # is referenced several times inside it) — checkpoint it;
            # admitted_spans needs none: dedup_spans_micro_batch
            # checkpoints the shared winners node, so the state write
            # at the end of the step re-executes only a trivial
            # projection, not the span decision chain (review r12)
            batch = batch.localCheckpoint(eager=True)
        # exclude_epoch: a torn own-epoch state write from a crashed
        # first attempt must be invisible to the replay, or partially-
        # covered docs would self-collide and the epoch rewrite would
        # drop their delivered rows (read_band_state docstring)
        seen = read_band_state(
            spark, state_dir, batch,
            id_col=id_col, text_col=text_col, n_hashes=n_hashes,
            shingle_width=shingle_width, band_size=band_size,
            exclude_epoch=batch_id, buckets=band_state_buckets,
        )
        nd_admitted, _ = filter_micro_batch(
            batch, seen,
            id_col=id_col, text_col=text_col, n_hashes=n_hashes,
            shingle_width=shingle_width, band_size=band_size,
        )
        # checkpoint once: the sketch/CC chain below feeds BOTH the
        # quality gate and the band-state re-derivation; band keys
        # re-derived from the checkpointed frame are byte-identical to
        # the filter's (deterministic hashing), without re-executing
        # the whole filter plan per consumer
        nd_admitted = nd_admitted.localCheckpoint(eager=True)
        if nd_admitted.isEmpty():
            # an all-duplicate batch (with the own epoch excluded, a
            # replay can never self-collide): nothing to deliver, no
            # band keys to remember. The SPAN stage's admissions still
            # persist — staged semantics: the span gate ran before the
            # near-dup verdict, and skipping its state write would
            # re-admit those spans from a later batch's documents
            if admitted_spans is not None:
                from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
                    write_span_state,
                )

                write_span_state(
                    spark, admitted_spans, span_state_dir, batch_id,
                    buckets=span_state_buckets,
                )
            _compact(batch_id)
            return
        curated = gate_micro_batch(
            nd_admitted, model,
            id_col=id_col, text_col=text_col,
            top2_max=top2_max, dup5_max=dup5_max, alpha=alpha,
            routed_profiles=routed_profiles,
        )
        # delivery BEFORE state commit (the ingest/pipeline.py rule): a
        # crash between the two replays this batch and rewrites the
        # identical epoch; writing state first would drop the batch's
        # curated output forever on the same crash
        curated.write.mode("overwrite").parquet(f"{out_dir}/epoch={batch_id}")
        sig = minhash_signatures(
            nd_admitted, id_col, text_col,
            n_hashes=n_hashes, shingle_width=shingle_width,
        )
        # per-epoch overwrite (the neardup_stream rationale): a torn
        # first attempt is excluded on replay and rewritten whole
        from kafka_connect_ftp_spark.streaming.neardup_stream import (
            write_band_state,
        )

        write_band_state(
            spark, band_signatures(sig, band_size=band_size), state_dir,
            batch_id, buckets=band_state_buckets,
        )
        if admitted_spans is not None:
            # same per-epoch overwrite + delivery-before-state contract
            from kafka_connect_ftp_spark.streaming.span_dedup_stream import (
                write_span_state,
            )

            write_span_state(
                spark, admitted_spans, span_state_dir, batch_id,
                buckets=span_state_buckets,
            )
        _compact(batch_id)

    def _compact(batch_id: int) -> None:
        from kafka_connect_ftp_spark.streaming.state_compaction import (
            maybe_compact,
        )

        maybe_compact(
            spark, state_dir, batch_id, compact_every,
            buckets=band_state_buckets,
        )
        if span_state_dir is not None:
            maybe_compact(
                spark, span_state_dir, batch_id, compact_every,
                buckets=span_state_buckets,
            )

    return _step


def start_curation(
    stream: DataFrame,
    model,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    **knobs,
):
    """Start the composed curation stream (module doc): ONE checkpoint,
    near-dup filter → quality gate → idempotent epoch sink + band
    state. Returns the StreamingQuery."""
    step = make_curation_step(
        stream.sparkSession, model, out_dir, state_dir, **knobs
    )
    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
