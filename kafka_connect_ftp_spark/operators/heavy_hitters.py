"""Heavy-hitter n-grams: find the most frequent n-grams in a corpus —
the standard diagnostic for boilerplate discovery (the phrases worth
feeding to span dedup) and tokenizer-vocabulary sanity checks.

The naive ``groupBy(ngram).count().orderBy(desc)`` is exact but shuffles
EVERY distinct n-gram — at web scale that is a key space in the
billions, almost all of it singletons that can never be heavy. The
two-phase design here prunes before the global shuffle:

- **phase 1 (local candidates)**: each partition runs a bounded
  Misra-Gries/SpaceSaving-style counter (`mapInArrow`, one dict capped
  at ``candidates_per_partition``) and emits only its local survivors.
  Each Arrow batch is pre-aggregated with Arrow's vectorized
  ``value_counts()`` on the columnar buffers (no per-occurrence Python
  string ever exists), so the Python merge loop touches only the
  batch's DISTINCT n-grams, and eviction prunes the dict back to the
  cap in one ``nsmallest`` pass per overflowing batch instead of an
  O(cap) scan per miss. Newcomers enter at ``floor + count`` where
  ``floor`` is the largest count ever evicted — counts never
  under-estimate, so a true global heavy hitter (frequency above
  ~1/candidates of a partition's stream) survives in every partition
  that sees it and the union of local survivors is a superset of the
  global top-k for any ``k << candidates_per_partition``.
- **phase 2 (exact rescore)**: the candidate set (≤ partitions x cap
  rows — tiny) is distinct-ed, broadcast back against the n-gram
  stream, and counted EXACTLY; top-k of those exact counts is returned.

The global shuffle therefore carries only candidate matches instead of
the full distinct-key space, and the result is exact for the returned
rows (counts are true corpus counts, not sketch estimates). Phase-1
pruning can only lose an n-gram whose true frequency is below the
SpaceSaving threshold — tune ``candidates_per_partition`` >= 10x the
wanted k for comfortable headroom. The flip side: on NEAR-UNIFORM data
(no n-gram above ~stream/cap per partition) the top-k ranking sits
entirely below the threshold and pruning can reorder it — there the
result is exact only in the no-eviction regime
(cap >= distinct n-grams per partition), which is how the oracle-gated
corpus_report runs it on the near-uniform synthetic corpus.

Phase-1 micro-bench (500k occurrences, 400k distinct singletons + one
heavy key, cap=1000 — the eviction-heavy worst case): the batched
value_counts + nsmallest-prune form runs in ~0.5s where the per-row
dict walk with min()-scan eviction extrapolates to ~14s (~30x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "filter(split({col}, ' '), x -> x <> '')"


def ngram_stream(docs: DataFrame, n: int = 3, *, text_col: str = "text") -> DataFrame:
    """One row per n-gram occurrence: ``(ngram)``. Map-side explode.

    The token array is materialized as a column FIRST: inlining the
    ``filter(split(...))`` tokenizer inside the position expression
    would re-tokenize the document once per n-gram position (O(tokens²)
    per doc — measured 2x wall on the corpus_report bench). Positions
    are exploded and each gram string built per exploded row — building
    the per-doc gram ARRAY first and exploding that materializes every
    document's grams twice and profiled ~1.5x slower (the same finding
    as operators/repetition.py's gram stage)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _TOKS.format(col=text_col)
    return (
        docs.select(F.expr(toks).alias("_tk"))
        .select(
            "_tk",
            F.explode(
                F.expr(
                    f"case when size(_tk) >= {n} then"
                    f" sequence(1, size(_tk) - {n - 1}) else array() end"
                )
            ).alias("_i"),
        )
        .select(F.expr(f"concat_ws(' ', slice(_tk, _i, {n}))").alias("ngram"))
    )


def heavy_hitter_ngrams(
    docs: DataFrame,
    n: int = 3,
    top_k: int = 20,
    *,
    text_col: str = "text",
    candidates_per_partition: int = 1000,
) -> DataFrame:
    """Exact counts of the (approximately complete) top-k n-grams.

    Returns ``(ngram, count)`` ordered by count desc then ngram. See the
    module doc for the two-phase guarantee and its tuning knob.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if candidates_per_partition < top_k:
        raise ValueError("candidates_per_partition must be >= top_k")
    grams = ngram_stream(docs, n, text_col=text_col)

    cap = candidates_per_partition

    def local_candidates(batches):
        import heapq

        import pyarrow as pa

        # batched Misra-Gries: every count is an over-estimate (newcomers
        # are credited the eviction floor), so survivors are a superset of
        # everything frequent in this partition's stream — the same
        # guarantee as per-row SpaceSaving, at vectorized speed.
        # mapInArrow, not mapInPandas (round 13, guide §4.2): the pandas
        # hop materialized EVERY n-gram occurrence as a Python string
        # object just to feed value_counts; Arrow's value_counts runs on
        # the columnar buffers directly and only the batch's DISTINCT
        # survivors are ever converted to Python (same batches, same
        # per-batch counts, same merge arithmetic -> identical survivor
        # sets, pinned by the phase-1 parity test).
        counts: dict[str, int] = {}
        floor = 0  # largest count ever evicted; monotone
        for batch in batches:
            # vectorized pre-aggregation: the merge loop below runs once
            # per DISTINCT n-gram in the batch, not once per occurrence
            vc = batch.column(0).value_counts()
            for g, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                if g in counts:
                    counts[g] += c
                else:
                    counts[g] = floor + c
            excess = len(counts) - cap
            if excess > 0:
                # one O(n log excess) prune per overflowing batch replaces
                # the old O(cap)-scan-per-miss eviction
                victims = heapq.nsmallest(excess, counts.items(), key=lambda kv: kv[1])
                floor = max(floor, victims[-1][1])
                for g, _ in victims:
                    del counts[g]
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(counts.keys()), type=pa.string())], names=["ngram"]
        )

    candidates = (
        grams.mapInArrow(local_candidates, "ngram string").distinct()
    )
    return (
        grams.join(F.broadcast(candidates), "ngram", "left_semi")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), "ngram")
        .limit(top_k)
    )
