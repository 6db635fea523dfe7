"""Sequence packing: assemble documents into fixed-budget training
sequences (the "packing" step of an LLM data pipeline, where a 4k-token
context is filled with several short documents instead of padding).

Bin packing is inherently sequential, so the distributed design packs
PARTITION-LOCALLY: documents are hash-distributed across partitions, each
partition runs best-fit-decreasing (BFD, via a bisect on a sorted
remaining-capacity list — O(n log n) comparisons even on a pathological
all-open-bins shard, where a first-fit linear scan is O(n·bins)) over
its share inside one Arrow-batched ``applyInPandas`` call, and sequence
ids are made globally unique by prefixing the partition key. This is the
standard trade-off at scale — a 1000-executor cluster packs 1000 shards
independently, and the fill-ratio loss vs a (impossible) global packing
is bounded because every partition sees a representative sample of the
length distribution under hash partitioning.

Determinism: partition assignment is ``pmod(hash(id), n_shards)`` (stable
across runs for fixed ``n_shards``) and the in-partition order is
(tokens desc, id) — so the packing is reproducible, which matters for
training-data lineage.

Documents longer than the budget become single-document sequences flagged
``truncated`` (the downstream tokenizer chops them); they never poison a
shared bin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "seq_id string, doc_id long, position int, n_tokens long, truncated boolean"
)


def pack_sequences(
    df: DataFrame,
    *,
    max_tokens: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    n_shards: int = 32,
) -> DataFrame:
    """Assign every document to exactly one packed sequence.

    Returns one row per document: ``seq_id`` (globally unique), the
    document's ``position`` within the sequence (0-based, concatenation
    order), its token count, and whether it alone overflows the budget.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")

    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.hash("doc_id"), F.lit(n_shards)))
    # a NULL token count cannot be packed — and would reach pandas as NaN
    # and crash the shard worker at int(n); reject loudly rather than
    # silently dropping rows from the training set
    base = base.withColumn(
        "n_tokens",
        F.when(
            F.col("n_tokens").isNull(),
            F.raise_error(
                F.concat(F.lit("null token count for doc_id "), F.col("doc_id").cast("string"))
            ),
        ).otherwise(F.col("n_tokens")),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        from bisect import bisect_left, insort

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        # best-fit-decreasing with a SORTED remaining-capacity list: the
        # bisect finds the tightest bin that still fits in O(log bins),
        # so even a pathological shard where every bin stays open is
        # O(n log n) comparisons, not the O(n·bins) of a first-fit scan.
        # Deterministic: capacity ties break on bin creation index.
        bins: list[list] = []  # creation order: [(doc_id, n_tokens), ...]
        caps: list[tuple] = []  # sorted (remaining, bin_index)
        oversize: list[tuple] = []
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            if n > max_tokens:  # exactly max_tokens is a perfect fit
                oversize.append((doc_id, n))
                continue
            i = bisect_left(caps, (n, -1))
            if i < len(caps):
                remaining, bin_idx = caps.pop(i)
                bins[bin_idx].append((doc_id, n))
                insort(caps, (remaining - n, bin_idx))
            else:
                bins.append([(doc_id, n)])
                insort(caps, (max_tokens - n, len(bins) - 1))
        rows = []
        for i, members in enumerate(bins):
            for pos, (doc_id, n) in enumerate(members):
                rows.append((f"{shard}-{i}", doc_id, pos, n, False))
        for j, (doc_id, n) in enumerate(oversize):
            rows.append((f"{shard}-x{j}", doc_id, 0, n, True))
        return pd.DataFrame(
            rows, columns=["seq_id", "doc_id", "position", "n_tokens", "truncated"]
        )

    return base.groupBy("shard").applyInPandas(pack_shard, _OUT_SCHEMA)


def packing_stats(packed: DataFrame, *, max_tokens: int) -> DataFrame:
    """One row: sequence count, mean fill ratio of non-truncated
    sequences, and the padding fraction the packing saves vs
    one-document-per-sequence."""
    per_seq = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.max(F.col("truncated").cast("int")).alias("truncated"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_seq.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_docs").alias("n_documents"),
        F.round(
            F.avg(
                F.when(
                    F.col("truncated") == 0,
                    F.col("seq_tokens") / F.lit(float(max_tokens)),
                )
            ),
            4,
        ).alias("mean_fill_ratio"),
        F.sum(F.when(F.col("truncated") == 1, 1).otherwise(0)).alias("n_truncated"),
    )


def pack_concat_chunks(
    df: DataFrame,
    *,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    stream_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk packing assignment (round 9b) — the GPT-style
    alternative to bin packing: each STREAM's documents concatenate in
    ``id_col`` order into one token stream that is cut into fixed
    ``budget``-token windows, documents crossing a boundary straddle
    two (or more) sequences. Returns per document: ``pack_off`` (the
    document's start offset in its stream), ``pack_seq_first`` /
    ``pack_seq_last`` (the first/last window index it occupies; a
    zero-token document pins both to the window at its offset).

    This is the packing most large pretraining runs actually use
    (concatenate + chunk, attention masks handle the seams) — simpler
    and fill-perfect where ``pack_sequences``' BFD preserves document
    boundaries at the cost of padding.

    Scale design (100 TB): the assignment is ONE cumulative-sum window
    PARTITIONED BY the stream — parallel across streams, sequential
    within one (the semantics are inherently sequential: an offset IS
    a running total). Production corpora pack per shard/source exactly
    so this parallelizes; a single giant stream would serialize and
    should be pre-sharded first (the operator's stream_col is the
    shard key). Closed-form integer arithmetic — no Python, and the
    whole chain re-derives in ANSI SQL (the vocab_coverage hash gate
    carries it)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(tokens_col).cast("long")
    off = (F.sum(t).over(w) - t).alias("pack_off")
    # integer `div` end-to-end: floor(double / budget) loses exactness
    # once cumulative offsets approach 2^53 — `div` stays bigint and is
    # symbolically identical to the DuckDB oracle twin's `//`
    budget = int(budget)
    first = F.expr(f"pack_off div {budget}")
    last = F.greatest(
        first,
        F.expr(f"(pack_off + cast(`{tokens_col}` as bigint) - 1) div {budget}"),
    )
    return df.select(id_col, stream_col, tokens_col, off).select(
        id_col,
        stream_col,
        tokens_col,
        "pack_off",
        first.cast("long").alias("pack_seq_first"),
        last.cast("long").alias("pack_seq_last"),
    )
