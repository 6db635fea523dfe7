"""Tokenizer-vocabulary operators: top-V vocabulary selection, per-document
coverage/OOV diagnostics, and TF-IDF top-term extraction.

Extracted from the inline ``plans/text.py`` logic in round 6 so the
vocabulary size V and the term frame are caller-parameterized (the gate
uses the synthetic-corpus V=16; a production run passes its tokenizer's
vocabulary size or an externally trained vocabulary frame).

Scale design (100 TB) — everything derives from ONE corpus reduction:
``term_frequencies`` collapses the raw token stream to the ``(doc_id,
token, tf)`` table (map-side combined). A pipeline fanning that table
out to several consumers should MATERIALIZE it first (persist /
localCheckpoint / write) — exchange reuse across the consumers is not
guaranteed (observed absent under AQE here), and an unmaterialized tf
re-executes the corpus scan per consumer. Downstream of it:

- ``vocab_top_v``: one token-keyed sum whose state is bounded by the
  number of DISTINCT tokens (not corpus size) + TakeOrdered top-V — the
  same shape as the lm_score vocabulary pass.
- ``vocab_coverage``: joins tf against the BROADCAST vocabulary (V rows
  — KBs even for a 100k-entry BPE vocab) and aggregates per document;
  raw text never shuffles.
- ``tfidf_top_term``: document frequency is a count over the tf table
  (each (doc, token) row is already distinct — no countDistinct
  needed), vocabulary-bounded and broadcast back onto tf, so the only
  doc-keyed exchange carries (doc_id, token, tf) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def term_frequencies(
    tok: DataFrame, id_col: str = "doc_id", token_col: str = "tk"
) -> DataFrame:
    """``(id_col, token_col, tf)`` — the one corpus-wide reduction every
    vocabulary operator consumes. Map-side combine collapses repeated
    tokens before the exchange. Materialize before multi-consumer
    fan-out (module doc)."""
    return tok.groupBy(id_col, token_col).agg(F.count(F.lit(1)).alias("tf"))


def vocab_top_v(tf: DataFrame, v: int, token_col: str = "tk") -> DataFrame:
    """Top-``v`` corpus tokens by total frequency (count-desc, token-asc
    tie-break — deterministic across engines). Returns ``(token_col,
    _in_vocab)`` suitable for a broadcast membership join."""
    return (
        tf.groupBy(token_col)
        .agg(F.sum("tf").alias("c"))
        .orderBy(F.desc("c"), token_col)
        .limit(v)
        .select(token_col, F.lit(1).alias("_in_vocab"))
    )


def vocab_coverage(
    docs: DataFrame,
    tf: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "tk",
) -> DataFrame:
    """Per-document token count, out-of-vocabulary count and OOV rate
    against ``vocab`` (broadcast). Token-less documents report 0/0/0.0.

    NULL ids in ``docs`` fail loudly (the repetition_signals
    convention): a null key would aggregate its tokens in ``tf`` but
    never match the per-doc left join, silently reporting a high-OOV
    document as empty."""
    id_checked = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"vocab_coverage: NULL {id_col} (ids must be non-null)")),
    ).otherwise(F.col(id_col))
    docs = docs.select(id_checked.alias(id_col))
    per = (
        tf.join(F.broadcast(vocab), token_col, "left")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.when(F.col("_in_vocab").isNull(), F.col("tf")).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    n_tok = F.coalesce(F.col("n_tok"), F.lit(0))
    n_oov = F.coalesce(F.col("n_oov"), F.lit(0))
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            n_tok.cast("long").alias("n_tokens"),
            n_oov.cast("long").alias("n_oov"),
            F.when(F.col("n_tok").isNull(), F.lit(0.0))
            .otherwise(n_oov.cast("double") / n_tok)
            .alias("oov_rate"),
        )
    )


def tfidf_top_term(
    docs: DataFrame,
    tf: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "tk",
) -> DataFrame:
    """Highest-TF-IDF term per document (ties broken by term asc).

    idf = ln(n_docs / df) with no smoothing — df >= 1 for every term that
    appears, so the log argument is always finite. Documents with no
    tokens are absent from the result (callers LEFT-join if they need a
    row per document)."""
    dfreq = tf.groupBy(token_col).agg(F.count(F.lit(1)).alias("df"))
    # n_docs as a broadcast 1-row frame, not an eager docs.count(): keeps
    # the IDF denominator inside the single job instead of a separate
    # driver-side scan per invocation
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), token_col)
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc(token_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col(token_col).alias("top_term"), F.col("tfidf"))
    )
