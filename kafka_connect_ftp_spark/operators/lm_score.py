"""Corpus-level unigram language-model quality scoring (CCNet-style).

A classic LLM-data-pipeline signal: score each document by the mean
log-probability of its tokens under a unigram LM trained on the corpus
itself (or on a reference corpus). Low-probability word soup, boilerplate
and OCR noise score badly; fluent text scores well. CCNet uses a KenLM
5-gram for this — the unigram form is the same dataflow shape with the
model trained in-engine by one aggregation.

Scale design (100 TB):
  * pass 1 (train): tokens shuffle once, keyed by token, with map-side
    partial counts — the result is bounded by VOCABULARY size (millions of
    rows at web scale), not corpus size;
  * scalar normalizers (total token count, vocab size) ride along as a
    broadcast 1-row frame — no driver collect in the plan;
  * pass 2 (score): the vocab log-prob table broadcasts to the token
    stream; per-doc mean is one doc_id-keyed aggregation. If a vocabulary
    ever outgrew the broadcast threshold the equi-join degrades gracefully
    to a shuffled hash join — same plan, no rewrite.

Everything is built-in expressions (split/explode/log/avg); no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# same whitespace tokenization the text/dedup family uses (plans/text.py)
_TOKS = "filter(split({col}, ' '), x -> x <> '')"


def train_unigram_lm(
    docs: DataFrame, *, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """One row per token: ``token``, ``n``, ``log_prob`` (Lidstone-smoothed
    ``log((n + alpha) / (total + alpha * (vocab + 1)))``; the +1 reserves
    one smoothed slot for unseen tokens, whose probability
    ``alpha / (total + alpha * (vocab + 1))`` is exposed on every row as
    ``log_prob_oov``)."""
    toks = docs.select(F.explode(F.expr(_TOKS.format(col=text_col))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    norm = vocab.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    return (
        vocab.crossJoin(F.broadcast(norm))
        .select(
            "token",
            "n",
            F.log((F.col("n") + F.lit(alpha)) / (F.col("_total") + alpha * (F.col("_vocab") + 1))).alias(
                "log_prob"
            ),
            F.log(F.lit(alpha) / (F.col("_total") + alpha * (F.col("_vocab") + 1))).alias(
                "log_prob_oov"
            ),
        )
    )


def unigram_scores(
    docs: DataFrame,
    lm: DataFrame | None = None,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    include_tokenless: bool = True,
) -> DataFrame:
    """Per-document LM score: ``doc_id``, ``n_tokens``, ``avg_logprob``,
    ``perplexity`` (= exp(-avg_logprob); lower is more fluent under the
    LM). ``lm`` defaults to a model trained on ``docs`` itself — pass a
    model from :func:`train_unigram_lm` over a reference corpus to score
    against external statistics (tokens unseen by the LM get its smoothed
    OOV probability). Empty documents score NULL.

    ``include_tokenless=False`` skips the join back to ``docs`` that
    resurrects token-less documents (n_tokens=0 rows) — callers that
    LEFT-join the scores onto a docs-grain frame themselves (e.g. the
    governance_profile plan) get identical results one join cheaper."""
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(F.expr(_TOKS.format(col=text_col))).alias("token"),
    )
    if lm is None:
        # self-trained fused path: join the raw (token, n) counts and fold
        # the smoothing into ONE log expression — a missing token is
        # n=NULL→0, which IS the OOV probability, so no separate OOV
        # aggregation exists. Both broadcast sides hang off the identical
        # vocab aggregation subtree, so Spark's ReuseExchange computes the
        # token shuffle once instead of the three times the compositional
        # form (train + select-pruned join + oov agg) costs.
        vocab = (
            docs.select(F.explode(F.expr(_TOKS.format(col=text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        norm = vocab.agg(F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_vocab"))
        denom = F.col("_total") + alpha * (F.col("_vocab") + 1)
        scored = (
            toks.join(F.broadcast(vocab), "token", "left")
            .crossJoin(F.broadcast(norm))
            .select(
                "doc_id",
                F.log((F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha)) / denom).alias("logp"),
            )
        )
    else:
        oov = lm.agg(F.first("log_prob_oov").alias("log_prob_oov"))
        scored = (
            toks.join(F.broadcast(lm.select("token", "log_prob")), "token", "left")
            .crossJoin(F.broadcast(oov))
            .select("doc_id", F.coalesce("log_prob", "log_prob_oov").alias("logp"))
        )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("logp").alias("avg_logprob"),
    )
    if not include_tokenless:
        return per_doc.select(
            "doc_id",
            "n_tokens",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    # left join back so token-less documents still get a (NULL-scored) row
    return (
        docs.select(F.col(doc_id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )
