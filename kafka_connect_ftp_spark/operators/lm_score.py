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

from dataclasses import dataclass

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


# --------------------------------------------------- bigram Stupid Backoff
#
# Brants et al. 2007 ("Large Language Models in Machine Translation"): an
# inexpensive, un-normalized n-gram score that web-scale pipelines use in
# place of a fully smoothed LM. Bigram form:
#
#   S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})   if bigram seen
#                    = lambda * S_uni(w_i)                    otherwise
#
# with lambda = 0.4 (the paper's constant) and S_uni the Lidstone-smoothed
# unigram of train_unigram_lm — the floor that keeps OOV tokens finite
# (plain Stupid Backoff leaves the unigram unsmoothed; on a corpus scored
# against ITSELF the backoff never fires, so scoring against a REFERENCE
# model is the operating regime and OOV handling is mandatory).
#
# Scale shape: both count tables are bounded by TYPE counts (vocab /
# distinct bigrams), never corpus size; pair emission is a map-side
# transform over each doc's token array; scoring is broadcast joins that
# degrade gracefully to shuffled hash joins past the threshold; the
# per-doc reduce is one doc_id-keyed aggregation. No Python anywhere.


@dataclass
class StupidBackoffLM:
    bigrams: DataFrame  # w1, w2, nb
    unigrams: DataFrame  # token, n
    norm: DataFrame  # 1 row: _total, _vocab


# pairs (toks[i-1], toks[i]) for i in 1..n-1, 0-based; the size guard
# matters because Spark's sequence(1, 0) is DESCENDING ([1, 0]), not empty
_PAIRS = (
    "CASE WHEN size({t}) < 2 THEN array() ELSE"
    " transform(sequence(1, size({t}) - 1),"
    " i -> struct({t}[i - 1] AS w1, {t}[i] AS w2)) END"
)


def train_stupid_backoff(docs: DataFrame, *, text_col: str = "text") -> StupidBackoffLM:
    """Count tables for :func:`stupid_backoff_scores`: bigram and unigram
    frequencies plus the 1-row normalizer (total tokens, vocab size)."""
    arrs = docs.select(F.expr(_TOKS.format(col=text_col)).alias("_toks"))
    uni = (
        arrs.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    big = (
        arrs.select(F.explode(F.expr(_PAIRS.format(t="_toks"))).alias("_p"))
        .select("_p.w1", "_p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    norm = uni.agg(F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_vocab"))
    return StupidBackoffLM(bigrams=big, unigrams=uni, norm=norm)


def stupid_backoff_scores(
    docs: DataFrame,
    model: StupidBackoffLM | None = None,
    *,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    lambda_: float = 0.4,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document bigram Stupid Backoff fluency: ``doc_id``,
    ``sb_n_tokens`` (positions scored — every token; the first is scored
    by the unigram floor, the rest by the bigram/backoff rule),
    ``sb_logscore`` (mean ln S), ``sb_backoff_n`` (bigram positions that
    took the backoff branch — 0 when scoring the training corpus itself),
    ``sb_ppl`` (= exp(-sb_logscore)). ``model`` defaults to training on
    ``docs`` itself; token-less documents score NULL with sb_n_tokens=0.
    """
    if model is None:
        model = train_stupid_backoff(docs, text_col=text_col)
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.expr(_TOKS.format(col=text_col)).alias("_toks"),
    )
    denom = F.col("_total") + alpha * (F.col("_vocab") + 1)
    uni_floor = lambda n: F.log((F.coalesce(n, F.lit(0)) + F.lit(alpha)) / denom)  # noqa: E731

    # ONE position stream per document: (NULL, t1) marks the first-token
    # position, (t_{i-1}, t_i) the bigram positions — the corpus is
    # tokenized and exploded once, not once per position class. The
    # guard is <= 0, not = 0: NULL text tokenizes to a NULL array and
    # size(NULL) is -1, which would otherwise fabricate one phantom
    # (NULL, NULL) OOV position for the document
    positions = (
        "CASE WHEN size({t}) <= 0 THEN array() ELSE concat("
        " array(struct(CAST(NULL AS STRING) AS w1, {t}[0] AS w2)),"
        " {pairs}) END"
    ).format(t="{t}", pairs=_PAIRS.format(t="{t}"))
    # the MLE ratio divides ONCE PER BIGRAM TYPE at model cost (bounded
    # by type counts), not once per corpus occurrence — identical
    # operands, bit-identical ln(nb / n_w1), one fewer broadcast join on
    # the corpus-sized stream
    enriched = (
        model.bigrams.join(
            model.unigrams.select(F.col("token").alias("w1"), F.col("n").alias("_n1")),
            "w1",
        )
        .select("w1", "w2", (F.col("nb") / F.col("_n1")).alias("_ratio"))
    )
    per_doc = (
        base.select("doc_id", F.explode(F.expr(positions.format(t="_toks"))).alias("_p"))
        # NO broadcast hint on the bigram-type join: distinct-bigram
        # count is O(corpus) worst-case, and an explicit hint is always
        # honored — on a large reference corpus it would OOM the driver
        # instead of degrading. AQE sees the aggregated table's true
        # size post-shuffle and auto-broadcasts when it fits (the
        # degrade-gracefully contract the module doc promises); the
        # type-bounded unigram/norm tables below keep their hints.
        .select("doc_id", "_p.w1", "_p.w2")
        .join(enriched, ["w1", "w2"], "left")  # NULL w1 never matches
        .join(
            F.broadcast(model.unigrams.select(F.col("token").alias("w2"), F.col("n").alias("_n_w2"))),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(model.norm))
        .select(
            "doc_id",
            F.when(F.col("w1").isNull(), uni_floor(F.col("_n_w2")))
            .when(F.col("_ratio").isNotNull(), F.log(F.col("_ratio")))
            .otherwise(F.log(F.lit(lambda_)) + uni_floor(F.col("_n_w2")))
            .alias("logp"),
            F.when(
                F.col("w1").isNotNull() & F.col("_ratio").isNull(), F.lit(1)
            ).otherwise(F.lit(0)).alias("backoff"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("sb_n_tokens"),
            F.avg("logp").alias("sb_logscore"),
            F.sum("backoff").alias("sb_backoff_n"),
        )
    )
    return (
        docs.select(F.col(doc_id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("sb_n_tokens", F.lit(0)).alias("sb_n_tokens"),
            "sb_logscore",
            F.coalesce("sb_backoff_n", F.lit(0)).alias("sb_backoff_n"),
            F.exp(-F.col("sb_logscore")).alias("sb_ppl"),
        )
    )
