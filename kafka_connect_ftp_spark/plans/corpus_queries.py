"""Oracle-checked plans for the round-3 corpus operators: C4-style
span-level dedup (operators/span_dedup.py), corpus composition stats
(operators/corpus_stats.py) and two-phase heavy-hitter n-grams
(operators/heavy_hitters.py) — closing the "pytest-only evidence" gap by
running the REAL operator code paths under the driver's full
rows+schema+hash gate.

Span-dedup note: the synthetic documents are single-line (no ``\\n``),
so deduplicating on raw paragraphs would be vacuous (one span per doc,
all unique). Following the governance_profile PII precedent, the query
derives a paragraph-structured corpus deterministically IN BOTH ENGINES:
each document's tokens are regrouped into 8-token paragraphs joined by
``\\n\\n``. The small shared vocabulary makes 8-token spans repeat
across documents (~5% of spans at sf0.01 are corpus-wide duplicates), so
keep/drop decisions, reconstruction order, and counts are all
non-vacuous. The Spark side then runs the real ``dedup_spans`` operator
end-to-end (explode → hash-window decision → home-key join →
reconstruction); the oracle re-derives the same decision with a window
rank over the span text itself (equivalent to the operator's xxhash64
partition key modulo 64-bit collisions, absent at test SF).

Corpus report note: composition rows (per-source + ``__all__`` rollup)
and the top-k boilerplate n-grams are two sections of ONE tagged report
frame — the "know your data" card a mixture designer reads, and one
row-budget slot. The stats section runs ``corpus_stats`` with
``exact_quantiles=True`` so Spark's interpolated ``percentile`` matches
DuckDB's ``quantile_cont`` bit-for-bit after rounding (the default
t-digest sketch is the 100 TB path and stays pytest-covered); the
boilerplate section runs the real two-phase ``heavy_hitter_ngrams``
whose returned counts are exact, so the naive ``GROUP BY ... LIMIT k``
oracle is a true twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.corpus_stats import corpus_stats
from kafka_connect_ftp_spark.operators.heavy_hitters import heavy_hitter_ngrams
from kafka_connect_ftp_spark.operators.span_dedup import dedup_spans
from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

_SPAN_W = 8  # tokens per derived paragraph
_HH_N = 3  # n-gram width for the boilerplate section
_HH_K = 20  # top-k n-grams reported
# Oracle-side token-position cap (repo convention, see llm_pipeline.py):
# the DuckDB twins enumerate positions with generate_series(1, 512)
# while the Spark side iterates the full token array. Testdata documents
# max out at 100 tokens, so the sides agree; if the documents table is
# ever regenerated with >512-token texts, raise this alongside or the
# hash gate diverges (the FAIL would be loud, not silent — but raise it
# here, don't chase phantom span/ngram bugs).
_ORACLE_MAX_TOKENS = 512
# Phase-1 candidate budget for the boilerplate section. The SpaceSaving
# top-k guarantee needs the heavy hitters to be HEAVY (frequency above
# ~N/cap per partition) — true for web boilerplate repeated millions of
# times, false for this synthetic corpus whose most frequent 3-gram
# appears ~22 times in 440k at sf0.1. The report therefore runs the
# sketch in its provably-exact regime: cap >= distinct n-grams per
# partition (~50k here) means no eviction ever fires and the two-phase
# result equals the naive top-k at every test SF — the full operator
# code path (batched candidate merge, broadcast rescore) still runs. A
# production deployment on skewed data lowers this to ~10x k and keeps
# the same plan shape.
_HH_CAP = 1 << 18

_TOKS = "filter(split(text, ' '), x -> x <> '')"
_DUCK_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@register(
    "span_dedup_decision",
    f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
    spans AS (
      SELECT doc_id, CAST((i - 1) / {_SPAN_W} AS BIGINT) AS idx,
             array_to_string(tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + {_SPAN_W - 1}], ' ') AS span
      FROM toks, generate_series(1, {_ORACLE_MAX_TOKENS}) AS s(i)
      WHERE (i - 1) % {_SPAN_W} = 0 AND i <= LEN(tk)
    ),
    decided AS (
      SELECT doc_id, idx, span,
             ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, idx) = 1 AS keep
      FROM spans
    ),
    agg AS (
      SELECT doc_id,
             md5(COALESCE(string_agg(span, chr(10) || chr(10) ORDER BY idx)
                          FILTER (WHERE keep), '')) AS text_fp,
             COUNT(*) AS n_spans,
             CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
      FROM decided GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(a.text_fp, md5('')) AS text_fp,
           COALESCE(a.n_spans, 1) AS n_spans,
           COALESCE(a.n_dropped, 0) AS n_dropped
    FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
    """,
    doc=(
        "C4-style corpus-wide span dedup over a deterministically "
        "paragraph-ized corpus (8-token spans): first occurrence by "
        "(doc_id, idx) kept, every later repeat dropped, documents "
        "rebuilt from surviving spans in order. Runs the real "
        "operators/span_dedup.py path; the decision frame shuffles only "
        "(hash, doc_id, idx) triples — span text never rides the hash "
        "shuffle (module doc). text_fp is md5 of the rebuilt document."
    ),
)
def span_dedup_decision(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # materialize the token array before the transform lambda — inlining
    # the tokenizer would re-split the text once per span position
    paragraphized = docs.select(
        "doc_id", F.expr(_TOKS).alias("_tk")
    ).select(
        "doc_id",
        F.expr(
            f"concat_ws('\\n\\n',"
            f" transform(filter(sequence(1, size(_tk)), i -> (i - 1) % {_SPAN_W} = 0),"
            f"  i -> concat_ws(' ', slice(_tk, i, {_SPAN_W}))))"
        ).alias("text"),
    )
    deduped = dedup_spans(paragraphized, "paragraph")
    return deduped.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_fp"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
    ).orderBy("doc_id")


@register(
    "corpus_report",
    f"""
    WITH base AS (
      SELECT source, CAST(strlen(text) AS BIGINT) AS bytes,
             CAST(LEN({_DUCK_TOKS}) AS BIGINT) AS toks, md5(text) AS fp
      FROM documents
    ),
    grp AS (
      SELECT source AS key, COUNT(*) AS n, SUM(bytes) AS n_bytes, SUM(toks) AS n_tokens,
             ROUND(quantile_cont(toks, 0.5), 4) AS len_p50,
             ROUND(quantile_cont(toks, 0.9), 4) AS len_p90,
             ROUND(quantile_cont(toks, 0.99), 4) AS len_p99,
             ROUND(1 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 4) AS dup_ratio
      FROM base GROUP BY source
      UNION ALL
      SELECT '__all__', COUNT(*), SUM(bytes), SUM(toks),
             ROUND(quantile_cont(toks, 0.5), 4), ROUND(quantile_cont(toks, 0.9), 4),
             ROUND(quantile_cont(toks, 0.99), 4),
             ROUND(1 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 4)
      FROM base
    ),
    comp AS (
      SELECT 'composition' AS section, key, n, n_bytes, n_tokens,
             len_p50, len_p90, len_p99, dup_ratio,
             ROUND(CAST(n_bytes AS DOUBLE) / (SELECT SUM(bytes) FROM base), 4) AS share
      FROM grp
    ),
    grams AS (
      SELECT array_to_string(tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + {_HH_N - 1}], ' ') AS ngram
      FROM (SELECT {_DUCK_TOKS} AS tk FROM documents), generate_series(1, {_ORACLE_MAX_TOKENS}) AS s(i)
      WHERE i <= LEN(tk) - {_HH_N - 1}
    ),
    hh AS (
      SELECT 'boilerplate' AS section, ngram AS key, COUNT(*) AS n,
             CAST(NULL AS BIGINT) AS n_bytes, CAST(NULL AS BIGINT) AS n_tokens,
             CAST(NULL AS DOUBLE) AS len_p50, CAST(NULL AS DOUBLE) AS len_p90,
             CAST(NULL AS DOUBLE) AS len_p99, CAST(NULL AS DOUBLE) AS dup_ratio,
             CAST(NULL AS DOUBLE) AS share
      FROM grams GROUP BY ngram ORDER BY n DESC, key LIMIT {_HH_K}
    )
    SELECT * FROM comp UNION ALL SELECT * FROM hh ORDER BY section, key
    """,
    doc=(
        "The corpus data card in one frame, two tagged sections: "
        "'composition' — per-source + __all__ rollup rows from the real "
        "corpus_stats cube (doc/byte/token counts, exact interpolated "
        "token-length quantiles, exact-duplicate ratio, byte share); "
        "'boilerplate' — the exact counts of the top-20 word-3-grams from "
        "the real two-phase heavy_hitter_ngrams (bounded per-partition "
        "Misra-Gries candidates → broadcast exact rescore; the shuffle "
        "carries candidates, never the distinct n-gram key space)."
    ),
)
def corpus_report(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    stats = corpus_stats(docs, exact_quantiles=True)
    comp = stats.select(
        F.lit("composition").alias("section"),
        F.col("source").alias("key"),
        F.col("n_docs").cast("long").alias("n"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("len_p50").cast("double"), 4).alias("len_p50"),
        F.round(F.col("len_p90").cast("double"), 4).alias("len_p90"),
        F.round(F.col("len_p99").cast("double"), 4).alias("len_p99"),
        "dup_ratio",
        "share",
    )
    hh = heavy_hitter_ngrams(
        docs, n=_HH_N, top_k=_HH_K, candidates_per_partition=_HH_CAP
    ).select(
        F.lit("boilerplate").alias("section"),
        F.col("ngram").alias("key"),
        F.col("count").cast("long").alias("n"),
        F.lit(None).cast("long").alias("n_bytes"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("double").alias("len_p50"),
        F.lit(None).cast("double").alias("len_p90"),
        F.lit(None).cast("double").alias("len_p99"),
        F.lit(None).cast("double").alias("dup_ratio"),
        F.lit(None).cast("double").alias("share"),
    )
    return comp.unionByName(hh).orderBy("section", "key")
