"""BM25 lexical relevance + reciprocal-rank fusion — the keyword half
of a hybrid retrieval stack (the ANN family in ``operators/ann.py`` /
``pq.py`` / ``sq.py`` is the dense half; RRF is the standard way the
two are combined).

BM25 is the Okapi ranking function in the Lucene parameterization
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework"):

    score(d, q) = sum over t in q of
        idf(t) * tf(t, d) * (k1 + 1)
                 / (tf(t, d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

RRF (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion
outperforms Condorcet"): ``sum over systems of 1 / (k + rank_i)`` for
every candidate in the union of the systems' top-K shortlists — no
score calibration between systems needed, which is exactly why it is
the default fusion for lexical+dense hybrid search.

Both are deterministic closed-form arithmetic, so the whole chain
re-derives in ANSI SQL and sits inside the driver's hash gate
(plans/text.py ``vocab_coverage``'s bm25/cos_q/rank/rrf columns).

Scale design (100 TB):

- ``bm25_scores``: the corpus statistics (N, avgdl, one df counter per
  query term) are ONE aggregate whose WIDTH is bounded by the query —
  never by the vocabulary — broadcast back as a one-row frame (the
  established scalar-frame crossJoin pattern). Scoring is then a pure
  MAP-SIDE projection over the staged token array: per-term tf is one
  ``filter`` of that array, so per-doc cost is O(dl x |query|) and raw
  text never shuffles. No inverted index is materialized — on Spark
  the scan IS the index scan; a production deployment that needs
  sub-scan latency would layer partition pruning (Z-order on a route
  key) in front, not change this operator.
- ``rrf_fuse``: ranks are computed only on each system's TOP-K
  shortlist (``orderBy().limit(top)`` = TakeOrderedAndProject — a
  bounded per-partition heap + single merge, never a global sort of
  the corpus), the ranking window runs over K rows, and the fusion is
  a full-outer join of K-row frames. Everything downstream of the
  shortlists is driver-scale by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "rrf_fuse"]


def _term_literal(term: str) -> str:
    # backslashes are rejected too: Spark SQL string literals process
    # escape sequences, so '\t' would silently match a TAB, not the text
    if not term or "'" in term or "\\" in term:
        raise ValueError(
            f"query term must be non-empty without quotes or backslashes: {term!r}"
        )
    return f"'{term}'"


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_expr: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id, bm25, *keep_cols)`` — Okapi BM25 of a fixed query against
    every document (module doc for the formula and the scale shape).

    ``tokens_expr`` overrides the tokenizer (a SQL expression producing
    ``array<string>``; default whitespace-split of the lowercased
    text) so a caller can match the tokenization of the columns it
    joins against. ``bm25`` is the raw double — callers round for
    hash-gate use (the cosine-gate convention)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    if k1 <= 0 or not (0 <= b <= 1):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got {k1}, {b}")
    reserved = {"_bt", "_dl", "_n", "_avgdl", "bm25"} | {
        f"_tf{i}" for i in range(len(query_terms))
    } | {f"_df{i}" for i in range(len(query_terms))}
    clash = {id_col, *keep_cols} & reserved
    if clash:
        raise ValueError(f"column(s) {sorted(clash)} collide with {sorted(reserved)}")
    toks = (
        tokens_expr
        if tokens_expr is not None
        else f"filter(split(lower(coalesce({text_col}, '')), ' '), w -> w <> '')"
    )
    # stage 1: the token array materializes once; stage 2: per-term tf
    # (one array filter each) + doc length — everything map-side
    staged = docs.select(F.col(id_col), F.expr(toks).alias("_bt"), *keep_cols).select(
        id_col,
        *keep_cols,
        F.expr("size(_bt)").cast("long").alias("_dl"),
        *[
            F.expr(f"size(filter(_bt, w -> w = {_term_literal(t)}))")
            .cast("long")
            .alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # ONE aggregate, width bounded by the query: N, avgdl, df per term
    stats = staged.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        norm = tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        term = F.when(tf == 0, F.lit(0.0)).otherwise(idf * tf * (k1 + 1) / norm)
        score = term if score is None else score + term
    return staged.crossJoin(F.broadcast(stats)).select(
        id_col, score.alias("bm25"), *keep_cols
    )


def rrf_fuse(
    systems: Sequence[tuple[str, DataFrame]],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """``(id, <name>_rank ... , rrf)`` — reciprocal-rank fusion of the
    systems' top-``top`` shortlists (module doc). Each input frame is
    ``(id, score)``; ranking is (score desc, id asc) — ties break
    deterministically on id. A document outside a system's shortlist
    contributes nothing for that system; a document outside every
    shortlist is absent from the output. ``rrf`` is the raw double."""
    if not systems:
        raise ValueError("systems must be non-empty")
    names = [n for n, _ in systems]
    if len(set(names)) != len(names):
        raise ValueError(f"system names must be distinct: {names}")
    if k < 1 or top < 1:
        raise ValueError(f"need k >= 1 and top >= 1, got {k}, {top}")
    out_cols = {f"{n}_rank" for n in names} | {"rrf"}
    if id_col in out_cols:
        raise ValueError(f"id_col {id_col!r} collides with output columns")
    fused = None
    for name, df in systems:
        # TakeOrderedAndProject shortlist, then rank WITHIN the K rows
        # (the single-partition window is bounded by `top`, not the
        # corpus)
        short = (
            df.select(F.col(id_col), F.col(score_col))
            .orderBy(F.desc(score_col), F.asc(id_col))
            .limit(top)
        )
        ranked = short.select(
            id_col,
            F.row_number()
            .over(Window.orderBy(F.desc(score_col), F.asc(id_col)))
            .cast("int")
            .alias(f"{name}_rank"),
        )
        fused = ranked if fused is None else fused.join(ranked, id_col, "full_outer")
    rrf = None
    for name in names:
        c = F.coalesce(1.0 / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0))
        rrf = c if rrf is None else rrf + c
    return fused.select(
        id_col, *[f"{n}_rank" for n in names], rrf.alias("rrf")
    )
