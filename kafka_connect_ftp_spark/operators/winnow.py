"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003;
the MOSS sketch): hash every character k-gram with a polynomial rolling
hash, slide a w-hash window, and keep each window's MINIMUM hash. The
guarantee: any shared substring of length >= k + w - 1 between two
documents contributes at least one SHARED fingerprint, so the selected
set is a position-free sketch for substring-level copy detection —
complementary to MinHash (set resemblance, text_dedup.py), SimHash
(frequency-weighted similarity) and ExactSubstr (exact byte runs,
substr_dedup.py).

Engine mapping: the whole sketch is higher-order ARRAY functions inside
one projection — split to codepoints, k-gram hashes via an explicit
k-term polynomial (k is a small constant, so O(n·k) beats maintaining a
rolling state Spark HOFs cannot express), window minima via a w-term
``least``, ``array_distinct`` for the value set. Zero shuffles, zero
Python, whole-stage-codegen friendly; the per-doc profile aggregates
nothing (one scan, like text_profile). The value SET equals the
standard algorithm's selected-hash set: every selected hash is some
window's minimum and every window minimum is selected for that window
(position/tie bookkeeping — "rightmost minimum" — only affects which
OCCURRENCE is recorded, which a position-free sketch drops anyway).

Hash parity contract: the polynomial sum(codepoint_i%1024 · 131^j) is
exact int64 arithmetic — max sum 1023·Σ131^j (j<8) ≈ 6.8e17 < 2^63 —
so the DuckDB oracle reproduces it bit-for-bit with the same literals
(no engine-specific hash functions anywhere in the definition; the
round-10 precedent for cross-engine derivations). Codepoints fold mod
1024 only to bound the sum; collisions merely merge rare grams, which
winnowing tolerates by construction.

Scale (100 TB): the sketch is embarrassingly parallel (per-document
projection). ``winnow_candidate_pairs`` joins on fingerprints — the
classic hot-key risk is boilerplate fingerprints shared by millions of
documents, and the fix is MOSS's own: drop fingerprints whose document
frequency exceeds ``max_df`` BEFORE the pair join (a common fingerprint
carries no copy-detection signal), making every join bucket bounded.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 8       # gram width (characters)
W_DEFAULT = 4       # winnowing window (hashes) -> guarantee t = k+w-1
BASE = 131          # polynomial base
CP_MOD = 1024       # codepoint fold keeping the k-term sum inside int64


def _codepoints(text: Column) -> Column:
    """``array<int>`` of (folded) codepoints. split('') on an empty
    string yields [''] whose ascii is 0 — a phantom codepoint the
    length guard removes."""
    cps = F.transform(F.split(text, ""), lambda c: F.ascii(c) % CP_MOD)
    return F.when(F.length(text) > 0, cps).otherwise(
        F.array().cast("array<int>")
    )


def _safe_index(arr: Column, width: int) -> Column:
    """1-based start indices of width-``width`` windows over ``arr`` —
    explicitly empty below ``width`` elements: Spark's sequence(1, 0)
    is the DESCENDING [1, 0] (the round-11 bare-TLD bug), never a safe
    empty."""
    return F.when(
        F.size(arr) >= width,
        F.sequence(F.lit(1), F.size(arr) - (width - 1)),
    ).otherwise(F.array().cast("array<int>"))


def winnow_set(gh: Column, w: int = W_DEFAULT) -> Column:
    """``array<long>`` — the distinct window-minimum hashes (the
    winnowing sketch as a value set)."""
    mins = F.transform(
        _safe_index(gh, w),
        lambda i: F.least(*[F.element_at(gh, i + j) for j in range(w)]),
    )
    return F.array_distinct(mins)


def _staged(
    docs: DataFrame, k: int, w: int, id_col: str, text_col: str
) -> DataFrame:
    """``(doc_id, _gh, _fps)`` built in SEPARATE projection stages.
    This staging is load-bearing, not style: Spark performs no common-
    subexpression elimination inside higher-order-function lambdas, so
    inlining ``cps`` into the k ``element_at`` references (and ``gh``
    into the w, and ``fps`` into the 5 outputs) re-evaluates the whole
    upstream chain per reference — measured as a multi-minute hang at
    sf0.001 versus sub-second staged. Distinct select() stages keep
    each array a named column computed once per row; CollapseProject
    leaves them alone because the referenced expressions are non-cheap
    and multiply referenced."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _codepoints(F.coalesce(F.col(text_col), F.lit(""))).alias("_cps"),
        )
        .select("doc_id", gram_hashes_col(F.col("_cps"), k).alias("_gh"))
        .select("doc_id", "_gh", winnow_set(F.col("_gh"), w).alias("_fps"))
    )


def gram_hashes_col(cps: Column, k: int = K_DEFAULT) -> Column:
    """Polynomial k-gram hashes from an ALREADY-MATERIALIZED codepoint
    array column (see _staged for why materialization matters)."""

    def gh(i: Column) -> Column:
        return reduce(
            lambda a, b: a + b,
            [
                F.element_at(cps, i + j).cast("long") * F.lit(BASE**j)
                for j in range(k)
            ],
        )

    return F.transform(_safe_index(cps, k), gh)


def winnow_fingerprints(
    docs: DataFrame,
    *,
    k: int = K_DEFAULT,
    w: int = W_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, fp)`` — one row per distinct fingerprint per document
    (the exploded sketch, the shape the pair join consumes).

    explode_OUTER + null filter, not a plain explode: the optimizer's
    InferFiltersFromGenerate synthesizes a non-empty-array predicate
    from an inner explode and pushes it BELOW the staged projections —
    re-inlining the whole winnow chain into one Filter condition where
    no CSE applies (the _staged hazard, squared: ~5e9 interpreted ops
    per row; 500 tiny docs ran minutes). An outer explode admits no
    such inference — empty sketches surface as one NULL row — and the
    explicit fp-not-null filter sits ABOVE the Generate on the output
    attribute, costing nothing."""
    return (
        _staged(docs, k, w, id_col, text_col)
        .select("doc_id", F.explode_outer("_fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def fp_summary_cols(gh: Column, fps: Column) -> list[Column]:
    """The sketch-summary contract, in ONE place (shared with the
    fingerprint-family plan in plans/text.py so plan and operator can
    never drift): ``n_grams, n_fps, fp_xor, fp_min, fp_max`` — empty
    sketches report xor 0 and min/max -1, mirrored literally by the
    DuckDB oracle twin."""
    return [
        F.size(gh).cast("long").alias("n_grams"),
        F.size(fps).cast("long").alias("n_fps"),
        F.aggregate(
            fps, F.lit(0).cast("long"), lambda a, x: a.bitwiseXOR(x)
        ).alias("fp_xor"),
        F.coalesce(F.array_min(fps), F.lit(-1)).cast("long").alias("fp_min"),
        F.coalesce(F.array_max(fps), F.lit(-1)).cast("long").alias("fp_max"),
    ]


def winnow_profile(
    docs: DataFrame,
    *,
    k: int = K_DEFAULT,
    w: int = W_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sketch summary — ``(doc_id, *fp_summary_cols)``.
    Staged projections, no shuffle, no explode."""
    return _staged(docs, k, w, id_col, text_col).select(
        "doc_id", *fp_summary_cols(F.col("_gh"), F.col("_fps"))
    )


def winnow_candidate_pairs(
    docs: DataFrame,
    *,
    k: int = K_DEFAULT,
    w: int = W_DEFAULT,
    min_shared: int = 2,
    max_df: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_a, doc_b, n_shared)`` — unordered document pairs sharing
    at least ``min_shared`` fingerprints, doc_a < doc_b. Fingerprints
    appearing in more than ``max_df`` documents are dropped BEFORE the
    join (module doc: boilerplate carries no copy signal and is the
    join's only hot-key risk — with it removed every fingerprint
    bucket expands at most max_df² pairs)."""
    fps = winnow_fingerprints(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    kept = fps.join(rare, "fp", "left_semi")
    a = kept.select("fp", F.col("doc_id").alias("doc_a"))
    b = kept.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
