"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, the standard recipe for
domain-targeted pretraining data selection (used to build
target-matched slices of CommonCrawl-scale corpora).

Method, re-derived from the paper for Spark:

1. Featurize text as hashed word n-grams (unigrams + bigrams), each
   hashed into one of ``n_buckets`` buckets — collisions are part of
   the method (the feature space is the BUCKET space, so both models
   are exactly B-dimensional regardless of corpus size).
2. Fit two bag-of-buckets multinomials with add-α smoothing: ``p_t``
   on the target corpus, ``p_r`` on the raw corpus.
3. Per document: importance log-weight ``log w = Σ_g  ln p_t[h(g)] −
   ln p_r[h(g)]`` over the document's gram stream (its hashed-n-gram
   log likelihood ratio).
4. Resample without replacement ∝ w via the Gumbel-top-k trick:
   ``key = log w + Gumbel(u)`` with ``u`` a deterministic per-doc hash
   uniform (operators/mixing.py convention — no RNG, so selection is
   reproducible and replay-safe), take the global top-k keys.

Engine-portability: the gram hash is the md5-prefix trick of
``mixing.uniform_hash`` (``conv(substr(md5(gram),1,13),16,10) % B``)
rather than xxhash64, so a DuckDB oracle can re-derive every bucket id
— which is what puts this operator inside the driver's hash gate
(plans/text.py:vocab_coverage). Like the text-dedup family
(plans/text.py module doc), a production deployment swaps the md5
bucket for ``pmod(xxhash64(gram), B)`` — same plan shape, cheaper
hash; only the oracle needs md5.

Scale design (100 TB): the two count aggregations shuffle (bucket,
count) rows bounded by B — never corpus-proportional; the ratio table
(B rows) broadcasts to the scoring pass, which is one explode +
map-side hash + per-doc sum; selection has TWO regimes, auto-routed on
n (``dsir_select`` docstring): small n compiles to
TakeOrderedAndProject (bounded k per partition, then k at the driver's
reducer), while the fraction regime — DSIR's canonical use, n in the
billions — locates the n-th largest Gumbel key distributedly
(percentile_approx + an exact bounded boundary correction) and keeps
map-side on ``_gk > T``, so nothing corpus-proportional ever funnels
to the driver or broadcasts. Raw text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.mixing import uniform_hash

# word tokenizer shared with the text plans and lm_score: split on
# single spaces, drop empties (the plans/text.py _TOKS rule — identical
# on both engines, unlike a regex split whose \s classes differ)
_TOKS = "filter(split({col}, ' '), x -> x <> '')"
# unigrams + space-joined bigrams as ONE gram stream per document
_GRAMS = (
    "concat({t}, CASE WHEN size({t}) < 2 THEN array()"
    " ELSE zip_with(slice({t}, 1, size({t}) - 1),"
    "              slice({t}, 2, size({t}) - 1),"
    "              (a, b) -> concat(a, ' ', b)) END)"
)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-prefix hash bucket — bit-identical to the DuckDB twin
    ``('0x' || substr(md5(g),1,13))::BIGINT % B`` (52 bits, exact)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")


def gram_buckets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """``(doc_id, bucket)`` — one row per gram occurrence (unigrams +
    bigrams, hashed). The featurization shared by model fitting and
    scoring, so the two can never disagree."""
    toks = _TOKS.format(col=text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_GRAMS.format(t=toks))).alias("_g"),
    ).select("doc_id", _bucket(F.col("_g"), n_buckets).alias("bucket"))


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 512,
    alpha: float = 0.5,
) -> DataFrame:
    """The B-row ``(bucket, log_ratio)`` table: ``ln p_t[b] − ln p_r[b]``
    under add-α smoothing. Complete over all B buckets (a gram hashing
    into a bucket unseen by both corpora scores the constant smoothing
    ratio instead of vanishing). Bounded by B — broadcastable at any
    corpus size."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    spark = target.sparkSession

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            gram_buckets(df.select(F.lit(0).alias("doc_id"), text_col),
                         text_col=text_col, n_buckets=n_buckets)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    base = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        base.join(counts(target, "_ct"), "bucket", "left")
        .join(counts(raw, "_cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_ct", F.lit(0)).alias("_ct"),
            F.coalesce("_cr", F.lit(0)).alias("_cr"),
        )
    )
    tot = joined.agg(
        F.sum("_ct").alias("_nt"), F.sum("_cr").alias("_nr")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("_ct") + alpha) / (F.col("_nt") + alpha * n_buckets))
            - F.log((F.col("_cr") + alpha) / (F.col("_nr") + alpha * n_buckets))
        ).alias("log_ratio"),
    )


def dsir_scores(
    docs: DataFrame,
    logratio: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
) -> DataFrame:
    """Per-document importance log-weight: ``(doc_id, dsir_logw)`` —
    the hashed-gram log likelihood ratio summed over the document's
    gram stream. Gram-less documents score 0. ``n_buckets`` must match
    the table's — enforced IN-PLAN at execution (round 12): the former
    eager ``logratio.count()`` executed the table's full lineage (two
    corpus aggregations) as a driver-blocking job per plan
    CONSTRUCTION; the guard now rides the gram stream as an
    ``assert_true`` over a broadcast 1-row count of the table, raising
    the same bucket-space message from the first executed gram batch.
    (Narrowing: a gram-less corpus no longer raises on a mismatched
    table — there are no rows to check against; it returns the same
    empty/zero scores either way.)"""
    n_check = logratio.agg(F.count(F.lit(1)).alias("_n_buckets"))
    guard = F.assert_true(
        F.col("_n_buckets") == F.lit(n_buckets),
        F.concat(
            F.lit("logratio has "),
            F.col("_n_buckets").cast("string"),
            F.lit(
                f" rows but n_buckets={n_buckets}; "
                "featurization and model must share the bucket space"
            ),
        ),
    )
    per_doc = (
        gram_buckets(docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets)
        .crossJoin(F.broadcast(n_check))
        .where(guard.isNull())
        .drop("_n_buckets")
        .join(F.broadcast(logratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("log_ratio").alias("dsir_logw"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("dsir_logw", F.lit(0.0)).alias("dsir_logw"))
    )


def dsir_select(
    scored: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logw",
    salt: str = "v1",
    mode: str = "auto",
    topk_max: int = 100_000,
    accuracy: int = 50_000,
) -> DataFrame:
    """Gumbel-top-``n`` resampling without replacement ∝ exp(weight):
    adds ``dsir_keep`` to ``scored``. The Gumbel noise is derived from
    the deterministic per-doc hash uniform (no RNG — reproducible,
    replay-safe, partition-layout-independent). The selected set is
    identical across modes: the global top ``n`` rows by
    ``(_gk desc, id asc)``.

    Two physical regimes, routed by ``mode``:

    - ``"topk"`` (auto for ``n <= topk_max``): ``orderBy().limit(n)``
      compiles to TakeOrderedAndProject and the n selected ids
      broadcast — right when n is genuinely small (a top-k style
      selection).
    - ``"threshold"`` (auto above ``topk_max``): DSIR's canonical use
      selects a FRACTION of the corpus — n in the billions at 100 TB —
      where funneling n rows through the driver and broadcasting n ids
      is a driver OOM by design. Instead the n-th largest Gumbel key is
      located distributedly: ``percentile_approx`` (one agg, rank error
      <= total/``accuracy``) gives a candidate threshold, an exact
      count above it measures the miss, and a BOUNDED boundary pass
      (TakeOrdered of at most ~total/accuracy rows, broadcast of those
      ids only) corrects it exactly. The bulk keep decision is then a
      map-side ``_gk > T`` filter — nothing corpus-proportional ever
      reaches the driver. Ties across the boundary resolve on
      ``(key, id)`` exactly as the top-k path does (test-pinned equal).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if mode not in ("auto", "topk", "threshold"):
        raise ValueError(f"mode must be auto|topk|threshold, got {mode!r}")
    gumbel = -F.log(-F.log(uniform_hash(F.col(id_col), salt)))
    keyed = scored.withColumn("_gk", F.col(weight_col) + gumbel)
    if mode == "topk" or (mode == "auto" and n <= topk_max):
        top = (
            keyed.orderBy(F.desc("_gk"), F.asc(id_col))
            .limit(n)
            .select(F.col(id_col), F.lit(True).alias("dsir_keep"))
        )
        return (
            keyed.drop("_gk")
            .join(F.broadcast(top), id_col, "left")
            .withColumn("dsir_keep", F.coalesce("dsir_keep", F.lit(False)))
        )
    return _select_threshold(
        keyed, n, id_col=id_col, accuracy=accuracy
    )


def _select_threshold(
    keyed: DataFrame, n: int, *, id_col: str, accuracy: int
) -> DataFrame:
    """The fraction-regime select (docstring above): exact same set as
    the top-k path, no corpus-proportional driver materialization. The
    boundary correction is bounded by percentile_approx's rank-error
    guarantee (<= total/accuracy rows; 2kB/id at n=5e10, accuracy=5e4
    is a ~1e6-row worst-case TakeOrdered — still bounded, and the
    ``accuracy`` knob trades agg memory for a tighter band)."""
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100, got {accuracy}")
    total = keyed.count()
    if n >= total:
        return keyed.drop("_gk").withColumn("dsir_keep", F.lit(True))
    p = (total - n) / total
    t0 = keyed.agg(
        F.percentile_approx("_gk", F.lit(p), F.lit(accuracy)).alias("t")
    ).first()["t"]
    c_hi = keyed.filter(F.col("_gk") > t0).count()
    d = n - c_hi
    # coalesce to a definite False on NULL keys (a custom scored frame
    # with a NULL weight yields NULL _gk; NULL > t0 is NULL and
    # NULL | false stays NULL) — the topk path coalesces identically,
    # and the two regimes must not differ on any input
    base_keep = F.coalesce(F.col("_gk") > F.lit(t0), F.lit(False))
    if d == 0:
        out = keyed.withColumn("dsir_keep", base_keep)
    elif d > 0:
        # threshold landed too high: admit the best d rows at/below it,
        # in exactly the global (desc key, asc id) order
        extra = (
            keyed.filter(~base_keep)
            .orderBy(F.desc("_gk"), F.asc(id_col))
            .limit(d)
            .select(F.col(id_col), F.lit(True).alias("_extra"))
        )
        out = (
            keyed.join(F.broadcast(extra), id_col, "left")
            .withColumn("dsir_keep", base_keep | F.coalesce("_extra", F.lit(False)))
            .drop("_extra")
        )
    else:
        # threshold landed too low: evict the worst -d rows above it —
        # the tail of the global order is the head of the reversed one
        drop = (
            keyed.filter(base_keep)
            .orderBy(F.asc("_gk"), F.desc(id_col))
            .limit(-d)
            .select(F.col(id_col), F.lit(True).alias("_drop"))
        )
        out = (
            keyed.join(F.broadcast(drop), id_col, "left")
            .withColumn("dsir_keep", base_keep & ~F.coalesce("_drop", F.lit(False)))
            .drop("_drop")
        )
    return out.drop("_gk")
