"""Corpus composition statistics: the "know your data" report every
training-data pipeline runs before and after filtering.

One pass over the documents frame produces per-group (default: per
``source``) composition rows — document/byte/token counts, length
quantiles, duplication ratio — plus an ALL-corpus rollup row, so a
mixture designer can see each source's weight and shape at a glance.

Scale design: a single ``GROUPING SETS``-style aggregation (group +
grand total via ``cube`` on one column = 2 grouping sets); token counts
come from one ``size(split(...))`` map-side expression — the text is
never exploded and never shuffles; only per-group partial aggregates
move. ``approx_percentile`` keeps the quantiles mergeable (t-digest
style sketch), which is what makes them computable in one pass at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "size(filter(split(text, ' '), x -> x <> ''))"


def corpus_stats(
    docs: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    exact_quantiles: bool = False,
    approx_distinct: bool = False,
) -> DataFrame:
    """Composition report: one row per ``group_col`` value plus an
    ``__all__`` rollup row. Columns: ``n_docs``, ``n_bytes``,
    ``n_tokens``, ``len_p50/p90/p99`` (token-length quantiles),
    ``dup_ratio`` (1 - distinct_texts/docs: exact-duplicate mass),
    ``share`` (group's fraction of corpus bytes).

    ``exact_quantiles=True`` swaps the mergeable ``approx_percentile``
    sketch for the exact interpolated ``percentile`` (sorts each group's
    token counts — fine up to millions of docs per group, and what the
    oracle-checked registry row uses since it matches DuckDB's
    ``quantile_cont`` bit-for-bit after rounding); the default sketch is
    the 100 TB path.

    ``approx_distinct=True`` swaps the exact ``count_distinct`` behind
    ``dup_ratio`` for HyperLogLog++ (``approx_count_distinct``, default
    ~2% rsd). The exact form shuffles every distinct fingerprint to its
    group reducer — fine to billions, but at 100 TB the HLL sketch (a
    few KB per group, mergeable map-side) is the right trade for a
    ratio that informs a mixing decision, not an audit."""
    base = docs.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("__null__")).alias("grp"),
        F.octet_length(text_col).cast("long").alias("bytes"),
        F.expr(_TOKS.replace("text", text_col)).cast("long").alias("toks"),
        F.md5(F.col(text_col).cast("binary")).alias("fp"),
    )
    # Round 12 (the order_rollup_family finding, guide §2.3/§5): an
    # exact COUNT(DISTINCT fp) in the SAME aggregation as the percentile
    # multiplies pathologically — RewriteDistinctAggregates expands every
    # row once per aggregate branch on top of the cube's 2-set Expand,
    # and the percentile buffers are then allocated per (grouping set,
    # fp) PARTIAL key: one value-list object per distinct document
    # fingerprint, memory growing with corpus cardinality instead of the
    # handful of output groups. The exact distinct count therefore runs
    # in its OWN cube aggregation (narrow (grp, fp) rows, plain
    # two-phase HashAggregate) and joins back broadcast on the
    # null-safe (grouping marker, grp) key — groups+1 rows. The HLL
    # sketch (approx_distinct=True) is mergeable and triggers no
    # rewrite, so it stays fused in the single pass.
    main_aggs = [
        # grouping() (not a sentinel compare) marks the rollup row, so
        # a user group literally named "__all__" can never be mistaken
        # for it in the share denominator below
        F.grouping("grp").alias("_is_total"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bytes").alias("n_bytes"),
        F.sum("toks").alias("n_tokens"),
        (
            F.expr("percentile(toks, array(0.5D, 0.9D, 0.99D))")
            if exact_quantiles
            else F.percentile_approx("toks", [0.5, 0.9, 0.99])
        ).alias("_q"),
    ]
    if approx_distinct:
        main = base.cube("grp").agg(
            *main_aggs, F.approx_count_distinct("fp").alias("_n_distinct")
        )
    else:
        main = base.cube("grp").agg(*main_aggs)
        dist = base.cube("grp").agg(
            F.grouping("grp").alias("_is_total"),
            F.count_distinct("fp").alias("_n_distinct"),
        )
        main = main.join(
            F.broadcast(dist),
            [
                main["_is_total"].eqNullSafe(dist["_is_total"]),
                main["grp"].eqNullSafe(dist["grp"]),
            ],
            "inner",
        ).select(
            main["grp"], main["_is_total"], "n_docs", "n_bytes",
            "n_tokens", "_q", dist["_n_distinct"],
        )
    agg = (
        main
        .select(
            "_is_total",
            F.when(F.col("_is_total") == 1, "__all__").otherwise(F.col("grp")).alias(group_col),
            "n_docs",
            "n_bytes",
            "n_tokens",
            F.col("_q")[0].alias("len_p50"),
            F.col("_q")[1].alias("len_p90"),
            F.col("_q")[2].alias("len_p99"),
            # least() clamp: HLL++ can OVER-estimate distincts beyond
            # n_docs, which would drive the ratio negative — a no-op for
            # the exact count
            F.round(
                1 - F.least(F.col("_n_distinct"), F.col("n_docs")) / F.col("n_docs"), 4
            ).alias("dup_ratio"),
        )
    )
    # share = group bytes / corpus bytes; the rollup row itself is the
    # denominator, read back via a broadcast cross join against the
    # one-row total (NOT an empty-frame window, whose "No Partition
    # Defined" WARN would fire on every run; both agg subtrees are the
    # same plan, so ReuseExchange materializes the cube shuffle once and
    # the corpus is still scanned exactly once)
    total_row = agg.filter(F.col("_is_total") == 1).select(
        F.col("n_bytes").alias("_corpus_bytes")
    )
    return (
        agg.crossJoin(F.broadcast(total_row))
        .withColumn("share", F.round(F.col("n_bytes") / F.col("_corpus_bytes"), 4))
        .drop("_is_total", "_corpus_bytes")
        .orderBy(group_col)
    )
