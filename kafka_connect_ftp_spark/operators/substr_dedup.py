"""Exact duplicated-substring masking — the ExactSubstr dedup of Lee et
al. 2021 ("Deduplicating Training Data Makes Language Models Better"),
at token granularity: remove from every document each span that also
occurs elsewhere in the corpus, not just whole-document or
whole-paragraph copies (operators/span_dedup.py is the paragraph-grain
C4 variant; this catches the boilerplate SENTENCE spliced into
otherwise-unique pages).

Equivalence that makes it Spark-expressible without a suffix array: a
token position lies inside some duplicated substring of length >= L
IFF it is covered by some duplicated L-gram (a longer duplicated span's
every L-window is itself duplicated; a duplicated L-gram IS such a
span). So the masked-position set of suffix-array ExactSubstr at
threshold L equals the union of occurrences of L-grams whose corpus
frequency is >= 2 — three relational steps:

1. one pass emits ``(doc, position, L-gram)`` (map-side explode);
2. a gram-keyed count finds the duplicated grams (map-side partial
   combine; state bounded by DISTINCT grams). The join back onto
   occurrences is gram-keyed too — at 100 TB both legs shuffle a HASH
   of the gram, never the text (here the gram text itself, so tests and
   the pure-Python reference compare exact strings; production swaps
   ``xxhash64(gram)`` with the documented 2^-64-per-pair collision
   trade, exactly like operators/text_dedup's hash_fn knob);
3. covered positions (each duplicated occurrence explodes to its L
   positions, bounded by L x duplicated occurrences) collapse to one
   sorted mask array per document, and the rebuild is MAP-SIDE: filter
   the original token array by mask membership — the document text
   never shuffles.

Self-repetition counts: a gram occurring twice WITHIN one document is
duplicated (corpus frequency 2) — same as the reference algorithm,
which matches any other occurrence regardless of source document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "filter(split({col}, ' '), x -> x <> '')"


def mask_duplicated_substrings(
    docs: DataFrame,
    *,
    l: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input row: ``(id_col, n_tokens, n_masked,
    kept_text)`` — tokens covered by any corpus-duplicated ``l``-gram
    are dropped, the rest re-join with single spaces (the reference
    implementation's whitespace normalization). Documents shorter than
    ``l`` tokens can never be masked.

    CONTRACT (the repetition_signals convention): ``id_col`` must be
    unique and non-null. NULL ids fail loudly at execution time (a null
    key would count its grams into dup_grams but never match the mask
    equi-join back — the document would return fully UNMASKED);
    duplicate ids would union two documents' masks and fan out the
    join, masking tokens unique within each individual doc."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    toks = docs.select(
        F.col(id_col),
        # NULL text tokenizes to the empty array (split(NULL) is NULL,
        # and size(NULL) would report -1 tokens downstream)
        F.coalesce(
            F.expr(_TOKS.format(col=text_col)),
            F.expr("cast(array() as array<string>)"),
        ).alias("_tk"),
    )
    occ = toks.filter(F.size("_tk") >= l).select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_tk) - {l - 1}),"
                f" i -> struct(i as i, array_join(slice(_tk, i, {l}), ' ') as g))"
            )
        ).alias("o"),
    ).select(id_col, "o.i", "o.g")
    dup_grams = (
        occ.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("g")
    )
    mask = (
        occ.join(dup_grams, "g")
        .select(id_col, F.explode(F.sequence(F.col("i"), F.col("i") + (l - 1))).alias("_pos"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("_pos")).alias("_mask"))
    )
    kept = F.expr("filter(_tk, (x, i) -> NOT array_contains(_mask, i + 1))")
    # NULL-id guard on the DOCS-GRAIN output branch only (every input
    # row reaches it, so the raise still fires) — on the `toks` base it
    # would be CollapseProject-inlined into every exploded occurrence
    # row (the repetition_signals lesson, measured ~20% there).
    # BOUNDARY: the guard rides the OUTPUT id column; a caller that
    # projects the id away before an action lets ColumnPruning remove
    # the check along with the column — validate upstream when feeding
    # anonymous frames (every registry plan and example consumes the id)
    id_checked = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"mask_duplicated_substrings: NULL {id_col} (ids must be unique non-null)")
        ),
    ).otherwise(F.col(id_col))
    return (
        toks.join(mask, id_col, "left")
        .select(
            id_checked.alias(id_col),
            F.size("_tk").cast("long").alias("n_tokens"),
            F.coalesce(F.size("_mask"), F.lit(0)).cast("long").alias("n_masked"),
            F.when(F.col("_mask").isNull(), F.array_join("_tk", " "))
            .otherwise(F.array_join(kept, " "))
            .alias("kept_text"),
        )
    )
