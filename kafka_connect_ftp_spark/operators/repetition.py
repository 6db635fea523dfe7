"""Intra-document repetition signals — the Gopher/MassiveText repetition
rules (Rae et al. 2021, §A1.1) that catch boilerplate loops, scraper
artifacts and keyword-stuffed pages which pass simple length/diversity
gates: a page whose most frequent 2-gram covers a third of its characters
is navigation chrome, not prose.

Per document, over whitespace tokens:

- ``dup_token_frac`` — fraction of token OCCURRENCES that are repeats of
  an earlier token (``(n - n_distinct) / n``);
- ``top_{n}gram_frac`` (n ∈ ``top_ns``, Gopher uses 2-4) — fraction of
  the document's characters covered by the single most frequent word
  n-gram (``count * chars(ngram) / chars(doc)``);
- ``dup_{n}gram_frac`` (n ∈ ``dup_ns``, Gopher uses 5-10) — fraction of
  n-gram occurrences that are duplicates (``(occurrences - distinct) /
  occurrences``). Gopher's original counts duplicated CHARACTER
  positions; the occurrence-fraction variant used here needs no
  position-coverage bookkeeping, is monotone in the same signal, and is
  exactly SQL-expressible — which keeps the whole profile inside the
  driver's hash gate.

Tie-break: "the most frequent n-gram" is deterministic up to the
reported fraction — among count-ties the LARGEST character mass
(``count * chars``) wins, so two engines never disagree on the output
even when they pick different equally-frequent grams.

Scale design (100 TB): one map-side explode emits ``(doc_id, n, gram)``
for all requested widths in a single pass over the corpus — the
document text itself never shuffles, only bounded gram strings. The
per-``(doc_id, n, gram)`` count hash-aggregates with map-side partial
combine (each document's gram stream originates on one mapper, so
within-doc duplicates collapse BEFORE the exchange and the shuffle
carries at most the distinct grams of each document). The two follow-up
aggregations run on the already-tiny ``(doc_id, n)`` grain. doc_id keys
every exchange — no skew (documents are length-bounded), no Python
anywhere.

The tie-break max is a struct max, which Spark plans as a
SortAggregate (struct buffers don't hash-aggregate): its sort runs on
the already-count-collapsed ``(doc_id, n, gram)`` grain — bounded by
each document's distinct grams, never corpus size — the same accepted
shape as span_dedup's min-struct decision aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKS = "filter(split({col}, ' '), x -> x <> '')"


def repetition_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    decimals: int = 6,
    count_frac_ns: tuple[int, ...] = (),
) -> DataFrame:
    """One row per input row: ``(id_col, n_tokens, dup_token_frac,
    top_{n}gram_frac..., dup_{n}gram_frac...)``, fractions rounded to
    ``decimals``. Documents too short for a width get 0.0 for that
    width's signal (nothing repeats in an empty stream).

    ``count_frac_ns`` opts into ``top_{n}gram_count_frac`` columns —
    the quality_filter_flags metric (max count / total occurrences,
    UNROUNDED; NULL when the doc has no n-width grams) computed off the
    SAME gram pass, so a composed gate (operators/rule_gate.py) never
    pays a second corpus scan for it.

    CONTRACT: ``id_col`` must be unique and non-null. NULL ids fail
    loudly at execution time (a null key would group its grams but be
    dropped by the equi-join back onto the input, silently zeroing every
    gram signal for that row); duplicate ids would fan out that join and
    break one-row-per-input-row — uniqueness is the caller's contract
    (checking it would cost an extra corpus-wide aggregate pass)."""
    if not top_ns and not dup_ns and not count_frac_ns:
        raise ValueError("at least one of top_ns/dup_ns must be non-empty")
    if any(n < 1 for n in (*top_ns, *dup_ns, *count_frac_ns)):
        raise ValueError(
            f"n-gram widths must be >= 1, got {top_ns} / {dup_ns} / {count_frac_ns}"
        )
    # the gram frame's internal column names; an id_col named like one
    # of them would make the (id, n, g) groupings ambiguous
    reserved = {"n", "g", "_tk", "_i", "_n_chars"}
    if id_col in reserved:
        raise ValueError(f"id_col {id_col!r} collides with internal names {sorted(reserved)}")
    base = docs.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("_n_chars"),
        F.expr(_TOKS.format(col=text_col)).alias("_tk"),
    )
    wide = gram_wide(
        docs,
        id_col=id_col,
        text_col=text_col,
        top_ns=top_ns,
        dup_ns=dup_ns,
        count_frac_ns=count_frac_ns,
    )
    # NULL-id guard on the DOCS-GRAIN join-back side only: every input
    # row (null id included) reaches this branch, so the raise still
    # fires on any null key — but the expression stays off the exploded
    # gram stream, where CollapseProject would inline the CASE into
    # every per-gram reference (measured ~20% on the whole operator).
    # BOUNDARY: the guard rides the OUTPUT id column; a caller that
    # projects the id away before an action lets ColumnPruning remove
    # the check along with the column — validate upstream when feeding
    # anonymous frames (every registry plan and example consumes the id)
    id_checked = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"repetition_signals: NULL {id_col} (ids must be unique non-null)")),
    ).otherwise(F.col(id_col))
    return base.join(wide, id_col, "left").select(
        id_checked.alias(id_col),
        *signal_columns(
            top_ns=top_ns,
            dup_ns=dup_ns,
            count_frac_ns=count_frac_ns,
            decimals=decimals,
        ),
    )


def gram_wide(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    count_frac_ns: tuple[int, ...] = (),
) -> DataFrame:
    """The ONE-corpus-scan gram-aggregate frame behind
    ``repetition_signals``: per id, ``_tm{n}`` (top char mass),
    ``_df{n}`` (dup occurrence fraction), ``_cf{n}`` (top count
    fraction). Exposed so a composed gate (operators/rule_gate.py) can
    join it against its OWN docs-grain projection instead of paying
    this module's join-back scan a second time; pair with
    :func:`signal_columns` on a frame carrying ``_tk``/``_n_chars``.

    One pass, all widths: explode token POSITIONS once, then stack()
    the per-width grams off each position (the token array is a
    materialized column — inlining the tokenizer in the lambdas would
    re-split per gram position). Positions past a width's last start
    emit NULL and are filtered. This form profiled ~3x faster than
    building per-width arrays of (n, gram) structs and flattening
    them (the struct arrays were materialized per doc row before the
    explode) while still reading the corpus ONCE — a per-width union
    is just as fast at bench scale but pays one full text scan per
    width at 100 TB. The size >= 1 guard matters: Spark's
    sequence(1, 0) auto-steps DOWN to [1, 0], which would fabricate
    two phantom positions for an empty document."""
    all_ns = sorted(set(top_ns) | set(dup_ns) | set(count_frac_ns))
    pos = docs.select(
        F.col(id_col),
        F.expr(_TOKS.format(col=text_col)).alias("_tk"),
    ).select(
        id_col,
        "_tk",
        F.explode(
            F.expr(
                "case when size(_tk) >= 1 then sequence(1, size(_tk)) else array() end"
            )
        ).alias("_i"),
    )
    stack_args = ", ".join(
        f"{n}, case when _i <= size(_tk) - {n - 1} then"
        f" concat_ws(' ', slice(_tk, _i, {n})) end"
        for n in all_ns
    )
    grams = pos.select(
        id_col, F.expr(f"stack({len(all_ns)}, {stack_args})").alias("n", "g")
    ).filter(F.col("g").isNotNull())

    counts = grams.groupBy(id_col, "n", "g").agg(F.count(F.lit(1)).alias("c"))
    per_n = counts.groupBy(id_col, "n").agg(
        # struct max = (count, char-mass) lexicographic: max count first,
        # then max mass among count-ties — the deterministic tie-break
        F.max(
            F.struct(
                F.col("c"), (F.col("c") * F.length("g")).cast("long").alias("mass")
            )
        )["mass"].alias("top_mass"),
        F.sum("c").alias("occ"),
        F.count(F.lit(1)).alias("dist"),
        F.max("c").alias("top_c"),
    )
    return per_n.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("top_mass"))).alias(f"_tm{n}")
            for n in top_ns
        ],
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    (F.col("occ") - F.col("dist")).cast("double") / F.col("occ"),
                )
            ).alias(f"_df{n}")
            for n in dup_ns
        ],
        *[
            F.max(
                F.when(
                    F.col("n") == n,
                    F.col("top_c").cast("double") / F.col("occ"),
                )
            ).alias(f"_cf{n}")
            for n in count_frac_ns
        ],
    )


def signal_columns(
    *,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    count_frac_ns: tuple[int, ...] = (),
    decimals: int = 6,
) -> list:
    """The output-column expressions over a frame that carries ``_tk``,
    ``_n_chars`` and a left-joined :func:`gram_wide` — ONE definition
    shared by ``repetition_signals`` and the composed rule gate, so
    the two can never drift."""
    n_tok = F.size("_tk")
    dup_tok = F.when(n_tok <= 0, F.lit(0.0)).otherwise(
        (n_tok - F.size(F.array_distinct("_tk"))).cast("double") / n_tok
    )
    return [
        n_tok.cast("long").alias("n_tokens"),
        F.round(dup_tok, decimals).alias("dup_token_frac"),
        *[
            F.round(
                F.coalesce(
                    F.col(f"_tm{n}").cast("double") / F.col("_n_chars"), F.lit(0.0)
                ),
                decimals,
            ).alias(f"top_{n}gram_frac")
            for n in top_ns
        ],
        *[
            F.round(F.coalesce(F.col(f"_df{n}"), F.lit(0.0)), decimals).alias(
                f"dup_{n}gram_frac"
            )
            for n in dup_ns
        ],
        # UNROUNDED and NULL-preserving: the consumer
        # (quality_filter_flags' formula) applies its own rounding
        # and its own NULL-defaults-true rule
        *[
            F.col(f"_cf{n}").alias(f"top_{n}gram_count_frac")
            for n in count_frac_ns
        ],
    ]
