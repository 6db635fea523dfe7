"""Composed rule gate: the four rule families a curation pipeline
always runs together — the Gopher scalar quality rules
(plans/llm_pipeline.py quality_filter_flags), the C4 line/page rules
(operators/c4_filter.py), the Gopher doc-level rules
(operators/gopher_rules.py) and the repetition suite
(operators/repetition.py) — computed in the MINIMAL number of corpus
scans instead of four separately-invoked passes.

Why composition matters at 100 TB: invoked separately, each family
re-reads the corpus and re-splits the text into the same word/line
arrays (the arrays-materialize-once trick each module already applies
INTERNALLY, applied here ACROSS modules). Composed, the whole gate is

- ONE map-side scan for everything scalar: a first projection
  materializes the token/word/line arrays once, a second computes all
  three scalar families' columns off them (c4 line filter + page
  rules, gopher ratios + stopword hits, quality length/word-length/
  diversity rules) — no shuffle, fuses into the scan;
- ONE gram-pass scan for everything aggregated: ``repetition_signals``
  with ``count_frac_ns=(2,)`` emits the repetition suite AND the
  quality gate's top-bigram count fraction from the same exploded
  gram stream, joined back on the co-partitioned id.

Two FileScans total (plan-pinned in tests/test_rule_gate.py), versus
five for the separate invocations (quality's own bigram pass included).

Column parity: every family column equals the standalone operator's
output bit-for-bit (test-pinned per family) — the composed form is a
physical-plan optimization, not a semantic fork. Composite decision:
``rule_keep = qf_keep AND c4_keep AND gopher_keep`` (repetition
signals ride along un-thresholded: Gopher's repetition cuts are
corpus-tuned, so the caller picks them — the example applies the
top-2gram <= 0.2 / dup-5gram <= 0.5 pair).

Language routing, two ways:

- SLICED: ``stopwords`` / ``line_end_rx`` take one language's values
  (gopher_rules.GOPHER_STOPWORDS_BY_LANG, c4_filter.C4_LINE_END_BY_LANG)
  — classify with operators/lang_id.py first and gate each language
  slice with its own parameters (N scans for N languages).
- ROUTED (round 9, VERDICT r8 #2): pass ``lang_col`` and the gate
  routes PER ROW — the per-language stopword arrays and terminal-
  punctuation regexes ride as literal maps (the classify_lang
  literal-map technique) and ``element_at(map, lang)`` picks each
  row's parameters, with the scalar ``stopwords``/``line_end_rx`` as
  the fallback for unmapped languages. Still exactly TWO corpus scans
  regardless of how many languages appear (plan-pinned) — the whole
  point vs the sliced form's scan-per-language.

COMPUTED lang_col caveat: if ``lang_col`` is itself a large expression
(classify_lang_routed's ct_lang — literal rank maps + distance folds),
MATERIALIZE the classified frame (``localCheckpoint``/persist/write)
before gating whenever a downstream filter touches the lang-routed
columns (``c4_keep``/``gopher_keep``/``g_stop_hits``): Catalyst's
predicate pushdown substitutes aliases into pushed predicates with no
cheapness check, so every routed CASE branch would re-inline the whole
classifier expression — measured MINUTES of driver-side optimization
on a 3-row frame. Filters on lang-independent columns (the qf/
repetition family) are unaffected. The streaming gate
(streaming/quality_gate.py) checkpoints its micro-batch at this
boundary; a batch pipeline classifying a full corpus should classify →
write/checkpoint → gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.c4_filter import (
    C4_LINE_END_BY_LANG,
    C4_LINE_END_RX,
)
from kafka_connect_ftp_spark.operators.gopher_rules import (
    GOPHER_ALPHA_RX,
    GOPHER_ALPHA_RX_BY_LANG,
    GOPHER_STOPWORDS,
    GOPHER_STOPWORDS_BY_LANG,
    GOPHER_SUBSTR_STOPWORD_LANGS,
    _THRESH,
)
from kafka_connect_ftp_spark.operators.repetition import (
    gram_wide,
    signal_columns,
)


def _sql_str(s: str) -> str:
    return "'{}'".format(s.replace("'", "''"))


def rule_gate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    # C4 knobs (c4_filter.py defaults)
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    line_end_rx: str = C4_LINE_END_RX,
    # Gopher doc-rule knobs (gopher_rules.py defaults)
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    alpha_rx: str = GOPHER_ALPHA_RX,
    # quality_filter_flags knobs (its literal thresholds)
    min_tokens: int = 16,
    max_tokens: int = 4096,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    min_diversity: float = 0.2,
    top_bigram_max: float = 0.04,
    # repetition knobs
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    decimals: int = 6,
    # per-row language routing (module doc)
    lang_col: str | None = None,
    stopwords_by_lang: dict[str, tuple[str, ...]] | None = None,
    line_end_rx_by_lang: dict[str, str] | None = None,
    alpha_rx_by_lang: dict[str, str] | None = None,
    substr_stopword_langs: frozenset[str] = GOPHER_SUBSTR_STOPWORD_LANGS,
    include_repetition: bool = True,
) -> DataFrame:
    """All four rule families in two corpus scans (module doc). One row
    per input row: the quality columns (``len_ok word_len_ok
    diversity_ok top_bigram_frac repetition_ok qf_keep``), the C4
    columns (``c4_n_lines c4_kept_lines c4_text c4_sentences
    c4_keep``), the Gopher columns (``g_symbol_ratio g_bullet_frac
    g_ellipsis_frac g_alpha_frac g_stop_hits gopher_keep``), the
    repetition columns (``n_tokens dup_token_frac top_{n}gram_frac
    dup_{n}gram_frac``), and ``rule_keep``.

    ``include_repetition=False`` (round 10) returns ONLY the scalar
    families (len/word-len/diversity flags + the full C4 and Gopher
    doc columns) from the single map-side scan — no gram pass, no
    shuffle, and no ``top_bigram_frac``/``qf_keep``/``rule_keep``
    (both composites read the bigram fraction). For callers embedding
    the routed c4/gopher decisions into a query that aggregates
    elsewhere (the repetition_profile hash gate); bit-parity with the
    full form's shared columns is test-pinned."""
    if min_words_per_line < 1:
        raise ValueError(f"min_words_per_line must be >= 1, got {min_words_per_line}")
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0, got {min_sentences}")
    if "'" in line_end_rx:
        raise ValueError("line_end_rx must not contain a single quote")
    if not stopwords:
        raise ValueError("stopwords must be non-empty")

    if "'" in alpha_rx:
        raise ValueError("alpha_rx must not contain a single quote")
    t = f"coalesce({text_col}, '')"
    stops = ", ".join(_sql_str(w) for w in stopwords)
    if lang_col is None:
        src = docs
        stops_expr = f"array({stops})"
        line_rx_match = lambda var: f"{var} rlike '{line_end_rx}'"  # noqa: E731
        alpha_match = lambda var: f"{var} rlike '{alpha_rx}'"  # noqa: E731
    else:
        # stage 0: per-row routed parameters — one literal lang->params
        # map each for the stopword arrays and the line-end regexes,
        # element_at picks this row's values, the scalar knobs are the
        # unmapped-language fallback. Pure projection: the gate stays
        # two corpus scans no matter how many languages appear.
        clash = {id_col, text_col, lang_col} & {"_stops", "_lang"}
        if clash:
            raise ValueError(f"column(s) {sorted(clash)} collide with _stops/_lang")
        by_lang = (
            GOPHER_STOPWORDS_BY_LANG if stopwords_by_lang is None else stopwords_by_lang
        )
        rx_by_lang = (
            C4_LINE_END_BY_LANG if line_end_rx_by_lang is None else line_end_rx_by_lang
        )
        arx_by_lang = (
            GOPHER_ALPHA_RX_BY_LANG if alpha_rx_by_lang is None else alpha_rx_by_lang
        )
        for what, rxs in (("line_end_rx", rx_by_lang), ("alpha_rx", arx_by_lang)):
            for lg, rx in rxs.items():
                if "'" in rx:
                    raise ValueError(f"{what} for {lg!r} must not contain a single quote")
        if any(not ws for ws in by_lang.values()):
            raise ValueError("stopwords_by_lang values must be non-empty")
        stops_map = "map(" + ", ".join(
            f"{_sql_str(lg)}, array({', '.join(_sql_str(w) for w in ws)})"
            for lg, ws in sorted(by_lang.items())
        ) + ")"
        src = docs.select(
            F.col(id_col),
            F.col(text_col),
            F.expr(
                f"coalesce(element_at({stops_map}, {lang_col}), array({stops}))"
            ).alias("_stops"),
            F.expr(f"cast({lang_col} as string)").alias("_lang"),
        )

        # regexes route as a CASE chain over LITERAL patterns, never as
        # a per-row pattern column: Spark's RLike caches the compiled
        # java.util.regex.Pattern only when the pattern side is
        # FOLDABLE — rlike(x, _rx_col) would recompile the pattern for
        # every element inside the higher-order filters below (review
        # r9). One branch per DISTINCT regex keeps the chain short.
        def rx_case(var: str, rxs: dict[str, str], default: str) -> str:
            by_rx: dict[str, list[str]] = {}
            for lg, rx in sorted(rxs.items()):
                by_rx.setdefault(rx, []).append(lg)
            branches = " ".join(
                f"WHEN _lang IN ({', '.join(_sql_str(lg) for lg in lgs)})"
                f" THEN {var} rlike '{rx}'"
                for rx, lgs in sorted(by_rx.items())
            )
            return f"CASE {branches} ELSE {var} rlike '{default}' END"

        line_rx_match = lambda var: rx_case(var, rx_by_lang, line_end_rx)  # noqa: E731
        alpha_match = lambda var: rx_case(var, arx_by_lang, alpha_rx)  # noqa: E731
        stops_expr = "_stops"
    line_ok = (
        f"ln -> ({line_rx_match('ln')})"
        f" AND size(filter(split(ln, ' '), w -> w <> '')) >= {int(min_words_per_line)}"
        " AND NOT lower(ln) rlike 'javascript'"
    )

    # stage 1: every array/count the three scalar families need,
    # materialized ONCE per row (the cross-module arrays-once pass)
    staged = src.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("_n_chars"),
        F.col(text_col).isNull().alias("_null"),
        F.expr(f"contains(lower({t}), 'lorem ipsum')").alias("_lorem"),
        F.expr(f"contains({t}, '{{')").alias("_brace"),
        # quality tokens: raw single-space split (the QF rule)
        F.expr(f"filter(split({text_col}, ' '), x -> x <> '')").alias("_tk"),
        # gopher words: newline-flattened split
        F.expr(f"filter(split(replace({t}, '\\n', ' '), ' '), w -> w <> '')").alias("_ws"),
        # gopher non-blank lines / c4 raw lines + retained lines
        F.expr(f"filter(split({t}, '\\n'), ln -> trim(ln) <> '')").alias("_lns"),
        F.expr(f"size(split({t}, '\\n'))").alias("_nl_all"),
        F.expr(f"array_join(filter(split({t}, '\\n'), {line_ok}), '\\n')").alias("_kt"),
        F.expr(f"size(regexp_extract_all({t}, '#|\\\\.\\\\.\\\\.|…', 0))").alias("_nsym"),
        # routed mode: the per-row stopword array + lang tag ride to
        # the second projection (cheap column refs; the line-end CASE
        # was consumed by _kt)
        *([F.col("_stops"), F.col("_lang")] if lang_col is not None else []),
        # unsegmented-script stop hits need the raw text — computed here
        # (the only stage that has it) and routed per row below
        *(
            [
                F.expr(
                    f"size(filter(_stops, s -> contains(lower({t}), s)))"
                ).alias("_nstop_sub")
            ]
            if lang_col is not None and substr_stopword_langs
            else []
        ),
    ).select(
        id_col,
        "_n_chars",
        "_null",
        "_lorem",
        "_brace",
        "_tk",
        "_kt",
        "_nsym",
        F.expr("size(_ws)").alias("_nw"),
        F.expr("size(_lns)").alias("_nl"),
        "_nl_all",
        F.expr("size(filter(_lns, ln -> trim(ln) rlike '^[-*•]'))").alias("_nbul"),
        F.expr("size(filter(_lns, ln -> trim(ln) rlike '(\\\\.\\\\.\\\\.|…)$'))").alias("_nell"),
        F.expr(f"size(filter(_ws, w -> {alpha_match('w')}))").alias("_nalp"),
        (
            F.expr(
                "CASE WHEN _lang IN ({langs}) THEN _nstop_sub ELSE "
                "size(filter({stops}, s -> array_contains(transform(_ws, w -> lower(w)), s)))"
                " END".format(
                    langs=", ".join(
                        _sql_str(lg) for lg in sorted(substr_stopword_langs)
                    ),
                    stops=stops_expr,
                )
            )
            if lang_col is not None and substr_stopword_langs
            else F.expr(
                f"size(filter({stops_expr},"
                " s -> array_contains(transform(_ws, w -> lower(w)), s)))"
            )
        ).alias("_nstop"),
        F.expr("size(split(_kt, '\\n'))").alias("_nkept_raw"),
    )

    # stage 2: the scalar family columns
    def ratio(num: str, den: str):
        return F.when(F.col(den) == 0, F.lit(0.0)).otherwise(
            F.col(num).cast("double") / F.col(den)
        )

    n_tok = F.size("_tk")
    # try_divide: a token-less doc (quality_filter_flags' corpus never
    # holds one, this composed form must) fails the band checks as NULL
    # -> the n_tok > 0 conjunct pins the flag to a definite false
    mean_wl = F.try_divide(
        F.expr("aggregate(transform(_tk, x -> length(x)), 0, (a, x) -> a + x)").cast(
            "double"
        ),
        n_tok,
    )
    diversity = F.try_divide(F.size(F.array_distinct("_tk")).cast("double"), n_tok)
    len_ok = (n_tok >= min_tokens) & (n_tok <= max_tokens)
    wl_ok = (n_tok > 0) & (mean_wl >= min_word_len) & (mean_wl <= max_word_len)
    div_ok = (n_tok > 0) & (diversity >= min_diversity)

    sentences = F.expr("size(regexp_extract_all(_kt, '[.!?]', 0))")
    c4_keep = (
        ~F.col("_null")
        & (sentences >= min_sentences)
        & ~F.col("_lorem")
        & ~F.col("_brace")
    )
    # split('') yields [''] — an empty retained text has 0 kept lines
    kept_lines = F.when(F.col("_kt") == "", F.lit(0)).otherwise(F.col("_nkept_raw"))

    sym, bul = ratio("_nsym", "_nw"), ratio("_nbul", "_nl")
    ell, alp = ratio("_nell", "_nl"), ratio("_nalp", "_nw")
    gopher_keep = (
        (F.col("_nw") > 0)
        & (sym <= _THRESH["symbol_ratio_max"])
        & (bul <= _THRESH["bullet_frac_max"])
        & (ell <= _THRESH["ellipsis_frac_max"])
        & (alp >= _THRESH["alpha_frac_min"])
        & (F.col("_nstop") >= _THRESH["min_stop_hits"])
    )

    scalar = staged.select(
        id_col,
        "_tk",
        "_n_chars",
        len_ok.alias("len_ok"),
        wl_ok.alias("word_len_ok"),
        div_ok.alias("diversity_ok"),
        F.when(F.col("_null"), F.lit(0))
        .otherwise(F.col("_nl_all"))
        .cast("long")
        .alias("c4_n_lines"),
        F.when(F.col("_null"), F.lit(0))
        .otherwise(kept_lines)
        .cast("long")
        .alias("c4_kept_lines"),
        F.col("_kt").alias("c4_text"),
        sentences.cast("long").alias("c4_sentences"),
        c4_keep.alias("c4_keep"),
        F.round(sym, decimals).alias("g_symbol_ratio"),
        F.round(bul, decimals).alias("g_bullet_frac"),
        F.round(ell, decimals).alias("g_ellipsis_frac"),
        F.round(alp, decimals).alias("g_alpha_frac"),
        F.col("_nstop").cast("long").alias("g_stop_hits"),
        gopher_keep.alias("gopher_keep"),
    )

    # NULL-id guard on the output id (the repetition_signals contract —
    # a NULL key would otherwise get silently-NULL gram signals via the
    # left join below instead of failing loudly). Boundary caveat: the
    # guard rides the output column, so projecting the id away before
    # an action prunes the check with it.
    id_checked = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"rule_gate: NULL {id_col} (ids must be unique non-null)")
        ),
    ).otherwise(F.col(id_col))

    if not include_repetition:
        # scalar-only mode: one map-side scan, zero shuffles
        return scalar.select(
            id_checked.alias(id_col),
            *[c for c in scalar.columns if c not in (id_col, "_tk", "_n_chars")],
        )

    # the ONE gram pass: the aggregate side of repetition_signals (its
    # docs-grain join-back side is the staged projection above — that's
    # the scan this composition saves), emitting the repetition suite
    # AND the QF bigram count fraction via the SHARED column builder
    wide = gram_wide(
        docs,
        id_col=id_col,
        text_col=text_col,
        top_ns=top_ns,
        dup_ns=dup_ns,
        count_frac_ns=(2,),
    )
    rep = scalar.join(wide, id_col, "left").select(
        id_col,
        *[c for c in scalar.columns if c not in (id_col, "_tk", "_n_chars")],
        *signal_columns(
            top_ns=top_ns, dup_ns=dup_ns, count_frac_ns=(2,), decimals=decimals
        ),
    )
    top_bigram = F.round(F.col("top_2gram_count_frac"), 4)
    rep_ok = F.coalesce(top_bigram <= top_bigram_max, F.lit(True))
    qf_keep = (
        F.col("len_ok") & F.col("word_len_ok") & F.col("diversity_ok") & rep_ok
    )
    return (
        rep
        .select(
            id_checked.alias(id_col),
            "len_ok",
            "word_len_ok",
            "diversity_ok",
            top_bigram.alias("top_bigram_frac"),
            rep_ok.alias("repetition_ok"),
            qf_keep.alias("qf_keep"),
            "c4_n_lines",
            "c4_kept_lines",
            "c4_text",
            "c4_sentences",
            "c4_keep",
            "g_symbol_ratio",
            "g_bullet_frac",
            "g_ellipsis_frac",
            "g_alpha_frac",
            "g_stop_hits",
            "gopher_keep",
            "n_tokens",
            "dup_token_frac",
            *[f"top_{n}gram_frac" for n in top_ns],
            *[f"dup_{n}gram_frac" for n in dup_ns],
            # coalesce: a NULL-text doc has NULL qf flags (size(NULL)
            # tokens); the composite decision must still be a definite
            # reject, never a NULL that a `filter(rule_keep)` drops
            # silently but a `filter(NOT rule_keep)` ALSO drops
            F.coalesce(
                qf_keep & F.col("c4_keep") & F.col("gopher_keep"), F.lit(False)
            ).alias("rule_keep"),
        )
    )
