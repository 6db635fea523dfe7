"""Gopher document-level quality rules (Rae et al. 2021,
arXiv:2112.11446 — the MassiveWeb filtering heuristics), completing
the rule-based gate family: ``quality_filter_flags`` carries the
token-count / word-length / diversity / top-bigram rules and
``repetition.py`` the repetition suite; this module adds the remaining
doc-level signals Gopher filters on:

- **symbol-to-word ratio** (``#`` and ellipsis vs words; > 0.1 is
  tag-soup / truncated-listing text);
- **bullet-line fraction** (lines starting with a bullet mark; > 0.9
  is a bare list page);
- **ellipsis-line fraction** (lines ending in ``...``/``…``; > 0.3 is
  truncated-preview boilerplate);
- **alphabetic-word fraction** (words containing at least one letter;
  < 0.8 is data/serial dumps);
- **required-stopword hits** (Gopher's 8-word list; < 2 present means
  the page is unlikely to be running prose).

One map-side JVM projection (split + higher-order filters + regex
counts — no shuffle, no Python, fuses into the scan). Thresholds are
the paper's; ``gopher_keep`` composes them and each signal rides along
for per-rule auditing. NULL text profiles as an empty page (zeros,
keep = false).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the Gopher "must contain at least 2 of" stopword list (the paper's
# English 8); per-language analogs below so the rule can be routed by a
# lang-ID gate (operators/lang_id.py) instead of silently rejecting
# well-formed non-English prose
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": GOPHER_STOPWORDS,
    "de": ("der", "die", "das", "und", "zu", "von", "mit", "haben"),
    "es": ("el", "la", "de", "que", "y", "con", "ser", "haber"),
    "fr": ("le", "la", "de", "que", "et", "avec", "être", "avoir"),
    "ru": ("и", "в", "не", "на", "что", "быть", "с", "это"),
    "el": ("και", "το", "η", "να", "ο", "του", "με", "είναι"),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "不"),
    "ja": ("の", "に", "は", "を", "た", "が", "で", "て"),
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "هذا", "مع"),
    # Korean stop material is PARTICLES agglutinated onto the word
    # (은/는/이/가/을/를/에/의) — never standalone whitespace words, so
    # ko routes through substr matching below. SPACE-ANCHORED: a bare
    # syllable would also match word-INTERNALLY (이 inside 아이폰, 가
    # inside 가방 — hangul syllables are sub-word phonograms, unlike
    # zh/ja where the stop characters are morphemes themselves) and a
    # keyword-spam noun list would pass the rule; the trailing space
    # pins the match to particle position (word-final)
    "ko": ("은 ", "는 ", "이 ", "가 ", "을 ", "를 ", "에 ", "의 "),
    "hi": ("है", "की", "के", "में", "और", "का", "से", "को"),
    "he": ("של", "את", "על", "הוא", "זה", "עם", "לא", "כל"),
}

# languages whose stop material never appears as a standalone
# whitespace word: zh/ja are UNSEGMENTED (no word boundaries at all),
# ko is whitespace-segmented but agglutinative — particles attach to
# the word stem. For all three the stopword rule must match by
# SUBSTRING: array_contains over space-split "words" compares a stop
# particle against an entire line/word and never hits (review r9)
GOPHER_SUBSTR_STOPWORD_LANGS = frozenset({"zh", "ja", "ko"})

# the "word contains an alphabetic character" class, routable by
# language for non-Latin scripts (the paper's rule is script-relative:
# Greek prose has zero [a-zA-Z] words and would fail alpha_frac_min
# wholesale). Ranges reuse lang_id.SCRIPT_RANGES spellings (literal
# characters — Java regex and RE2 parse them identically).
GOPHER_ALPHA_RX = "[a-zA-Z]"
GOPHER_ALPHA_RX_BY_LANG: dict[str, str] = {
    "en": GOPHER_ALPHA_RX,
    "de": "[a-zA-ZÀ-ɏ]",
    "es": "[a-zA-ZÀ-ɏ]",
    "fr": "[a-zA-ZÀ-ɏ]",
    "ru": "[a-zA-ZÀ-ɏЀ-ӿԀ-ԯ]",
    "el": "[a-zA-ZÀ-ɏͰ-Ͽἀ-῿]",
    "zh": "[a-zA-Z㐀-䶿一-鿿]",
    "ja": "[a-zA-Z぀-ヿ㐀-䶿一-鿿]",
    "ar": "[a-zA-Z؀-ۿݐ-ݿ]",
    "ko": "[a-zA-Zᄀ-ᇿ가-힯]",
    "hi": "[a-zA-Zऀ-ॿ]",
    "he": "[a-zA-Zא-ת]",
}

_THRESH = {
    "symbol_ratio_max": 0.1,
    "bullet_frac_max": 0.9,
    "ellipsis_frac_max": 0.3,
    "alpha_frac_min": 0.8,
    "min_stop_hits": 2,
}


def gopher_quality_signals(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    alpha_rx: str = GOPHER_ALPHA_RX,
    stopword_match: str = "word",
) -> DataFrame:
    """Per-document Gopher rule signals + the composite ``gopher_keep``
    decision (module doc). Ratio columns are rounded to ``decimals``
    (the repetition_signals convention; the keep decision uses the
    unrounded values). ``stopwords`` and ``alpha_rx`` parameterize the
    prose-presence and alphabetic-word rules by language
    (``GOPHER_STOPWORDS_BY_LANG``, ``GOPHER_ALPHA_RX_BY_LANG``) — route
    documents through a lang-ID gate first (operators/lang_id.py) and
    apply the matching values per slice (or per row via
    rule_gate's ``lang_col``), or the English defaults silently fail
    well-formed non-English prose. ``stopword_match="substr"`` matches
    stop particles as SUBSTRINGS of the lowercased text — required for
    unsegmented scripts (``GOPHER_SUBSTR_STOPWORD_LANGS``: zh/ja have
    no whitespace word boundaries, so the word-exact rule would compare
    a particle against an entire line and never hit)."""
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    if "'" in alpha_rx:
        raise ValueError("alpha_rx must not contain a single quote")
    if stopword_match not in ("word", "substr"):
        raise ValueError(f"stopword_match must be word|substr, got {stopword_match!r}")
    # two-stage projection: the word/line ARRAYS and the raw counts
    # materialize once per row in the inner select — inlining the split
    # at every consumer would re-split the text ~6x per row (the
    # governance roll-hash `_ch` lesson; profiled 1.7s -> 1.2s at sf0.1
    # inside repetition_profile)
    t = f"coalesce({text_col}, '')"
    stops = ", ".join("'{}'".format(w.replace("'", "''")) for w in stopwords)
    staged = docs.select(
        F.col(id_col),
        F.expr(f"filter(split(replace({t}, '\\n', ' '), ' '), w -> w <> '')").alias("_ws"),
        F.expr(f"filter(split({t}, '\\n'), ln -> trim(ln) <> '')").alias("_lns"),
        F.expr(f"size(regexp_extract_all({t}, '#|\\\\.\\\\.\\\\.|…', 0))").alias("_nsym"),
        # substr mode needs the raw text, available only in this stage
        *(
            [
                F.expr(
                    f"size(filter(array({stops}), s -> contains(lower({t}), s)))"
                ).alias("_nstop_sub")
            ]
            if stopword_match == "substr"
            else []
        ),
    ).select(
        id_col,
        F.expr("size(_ws)").alias("_nw"),
        F.expr("size(_lns)").alias("_nl"),
        "_nsym",
        F.expr("size(filter(_lns, ln -> trim(ln) rlike '^[-*•]'))").alias("_nbul"),
        F.expr("size(filter(_lns, ln -> trim(ln) rlike '(\\\\.\\\\.\\\\.|…)$'))").alias("_nell"),
        F.expr(f"size(filter(_ws, w -> w rlike '{alpha_rx}'))").alias("_nalp"),
        # case-insensitive: the paper's rule is about PROSE presence —
        # 'THE BOARD AND THE COMMITTEE' is running prose and must hit
        (
            F.expr(
                f"size(filter(array({stops}),"
                " s -> array_contains(transform(_ws, w -> lower(w)), s)))"
            )
            if stopword_match == "word"
            else F.col("_nstop_sub")
        ).alias("_nstop"),
    )

    def ratio(num: str, den: str):
        return F.when(F.col(den) == 0, F.lit(0.0)).otherwise(
            F.col(num).cast("double") / F.col(den)
        )

    sym, bul = ratio("_nsym", "_nw"), ratio("_nbul", "_nl")
    ell, alp = ratio("_nell", "_nl"), ratio("_nalp", "_nw")
    keep = (
        (F.col("_nw") > 0)
        & (sym <= _THRESH["symbol_ratio_max"])
        & (bul <= _THRESH["bullet_frac_max"])
        & (ell <= _THRESH["ellipsis_frac_max"])
        & (alp >= _THRESH["alpha_frac_min"])
        & (F.col("_nstop") >= _THRESH["min_stop_hits"])
    )
    return staged.select(
        F.col(id_col),
        F.round(sym, decimals).alias("g_symbol_ratio"),
        F.round(bul, decimals).alias("g_bullet_frac"),
        F.round(ell, decimals).alias("g_ellipsis_frac"),
        F.round(alp, decimals).alias("g_alpha_frac"),
        F.col("_nstop").cast("long").alias("g_stop_hits"),
        keep.alias("gopher_keep"),
    )
