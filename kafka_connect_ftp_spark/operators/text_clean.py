"""Unicode text cleanup: the normalization pass curation pipelines run
before any gate sees the text (C4/RefinedWeb-class pipelines strip
control characters and fix unicode first — otherwise dedup hashes,
token counts and quality signals all disagree across byte-level
variants of the same prose).

Two tiers, matching the engine's fast-path/slow-path convention:

- :func:`clean_text` — JVM-side ``regexp_replace`` chain (whole-stage
  codegen, no Python per row): drop C0/C1 control characters except
  tab/newline, drop zero-width and bidi-control characters (the
  invisible-text vector — a document stuffed with U+200B both skews
  length-based quality signals and can smuggle content past span
  dedup), normalize CRLF/CR to LF, bound blank-line runs, trim.
- :func:`nfkc_normalize` — compatibility normalization (ﬁ → fi,
  fullwidth → ASCII, ① → 1) needs the unicode tables, which no Spark
  builtin exposes; this is the documented Python slow path as an
  Arrow-batched ``mapInPandas`` over ``unicodedata`` (stdlib — no
  external dep), one pass, text never shuffles.

Both are pure projections: no shuffle, no state, safe to fuse into any
scan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# escaped forms only — these patterns are parsed by JAVA's regex engine
# (regexp_replace understands \xNN and \uNNNN), and raw control or
# invisible characters in source literals are editor-fragile.
# line-separator controls become NEWLINES, not deletions: FF/VT, NEL,
# and the unicode line/paragraph separators all break lines in real
# documents \u2014 deleting them would merge adjacent words ('page one\fpage
# two' -> 'onepage')
_LINE_SEPS = r"[\x0B\x0C\x85\u2028\u2029]"
# C0 control chars except \t (09) and \n (0A); DEL; the C1 block
# (VT/FF/NEL are already newlines by the pass above)
_CONTROL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"
# zero-width space, LRM/RLM, bidi embedding/overrides, word joiner,
# BOM/zero-width no-break space. DELIBERATELY NOT U+200C/U+200D:
# ZWNJ/ZWJ are orthographically meaningful (Persian/Arabic/Indic
# spelling, emoji ZWJ sequences) \u2014 stripping them would change words
_INVISIBLE = r"[\u200B\u200E\u200F\u202A-\u202E\u2060\uFEFF]"


def clean_text(col: Column | str) -> Column:
    """The JVM-side cleanup chain (module doc). NULL in → NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"\r\n?", "\n")  # CRLF and bare CR -> LF
    c = F.regexp_replace(c, _LINE_SEPS, "\n")
    c = F.regexp_replace(c, _CONTROL, "")
    c = F.regexp_replace(c, _INVISIBLE, "")
    # strip line-trailing whitespace FIRST so a 'blank' line holding
    # stray spaces/tabs (ubiquitous in scraped text) still counts as
    # blank for the run bound below
    c = F.regexp_replace(c, r"[ \t]+\n", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")  # bound blank-line runs
    # (?U) trim: Java \s is ASCII-only by default, which would leave
    # NBSP/ideographic-space padding on a unicode-cleanup operator;
    # not F.trim either (spaces only — misses the newlines above)
    return F.regexp_replace(c, r"(?U)^\s+|(?U)\s+$", "")


def nfkc_normalize(
    df: DataFrame, text_col: str = "text", *, form: str = "NFKC"
) -> DataFrame:
    """Replace ``text_col`` with its ``unicodedata.normalize(form, .)``
    — the documented Python slow path (Arrow-batched, stdlib-only).
    ``form`` is one of NFC/NFD/NFKC/NFKD; NULLs pass through."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not found; frame has {df.columns}")
    from pyspark.sql.types import StringType

    if not isinstance(df.schema[text_col].dataType, StringType):
        # fail at the driver like the checks above — executor-side it
        # would surface as an opaque Python-worker TypeError
        raise ValueError(
            f"column {text_col!r} must be string, is {df.schema[text_col].dataType.simpleString()}"
        )
    schema = df.schema

    def normalize(batches: Iterator) -> Iterator:
        import unicodedata

        for pdf in batches:
            pdf[text_col] = pdf[text_col].map(
                lambda s: unicodedata.normalize(form, s) if s is not None else None
            )
            yield pdf

    return df.mapInPandas(normalize, schema)
