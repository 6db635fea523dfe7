"""C4-style line/page cleaning (Raffel et al. 2020, the C4 corpus
rules; arXiv:1910.10683 appendix) — the classic rule-based cleaning
pass between HTML extraction and the statistical gates:

Line rules (a line is dropped unless it):
- ends in a terminal punctuation mark (``. ! ? "`` — the C4 rule);
- has at least ``min_words_per_line`` words (C4 used 3 as the
  "citation/navigation stub" cutoff alongside its page-level word
  bounds);
- does not contain the word "javascript" (the enable-javascript
  boilerplate marker).

Page rules (the whole document is rejected when):
- the RETAINED text has fewer than ``min_sentences`` sentences
  (terminal-punctuation count as the sentence proxy; the paper
  discards pages with fewer than 5 sentences — the default here);
- the RAW text contains "lorem ipsum" (placeholder pages) or a curly
  brace (code, not prose).

Everything is a single JVM projection — line split, per-line
higher-order filter, rejoin, regex counts; no shuffle, no Python, no
state — so it fuses into any scan (the html_text.py/text_clean.py
design contract). Where this sits: ``html_to_text`` → ``clean_text``
→ **c4 line filter** → span/exact dedup → Gopher repetition →
model-based quality. Each stage removes what the next one's signals
would otherwise mis-measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a line survives iff: terminal punctuation, >= N words, no 'javascript'
_LINE_OK = (
    "ln -> ln rlike '{line_end}'"
    " AND size(filter(split(ln, ' '), w -> w <> '')) >= {min_words}"
    " AND NOT lower(ln) rlike 'javascript'"
)

# the paper's terminal-punctuation class (western scripts) and analogs
# for scripts with their own sentence-final marks — pick per language
# after a lang-ID gate (operators/lang_id.py); the default silently
# drops every line of e.g. CJK prose
C4_LINE_END_RX = "[.!?\"]$"
C4_LINE_END_BY_LANG: dict[str, str] = {
    "default": C4_LINE_END_RX,
    "zh": "[。！？.!?\"]$",
    "ja": "[。！？.!?\"]$",
    "hi": "[।.!?\"]$",
    "el": "[.;!?\"]$",  # Greek question mark is ';'
    "ar": "[.!?؟۔\"]$",  # Arabic question mark + Urdu full stop
}


def c4_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    line_end_rx: str = C4_LINE_END_RX,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document C4 cleaning columns: ``c4_n_lines`` /
    ``c4_kept_lines`` (line counts before/after the line rules),
    ``c4_text`` (the retained lines rejoined), ``c4_sentences``
    (terminal-punctuation count of the retained text), ``c4_keep``
    (the page decision). NULL text profiles as an empty page
    (0 lines, keep = false). ``line_end_rx`` parameterizes the
    terminal-punctuation class by script (``C4_LINE_END_BY_LANG``) —
    apply per-language after a lang-ID gate. ``keep_cols`` are input
    columns carried verbatim (the classify_lang passthrough
    convention: the operator is map-side, so a caller needing the
    flags NEXT TO other per-doc columns chains instead of joining)."""
    if min_words_per_line < 1:
        raise ValueError(f"min_words_per_line must be >= 1, got {min_words_per_line}")
    if min_sentences < 0:
        raise ValueError(f"min_sentences must be >= 0, got {min_sentences}")
    if "'" in line_end_rx:
        raise ValueError("line_end_rx must not contain a single quote")
    lam = _LINE_OK.format(min_words=int(min_words_per_line), line_end=line_end_rx)
    t = f"coalesce({text_col}, '')"
    lines = f"split({t}, '\\n')"
    kept = f"filter({lines}, {lam})"
    kept_text = f"array_join({kept}, '\\n')"
    sentences = f"size(regexp_extract_all({kept_text}, '[.!?]', 0))"
    page_keep = (
        f"({sentences} >= {int(min_sentences)})"
        f" AND NOT contains(lower({t}), 'lorem ipsum')"
        f" AND NOT contains({t}, '{{')"
    )
    return docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.expr(f"size({lines})"))
        .cast("long")
        .alias("c4_n_lines"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.expr(f"size({kept})"))
        .cast("long")
        .alias("c4_kept_lines"),
        F.expr(kept_text).alias("c4_text"),
        F.expr(sentences).cast("long").alias("c4_sentences"),
        (F.col(text_col).isNotNull() & F.expr(page_keep)).alias("c4_keep"),
        *keep_cols,
    )


def c4_clean(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    line_end_rx: str = C4_LINE_END_RX,
) -> DataFrame:
    """The filtering form: pages passing the C4 page rules, with
    ``text_col`` replaced by the retained lines — what a pipeline
    actually feeds downstream."""
    flags = c4_flags(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_words_per_line=min_words_per_line,
        min_sentences=min_sentences,
        line_end_rx=line_end_rx,
    )
    return (
        docs.drop(text_col)
        .join(flags.filter("c4_keep").select(id_col, "c4_text"), id_col)
        .withColumnRenamed("c4_text", text_col)
    )
