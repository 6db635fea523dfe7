"""HTML → text extraction: the first transform every crawl pipeline
applies to WARC response bodies (C4/RefinedWeb run exactly this class
of strip before any quality gate sees the text).

Design constraints drive the implementation: at crawl scale this runs
on EVERY response body, so it must stay JVM-side (codegen'd
``regexp_replace`` chain — no Python per row) and be robust to broken
markup (regex stripping never throws; a malformed tag just strips
greedily-less). It is deliberately NOT a browser-grade parser: no DOM,
no CSS visibility, no table layout — trafilatura-style extraction
quality is a different (Python, slow-path) tool. What it does, in
order:

1. drop ``<script>``/``<style>``/``<!-- -->``/``<head>`` blocks whole
   (their text is never prose);
2. turn block-level closers (``p/div/br/li/tr/h1-6``) into newlines so
   paragraph structure survives for the span-dedup/line operators;
3. strip every remaining tag;
4. decode the named HTML entities that dominate real pages
   (amp/lt/gt/quot/apos/nbsp; numeric ``&#NNN;`` forms pass through —
   a chr() map needs a UDF, the documented slow-path line);
5. collapse runs of whitespace, trim.

Case-insensitive matching throughout (``(?is)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_DROP = r"(?is)<(script|style|head)\b.*?</\1\s*>|<!--.*?-->"
_BLOCK_BREAK = r"(?is)</?(p|div|br|li|tr|h[1-6])\b[^>]*>"
_ANY_TAG = r"(?s)<[^>]*>"

_ENTITIES = [
    # (?i): browsers accept uppercase legacy forms (&NBSP; &AMP; ...);
    # the literals have no regex metachars, so prefixing is safe
    ("(?i)&nbsp;", " "),
    ("(?i)&lt;", "<"),
    ("(?i)&gt;", ">"),
    ("(?i)&quot;", '"'),
    ("&#39;", "'"),
    ("(?i)&apos;", "'"),
    ("(?i)&amp;", "&"),  # LAST: otherwise &amp;lt; would double-decode
]


def html_to_text(col: Column | str) -> Column:
    """Visible-text extraction as a single JVM expression chain; returns
    a trimmed string column with paragraph breaks preserved as
    newlines. NULL in → NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _BLOCK_DROP, " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, repl in _ENTITIES:
        c = F.regexp_replace(c, ent, repl)
    # numeric entities (&#NNN;) would need a chr() map — not expressible
    # as a pure regex replace without a UDF, so they pass through
    # literally (documented limit; the named entities above dominate)
    # collapse horizontal whitespace, bound blank runs, trim
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # regex trim, not F.trim: trim() strips spaces only, leaving the
    # leading/trailing newlines the block-break pass introduces; (?U)
    # because raw NBSP padding (common around decoded markup) is
    # invisible whitespace too and Java's \s is ASCII-only by default
    return F.regexp_replace(c, r"(?U)^\s+|(?U)\s+$", "")
