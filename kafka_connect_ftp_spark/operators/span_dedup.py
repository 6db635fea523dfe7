"""Span-level exact deduplication (C4-style): remove every repeated
paragraph/line across the corpus, keeping only its first occurrence.

Web corpora repeat boilerplate spans (navigation, license blocks, quoted
headers) across millions of pages; C4 famously deduplicates at the
three-sentence-span level corpus-wide. This operator does the same for
a configurable unit (paragraph or line): a span that occurs anywhere
earlier in the corpus — in another document or earlier in the same one —
is dropped; the first occurrence (lowest ``(doc_id, position)``) is kept.

Scale design (100 TB):
- the KEEP/DROP decision runs on a metadata-only frame: ``(span_hash,
  doc_id, idx)`` — three longs per span. Only this frame shuffles on
  ``span_hash``, as a min-struct AGGREGATION with map-side partial
  combine, so even a span repeated billions of times (empty lines, nav
  boilerplate) collapses per-mapper instead of funneling into one hot
  reducer; span TEXT never rides the hash shuffle;
- the decision joins back to the text on ``(doc_id, idx)`` — the data's
  home key, co-partitionable with the source layout (bucketed tables
  make it shuffle-free on the text side);
- reconstruction is one ``doc_id`` aggregation ordering surviving spans
  by position.

xxhash64 keys the spans (64-bit collisions at corpus scale are
~n²/2⁶⁵ — acceptable for dedup where a collision merely drops one extra
span; swap a 128-bit hash for forensic-grade exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit -> (split regex, rejoin separator). For paragraph/line the
# separator IS the split pattern, so reconstruction is exact. The
# sentence unit (round 10 — C4's actual dedup granularity is sentence
# spans) is GLUE-PRESERVING (round 11): instead of splitting on the
# inter-sentence whitespace (which consumed it, so every rebuilt
# document — deduplicated or not — had its newlines/double-spaces
# silently normalized to single spaces), a sentinel (U+001F, the ASCII
# unit separator — effectively absent from text; a document that does
# contain it splits at that point, which at worst over-splits) is
# injected AFTER each terminal-punctuation-plus-whitespace run and the
# text splits on the sentinel alone. Each span then CARRIES its
# trailing whitespace, rejoin is '', and reconstruction is exact for
# every unit; the dedup key is the trailing-whitespace-stripped span,
# so the same sentence followed by different glue still deduplicates. The usual
# naive-splitter caveat applies (abbreviations like "Dr." over-split,
# which only makes spans SHORTER, never merges distinct sentences).
_SENTINEL = "\x1f"
_SPLITTERS = {
    "paragraph": ("\n\n", "\n\n"),
    "line": ("\n", "\n"),
    "sentence": (_SENTINEL, ""),
}


def span_units(docs: DataFrame, unit: str = "paragraph", *, text_col: str = "text") -> DataFrame:
    """Explode documents into ``(doc_id, idx, span)`` rows; empty spans
    (consecutive separators) keep their index so reconstruction preserves
    spacing semantics, but never participate in dedup."""
    if unit not in _SPLITTERS:
        raise ValueError(f"unit must be one of {sorted(_SPLITTERS)}, got {unit!r}")
    sep = _SPLITTERS[unit][0]
    # NULL text coalesces to "" so the document still yields one (empty)
    # span — posexplode of NULL would emit zero rows and the document
    # would silently vanish from the rebuilt corpus
    txt = F.coalesce(F.col(text_col), F.lit(""))
    if unit == "sentence":
        # inject the sentinel after each [.!?]+whitespace run, then
        # split on the sentinel — the whitespace stays INSIDE the
        # preceding span (glue), so rejoining with '' is exact
        txt = F.regexp_replace(txt, r"(?<=[.!?])(\s+)", "$1" + _SENTINEL)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(txt, F.lit(sep), -1)).alias("idx", "span"),
    )


def dedup_spans(
    docs: DataFrame,
    unit: str = "paragraph",
    *,
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide span dedup. Returns ``(doc_id, text, n_spans,
    n_dropped)`` with ``text`` rebuilt from the surviving spans in their
    original order — byte-exact for every unit: paragraph/line spans
    never contain their separator, and sentence spans carry their own
    trailing whitespace (glue), so a document with nothing deduplicated
    is returned unchanged. Spans shorter than ``min_chars`` are exempt
    (never dropped — deduplicating one-word spans destroys ordinary
    prose). The sentence-unit dedup key is the span with trailing
    whitespace stripped, so the same sentence followed by different
    glue still deduplicates (the kept occurrence keeps its OWN glue).
    """
    units = span_units(docs, unit, text_col=text_col)
    sep = _SPLITTERS[unit][1]

    # NOT F.rtrim: Spark's trim family strips only the space character,
    # and sentence glue includes newlines/tabs
    key = (
        F.regexp_replace(F.col("span"), r"\s+$", "")
        if unit == "sentence"
        else F.col("span")
    )
    eligible = (F.length(key) >= min_chars) & (F.trim(F.col("span")) != "")
    # metadata-only decision frame: only (hash, doc_id, idx) triples
    # shuffle, never the span text. The first occurrence per hash is a
    # MIN-STRUCT AGGREGATION, not a row_number window: min() partially
    # aggregates map-side, so a boilerplate span repeated billions of
    # times collapses to one row per mapper before the shuffle — a
    # window over the same hash key would funnel every occurrence of the
    # hot span into a single reducer partition, which WindowExec cannot
    # split (no skew mitigation exists for windows; AQE only splits
    # joins). Same semantics: min(struct(doc_id, idx)) == the row that
    # row_number() over (partition by h order by doc_id, idx) ranks 1.
    meta = units.select(
        F.xxhash64(key).alias("h"), "doc_id", "idx", eligible.alias("elig")
    )
    winners = (
        meta.filter("elig")
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "idx")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.idx").alias("idx"),
            F.lit(True).alias("is_winner"),
        )
    )
    # join on the data's home key (uniform, skew-free); eligibility is
    # recomputed as a column, so exempt spans keep without a winner row
    decided = units.join(winners, ["doc_id", "idx"], "left").withColumn(
        "keep",
        ~eligible | F.coalesce(F.col("is_winner"), F.lit(False)),
    )
    rebuilt = (
        decided.groupBy("doc_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("idx", "span"))
                        )
                    ),
                    lambda s: s.span,
                ),
            ).alias("text"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("n_dropped"),
        )
    )
    return rebuilt.select("doc_id", "text", "n_spans", "n_dropped")
