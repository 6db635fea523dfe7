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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# unit -> (split regex, rejoin separator). For paragraph/line the
# separator IS the split pattern, so reconstruction is exact. The
# sentence unit (round 10 — C4's actual dedup granularity is sentence
# spans) is GLUE-PRESERVING (round 11): instead of splitting on the
# inter-sentence whitespace (which consumed it, so every rebuilt
# document — deduplicated or not — had its newlines/double-spaces
# silently normalized to single spaces), a sentinel (U+001F, the ASCII
# unit separator) is injected AFTER each terminal-punctuation-plus-
# whitespace run and the text splits on the sentinel alone. Each span
# then CARRIES its trailing whitespace, rejoin is '', and
# reconstruction is exact for every unit; the dedup key is the
# trailing-whitespace-stripped span, so the same sentence followed by
# different glue still deduplicates. Pre-existing sentinel bytes are
# ESCAPED before injection (round 12 — previously a document already
# containing U+001F split there and the byte silently vanished from the
# rebuilt text even when nothing deduplicated): U+001E -> U+001E '0',
# U+001F -> U+001E '1' before the split, reversed after the rebuild, so
# the only U+001F in the split input is the injected sentinel and
# reconstruction is byte-exact UNCONDITIONALLY. The escape is injective
# and whitespace-free, so dedup keys stay consistent corpus-wide and
# the splitter/rtrim regexes are undisturbed; for sentinel-free text
# (all real corpora) both passes are no-ops. The usual naive-splitter
# caveat applies (abbreviations like "Dr." over-split, which only makes
# spans SHORTER, never merges distinct sentences).
_SENTINEL = "\x1f"
_ESC = "\x1e"
_SPLITTERS = {
    "paragraph": ("\n\n", "\n\n"),
    "line": ("\n", "\n"),
    "sentence": (_SENTINEL, ""),
}


def _encode_sentinel(txt: Column) -> Column:
    """Escape pre-existing U+001E/U+001F so the injected sentinel is
    unambiguous (module doc). Escape-lead first: the '0'-suffixed pairs
    this pass writes are never re-touched by the sentinel pass.
    ``replace`` (literal substring scan), not ``regexp_replace`` (round
    13): the patterns are single fixed chars, and the two regex-engine
    passes per direction were the bulk of the escape fix's +30% on the
    span_dedup_decision bench — same output, pinned by the existing
    control-byte round-trip tests."""
    return F.replace(
        F.replace(txt, F.lit(_ESC), F.lit(_ESC + "0")),
        F.lit(_SENTINEL),
        F.lit(_ESC + "1"),
    )


def _decode_sentinel(txt: Column) -> Column:
    """Reverse :func:`_encode_sentinel` on rebuilt text. Order matters
    and is safe: in encoded text U+001E appears only as an escape lead,
    so 'U+001E 1' exactly identifies original sentinels (an original
    literal 'U+001E 1' encodes to 'U+001E 0 1', which this pass cannot
    match)."""
    return F.replace(
        F.replace(txt, F.lit(_ESC + "1"), F.lit(_SENTINEL)),
        F.lit(_ESC + "0"),
        F.lit(_ESC),
    )


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
        # escape pre-existing control bytes, then inject the sentinel
        # after each [.!?]+whitespace run and split on the sentinel —
        # the whitespace stays INSIDE the preceding span (glue), so
        # rejoining with '' and decoding is exact (module doc). Spans
        # are therefore in ESCAPED form until the rebuild decodes.
        txt = _encode_sentinel(txt)
        txt = F.regexp_replace(txt, r"(?<=[.!?])(\s+)", "$1" + _SENTINEL)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(txt, F.lit(sep), -1)).alias("idx", "span"),
    )


def span_key(unit: str) -> Column:
    """The dedup KEY of a ``span`` column for the given unit: the span
    itself, except the sentence unit strips trailing whitespace (glue
    rides the span for exact reconstruction but must not split dedup
    groups). NOT F.rtrim: Spark's trim family strips only the space
    character, and sentence glue includes newlines/tabs."""
    if unit not in _SPLITTERS:
        raise ValueError(f"unit must be one of {sorted(_SPLITTERS)}, got {unit!r}")
    return (
        F.regexp_replace(F.col("span"), r"\s+$", "")
        if unit == "sentence"
        else F.col("span")
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
    is returned unchanged — UNCONDITIONALLY, including documents that
    already contain U+001E/U+001F bytes (escaped around the sentinel
    split, round 12; ``min_chars`` measures the escaped key, so a key
    made purely of those control bytes counts 2 chars per byte). Spans shorter than ``min_chars`` are exempt
    (never dropped — deduplicating one-word spans destroys ordinary
    prose). The sentence-unit dedup key is the span with trailing
    whitespace stripped, so the same sentence followed by different
    glue still deduplicates (the kept occurrence keeps its OWN glue).

    Thin wrapper over :func:`dedup_spans_multi` (one implementation of
    the decision/reconstruction logic for both entry points)."""
    out = dedup_spans_multi(
        [(unit, docs, unit)], text_col=text_col, min_chars=min_chars
    )
    return out.select(
        "doc_id",
        F.col(f"text_{unit}").alias("text"),
        F.col(f"n_spans_{unit}").alias("n_spans"),
        F.col(f"n_dropped_{unit}").alias("n_dropped"),
    )


def dedup_spans_multi(
    inputs: list[tuple[str, DataFrame, str]],
    *,
    text_col: str = "text",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide span dedup over SEVERAL grains in ONE pass — e.g.
    paragraph- and sentence-level dedup of (two derivations of) the
    same corpus. ``inputs`` is ``[(name, docs, unit), ...]`` with
    unique names; the result has one row per ``doc_id`` with columns
    ``text_<name>``, ``n_spans_<name>``, ``n_dropped_<name>`` per
    input (NULL text/0 counts for a doc absent from that input).

    Why one pass: the grain frames union behind a grain tag, so the
    winner aggregation, the home-key join-back, and the reconstruction
    aggregation each run ONCE over the union — running k separate
    dedup passes costs k winner shuffles, k reconstructions, and k-1
    result joins; measured ~2x wall-clock for k=2 at bench scale, and
    k extra corpus-summary shuffles at 100 TB. Grains never cross-
    deduplicate: the hash key is (grain, span).
    """
    names = [n for n, _, _ in inputs]
    if len(set(names)) != len(names):
        raise ValueError(f"input names must be unique, got {names}")

    unioned = None
    for name, docs, unit in inputs:
        part = span_units(docs, unit, text_col=text_col).select(
            F.lit(name).alias("grain"), "doc_id", "idx", "span",
            span_key(unit).alias("_k"),
        )
        unioned = part if unioned is None else unioned.unionByName(part)
    eligible = (F.length("_k") >= min_chars) & (F.trim(F.col("span")) != "")
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
    # The grain tag rides the hash (and the min-struct, where it is
    # constant per group), so grains stay separate dedup universes.
    meta = unioned.select(
        F.xxhash64("grain", "_k").alias("h"),
        "grain", "doc_id", "idx", eligible.alias("elig"),
    )
    winners = (
        meta.filter("elig")
        .groupBy("h")
        .agg(F.min(F.struct("doc_id", "idx", "grain")).alias("w"))
        .select(
            F.col("w.grain").alias("grain"),
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.idx").alias("idx"),
            F.lit(True).alias("is_winner"),
        )
    )
    # join on the data's home key (uniform, skew-free); eligibility is
    # recomputed as a column, so exempt spans keep without a winner row
    decided = unioned.join(
        winners, ["grain", "doc_id", "idx"], "left"
    ).withColumn(
        "keep",
        ~eligible | F.coalesce(F.col("is_winner"), F.lit(False)),
    )
    aggs = []
    for name, _, unit in inputs:
        g = F.col("grain") == name
        sep = _SPLITTERS[unit][1]
        rebuilt = F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(g & F.col("keep"), F.struct("idx", "span"))
                    )
                ),
                lambda s: s.span,
            ),
        )
        if unit == "sentence":
            # sentence spans are in escaped form (span_units) — decode
            # the rebuilt text so pre-existing control bytes round-trip
            rebuilt = _decode_sentinel(rebuilt)
        aggs.append(
            F.when(F.sum(F.when(g, 1).otherwise(0)) > 0, rebuilt)
            .alias(f"text_{name}")
        )
        aggs.append(
            F.sum(F.when(g, 1).otherwise(0)).alias(f"n_spans_{name}")
        )
        aggs.append(
            F.sum(F.when(g & ~F.col("keep"), 1).otherwise(0))
            .alias(f"n_dropped_{name}")
        )
    return decided.groupBy("doc_id").agg(*aggs)
