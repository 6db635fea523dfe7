"""Streaming deduplication with bounded state.

The batch dedup family (plans/text.py, operators/text_dedup.py) has a
streaming counterpart for ingest-time dedup: drop re-deliveries of the
same record key as the stream flows, without accumulating state forever.

Two forms, mirroring Spark's own split:

* :func:`dedup_exact_stream` — ``dropDuplicates`` on the key columns.
  State grows with the number of distinct keys ever seen; correct for
  bounded key domains (e.g. file paths in the ingest stream), a memory
  leak for unbounded ones. Use the watermarked form for event streams.

* :func:`dedup_within_watermark` — ``dropDuplicatesWithinWatermark``:
  a duplicate arriving within ``delay`` of the first occurrence is
  dropped, and each key's state is evicted once the event-time watermark
  passes its first-seen time + delay. State is bounded by (keys arriving
  per delay window), independent of stream lifetime — the 100 TB/
  always-on answer. Exactly the guarantee an at-least-once upstream
  (like the FTP ingest's re-emitted ticks; SURVEY.md §2.8 T5) needs to
  become effectively-once downstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_exact_stream(stream: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Exact streaming dedup on ``keys``; state unbounded (see module doc)."""
    return stream.dropDuplicates(list(keys))


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    *,
    event_time_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with state bounded by the watermark ``delay``."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(list(keys))
