"""Crawl → corpus end to end: the Common Crawl-shaped ingestion path.

    HTTP manifest (warc.paths)             sources/http_source.py
      → distributed GET (retries, quarantine)
      → WARC record parse                  ingest/warc.py
      → visible-text extraction            operators/html_text.py
      → canonical documents frame          warc_to_corpus
      → exact dedup + repetition gate      operators/{text_dedup,repetition}.py
      → WebDataset tar shards              operators/wds.py
      + incremental re-poll (new manifest segment only) via
        incremental_fetch's versioned per-URL state

The synthetic crawl is served by an in-memory opener (this sandbox has
no network — production passes no ``opener`` and the default urllib
path runs); everything downstream is the real operator code.

Run: python examples/crawl_ingest.py
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.ingest.warc import warc_to_corpus
from kafka_connect_ftp_spark.operators.repetition import repetition_signals
from kafka_connect_ftp_spark.operators.text_dedup import exact_dedup
from kafka_connect_ftp_spark.operators.wds import write_wds_shards
from kafka_connect_ftp_spark.session import get_spark
from kafka_connect_ftp_spark.sources.http_source import (
    HttpManifestSource,
    incremental_fetch,
    read_warc_manifest,
)


def _record(wtype: str, payload: bytes, uri: str) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Record-ID: <urn:uuid:{uri}>\r\n"
        f"WARC-Date: 2024-05-01T00:00:00Z\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _page(body_html: str) -> bytes:
    body = (
        "<html><head><title>t</title><style>.x{}</style></head><body>"
        f"{body_html}<script>tracker();</script></body></html>"
    ).encode()
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _synthetic_crawl() -> dict[str, bytes]:
    pages = {
        f"https://site{i % 3}.example/page{i}": _page(
            f"<h1>Doc {i}</h1><p>unique prose number {i} about topic {i % 5}.</p>"
        )
        for i in range(12)
    }
    # two exact duplicate pages (same body, different URL on the same host)
    pages["https://site0.example/dup"] = _page(
        "<h1>Doc 1</h1><p>unique prose number 1 about topic 1.</p>"
    )
    archives: dict[str, bytes] = {}
    urls = sorted(pages)
    for shard in range(3):
        recs = b"".join(
            gzip.compress(_record("response", pages[u], u))
            for u in urls[shard::3]
        )
        archives[f"https://data.example/crawl/seg-{shard}.warc.gz"] = recs
    return archives


def main() -> int:
    spark = get_spark("crawl-ingest-example")
    archives = _synthetic_crawl()

    def opener(url, headers, timeout):
        return 200, archives[url]

    src = HttpManifestSource(fetch_partitions=3, opener=opener)
    # persist right after the fetch+parse: every action below would
    # otherwise re-download and re-parse the whole crawl (and a URL that
    # flakes between actions would make the printed stats inconsistent)
    records = read_warc_manifest(spark, src, sorted(archives)).persist()
    n_records = records.count()

    docs = warc_to_corpus(records, strip_html=True).persist()
    n_docs = docs.count()

    # doc_id = xxhash64(host, text): the duplicate page collides with
    # its twin BY CONSTRUCTION within a host; exact_dedup returns the
    # (content_hash, keeper, n_copies) decision frame and the join
    # keeps one representative per content hash
    uniq = docs.dropDuplicates(["doc_id"])
    keepers = exact_dedup(uniq, "doc_id", ["text"]).select(
        F.col("keeper").alias("doc_id")
    )
    deduped = uniq.join(keepers, "doc_id")
    n_dedup = deduped.count()

    gated = (
        repetition_signals(deduped)
        .filter(F.col("top_2gram_frac") < 0.5)
        .join(deduped, "doc_id")
    )
    n_gated = gated.count()

    out = os.path.join(tempfile.mkdtemp(prefix="crawl_"), "wds")
    shards = write_wds_shards(
        gated.withColumn("meta", F.to_json(F.struct("source", "url"))),
        out,
        fields={"text": "txt", "meta": "json"},
        n_shards=2,
    )

    print(f"warc records:  {n_records}")
    print(f"documents:     {n_docs} (html-stripped)")
    print(f"deduped:       {n_dedup}")
    print(f"gated:         {n_gated}")
    print(f"wds shards:    {len(shards)} -> {out}")
    sample = docs.orderBy("doc_id").first()
    print(f"sample text:   {sample.text[:60]!r} from {sample.source}")
    records.unpersist()
    docs.unpersist()

    # --- incremental re-poll: the manifest grows by one segment; only
    # the NEW archive is fetched (the reference's change-detection poll
    # loop over HTTP — state is versioned crash-atomic parquet)
    state_dir = os.path.join(tempfile.mkdtemp(prefix="crawl_"), "state")
    n_tick1 = incremental_fetch(spark, src, sorted(archives), state_dir).count()
    grown = dict(archives)
    grown["https://data.example/crawl/seg-3.warc.gz"] = gzip.compress(
        _record(
            "response", _page("<p>fresh segment page.</p>"), "https://site3.example/new"
        )
    )
    src2 = HttpManifestSource(
        fetch_partitions=3, opener=lambda u, h, t: (200, grown[u])
    )
    tick2 = [r.url for r in incremental_fetch(spark, src2, sorted(grown), state_dir).collect()]
    print(f"poll tick 1:   fetched {n_tick1}/{len(archives)} archives")
    print(f"poll tick 2:   fetched {len(tick2)}/{len(grown)} -> {tick2}")
    assert tick2 == ["https://data.example/crawl/seg-3.warc.gz"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
