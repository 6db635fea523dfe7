"""WARC (Web ARChive, ISO 28500) reader: ingest web-crawl dumps — the
Common Crawl delivery format, i.e. THE raw input of web-scale LLM corpus
pipelines — into the engine's frames.

``read_warc`` parses ``.warc`` / ``.warc.gz`` files into one row per
WARC record; ``warc_to_corpus`` projects successful HTTP responses onto
the canonical documents shape (``ingest/corpus.py``), so the entire
curation pipeline (dedup → quality gates → governance → packing) runs
unchanged on a crawl dump.

Format notes (public spec): a record is ``WARC/1.x CRLF`` + header
lines + ``CRLF CRLF`` + exactly ``Content-Length`` payload bytes +
``CRLF CRLF``. Common Crawl compresses each record as its OWN gzip
member inside the ``.warc.gz``, which is what makes the format
record-seekable; this reader handles both that layout and
whole-file/plain streams. For ``response`` records the HTTP envelope is
split off: ``http_status`` / ``content_type`` come from the HTTP
headers and ``payload`` is the HTTP BODY. (Transfer-encoding such as
chunked is NOT decoded — Common Crawl stores payloads already
de-chunked; the raw bytes pass through for anything else.)

Scale design: one ``binaryFile`` row per archive file (Common Crawl
sizes archives ~1 GB precisely so that a file is a work unit), parsed
in an Arrow-batched ``mapInPandas`` — parallelism is the file count,
text never shuffles, and the canonical projection afterward is
map-side. Malformed input follows the converter quarantine convention
(ingest/converters.py): a corrupt record or file yields a row with
``decode_error`` set — one bad member never aborts a 1000-file scan —
and clean records of the same file still flow.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = (
    "src_file string, record_id string, warc_type string, target_uri string,"
    " warc_date string, http_status int, content_type string,"
    " payload binary, payload_length long, decode_error string"
)


def _iter_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    Common Crawl record-per-member layout)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        chunk = d.decompress(data[pos:]) + d.flush()
        yield chunk
        remaining = len(d.unused_data)
        consumed = (len(data) - pos) - remaining
        if consumed <= 0:  # no forward progress -> corrupt trailer
            raise ValueError("gzip member made no progress")
        pos += consumed


def _parse_warc_stream(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per record from a plain WARC byte
    stream; header keys lower-cased. Raises ValueError on malformed
    framing (caller quarantines)."""
    pos = 0
    while True:
        while raw.startswith(b"\r\n", pos) or raw.startswith(b"\n", pos):
            pos += 2 if raw.startswith(b"\r\n", pos) else 1
        if pos >= len(raw):
            return
        if not raw.startswith(b"WARC/", pos):
            raise ValueError(f"bad record magic at offset {pos}")
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated record header")
        lines = raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"missing/invalid Content-Length: {e}") from e
        start = hdr_end + 4
        payload = raw[start : start + clen]
        if len(payload) < clen:
            raise ValueError(
                f"truncated record: payload {len(payload)} < Content-Length {clen}"
            )
        yield headers, payload
        pos = start + clen


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) for an HTTP response payload; the
    payload passes through untouched when it isn't an HTTP envelope."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head = payload[:sep].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for ln in head[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[sep + 4 :]


def _records_for_file(path: str, content: bytes) -> Iterator[tuple]:
    def record_rows(raw: bytes) -> Iterator[tuple]:
        for headers, payload in _parse_warc_stream(raw):
            wtype = headers.get("warc-type")
            status, ctype, body = (
                _split_http(payload) if wtype == "response" else (None, None, payload)
            )
            yield (
                path,
                headers.get("warc-record-id"),
                wtype,
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                status,
                ctype if ctype is not None else headers.get("content-type"),
                body,
                len(body),
                None,
            )

    def quarantine(err: Exception) -> tuple:
        return (path, None, None, None, None, None, None, None, None, str(err))

    if content[:2] == b"\x1f\x8b":
        pos_members = _iter_gzip_members(content)
        while True:
            try:
                member = next(pos_members)
            except StopIteration:
                return
            except Exception as e:  # corrupt member: quarantine, stop the file
                yield quarantine(e)
                return
            try:
                yield from record_rows(member)
            except ValueError as e:  # bad record inside a good member
                yield quarantine(e)
    else:
        try:
            yield from record_rows(content)
        except ValueError as e:
            yield quarantine(e)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record under ``path`` (glob ok): ``src_file,
    record_id, warc_type, target_uri, warc_date, http_status,
    content_type, payload, payload_length, decode_error``. Corrupt
    files/records become quarantine rows (``decode_error`` set) instead
    of failing the scan."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "src_file", "record_id", "warc_type", "target_uri", "warc_date",
            "http_status", "content_type", "payload", "payload_length",
            "decode_error",
        ]
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_for_file(path_, bytes(content)))
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int32")
            out["payload_length"] = out["payload_length"].astype("Int64")
            yield out

    return files.mapInPandas(parse, _SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    body_col: str = "body",
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    warc_date: str = "2024-06-01T00:00:00Z",
    n_shards: int = 8,
    salt: str = "v1",
    gzip_members: bool = True,
) -> list[str]:
    """Export ``(url, body)`` rows as WARC response archives under
    ``out_dir`` — the inverse of :func:`read_warc`, for producing
    spec-conformant crawl archives from a frame (and the deterministic
    fixture the oracle gate replays through the real reader). Each row
    becomes one ``response`` record whose payload is a full HTTP
    envelope (``HTTP/1.1 {status}`` + Content-Type + CRLFCRLF + body);
    ``gzip_members=True`` writes the Common Crawl record-per-gzip-member
    layout (``.warc.gz``), else one plain concatenated ``.warc``.

    Determinism mirrors ``operators/wds.py:write_wds_shards`` (the same
    export contract): rows route by ``xxhash64(salt, url)``, are written
    in deterministic hash order with url tie-break, record ids derive
    from sha256(url), zlib writes gzip headers with mtime 0, and each
    task publishes via tmp+rename — same corpus + salt + n_shards →
    byte-identical shards, and a torn shard is never visible. Bodies may
    be string (written UTF-8) or binary; a NULL url fails loudly, a NULL
    body writes an empty-body response."""
    import hashlib
    import os

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    for c in (url_col, body_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not found; frame has {df.columns}")
    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if gzip_members else "warc"
    routed = (
        df.select(F.col(url_col).alias("url"), F.col(body_col).cast("binary").alias("body"))
        .withColumn("_k", F.xxhash64(F.lit(salt), F.col("url")))
        .repartition(n_shards, F.col("_k"))
        .sortWithinPartitions("_k", "url")
    )
    import http.client as _hc

    reason = _hc.responses.get(status, "Status")
    status_line = f"HTTP/1.1 {status} {reason}"

    def record_bytes(url: str, body: bytes) -> bytes:
        payload = (
            f"{status_line}\r\nContent-Type: {content_type}\r\n\r\n".encode()
            + body
        )
        rid = hashlib.sha256(url.encode("utf-8")).hexdigest()[:32]
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {warc_date}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode()
        return header + payload + b"\r\n\r\n"

    def write_partition(batches):
        import pandas as _pd
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        path = os.path.join(out_dir, f"crawl-{pid:05d}.{ext}")
        tmp = path + f".tmp-{tc.taskAttemptId()}"
        with open(tmp, "wb") as f:
            for pdf in batches:
                for url, body in zip(pdf["url"], pdf["body"]):
                    if url is None:
                        raise ValueError("write_warc: NULL url")
                    rec = record_bytes(url, bytes(body) if body is not None else b"")
                    if gzip_members:
                        # zlib's gzip header carries mtime=0 / no name —
                        # byte-deterministic, unlike gzip.compress(time.time())
                        c = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
                        f.write(c.compress(rec) + c.flush())
                    else:
                        f.write(rec)
        os.replace(tmp, path)
        yield _pd.DataFrame({"n": [1]})

    # Arrow-batched mapInPandas + noop write, not rdd.foreachPartition:
    # the rdd hop forced a JavaToPython pickle pass over every (url,
    # body) Row (operators/wds.py made the same move in round 12,
    # measured 1.3s -> 0.35s there; here the sf0.1 fixture's ~2KB bodies
    # measure at parity, ~0.45s warm either way — the win scales with
    # payload bytes, the regime write_warc exists for). Output bytes are
    # pinned identical (interleaved A/B digest). The local sort below
    # the opaque mapInPandas is preserved (no exchange in between), so
    # record order — and shard BYTES — are unchanged; empty partitions
    # still run their task and publish an empty shard file, exactly
    # like the old path.
    routed.select("url", "body").mapInPandas(write_partition, "n long").write.format(
        "noop"
    ).mode("overwrite").save()
    return [os.path.join(out_dir, f"crawl-{i:05d}.{ext}") for i in range(n_shards)]


def warc_to_corpus(
    records: DataFrame,
    *,
    min_status: int = 200,
    max_status: int = 299,
    strip_html: bool = False,
    clean: bool = False,
) -> DataFrame:
    """Project parsed WARC records onto the canonical documents frame:
    successful HTTP responses become ``(doc_id, text, source, url,
    warc_date)`` with ``source`` = the registered domain host
    (``parse_url``) and the corpus.py content-stable id convention
    ``xxhash64(source, text)``. ``strip_html=True`` runs the JVM-side
    visible-text extraction (operators/html_text.py — the C4-style
    first transform) so quality gates see prose, not markup; the
    default keeps the raw UTF-8 body."""
    body = F.make_valid_utf8(F.col("payload").cast("string"))
    # cast + make_valid_utf8, not decode(): under ANSI mode decode
    # raises on malformed byte sequences, and a crawl body with one bad
    # byte must not fail the scan — invalid sequences become U+FFFD
    if strip_html:
        from kafka_connect_ftp_spark.operators.html_text import html_to_text

        body = html_to_text(body)
    if clean:
        # control/zero-width strip + line-ending normalization
        # (operators/text_clean.py) — still one codegen projection
        from kafka_connect_ftp_spark.operators.text_clean import clean_text

        body = clean_text(body)
    return (
        records.filter(F.col("decode_error").isNull())
        .filter(F.col("warc_type") == "response")
        .filter(F.col("http_status").between(min_status, max_status))
        .select(
            body.alias("text"),
            # try_parse_url, not parse_url: under ANSI mode (this
            # engine's default) parse_url THROWS on a malformed URI —
            # one bad WARC-Target-URI (unencoded space etc.) would abort
            # the whole scan; try_ returns NULL -> coalesce('unknown')
            F.coalesce(
                F.try_parse_url(F.col("target_uri"), F.lit("HOST")), F.lit("unknown")
            ).alias("source"),
            F.col("target_uri").alias("url"),
            "warc_date",
        )
        .withColumn("doc_id", F.xxhash64("source", "text"))
        .select("doc_id", "text", "source", "url", "warc_date")
    )
