"""Oracle-checked crawl ingestion: the round-6 WARC/HTML/cleanup/WDS
surface driven end-to-end under the driver's DuckDB hash gate.

The fixture is DERIVED FROM THE DOCUMENTS TABLE (non-vacuous at every
SF) plus a fixed adversarial archive, and every byte of it is
re-derivable in SQL — the ``FakeCodec`` pattern of
plans/multimodal_queries.py applied to the crawl path:

- each document is wrapped in a fixed HTML template (entities escaped)
  inside a full HTTP 200 envelope inside a WARC response record, and
  the shards are written by the REAL exporter (``ingest/warc.py:
  write_warc``, record-per-gzip-member Common Crawl layout);
- one literal adversarial archive exercises every hazard the readers
  quarantine or normalize: a warcinfo record (non-response), a 404
  (filtered from the corpus), a malformed member (→ quarantine row,
  scan continues), a malformed WARC-Target-URI (→ source 'unknown' via
  try_parse_url), an empty 200 body, and a "messy" page covering
  script/style/comment drops, block breaks, named + uppercase + numeric
  entities, NBSP, tabs, a raw NUL, a zero-width space, CRLF line
  endings and an invalid UTF-8 byte (→ U+FFFD via make_valid_utf8);
- the Spark side then runs the REAL chain — ``read_warc`` →
  ``warc_to_corpus(strip_html=True, clean=True)`` (operators/
  html_text.py + text_clean.py) → ``write_wds_shards`` →
  ``read_corpus(fmt='wds')`` — and emits a tagged union:
  ``rec`` (WARC framing + HTTP envelope split: status, content type,
  payload md5/length, quarantine), ``doc`` (extraction + cleanup:
  source host, the extracted text itself), ``wds`` (delivery round
  trip: text byte-identity and doc_id inversion — xxhash64 ids are
  negative about half the time, pinning the signed sample-key
  encoding);
- the HTTP manifest source (sources/http_source.py) runs its REAL
  fetch/Range/incremental-poll code paths over a deterministic fake
  transport whose bodies are a pure function of the URL (so the oracle
  re-derives every fetched byte): ``http`` (one-shot manifest pull —
  content md5/length, attempt counts, the permanent-404 single-attempt
  short-circuit and the transport-error full retry budget),
  ``httprange`` (byte-window Range fetches), ``tick0``/``tick1``
  (incremental_fetch over a GROWING manifest: tick 1 fetches only the
  new URLs + quarantine retries — the reference's change-detection
  poll loop, S4/F2, hash-checked).

The oracle re-derives the generated sections from ``documents`` with
the same template/escape chain in SQL, and states the adversarial
rows as literals whose md5/text values were hand-derived from the
fixed record bytes (tests/test_crawl_family.py cross-pins them against
an independent Python implementation).

Reference parity: this is the engine's front door for its stated
workload, the crawl-scale analog of the reference's file→record
pipeline (FtpSourceTask.scala poll → convert → deliver).
"""

from __future__ import annotations

import os
import tempfile
import zlib

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

_HOST = "ex.example"
_URL_PRE = f"http://{_HOST}/doc/"
# no single quotes anywhere in the template (it is inlined into SQL
# string literals); the <script> content pins the block-drop pass
_HTML_PRE = (
    '<html><head><title>doc</title><script>var x = "<p>ignored</p>";'
    "</script></head><body><p>"
)
_HTML_POST = "</p></body></html>"
_CTYPE = "text/html; charset=utf-8"

# ---- adversarial archive (fixed literal bytes) --------------------------

_MESSY_URL = "http://messy.example/a"
_MESSY_BODY = (
    b"<html>\r\n<head><title>T</title><style>p {color: red}</style></head>\r\n"
    b'<body>\r\n<!-- hidden -->\r\n<script>alert("no")</script>\r\n'
    b"<p>caf\xc3\xa9 &amp; cr\xc3\xa8me</p>\r\n"
    b"<p>5 &lt; 7 &GT; 3&nbsp;&#65;</p>\r\n"
    b"<div>tab\tseparated\x00raw</div>\r\n"
    b"<p>zero\xe2\x80\x8bwidth</p>\r\n"
    b"<p>bad byte \xff here</p>\r\n"
    b"</body></html>"
)
# expected extraction, hand-derived from the documented chain (named +
# uppercase entities decode, &#65; passes through, NUL/zero-width strip,
# \xff -> U+FFFD); cross-pinned by tests/test_crawl_family.py
_MESSY_TEXT = (
    "café & crème\n5 < 7 > 3 &#65;\ntab separatedraw\n"
    "zerowidth\nbad byte � here"
)
_HTTP_URL_PRE = "fake://h/"
_GONE_HTTP = f"{_HTTP_URL_PRE}gone"  # permanent 404: one attempt, no retry
_DOWN_HTTP = f"{_HTTP_URL_PRE}down"  # transport error: full retry budget
_GONE_ERR = "HTTPError: HTTP Error 404: Not Found"
_DOWN_ERR = "ConnectionError: fake transport down"


def fake_http_opener(url: str, headers: dict, timeout: float):
    """Deterministic in-memory HTTP stand-in for the manifest source —
    a PURE function of (url, Range header), so the DuckDB oracle can
    re-derive every fetched byte from the URL alone (the sandbox has no
    network; production uses the default urllib opener). Serializable
    to executors as a module-level function."""
    import urllib.error

    tail = url.rsplit("/", 1)[-1]
    if tail == "gone":
        raise urllib.error.HTTPError(url, 404, "Not Found", None, None)
    if tail == "down":
        raise ConnectionError("fake transport down")
    body = (f"body-{tail}-" + "x" * (int(tail) % 17)).encode()
    rng = headers.get("Range")
    if rng:
        a, b = rng.removeprefix("bytes=").split("-")
        return 206, body[int(a) : int(b) + 1]
    return 200, body


_BADHOST_URL = "http://bad host/a b"  # unencoded spaces: try_parse_url -> NULL
_BADHOST_BODY = b"<p>plain</p>"
_EMPTY_URL = f"http://{_HOST}/empty"
_GONE_URL = f"http://{_HOST}/missing"
_GONE_BODY = b"<html><body>gone</body></html>"
_WARCINFO_URI = "urn:warcinfo:fixture"
_WARCINFO_PAYLOAD = b"software: fixture\r\n"
_QUARANTINE_ERR = "bad record magic at offset 0"

# md5 of the literal payload BYTES above (hashlib; the oracle cannot
# build non-UTF-8 bytes in SQL) — cross-pinned by the test module
_MD5 = {
    "messy": "7420ec12df6fa5f349d04a06ec72a89d",
    "badhost": "0f02198e765bfb5295713b2e986151c7",
    "gone": "8ecf64d13b3909a942e4ab127a3bdd86",
    "empty": "d41d8cd98f00b204e9800998ecf8427e",
    "warcinfo": "3f67b9560b411b598facad15d609d292",
}


def _record(wtype: str, uri: str | None, ctype: str, payload: bytes) -> bytes:
    lines = [b"WARC/1.0", b"WARC-Type: " + wtype.encode()]
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines += [
        b"WARC-Date: 2024-06-01T00:00:00Z",
        b"Content-Type: " + ctype.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(status_line: bytes, ctype: str, body: bytes) -> bytes:
    return status_line + b"\r\nContent-Type: " + ctype.encode() + b"\r\n\r\n" + body


def adversarial_warc_bytes() -> bytes:
    """The fixed adversarial ``.warc.gz`` (record-per-gzip-member; the
    malformed member sits mid-file to prove the scan continues past a
    quarantined record). Public so the test module can pin the oracle's
    literal md5/text values against these exact bytes."""
    members = [
        _record("warcinfo", _WARCINFO_URI, "application/warc-fields", _WARCINFO_PAYLOAD),
        _record(
            "response",
            _GONE_URL,
            "application/http; msgtype=response",
            _http(b"HTTP/1.1 404 Not Found", "text/html", _GONE_BODY),
        ),
        _record(
            "response",
            _MESSY_URL,
            "application/http; msgtype=response",
            _http(b"HTTP/1.1 200 OK", _CTYPE, _MESSY_BODY),
        ),
        b"NOT A WARC RECORD",  # -> quarantine row, scan continues
        _record(
            "response",
            _BADHOST_URL,
            "application/http; msgtype=response",
            _http(b"HTTP/1.1 200 OK", _CTYPE, _BADHOST_BODY),
        ),
        _record(
            "response",
            _EMPTY_URL,
            "application/http; msgtype=response",
            _http(b"HTTP/1.1 200 OK", _CTYPE, b""),
        ),
    ]
    out = b""
    for m in members:
        c = zlib.compressobj(6, zlib.DEFLATED, zlib.MAX_WBITS | 16)
        out += c.compress(m) + c.flush()
    return out


# ---- fixture construction ----------------------------------------------

_FIXTURE_CACHE: dict[str, str] = {}
_FANOUT_CACHE: dict[str, int] = {}


def _fanout(spark, sf_dir: str) -> int:
    """Scale-adaptive shard/fetch-partition count for the crawl fixture,
    derived from INPUT SIZE (guide §2: never a constant tuned for one
    core count, never the core count itself). Round 13: the fixture's
    hard-coded 4s capped the whole family's parallelism — binaryFile
    gives one parse task per archive and the HTTP source one task per
    fetch partition, so at a 10x corpus the family ran 4-wide on 32
    cores and measured SLOWER at 32 than at 8 (scheduler overhead with
    no compute to spread). One shard per ~2500 docs, floor 4 (the
    historical value at every driver SF: sf0.001/0.01/0.1 all stay at
    4, so the driver's bench and oracle fixtures are byte-identical to
    round 12's), cap 64. Results are shard-count-independent: the rec/
    doc/wds/tick sections project record CONTENT, never shard layout,
    and the oracle re-derives them from the documents table alone."""
    hit = _FANOUT_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    n_docs = load_tables(spark, sf_dir, "documents")["documents"].count()
    out = max(4, min(64, n_docs // 2500))
    _FANOUT_CACHE[sf_dir] = out
    return out


def _fixture_dir(spark, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the crawl fixture: documents
    wrapped in the HTML template and exported by the real
    ``write_warc``, plus the adversarial archive. A fresh mkdtemp per
    process — never reused across processes, so a crashed builder can't
    leave a partial fixture behind."""
    cached = _FIXTURE_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    from kafka_connect_ftp_spark.ingest.warc import write_warc

    base = tempfile.mkdtemp(prefix="crawl_fixture_")
    warc_dir = os.path.join(base, "warc")
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    esc = F.col("text")
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(ch), F.lit(ent))
    pages = docs.select(
        F.concat(F.lit(_URL_PRE), F.col("doc_id")).alias("url"),
        F.concat(F.lit(_HTML_PRE), esc, F.lit(_HTML_POST)).alias("body"),
    )
    write_warc(pages, warc_dir, n_shards=_fanout(spark, sf_dir), content_type=_CTYPE)
    with open(os.path.join(warc_dir, "adversarial.warc.gz"), "wb") as f:
        f.write(adversarial_warc_bytes())
    _FIXTURE_CACHE[sf_dir] = base
    return base


# ---- the oracle ---------------------------------------------------------

_NULLS = (
    "CAST(NULL AS INTEGER) AS status, CAST(NULL AS VARCHAR) AS ctype"
)

_ORACLE = f"""
WITH gen AS (
  SELECT 'http://ex.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
         text,
         '{_HTML_PRE}'
           || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
           || '{_HTML_POST}' AS page
  FROM documents
),
adv_doc(url, text, src) AS (VALUES
  ('{_MESSY_URL}', '{_MESSY_TEXT}', 'messy.example'),
  ('{_BADHOST_URL}', 'plain', 'unknown'),
  ('{_EMPTY_URL}', '', '{_HOST}')
),
recs AS (
  SELECT 'rec' AS section, url AS k, 200 AS status,
         '{_CTYPE}' AS ctype, md5(page) AS md5,
         CAST(strlen(page) AS BIGINT) AS n,
         CAST(NULL AS VARCHAR) AS src, CAST(NULL AS VARCHAR) AS text,
         CAST(NULL AS VARCHAR) AS err
  FROM gen
  UNION ALL
  SELECT 'rec', k, status, ctype, md5, n, NULL, NULL, err
  FROM (VALUES
    ('{_WARCINFO_URI}', CAST(NULL AS INTEGER), 'application/warc-fields',
     '{_MD5["warcinfo"]}', CAST(19 AS BIGINT), CAST(NULL AS VARCHAR)),
    ('{_GONE_URL}', 404, 'text/html', '{_MD5["gone"]}', CAST(30 AS BIGINT), NULL),
    ('{_MESSY_URL}', 200, '{_CTYPE}', '{_MD5["messy"]}', CAST(274 AS BIGINT), NULL),
    ('{_BADHOST_URL}', 200, '{_CTYPE}', '{_MD5["badhost"]}', CAST(12 AS BIGINT), NULL),
    ('{_EMPTY_URL}', 200, '{_CTYPE}', '{_MD5["empty"]}', CAST(0 AS BIGINT), NULL),
    ('__quarantine__', NULL, NULL, NULL, CAST(NULL AS BIGINT),
     '{_QUARANTINE_ERR}')
  ) AS t(k, status, ctype, md5, n, err)
),
doc_sec AS (
  SELECT 'doc' AS section, url AS k, {_NULLS}, md5(text) AS md5,
         CAST(strlen(text) AS BIGINT) AS n, '{_HOST}' AS src, text,
         CAST(NULL AS VARCHAR) AS err
  FROM gen
  UNION ALL
  SELECT 'doc', url, CAST(NULL AS INTEGER), NULL, md5(text),
         CAST(strlen(text) AS BIGINT), src, text, NULL
  FROM adv_doc
),
wds_in AS (
  -- the WDS leg writes one sample per distinct doc_id = hash(source,
  -- text); generated docs share one source, so group by text (min url
  -- is the writer's representative row)
  SELECT min(url) AS url, text FROM gen GROUP BY text
  UNION ALL SELECT url, text FROM adv_doc
),
wds_sec AS (
  SELECT 'wds' AS section, url AS k, {_NULLS}, md5(text) AS md5,
         CAST(1 AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS src, text,
         CAST(NULL AS VARCHAR) AS err
  FROM wds_in
),
hbody AS (
  -- the fake opener's body is a pure function of the URL: the oracle
  -- re-derives every fetched byte
  SELECT doc_id, '{_HTTP_URL_PRE}' || CAST(doc_id AS VARCHAR) AS hurl,
         'body-' || CAST(doc_id AS VARCHAR) || '-'
           || repeat('x', CAST(doc_id % 17 AS INT)) AS hb
  FROM documents
),
http_fail(k, status, attempts, err) AS (VALUES
  ('{_GONE_HTTP}', 404, '1', '{_GONE_ERR}'),
  ('{_DOWN_HTTP}', CAST(NULL AS INTEGER), '2', '{_DOWN_ERR}')
),
http_sec AS (
  SELECT 'http' AS section, hurl AS k, 200 AS status,
         CAST(NULL AS VARCHAR) AS ctype, md5(hb) AS md5,
         CAST(strlen(hb) AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS src,
         '1' AS text, CAST(NULL AS VARCHAR) AS err
  FROM hbody
  UNION ALL
  SELECT 'http', k, status, NULL, NULL, CAST(NULL AS BIGINT), NULL,
         attempts, err
  FROM http_fail
),
range_sec AS (
  SELECT 'httprange' AS section, hurl || '#2+5' AS k, 206 AS status,
         CAST(NULL AS VARCHAR) AS ctype, md5(substr(hb, 3, 5)) AS md5,
         CAST(5 AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS src,
         '1' AS text, CAST(NULL AS VARCHAR) AS err
  FROM hbody WHERE doc_id % 7 = 0
),
tick0 AS (
  SELECT 'tick0' AS section, hurl AS k, 200 AS status,
         CAST(NULL AS VARCHAR) AS ctype, md5(hb) AS md5,
         CAST(strlen(hb) AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS src,
         '1' AS text, CAST(NULL AS VARCHAR) AS err
  FROM hbody WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'tick0', k, status, NULL, NULL, CAST(NULL AS BIGINT), NULL,
         attempts, err
  FROM http_fail
),
tick1 AS (
  -- the incremental poll fetches ONLY what tick 0 did not mark ok:
  -- the odd (new) URLs plus the two quarantine retries
  SELECT 'tick1' AS section, hurl AS k, 200 AS status,
         CAST(NULL AS VARCHAR) AS ctype, md5(hb) AS md5,
         CAST(strlen(hb) AS BIGINT) AS n, CAST(NULL AS VARCHAR) AS src,
         '1' AS text, CAST(NULL AS VARCHAR) AS err
  FROM hbody WHERE doc_id % 2 = 1
  UNION ALL
  SELECT 'tick1', k, status, NULL, NULL, CAST(NULL AS BIGINT), NULL,
         attempts, err
  FROM http_fail
)
SELECT * FROM recs
UNION ALL SELECT * FROM doc_sec
UNION ALL SELECT * FROM wds_sec
UNION ALL SELECT * FROM http_sec
UNION ALL SELECT * FROM range_sec
UNION ALL SELECT * FROM tick0
UNION ALL SELECT * FROM tick1
ORDER BY section, k
"""


@register(
    "crawl_corpus_family",
    _ORACLE,
    doc="Crawl ingestion end-to-end under the hash gate (module doc): "
    "rec = WARC framing + HTTP envelope split + quarantine; doc = "
    "HTML->text extraction + unicode cleanup + host provenance; wds = "
    "WebDataset delivery round trip (text byte-identity + signed "
    "doc_id inversion); http/httprange/tick0/tick1 = the HTTP manifest "
    "source's one-shot, Range-window and incremental-poll paths over a "
    "deterministic fake transport (fetched bytes re-derived from URLs "
    "in SQL). Fixture derived from documents + a fixed adversarial "
    "archive; the real read_warc/warc_to_corpus/write_wds_shards/"
    "read_corpus/HttpManifestSource/incremental_fetch operators run "
    "unmodified.",
)
def crawl_corpus_family(spark, sf_dir):
    # The sections' EAGER side work is independent (tick_out's two state
    # ticks — fresh mkdtemp state per call; wds_out's shard write; the
    # http/httprange fetches), so build them from a small thread pool
    # (guide §2.6: overlap independent jobs). Submission is LONGEST
    # FIRST (round 13): pool.map in section order started tick — the
    # critical path, two sequential state jobs — last, serializing it
    # behind the cheap plan builds; starting tick and the wds write
    # immediately puts the whole build under the tick's wall time.
    # Results are unchanged: each thunk returns the same frame it
    # returned sequentially, and the union is assembled in section
    # order regardless of completion order.
    from concurrent.futures import ThreadPoolExecutor

    sections = crawl_corpus_sections(spark, sf_dir)
    cost_rank = {"tick": 0, "wds": 1, "http": 2, "httprange": 3}
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = {
            name: pool.submit(thunk)
            for name, thunk in sorted(
                sections, key=lambda sec: cost_rank.get(sec[0], len(cost_rank))
            )
        }
        parts = [futs[name].result() for name, _ in sections]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # materialization boundary before the global sort (round 13, the
    # text_profile/governance precedent): the range sort's SAMPLING pass
    # re-executes its child, so the non-checkpointed section work (doc's
    # md5/octet_length projections, the wds read-back join) ran TWICE
    # per family execution. With the boundary the union runs once into
    # shuffle files and sampling reads those.
    return out.repartition("section", "k").orderBy("section", "k")


def crawl_corpus_sections(spark, sf_dir):
    """The family's section breakdown as an ordered ``[(name, thunk)]``
    — each thunk builds and returns ONE section's DataFrame, with that
    section's eager side work (the WDS shard write, the incremental
    state ticks) inside the thunk so bench.py's per-section timing
    attributes it to the section that pays it (VERDICT r8 #4: the
    family is the most expensive headline query and a 7-stage chain; a
    regression inside one stage was invisible in the single total).
    ``crawl_corpus_family`` is exactly the union of these sections."""
    from kafka_connect_ftp_spark.ingest.corpus import read_corpus
    from kafka_connect_ftp_spark.ingest.warc import read_warc, warc_to_corpus
    from kafka_connect_ftp_spark.operators.wds import write_wds_shards

    base = _fixture_dir(spark, sf_dir)
    # The WARC parse (binaryFile scan + Arrow-batched Python parse) and
    # the HTML->text extraction feed FOUR consumers per family
    # invocation (rec_out; doc_out; the wds write; the wds join-back) —
    # as plain lineage each consumer re-parses the archives, so one
    # invocation paid the Python parse 4x and the extraction 3x
    # (guide §3.3/§5: materialize a multiply-consumed intermediate).
    # Lazy localCheckpoint = computed on first use WITHIN this
    # invocation, reused by the rest of it; every new
    # crawl_corpus_sections() call builds fresh checkpoints, so nothing
    # persists across invocations (bench.py rebuilds the sections per
    # timed sample for exactly this reason).
    rec = read_warc(spark, os.path.join(base, "warc")).localCheckpoint(eager=False)
    nulls = lambda: [  # noqa: E731
        F.lit(None).cast("int").alias("status"),
        F.lit(None).cast("string").alias("ctype"),
    ]
    rec_out = lambda: rec.select(  # noqa: E731
        F.lit("rec").alias("section"),
        F.coalesce("target_uri", F.lit("__quarantine__")).alias("k"),
        F.col("http_status").alias("status"),
        F.col("content_type").alias("ctype"),
        F.md5("payload").alias("md5"),
        F.col("payload_length").alias("n"),
        F.lit(None).cast("string").alias("src"),
        F.lit(None).cast("string").alias("text"),
        F.col("decode_error").alias("err"),
    )
    corpus = warc_to_corpus(rec, strip_html=True, clean=True).localCheckpoint(
        eager=False
    )
    doc_out = lambda: corpus.select(  # noqa: E731
        F.lit("doc").alias("section"),
        F.col("url").alias("k"),
        *nulls(),
        F.md5("text").alias("md5"),
        F.octet_length("text").cast("long").alias("n"),
        F.col("source").alias("src"),
        "text",
        F.lit(None).cast("string").alias("err"),
    )
    def wds_out():
        # one WDS sample per doc_id (= xxhash64(source, text): exact dups
        # collapse by design); min() representatives are deterministic.
        # Lazy-checkpointed (round 13): the shard write below materializes
        # uniq, and the join-back re-consumed the same groupBy lineage —
        # re-aggregating the whole corpus during the family's exec for
        # rows the write job already computed moments earlier.
        uniq = corpus.groupBy("doc_id").agg(
            F.min("url").alias("url"), F.min("text").alias("text")
        ).localCheckpoint(eager=False)
        wds_dir = os.path.join(base, "wds")
        fields = {"text": "txt", "meta": "json"}
        write_wds_shards(
            uniq.select("doc_id", "text", F.to_json(F.struct("url")).alias("meta")),
            wds_dir,
            fields=fields,
            n_shards=_fanout(spark, sf_dir),
        )
        rb = read_corpus(spark, wds_dir, fmt="wds", wds_fields=fields).select(
            F.get_json_object("meta", "$.url").alias("url"),
            F.col("doc_id").alias("rb_id"),
            F.col("text").alias("rb_text"),
        )
        return uniq.join(rb, "url").select(
            F.lit("wds").alias("section"),
            F.col("url").alias("k"),
            *nulls(),
            F.md5("rb_text").alias("md5"),
            # 1 iff the delivered text is byte-identical AND the signed
            # sample key inverted to the original xxhash64 doc_id
            ((F.col("rb_id") == F.col("doc_id")) & (F.col("rb_text") == F.col("text")))
            .cast("long")
            .alias("n"),
            F.lit(None).cast("string").alias("src"),
            F.col("rb_text").alias("text"),
            F.lit(None).cast("string").alias("err"),
        )

    # ---- HTTP manifest source: real fetch/Range/incremental-poll code
    # paths over the deterministic fake transport (module doc) ----
    from kafka_connect_ftp_spark.sources.http_source import (
        HttpManifestSource,
        incremental_fetch,
    )

    hsrc = HttpManifestSource(
        opener=fake_http_opener, retries=1,
        fetch_partitions=_fanout(spark, sf_dir),
        sleep=lambda s: None,
    )
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    doc_urls = docs.select(
        F.concat(F.lit(_HTTP_URL_PRE), F.col("doc_id")).alias("url"),
        "doc_id",
    )
    fail_urls = spark.createDataFrame(
        [(_GONE_HTTP,), (_DOWN_HTTP,)], "url string"
    )
    man_all = doc_urls.select("url").unionByName(fail_urls)

    def http_section(fetched, name, *, key=None):
        return fetched.select(
            F.lit(name).alias("section"),
            (key if key is not None else F.col("url")).alias("k"),
            F.col("status"),
            F.lit(None).cast("string").alias("ctype"),
            F.md5("content").alias("md5"),
            F.col("length").alias("n"),
            F.lit(None).cast("string").alias("src"),
            F.col("attempts").cast("string").alias("text"),
            F.col("fetch_error").alias("err"),
        )

    # http/httprange fetch EAGERLY inside their thunks (round 13): as
    # plain lineage their fetches executed inside the family's final
    # union job, serialized after the build; checkpointed here they run
    # on the section pool, overlapped with the tick and wds jobs (guide
    # §2.6), and the union's exec just reads the blocks. Fresh per
    # invocation — nothing survives a crawl_corpus_sections() call.
    http_out = lambda: http_section(  # noqa: E731
        hsrc.fetch(spark, man_all).localCheckpoint(), "http"
    )

    def range_out():
        windows = doc_urls.filter(F.col("doc_id") % 7 == 0).select(
            "url", F.lit(2).alias("off"), F.lit(5).alias("ln")
        )
        return http_section(
            hsrc.fetch(
                spark, windows, offset_col="off", length_col="ln"
            ).localCheckpoint(),
            "httprange",
            key=F.concat(F.col("url"), F.lit("#2+5")),
        )

    def tick_out():
        # incremental poll: fresh per-call state (the query must be
        # idempotent across invocations), two ticks within the call —
        # tick 0 sees the even half + the two failing URLs, tick 1 sees
        # the full manifest and must fetch ONLY the new (odd) URLs +
        # quarantine retries (change detection, append-only manifest)
        state_dir = tempfile.mkdtemp(prefix="crawl_http_state_")
        man0 = (
            doc_urls.filter(F.col("doc_id") % 2 == 0).select("url").unionByName(fail_urls)
        )
        t0 = incremental_fetch(spark, hsrc, man0, state_dir)
        t1 = incremental_fetch(spark, hsrc, man_all, state_dir)
        return http_section(t0, "tick0").unionByName(http_section(t1, "tick1"))

    return [
        ("rec", rec_out),
        ("doc", doc_out),
        ("wds", wds_out),
        ("http", http_out),
        ("httprange", range_out),
        ("tick", tick_out),
    ]
