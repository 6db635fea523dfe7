"""WARC reader (ingest/warc.py): spec-shaped synthetic archives — plain
and record-per-gzip-member layouts, HTTP envelope splitting, quarantine
on corrupt framing, and the corpus projection."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.ingest.warc import read_warc, warc_to_corpus


def _record(wtype: str, payload: bytes, uri: str | None = None, rid: str = "<urn:uuid:1>") -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: 2024-01-02T03:04:05Z",
    ]
    if uri:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


@pytest.fixture()
def warc_dir(tmp_path):
    info = _record("warcinfo", b"software: test\r\n")
    r1 = _record(
        "response",
        _http(b"hello crawl one", 200),
        uri="https://a.example.com/page1",
        rid="<urn:uuid:r1>",
    )
    req = _record(
        "request", b"GET /page1 HTTP/1.1\r\n",
        uri="https://a.example.com/page1", rid="<urn:uuid:req>",
    )
    r2 = _record(
        "response",
        _http(b"second doc body", 200, "text/plain"),
        uri="https://b.example.org/x",
        rid="<urn:uuid:r2>",
    )
    r404 = _record(
        "response",
        _http(b"not found", 404),
        uri="https://a.example.com/missing",
        rid="<urn:uuid:r404>",
    )
    (tmp_path / "plain.warc").write_bytes(info + r1 + req + r404)
    # Common Crawl layout: each record its own gzip member
    members = b"".join(gzip.compress(r) for r in (info, r2))
    (tmp_path / "members.warc.gz").write_bytes(members)
    return str(tmp_path)


def test_reads_both_layouts_and_splits_http(spark, warc_dir):
    rows = read_warc(spark, warc_dir + "/*").collect()
    assert len(rows) == 6
    assert all(r.decode_error is None for r in rows)
    by_id = {r.record_id: r for r in rows}
    assert len(by_id) == 5  # the two warcinfo records share the default rid
    r1 = by_id["<urn:uuid:r1>"]
    assert r1.warc_type == "response"
    assert r1.http_status == 200
    assert r1.content_type == "text/html"
    assert bytes(r1.payload) == b"hello crawl one"  # HTTP envelope stripped
    assert r1.payload_length == len(b"hello crawl one")
    assert r1.target_uri == "https://a.example.com/page1"
    assert r1.warc_date == "2024-01-02T03:04:05Z"
    r2 = by_id["<urn:uuid:r2>"]
    assert r2.http_status == 200 and bytes(r2.payload) == b"second doc body"
    assert r2.src_file.endswith("members.warc.gz")
    # request records keep their payload verbatim, no status
    req = [r for r in rows if r.warc_type == "request"][0]
    assert req.http_status is None and bytes(req.payload).startswith(b"GET /page1")
    assert by_id["<urn:uuid:r404>"].http_status == 404


def test_corpus_projection_keeps_2xx_with_host_source(spark, warc_dir):
    docs = warc_to_corpus(read_warc(spark, warc_dir + "/*")).collect()
    assert {r.text for r in docs} == {"hello crawl one", "second doc body"}
    by_text = {r.text: r for r in docs}
    assert by_text["hello crawl one"].source == "a.example.com"
    assert by_text["second doc body"].source == "b.example.org"
    # content-stable id convention: xxhash64(source, text)
    one = by_text["hello crawl one"]
    expect = (
        spark.range(1)
        .select(F.xxhash64(F.lit("a.example.com"), F.lit("hello crawl one")))
        .first()[0]
    )
    assert one.doc_id == expect


def test_corrupt_file_quarantines_clean_files_survive(spark, warc_dir, tmp_path):
    import gzip as gz

    (tmp_path / "bad_magic.warc").write_bytes(b"NOTAWARC/1.0\r\n\r\n")
    truncated = _record("response", _http(b"full body here"), uri="http://x/a")
    (tmp_path / "truncated.warc").write_bytes(truncated[: len(truncated) - 20])
    good_then_bad = gz.compress(
        _record("response", _http(b"ok"), uri="http://x/ok", rid="<urn:uuid:ok>")
    ) + b"\x1f\x8b\x08CORRUPTMEMBER"
    (tmp_path / "mixed.warc.gz").write_bytes(good_then_bad)

    rows = read_warc(spark, str(tmp_path) + "/*").collect()
    errs = {r.src_file.rsplit("/", 1)[-1]: r for r in rows if r.decode_error}
    assert "bad_magic.warc" in errs and "magic" in errs["bad_magic.warc"].decode_error
    assert "truncated.warc" in errs and "truncated" in errs["truncated.warc"].decode_error
    assert "mixed.warc.gz" in errs  # the corrupt second member
    # the good record of mixed.warc.gz still flows
    ok = [r for r in rows if r.record_id == "<urn:uuid:ok>"]
    assert len(ok) == 1 and bytes(ok[0].payload) == b"ok"
    # clean files in the same scan are untouched
    assert sum(1 for r in rows if r.decode_error is None and r.warc_type == "response") >= 4
    # quarantined docs never reach the corpus projection
    corpus = warc_to_corpus(read_warc(spark, str(tmp_path) + "/*"))
    assert corpus.filter(F.col("text").contains("CORRUPT")).count() == 0


def test_malformed_utf8_body_becomes_replacement_not_error(spark, tmp_path):
    body = b"good text \xff\xfe bad bytes"
    rec = _record("response", _http(body), uri="http://u/x", rid="<urn:uuid:u>")
    (tmp_path / "u.warc").write_bytes(rec)
    docs = warc_to_corpus(read_warc(spark, str(tmp_path) + "/u.warc")).collect()
    assert len(docs) == 1
    assert "good text" in docs[0].text and "�" in docs[0].text


def test_full_curation_operators_run_on_warc_corpus(spark, warc_dir):
    # the point of the canonical projection: documents-grain operators
    # run unchanged on a crawl dump
    from kafka_connect_ftp_spark.operators.repetition import repetition_signals
    from kafka_connect_ftp_spark.operators.text_dedup import exact_dedup

    docs = warc_to_corpus(read_warc(spark, warc_dir + "/*"))
    rep = repetition_signals(docs).collect()
    assert len(rep) == 2
    dup = exact_dedup(docs, "doc_id", ["text"])
    assert dup.count() == 2


def test_malformed_target_uri_never_aborts_scan(spark, tmp_path):
    # real Common Crawl dumps contain URIs java.net.URI rejects
    # (unencoded spaces); under ANSI mode parse_url would THROW and fail
    # the whole job — the projection must use try_parse_url instead
    bad = _record(
        "response",
        _http(b"space uri body"),
        uri="https://a b.example/x y",
        rid="<urn:uuid:sp>",
    )
    (tmp_path / "bad_uri.warc").write_bytes(bad)
    docs = warc_to_corpus(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    assert docs[0].text == "space uri body" and docs[0].source == "unknown"


def test_read_corpus_warc_rejects_inapplicable_args(spark, warc_dir):
    from kafka_connect_ftp_spark.ingest.corpus import read_corpus

    with pytest.raises(ValueError, match="do not apply"):
        read_corpus(spark, warc_dir, fmt="warc", id_field="record_id")
    with pytest.raises(ValueError, match="do not apply"):
        read_corpus(spark, warc_dir, fmt="warc", source="cc-2024-30")
    with pytest.raises(ValueError, match="do not apply"):
        read_corpus(spark, warc_dir, fmt="warc", text_field="body")
    # defaults still work
    assert read_corpus(spark, warc_dir, fmt="warc").count() == 2


def test_read_corpus_warc_strip_and_clean_knobs(spark, tmp_path):
    from kafka_connect_ftp_spark.ingest.corpus import read_corpus

    rec = _record(
        "response",
        _http(b"<html><body><p>hi&nbsp;there\xe2\x80\x8b!</p></body></html>"),
        uri="https://c.example.net/p",
    )
    (tmp_path / "one.warc").write_bytes(rec)
    raw = read_corpus(spark, str(tmp_path), fmt="warc").first().text
    assert "<p>" in raw
    cooked = read_corpus(
        spark, str(tmp_path), fmt="warc", warc_strip_html=True, warc_clean=True
    ).first().text
    # tags stripped, &nbsp; decoded + collapsed, zero-width removed
    assert cooked == "hi there!"
    with pytest.raises(ValueError, match="only apply"):
        read_corpus(spark, str(tmp_path), fmt="jsonl", warc_strip_html=True)


# -- property: serialize -> parse round-trip (pure Python, no Spark) ---------


def test_warc_roundtrip_property():
    """Random records (payloads may contain CRLFs, WARC magic, gzip
    magic — every framing hazard) serialize with _record and parse back
    exactly, in both the plain and the record-per-gzip-member layout."""
    from tests.conftest import prop_examples
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_ftp_spark.ingest.warc import (
        _iter_gzip_members,
        _parse_warc_stream,
    )

    payloads = st.binary(min_size=0, max_size=200)
    wtypes = st.sampled_from(["response", "request", "metadata", "warcinfo"])
    records = st.lists(st.tuples(wtypes, payloads), min_size=1, max_size=6)

    @settings(max_examples=prop_examples(100), deadline=None)
    @given(records)
    def check(recs):
        raw = b"".join(
            _record(w, p, uri=f"https://h.example/{i}", rid=f"<urn:uuid:{i}>")
            for i, (w, p) in enumerate(recs)
        )
        parsed = list(_parse_warc_stream(raw))
        assert [h["warc-type"] for h, _ in parsed] == [w for w, _ in recs]
        assert [p for _, p in parsed] == [p for _, p in recs]

        gz = b"".join(
            gzip.compress(_record(w, p, uri=f"https://h.example/{i}"))
            for i, (w, p) in enumerate(recs)
        )
        members = list(_iter_gzip_members(gz))
        assert len(members) == len(recs)
        reparsed = [r for m in members for r in _parse_warc_stream(m)]
        assert [p for _, p in reparsed] == [p for _, p in recs]

    check()


def test_write_warc_round_trips_through_read_warc(spark, tmp_path):
    from kafka_connect_ftp_spark.ingest.warc import write_warc

    pages = spark.createDataFrame(
        [(f"http://w.example/p{i}", f"<p>body {i}</p>") for i in range(20)],
        "url string, body string",
    )
    out = str(tmp_path / "export")
    paths = write_warc(pages, out, n_shards=3)
    assert len(paths) == 3
    back = read_warc(spark, out)
    rows = {r.target_uri: r for r in back.collect()}
    assert len(rows) == 20 and all(r.decode_error is None for r in rows.values())
    r = rows["http://w.example/p7"]
    assert r.warc_type == "response" and r.http_status == 200
    assert bytes(r.payload) == b"<p>body 7</p>"
    assert r.content_type == "text/html; charset=utf-8"


def test_write_warc_deterministic_and_plain_layout(spark, tmp_path):
    import hashlib

    from kafka_connect_ftp_spark.ingest.warc import write_warc

    pages = spark.createDataFrame(
        [(f"http://w.example/p{i}", f"<p>b{i}</p>") for i in range(12)],
        "url string, body string",
    )

    def digest(d):
        h = hashlib.sha256()
        for p in sorted(__import__("os").listdir(d)):
            with open(f"{d}/{p}", "rb") as f:
                h.update(p.encode() + f.read())
        return h.hexdigest()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(pages, a, n_shards=2)
    write_warc(pages.repartition(5), b, n_shards=2)  # input layout irrelevant
    assert digest(a) == digest(b)
    # plain (non-gzip) concatenated layout reads back identically
    plain = str(tmp_path / "plain")
    write_warc(pages, plain, n_shards=1, gzip_members=False)
    got = {r.target_uri: bytes(r.payload) for r in read_warc(spark, plain).collect()}
    assert got == {f"http://w.example/p{i}": f"<p>b{i}</p>".encode() for i in range(12)}


def test_write_warc_null_url_fails_loudly(spark, tmp_path):
    from kafka_connect_ftp_spark.ingest.warc import write_warc

    bad = spark.createDataFrame([(None, "x")], "url string, body string")
    with pytest.raises(Exception, match="NULL url"):
        write_warc(bad, str(tmp_path / "nul"), n_shards=1)
