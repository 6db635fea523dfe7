"""Converter registry tests (reference X1 key styles + X2 1→N explode)."""

from __future__ import annotations

import json

import pytest

from kafka_connect_ftp_spark.ingest.converters import get_converter, to_kafka_frame
from kafka_connect_ftp_spark.ingest.model import RECORD_SCHEMA


@pytest.fixture
def records(spark):
    rows = [
        ("tails", "/tails/t0", 5, b"abc"),
        ("updates", "/updates/u0", 0, b"l1\nl2\r\nl3\n"),
    ]
    return spark.createDataFrame(rows, RECORD_SCHEMA)


def test_string_key(records):
    rows = {r.key: bytes(r.value) for r in get_converter("string_key")(records).collect()}
    assert rows == {"/tails/t0": b"abc", "/updates/u0": b"l1\nl2\r\nl3\n"}


def test_struct_key(records):
    rows = {(r.key.name, r.key.offset) for r in get_converter("struct_key")(records).collect()}
    assert rows == {("/tails/t0", 5), ("/updates/u0", 0)}


def test_csv_lines_explodes_one_to_n(records):
    rows = get_converter("csv_lines")(records).collect()
    got = [(r.key_name, r.line_no, bytes(r.value)) for r in rows]
    assert sorted(got) == [
        ("/tails/t0", 0, b"abc"),
        ("/updates/u0", 0, b"l1"),
        ("/updates/u0", 1, b"l2"),
        ("/updates/u0", 2, b"l3"),
    ]


def test_to_kafka_frame_string(records):
    rows = get_converter("nop")(records)
    out = to_kafka_frame(rows, "string_key").collect()
    assert {(r.topic, bytes(r.key).decode()) for r in out} == {
        ("tails", "/tails/t0"),
        ("updates", "/updates/u0"),
    }


def test_to_kafka_frame_struct_serializes_json(records):
    out = to_kafka_frame(records, "struct_key").collect()
    keys = {json.loads(bytes(r.key).decode())["name"] for r in out}
    assert keys == {"/tails/t0", "/updates/u0"}


def test_unknown_converter():
    with pytest.raises(KeyError):
        get_converter("nope")


def test_gunzip_decompresses_only_gzip_bodies(spark):
    import gzip

    from kafka_connect_ftp_spark.ingest.converters import get_converter

    rows = [
        ("t", "/a.gz", 0, gzip.compress(b"line1\nline2\n")),
        ("t", "/b.txt", 0, b"plain body"),
        ("t", "/c", 0, None),
    ]
    records = spark.createDataFrame(
        rows, "topic string, key_name string, key_offset long, value binary"
    )
    out = {r.key_name: (bytes(r.value) if r.value is not None else None)
           for r in get_converter("gunzip")(records).collect()}
    assert out == {"/a.gz": b"line1\nline2\n", "/b.txt": b"plain body", "/c": None}

    # a truncated gzip member passes through as raw bytes instead of
    # failing the task — an unraisable record would poison every
    # subsequent tick (state never advances past it) — but is tagged
    # decode_error=true so the quarantine is observable
    corrupt = gzip.compress(b"payload")[:-5]
    bad = spark.createDataFrame(
        [("t", "/bad.gz", 0, corrupt), ("t", "/ok.gz", 0, gzip.compress(b"fine"))],
        "topic string, key_name string, key_offset long, value binary",
    )
    got = {
        r.key_name: (bytes(r.value), r.decode_error)
        for r in get_converter("gunzip")(bad).collect()
    }
    assert got == {"/bad.gz": (corrupt, True), "/ok.gz": (b"fine", False)}

    # a quarantined body must survive csv_lines UN-SPLIT with its original
    # bytes (decoding raw gzip as UTF-8 would mangle it unreplayably);
    # clean bodies still explode into flagged-false lines
    composed = get_converter("csv_lines")(get_converter("gunzip")(bad))
    rows = {
        (r.key_name, r.line_no): (bytes(r.value), r.decode_error)
        for r in composed.collect()
    }
    assert rows == {
        ("/bad.gz", 0): (corrupt, True),
        ("/ok.gz", 0): (b"fine", False),
    }

    # composes with csv_lines for the gzipped-log-drop case
    lines = get_converter("csv_lines")(get_converter("gunzip")(records))
    got = {(r.key_name, r.line_no, bytes(r.value)) for r in lines.collect()}
    assert got == {
        ("/a.gz", 0, b"line1"),
        ("/a.gz", 1, b"line2"),
        ("/b.txt", 0, b"plain body"),
    }
