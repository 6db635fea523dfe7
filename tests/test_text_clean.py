"""Unicode cleanup (operators/text_clean.py): control/invisible-char
stripping stays JVM-side; NFKC is the Arrow-batched stdlib slow path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.text_clean import clean_text, nfkc_normalize


def _one(spark, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(clean_text("t").alias("c")).first().c


def test_control_chars_stripped_tab_newline_kept(spark):
    assert _one(spark, "a\x00b\x08c\td\ne\x1ff\x7fg") == "ab\x08c\td\ne\x1ff\x7fg".replace(
        "\x08", ""
    ).replace("\x1f", "").replace("\x7f", "")
    assert _one(spark, "keep\tthis\nshape") == "keep\tthis\nshape"
    # the C1 block goes too — except NEL, which is a line break
    assert _one(spark, "x\x85y\x9fz") == "x\nyz"


def test_line_endings_normalize_and_blank_runs_bound(spark):
    assert _one(spark, "a\r\nb\rc\nd") == "a\nb\nc\nd"
    assert _one(spark, "p1\n\n\n\n\np2") == "p1\n\np2"
    assert _one(spark, "  \n padded \n\n ") == "padded"


def test_invisible_chars_removed(spark):
    # zero-width space, RTL override (the invisible-text/bidi vector), BOM
    assert _one(spark, "he​llo") == "hello"
    assert _one(spark, "safe‮txt.exe") == "safetxt.exe"
    assert _one(spark, "﻿doc") == "doc"


def test_null_passthrough_and_jvm_only_plan(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(clean_text("t").alias("c")).first().c is None
    plan = (
        spark.range(5)
        .selectExpr("cast(id as string) as t")
        .select(clean_text("t").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pure codegen projection: no Python evaluation, no shuffle
    assert "MapInPandas" not in plan and "Exchange" not in plan


def test_nfkc_compatibility_folding(spark):
    rows = [(0, "ﬁne"), (1, "Ａ１"), (2, "①"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in nfkc_normalize(df).collect()}
    assert got == {0: "fine", 1: "A1", 2: "1", 3: None}
    # NFC leaves compatibility forms alone
    nfc = {r.doc_id: r.text for r in nfkc_normalize(df, form="NFC").collect()}
    assert nfc[0] == "ﬁne" and nfc[2] == "①"
    # schema and other columns pass through untouched
    assert nfkc_normalize(df).schema == df.schema


def test_nfkc_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="form must be"):
        nfkc_normalize(df, form="NFX")
    with pytest.raises(ValueError, match="not found"):
        nfkc_normalize(df, "body")


def test_clean_then_profile_composition(spark):
    # the intended position: cleanup before the gates, over real data
    from kafka_connect_ftp_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents")["documents"]
    dirty = docs.withColumn("text", F.concat(F.lit("﻿​"), "text", F.lit("\r\n")))
    cleaned = dirty.withColumn("text", clean_text("text"))
    orig = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {r.doc_id: r.text for r in cleaned.select("doc_id", "text").collect()}
    assert got == {k: v.strip() for k, v in orig.items()}


def test_warc_clean_composition(spark, tmp_path):
    from tests.test_warc import _http, _record
    from kafka_connect_ftp_spark.ingest.warc import read_warc, warc_to_corpus

    rec = _record(
        "response",
        _http("﻿dirty\r\nbo​dy\x00".encode()),
        uri="https://c.example/p",
    )
    (tmp_path / "c.warc").write_bytes(rec)
    docs = warc_to_corpus(read_warc(spark, str(tmp_path)), clean=True).collect()
    assert len(docs) == 1 and docs[0].text == "dirty\nbody"


def test_zwj_zwnj_preserved_for_script_correctness(spark):
    # emoji ZWJ sequence stays one grapheme; Persian ZWNJ spelling intact
    fam = "\U0001F468‍\U0001F469‍\U0001F467"
    assert _one(spark, f"a {fam} b") == f"a {fam} b"
    assert _one(spark, "می‌خواهم") == "می‌خواهم"


def test_line_separator_controls_become_newlines_not_deletions(spark):
    assert _one(spark, "page one\x0cpage two") == "page one\npage two"
    assert _one(spark, "l1\x85l2 l3 l4") == "l1\nl2\nl3\nl4"


def test_blank_lines_with_stray_spaces_still_collapse(spark):
    assert _one(spark, "p1\n \n\t\n \np2") == "p1\n\np2"


def test_unicode_whitespace_trimmed(spark):
    assert _one(spark, "  Hello　") == "Hello"


def test_nfkc_rejects_non_string_column(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must be string"):
        nfkc_normalize(df, "doc_id")
