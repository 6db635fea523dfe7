"""Corpus readers (ingest/corpus.py): JSONL/CSV/text/parquet corpora land
in the canonical documents frame and flow through documents-grain
operators unchanged."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.ingest.corpus import read_corpus

DOCS = [
    {"text": "the quick brown fox", "lang": "en"},
    {"text": "le renard brun rapide", "lang": "fr"},
    {"text": "the quick brown fox", "lang": "en"},  # exact duplicate
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(json.dumps(d) for d in DOCS))
    return str(p)


def test_jsonl_canonical_shape_and_passthrough(spark, jsonl_dir):
    df = read_corpus(spark, jsonl_dir, "jsonl")
    assert df.columns[:3] == ["doc_id", "text", "source"]
    rows = df.collect()
    assert len(rows) == 3
    assert {r.lang for r in rows} == {"en", "fr"}  # metadata passes through
    assert all(r.source.endswith("part-0.jsonl") for r in rows)


def test_doc_id_is_content_stable_and_dedupable(spark, jsonl_dir):
    df = read_corpus(spark, jsonl_dir, "jsonl")
    # identical (source, text) -> identical id: exact dupes collide BY DESIGN
    assert df.select("doc_id").distinct().count() == 2
    # stable under repartitioning (monotonically_increasing_id is not)
    again = read_corpus(spark, jsonl_dir, "jsonl").repartition(7)
    assert {r.doc_id for r in df.collect()} == {r.doc_id for r in again.collect()}


def test_trusted_upstream_id_kept(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(
        "\n".join(json.dumps({"my_id": i, "body": f"doc {i}"}) for i in range(3))
    )
    df = read_corpus(spark, str(p), "jsonl", text_field="body", id_field="my_id")
    assert sorted(r.doc_id for r in df.collect()) == [0, 1, 2]
    assert {r.text for r in df.collect()} == {"doc 0", "doc 1", "doc 2"}


def test_csv_and_text_formats(spark, tmp_path):
    c = tmp_path / "csv"
    c.mkdir()
    (c / "a.csv").write_text("text,tag\nhello world,x\nbye now,y\n")
    df = read_corpus(spark, str(c), "csv")
    assert {r.text for r in df.collect()} == {"hello world", "bye now"}

    t = tmp_path / "txt"
    t.mkdir()
    (t / "a.txt").write_text("line one\nline two\n")
    per_line = read_corpus(spark, str(t), "text")
    assert {r.text for r in per_line.collect()} == {"line one", "line two"}
    whole = read_corpus(spark, str(t), "text", per_line=False)
    [row] = whole.collect()
    assert row.text == "line one\nline two\n"


def test_orc_format(spark, tmp_path):
    p = str(tmp_path / "orc")
    spark.createDataFrame(
        [(i, f"body {i}", "tagged") for i in range(4)], "my_id long, body string, tag string"
    ).write.orc(p)
    df = read_corpus(spark, p, "orc", text_field="body", id_field="my_id")
    assert sorted(r.doc_id for r in df.collect()) == [0, 1, 2, 3]
    assert {r.tag for r in df.collect()} == {"tagged"}


def test_documents_grain_operators_run_on_external_corpus(spark, jsonl_dir):
    # the point of the canonical shape: existing operators run unchanged
    from kafka_connect_ftp_spark.operators.pii import scrub
    from kafka_connect_ftp_spark.operators.splits import assign_splits

    df = read_corpus(spark, jsonl_dir, "jsonl")
    out = assign_splits(scrub(df), {"train": 0.9, "val": 0.1})
    assert set(out.columns) >= {"doc_id", "text", "split", "has_pii"}
    assert out.count() == 3


def test_conflicting_text_column_preserved_as_metadata(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps({"body": "payload", "text": "meta"}))
    df = read_corpus(spark, str(p), "jsonl", text_field="body")
    [row] = df.collect()
    assert row.text == "payload" and row.orig_text == "meta"


def test_string_upstream_ids_hashed_not_cast(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(
        "\n".join(json.dumps({"uid": u, "text": f"t{u}"}) for u in ("doc-001", "doc-002"))
    )
    df = read_corpus(spark, str(p), "jsonl", id_field="uid")
    rows = df.collect()  # must not raise CAST_INVALID_INPUT mid-job
    assert len({r.doc_id for r in rows}) == 2
    again = read_corpus(spark, str(p), "jsonl", id_field="uid").collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}


def test_upstream_source_column_preserved_as_orig_source(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps({"text": "payload", "source": "crawl-7"}))
    df = read_corpus(spark, str(p), "jsonl", source="mycorpus")
    [row] = df.collect()
    assert row.source == "mycorpus" and row.orig_source == "crawl-7"


def test_upstream_doc_id_requires_explicit_claim(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps({"text": "t", "doc_id": 42}))
    with pytest.raises(ValueError, match="doc_id"):
        read_corpus(spark, str(p), "jsonl")
    [row] = read_corpus(spark, str(p), "jsonl", id_field="doc_id").collect()
    assert row.doc_id == 42


def test_corrupt_jsonl_lines_quarantined_not_silent(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"text": "good"}\n{broken json!!\n{"text": "also good"}\n{other broken}\n'
    )
    df = read_corpus(spark, str(p), "jsonl")
    rows = df.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r.decode_error]
    good = sorted(r.text for r in rows if not r.decode_error)
    assert good == ["also good", "good"]
    assert {r.corrupt_record for r in bad} == {"{broken json!!", "{other broken}"}
    assert all(r.text is None for r in bad)  # flagged, original line preserved
    # DISTINCT corrupt lines must get distinct ids (xxhash64 skips NULL
    # text — the raw line is hashed instead)
    assert len({r.doc_id for r in bad}) == 2


def test_quarantine_only_projections_dont_crash(spark, tmp_path):
    # regression: with spark.read.json, pruning a query down to only the
    # corrupt-record column throws AnalysisException (UNSUPPORTED_FEATURE.
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN) — which is exactly the shape of
    # the documented alerting (filter count) and dead-letter (raw-line
    # select) patterns. The from_json-based reader must support both.
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text('{"text": "good"}\n{broken json!!\n')
    df = read_corpus(spark, str(p), "jsonl")
    assert df.filter("decode_error").count() == 1  # alerting pattern
    dead = df.filter("decode_error").select("corrupt_record").collect()
    assert [r.corrupt_record for r in dead] == ["{broken json!!"]  # replay pattern


def test_jsonl_explicit_schema_skips_inference(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    # the whitespace-only lines include a tab-only one: trim() would miss
    # it (strips only spaces) and it would become a NULL-text ghost row
    (p / "a.jsonl").write_text('{"text": "doc", "lang": "en"}\n{nope\n\n   \n\t\n')
    df = read_corpus(spark, str(p), "jsonl", schema="text string, lang string")
    rows = df.collect()
    assert len(rows) == 2  # blank/whitespace lines skipped like spark.read.json
    good = [r for r in rows if not r.decode_error]
    assert [(r.text, r.lang) for r in good] == [("doc", "en")]
    bad = [r for r in rows if r.decode_error]
    assert [r.corrupt_record for r in bad] == ["{nope"]


def test_clean_jsonl_still_carries_decode_error_column(spark, jsonl_dir):
    # the quarantine flag is schema-stable: filters on it must not break
    # on the first corpus that happens to be clean
    df = read_corpus(spark, jsonl_dir, "jsonl")
    assert "decode_error" in df.columns
    assert df.filter("decode_error").count() == 0


def test_upstream_quarantine_columns_rejected(spark, tmp_path):
    p = tmp_path / "c"
    p.mkdir()
    (p / "a.jsonl").write_text(json.dumps({"text": "t", "decode_error": False}))
    with pytest.raises(ValueError, match="decode_error"):
        read_corpus(spark, str(p), "jsonl")


def test_bad_format_and_missing_column_rejected(spark, jsonl_dir):
    with pytest.raises(ValueError, match="fmt"):
        read_corpus(spark, jsonl_dir, "xml")
    with pytest.raises(ValueError, match="not found"):
        read_corpus(spark, jsonl_dir, "jsonl", text_field="nope")
