"""C4 line/page cleaning rules (operators/c4_filter.py): each rule
pinned by a hand-built document, plan stays JVM-side."""

from __future__ import annotations

import pytest

from kafka_connect_ftp_spark.operators.c4_filter import c4_clean, c4_flags

_GOOD = (
    "This first sentence is perfectly fine.\n"
    "still good? yes - a second line ends properly!\n"
    'He said "quoted lines count too."\n'
    "navstub\n"                       # < 3 words, no terminal punct
    "Please enable JavaScript to continue.\n"  # javascript marker
    "a trailing line without punctuation"
)
_LOREM = "A fine sentence here. Another one. And a third. lorem ipsum dolor"
_BRACE = "A fine sentence here. Another one. And a third. function() { }"
_SHORT = "Only one sentence survives the line rules.\nnope\nalso not this"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, _GOOD), (2, _LOREM), (3, _BRACE), (4, _SHORT), (5, None)],
        "doc_id long, text string",
    )


def test_line_rules_and_page_rules(spark, docs):
    # min_sentences=3 here pins the line rules + the non-sentence page
    # rules; the paper-default 5-sentence threshold is pinned separately
    rows = {r.doc_id: r for r in c4_flags(docs, min_sentences=3).collect()}
    g = rows[1]
    assert g.c4_n_lines == 6 and g.c4_kept_lines == 3
    assert g.c4_text == (
        "This first sentence is perfectly fine.\n"
        "still good? yes - a second line ends properly!\n"
        'He said "quoted lines count too."'
    )
    # sentence proxy counts terminal marks in the RETAINED text:
    # '.', '?', '!', '.' -> 4
    assert g.c4_sentences == 4 and g.c4_keep
    # page rules reject on the RAW text even when the offending line
    # itself was dropped
    assert not rows[2].c4_keep  # lorem ipsum
    assert not rows[3].c4_keep  # curly brace
    # one retained sentence < min_sentences=3
    assert rows[4].c4_kept_lines == 1 and not rows[4].c4_keep
    # NULL text = empty page
    assert rows[5].c4_n_lines == 0 and not rows[5].c4_keep


def test_c4_clean_filters_and_rewrites_text(spark, docs):
    out = {r.doc_id: r.text for r in c4_clean(docs, min_sentences=3).collect()}
    assert set(out) == {1}
    assert out[1].startswith("This first sentence") and "JavaScript" not in out[1]


def test_default_is_paper_five_sentences(spark, docs):
    # Raffel et al. 2020 discard pages with < 5 sentences; doc 1 retains
    # 4 terminal marks, so the DEFAULT rejects it while 3 admits it
    rows = {r.doc_id: r for r in c4_flags(docs).collect()}
    assert rows[1].c4_sentences == 4 and not rows[1].c4_keep
    assert c4_flags(docs, min_sentences=3).filter("doc_id = 1").first().c4_keep


def test_knobs_and_contracts(spark, docs):
    # min_words_per_line=1 admits the quoted two-word line… and any
    # punctuated short line; min_sentences=1 keeps doc 4
    rows = {r.doc_id: r for r in c4_flags(docs, min_sentences=1).collect()}
    assert rows[4].c4_keep
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4_flags(docs, min_words_per_line=0)
    with pytest.raises(ValueError, match="min_sentences"):
        c4_flags(docs, min_sentences=-1)


def test_plan_is_jvm_side(spark, docs):
    plan = c4_flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # pure projection, fuses into the scan
