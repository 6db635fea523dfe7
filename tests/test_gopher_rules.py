"""Gopher doc-level quality rules (operators/gopher_rules.py): each
rule pinned by a hand-built page, NULL/empty handling, plan shape."""

from __future__ import annotations

from kafka_connect_ftp_spark.operators.gopher_rules import gopher_quality_signals

_PROSE = "the cat and the dog have to be friends with all of that yard"
_SYMBOLS = "the tags # # # and more # of that # with... listing #"
_BULLETS = "- item one of the list\n- item two with more\n* item three\nthe only prose line have that"
_ELLIPSIS = "the preview of that cuts off...\nanother teaser to be seen…\nthe full line stays with that"
_NUMERIC = "the 123 456 789 000 111 222 333 444 555 666 of that"
_NOSTOP = "purple elephants juggle quietly beneath seventeen marble arches"


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in gopher_quality_signals(df).collect()}


def test_each_rule_fires(spark):
    rows = _rows(spark, [_PROSE, _SYMBOLS, _BULLETS, _ELLIPSIS, _NUMERIC, _NOSTOP, None])
    prose = rows[0]
    assert prose.gopher_keep
    assert prose.g_symbol_ratio == 0.0 and prose.g_alpha_frac == 1.0
    assert prose.g_stop_hits >= 2

    sym = rows[1]  # 6 '#' + one '...' over 12 words = 7/12 > 0.1
    assert sym.g_symbol_ratio > 0.1 and not sym.gopher_keep

    bul = rows[2]  # 3 of 4 non-blank lines are bullets = 0.75 <= 0.9 keeps;
    assert bul.g_bullet_frac == 0.75 and bul.gopher_keep

    ell = rows[3]  # 2 of 3 lines end in ellipsis > 0.3
    assert ell.g_ellipsis_frac > 0.3 and not ell.gopher_keep

    num = rows[4]  # 3 alphabetic of 13 words < 0.8
    assert num.g_alpha_frac < 0.8 and not num.gopher_keep

    nostop = rows[5]
    assert nostop.g_stop_hits == 0 and not nostop.gopher_keep

    empty = rows[6]  # NULL text
    assert empty.g_alpha_frac == 0.0 and not empty.gopher_keep


def test_bullet_page_rejected_at_paper_threshold(spark):
    page = "\n".join("- bullet line number %d" % i for i in range(10))
    rows = _rows(spark, [page])
    assert rows[0].g_bullet_frac == 1.0 and not rows[0].gopher_keep


def test_plan_is_jvm_side_no_shuffle(spark):
    df = spark.createDataFrame([(1, _PROSE)], "doc_id long, text string")
    plan = (
        gopher_quality_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_stopword_rule_is_case_insensitive(spark):
    # round-7 review finding: all-caps prose is still running prose
    rows = _rows(spark, ["THE BOARD AND THE COMMITTEE HAVE TO BE THERE WITH US TODAY NOW"])
    assert rows[0].g_stop_hits >= 2 and rows[0].gopher_keep
