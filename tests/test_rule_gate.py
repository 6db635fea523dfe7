"""Composed rule gate (operators/rule_gate.py): per-family column
parity with the standalone operators (the composed form is a plan
optimization, not a semantic fork) and the two-scan plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.rule_gate import rule_gate

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and that is fine.\n"
        "it has to be said with some of the usual words again and again.\n"
        "short\n"
        "a third proper sentence closes out the page with the right mark."),
    (2, "zzz qqq " * 40),                      # diversity/repetition junk
    (3, "• one\n• two\n• three\n• four\n• five"),  # bullet page
    (4, "word " * 20 + "…\nmore text trailing off…\nugh…"),
    (5, None),
    (6, ""),
    (7, "a fine sentence here. and lorem ipsum dolor follows."),
    (8, "numbers 123 456 789 0 111 222 333 444 555 666 777 888 999 000 11 22"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def composed(spark, docs):
    return rule_gate(docs, min_sentences=3).cache()


def test_c4_family_parity(spark, docs, composed):
    from kafka_connect_ftp_spark.operators.c4_filter import c4_flags

    want = {r.doc_id: r.asDict() for r in c4_flags(docs, min_sentences=3).collect()}
    got = {r.doc_id: r.asDict() for r in composed.collect()}
    for i in want:
        for c in ("c4_n_lines", "c4_kept_lines", "c4_text", "c4_sentences", "c4_keep"):
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])


def test_gopher_family_parity(spark, docs, composed):
    from kafka_connect_ftp_spark.operators.gopher_rules import gopher_quality_signals

    want = {r.doc_id: r.asDict() for r in gopher_quality_signals(docs).collect()}
    got = {r.doc_id: r.asDict() for r in composed.collect()}
    cols = (
        "g_symbol_ratio", "g_bullet_frac", "g_ellipsis_frac",
        "g_alpha_frac", "g_stop_hits", "gopher_keep",
    )
    for i in want:
        for c in cols:
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])


def test_repetition_family_parity(spark, docs, composed):
    from kafka_connect_ftp_spark.operators.repetition import repetition_signals

    want = {r.doc_id: r.asDict() for r in repetition_signals(docs).collect()}
    got = {r.doc_id: r.asDict() for r in composed.collect()}
    cols = (
        "n_tokens", "dup_token_frac", "top_2gram_frac", "top_3gram_frac",
        "top_4gram_frac", "dup_5gram_frac", "dup_10gram_frac",
    )
    for i in want:
        for c in cols:
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])


def test_quality_family_parity_on_registry_query(spark):
    # the QF family columns must equal the hash-gated registry query's
    # at sf0.001 — same thresholds, same rounding, same NULL handling
    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    want = {
        r.doc_id: r.asDict()
        for r in registry()["quality_filter_flags"].fn(spark, sf).collect()
    }
    real_docs = load_tables(spark, sf, "documents")["documents"]
    got = {r.doc_id: r.asDict() for r in rule_gate(real_docs).collect()}
    assert set(got) == set(want)
    for i in want:
        for c in ("len_ok", "word_len_ok", "diversity_ok", "top_bigram_frac", "repetition_ok"):
            assert got[i][c] == want[i][c], (i, c, got[i][c], want[i][c])
        assert got[i]["qf_keep"] == want[i]["keep"], i


def test_rule_keep_composes_and_knobs_raise(spark, docs, composed):
    rows = {r.doc_id: r for r in composed.collect()}
    for i, r in rows.items():
        # bool(): a NULL-text doc carries NULL qf flags; rule_keep is
        # still a definite False (coalesced in the operator)
        assert r.rule_keep == bool(r.qf_keep and r.c4_keep and r.gopher_keep), i
        assert r.rule_keep is not None, i
    with pytest.raises(ValueError, match="stopwords"):
        rule_gate(docs, stopwords=())
    with pytest.raises(ValueError, match="min_words_per_line"):
        rule_gate(docs, min_words_per_line=0)


def test_two_corpus_scans_only(spark, docs, tmp_path):
    # THE point of the composition: one map-side scan for the three
    # scalar families + one gram-pass scan — not five
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    on_disk = spark.read.parquet(path)
    plan = (
        rule_gate(on_disk)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 2, plan.count("FileScan parquet")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_null_id_raises(spark):
    # ADVICE r8: the standalone repetition_signals raises on a NULL id;
    # the composed gate must keep that contract rather than silently
    # emitting NULL gram signals through its left join
    bad = spark.createDataFrame(
        [(1, "fine text here."), (None, "orphan row.")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        rule_gate(bad).collect()


# ---- round 9: per-row language routing ------------------------------------

_DE_TEXT = (
    "die regierung hat heute einen neuen haushaltsplan vorgestellt.\n"
    "die opposition will den entwurf im parlament mit anträgen ändern und "
    "die debatte dürfte mehrere wochen dauern.\n"
    "viele bürger haben dazu bereits eine klare meinung geäußert."
)
_EN_TEXT = (
    "the committee published the annual report this morning.\n"
    "several members have asked to be heard before the vote and that "
    "request was granted with little debate.\n"
    "the final decision will be announced at the end of the week."
)
_EL_TEXT = (
    "η κυβέρνηση παρουσίασε σήμερα τον νέο προϋπολογισμό.\n"
    "η αντιπολίτευση θέλει να αλλάξει το σχέδιο στη βουλή;\n"
    "οι πολίτες έχουν ήδη εκφράσει τη γνώμη τους με σαφήνεια."
)


def test_routed_gate_matches_sliced_gates(spark):
    from kafka_connect_ftp_spark.operators.c4_filter import C4_LINE_END_BY_LANG
    from kafka_connect_ftp_spark.operators.gopher_rules import (
        GOPHER_ALPHA_RX,
        GOPHER_ALPHA_RX_BY_LANG,
        GOPHER_STOPWORDS_BY_LANG,
    )

    mixed = spark.createDataFrame(
        [(1, _EN_TEXT, "en"), (2, _DE_TEXT, "de"), (3, _EL_TEXT, "el"),
         (4, _DE_TEXT, "xx"), (5, None, "en"), (6, _EN_TEXT, None)],
        "doc_id long, text string, lang string",
    )
    routed = {r.doc_id: r.asDict() for r in rule_gate(mixed, lang_col="lang").collect()}
    # per-language slice parity: each row equals the SLICED gate run
    # with that language's parameters ('xx' and a NULL lang fall back
    # to the defaults — element_at(map, NULL) is NULL, coalesced)
    for doc_id, lang in ((1, "en"), (2, "de"), (3, "el"), (4, "xx"), (5, "en"), (6, "xx")):
        sliced = rule_gate(
            mixed.filter(F.col("doc_id") == doc_id).select("doc_id", "text"),
            stopwords=GOPHER_STOPWORDS_BY_LANG.get(lang, GOPHER_STOPWORDS_BY_LANG["en"]),
            line_end_rx=C4_LINE_END_BY_LANG.get(lang, C4_LINE_END_BY_LANG["default"]),
            alpha_rx=GOPHER_ALPHA_RX_BY_LANG.get(lang, GOPHER_ALPHA_RX),
        ).first().asDict()
        assert routed[doc_id] == sliced, (doc_id, lang)
    # the motivating scenario: German/Greek prose passes its routed
    # stopword rule but fails under the English defaults
    unrouted = {r.doc_id: r for r in rule_gate(mixed.select("doc_id", "text")).collect()}
    assert routed[2]["g_stop_hits"] >= 2 and unrouted[2].g_stop_hits < 2
    assert routed[3]["g_stop_hits"] >= 2 and unrouted[3].g_stop_hits < 2
    # Greek question mark ';' counts as a C4 line terminal once routed,
    # and the routed alpha class stops Greek words reading as non-alpha
    assert routed[3]["c4_kept_lines"] > unrouted[3].c4_kept_lines
    assert routed[3]["g_alpha_frac"] == 1.0 and unrouted[3].g_alpha_frac == 0.0
    assert routed[2]["gopher_keep"] and routed[3]["gopher_keep"]
    assert not unrouted[2].gopher_keep and not unrouted[3].gopher_keep


def test_routed_gate_still_two_scans(spark, tmp_path):
    mixed = spark.createDataFrame(
        [(1, _EN_TEXT, "en"), (2, _DE_TEXT, "de")],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "mixed")
    mixed.write.parquet(path)
    plan = (
        rule_gate(spark.read.parquet(path), lang_col="lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 2, plan.count("FileScan parquet")
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_routed_gate_contracts(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="single quote"):
        rule_gate(docs, lang_col="lang", line_end_rx_by_lang={"en": "[.'!]$"})
    with pytest.raises(ValueError, match="non-empty"):
        rule_gate(docs, lang_col="lang", stopwords_by_lang={"en": ()})


def test_routed_gate_unsegmented_scripts(spark):
    # review r9: zh/ja need (a) stopword lists + alpha classes of their
    # own and (b) SUBSTRING stop matching — unsegmented text has no
    # whitespace words for array_contains to hit
    from kafka_connect_ftp_spark.operators.gopher_rules import (
        GOPHER_ALPHA_RX_BY_LANG,
        GOPHER_STOPWORDS_BY_LANG,
        gopher_quality_signals,
    )

    zh = "今天的天气很好我们在公园里散步了大家都很高兴因为有说有笑一起度过了愉快的时间。"
    ja = "きょうのてんきはよくてこうえんをさんぽしたのでみんながたのしいじかんをすごしました。"
    docs = spark.createDataFrame(
        [(1, zh, "zh"), (2, ja, "ja")], "doc_id long, text string, lang string"
    )
    routed = {r.doc_id: r for r in rule_gate(docs, lang_col="lang").collect()}
    english = {r.doc_id: r for r in rule_gate(docs.select("doc_id", "text")).collect()}
    for i in (1, 2):
        assert routed[i].g_stop_hits >= 2 > english[i].g_stop_hits, i
        assert routed[i].g_alpha_frac > 0.9 and english[i].g_alpha_frac == 0.0, i
        assert routed[i].gopher_keep and not english[i].gopher_keep, i
    # parity with the standalone operator in substr mode
    for i, lang in ((1, "zh"), (2, "ja")):
        sliced = gopher_quality_signals(
            docs.filter(F.col("doc_id") == i).select("doc_id", "text"),
            stopwords=GOPHER_STOPWORDS_BY_LANG[lang],
            alpha_rx=GOPHER_ALPHA_RX_BY_LANG[lang],
            stopword_match="substr",
        ).first()
        assert routed[i].g_stop_hits == sliced.g_stop_hits, i
        assert routed[i].g_alpha_frac == sliced.g_alpha_frac, i
        assert routed[i].gopher_keep == sliced.gopher_keep, i
    with pytest.raises(ValueError, match="stopword_match"):
        gopher_quality_signals(docs, stopword_match="bogus")


# ---- round 9b continuation: ar/ko/hi routed params -------------------------

_AR_TEXT = (
    "ذهبنا اليوم إلى السوق واشترينا من الفواكه الطازجة شيئا كثيرا.\n"
    "هل تريد أن تذهب معنا إلى الحديقة في المساء؟\n"
    "كان الطقس جميلا على غير العادة وقضينا وقتا ممتعا مع الأصدقاء."
)
_KO_TEXT = (
    "오늘은 아침부터 비가 내려서 우리는 집에서 책을 읽기로 했다.\n"
    "도서관에서 빌린 소설이 아주 재미있어서 시간이 금방 지나갔다.\n"
    "저녁에는 가족과 함께 따뜻한 식사를 준비해서 먹었다."
)
_HI_TEXT = (
    "आज सुबह हम सब लोग बाजार गए और ताजा सब्जियां खरीद कर लाए।\n"
    "शाम को बच्चों ने आंगन में बैठकर अपनी किताबें पढ़ीं।\n"
    "मौसम बहुत सुहावना था और सबने मिलकर चाय पी।"
)


def test_routed_gate_ar_ko_hi(spark):
    # the three scripts that previously fell back to bare script labels:
    # arabic (word-exact stops, ؟ line terminal), korean (agglutinative
    # -> substr stop matching), hindi (word-exact stops, । danda line
    # terminal). Each passes its routed gate and fails — specifically on
    # the rule its routing fixes — under the English defaults.
    from kafka_connect_ftp_spark.operators.c4_filter import C4_LINE_END_BY_LANG
    from kafka_connect_ftp_spark.operators.gopher_rules import (
        GOPHER_ALPHA_RX_BY_LANG,
        GOPHER_STOPWORDS_BY_LANG,
        GOPHER_SUBSTR_STOPWORD_LANGS,
        gopher_quality_signals,
    )

    docs = spark.createDataFrame(
        [(1, _AR_TEXT, "ar"), (2, _KO_TEXT, "ko"), (3, _HI_TEXT, "hi")],
        "doc_id long, text string, lang string",
    )
    routed = {r.doc_id: r for r in rule_gate(docs, lang_col="lang").collect()}
    english = {r.doc_id: r for r in rule_gate(docs.select("doc_id", "text")).collect()}
    for i in (1, 2, 3):
        assert routed[i].g_stop_hits >= 2 > english[i].g_stop_hits, i
        assert routed[i].g_alpha_frac > 0.9 and english[i].g_alpha_frac == 0.0, i
        assert routed[i].gopher_keep and not english[i].gopher_keep, i
    # the script-specific line terminals: ؟ (row 1 line 2) and । (all
    # three hindi lines) count only once routed
    assert routed[1].c4_kept_lines == 3 and english[1].c4_kept_lines == 2
    assert routed[3].c4_kept_lines == 3 and english[3].c4_kept_lines == 0
    # parity with the standalone operator under each language's params
    assert "ko" in GOPHER_SUBSTR_STOPWORD_LANGS
    for i, lang in ((1, "ar"), (2, "ko"), (3, "hi")):
        sliced = gopher_quality_signals(
            docs.filter(F.col("doc_id") == i).select("doc_id", "text"),
            stopwords=GOPHER_STOPWORDS_BY_LANG[lang],
            alpha_rx=GOPHER_ALPHA_RX_BY_LANG[lang],
            stopword_match=(
                "substr" if lang in GOPHER_SUBSTR_STOPWORD_LANGS else "word"
            ),
        ).first()
        assert routed[i].g_stop_hits == sliced.g_stop_hits, i
        assert routed[i].g_alpha_frac == sliced.g_alpha_frac, i
        assert routed[i].gopher_keep == sliced.gopher_keep, i
    assert "ar" in C4_LINE_END_BY_LANG  # ؟/۔ terminals routable
    # review 9b: ko stop matching is SPACE-ANCHORED — a keyword-spam
    # noun list whose words merely CONTAIN the particle syllables
    # (이 in 아이폰, 가 in 가방, 다 in 다이소) must NOT pass the rule
    spam = spark.createDataFrame(
        [(9, "아이폰 갤럭시 아이패드 다이소 가방 노트북 키보드 마우스", "ko")],
        "doc_id long, text string, lang string",
    )
    spam_row = rule_gate(spam, lang_col="lang").first()
    assert spam_row.g_stop_hits < 2 and not spam_row.gopher_keep


def test_scalar_only_mode_bit_parity_and_plan(spark):
    """Round 10: include_repetition=False returns the scalar families
    from one map-side scan — bit-parity with the full form's shared
    columns, no gram pass (zero exchanges in the plan)."""
    mixed = spark.createDataFrame(
        [(1, _EN_TEXT, "en"), (2, _DE_TEXT, "de"), (3, _EL_TEXT, "el"),
         (4, _DE_TEXT, "xx"), (5, None, "en")],
        "doc_id long, text string, lang string",
    )
    full = rule_gate(mixed, lang_col="lang").orderBy("doc_id")
    scalar = rule_gate(
        mixed, lang_col="lang", include_repetition=False
    ).orderBy("doc_id")
    shared = [c for c in scalar.columns if c in full.columns]
    assert "c4_keep" in shared and "gopher_keep" in shared
    assert "top_bigram_frac" not in scalar.columns
    assert full.select(shared).collect() == scalar.select(shared).collect()
    unordered = rule_gate(mixed, lang_col="lang", include_repetition=False)
    plan = unordered._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
