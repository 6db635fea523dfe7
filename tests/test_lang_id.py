"""Trained language ID (operators/lang_id.py): exactness vs a pure-
Python Cavnar–Trenkle reference (same normalization, trigrams, rank
profiles, out-of-place distance), classification quality on held-out
prose, determinism across partitionings, and the per-language gate
routing that motivates it (non-English prose passing its own
language's Gopher stopword rule while failing the English one)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.lang_id import (
    NORM_KEEP,
    SEED_TEXTS,
    char_grams,
    classify_lang,
    seed_frame,
    train_char_profiles,
)

TOP_N = 80

# held-out prose: NOT in the seed corpus
_HELD_OUT = [
    (1, "en", "the committee will review the proposal and report back with its findings next week."),
    (2, "de", "die mitglieder des ausschusses werden den vorschlag prüfen und nächste woche über ihre ergebnisse berichten."),
    (3, "es", "los miembros del comité revisarán la propuesta y presentarán sus conclusiones la próxima semana."),
    (4, "fr", "les membres du comité examineront la proposition et présenteront leurs conclusions la semaine prochaine."),
    (5, "en", "rain is expected across the northern valleys before the weekend begins."),
    (6, "de", "über den nördlichen tälern wird vor dem wochenende mit regen gerechnet."),
    (7, "es", "se espera lluvia sobre los valles del norte antes de que comience el fin de semana."),
    (8, "fr", "la pluie est attendue sur les vallées du nord avant le début du week-end."),
]


def _py_norm(text: str) -> str:
    t = re.sub(" +", " ", re.sub(f"[^{NORM_KEEP} ]", " ", (text or "").lower())).strip()
    return f" {t} " if t else ""


def _py_grams(text: str) -> list[str]:
    p = _py_norm(text)
    return [p[i : i + 3] for i in range(len(p) - 2)] if len(p) >= 3 else []


def _py_profile(text: str, top: int) -> dict[str, int]:
    counts = Counter(_py_grams(text))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return {g: i + 1 for i, (g, _) in enumerate(ranked)}


def _py_classify(text: str, profiles: dict[str, dict[str, int]], top: int) -> tuple[str, int]:
    doc = _py_profile(text, top)
    if not doc:
        return "und", 0
    best = None
    for lang in sorted(profiles):
        prof = profiles[lang]
        dist = sum(
            abs(dr - prof[g]) if g in prof else top for g, dr in doc.items()
        )
        if best is None or dist < best[1]:
            best = (lang, dist)
    return best


@pytest.fixture(scope="module")
def profiles(spark):
    return train_char_profiles(seed_frame(spark), top_n=TOP_N).cache()


def test_profiles_match_pure_python(spark, profiles):
    got = {(r.lang, r.gram): r.rank for r in profiles.collect()}
    for lang, text in SEED_TEXTS.items():
        ref = _py_profile(text, TOP_N)
        mine = {g: rk for (lg, g), rk in got.items() if lg == lang}
        assert mine == ref, lang


def test_classification_matches_reference_and_truth(spark, profiles):
    docs = spark.createDataFrame(
        [(i, t) for i, _, t in _HELD_OUT], "doc_id long, text string"
    )
    out = {r.doc_id: (r.ct_lang, r.ct_dist) for r in classify_lang(docs, profiles, top_n=TOP_N).collect()}
    py_profiles = {lg: _py_profile(tx, TOP_N) for lg, tx in SEED_TEXTS.items()}
    for i, truth, text in _HELD_OUT:
        ref_lang, ref_dist = _py_classify(text, py_profiles, TOP_N)
        assert out[i] == (ref_lang, ref_dist), (i, out[i], (ref_lang, ref_dist))
        # and the trained classifier actually gets held-out prose right
        assert out[i][0] == truth, (i, out[i][0], truth)


def test_gramless_und_and_determinism(spark, profiles):
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "12345 67890 ++"), (4, _HELD_OUT[1][2])],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.ct_lang for r in classify_lang(docs, profiles, top_n=TOP_N).collect()}
    assert a[1] == "und" and a[2] == "und" and a[3] == "und" and a[4] == "de"
    b = {
        r.doc_id: r.ct_lang
        for r in classify_lang(docs.repartition(7), profiles, top_n=TOP_N).collect()
    }
    assert a == b


def test_contract_violations(spark, profiles):
    docs = seed_frame(spark).select(F.lit(1).alias("doc_id"), "text")
    with pytest.raises(ValueError, match="top_n"):
        train_char_profiles(seed_frame(spark), top_n=0)
    with pytest.raises(ValueError, match="doc_top"):
        classify_lang(docs, profiles, doc_top=0)


def test_plan_is_pure_map_side_projection(spark, profiles):
    # the round-8 physical shape: profiles ride as literal maps and the
    # per-doc profile is array ops on the row — classification is a
    # pure projection: NO shuffle, NO join, NO window, NO Python. The
    # shape a 100 TB corpus wants (raw text never leaves the mapper).
    docs = spark.createDataFrame(
        [(i, t) for i, _, t in _HELD_OUT], "doc_id long, text string"
    )
    plan = (
        classify_lang(docs, profiles, top_n=TOP_N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_routes_non_english_past_english_rules(spark, profiles):
    # THE motivating scenario (VERDICT r7 #2): well-formed German prose
    # fails the English Gopher stopword rule but passes once the
    # lang-ID gate routes it to the German list.
    from kafka_connect_ftp_spark.operators.gopher_rules import (
        GOPHER_STOPWORDS_BY_LANG,
        gopher_quality_signals,
    )

    de_text = (
        "die regierung hat heute einen neuen haushaltsplan vorgestellt. "
        "die opposition will den entwurf im parlament mit anträgen "
        "ändern, und die debatte dürfte mehrere wochen dauern. viele "
        "bürger haben dazu bereits eine klare meinung geäußert."
    )
    docs = spark.createDataFrame([(1, de_text)], "doc_id long, text string")
    # English-tuned rule: fails prose that any German reader accepts
    en_gated = gopher_quality_signals(docs).first()
    assert not en_gated.gopher_keep and en_gated.g_stop_hits < 2
    # route by the TRAINED classifier, then gate with the matched list
    lang = classify_lang(docs, profiles, top_n=TOP_N).first().ct_lang
    assert lang == "de"
    routed = gopher_quality_signals(
        docs, stopwords=GOPHER_STOPWORDS_BY_LANG[lang]
    ).first()
    assert routed.gopher_keep and routed.g_stop_hits >= 2


def test_reserved_name_collision_raises(spark, profiles):
    # ADVICE r8: a caller column named like an internal stage alias
    # would silently shadow the staged projections
    docs = spark.createDataFrame([(1, "text here", "x")], "_sg string, text string, extra string")
    with pytest.raises(ValueError, match="collide"):
        classify_lang(docs, profiles, id_col="_sg")
    docs2 = spark.createDataFrame(
        [(1, "text here", "x")], "doc_id long, text string, _prof string"
    )
    with pytest.raises(ValueError, match="collide"):
        classify_lang(docs2, profiles, keep_cols=("_prof",))


# ---- round 9: script-level dispatch --------------------------------------

_SCRIPT_HELD_OUT = [
    (1, "latin", "en", "the weather is lovely today and the garden looks bright."),
    (2, "latin", "de", "die regierung hat heute einen neuen haushaltsplan vorgestellt und die debatte beginnt."),
    (3, "cyrillic", "ru",
     "сегодня хорошая погода и мы решили пойти гулять в парк возле дома, "
     "потому что все семьи любят проводить время вместе."),
    (4, "greek", "el",
     "σήμερα ο καιρός είναι καλός και αποφασίσαμε να περπατήσουμε στο "
     "πάρκο κοντά στο σπίτι γιατί όλες οι οικογένειες αγαπούν τον ήλιο."),
    # zh/ja have trained profiles under han/kana (held-out prose)
    (5, "han", "zh", "今天天气很好我们决定去公园散步因为家人都喜欢一起度过时间。"),
    (6, "kana", "ja", "きょうはてんきがよくてこうえんをさんぽしました。"),
    (7, "und", "und", "12345 67890 ++-- ~~ 00"),
    # round 9b continuation: arabic/hangul/devanagari gained trained
    # profiles (ar/ko/hi); hebrew keeps the no-profile script fallback
    (8, "arabic", "ar", "السلام عليكم كيف حالك اليوم الطقس جميل جدا"),
    (9, "hangul", "ko",
     "오늘은 도서관에 가서 새로운 책을 빌리고 친구와 함께 저녁을 먹었다."),
    (10, "devanagari", "hi",
     "आज हम बाजार गए और वहां से ताजा फल और सब्जियां खरीद कर घर लौट आए।"),
    # round 10: hebrew gained a trained profile (held-out prose, not in
    # the seed); thai takes over the unprofiled-script fallback path
    (11, "hebrew", "he", "שלום לכם מה שלומכם היום מזג האוויר נעים מאוד"),
    (12, "thai", "thai", "สวัสดีครับวันนี้อากาศดีมากเราไปทะเลกันเถอะ"),
]


@pytest.fixture(scope="module")
def routed_profiles(spark):
    from kafka_connect_ftp_spark.operators.lang_id import (
        NORM_KEEP_ROUTED,
        SEED_TEXTS_ROUTED,
    )

    return train_char_profiles(
        seed_frame(spark, SEED_TEXTS_ROUTED), top_n=TOP_N, norm_keep=NORM_KEEP_ROUTED
    ).cache()


def test_classify_script_blocks(spark):
    from kafka_connect_ftp_spark.operators.lang_id import classify_script

    docs = spark.createDataFrame(
        [(i, t) for i, _, _, t in _SCRIPT_HELD_OUT] + [(98, None), (99, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.ct_script for r in classify_script(docs).collect()}
    for i, script, _, _ in _SCRIPT_HELD_OUT:
        assert got[i] == script, (i, got[i], script)
    assert got[98] == "und" and got[99] == "und"
    # keep_cols passthrough + reserved-name guard
    kept = classify_script(docs, keep_cols=("text",)).columns
    assert kept == ["doc_id", "ct_script", "text"]
    with pytest.raises(ValueError, match="collide"):
        classify_script(docs.withColumnRenamed("doc_id", "_s_0"), id_col="_s_0")


def test_routed_classification(spark, routed_profiles):
    # VERDICT r8 #3 done-criterion: held-out Cyrillic/Greek/CJK text
    # classifies to its script (or language where profiles exist), and
    # Latin falls through to the trained CT path unchanged.
    from kafka_connect_ftp_spark.operators.lang_id import classify_lang_routed

    docs = spark.createDataFrame(
        [(i, t) for i, _, _, t in _SCRIPT_HELD_OUT], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.ct_script, r.ct_lang)
        for r in classify_lang_routed(docs, routed_profiles, top_n=TOP_N).collect()
    }
    for i, script, lang, _ in _SCRIPT_HELD_OUT:
        assert out[i] == (script, lang), (i, out[i], (script, lang))
    # determinism across partition layouts
    out7 = {
        r.doc_id: (r.ct_script, r.ct_lang)
        for r in classify_lang_routed(
            docs.repartition(7), routed_profiles, top_n=TOP_N
        ).collect()
    }
    assert out7 == out


def test_routed_plan_is_map_side(spark, routed_profiles):
    from kafka_connect_ftp_spark.operators.lang_id import classify_lang_routed

    docs = spark.createDataFrame(
        [(i, t) for i, _, _, t in _SCRIPT_HELD_OUT], "doc_id long, text string"
    )
    plan = (
        classify_lang_routed(docs, routed_profiles, top_n=TOP_N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_routed_contracts(spark, routed_profiles):
    from kafka_connect_ftp_spark.operators.lang_id import (
        SEED_TEXTS_ROUTED,
        classify_lang_routed,
    )

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(ValueError, match="script_of_lang missing"):
        classify_lang_routed(docs, routed_profiles, script_of_lang={"en": "latin"})
    with pytest.raises(ValueError, match="unknown scripts"):
        classify_lang_routed(
            docs,
            routed_profiles,
            script_of_lang=dict.fromkeys(SEED_TEXTS_ROUTED, "klingon"),
        )


def test_routed_scale_smoke(spark, routed_profiles):
    # volume shape-check: 20k mixed-script docs through the routed
    # classifier — the 8-language literal-map distance chain + 9-script
    # count CASE must survive codegen and classify every row correctly
    # (grouped counts are exact because each row's script snippet is
    # keyed by doc_id % 5)
    from kafka_connect_ftp_spark.operators.lang_id import classify_lang_routed

    snips = {
        0: _SCRIPT_HELD_OUT[0][3],   # en / latin
        1: _SCRIPT_HELD_OUT[2][3],   # ru / cyrillic
        2: _SCRIPT_HELD_OUT[3][3],   # el / greek
        3: _SCRIPT_HELD_OUT[4][3],   # zh / han
        4: _SCRIPT_HELD_OUT[6][3],   # und
    }
    case = "CASE CAST(id % 5 AS INT) " + " ".join(
        "WHEN {} THEN '{}'".format(k, v.replace("'", "''")) for k, v in snips.items()
    ) + " END"
    docs = spark.range(20_000).selectExpr("id AS doc_id", f"{case} AS text")
    got = {
        (r.ct_script, r.ct_lang): r["count"]
        for r in classify_lang_routed(docs, routed_profiles, top_n=TOP_N)
        .groupBy("ct_script", "ct_lang")
        .count()
        .collect()
    }
    assert got == {
        ("latin", "en"): 4000,
        ("cyrillic", "ru"): 4000,
        ("greek", "el"): 4000,
        ("han", "zh"): 4000,
        ("und", "und"): 4000,
    }, got


def test_classify_script_property_matches_python(spark):
    # property check: random mixed-script strings through the Spark
    # operator equal a pure-Python twin (same ranges, same argmax
    # tie-break) — generalizes the fixture cases to arbitrary mixes
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_connect_ftp_spark.operators.lang_id import (
        SCRIPT_RANGES,
        classify_script,
    )

    def _expand(rng: str) -> str:
        # a few sample chars per range (endpoints + one inside)
        out = []
        i = 0
        while i < len(rng):
            if i + 2 < len(rng) and rng[i + 1] == "-":
                lo, hi = ord(rng[i]), ord(rng[i + 2])
                out += [chr(lo), chr((lo + hi) // 2), chr(hi)]
                i += 3
            else:
                out.append(rng[i])
                i += 1
        return "".join(out)

    pool = "".join(_expand(r) for r in SCRIPT_RANGES.values()) + " .,!?0123456789"

    def _py_script(text: str) -> str:
        import re

        counts = {
            s: len(re.findall(f"[{SCRIPT_RANGES[s]}]", text or ""))
            for s in SCRIPT_RANGES
        }
        mx = max(counts.values())
        if mx == 0:
            return "und"
        return min(s for s, c in counts.items() if c == mx)

    @settings(
        max_examples=prop_examples(12),
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(st.text(alphabet=pool, max_size=40), min_size=1, max_size=8))
    def check(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {r.doc_id: r.ct_script for r in classify_script(docs).collect()}
        for i, t in enumerate(texts):
            assert got[i] == _py_script(t), (t, got[i], _py_script(t))

    check()


def test_routed_property_matches_python(spark, routed_profiles):
    # property check (round 9b): random mixed-script strings through
    # classify_lang_routed equal a pure-Python twin of the WHOLE routed
    # chain — script argmax (name-asc ties), union-alphabet CT profile,
    # per-script out-of-place argmin (lang-asc ties), unprofiled-script
    # and gramless fallbacks
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tests.conftest import prop_examples

    from kafka_connect_ftp_spark.operators.lang_id import (
        NORM_KEEP_ROUTED,
        SCRIPT_OF_LANG,
        SCRIPT_RANGES,
        SEED_TEXTS_ROUTED,
        classify_lang_routed,
    )

    def _py_script(text: str) -> str:
        counts = {
            s: len(re.findall(f"[{SCRIPT_RANGES[s]}]", text or ""))
            for s in SCRIPT_RANGES
        }
        mx = max(counts.values())
        return "und" if mx == 0 else min(s for s, c in counts.items() if c == mx)

    def _py_norm_r(text: str) -> str:
        t = re.sub(
            " +", " ", re.sub(f"[^{NORM_KEEP_ROUTED} ]", " ", (text or "").lower())
        ).strip()
        return f" {t} " if t else ""

    def _py_prof_r(text: str, top: int) -> dict[str, int]:
        p = _py_norm_r(text)
        grams = [p[i : i + 3] for i in range(len(p) - 2)] if len(p) >= 3 else []
        ranked = sorted(Counter(grams).items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        return {g: i + 1 for i, (g, _) in enumerate(ranked)}

    prof_py = {lg: _py_prof_r(t, TOP_N) for lg, t in SEED_TEXTS_ROUTED.items()}
    profiled_scripts = {SCRIPT_OF_LANG[lg] for lg in prof_py}

    def _py_routed(text: str) -> str:
        script = _py_script(text)
        if script not in profiled_scripts:
            return script
        doc = _py_prof_r(text, TOP_N)
        if not doc:
            return "und"
        best = None
        for lang in sorted(lg for lg in prof_py if SCRIPT_OF_LANG[lg] == script):
            prof = prof_py[lang]
            dist = sum(
                abs(dr - prof[g]) if g in prof else TOP_N for g, dr in doc.items()
            )
            if best is None or dist < best[1]:
                best = (lang, dist)
        return best[0]

    def _expand(rng: str) -> str:
        out, i = [], 0
        while i < len(rng):
            if i + 2 < len(rng) and rng[i + 1] == "-":
                lo, hi = ord(rng[i]), ord(rng[i + 2])
                out += [chr(lo), chr((lo + hi) // 2), chr(hi)]
                i += 3
            else:
                out.append(rng[i])
                i += 1
        return "".join(out)

    # seed-text chars (real letters of every language) + range samples
    # + punctuation/digits so normalization and dispatch both get hit
    pool = (
        "".join(sorted({c for t in SEED_TEXTS_ROUTED.values() for c in t})[:400])
        + "".join(_expand(r) for r in SCRIPT_RANGES.values())
        + " .,!?0123456789"
    )

    @settings(
        max_examples=prop_examples(8), deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(st.lists(st.text(alphabet=pool, max_size=60), min_size=1, max_size=6))
    def check(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc_id: r.ct_lang
            for r in classify_lang_routed(docs, routed_profiles, top_n=TOP_N).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _py_routed(t), (t, got[i], _py_routed(t))

    check()
