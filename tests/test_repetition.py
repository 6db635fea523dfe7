"""Gopher repetition-signal tests (operators/repetition.py): hand-checked
fractions on constructed documents, edge cases (empty / one-token / all
too short for a width), a pure-Python cross-check on a pseudo-random
corpus, and a plan assertion that the whole profile stays JVM-side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.repetition import repetition_signals


def _profile(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = repetition_signals(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_hand_checked_fractions(spark):
    # "a b a b a b": 6 tokens, 2 distinct -> dup_token_frac 4/6
    # 2-grams: "a b" x3, "b a" x2 -> top mass 3*3=9, n_chars=11 -> 9/11
    # 5-grams: "a b a b a", "b a b a b" both unique -> dup5 = 0
    got = _profile(spark, [(1, "a b a b a b")], top_ns=(2,), dup_ns=(5,))
    r = got[1]
    assert r["n_tokens"] == 6
    assert r["dup_token_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert r["top_2gram_frac"] == pytest.approx(9 / 11, abs=1e-6)
    assert r["dup_5gram_frac"] == 0.0


def test_dup_ngram_fraction_counts_repeat_occurrences(spark):
    # "x y z x y z x y z": 3-grams at 7 positions, 3 distinct
    # ("x y z" x3, "y z x" x2, "z x y" x2) -> dup3 = (7-3)/7
    got = _profile(spark, [(1, "x y z x y z x y z")], top_ns=(3,), dup_ns=(3,))
    assert got[1]["dup_3gram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    # top 3-gram "x y z": mass 3*5=15, n_chars=17
    assert got[1]["top_3gram_frac"] == pytest.approx(15 / 17, abs=1e-6)


def test_count_tie_breaks_to_larger_char_mass(spark):
    # "aaa bbb c d": 2-grams "aaa bbb" (mass 7), "bbb c" (5), "c d" (3)
    # all count 1 — the tie MUST resolve to the largest character mass
    # (7/11), so a smallest-mass or arbitrary tie-break fails here
    got = _profile(spark, [(1, "aaa bbb c d")], top_ns=(2,), dup_ns=(5,))
    assert got[1]["top_2gram_frac"] == pytest.approx(7 / 11, abs=1e-6)


def test_short_and_empty_documents_get_zeros(spark):
    got = _profile(
        spark,
        [(1, ""), (2, "only"), (3, "two tokens here")],
        top_ns=(2, 4),
        dup_ns=(5,),
    )
    assert got[1]["n_tokens"] == 0 and got[1]["dup_token_frac"] == 0.0
    for d in (1, 2):
        assert got[d]["top_2gram_frac"] == 0.0
        assert got[d]["top_4gram_frac"] == 0.0
        assert got[d]["dup_5gram_frac"] == 0.0
    # 3 tokens: has 2-grams but no 4-grams
    assert got[3]["top_2gram_frac"] > 0.0
    assert got[3]["top_4gram_frac"] == 0.0


def _py_signals(text, top_ns, dup_ns):
    toks = [t for t in text.split(" ") if t]
    n_chars = len(text)
    out = {}
    out["dup_token_frac"] = (
        (len(toks) - len(set(toks))) / len(toks) if toks else 0.0
    )
    for n in sorted(set(top_ns) | set(dup_ns)):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        if n in top_ns:
            if counts:
                mass = max(
                    c * len(g)
                    for g, c in counts.items()
                    if c == max(counts.values())
                )
                out[f"top_{n}gram_frac"] = mass / n_chars
            else:
                out[f"top_{n}gram_frac"] = 0.0
        if n in dup_ns:
            out[f"dup_{n}gram_frac"] = (
                (len(grams) - len(counts)) / len(grams) if grams else 0.0
            )
    return out


def test_matches_pure_python_reference_on_random_corpus(spark):
    import random

    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    got = _profile(spark, rows, top_ns=(2, 3), dup_ns=(4,))
    for doc_id, text in rows:
        want = _py_signals(text, (2, 3), (4,))
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-6), (doc_id, k, text)


def test_plan_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = (
        repetition_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_width_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        repetition_signals(df, top_ns=(), dup_ns=())
    with pytest.raises(ValueError):
        repetition_signals(df, top_ns=(0,), dup_ns=(5,))


def test_id_col_internal_name_collision_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "n bigint, text string")
    with pytest.raises(ValueError, match="collides"):
        repetition_signals(df, id_col="n")


def test_null_id_fails_loudly(spark):
    # ADVICE r5: a NULL id would group its grams but be dropped by the
    # equi-join back onto the input, silently zeroing every gram signal
    # for that row — the contract is unique non-null ids, enforced with
    # a JVM-side raise_error at execution time
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    df = spark.createDataFrame(
        [(1, "a b a b"), (None, "c d c d")], "doc_id bigint, text string"
    )
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception), match="NULL doc_id"):
        repetition_signals(df).collect()
