"""Winnowing fingerprints (operators/winnow.py): parity with a
pure-Python implementation of the SIGMOD-2003 definition, the k+w-1
shared-substring guarantee, edge shapes (short/empty/None text), and
the max_df hot-fingerprint cut in the pair join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.winnow import (
    BASE,
    CP_MOD,
    K_DEFAULT,
    W_DEFAULT,
    winnow_candidate_pairs,
    winnow_fingerprints,
    winnow_profile,
)


def py_sketch(text: str, k: int = K_DEFAULT, w: int = W_DEFAULT):
    """Reference: gram hashes + set of window minima (value set — equal
    to the standard algorithm's selected-hash set, operators/winnow.py
    module doc)."""
    cps = [ord(c) % CP_MOD for c in text or ""]
    gh = [
        sum(cps[i + j] * BASE**j for j in range(k))
        for i in range(len(cps) - k + 1)
    ]
    fps = {min(gh[i : i + w]) for i in range(len(gh) - w + 1)}
    return gh, fps


def test_profile_matches_python_model(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "short"),          # < k chars: no grams
        (4, "exactly8!"),      # 9 chars: 2 grams, < w windows: no fps
        (5, ""),
        (6, None),
        (7, "ünïcödé text with ümläuts and emoji \U0001F600 inside."),
    ]
    got = {
        r.doc_id: (r.n_grams, r.n_fps, r.fp_xor, r.fp_min, r.fp_max)
        for r in winnow_profile(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for doc_id, text in rows:
        gh, fps = py_sketch(text)
        xor = 0
        for f in fps:
            xor ^= f
        want = (
            len(gh),
            len(fps),
            xor,
            min(fps) if fps else -1,
            max(fps) if fps else -1,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_exploded_fingerprints_match_model(spark):
    rows = [(1, "a shared license boilerplate paragraph of text")]
    got = {
        r.fp
        for r in winnow_fingerprints(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got == py_sketch(rows[0][1])[1]


def test_shared_substring_guarantee_and_pairs(spark):
    """Two documents sharing a substring of length >= k+w-1 MUST share
    a fingerprint (the winnowing theorem); unrelated documents with a
    disjoint alphabet share none. winnow_candidate_pairs surfaces
    exactly the overlapping pair, and max_df=1 kills every fingerprint
    the pair shares."""
    shared = "copied sentence that is plenty long"
    assert len(shared) >= K_DEFAULT + W_DEFAULT - 1
    rows = [
        (1, f"first document begins here. {shared} and then diverges"),
        (2, f"entirely other opening text {shared} with another tail"),
        (3, "zzzz qqqq vvvv kkkk xxxx wwww yyyy jjjj ffff"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        d: {r.fp for r in winnow_fingerprints(docs.filter(F.col("doc_id") == d)).collect()}
        for d in (1, 2, 3)
    }
    assert fps[1] & fps[2]          # the theorem
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])

    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_candidate_pairs(docs, min_shared=1).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == len(fps[1] & fps[2])
    # a fingerprint in BOTH docs has df=2; max_df=1 drops all shared
    assert winnow_candidate_pairs(docs, min_shared=1, max_df=1).count() == 0
    # min_shared above the overlap also empties the result
    assert (
        winnow_candidate_pairs(
            docs, min_shared=pairs[(1, 2)] + 1
        ).count()
        == 0
    )


def test_hypothesis_profile_property(spark):
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.text(alphabet=st.sampled_from("abAB .!\n\x1fé"), max_size=40),
        min_size=1,
        max_size=5,
    )

    @settings(
        max_examples=prop_examples(10), deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=corpus)
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_grams, r.n_fps, r.fp_xor)
            for r in winnow_profile(df).collect()
        }
        for i, t in enumerate(texts):
            gh, fps = py_sketch(t)
            xor = 0
            for f in fps:
                xor ^= f
            assert got[i] == (len(gh), len(fps), xor), (t, got[i])

    run()


def test_exploded_sketch_has_no_inferred_filter_blowup(spark):
    """Round-12 regression: InferFiltersFromGenerate synthesized a
    non-empty-array predicate from the inner explode and pushed it
    below the staged projections, re-inlining the whole winnow chain
    into one un-CSE'd Filter (~minutes for 500 tiny docs). With
    explode_outer the plan must carry NO Filter that evaluates a
    transform chain — only the trivial fp-not-null above the
    Generate."""
    df = spark.createDataFrame(
        [(i, f"document number {i} with enough text to fingerprint")
         for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        winnow_fingerprints(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Filter" in line:
            assert "transform(" not in line, line[:200]
    assert "Generate" in plan
