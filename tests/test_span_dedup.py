"""C4-style span dedup (operators/span_dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.span_dedup import dedup_spans, span_units

BOILER = "all rights reserved by the site"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, f"unique alpha text\n\n{BOILER}\n\nmore alpha"),
        (2, f"{BOILER}\n\nunique beta text"),
        (3, f"unique gamma\n\n{BOILER}\n\nunique gamma"),  # intra-doc repeat too
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_kept_rest_dropped(spark, docs):
    out = {r.doc_id: r for r in dedup_spans(docs, "paragraph").collect()}
    # doc 1 holds the first occurrence of the boilerplate -> untouched
    assert out[1].text == f"unique alpha text\n\n{BOILER}\n\nmore alpha"
    assert out[1].n_dropped == 0
    # doc 2's copy is dropped
    assert out[2].text == "unique beta text"
    assert out[2].n_dropped == 1
    # doc 3: boilerplate dropped AND its own internal repeat deduped
    assert out[3].text == "unique gamma"
    assert out[3].n_dropped == 2


def test_order_preserved_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "a b c\n\nz z z\n\nd e f"), (2, "q r s\n\nz z z")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_spans(df).collect()}
    assert out[1].text == "a b c\n\nz z z\n\nd e f" and out[1].n_spans == 3
    assert out[2].text == "q r s" and out[2].n_dropped == 1


def test_short_spans_exempt(spark):
    df = spark.createDataFrame(
        [(1, "the\n\nlong shared paragraph"), (2, "the\n\nother text")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in dedup_spans(df, "paragraph", min_chars=10).collect()}
    # "the" repeats but is under min_chars -> kept in both docs
    assert out[1] == "the\n\nlong shared paragraph"
    assert out[2] == "the\n\nother text"


def test_line_unit_and_bad_unit(spark, docs):
    df = spark.createDataFrame([(1, "x\ny"), (2, "y\nz")], "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_spans(df, "line").collect()}
    assert out == {1: "x\ny", 2: "z"}
    with pytest.raises(ValueError, match="unit"):
        span_units(df, "clause")


def test_decision_shuffle_carries_no_text(spark, docs):
    # the hash-keyed window must see only (h, doc_id, idx[, elig]) —
    # span text shuffles exclusively on the doc_id home key
    plan = dedup_spans(docs)._jdf.queryExecution().executedPlan().treeString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(h#\d+L[^\n]*", plan):
        assert "span" not in m.group(0)


def test_null_text_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, "real\n\ncontent"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup_spans(df).collect()}
    assert set(out) == {1, 2}  # the NULL-text doc must not vanish
    assert out[2].text == "" and out[2].n_dropped == 0


def test_idempotent(spark, docs):
    once = dedup_spans(docs).select("doc_id", "text")
    twice = dedup_spans(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_chunk_documents_skips_zero_token_docs(spark, tmp_path):
    # regression for the sequence(1, 0) -> [1, 0] phantom chunk: Spark
    # auto-steps DOWN when start > stop, which fabricated an empty chunk
    # for a zero-token document while the oracle emitted none
    import os

    from kafka_connect_ftp_spark.plans import registry

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s", 16), (2, "   ", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = registry()["chunk_documents"].fn(spark, sf).collect()
    assert {r.doc_id for r in out} == {1}  # whitespace-only doc: no chunks


def test_sentence_unit_dedups_c4_granularity(spark):
    """Round 10: the sentence unit — C4's actual span granularity — a
    sentence repeated across documents survives only at its first
    (doc_id, idx) occurrence; unique prose is untouched. Pinned against
    a pure-Python re-derivation of the same first-occurrence rule."""
    import re

    rows = [
        # mixed inter-sentence glue (double space, newline) — round 11:
        # glue is PRESERVED, and the dedup key is glue-insensitive
        (1, "The quick fox jumps.  All rights reserved.\nIt was sunny!"),
        (2, "All rights reserved. A different thought entirely. The quick fox jumps."),
        (3, "A fresh document with its own words? All rights reserved."),
    ]
    out = {
        r.doc_id: (r.text, r.n_spans, r.n_dropped)
        for r in dedup_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), unit="sentence"
        ).collect()
    }
    # python reference: first occurrence by (doc_id, idx) of the rtrim'd
    # span, min_chars=1; spans carry their trailing glue and rejoin ''
    seen, want = set(), {}
    for doc_id, text in rows:
        spans = re.sub(r"(?<=[.!?])(\s+)", "\\1\x1f", text).split("\x1f")
        kept = []
        dropped = 0
        for s in spans:
            k = s.rstrip()
            elig = len(k) >= 1 and s.strip() != ""
            if not elig or k not in seen:
                kept.append(s)
                if elig:
                    seen.add(k)
            else:
                dropped += 1
        want[doc_id] = ("".join(kept), len(spans), dropped)
    assert out == want
    # the boilerplate sentence survives exactly once, in doc 1 — even
    # though doc 1's copy is followed by '\n' and doc 2's by ' '
    assert "All rights reserved." in out[1][0]
    assert "All rights reserved." not in out[2][0]
    # doc 1 deduplicated nothing FROM it: returned byte-identical,
    # double space and newline intact (the round-10 form rewrote every
    # document's whitespace)
    assert out[1][0] == rows[0][1]


def test_sentence_unit_reconstruction_is_exact(spark):
    """A corpus with NO cross-document duplication round-trips
    byte-identically through sentence-unit dedup — newlines, runs of
    spaces, tabs between sentences, trailing glue, and text with no
    terminal punctuation at all."""
    rows = [
        (1, "One two three.\n\nFour five!  Six seven?\tEight."),
        (2, "no terminal punctuation here at all"),
        (3, "Trailing glue stays. "),
        (4, ""),
        (5, None),
        # round 12: pre-existing U+001F/U+001E bytes survive byte-exact
        # (escaped around the sentinel split) — including the escape
        # sequences themselves appearing literally in the input
        (6, "Odd\x1fbyte here. Next\x1e one too! \x1e1\x1e0\x1f1 end."),
        (7, "\x1f"),
        (8, "\x1e"),
    ]
    got = {
        r.doc_id: r.text
        for r in dedup_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), unit="sentence"
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == (text or ""), (doc_id, repr(got[doc_id]))


def test_sentence_roundtrip_and_dedup_property(spark):
    """Hypothesis property: for arbitrary corpora of printable text with
    arbitrary whitespace — INCLUDING pre-existing U+001E/U+001F bytes
    (round 12: escaped around the sentinel split, so exactness is
    unconditional) — sentence-unit dedup_spans (a) rebuilds every
    document byte-identically when its own spans all survive, and (b)
    agrees exactly with an independent pure-Python first-occurrence
    model (which applies the same escape) on both the rebuilt text and
    the counters."""
    from tests.conftest import prop_examples
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.text(
        alphabet=st.sampled_from("ab.!? \x1e\x1f"), min_size=0, max_size=12
    )
    ws = st.sampled_from([" ", "  ", "\n", "\t", " \n ", ""])
    doc = st.lists(
        st.tuples(words, ws), min_size=0, max_size=6
    ).map(lambda parts: "".join(w + g for w, g in parts))
    corpus = st.lists(doc, min_size=1, max_size=6)

    def py_model(texts):
        import re

        def enc(t):
            return t.replace("\x1e", "\x1e0").replace("\x1f", "\x1e1")

        def dec(t):
            return t.replace("\x1e1", "\x1f").replace("\x1e0", "\x1e")

        # Java's \s is exactly [ \t\n\x0b\f\r]; Python's also matches
        # \x1c-\x1f (Unicode whitespace), so the model must spell the
        # Java class out or it would treat the escape byte as glue
        _JWS = r"[ \t\n\x0b\f\r]"
        seen, out = set(), {}
        for i, t in enumerate(texts):
            spans = re.sub(
                rf"(?<=[.!?])({_JWS}+)", "\\1\x1f", enc(t or "")
            ).split("\x1f")
            kept, dropped = [], 0
            for s in spans:  # spans (and dedup keys) are in escaped form
                k = re.sub(rf"{_JWS}+$", "", s)
                # Spark's F.trim strips the space character only
                elig = len(k) >= 1 and s.strip(" ") != ""
                if not elig or k not in seen:
                    kept.append(s)
                    if elig:
                        seen.add(k)
                else:
                    dropped += 1
            out[i] = (dec("".join(kept)), len(spans), dropped)
        return out

    @settings(
        max_examples=prop_examples(15), deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=corpus)
    def run(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.text, r.n_spans, r.n_dropped)
            for r in dedup_spans(df, unit="sentence").collect()
        }
        want = py_model(texts)
        assert got == want, (texts, got, want)
        for i, t in enumerate(texts):
            if want[i][2] == 0:  # nothing dropped -> byte-identical
                assert got[i][0] == t

    run()
