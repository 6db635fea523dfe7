"""Property-based tests for the corpus operators: random corpora driven
through span dedup and heavy hitters must match pure-Python oracles —
generalizing the fixture-based unit tests to arbitrary inputs (repeats,
empty spans, NULL text, caps that force eviction)."""

from __future__ import annotations

from collections import Counter

from tests.conftest import prop_examples
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_ftp_spark.operators.heavy_hitters import heavy_hitter_ngrams
from kafka_connect_ftp_spark.operators.span_dedup import dedup_spans

# small alphabet so duplicates actually happen
word = st.sampled_from(["alpha", "beta", "gamma", "delta"])
span = st.lists(word, min_size=0, max_size=3).map(" ".join)
doc = st.lists(span, min_size=1, max_size=4).map("\n\n".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def _py_span_dedup(texts):
    """Pure-Python twin of dedup_spans(unit='paragraph', min_chars=1)."""
    seen: set[str] = set()
    out = []
    for doc_id, text in enumerate(texts):
        spans = (text or "").split("\n\n")
        kept, dropped = [], 0
        for s in spans:
            eligible = len(s) >= 1 and s.strip() != ""
            if eligible and s in seen:
                dropped += 1
                continue
            if eligible:
                seen.add(s)
            kept.append(s)
        out.append((doc_id, "\n\n".join(kept), len(spans), dropped))
    return out


@settings(max_examples=prop_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=corpus)
def test_span_dedup_matches_python_oracle(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.text, r.n_spans, r.n_dropped)
        for r in dedup_spans(df, "paragraph").collect()
    )
    assert got == _py_span_dedup(texts)


@settings(max_examples=prop_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=corpus)
def test_span_dedup_idempotent_and_lossless_on_uniques(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = dedup_spans(df, "paragraph").select("doc_id", "text")
    twice = dedup_spans(once, "paragraph")
    assert twice.filter("n_dropped > 0").count() == 0  # fixpoint


hh_doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
hh_corpus = st.lists(hh_doc, min_size=1, max_size=8)


@settings(max_examples=prop_examples(15), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=hh_corpus, n=st.integers(1, 3))
def test_heavy_hitters_no_eviction_regime_is_exact(spark, texts, n):
    """cap >= distinct n-grams -> no eviction -> exact top-k with the
    (count desc, ngram) tie-break — the regime corpus_report runs in."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    exact = Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        for i in range(len(toks) - n + 1):
            exact[" ".join(toks[i : i + n])] += 1
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [
        (r.ngram, r["count"])
        for r in heavy_hitter_ngrams(
            df, n=n, top_k=5, candidates_per_partition=10_000
        ).collect()
    ]
    assert got == want


@settings(max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=hh_corpus)
def test_heavy_hitters_counts_are_true_counts_even_under_eviction(spark, texts):
    """Whatever survives a tiny cap, its reported count is the TRUE corpus
    count (phase 2 rescores exactly) — the sketch can drop light grams
    but never fabricates or inflates a count."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    exact = Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        for i in range(len(toks) - 1):
            exact[" ".join(toks[i : i + 2])] += 1
    got = heavy_hitter_ngrams(df, n=2, top_k=5, candidates_per_partition=5).collect()
    for r in got:
        assert exact[r.ngram] == r["count"]


# --- bloom prefilter join: identity with the exact join on random key sets ---

key = st.text(alphabet="abcdefgh0123456789-", min_size=0, max_size=12)


@settings(max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    big_keys=st.lists(key, min_size=1, max_size=40),
    ref_keys=st.lists(key, min_size=0, max_size=25),
    fpp=st.sampled_from([0.5, 0.05, 0.01]),  # high fpp stresses FP removal
    how=st.sampled_from(["left_semi", "left_anti"]),
)
def test_bloom_prefilter_join_identity_property(spark, big_keys, ref_keys, fpp, how):
    from kafka_connect_ftp_spark.operators.bloom import bloom_prefilter_join

    big = spark.createDataFrame([(k, i) for i, k in enumerate(big_keys)], "k string, i long")
    ref = spark.createDataFrame([(k,) for k in ref_keys] or [(None,)], "k string").filter(
        "k is not null"
    )
    exact = sorted((r.k, r.i) for r in big.join(ref, "k", how).collect())
    pre = sorted(
        (r.k, r.i) for r in bloom_prefilter_join(big, ref, "k", fpp=fpp, how=how).collect()
    )
    assert pre == exact


# --- jsonl reader: round-trip arbitrary document text through the
# text-scan + from_json path (quotes, backslashes, unicode, emptiness) ---

doc_text = st.text(
    alphabet=st.characters(blacklist_categories=["Cs"], blacklist_characters="\n\r"),
    min_size=0,
    max_size=40,
)


@settings(max_examples=prop_examples(10), deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(doc_text, min_size=1, max_size=8))
def test_jsonl_roundtrip_property(spark, tmp_path_factory, texts):
    import json as _json

    from kafka_connect_ftp_spark.ingest.corpus import read_corpus

    p = tmp_path_factory.mktemp("jl")
    (p / "a.jsonl").write_text(
        "\n".join(_json.dumps({"text": t, "i": i}) for i, t in enumerate(texts)),
        encoding="utf-8",
    )
    df = read_corpus(spark, str(p), "jsonl")
    rows = sorted(df.collect(), key=lambda r: r.i)
    assert [r.text for r in rows] == list(texts)
    assert not any(r.decode_error for r in rows)


@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "b", "ccc", "dd"]), min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=prop_examples(20), deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_signals_match_pure_python(spark, token_lists):
    """repetition_signals equals an independent pure-Python computation
    on arbitrary small corpora (hypothesis-shrunk counterexamples)."""
    from kafka_connect_ftp_spark.operators.repetition import repetition_signals

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.asDict()
        for r in repetition_signals(df, top_ns=(2,), dup_ns=(3,)).collect()
    }
    for i, toks in enumerate(token_lists):
        n_chars = len(" ".join(toks))
        want_dup_tok = (len(toks) - len(set(toks))) / len(toks) if toks else 0.0
        assert abs(got[i]["dup_token_frac"] - want_dup_tok) < 1e-6
        for n, col in ((2, "top_2gram_frac"), (3, "dup_3gram_frac")):
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            counts: dict[str, int] = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            if col.startswith("top"):
                if counts:
                    cmax = max(counts.values())
                    want = max(
                        c * len(g) for g, c in counts.items() if c == cmax
                    ) / n_chars
                else:
                    want = 0.0
            else:
                want = (len(grams) - len(counts)) / len(grams) if grams else 0.0
            assert abs(got[i][col] - want) < 1e-6, (i, col, toks)
