"""BPE training/tokenization (operators/bpe.py) vs a pure-Python
reference implementation: identical merge sequences (deterministic
tie-break), round-trip of tokenization, JVM-only training loop."""

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.bpe import apply_bpe, train_bpe, word_counts


def _ref_bpe(texts, num_merges):
    """Textbook reference: word-frequency table, best pair by (count
    desc, pair asc), left-to-right greedy merge within each word."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest",
    "low newer low",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_merges_match_reference(docs):
    got = train_bpe(docs, 12)
    want, _ = _ref_bpe(TEXTS, 12)
    assert got == want


def test_early_stop_when_no_pairs_left(spark):
    docs = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    merges = train_bpe(docs, 50)  # single-char words: nothing to merge
    assert merges == []


def test_apply_matches_training_segmentation(docs):
    # tokenizing the TRAINING corpus with the learned ranks must produce
    # exactly the training loop's final word segmentation
    merges = train_bpe(docs, 12)
    _, vocab = _ref_bpe(TEXTS, 12)
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        want = [tok for w in t.split(" ") if w for tok in vocab[w]]
        assert out[i] == want, f"doc {i}"


def test_apply_round_trips_text(docs):
    merges = train_bpe(docs, 5)
    rows = apply_bpe(docs, merges).collect()
    for r in rows:
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


def test_apply_handles_null_and_unseen(spark, docs):
    merges = train_bpe(docs, 5)
    extra = spark.createDataFrame(
        [(100, None), (101, "zzz unseen")], "doc_id long, text string"
    )
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe(extra, merges).collect()}
    assert out[100] == []
    assert "".join(out[101]) == "zzzunseen"


def test_word_counts_bounded_by_vocab(docs):
    rows = {(r.word, r["count"]) for r in word_counts(docs).collect()}
    assert ("low", 5) in rows and ("newest", 1) in rows


def test_training_loop_is_jvm_side(docs):
    # the REAL per-round frames — the pair aggregation and the batch
    # merge rewrite — must contain no Python evaluation; only apply_bpe
    # is allowed a pandas UDF
    from kafka_connect_ftp_spark.operators.bpe import (
        _apply_merge,
        _apply_merge_batch,
        _best_pair_frame,
    )

    words = word_counts(docs).select(
        F.expr("filter(split(word, ''), c -> c <> '')").alias("syms"), "count"
    )
    for frame in (
        _best_pair_frame(words),
        _apply_merge(words, "l", "o"),
        _apply_merge_batch(words, [("l", "o"), ("n", "e")]),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert bad not in plan


def test_batch_apply_equals_chained_single_applies(spark):
    # one greedy fold with the nested-map literal must equal chaining
    # _apply_merge per pair — the equivalence that lets the batch path
    # keep constant expression depth
    from kafka_connect_ftp_spark.operators.bpe import _apply_merge, _apply_merge_batch

    words = spark.createDataFrame(
        [(list("lowlow"), 3), (list("newer"), 2), (list("aaa"), 1), (list("xy"), 1)],
        "syms array<string>, count long",
    )
    pairs = [("l", "o"), ("n", "e"), ("a", "a")]
    chained = words
    for a, b in pairs:
        chained = _apply_merge(chained, a, b)
    got = sorted(tuple(r.syms) for r in _apply_merge_batch(words, pairs).collect())
    want = sorted(tuple(r.syms) for r in chained.collect())
    assert got == want
    assert ("aa", "a") in {tuple(s) for s in (r.syms for r in _apply_merge_batch(words, pairs).collect())}


def test_batched_equals_sequential_on_disjoint_corpus(spark):
    # alphabet segments never share symbols, so every batch is
    # conflict-free and the batched merge SET/order must equal the
    # sequential reference exactly
    texts = ["ab ab ab ab", "cd cd cd", "ef ef", "gh"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want, _ = _ref_bpe(texts, 4)
    got = train_bpe(docs, 4, batch_size=4)
    assert got == want == [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")]


def test_batched_skips_conflicting_candidates(spark):
    # "ab" repeated: round-1 candidates (a,b) and (b,a) share symbols, so
    # a batch of 2 must accept only (a,b) in round 1 and pick up the rest
    # in later rounds — never apply two conflicting merges in one rewrite
    texts = ["abab abab abab"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    want, _ = _ref_bpe(texts, 3)
    got = train_bpe(docs, 3, batch_size=2)
    # sequential: (a,b) -> ab; then (ab,ab) -> abab; batched must reach
    # the same merges because every round's batch degenerates to size 1
    assert got == want


def test_batched_tokenization_round_trips(docs):
    merges = train_bpe(docs, 12, batch_size=4)
    assert len(merges) == 12
    for r in apply_bpe(docs, merges).collect():
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


def test_batched_select_batch_merged_symbol_aliasing():
    # unit pin for the "ab" case: candidate ("ab", "c") conflicts with
    # accepted ("a", "b") because applying (a,b) mints new "ab" tokens
    from collections import namedtuple

    from kafka_connect_ftp_spark.operators.bpe import _select_batch

    Cand = namedtuple("Cand", "a b")
    batch = _select_batch([Cand("a", "b"), Cand("ab", "c"), Cand("x", "y")], 3)
    assert batch == [("a", "b"), ("x", "y")]
    # and the mirror: accepted ("ab", "c") blocks later ("a", "b")
    batch = _select_batch([Cand("ab", "c"), Cand("a", "b"), Cand("x", "y")], 3)
    assert batch == [("ab", "c"), ("x", "y")]


def test_select_batch_invariants_property():
    # pure-Python property: whatever the candidate stream, the accepted
    # batch is (a) a subsequence of the candidates, (b) pairwise
    # symbol-disjoint, (c) free of merged-symbol aliasing, (d) bounded
    from collections import namedtuple

    from tests.conftest import prop_examples
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_connect_ftp_spark.operators.bpe import _select_batch

    Cand = namedtuple("Cand", "a b")
    sym = st.text(alphabet="abcd", min_size=1, max_size=3)

    @settings(max_examples=prop_examples(200), deadline=None)
    @given(
        st.lists(st.tuples(sym, sym), max_size=30),
        st.integers(min_value=1, max_value=10),
    )
    def check(pairs, size):
        cands = [Cand(a, b) for a, b in pairs]
        batch = _select_batch(cands, size)
        assert len(batch) <= size
        # subsequence of the candidate order
        it = iter([(c.a, c.b) for c in cands])
        assert all(p in it for p in [tuple(p) for p in batch])
        seen: set[str] = set()
        merged: set[str] = set()
        for a, b in batch:
            assert a not in seen and b not in seen  # symbol-disjoint
            assert a + b not in seen  # no accepted symbol equals my merge
            assert a not in merged and b not in merged  # no aliasing
            assert a + b not in merged  # no duplicate merge outputs
            seen.update((a, b))
            merged.add(a + b)

    check()


def test_thousand_merges_in_bounded_time(spark):
    # the production-vocab demonstration the batched variant exists for:
    # >= 1000 merges must complete in a bounded number of rounds and
    # bounded wall time (the sequential loop would need 1000 driver
    # round-trips; batch_size=32 needs ~1000/accepted-per-round)
    import random
    import time

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 12)))
        for _ in range(400)
    ]
    texts = [" ".join(words[i : i + 20]) for i in range(0, 400, 20)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    t0 = time.time()
    merges = train_bpe(docs, 1000, batch_size=32)
    elapsed = time.time() - t0
    assert len(merges) == 1000
    assert len(set(merges)) == 1000  # no merge learned twice
    assert elapsed < 240, f"1000 merges took {elapsed:.0f}s"
    # the learned ranks must still tokenize coherently
    rows = apply_bpe(docs, merges).collect()
    for r in rows:
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


def test_merge_table_round_trips_through_parquet(spark, docs, tmp_path):
    # the trained vocabulary is an artifact: a separate tokenization job
    # must load it and produce identical tokenization
    from kafka_connect_ftp_spark.operators.bpe import load_merges, save_merges

    merges = train_bpe(docs, 12)
    path = str(tmp_path / "merges.parquet")
    save_merges(spark, merges, path)
    loaded = load_merges(spark, path)
    assert loaded == merges
    before = [tuple(r.bpe_tokens) for r in apply_bpe(docs, merges).orderBy("doc_id").collect()]
    after = [tuple(r.bpe_tokens) for r in apply_bpe(docs, loaded).orderBy("doc_id").collect()]
    assert before == after


def test_unicode_and_astral_plane_corpora(spark):
    # training splits words JVM-side (split(word, '')), apply splits
    # Python-side (list(w)); both are CODEPOINT-level — Java regex never
    # matches inside a surrogate pair, so astral-plane emoji stay whole
    # and the two sides learn/apply the identical symbol alphabet
    texts = ["🙂x 🙂x 🙂x", "héllo héllo wörld", "日本語 トーク 日本語"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(docs, 6)  # batch_size=1: exact sequential equality
    want, _ = _ref_bpe(texts, 6)
    assert merges == want
    for r in apply_bpe(docs, merges).collect():
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")
    # the emoji word must actually have merged (proves surrogate safety)
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe(docs, merges).collect()}
    assert "🙂x" in out[0]
    # the batched path must also round-trip unicode (merge ORDER may
    # legitimately deviate from sequential — the documented trade)
    batched = train_bpe(docs, 6, batch_size=3)
    for r in apply_bpe(docs, batched).collect():
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


def test_registry_rows_only_entry(spark):
    # the driver-facing rows-only query: deterministic, docs-grain, no
    # SQL oracle (inherently iterative — the documented category)
    from kafka_connect_ftp_spark.plans import registry

    spec = registry()["bpe_train_tokenize"]
    assert spec.oracle is None
    out = spec.fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    docs_n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert len(rows) == docs_n
    # with only 24 merges most words stay multi-token: BPE count strictly
    # exceeds the whitespace count on every non-empty doc
    assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in rows)
    # round 8: the unigram-tokenizer columns ride the same row — piece
    # streams reconstruct the words (count >= ws tokens) and the head
    # is non-empty wherever the doc has tokens
    assert all(r.n_uni_pieces >= r.n_ws_tokens for r in rows)
    assert all(r.uni_head != "" for r in rows if r.n_ws_tokens > 0)


def test_symbols_with_quotes_and_backslashes(spark):
    # merge symbols ride as Column literals, never injected SQL text —
    # quote/backslash-heavy corpora (code, Windows paths, LaTeX) must
    # train and tokenize without ParseExceptions or silently skipped
    # rewrites
    texts = ["a\\b a\\b a\\b", "it's it's o'k"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(docs, 4)
    want, _ = _ref_bpe(texts, 4)
    assert merges == want
    for r in apply_bpe(docs, merges).collect():
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="production-scale BPE demo (~4 min); set SPARK_GRAFT_SLOW=1",
)
def test_ten_thousand_merges_production_shape(spark):
    # VERDICT r5 #5: the production-shaped regime — batch_size=64 to a
    # 10k-merge vocabulary on a 30k-distinct-word corpus — in bounded
    # wall time, with a vocabulary-QUALITY checkpoint against the exact
    # sequential reference: at the same merge count the batched
    # trainer's segmentation must be nearly as short (batching can only
    # reorder merge RANKS, not destroy compression). Measured on the
    # round-6 dev host: 10k merges in ~192s (driver-recorded note in
    # SURVEY.md §8).
    import random
    import time

    rng = random.Random(3)
    words = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(8, 14)))
        for _ in range(30_000)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(words, k=40))) for i in range(3_000)],
        "doc_id bigint, text string",
    )
    sample = docs.limit(100).localCheckpoint(eager=True)

    # quality checkpoint at 128 merges: batched vs the sequential
    # reference on mean tokens-per-document over a fixed sample
    seq = train_bpe(docs, 128, batch_size=1)
    bat = train_bpe(docs, 128, batch_size=64)

    def mean_tokens(merges):
        return (
            apply_bpe(sample, merges)
            .agg(F.avg(F.size("bpe_tokens")))
            .collect()[0][0]
        )

    m_seq, m_bat = mean_tokens(seq), mean_tokens(bat)
    assert m_bat <= m_seq * 1.10, (m_seq, m_bat)

    # the 10k-merge production run: completes, stays unique, bounded time
    t0 = time.time()
    merges = train_bpe(docs, 10_000, batch_size=64)
    elapsed = time.time() - t0
    assert len(merges) == 10_000 and len(set(merges)) == 10_000
    assert elapsed < 600, f"10k merges took {elapsed:.0f}s"
    # ranks tokenize coherently at full vocabulary
    rows = apply_bpe(sample, merges).collect()
    for r in rows:
        assert "".join(r.bpe_tokens) == r.text.replace(" ", "")


def test_token_vocab_and_ids_round_trip(spark, docs):
    from kafka_connect_ftp_spark.operators.bpe import (
        build_token_vocab,
        tokens_to_ids,
    )

    merges = train_bpe(docs, 8)
    tokenized = apply_bpe(docs, merges)
    vocab = build_token_vocab(tokenized)
    assert vocab["<unk>"] == 0
    assert len(set(vocab.values())) == len(vocab)  # ids contiguous+unique
    ids = {v: k for k, v in vocab.items()}
    out = tokens_to_ids(tokenized, vocab).collect()
    for r in out:
        assert [ids[i] for i in r.token_ids] == list(r.bpe_tokens)

    # deterministic: same corpus -> same vocab
    assert build_token_vocab(apply_bpe(docs, merges)) == vocab


def test_tokens_to_ids_unknown_and_null(spark):
    from kafka_connect_ftp_spark.operators.bpe import tokens_to_ids

    df = spark.createDataFrame(
        [(1, ["a", "zz", "b"]), (2, None)],
        "doc_id bigint, bpe_tokens array<string>",
    )
    vocab = {"<unk>": 0, "a": 1, "b": 2}
    got = {r.doc_id: r.token_ids for r in tokens_to_ids(df, vocab).collect()}
    assert got[1] == [1, 0, 2]  # zz -> unk
    assert got[2] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="unk"):
        tokens_to_ids(df, {"a": 1})


def test_token_vocab_reserved_collision_raises(spark):
    from kafka_connect_ftp_spark.operators.bpe import build_token_vocab

    df = spark.createDataFrame(
        [(1, ["<unk>", "x"])], "doc_id bigint, bpe_tokens array<string>"
    )
    with pytest.raises(ValueError, match="reserved"):
        build_token_vocab(df)
