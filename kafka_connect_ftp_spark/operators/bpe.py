"""BPE tokenizer training on the cluster: learn merge rules from a
corpus, then tokenize with them — the step that turns a curated corpus
into a vocabulary, run where the data already lives.

Scale design — the key identity of BPE training (Sennrich et al. 2016)
is that it operates on the WORD-FREQUENCY table, not the corpus:

- one corpus pass aggregates ``(word, count)`` with map-side partial
  combine — the result is bounded by VOCABULARY size (~millions of
  rows), not corpus size (~trillions of tokens). The 100 TB of text is
  read exactly once;
- each training round runs on that small table: explode adjacent symbol
  pairs weighted by word count, aggregate, take the top
  PAIRWISE-NON-CONFLICTING pairs (``batch_size`` of them — one tiny
  driver collect per round, like connected_components' convergence
  count), and apply the whole batch with JVM-side left-to-right
  ``aggregate`` folds over each word's symbol array in ONE rewrite — no
  Python in the loop, and a 50k-merge production vocabulary costs
  ~50k/batch_size rounds instead of 50k sequential jobs;
- the word table is localCheckpoint-ed per round (same lineage-
  truncation discipline as ``operators/dedup_cluster.py``) and only
  words CONTAINING the merged pair are rewritten.

Ties on pair count break lexicographically, making training fully
deterministic — the property every test pins against a pure-Python
reference. Words are whitespace-pretokenized and merges never cross
word boundaries (GPT-2-style, no end-of-word marker).

``apply_bpe`` tokenizes with the learned ranks: the classic
lowest-rank-first merge loop per word, as an Arrow-batched pandas UDF
with a per-batch word cache — natural-language batches repeat words
heavily, so the Python loop runs once per DISTINCT word per batch, and
the rank dict rides the closure (broadcast once per executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORDS = "filter(split({col}, ' '), x -> x <> '')"


def word_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """``(word, count)`` — the corpus's single full pass."""
    return (
        docs.select(F.explode(F.expr(_WORDS.format(col=text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _best_pair_frame(words: DataFrame) -> DataFrame:
    """One round's candidate aggregation: adjacent symbol pairs weighted
    by word count, best first (count desc, then lexicographic — the
    deterministic tie-break the reference tests pin)."""
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) as a,"
                    "             element_at(syms, i + 1) as b))"
                )
            ).alias("p"),
            "count",
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("count").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
    )


def _apply_merge(words: DataFrame, a_val: str, b_val: str) -> DataFrame:
    """Rewrite only the words containing (a, b), replacing adjacent
    occurrences left-to-right greedily ('aaa' with merge (a,a) ->
    ['aa', 'a'], like the reference implementation). Pure Column API —
    the symbol values ride as literals, never as injected SQL text, so
    quotes/backslashes in corpus symbols cannot break or skew the plan."""
    a, b = F.lit(a_val), F.lit(b_val)
    syms = F.col("syms")
    contains = (F.size(syms) >= 2) & F.exists(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: (F.element_at(syms, i) == a) & (F.element_at(syms, i + 1) == b),
    )
    fold = F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, F.lit(-1)) == a) & (s == b),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.concat(a, b))),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return words.withColumn("syms", F.when(contains, fold).otherwise(syms))


def _apply_merge_batch(
    words: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Apply a CONFLICT-FREE batch of merges in ONE left-to-right fold.

    The pair set rides as a constant-folded nested map literal
    (outer[a][b] = a+b) probed with ``try_element_at`` (ANSI-safe NULL
    on a miss), so the rewrite is a single O(len) pass whose expression
    DEPTH is constant in the batch size — chaining one fold per merge
    would nest the expression tree batch-deep and fall out of codegen at
    production batch sizes. For symbol-disjoint, non-aliasing pairs
    (what ``_select_batch`` guarantees) one greedy pass equals applying
    the members sequentially in any order: a merge can never create or
    destroy another accepted pair's adjacency."""
    inner_maps = {}
    for a, b in pairs:
        inner_maps.setdefault(a, {})[b] = a + b
    m = F.map_from_arrays(
        F.array(*[F.lit(a) for a in inner_maps]),
        F.array(
            *[
                F.map_from_arrays(
                    F.array(*[F.lit(b) for b in bs]),
                    F.array(*[F.lit(v) for v in bs.values()]),
                )
                for bs in inner_maps.values()
            ]
        ),
    )
    syms = F.col("syms")

    def merged(last, s):
        # try_element_at is NULL-tolerant: a miss on the outer map gives
        # NULL, and the inner lookup on NULL propagates NULL
        return F.try_element_at(F.try_element_at(m, last), s)

    # rewrite only words containing some batch pair (same cheap exists()
    # pre-check _apply_merge uses): untouched words — the vast majority
    # of the vocabulary each round at production sizes — skip the
    # array-reallocating fold entirely
    contains = (F.size(syms) >= 2) & F.exists(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: merged(
            F.element_at(syms, i), F.element_at(syms, i + 1)
        ).isNotNull(),
    )
    fold = F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & merged(F.element_at(acc, F.lit(-1)), s).isNotNull(),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(merged(F.element_at(acc, F.lit(-1)), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return words.withColumn("syms", F.when(contains, fold).otherwise(syms))


def _select_batch(
    candidates: list, batch_size: int
) -> list[tuple[str, str]]:
    """Greedy conflict-free batch selection from count-ordered candidate
    pairs. Pair q conflicts with an already-accepted pair p when applying
    p could change q's occurrences (or vice versa): they share a symbol,
    or one pair's MERGED symbol (a+b) equals a symbol of the other — the
    "ab" case where merging (a,b) mints new tokens an existing ("ab", c)
    pair would then see. Disjoint pairs' counts are provably unaffected
    by each other's application, so applying the whole batch in one
    rewrite equals applying its members sequentially in rank order."""
    accepted: list[tuple[str, str]] = []
    symbols: set[str] = set()
    merged: set[str] = set()
    for row in candidates:
        if len(accepted) >= batch_size:
            break
        a, b, ab = row.a, row.b, row.a + row.b
        if (
            a in symbols
            or b in symbols
            or ab in symbols
            or a in merged
            or b in merged
            or ab in merged
        ):
            continue
        accepted.append((a, b))
        symbols.update((a, b))
        merged.add(ab)
    return accepted


def train_bpe(
    docs: DataFrame, num_merges: int, *, text_col: str = "text", batch_size: int = 1
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules. Returns them in rank order.

    Each round costs two small jobs over the word table (pair agg +
    checkpoint of the rewritten table); training stops early when no
    adjacent pair is left.

    ``batch_size`` is the production-vocab knob: per round, up to that
    many PAIRWISE NON-CONFLICTING pairs (no shared symbol, no
    merged-symbol aliasing — see ``_select_batch``) are taken from the
    count-ordered candidates and applied in ONE rewrite + ONE
    checkpoint, so a 50k-merge vocabulary costs ~50k/batch_size rounds
    of driver-coordinated jobs instead of 50k — the standard large-scale
    BPE variant. ``batch_size=1`` (default) is EXACTLY the sequential
    Sennrich algorithm (pinned against the pure-Python reference).
    Larger batches can deviate from the sequential merge ORDER when a
    merge mints a new pair whose count would have outranked a
    later-accepted candidate — the accepted trade of every batched BPE
    trainer; within a conflict-free batch the applied result is
    identical to applying its members sequentially.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    words = word_counts(docs, text_col=text_col).select(
        F.expr("filter(split(word, ''), c -> c <> '')").alias("syms"), "count"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        want = min(batch_size, num_merges - len(merges))
        # over-fetch so conflicting candidates can be skipped without a
        # second agg; 4x is a heuristic — a fully-conflicting candidate
        # list just yields a smaller batch this round, never wrongness
        candidates = _best_pair_frame(words).limit(max(4 * want, 8)).collect()
        if not candidates:
            break
        batch = _select_batch(candidates, want)
        merges.extend(batch)
        new_words = _apply_merge_batch(words, batch).localCheckpoint(eager=True)
        # Drop the superseded table's reference: localCheckpoint blocks
        # are reclaimed by ContextCleaner on GC once unreferenced
        # (DataFrame.unpersist is a no-op for them — see
        # operators/dedup_cluster.py), so at most a few word-table
        # copies are live between GCs.
        words = new_words
    return merges


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge table as rank-ordered parquet — the
    tokenizer artifact a separate tokenization job (or a serving stack)
    loads; one tiny file, written once from the driver."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a merge table saved by :func:`save_merges`, in rank order."""
    return [
        (r.a, r.b) for r in spark.read.parquet(path).orderBy("rank").collect()
    ]


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's BPE tokens under the learned
    merge ranks (lowest rank merges first — the standard inference rule,
    which reproduces training's segmentation). Arrow-batched; the word
    cache makes the Python loop run once per DISTINCT word per batch."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    ranks = {pair: i for i, pair in enumerate(merges)}
    # a FRESH StructType — df.schema is cached on the frame and .add()
    # would mutate it, desynchronizing the Python-side column list from
    # the JVM plan
    schema = StructType(
        list(docs.schema.fields) + [StructField(out_col, ArrayType(StringType()))]
    )

    def tokenize(batches):
        cache: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            while len(syms) >= 2:
                best_rank, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            cache[w] = syms
            return syms

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                [t for w in (text or "").split(" ") if w for t in word_tokens(w)]
                for text in pdf[text_col]
            ]
            yield pdf

    return docs.mapInPandas(tokenize, schema)


def build_token_vocab(
    tokenized: DataFrame,
    *,
    token_col: str = "bpe_tokens",
    reserved: tuple[str, ...] = ("<unk>",),
) -> dict[str, int]:
    """Assign contiguous integer ids to the corpus's tokens: reserved
    specials first (id 0.. in the given order), then tokens by frequency
    desc / token asc — deterministic across runs and partitionings. One
    token-keyed aggregate (state bounded by DISTINCT tokens, the
    lm_score/vocab_top_v shape) + a vocab-bounded collect, the same
    artifact-build cost class as the merge table itself. Reserved
    strings colliding with real corpus tokens raise (a silent remap
    would corrupt every downstream id)."""
    rows = (
        tokenized.select(F.explode(token_col).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "t")
        .collect()
    )
    clash = set(reserved) & {r.t for r in rows}
    if clash:
        raise ValueError(f"reserved tokens occur in the corpus: {sorted(clash)}")
    vocab = {tok: i for i, tok in enumerate(reserved)}
    for r in rows:
        vocab[r.t] = len(vocab)
    return vocab


def tokens_to_ids(
    df: DataFrame,
    vocab: dict[str, int],
    *,
    token_col: str = "bpe_tokens",
    out_col: str = "token_ids",
    unk: str = "<unk>",
) -> DataFrame:
    """Append ``out_col``: the token array mapped to ids under ``vocab``,
    unknown tokens to ``vocab[unk]``. Arrow-batched with the vocab dict
    riding the closure (broadcast once per executor) — the apply_bpe
    pattern; a join-based mapping would explode and re-shuffle the token
    stream for what is a per-row dictionary lookup. NULL token arrays
    stay NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if unk not in vocab:
        raise ValueError(f"vocab must contain the unk token {unk!r}")
    unk_id = vocab[unk]

    def _fn(col):
        return col.map(
            lambda toks: None
            if toks is None
            else [vocab.get(t, unk_id) for t in toks]
        )

    # real class objects, not strings: the module's `from __future__
    # import annotations` would leave pandas_udf's type-hint inference
    # with unresolvable 'pd.Series' strings (pd is function-local here)
    _fn.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_fn, "array<int>")(F.col(token_col)))
