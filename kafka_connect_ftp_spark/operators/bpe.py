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
  pairs weighted by word count, aggregate, take the global best pair
  (one tiny driver scalar per round, like connected_components'
  convergence count), and apply the merge with a JVM-side left-to-right
  ``aggregate`` fold over each word's symbol array — no Python in the
  loop;
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


def train_bpe(
    docs: DataFrame, num_merges: int, *, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules. Returns them in rank order.

    Each round costs two small jobs over the word table (best-pair agg +
    checkpoint of the rewritten table); training stops early when no
    adjacent pair is left. For production vocab sizes, note that rounds
    are inherently sequential — this is the algorithm, not a plan
    artifact; batching non-conflicting merges per round is the standard
    large-scale variant and composes with this table layout.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    words = word_counts(docs, text_col=text_col).select(
        F.expr("filter(split(word, ''), c -> c <> '')").alias("syms"), "count"
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = _best_pair_frame(words).limit(1).collect()
        if not pairs:
            break
        best = pairs[0]
        merges.append((best.a, best.b))
        new_words = _apply_merge(words, best.a, best.b).localCheckpoint(eager=True)
        # Drop the superseded table's reference: localCheckpoint blocks
        # are reclaimed by ContextCleaner on GC once unreferenced
        # (DataFrame.unpersist is a no-op for them — see
        # operators/dedup_cluster.py), so at most a few word-table
        # copies are live between GCs.
        words = new_words
    return merges


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
