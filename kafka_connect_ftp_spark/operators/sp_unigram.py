"""SentencePiece-style UNIGRAM tokenizer training (Kudo 2018,
arXiv:1804.10959) on the cluster — the second of the two standard
subword vocabularies (BPE in operators/bpe.py is the first): pieces
are scored by a unigram language model fitted with EM, and
tokenization is the Viterbi segmentation under those piece
log-probabilities.

Scale design — the same key identity as BPE training: everything
operates on the WORD-FREQUENCY table (operators/bpe.py
``word_counts``), bounded by vocabulary size, never corpus size. The
corpus is read exactly once.

- **seed vocabulary**: every substring of every distinct word up to
  ``max_piece_len`` chars, weighted by word count — one explode over
  the word table (substring count per word is length-bounded, so the
  explode is vocab x L² rows, not corpus-proportional); keep the top
  ``seed_size`` by (count desc, piece asc) plus ALL single characters
  (coverage guarantee: any word segments into chars).
- **EM**: hard (Viterbi) EM — the deterministic variant: the E-step
  Viterbi-segments each DISTINCT word under the current piece
  log-probs (an Arrow-batched ``mapInPandas`` over the bounded word
  table, the piece dict riding the closure exactly like
  ``apply_bpe``'s rank dict) and emits piece counts weighted by word
  count; the M-step renormalizes (a collect bounded by the piece
  count — the PQ-codebook/BPE-best-pair contract). Soft EM's
  forward-backward expectations would converge slightly faster but
  introduce float-order nondeterminism across partitionings; Viterbi
  counts with the fixed tie-break below are bit-reproducible.
- **prune**: after each EM round, drop the lowest-log-prob
  ``prune_frac`` of MULTI-CHAR pieces (single chars never prune) until
  ``vocab_size`` remains — the standard SentencePiece schedule with
  the likelihood-delta ranking replaced by the log-prob ranking (the
  common simplification; exact on the hard-EM objective where a
  piece's contribution is count * logp).

Viterbi tie-break (the determinism contract every test pins): among
equal-score segmentations, prefer the one whose FIRST differing piece
is LONGER (greedy-longest bias, matching SentencePiece's preference
for fewer pieces), then lexicographic. No RNG anywhere.

Like BPE, evidence is rows-only + a pure-Python reference
(tests/test_sp_unigram.py): EM over Viterbi segmentations is
iterative and has no SQL-expressible oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.bpe import word_counts


def seed_vocab(
    words: DataFrame, *, max_piece_len: int = 8, seed_size: int = 2000
) -> list[tuple[str, int]]:
    """The seed piece list ``[(piece, count)]``: top ``seed_size``
    substrings by (count desc, piece asc) UNION all single chars.
    Bounded driver collect (seed_size + alphabet)."""
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    if seed_size < 1:
        raise ValueError(f"seed_size must be >= 1, got {seed_size}")
    subs = words.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)),"
                f" i -> transform(sequence(i, least(length(word), i + {max_piece_len - 1})),"
                "  j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
        "count",
    ).groupBy("piece").agg(F.sum("count").alias("n"))
    top = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("n"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    )
    chars = subs.filter(F.length("piece") == 1).collect()
    out = {r.piece: int(r.n) for r in chars}
    for r in top:
        out[r.piece] = int(r.n)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def _viterbi(
    word: str, logp: dict[str, float], max_len: int | None = None
) -> list[str] | None:
    """Best segmentation of ``word`` under piece log-probs, or None if
    uncoverable (an unseen char with chars pruned — cannot happen with
    the seed's single-char guarantee). Tie-break: longer piece at the
    first divergence, then lexicographic (module doc). ``max_len``
    bounds the candidate-piece window; when None it is derived from
    the model itself (longest piece), so a model seeded with ANY
    ``max_piece_len`` segments correctly — callers in a per-word loop
    pass it precomputed to avoid re-scanning the dict per word."""
    n = len(word)
    if max_len is None:
        max_len = max((len(p) for p in logp), default=1)
    # best[i] = (score, piece_len) for word[:i]
    NEG = float("-inf")
    best: list[tuple[float, int]] = [(NEG, 0)] * (n + 1)
    best[0] = (0.0, 0)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j][0] == NEG:
                continue
            score = best[j][0] + lp
            cur = best[i]
            # higher score wins; on exact ties prefer the LONGER final
            # piece (i-j bigger), then the lexicographically smaller one
            if (
                cur[0] == NEG
                or score > cur[0]
                or (
                    score == cur[0]
                    and (
                        (i - j) > cur[1]
                        or ((i - j) == cur[1] and piece < word[i - cur[1]: i])
                    )
                )
            ):
                best[i] = (score, i - j)
    if best[n][0] == NEG:
        return None
    out = []
    i = n
    while i > 0:
        ln = best[i][1]
        out.append(word[i - ln : i])
        i -= ln
    return out[::-1]


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _viterbi_counts(words: DataFrame, logp: dict[str, float]) -> dict[str, float]:
    """E-step: piece counts over the word table's Viterbi segmentations,
    weighted by word count. Executors see the bounded word table only;
    the aggregation returns at most |pieces| rows to the driver."""
    items = dict(logp)
    max_len = max((len(p) for p in items), default=1)

    def estep(batches):
        import pandas as pd

        for pdf in batches:
            acc: dict[str, int] = {}
            for w, c in zip(pdf["word"], pdf["count"]):
                segs = _viterbi(w, items, max_len)
                if segs is None:
                    continue
                for p in segs:
                    acc[p] = acc.get(p, 0) + int(c)
            if acc:
                yield pd.DataFrame(
                    {"piece": list(acc), "n": list(acc.values())}
                )

    agg = (
        words.mapInPandas(estep, "piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    return {r.piece: float(r.n) for r in agg}


def train_unigram(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 512,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> list[tuple[str, float]]:
    """Train the unigram piece model: ``[(piece, logp)]`` sorted by
    (logp desc, piece asc), ``len <= max(vocab_size, alphabet)``.
    One corpus pass (the word table), then EM+prune rounds on the
    bounded table (module doc)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not 0.0 < prune_frac < 1.0:
        raise ValueError(f"prune_frac must be in (0, 1), got {prune_frac}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    words = word_counts(docs, text_col=text_col).localCheckpoint(eager=True)
    pieces = dict(
        (p, float(c)) for p, c in seed_vocab(
            words, max_piece_len=max_piece_len, seed_size=seed_size
        )
    )
    logp = _normalize(pieces)
    while True:
        for _ in range(em_iters):
            counts = _viterbi_counts(words, logp)
            # pieces the E-step never used keep a floor count so chars
            # never vanish mid-round; multi-char zeros drop naturally
            counts = {
                p: counts.get(p, 0.0) if len(p) > 1 else max(counts.get(p, 0.0), 1e-9)
                for p in logp
            }
            logp = _normalize(counts)
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        n_now = len(logp)
        if n_now <= vocab_size or not multi:
            break
        drop = min(
            max(1, int(len(multi) * prune_frac)), n_now - vocab_size, len(multi)
        )
        for p, _ in multi[len(multi) - drop :]:
            del logp[p]
        # renormalize over the survivors (probabilities must sum to 1)
        logp = _normalize({p: math.exp(lp) for p, lp in logp.items()})
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def apply_unigram(
    docs: DataFrame,
    model: list[tuple[str, float]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "pieces",
) -> DataFrame:
    """Viterbi-tokenize ``text_col`` into ``out_col`` (array<string>):
    whitespace pre-tokenization, then per-word segmentation under the
    trained model — Arrow-batched with a per-batch distinct-word cache
    (the apply_bpe design; natural-language batches repeat words
    heavily). Words with uncoverable chars pass through whole."""
    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)

    def tokenize(batches):
        import pandas as pd

        for pdf in batches:
            cache: dict[str, list[str]] = {}

            def word_pieces(w: str) -> list[str]:
                got = cache.get(w)
                if got is None:
                    got = _viterbi(w, logp, max_len) or [w]
                    cache[w] = got
                return got

            out = [
                [p for w in (t or "").split(" ") if w for p in word_pieces(w)]
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pieces": out})

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    return base.mapInPandas(
        tokenize, f"doc_id {base.schema['doc_id'].dataType.simpleString()}, pieces array<string>"
    ).withColumnsRenamed({"doc_id": id_col, "pieces": out_col})


def save_unigram(spark, model: list[tuple[str, float]], path: str) -> None:
    """Persist through Spark (distributed-FS-safe, the save_merges
    convention): one (piece, logp) row per line, ordered."""
    spark.createDataFrame(
        [(i, p, float(lp)) for i, (p, lp) in enumerate(model)],
        "i long, piece string, logp double",
    ).coalesce(1).write.mode("overwrite").json(path)


def load_unigram(spark, path: str) -> list[tuple[str, float]]:
    rows = spark.read.json(path).orderBy("i").collect()
    return [(r.piece, float(r.logp)) for r in rows]
