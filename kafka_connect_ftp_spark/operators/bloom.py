"""Bloom-filter membership: probe a huge reference key set (prior-crawl
fingerprints, benchmark n-grams, a blocklist) from a corpus scan without
shuffling the corpus and without building a per-executor hash table of
the full reference set.

The standard exact paths both have a scale cliff:

- broadcast semi-join: the reference keys themselves must fit in every
  executor as a hash map — fine for benchmark suites (millions of
  n-grams), dead at a billion-key prior-crawl fingerprint set;
- shuffle semi-join: correct at any size, but both sides shuffle — the
  100 TB corpus pays a full network pass to answer a mostly-"no"
  membership question.

The bloom sketch is the middle path: ``m`` bits summarize ``n`` keys at
~10-16 bits/key (1B keys ≈ 1.2-2 GB — broadcastable long after the key
set itself is not), membership tests are map-side bit probes, and the
one-sided error (false POSITIVES only, rate ~(1-e^{-kn/m})^k) composes
with an exact confirm join: bloom prunes the corpus to candidate
matches, the exact join runs on the tiny survivor set, and the final
result is byte-identical to the pure exact join (``bloom_prefilter_join``
below; the same pattern Spark's own runtime row-group bloom pushdown
uses, applied at operator level where the reference set is a DataFrame,
not a parquet file).

No Python runs in the probe path: the bit array is aggregated
per-64-bit-word distributedly, staged on the driver (where a broadcast
payload lives by definition — ``bloom_build`` is EAGER, like Spark's
own ``df.stat.bloomFilter``), carried as ONE row with an
``array<bigint>`` column, and probed through a broadcast single-row
cross join (the same shape as the ANN query-vector join,
``plans/similarity.py``), so probes stay inside whole-stage codegen.

Sizing: ``optimal_num_bits(n, fpp)`` gives m = -n·ln(fpp)/ln(2)²,
``optimal_num_hashes`` gives k = (m/n)·ln(2). Beyond ~2 GB of bits,
shard the reference set and chain ``bloom_might_contain`` probes, or
fall back to the shuffle join — the envelope is documented, not hidden.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_num_bits(n_keys: int, fpp: float) -> int:
    """Bits for a target false-positive rate (rounded up to a word)."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if n_keys < 1:
        raise ValueError(f"n_keys must be >= 1, got {n_keys}")
    m = int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    return ((m + 63) // 64) * 64


def optimal_num_hashes(n_keys: int, num_bits: int) -> int:
    return max(1, round(num_bits / n_keys * math.log(2)))


def _bit_mask(bit: Column) -> Column:
    # F.shiftleft only takes a Python-int shift; call the SQL function
    # directly so the per-row bit index can be a Column
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # k independent 64-bit hashes from xxhash64 over (key, i) — the seed
    # rides as a second hashed column, no reseeding API needed
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, *, num_bits: int, num_hashes: int
) -> DataFrame:
    """Build the sketch: a ONE-ROW frame ``(bits array<bigint>, num_bits
    bigint, num_hashes bigint)``.

    Distributed construction: each key expands to its k bit positions
    map-side; positions aggregate per 64-bit WORD with ``bit_or`` (at
    most m/64 groups reach the shuffle regardless of key count, with
    map-side partial combine). The surviving sparse (word, bits) rows —
    at most m/64 of them, i.e. the sketch itself — are collected and
    scattered into the dense array with numpy on the driver: the sketch
    must be driver-resident before it can broadcast anyway, so this
    collect IS the broadcast staging, not a design compromise. (A prior
    in-plan assembly via a single-row map + per-index element_at was
    O((m/64)²) — Spark map lookups are linear scans — and took minutes
    at 1M keys; the numpy scatter is milliseconds.) NULL keys are
    skipped (a NULL can never equal a probe key under SQL semantics).
    """
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    import numpy as np

    n_words = num_bits // 64
    key = F.col(key_col)
    pos = (
        keys.filter(key.isNotNull())
        .select(F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("word"),
            _bit_mask(F.col("p") % 64).alias("mask"),
        )
    )
    words = pos.groupBy("word").agg(F.bit_or("mask").alias("bits")).collect()
    dense = np.zeros(n_words, dtype=np.int64)
    for r in words:
        dense[r["word"]] = r["bits"]
    return keys.sparkSession.createDataFrame(
        [(dense.tolist(), num_bits, num_hashes)],
        "bits array<bigint>, num_bits bigint, num_hashes bigint",
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    num_bits: int,
    num_hashes: int,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Add ``flag_col``: true iff ``key_col`` MAY be in the sketched set
    (no false negatives; false positives at the sized rate). The sketch
    arrives via a broadcast single-row cross join; the k bit probes are
    pure column expressions (array index + mask test) inside codegen.

    ``num_bits``/``num_hashes`` are passed as plan-time literals (they
    must match ``bloom_build``'s) so the probe positions fold into the
    projection instead of being row-dependent expressions. A mismatch
    with the sketch's recorded sizing raises at execution time — without
    the guard an oversized probe would index past the bits array, which
    under non-ANSI Spark silently NULLs the flag (rows then vanish from
    BOTH the semi and the anti result).
    """
    bits_col = "_bloom_bits"
    while bits_col in df.columns:  # collision-proof scratch name
        bits_col += "_"
    probes = [
        (
            F.element_at(bits_col, (p / 64).cast("int") + 1).bitwiseAND(
                _bit_mask(p % 64)
            )
            != 0
        )
        for p in _positions(F.col(key_col), num_bits, num_hashes)
    ]
    flag = probes[0]
    for p in probes[1:]:
        flag = flag & p
    # NULL key → NULL flag under SQL semantics; make it an explicit false
    flag = F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(flag)
    meta_col = bits_col + "_meta"
    # fail loudly on a sketch/probe sizing mismatch instead of silently
    # mis-probing; the broadcast row carries the build-time sizing
    sized = F.when(
        (F.col(meta_col)["num_bits"] != F.lit(num_bits))
        | (F.col(meta_col)["num_hashes"] != F.lit(num_hashes)),
        F.raise_error(
            F.concat(
                F.lit("bloom sketch/probe sizing mismatch: sketch built with (num_bits, num_hashes)=("),
                F.col(meta_col)["num_bits"],
                F.lit(", "),
                F.col(meta_col)["num_hashes"],
                F.lit(f"), probed with ({num_bits}, {num_hashes})"),
            )
        ).cast("boolean"),
    ).otherwise(flag)
    return (
        df.crossJoin(
            F.broadcast(
                bloom.select(
                    F.col("bits").alias(bits_col),
                    F.struct("num_bits", "num_hashes").alias(meta_col),
                )
            )
        )
        .withColumn(flag_col, sized)
        .drop(bits_col, meta_col)
    )


def bloom_prefilter_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    *,
    fpp: float = 0.01,
    n_keys: int | None = None,
    how: str = "left_semi",
) -> DataFrame:
    """EXACT semi/anti join of ``big`` against ``keys`` with a bloom
    pre-prune of the big side: only bloom-positive rows (true matches +
    the fpp-rate false positives) reach the exact join, so the big
    side's shuffle volume drops by ~(1 - selectivity - fpp) while the
    result stays byte-identical to the plain join.

    ``n_keys`` sizes the sketch; when omitted it is counted with one
    extra aggregation over ``keys`` (pass it — an upper bound is fine,
    it only oversizes the sketch — to keep the build single-pass; the
    build itself is eager either way). Only ``left_semi``/
    ``left_anti`` are supported — those are the shapes where the prune is
    sound: a bloom false positive is removed by the exact join (semi) or
    survives it (anti).

    Cost envelope: the semi path scans ``big`` once. The anti path scans
    ``big`` TWICE (the bloom-negative pass-through and the confirm
    branch both re-read it — Spark reuses exchanges, not arbitrary
    subtrees), trading a second columnar scan for not shuffling the
    ~(1 - selectivity) negative rows at all; at the target scale local
    scan I/O is the cheaper currency, but cache/checkpoint ``big`` first
    if it is itself an expensive derived frame.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"how must be left_semi or left_anti, got {how!r}")
    if n_keys is None:
        n_keys = keys.filter(F.col(on).isNotNull()).count()
    if n_keys == 0:
        # empty reference set: semi keeps nothing, anti keeps everything
        return big.filter(F.lit(False)) if how == "left_semi" else big
    num_bits = optimal_num_bits(n_keys, fpp)
    num_hashes = optimal_num_hashes(n_keys, num_bits)
    bloom = bloom_build(keys, on, num_bits=num_bits, num_hashes=num_hashes)
    # collision-proof scratch column name (the caller's frame may have _bf)
    flag = "_bf"
    while flag in big.columns:
        flag += "_"
    flagged = bloom_might_contain(
        big, on, bloom, num_bits=num_bits, num_hashes=num_hashes, flag_col=flag
    )
    # no distinct() on the confirm side: semi/anti joins never duplicate
    # left rows, so deduplicating the reference set would only add a full
    # shuffle-aggregate of every key
    if how == "left_semi":
        # bloom-positive rows are candidates; exact join confirms
        return flagged.filter(F.col(flag)).drop(flag).join(keys.select(on), on, "left_semi")
    # anti: bloom-NEGATIVE rows are definite non-members (no false
    # negatives) and pass through without touching the join at all; only
    # bloom-positive rows need the exact anti-join to weed out FPs
    negatives = flagged.filter(~F.col(flag)).drop(flag)
    positives = flagged.filter(F.col(flag)).drop(flag).join(keys.select(on), on, "left_anti")
    return negatives.unionByName(positives)
