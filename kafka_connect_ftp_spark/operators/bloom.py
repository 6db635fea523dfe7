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
``optimal_num_hashes`` gives k = (m/n)·ln(2). Beyond ~2 GB of bits
(≥ ~1.5B keys at 1% fpp) a single ``array<bigint>`` row hits JVM
array/row limits: ``bloom_build_sharded`` splits the key space by an
independent hash into ``n_shards`` sub-filters — one row each, same
total bits, same fpp — and ``bloom_might_contain_sharded`` probes the
matching shard through a broadcast HASH join on the shard id (still
single-row-per-probe, still codegen). ``bloom_prefilter_join`` picks
the sharded build automatically past the single-row envelope. Beyond
~8 GB of TOTAL bits (Spark's broadcast ceiling) fall back to the plain
shuffle join — that envelope is documented, not hidden.
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


# independent hash seed for shard selection — outside the 0..k-1 seed
# range the bit-position hashes use, so shard id and positions are
# independent hash functions of the key
_SHARD_SEED = 0x5BD1E995

# one array<bigint> row per sub-filter; 2^34 bits = 2 GiB of payload per
# row, comfortably under the JVM array / single-row limits
_MAX_BITS_PER_SHARD = 1 << 34


def bloom_build(
    keys: DataFrame, key_col: str, *, num_bits: int, num_hashes: int
) -> DataFrame:
    """Build the sketch: a ONE-ROW frame ``(bits array<bigint>, num_bits
    bigint, num_hashes bigint)``.

    Distributed construction: each key expands to its k bit positions
    map-side; positions aggregate per 64-bit WORD with ``bit_or`` (at
    most m/64 groups reach the shuffle regardless of key count, with
    map-side partial combine). The surviving sparse (word, bits) rows —
    at most m/64 of them, i.e. the sketch itself — are staged to the
    driver COLUMNAR (one Arrow ``toPandas`` transfer of two int64
    columns — never a ``collect()`` of per-word Row objects, whose
    ~50-100 B/row overhead would cost tens of GB of driver heap at the
    billion-key scale this operator exists for) and scattered into the
    dense array with one vectorized numpy assignment: the sketch must be
    driver-resident before it can broadcast anyway, so this transfer IS
    the broadcast staging, not a design compromise. (A prior in-plan
    assembly via a single-row map + per-index element_at was O((m/64)²)
    — Spark map lookups are linear scans — and took minutes at 1M keys;
    the numpy scatter is milliseconds.) NULL keys are skipped (a NULL
    can never equal a probe key under SQL semantics).
    """
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    key = F.col(key_col)
    pos = (
        keys.filter(key.isNotNull())
        .select(F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("word"),
            _bit_mask(F.col("p") % 64).alias("mask"),
        )
    )
    words = pos.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    [dense] = _stage_dense(words, n_shards=1, shard_words=num_bits // 64)
    return keys.sparkSession.createDataFrame(
        [(dense.tolist(), num_bits, num_hashes)],
        "bits array<bigint>, num_bits bigint, num_hashes bigint",
    )


def _stage_dense(words: DataFrame, *, n_shards: int, shard_words: int):
    """Columnar driver staging shared by the flat and sharded builds:
    one Arrow transfer of the sparse ``(word, bits)`` agg (``word`` is
    the GLOBAL word index = shard * shard_words + local word), then one
    vectorized scatter per shard. Returns a list of ``n_shards`` numpy
    int64 arrays of ``shard_words`` words each."""
    import numpy as np

    pdf = words.toPandas()
    w = pdf["word"].to_numpy(dtype=np.int64, copy=False)
    b = pdf["bits"].to_numpy(dtype=np.int64, copy=False)
    out = []
    for s in range(n_shards):
        dense = np.zeros(shard_words, dtype=np.int64)
        in_shard = (w >= s * shard_words) & (w < (s + 1) * shard_words)
        dense[w[in_shard] - s * shard_words] = b[in_shard]
        out.append(dense)
    return out


def bloom_build_sharded(
    keys: DataFrame,
    key_col: str,
    *,
    num_bits: int,
    num_hashes: int,
    n_shards: int,
) -> DataFrame:
    """Build ``n_shards`` independent sub-filters in ONE distributed
    pass: row s holds the bits for the keys whose
    ``pmod(xxhash64(key, _SHARD_SEED), n_shards)`` is s. ``num_bits``
    is the TOTAL bit budget, split evenly (each shard gets
    ``num_bits / n_shards`` bits, a multiple of 64); with an evenly
    hashed key split, bits-per-key — hence fpp — matches the flat build.
    Output: ``(shard int, bits array<bigint>, num_bits bigint,
    num_hashes bigint, n_shards int)`` with per-SHARD ``num_bits``.

    This is the > ~2 GB envelope (``_MAX_BITS_PER_SHARD``): a flat
    ``array<bigint>`` row would hit JVM array/row limits, while n
    bounded rows broadcast fine up to Spark's ~8 GB total ceiling.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if num_bits % (64 * n_shards) != 0:
        raise ValueError(
            f"num_bits must be a multiple of 64*n_shards, got {num_bits} / {n_shards}"
        )
    shard_bits = num_bits // n_shards
    shard_words = shard_bits // 64
    key = F.col(key_col)
    shard = F.pmod(F.xxhash64(key, F.lit(_SHARD_SEED)), F.lit(n_shards))
    pos = (
        keys.filter(key.isNotNull())
        .select(
            shard.alias("shard"),
            F.explode(F.array(*_positions(key, shard_bits, num_hashes))).alias("p"),
        )
        .select(
            # global word index: one agg keyed by a single long, so the
            # columnar staging is one transfer for all shards
            (F.col("shard") * shard_words + (F.col("p") / 64).cast("long")).alias(
                "word"
            ),
            _bit_mask(F.col("p") % 64).alias("mask"),
        )
    )
    words = pos.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    dense = _stage_dense(words, n_shards=n_shards, shard_words=shard_words)
    return keys.sparkSession.createDataFrame(
        [(s, d.tolist(), shard_bits, num_hashes, n_shards) for s, d in enumerate(dense)],
        "shard int, bits array<bigint>, num_bits bigint, num_hashes bigint, n_shards int",
    )


def _probe_flag(key_col: str, bits_col: str, num_bits: int, num_hashes: int) -> Column:
    """The k bit probes as one codegen-able boolean column over the
    joined-in ``bits_col`` array (NULL key → explicit false)."""
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
    return F.when(F.col(key_col).isNull(), F.lit(False)).otherwise(flag)


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
    # collision-proof scratch names: the DERIVED meta name must be absent
    # too — a caller frame already holding "_bloom_bits_meta" (but not
    # "_bloom_bits") would otherwise make the post-join meta reference
    # ambiguous and fail with AnalysisException
    while bits_col in df.columns or bits_col + "_meta" in df.columns:
        bits_col += "_"
    flag = _probe_flag(key_col, bits_col, num_bits, num_hashes)
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


def bloom_might_contain_sharded(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    num_bits: int,
    num_hashes: int,
    n_shards: int,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Sharded twin of :func:`bloom_might_contain` over a
    :func:`bloom_build_sharded` sketch (``num_bits`` is the TOTAL
    budget, as passed to the build). Each probe row computes its shard
    id with the same independent hash the build used and picks up that
    shard's bits through a broadcast HASH join on the shard id — one
    sketch row per probe row, pure codegen, no Python."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard_bits = num_bits // n_shards
    bits_col = "_bloom_bits"
    shard_col_suffixes = ("", "_meta", "_shard")
    while any(bits_col + s in df.columns for s in shard_col_suffixes):
        bits_col += "_"
    shard_col = bits_col + "_shard"
    meta_col = bits_col + "_meta"
    flag = _probe_flag(key_col, bits_col, shard_bits, num_hashes)
    sized = F.when(
        (F.col(meta_col)["num_bits"] != F.lit(shard_bits))
        | (F.col(meta_col)["num_hashes"] != F.lit(num_hashes))
        | (F.col(meta_col)["n_shards"] != F.lit(n_shards)),
        F.raise_error(
            F.concat(
                F.lit(
                    "bloom sketch/probe sizing mismatch: sketch built with "
                    "(shard_bits, num_hashes, n_shards)=("
                ),
                F.col(meta_col)["num_bits"],
                F.lit(", "),
                F.col(meta_col)["num_hashes"],
                F.lit(", "),
                F.col(meta_col)["n_shards"],
                F.lit(f"), probed with ({shard_bits}, {num_hashes}, {n_shards})"),
            )
        ).cast("boolean"),
    ).otherwise(flag)
    # a probe shard id with NO sketch row (probing with a larger n_shards
    # than the build used, or a truncated sketch frame) must raise, not
    # silently drop the row — an inner join would filter such rows out
    # BEFORE the meta guard could evaluate, losing them from semi AND
    # anti results. LEFT join + NULL-bits check turns that into an error.
    sized = F.when(
        F.col(bits_col).isNull(),
        F.raise_error(
            F.concat(
                F.lit("bloom sketch has no row for probe shard "),
                F.col(shard_col).cast("string"),
                F.lit(f" (probed with n_shards={n_shards}; sketch built smaller or truncated)"),
            )
        ).cast("boolean"),
    ).otherwise(sized)
    sketch = bloom.select(
        F.col("shard").alias(shard_col),
        F.col("bits").alias(bits_col),
        F.struct("num_bits", "num_hashes", "n_shards").alias(meta_col),
    )
    # NULL keys still get a real shard (xxhash64 treats a NULL argument
    # as absent and hashes the seed alone), so every probe row finds a
    # sketch row; the flag itself is forced false for NULL keys.
    probe_shard = F.pmod(
        F.xxhash64(F.col(key_col), F.lit(_SHARD_SEED)), F.lit(n_shards)
    ).cast("int")
    return (
        df.withColumn(shard_col, probe_shard)
        .join(F.broadcast(sketch), shard_col, "left")
        .withColumn(flag_col, sized)
        .drop(shard_col, bits_col, meta_col)
    )


def bloom_prefilter_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    *,
    fpp: float = 0.01,
    n_keys: int | None = None,
    how: str = "left_semi",
    n_shards: int | None = None,
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

    ``n_shards`` picks the sharded sub-filter layout
    (:func:`bloom_build_sharded`); when None it is sized automatically —
    1 (flat single-row sketch) until the bit budget crosses
    ``_MAX_BITS_PER_SHARD`` (~2 GiB, where a single ``array<bigint>``
    row hits JVM limits), then the minimal shard count that keeps every
    row under it. Results are identical either way.

    Cost envelope: the semi path scans ``big`` once. The anti path scans
    ``big`` TWICE (the bloom-negative pass-through and the confirm
    branch both re-read it — Spark reuses exchanges, not arbitrary
    subtrees), trading a second columnar scan for not shuffling the
    ~(1 - selectivity) negative rows at all; at the target scale local
    scan I/O is the cheaper currency, but cache/checkpoint ``big`` first
    if it is itself an expensive derived frame. DETERMINISM: because of
    that double scan, the anti path requires ``big``'s plan to be
    deterministic — a frame built on ``rand()``, ``sample()`` or
    ``monotonically_increasing_id()`` can evaluate differently on the
    two branches, breaking the byte-identical-to-exact-join guarantee
    (rows dropped or duplicated). Cache or ``localCheckpoint`` such a
    frame before calling with ``how="left_anti"``.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"how must be left_semi or left_anti, got {how!r}")
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_keys is None:
        n_keys = keys.filter(F.col(on).isNotNull()).count()
    if n_keys == 0:
        # empty reference set: semi keeps nothing, anti keeps everything
        return big.filter(F.lit(False)) if how == "left_semi" else big
    num_bits = optimal_num_bits(n_keys, fpp)
    if n_shards is None:
        n_shards = -(-num_bits // _MAX_BITS_PER_SHARD)
    # round the total budget up so it splits into 64-bit-aligned shards,
    # THEN size k from the final budget
    num_bits = ((num_bits + 64 * n_shards - 1) // (64 * n_shards)) * 64 * n_shards
    num_hashes = optimal_num_hashes(n_keys, num_bits)
    # collision-proof scratch column name (the caller's frame may have _bf)
    flag = "_bf"
    while flag in big.columns:
        flag += "_"
    if n_shards > 1:
        bloom = bloom_build_sharded(
            keys, on, num_bits=num_bits, num_hashes=num_hashes, n_shards=n_shards
        )
        flagged = bloom_might_contain_sharded(
            big, on, bloom, num_bits=num_bits, num_hashes=num_hashes,
            n_shards=n_shards, flag_col=flag,
        )
    else:
        bloom = bloom_build(keys, on, num_bits=num_bits, num_hashes=num_hashes)
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
