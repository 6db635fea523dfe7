"""Reusable text-dedup operator API (the library form of the oracle-tuned
plans in plans/text.py), parameterized for production use:

- ``hash_fn="xxhash64"`` (default) keeps sketches ~4× cheaper than md5;
  the oracle plans use md5 only because DuckDB must reproduce the bits.
- shingle width, signature size, and band size tune the LSH
  similarity threshold (t ≈ (1/bands)^(1/rows_per_band)).

Composition for a full corpus dedup:

    sig    = minhash_signatures(docs, "doc_id", "text")
    pairs  = lsh_candidate_pairs(sig)
    keep   = dedup_decision(pairs, docs.select("doc_id"))   # operators.dedup_cluster
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seeded_hash(col, seed: int, hash_fn: str):
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(seed), col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def char_shingles(df: DataFrame, id_col: str, text_col: str, width: int = 8) -> DataFrame:
    """Distinct character n-grams per document — map-side explode."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - {width - 1}, 1)),"
                    f" i -> substring({text_col}, i, {width}))"
                )
            )
        ).alias("sh"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 16,
    shingle_width: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, m0..m{n-1}): minhash sketch per document. Partial min
    aggregation map-side → only one sketch row per doc ever shuffles."""
    sh = char_shingles(df, id_col, text_col, shingle_width)
    return sh.groupBy("doc_id").agg(
        *[F.min(_seeded_hash(F.col("sh"), i, hash_fn)).alias(f"m{i}") for i in range(n_hashes)]
    )


def lsh_candidate_pairs(
    sig: DataFrame, *, band_size: int = 4, bucket_cap: int = 4096
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become (doc_a, doc_b)
    candidates (doc_a < doc_b). Pairs expand bucket-locally — no self-join.

    A bucket larger than ``bucket_cap`` (mass-duplicated boilerplate with
    identical band signatures) would otherwise collect its whole id list
    into ONE task and expand O(n²) pairs there; such buckets are split
    into ``ceil(n/cap)`` hash chunks and every chunk pair becomes its own
    tile task — the same exact triangle/tile decomposition as
    operators/neardup.py: every in-bucket pair lands in exactly one tile
    (duplicates across bands are removed by the final distinct, as
    before), per-task work is bounded by ~cap², and a hot bucket fans
    out across the cluster. Buckets at or under the cap keep one tile
    and zero replication, so the common case pays only the bucket-size
    pre-aggregation (map-side combined, skew-safe)."""
    if bucket_cap < 2:
        raise ValueError(f"bucket_cap must be >= 2, got {bucket_cap}")
    exploded = band_signatures(sig, band_size=band_size)
    return tiled_bucket_pairs(exploded, ["band", "bsig"], bucket_cap=bucket_cap)


def band_signatures(sig: DataFrame, *, band_size: int = 4) -> DataFrame:
    """``(doc_id, band, bsig)`` — each document's banded LSH keys, the
    ONE banding definition shared by :func:`lsh_candidate_pairs` and the
    streaming near-dup filter (`streaming/neardup_stream.py`), so batch
    and stream can never disagree on what counts as a collision."""
    n_hashes = len([c for c in sig.columns if c.startswith("m")])
    if n_hashes % band_size:
        raise ValueError(f"n_hashes={n_hashes} not divisible by band_size={band_size}")
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * band_size + i}") for i in range(band_size)]).alias("bsig"),
        )
        for b in range(n_hashes // band_size)
    ]
    return sig.select("doc_id", F.explode(F.array(*bands)).alias("bs")).select(
        "doc_id", "bs.band", "bs.bsig"
    )


def tiled_bucket_pairs(
    members: DataFrame, bucket_cols: list[str], *, id_col: str = "doc_id", bucket_cap: int = 4096
) -> DataFrame:
    """All unordered id pairs within each bucket of ``members``, with
    buckets above ``bucket_cap`` tile-decomposed (module pattern doc on
    :func:`lsh_candidate_pairs`). Returns distinct (doc_a < doc_b).

    Same chunk/tile scheme as ``operators/neardup.tile_assignments`` but
    NOT shared code, deliberately: that tiler broadcasts its block-count
    frame (block cardinality there is a quantizer's k — tiny), while an
    LSH bucket-count frame has one row per distinct band signature —
    corpus-order cardinality — so the counts here join as a shuffle with
    AQE handling any hot-bucket skew. The join is null-safe: a NULL
    bucket key is a bucket like any other (a plain equi-join would
    silently drop its members — the neardup tiler documents the same).

    ``members`` is lazily localCheckpoint-ed first: the counts
    pre-aggregation and the tile join would otherwise each evaluate the
    upstream lineage — for LSH callers that is the dominant-cost minhash
    over the full corpus, run twice."""
    members = members.localCheckpoint(eager=False)
    # counts keys renamed (_b_*): self-join column resolution against the
    # shared lineage would otherwise be ambiguous
    counts = (
        members.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            *[F.col(c).alias(f"_b_{c}") for c in bucket_cols], "_n"
        )
    )
    on = None
    for c in bucket_cols:
        cond = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        on = cond if on is None else on & cond
    tiled = (
        members.join(counts.filter(F.col("_n") > 1), on)
        .drop(*[f"_b_{c}" for c in bucket_cols])
        .withColumn("_nc", F.ceil(F.col("_n") / F.lit(bucket_cap)).cast("int"))
        .withColumn("chunk", F.pmod(F.xxhash64(F.col(id_col)), F.col("_nc")).cast("int"))
        .withColumn("_other", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .withColumn("tile_i", F.least("chunk", "_other"))
        .withColumn("tile_j", F.greatest("chunk", "_other"))
    )
    tiles = tiled.groupBy(*bucket_cols, "tile_i", "tile_j").agg(
        F.sort_array(
            F.collect_list(F.when(F.col("chunk") == F.col("tile_i"), F.col(id_col)))
        ).alias("ids_a"),
        F.sort_array(
            F.collect_list(F.when(F.col("chunk") == F.col("tile_j"), F.col(id_col)))
        ).alias("ids_b"),
    )
    # diagonal tiles expand the triangle of one chunk; off-diagonal tiles
    # the full cross of two disjoint chunks (least/greatest restores the
    # doc_a < doc_b orientation)
    diag = (
        "flatten(transform(ids_a, (x, i) ->"
        " transform(slice(ids_a, i + 2, size(ids_a) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    cross = (
        "flatten(transform(ids_a, x -> transform(ids_b,"
        " y -> struct(least(x, y) AS doc_a, greatest(x, y) AS doc_b))))"
    )
    pairs = tiles.select(
        F.explode(F.expr(f"CASE WHEN tile_i = tile_j THEN {diag} ELSE {cross} END")).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def estimated_jaccard(sig: DataFrame, pairs: DataFrame) -> DataFrame:
    """Minhash-estimated Jaccard per candidate pair: fraction of matching
    signature slots (the standard unbiased estimator)."""
    m_cols = [c for c in sig.columns if c.startswith("m")]
    a = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in m_cols])
    b = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in m_cols])
    matches = sum(F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in m_cols)
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", (matches / F.lit(len(m_cols))).alias("est_jaccard"))
    )


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Exact dedup over arbitrary columns: groups on a 64-bit content hash
    (never on the raw values), keeps the min id. Returns (keeper, n_copies,
    content_hash).

    NULLs are made position-significant before hashing: Spark's hash
    functions SKIP null arguments, so ``xxhash64('x', NULL)`` equals
    ``xxhash64(NULL, 'x')`` and rows with the same values in different
    columns would silently collapse into one group. Each column is
    wrapped as (null-flag, value) so a NULL in column 1 can never alias
    a value in column 2."""
    h = F.xxhash64(
        *[
            x
            for c in content_cols
            for x in (F.col(c).isNull().cast("int"), F.coalesce(F.col(c).cast("string"), F.lit("")))
        ]
    )
    return (
        df.groupBy(h.alias("content_hash"))
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .select("keeper", "n_copies", "content_hash")
    )
