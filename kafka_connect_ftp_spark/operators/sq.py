"""Scalar quantization (SQ8) for embedding tables — the faiss
``ScalarQuantizer(QT_8bit)`` analog: each dimension is affinely mapped
to an 8-bit code against per-dimension [min, max] bounds trained on
the corpus. Complements ``operators/pq.py``: PQ compresses by
subspace codebooks (higher compression, codebook training), SQ by
per-dim affine codes (simpler, no clustering, ~4x over float32,
asymmetric distance via cheap decode) — the standard first rung of the
ANN memory-reduction ladder.

Scale design:
- training is a dimension-keyed min/max aggregation — shuffle bounded
  by the DIMENSION count, never the corpus; the bounds (2 x dim
  doubles) are a contract-bounded driver collect exactly like the PQ
  codebook, and ride into the plans as array literals;
- encode/decode/score are single JVM ``zip_with``/``aggregate``
  expressions — no Python, no shuffle, fuse into any scan;
- codes are ``array<int>`` of 0..255: parquet bit-packs small
  integers, so the stored size is ~1 byte + overhead per dim, and the
  column stays SQL-portable (the DuckDB hash gate re-derives codes
  bit-exactly); a byte-packed BinaryType layout would shave the
  overhead at the cost of leaving the relational type system;
- (round 8) SQ composes into the IVF funnel exactly like PQ
  (``ivf_sq_search`` / ``write_ivf_sq_index`` /
  ``ivf_sq_search_indexed``): probe the nprobe nearest cells, scan
  ONLY those cells' codes table (partition-pruned, vector-free — the
  memory win finally reaches the scan I/O), exact-rerank the
  shortlist against the probed cells' vectors. The shortlist score is
  the SHARED ``sq_cos_col``, so the exhaustive path can never drift.

Degenerate dimensions (constant across the corpus, vdiff = 0) encode
as 0 and decode to the constant — exact, not an error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_sq(emb: DataFrame, *, vec_col: str = "v") -> tuple[list[float], list[float]]:
    """Per-dimension ``(vmin, vdiff)`` bounds from the corpus — the SQ
    "codebook" (2 x dim doubles; bounded driver collect, the PQ-codebook
    contract). NULL vectors are ignored; an empty corpus raises."""
    rows = (
        emb.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    if not rows:
        raise ValueError("train_sq: empty corpus")
    by_i = {r.i: (float(r.lo), float(r.hi)) for r in rows}
    dims = sorted(by_i)
    if dims != list(range(len(dims))):
        raise ValueError("train_sq: ragged vectors (inconsistent dimensions)")
    vmin = [by_i[i][0] for i in dims]
    vdiff = [by_i[i][1] - by_i[i][0] for i in dims]
    return vmin, vdiff


def _lit_arr(xs: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def sq_encode_col(vec: Column | str, vmin: list[float], vdiff: list[float]) -> Column:
    """``array<int>`` of 0..255 codes for ``vec`` under the bounds —
    ``round(clip((x - vmin)/vdiff, 0, 1) * 255)`` per dimension (values
    outside the trained range clamp, the faiss rule)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    shifted = F.zip_with(v, _lit_arr(vmin), lambda x, m: x - m)
    return F.zip_with(
        shifted,
        _lit_arr(vdiff),
        lambda d, w: F.when(w == 0.0, F.lit(0)).otherwise(
            F.round(F.least(F.greatest(d / w, F.lit(0.0)), F.lit(1.0)) * 255).cast("int")
        ),
    )


def sq_decode_col(codes: Column | str, vmin: list[float], vdiff: list[float]) -> Column:
    """Approximate vector (``array<double>``) from codes:
    ``vmin + code/255 * vdiff`` per dimension."""
    c = F.col(codes) if isinstance(codes, str) else codes
    scaled = F.zip_with(c, _lit_arr(vdiff), lambda k, w: k / F.lit(255.0) * w)
    return F.zip_with(scaled, _lit_arr(vmin), lambda d, m: d + m)


def sq_encode(
    emb: DataFrame,
    bounds: tuple[list[float], list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """``(id, codes)`` — the stored form of the quantized corpus."""
    vmin, vdiff = bounds
    return emb.select(
        F.col(id_col), sq_encode_col(vec_col, vmin, vdiff).alias("codes")
    )


def sq_cos_col(
    codes_col: str,
    bounds: tuple[list[float], list[float]],
    query: list[float],
) -> Column:
    """Asymmetric cosine of the EXACT query against the DECODED codes
    (the SQ-ADC analog — only the corpus side pays quantization
    error), as one JVM expression. Zero-norm decodes score 0.0 (the
    knn.py NaN guard). Shared by ``sq_topk`` and the IVF-SQ funnel so
    the two can never drift."""
    vmin, vdiff = bounds
    if len(query) != len(vmin):
        raise ValueError(f"query dim {len(query)} != trained dim {len(vmin)}")
    dec = sq_decode_col(codes_col, vmin, vdiff)
    q = _lit_arr([float(x) for x in query])
    dot = F.aggregate(
        F.zip_with(dec, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(dec, dec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = sum(float(x) * float(x) for x in query) ** 0.5
    if qn == 0.0:
        return F.lit(0.0)
    return F.when(nrm == 0.0, F.lit(0.0)).otherwise(dot / (nrm * F.lit(qn)))


def sq_topk(
    codes: DataFrame,
    bounds: tuple[list[float], list[float]],
    query: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric cosine top-k over the full quantized corpus
    (exhaustive — the IVF-SQ funnel below is the partition-pruned
    scale path). Returns ``(vec_id, cos_sim, rank)``; ``orderBy+limit``
    compiles to TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    scored = codes.select(
        F.col(id_col), sq_cos_col("codes", bounds, query).alias("cos_sim")
    )
    top = scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    # rank window runs over the already-LIMITED k rows, not the corpus
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def ivf_sq_search(
    assigned_encoded: DataFrame,
    centroids: list[list[float]],
    bounds: tuple[list[float], list[float]],
    query: list[float],
    *,
    top_k: int = 10,
    nprobe: int = 2,
    rerank: int = 100,
) -> DataFrame:
    """The IVF-SQ funnel over a ``(vec_id, v, cell, codes)`` frame (an
    :class:`~.ann.IvfIndex` ``assigned`` with its SQ codes alongside):
    probe the ``nprobe`` nearest cells, shortlist the best ``rerank``
    by decoded asymmetric cosine (codes only — the same score
    ``sq_topk`` uses), exact-rerank by true cosine. Returns
    ``(vec_id, cell, cos_sim)`` best-first. At nprobe = n_cells and
    rerank = top_k the shortlist ids equal ``sq_topk``'s (test-pinned);
    production trades both knobs for scan volume — the same contract as
    ``pq.ivf_pq_search``, with SQ's cheaper decode in place of ADC
    tables."""
    from kafka_connect_ftp_spark.operators.ann import (
        cosine_col,
        probe_nearest_cells,
        query_literals,
    )

    probe = probe_nearest_cells(centroids, query, nprobe)
    shortlist = (
        assigned_encoded.filter(F.col("cell").isin(probe))
        .select(
            "vec_id", "v", "cell", sq_cos_col("codes", bounds, query).alias("_sq")
        )
        .orderBy(F.desc("_sq"), "vec_id")
        .limit(rerank)
    )
    q_arr, qnorm = query_literals(query)
    return (
        shortlist.withColumn("qv", q_arr)
        .select(
            "vec_id", "cell", cosine_col("v", "qv", qnorm=qnorm).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(top_k)
    )


def write_ivf_sq_index(index, bounds, path: str) -> None:
    """Materialize the IVF-SQ index as TWO cell-partitioned parquet
    tables + a JSON meta sidecar — the ``pq.write_ivf_pq_index``
    layout, with the 2 x dim SQ bounds in place of a codebook:

    - ``codes/``: ``(vec_id, codes)`` partitioned by ``cell`` — the
      ~4x-compressed table the shortlist phase scans. Physically
      separate from the vectors so the SQ memory win actually reaches
      the scan I/O, and nprobe becomes partition pruning.
    - ``vectors/``: ``(vec_id, v)`` partitioned by ``cell`` — read only
      by the exact-rerank phase.

    ``index`` is an :class:`~.ann.IvfIndex`; encoding is the pure
    ``zip_with`` projection (no Python, fuses into the write scan)."""
    import json

    vmin, vdiff = bounds
    index.assigned.select(
        "vec_id", sq_encode_col("v", vmin, vdiff).alias("codes"), "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    index.assigned.select("vec_id", "v", "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/vectors")
    spark = index.assigned.sparkSession
    meta = json.dumps(
        {"centroids": index.centroids, "vmin": list(vmin), "vdiff": list(vdiff)}
    )
    spark.createDataFrame([(meta,)], "c string").coalesce(1).write.mode(
        "overwrite"
    ).text(f"{path}/_meta")


def read_ivf_sq_index(spark, path: str):
    """Open a materialized index: ``(codes_df, vectors_df, centroids,
    bounds)`` — both frames are the partitioned tables, so searches
    prune to the probed cells."""
    import json

    meta = json.loads(spark.read.text(f"{path}/_meta").first().value)
    codes = spark.read.parquet(f"{path}/codes").select("vec_id", "codes", "cell")
    vectors = spark.read.parquet(f"{path}/vectors").select("vec_id", "v", "cell")
    return codes, vectors, meta["centroids"], (meta["vmin"], meta["vdiff"])


def ivf_sq_search_indexed(
    codes: DataFrame,
    vectors: DataFrame,
    centroids: list[list[float]],
    bounds: tuple[list[float], list[float]],
    query: list[float],
    *,
    top_k: int = 10,
    nprobe: int = 2,
    rerank: int = 100,
) -> DataFrame:
    """The funnel over a materialized index (``write_ivf_sq_index``
    layout): phase 1 scans ONLY the probed cells' codes table
    (partition-pruned, vector-free — the compressed-scan win) for the
    ``rerank``-row shortlist by decoded cosine; phase 2 joins that tiny
    broadcast shortlist against the probed cells' vectors for the
    exact top-k. Same results as :func:`ivf_sq_search` over the
    equivalent in-memory frame (test-pinned)."""
    from kafka_connect_ftp_spark.operators.ann import (
        cosine_col,
        probe_nearest_cells,
        query_literals,
    )

    probe = probe_nearest_cells(centroids, query, nprobe)
    shortlist = (
        codes.filter(F.col("cell").isin(probe))
        .select("vec_id", sq_cos_col("codes", bounds, query).alias("_sq"))
        .orderBy(F.desc("_sq"), "vec_id")
        .limit(rerank)
        .select("vec_id")
    )
    cand = vectors.filter(F.col("cell").isin(probe)).join(
        F.broadcast(shortlist), "vec_id", "left_semi"
    )
    q_arr, qnorm = query_literals(query)
    return (
        cand.withColumn("qv", q_arr)
        .select(
            "vec_id", "cell", cosine_col("v", "qv", qnorm=qnorm).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(top_k)
    )
