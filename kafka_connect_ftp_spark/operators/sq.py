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
  overhead at the cost of leaving the relational type system.

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


def sq_topk(
    codes: DataFrame,
    bounds: tuple[list[float], list[float]],
    query: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric cosine top-k over the quantized corpus: the EXACT
    query scores against DECODED corpus vectors (the SQ-ADC analog —
    only the corpus side pays quantization error). Returns
    ``(vec_id, cos_sim, rank)``; ``orderBy+limit`` compiles to
    TakeOrderedAndProject. Zero-norm decodes score 0.0 (the knn.py
    NaN guard)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vmin, vdiff = bounds
    if len(query) != len(vmin):
        raise ValueError(f"query dim {len(query)} != trained dim {len(vmin)}")
    dec = sq_decode_col("codes", vmin, vdiff)
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
    cos = (
        F.lit(0.0)
        if qn == 0.0
        else F.when(nrm == 0.0, F.lit(0.0)).otherwise(dot / (nrm * F.lit(qn)))
    )
    from pyspark.sql import Window

    scored = codes.select(F.col(id_col), cos.alias("cos_sim"))
    top = scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)
    # rank window runs over the already-LIMITED k rows, not the corpus
    w = Window.orderBy(F.desc("cos_sim"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
