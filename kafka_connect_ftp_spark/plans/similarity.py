"""Embedding similarity search over the ``embeddings`` table
(``vec_id BIGINT, embedding ARRAY<FLOAT>, label INT``).

Dot products are computed JVM-side with ``zip_with`` + ``aggregate`` in
DOUBLE precision with left-to-right accumulation, which matches the DuckDB
oracle's ``list_dot_product`` on ``DOUBLE[]`` bit-for-bit closely enough
that 4-decimal rounding is stable.

Scale design (100 TB of vectors):
- ``embedding_cosine_topk`` broadcasts the query vector and computes a
  global top-k (TakeOrderedAndProject — no full sort, no driver collect).
- ``ann_ivf_family`` ('label_nprobe1') is the IVF pattern: a coarse partition column
  (here the pre-assigned ``label``; in production a KMeans centroid id)
  prunes the scan to nprobe=1 partitions. With the table written
  partitioned-by-centroid, partition pruning makes this a sub-scan.
- ``embedding_near_dup_pairs`` blocks pairwise comparison inside coarse
  partitions only — the standard blocked all-pairs design; cross-partition
  recall is recovered by multi-probe in production.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables


def _emb(spark, sf_dir):
    return (
        load_tables(spark, sf_dir, "embeddings")["embeddings"]
        .withColumn("v", F.col("embedding").cast("array<double>"))
    )


# the dot-product template and the cosine Column are defined ONCE, in
# operators/ann.py — same single-definition rule as the hyperplane/lsh
# imports below, so the oracle-checked plans and the operator library
# can never drift apart
from kafka_connect_ftp_spark.operators.ann import _DOT
from kafka_connect_ftp_spark.operators.ann import cos_expr as _cos


# the hyperplane matrix and the sign-bit bucketing are defined ONCE in
# operators/ann.py (hyperplanes / lsh_bits); the oracle embeds the same
# plane literals, so operator buckets and the oracle-checked lsh_bucket
# column can never drift apart
from kafka_connect_ftp_spark.operators.ann import hyperplanes as _hyperplanes
from kafka_connect_ftp_spark.operators.ann import lsh_bits as _lsh_bits

_PLANES = _hyperplanes()

_LSH_BITS_DUCK = " + ".join(
    f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {plane}::DOUBLE[]) >= 0 "
    f"THEN {1 << p} ELSE 0 END)"
    for p, plane in enumerate(_PLANES)
)


# SemDeDup gate knobs: the synthetic embeddings are random (max in-label
# cosine ~0.45-0.51 across SFs — no true near-dups), so the gate's eps
# is set to exercise NON-TRIVIAL duplicate groups at every SF
# (1-eps=0.42 -> 1/2/54 in-label pairs at sf0.001/0.01/0.1) rather than
# to model production semantics (production eps ~0.03-0.05). The table's
# embedding dim is pinned at 64 (all SFs) for the oracle's static series.
_SD_EPS = 0.58
_SD_DIM = 64


@register(
    "embedding_norms",
    f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS label
      FROM embeddings
    ),
    sd_pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
            / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v)))
            >= {1.0 - _SD_EPS}
    ),
    edges AS (
      SELECT va AS a, vb AS b FROM sd_pairs
      UNION ALL SELECT vb, va FROM sd_pairs
    ),
    walk(vec_id, reach) AS (
      SELECT vec_id, vec_id FROM e
      UNION
      SELECT w.vec_id, ed.b FROM walk w JOIN edges ed ON ed.a = w.reach
    ),
    grp AS (SELECT vec_id, MIN(reach) AS sd_group FROM walk GROUP BY vec_id),
    cent AS (
      SELECT label, list(m ORDER BY i) AS c FROM (
        SELECT label, CAST(i AS INTEGER) AS i, AVG(v[CAST(i AS INTEGER)]) AS m
        FROM e, generate_series(1, {_SD_DIM}) AS t(i)
        GROUP BY label, i
      ) GROUP BY label
    ),
    sims AS (
      SELECT e.vec_id, e.v, e.label,
             list_dot_product(e.v, c.c)
               / (SQRT(list_dot_product(e.v, e.v)) * SQRT(list_dot_product(c.c, c.c))) AS cs
      FROM e JOIN cent c USING (label)
    ),
    dec AS (
      SELECT s.vec_id, s.v, s.label, g.sd_group, s.cs,
             ROW_NUMBER() OVER (PARTITION BY g.sd_group ORDER BY s.cs, s.vec_id) AS rn
      FROM sims s JOIN grp g USING (vec_id)
    ),
    sqd AS (
      -- SQ8 bounds (operators/sq.py): per-dim [min, max] over the corpus
      SELECT i, MIN(v[CAST(i AS INTEGER)]) AS vmin,
             MAX(v[CAST(i AS INTEGER)]) - MIN(v[CAST(i AS INTEGER)]) AS vdiff
      FROM e CROSS JOIN generate_series(1, {_SD_DIM}) AS t(i) GROUP BY i
    ),
    sqrow AS (
      SELECT e.vec_id, t.i, d.vmin, d.vdiff, e.v[CAST(t.i AS INTEGER)] AS x,
             CASE WHEN d.vdiff = 0 THEN 0
                  ELSE CAST(round(least(greatest(
                         (e.v[CAST(t.i AS INTEGER)] - d.vmin) / d.vdiff, 0), 1) * 255)
                       AS INTEGER)
             END AS code
      FROM e CROSS JOIN generate_series(1, {_SD_DIM}) AS t(i)
      JOIN sqd d ON d.i = t.i
    ),
    sqv AS (
      SELECT vec_id,
             md5(string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)) AS sq_fp,
             ROUND(AVG(pow(x - (vmin + code / 255.0 * vdiff), 2)), 6) AS sq_mse
      FROM sqrow GROUP BY vec_id
    )
    SELECT vec_id,
           ROUND(SQRT(list_dot_product(v, v)), 4) AS l2_norm,
           CAST({_SD_DIM} AS BIGINT) AS dim, label,
           CAST({_LSH_BITS_DUCK.replace("embedding::DOUBLE[]", "v")} AS BIGINT) AS lsh_bucket,
           sd_group, ROUND(cs, 4) AS sd_centroid_sim, rn = 1 AS sd_keep,
           sqv.sq_fp, sqv.sq_mse
    FROM dec JOIN sqv USING (vec_id) ORDER BY vec_id
    """,
    doc=(
        "Per-vector profile family on one embeddings scan: L2 norm + dim "
        "(the normalization step of any vector pipeline), the random-"
        "hyperplane (SimHash-for-vectors) LSH bucket: 8 signed projections "
        "-> 256 buckets; near-dup search then compares only within buckets "
        "(multi-probe across hamming-adjacent buckets recovers recall). "
        "The bucket id is a pure projection, so at 100 TB it is a free "
        "partitioning column for the table. Round 1's embedding_lsh_buckets "
        "is the lsh_bucket column. Round 6 folds in the SemDeDup decision "
        "(operators/neardup.py:semdedup_flags, block_col path — "
        "deterministic per-label blocks and per-block mean centroids, no "
        "KMeans): duplicate-group id, centroid cosine, and the "
        "keep-least-prototypical flag, re-derived by the oracle with a "
        "recursive reachability CTE (the dedup_cluster_decision pattern) "
        "plus a per-label mean + row_number keeper rule. Round 7 folds "
        "in SQ8 scalar quantization (operators/sq.py, the faiss "
        "QT_8bit analog): sq_fp = md5 of the full 64-code vector (every "
        "byte of the real train/encode chain value-checked) and sq_mse "
        "= reconstruction error of the decode — per-dim bounds are a "
        "dimension-keyed aggregation, codes a pure zip_with projection."
    ),
)
def embedding_norms(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.neardup import semdedup_flags
    from kafka_connect_ftp_spark.operators.sq import (
        sq_decode_col,
        sq_encode_col,
        train_sq,
    )

    df = _emb(spark, sf_dir)
    bits = _lsh_bits(_PLANES)
    # SQ8 columns (round 7): the real train/encode/decode chain — code
    # fingerprint pins every byte, reconstruction MSE pins the decode
    vmin, vdiff = train_sq(df)
    codes = sq_encode_col("v", vmin, vdiff)
    dec = sq_decode_col(codes, vmin, vdiff)
    sq_mse = (
        F.aggregate(
            F.zip_with(F.col("v"), dec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(len(vmin)))
    )
    base = df.select(
        "vec_id",
        F.round(F.sqrt(F.expr(_DOT.format(a="v", b="v"))), 4).alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
        F.col("label").cast("long").alias("label"),
        bits.cast("long").alias("lsh_bucket"),
        F.md5(
            F.concat_ws(",", F.transform(codes, lambda c: c.cast("string")))
            .cast("binary")
        ).alias("sq_fp"),
        F.round(sq_mse, 6).alias("sq_mse"),
    )
    sd = semdedup_flags(df, eps=_SD_EPS, block_col="label").select(
        "vec_id",
        F.col("group").alias("sd_group"),
        F.round("centroid_sim", 4).alias("sd_centroid_sim"),
        F.col("keep").alias("sd_keep"),
    )
    return base.join(sd, "vec_id").select(
        "vec_id", "l2_norm", "dim", "label", "lsh_bucket",
        "sd_group", "sd_centroid_sim", "sd_keep", "sq_fp", "sq_mse",
    ).orderBy("vec_id")


_Q = "(SELECT embedding::DOUBLE[] FROM embeddings ORDER BY vec_id LIMIT 1)"
_QID = "(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1)"
_QLABEL = "(SELECT label FROM embeddings ORDER BY vec_id LIMIT 1)"


@register(
    "embedding_cosine_topk",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e ORDER BY vec_id LIMIT 3),
    scored AS (
      SELECT q.q_id, e.vec_id,
             ROUND(list_dot_product(e.v, q.qv)
                   / (SQRT(list_dot_product(e.v, e.v))
                      * SQRT(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
      FROM e CROSS JOIN q
    ),
    ranked AS (
      SELECT q_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, cos_sim, CAST(rn AS INTEGER) AS nn_rank
    FROM ranked WHERE rn <= 10 ORDER BY q_id, nn_rank
    """,
    doc=(
        "Batch exact retrieval — the knn JOIN (operators/knn.py): a "
        "3-query batch against the corpus, cosine top-10 EACH, through "
        "the real operator code path (broadcast query matrix, mapInPandas "
        "BLAS scoring, per-partition top-k per query so the one shuffle "
        "carries <= partitions x Q x k candidate rows, never a row per "
        "(query, vector) pair). Round 1's single-query brute-force top-k "
        "is the q_id = min(vec_id) slice. The oracle re-derives every "
        "(query, rank) cell with a cross join + window rank; "
        "self-matches rank first by construction (cos 1.0), standard "
        "knn-join semantics."
    ),
)
def embedding_cosine_topk(spark, sf_dir):
    from pyspark.sql import Window

    from kafka_connect_ftp_spark.operators.knn import knn_join

    df = _emb(spark, sf_dir)
    qs = df.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # the operator ranks on RAW cosine; the gate re-ranks on the ROUNDED
    # value (the cross-engine convention) over a k+slack candidate set so
    # a rounding collision at the k boundary can never drop the oracle's
    # pick (>16 raw-distinct candidates sharing one 4-decimal value would
    # be needed to defeat the slack)
    cand = knn_join(df, qs, k=10 + 16, vec_col="v")
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("q_id", "vec_id", F.round("cos_sim", 4).alias("cos_sim"))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= 10)
        .select(
            "q_id", "vec_id", "cos_sim", F.col("nn_rank").cast("int").alias("nn_rank")
        )
        .orderBy("q_id", "nn_rank")
    )


_ANN_LABEL_SQL = f"""
      SELECT 'label_nprobe1' AS method, vec_id,
             ROUND(list_dot_product(embedding::DOUBLE[], {_Q})
                   / (SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * SQRT(list_dot_product({_Q}, {_Q}))), 4) AS cos_sim
      FROM embeddings
      WHERE vec_id <> {_QID} AND label = {_QLABEL}
      ORDER BY cos_sim DESC, vec_id LIMIT 5
"""


@register(
    "embedding_near_dup_pairs",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 4)
             AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))) >= 0.3
    ORDER BY vec_a, vec_b
    """,
    doc=(
        "Embedding-cosine near-dup pairs, blocked by coarse partition "
        "(label) so the pairwise comparison is per-block, never global "
        "O(n²) — and tiled (operators/neardup.py) so one hot block can "
        "neither OOM a task nor serialize on one worker."
    ),
)
def embedding_near_dup_pairs(spark, sf_dir):
    # Pair generation is BLOCK-LOCAL and TILED: blocks above the cap are
    # hash-split into chunks and every chunk pair becomes an independent
    # Arrow-batched applyInPandas task scoring its pairs with one BLAS
    # matmul. Exact (no candidate dropped — the oracle's full in-block
    # join still matches), memory-bounded (~cap² per task however hot the
    # block), and parallel (a hot block fans out across the cluster
    # instead of pinning one Python worker). Nothing is broadcast
    # (round 1 broadcast the full table, which OOMs at 100 TB) and pairs
    # below the threshold are dropped inside the tile before they ever
    # become rows. See operators/neardup.py for the design.
    from kafka_connect_ftp_spark.operators.neardup import blocked_near_dup_pairs

    emb = _emb(spark, sf_dir).select("vec_id", "v", "label")
    return (
        blocked_near_dup_pairs(emb, block_col="label", threshold=0.3, block_cap=2048)
        .select("vec_a", "vec_b", F.round("cos_sim", 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )


_IVF_RAW_COS = f"""list_dot_product(embedding::DOUBLE[], {_Q})
                 / (SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * SQRT(list_dot_product({_Q}, {_Q})))"""


@register(
    "ann_ivf_family",
    f"""
    SELECT method, vec_id, cos_sim FROM (
      SELECT * FROM ({_ANN_LABEL_SQL})
      UNION ALL
      SELECT * FROM (
        SELECT 'kmeans_exact' AS method, vec_id, ROUND({_IVF_RAW_COS}, 4) AS cos_sim
        FROM embeddings
        ORDER BY {_IVF_RAW_COS} DESC, vec_id LIMIT 10
      )
    ) ORDER BY method, cos_sim DESC, vec_id
    """,
    doc=(
        "Both IVF ANN variants in one tagged result (merged round 6 so "
        "each keeps a row inside the driver's bounded correctness "
        "window): (a) 'label_nprobe1' — prune the scan to the query's "
        "coarse partition (label stands in for the KMeans centroid id), "
        "then exact top-5 within it; (b) 'kmeans_exact' — IVF with a "
        "trained KMeans coarse quantizer (operators/ann.py) run at "
        "nprobe = k (probe every cell), the recall=1.0 configuration "
        "where IVF search is provably exact, which makes the ENTIRE "
        "trained pipeline (KMeans train, cell assignment, centroid "
        "ranking, per-cell exact scoring, merge) hash-checkable against "
        "the brute-force SQL top-10: any dropped/duplicated/mis-scored "
        "vector breaks equality. The nprobe<k pruning/recall trade-off "
        "stays pinned by tests/test_ann.py (recall monotonicity vs brute "
        "force)."
    ),
)
def ann_ivf_family(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.ann import build_ivf, ivf_search

    df = _emb(spark, sf_dir)
    q = df.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("label").alias("q_label")
    )
    label_topk = (
        df.crossJoin(F.broadcast(q))
        .filter((F.col("vec_id") != F.col("q_id")) & (F.col("label") == F.col("q_label")))
        .select("vec_id", F.round(_cos("v", "qv"), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
        .select(F.lit("label_nprobe1").alias("method"), "vec_id", "cos_sim")
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # training per invocation is deliberate HERE: the trained pipeline is
    # the thing under the oracle gate (run at nprobe=k it is provably
    # exact). Production reuses a materialized, cell-partitioned index —
    # operators/ann.py write_ivf_index — and never retrains per query.
    index = build_ivf(emb, k=8, seed=42)
    query = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    # cell is training-state-dependent (not oracle-derivable) — project it
    # away; vec_id + cos_sim fully identify the search result
    kmeans_topk = ivf_search(index, query, top_k=10, nprobe=8).select(
        F.lit("kmeans_exact").alias("method"),
        "vec_id",
        F.round("cos_sim", 4).alias("cos_sim"),
    )
    return label_topk.unionByName(kmeans_topk).orderBy(
        "method", F.desc("cos_sim"), "vec_id"
    )


# ---- product quantization (operators/pq.py) under the hash gate ----
# m subspaces of dsub dims over the 64-dim embeddings; ksub centroids
# from the deterministic first-ids codebook so DuckDB can re-derive the
# ENTIRE encode -> ADC -> top-k pipeline (the trained-KMeans codebook
# path is pinned by tests/test_pq.py recall/equality instead — the same
# split as ann_ivf_label vs ann_ivf_kmeans).
_PQ_M, _PQ_KSUB, _PQ_DSUB = 4, 8, 16
_PQ_JS = ", ".join(f"({j})" for j in range(_PQ_M))
# the SAME left-to-right (x-y)^2 fold operators/pq.py uses, so encode
# argmins and ADC sums are bit-identical across engines
_PQ_SQD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2]))),"
    " (acc, x) -> acc + x)"
)
# ADC total as an explicit j0+j1+...: a bare SUM() would leave the
# float addition order to the engine
_PQ_ADC_SUM = " + ".join(
    f"MAX(CASE WHEN enc.j = {j} THEN qdist.d END)" for j in range(_PQ_M)
)


@register(
    "pq_adc_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, v
      FROM e ORDER BY vec_id LIMIT {_PQ_KSUB}
    ),
    js AS (SELECT j FROM (VALUES {_PQ_JS}) AS t(j)),
    sub AS (
      SELECT e.vec_id, js.j, e.v[(js.j*{_PQ_DSUB}+1):(js.j*{_PQ_DSUB}+{_PQ_DSUB})] AS s
      FROM e, js
    ),
    csub AS (
      SELECT cb.c, js.j, cb.v[(js.j*{_PQ_DSUB}+1):(js.j*{_PQ_DSUB}+{_PQ_DSUB})] AS s
      FROM cb, js
    ),
    dist AS (
      SELECT sub.vec_id, sub.j, csub.c, {_PQ_SQD.format(a="sub.s", b="csub.s")} AS d
      FROM sub JOIN csub ON sub.j = csub.j
    ),
    enc AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT js.j, q.v[(js.j*{_PQ_DSUB}+1):(js.j*{_PQ_DSUB}+{_PQ_DSUB})] AS s
      FROM (SELECT v FROM e ORDER BY vec_id LIMIT 1) q, js
    ),
    qdist AS (
      SELECT qsub.j, csub.c, {_PQ_SQD.format(a="qsub.s", b="csub.s")} AS d
      FROM qsub JOIN csub ON qsub.j = csub.j
    ),
    adc AS (
      SELECT enc.vec_id,
             string_agg(enc.c::VARCHAR, '-' ORDER BY enc.j) AS code_str,
             {_PQ_ADC_SUM} AS adc_raw
      FROM enc JOIN qdist ON enc.j = qdist.j AND enc.c = qdist.c
      GROUP BY enc.vec_id
    )
    SELECT vec_id, code_str, ROUND(adc_raw, 4) AS adc_dist
    FROM adc WHERE vec_id <> {_QID}
    ORDER BY adc_dist, vec_id LIMIT 10
    """,
    doc=(
        "Product-quantization ADC search (operators/pq.py) under the "
        f"full hash gate: m={_PQ_M} subspaces x ksub={_PQ_KSUB} centroids "
        "from the deterministic first-ids codebook, every vector encoded "
        "to its per-subspace argmin code (JVM folded expressions, "
        "lowest-index tie-break), and the top-10 by asymmetric distance "
        "— the query's precomputed m x ksub table summed at the code "
        "positions, so search never touches the original vectors. The "
        "oracle re-derives codebook, codes (window-rank argmin), ADC "
        "table and the funnel's ordering; code_str makes the per-vector "
        "ENCODING itself part of the hash, not just the ranking. Encode "
        "and search are both pure map-side projections + "
        "TakeOrderedAndProject: at 100 TB nothing shuffles but the "
        "top-k, and the scanned bytes are the ~16x-compressed codes, "
        "not the vectors."
    ),
)
def pq_adc_topk(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.pq import (
        adc_dist_col,
        codebook_from_vectors,
        pq_encode,
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # ONE bounded collect feeds both index-build inputs (round 12): the
    # first-ids codebook needs the ksub smallest-id vectors and the ADC
    # query is the smallest-id vector — previously two separate scans
    # (codebook_from_first_ids + an orderBy().first()) per invocation
    first_rows = (
        emb.orderBy("vec_id")
        .limit(_PQ_KSUB)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    cb = codebook_from_vectors([r["v"] for r in first_rows], m=_PQ_M, ksub=_PQ_KSUB)
    q_id = first_rows[0]["vec_id"]
    query = [float(x) for x in first_rows[0]["v"]]
    enc = pq_encode(emb, cb)
    return (
        enc.filter(F.col("vec_id") != F.lit(q_id))
        .select(
            "vec_id",
            F.array_join(
                F.transform("code", lambda c: c.cast("string")), "-"
            ).alias("code_str"),
            F.round(adc_dist_col(cb, query), 4).alias("adc_dist"),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


def _dedup_cluster_oracle() -> str:
    # DuckDB computes the same connected components with a recursive
    # reachability CTE over the minhash pair graph: walk = every (doc,
    # reachable doc) pair; the cluster id is the MIN reachable doc_id —
    # exactly the fixpoint of the engine's min-label propagation.
    from kafka_connect_ftp_spark.plans.text import _MINHASH_CTES

    return f"""
    WITH RECURSIVE {_MINHASH_CTES},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM lsh_pairs
    ),
    walk(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.doc_id, e.b FROM walk w JOIN edges e ON e.a = w.reach
    )
    SELECT doc_id, MIN(reach) AS cluster, doc_id = MIN(reach) AS keep
    FROM walk GROUP BY doc_id ORDER BY doc_id
    """


@register(
    "dedup_cluster_decision",
    _dedup_cluster_oracle(),
    doc=(
        "Full dedup decision over the minhash-LSH candidate graph: "
        "connected components (operators/dedup_cluster.py — size-"
        "adaptive: driver union-find for bounded edge sets, iterative "
        "min-label propagation with pointer jumping and per-round "
        "localCheckpoint above the threshold; label-identical, both "
        "paths test-pinned) + keeper selection. One row per document "
        "with its cluster id and keep flag. The oracle re-derives the "
        "same components with a DuckDB recursive reachability CTE, so "
        "this operator sits inside the full hash-comparison gate "
        "(round 1 had rows-only)."
    ),
)
def dedup_cluster_decision(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.dedup_cluster import dedup_decision
    from kafka_connect_ftp_spark.plans import registry as _registry

    pairs = _registry()["minhash_lsh_pairs"].fn(spark, sf_dir)
    docs = load_tables(spark, sf_dir, "documents")["documents"].select("doc_id")
    return dedup_decision(pairs, docs).orderBy("doc_id")
