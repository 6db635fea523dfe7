"""Batch k-nearest-neighbor JOIN: every query in a query SET against the
corpus, top-k each — the retrieval shape production pipelines actually
run (RAG context fetch, hard-negative mining, eval-set leakage checks),
where ``operators/ann.py`` answers one broadcast query at a time.

``knn_join`` is the exact path. The query set is bounded by contract
(``max_queries`` — a query BATCH, not a second corpus) and rides to every
executor as one broadcast numpy matrix; the corpus streams through
``mapInPandas`` where each Arrow batch scores all queries at once with a
single BLAS matmul and only a per-partition top-k PER QUERY survives.
The one shuffle in the plan therefore carries at most
``partitions x Q x k`` candidate rows — never a row per (query, vector)
pair — and the final per-query rank is a ``row_number`` window over that
bounded candidate set. At 100 TB the corpus is scanned once, map-side,
and nothing proportional to corpus size ever shuffles. Scoring is
cosine; zero-norm vectors score 0.0 (the operators/ann.py guard — NaN
sorts above every real double and would otherwise win the ranking).

``ivf_knn_join`` is the approximate scale path: queries probe only their
``nprobe`` nearest coarse cells (the operators/ann.py IVF index), the
(query, cell) probe list is broadcast-joined against the cell-assigned
corpus, cosine stays a JVM fold expression, and the per-query top-k
filter compiles to WindowGroupLimit so every mapper pre-prunes to k rows
per query before the shuffle. With the index table written
``partitionBy(cell)``, the probed cells are partition pruning — the scan
cost is the probed fraction of the corpus, not the corpus.

For a query set too large to broadcast (Q beyond ``max_queries``), chunk
the queries and union the joins — each chunk is one bounded ``knn_join``
— or assign BOTH sides to cells and equi-join on cell (the
``ivf_knn_join`` shape with the probe list as a frame instead of a
literal); the all-pairs rectangle never needs to materialize.

Reference scope note: the reference connector (kafka-connect-ftp) has no
similarity operators (SURVEY §2.11); this extends the north-star ANN
family.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.ann import _DOT, IvfIndex, probe_nearest_cells

_CAND_SCHEMA = "q_id long, vec_id long, cos_sim double"


def _collect_queries(
    queries: DataFrame, q_id_col: str, q_vec_col: str, max_queries: int
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side (q_ids, Q-matrix) for a BOUNDED query batch.

    Loud failure on contract violations — a NULL/duplicate query id would
    silently corrupt per-query groups, and an oversized set belongs in
    the chunked/cell-join regime (module doc), not on the driver.
    """
    rows = (
        queries.select(
            F.col(q_id_col).cast("long").alias("q_id"),
            F.col(q_vec_col).cast("array<double>").alias("qv"),
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(rows) > max_queries:
        raise ValueError(
            f"query set exceeds max_queries={max_queries}; chunk the queries "
            "or use the cell-join regime (see operators/knn.py module doc)"
        )
    if not rows:
        raise ValueError("empty query set")
    ids = [r.q_id for r in rows]
    if any(i is None for i in ids):
        raise ValueError(f"{q_id_col} must be non-null for every query")
    if len(set(ids)) != len(ids):
        raise ValueError(f"{q_id_col} must be unique across the query set")
    if any(r.qv is None for r in rows):
        raise ValueError(f"{q_vec_col} must be non-null for every query")
    qm = np.array([r.qv for r in rows], dtype=np.float64)
    if not np.isfinite(qm).all():
        raise ValueError(f"{q_vec_col} must be finite for every query")
    return np.array(ids, dtype=np.int64), qm


def _topk_per_query(
    q_idx: np.ndarray, ids: np.ndarray, sims: np.ndarray, k: int, n_queries: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep the top-k rows per query from flat (q_idx, vec_id, sim)
    triples, ordered (sim desc, vec_id asc) — the same tie-break the
    final window uses, so local pruning can never drop a final row.

    One lexsort groups queries contiguously (O(N log N)); the per-query
    work is then just a k-slice of its range — no per-query scan of the
    flat array, so cost is independent of Q beyond the sort."""
    # lexsort: last key is primary -> (q asc, sim desc, id asc)
    order = np.lexsort((ids, -sims, q_idx))
    q_sorted = q_idx[order]
    bounds = np.searchsorted(q_sorted, np.arange(n_queries + 1))
    sel = np.concatenate(
        [order[bounds[q] : min(bounds[q] + k, bounds[q + 1])] for q in range(n_queries)]
    )
    return q_idx[sel], ids[sel], sims[sel]


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "v",
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
    max_queries: int = 4096,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for EVERY row of ``queries``.

    Returns ``(q_id, vec_id, cos_sim, nn_rank)`` with ``nn_rank`` 1..k
    per query, ordered (cos_sim desc, vec_id asc) within a query. A
    query drawn from the corpus ranks itself first (cos 1.0) — the
    standard knn-join semantic; filter ``vec_id != q_id`` downstream if
    self-matches are unwanted. ``cos_sim`` is the raw double (callers
    round for display); zero-norm corpus OR query vectors score 0.0.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q_ids, qm = _collect_queries(queries, q_id_col, q_vec_col, max_queries)
    nq = len(q_ids)
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    qnorm_safe = np.where(qnorm == 0.0, 1.0, qnorm)  # zero query -> all dots 0 -> cos 0
    base = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc_q: list[np.ndarray] = []
        acc_id: list[np.ndarray] = []
        acc_s: list[np.ndarray] = []
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf["vec_id"].isna().any() or pdf["v"].isna().any():
                raise ValueError("knn_join: NULL vec_id or vector in corpus")
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            vnorm = np.sqrt((m * m).sum(axis=1))
            sim = (m @ qm.T) / np.outer(np.where(vnorm == 0.0, 1.0, vnorm), qnorm_safe)
            sim[vnorm == 0.0, :] = 0.0
            if not np.isfinite(sim).all():
                # NaN/inf elements in a corpus vector: fail loudly — numpy
                # sorts NaN LAST while Spark's desc() sorts it FIRST, so a
                # silently-propagated NaN would make the result depend on
                # which side of the local prune the row landed (the PQ
                # encode-path NaN convention)
                bad = ids[~np.isfinite(sim).all(axis=1)][:5]
                raise ValueError(
                    f"knn_join: non-finite similarity for vec_ids {bad.tolist()} "
                    "(corpus vectors must be finite)"
                )
            # per-batch prune: flat triples, top-k per query
            qi = np.repeat(np.arange(nq), len(ids))
            vi = np.tile(ids, nq)
            sv = sim.T.reshape(-1)
            bq, bi, bs = _topk_per_query(qi, vi, sv, k, nq)
            acc_q.append(bq)
            acc_id.append(bi)
            acc_s.append(bs)
        if not acc_q:
            return
        # per-PARTITION prune across the batch winners: <= Q x k rows out
        fq, fi, fs = _topk_per_query(
            np.concatenate(acc_q), np.concatenate(acc_id), np.concatenate(acc_s), k, nq
        )
        yield pd.DataFrame({"q_id": q_ids[fq], "vec_id": fi, "cos_sim": fs})

    candidates = base.mapInPandas(score_partition, _CAND_SCHEMA)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        candidates.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("nn_rank").cast("int").alias("nn_rank"))
    )


def ivf_knn_join(
    index: IvfIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
    max_queries: int = 4096,
) -> DataFrame:
    """Approximate knn join through the IVF coarse quantizer: each query
    scores only its ``nprobe`` nearest cells. Exact within the probed
    cells (recall loss is only cross-cell, the standard IVF trade;
    ``nprobe = n_cells`` is provably exact and equals :func:`knn_join`).

    Returns ``(q_id, vec_id, cos_sim, nn_rank)`` like :func:`knn_join`.
    The probe list (Q x nprobe rows, each carrying its query vector) is
    broadcast; scoring is a JVM fold expression (no Python in the per-row
    path); the ``row_number <= k`` filter compiles to WindowGroupLimit so
    mappers pre-prune to k rows per query before the one shuffle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    q_ids, qm = _collect_queries(queries, q_id_col, q_vec_col, max_queries)
    spark = index.assigned.sparkSession
    probe_rows = [
        (int(qid), int(cell), [float(x) for x in qv])
        for qid, qv in zip(q_ids, qm)
        for cell in probe_nearest_cells(index.centroids, list(qv), nprobe)
    ]
    probes = spark.createDataFrame(probe_rows, "q_id long, cell int, qv array<double>")
    return _probe_topk(index.assigned, probes, k)


def _probe_topk(
    assigned: DataFrame, probes: DataFrame, k: int, *, force_broadcast: bool = True
) -> DataFrame:
    """Score a (q_id, cell, qv) probe frame against the cell-assigned
    corpus: join on cell (broadcast-hinted when the probe side is known
    driver-bounded; otherwise Catalyst/AQE picks — a small frame still
    auto-broadcasts, a huge one becomes the co-partitioned hash join a
    huge query set wants), JVM fold cosine, per-query top-k."""
    dot = F.expr(_DOT.format(a="v", b="qv"))
    vn = F.sqrt(F.expr(_DOT.format(a="v", b="v")))
    qn = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    cos = F.when((vn == 0.0) | (qn == 0.0), F.lit(0.0)).otherwise(dot / (vn * qn))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probes) if force_broadcast else probes, "cell")
        .select("q_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("nn_rank").cast("int").alias("nn_rank"))
    )


def ivf_knn_join_frames(
    index: IvfIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
) -> DataFrame:
    """:func:`ivf_knn_join` with NO driver-side query collect — the fully
    distributed regime for query sets of arbitrary size (re-embedding a
    whole corpus against an index, all-pairs contamination checks).

    Cell probing happens IN THE PLAN: the k centroids ride as a broadcast
    frame, every query scores all k cells with the same JVM L2 fold
    ``probe_nearest_cells`` uses (ties to the lower cell id), and a
    ``row_number <= nprobe`` filter — WindowGroupLimit pre-prunes map-side
    — yields the (q_id, cell, qv) probe frame. From there the scoring path
    is byte-identical to :func:`ivf_knn_join` (shared ``_probe_topk``).
    The probe join stays broadcast only while the query set is small;
    past the threshold Spark degrades it to a shuffled hash join on
    ``cell`` — the same plan shape, no rewrite, which is exactly the
    co-partitioned join a huge query set wants.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    spark = index.assigned.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(index.centroids)],
        "cell int, cv array<double>",
    )
    d2 = "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    wq = Window.partitionBy("q_id").orderBy(F.asc("_d2"), F.asc("cell"))
    probes = (
        queries.select(
            F.col(q_id_col).cast("long").alias("q_id"),
            F.col(q_vec_col).cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("_d2", F.expr(d2))
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("q_id", "cell", "qv")
    )
    return _probe_topk(index.assigned, probes, k, force_broadcast=False)
