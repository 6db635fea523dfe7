"""IVF approximate nearest-neighbor search with a real trained coarse
quantizer (pyspark.ml KMeans) — the scale path for vector search.

Index build: KMeans over the corpus assigns every vector a cell id; the
table is then stored partitioned by cell. Query: rank centroids by
distance to the query vector (driver-side — k centroids is tiny), probe
the ``nprobe`` nearest cells, exact-score only those partitions. With the
table partitioned by cell id, partition pruning turns each probe into a
sub-scan: at 100 TB and k=4096 cells, nprobe=8 touches ~0.2% of the data.

Scoring stays JVM-side (zip_with/aggregate in double); KMeans training is
the one iterative step and runs once per index build, not per query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def cos_expr(a: str, b: str) -> "F.Column":
    """Cosine of two array<double> columns as one Column — THE
    definition (review 9b: plans/similarity.py, plans/text.py and
    operators/knn.py each re-inlined the dot/norm/divide trio; a fix to
    the cosine form now lands once)."""
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / (na * nb)


def probe_nearest_cells(
    centroids: list[list[float]], query: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cell ids nearest the query by L2, driver-side (k
    centroids is tiny); distance ties break on cell id. Shared by
    ``ivf_search`` and the IVF-PQ funnel (operators/pq.py) so the probe
    rule can never drift between them."""

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(c, query))

    return sorted(range(len(centroids)), key=lambda i: (d2(centroids[i]), i))[:nprobe]


def query_literals(query: list[float]):
    """``(q_arr, qnorm)``: the query as a literal array column and its
    precomputed norm (driver-side — one vector, never per row)."""
    import math

    qnorm = math.sqrt(sum(x * x for x in query)) or 1.0
    return F.array(*[F.lit(float(x)) for x in query]), qnorm


def cosine_col(vec: str, qvec: str, *, qnorm: float):
    """Cosine of ``vec`` against the joined-in query column, guarded: a
    zero-norm DATABASE vector scores 0.0 — the raw 0/0 is NaN, and Spark
    sorts NaN ABOVE every real double, so an unguarded ``desc`` ranking
    would return garbage vectors as top hits. (A zero QUERY makes every
    dot product 0, so the ``or 1.0`` in ``query_literals`` already
    yields 0.0 everywhere.)"""
    dot = F.expr(_DOT.format(a=vec, b=qvec))
    vnorm = F.sqrt(F.expr(_DOT.format(a=vec, b=vec)))
    return F.when(vnorm == 0.0, F.lit(0.0)).otherwise(dot / (vnorm * F.lit(qnorm)))


@dataclass
class IvfIndex:
    assigned: DataFrame  # vec_id, v (array<double>), cell (int)
    centroids: list[list[float]]  # cell id -> centroid vector


def build_ivf(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 16, seed: int = 42) -> IvfIndex:
    """Train the coarse quantizer and assign every vector to a cell."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("features", array_to_vector("v"))
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cell").fit(feats)
    assigned = model.transform(feats).select("vec_id", "v", "cell")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return IvfIndex(assigned=assigned, centroids=centroids)


def ivf_search(index: IvfIndex, query: list[float], top_k: int = 10, nprobe: int = 2) -> DataFrame:
    """Probe the ``nprobe`` cells nearest to ``query``; exact cosine top-k
    within them. Returns (vec_id, cell, cos_sim) ordered best-first."""
    probe_cells = probe_nearest_cells(index.centroids, query, nprobe)
    q_arr, qnorm = query_literals(query)
    candidates = index.assigned.filter(F.col("cell").isin(probe_cells)).withColumn("qv", q_arr)
    return (
        candidates.select(
            "vec_id", "cell", cosine_col("v", "qv", qnorm=qnorm).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(top_k)
    )


def write_ivf_index(index: IvfIndex, path: str) -> None:
    """Materialize the index as a cell-partitioned parquet table plus a
    centroid sidecar. ``partitionBy("cell")`` is what turns nprobe into
    PARTITION PRUNING: a probe reads only its cell directories, so at
    100 TB with a k=4096 quantizer an nprobe=8 search touches ~0.2% of
    the data and the pruning shows up in the scan's PartitionFilters
    (asserted in tests/test_ann.py)."""
    import json

    index.assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    # tiny sidecar (k centroid vectors, k ≪ corpus), written THROUGH Spark
    # so any filesystem the table write supports (s3a/hdfs/...) works —
    # a local open() would break on distributed storage. The _-prefixed
    # directory is invisible to the parquet scan (Hadoop hidden-path rule).
    spark = index.assigned.sparkSession
    spark.createDataFrame([(json.dumps(index.centroids),)], "c string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/_centroids")


def read_ivf_index(spark, path: str) -> IvfIndex:
    """Open a materialized index. The returned ``assigned`` frame is the
    partitioned table — ``ivf_search`` over it prunes to the probed
    cells."""
    import json

    centroids = json.loads(spark.read.text(f"{path}/_centroids").first().value)
    assigned = spark.read.parquet(path).select("vec_id", "v", "cell")
    return IvfIndex(assigned=assigned, centroids=centroids)


def hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes (md5-parity seeded), the same
    construction plans/similarity.py embeds in the oracle-checked
    ``embedding_norms`` query."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bits(planes: list[list[float]], vec: str = "v"):
    """The bucket id as a column expression over an ``array<double>``
    column: sign bit p = 1 iff v · plane_p >= 0. THE single definition of
    the bucketing — the oracle-checked ``embedding_norms`` query and
    ``lsh_bucket`` below both use it, so they can never desynchronize."""
    bits = None
    for p, plane in enumerate(planes):
        arr = "array({})".format(", ".join(f"CAST({x} AS DOUBLE)" for x in plane))
        bit = F.when(F.expr(_DOT.format(a=vec, b=arr)) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits


def lsh_bucket(df: DataFrame, planes: list[list[float]], vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign each vector its random-hyperplane bucket (map-side only —
    a free partitioning column)."""
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return base.withColumn("bucket", lsh_bits(planes).cast("int"))


def lsh_search(
    bucketed: DataFrame,
    query: list[float],
    planes: list[list[float]],
    *,
    top_k: int = 10,
    max_hamming: int = 1,
) -> DataFrame:
    """Multi-probe LSH: exact cosine top-k over every bucket within
    ``max_hamming`` bit flips of the query's bucket.

    Single-probe (max_hamming=0) misses true neighbors that fall on the
    other side of one hyperplane; probing hamming-adjacent buckets
    recovers that recall at (n_planes choose <=h) × the bucket-scan cost
    — still a tiny fraction of the corpus. With the table written
    partitioned by bucket, the isin filter is partition pruning, so each
    probe is a sub-scan (same scale argument as IVF nprobe).
    """
    import itertools

    n = len(planes)
    qbits = sum(
        (1 << p) if sum(a * b for a, b in zip(query, plane)) >= 0 else 0
        for p, plane in enumerate(planes)
    )
    probe = [
        qbits ^ sum(1 << p for p in flips)
        for h in range(max_hamming + 1)
        for flips in itertools.combinations(range(n), h)
    ]
    q_arr, qnorm = query_literals(query)
    cand = bucketed.filter(F.col("bucket").isin(probe)).withColumn("qv", q_arr)
    return (
        cand.select(
            "vec_id", "bucket", cosine_col("v", "qv", qnorm=qnorm).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(top_k)
    )


def brute_force_topk(df: DataFrame, query: list[float], vec_col: str = "embedding", id_col: str = "vec_id", top_k: int = 10) -> DataFrame:
    """Exact baseline for recall measurement."""
    q_arr, qnorm = query_literals(query)
    base = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("qv", q_arr)
    return (
        base.select("vec_id", cosine_col("v", "qv", qnorm=qnorm).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(top_k)
    )
