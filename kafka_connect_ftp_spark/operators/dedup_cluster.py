"""Duplicate-cluster resolution: connected components over a near-dup
pair graph (e.g. minhash_lsh_pairs output), yielding one keeper per
cluster — the step that turns candidate pairs into an actual dedup
decision.

Algorithm: iterative min-label propagation WITH pointer jumping. Every
doc starts labeled with itself; each round, a node adopts the minimum of
its own label, its neighbors' labels, and its label's label (the
pointer-jumping/path-halving step); converged when no label changes.
Plain neighbor propagation needs diameter rounds — a 260-node chain-ish
near-dup cluster at sf0.01 blew past a 20-round cap — while the
label-of-label hop doubles the propagation distance per round, giving
O(log n) convergence on any component shape. Each round is two joins +
one aggregation, all shuffles on doc_id; convergence is a flag column
computed during the update and filter-counted off the checkpointed
blocks (no old-vs-new join), so the driver only sees a scalar per round.

Path selection: a single bounded probe — ``limit(driver_threshold + 1)
.toPandas()`` — both decides the path and, in the driver regime,
already IS the edge collect (round 12: the former cache+count+collect
shape paid two jobs and an InMemoryRelation write for the same bytes).
At or below ``driver_threshold`` edges the components are solved with a
driver union-find — a near-dup candidate graph is usually TINY relative
to its corpus (pairs survive banding + verification), and at that size
the distributed loop's cost is pure scheduling: O(log n) whole-cluster
rounds of two joins plus a checkpoint to relabel a few thousand rows. The default threshold (1M
directed edges ≈ 16 MB columnar) is the same bounded-collect class as
the KMV sketch staging; union-by-min-root with path compression yields
byte-identical (min-reachable-id) labels. Above the threshold — the
100 TB regime where the pair graph itself is huge — the pointer-jumping
loop runs exactly as before (tests force it with ``driver_threshold=0``).

Threshold placement, measured (round 10, local[32], 5M directed
chain-ish edges): the two paths break even at ~30s each — the raw
union-find is ~2s, the rest is the Arrow collect + the pandas→Spark
re-frame of the label table, which scales with node count. Below ~1M
edges the driver path wins outright (sub-second vs whole-cluster join
rounds); past the break-even the distributed loop pulls ahead, so the
1M default sits safely inside the driver-wins regime with headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(spark, pdf, id_type) -> DataFrame:
    """Solve components on the driver for a bounded edge set already
    collected as a pandas frame (Arrow columnar, not Row objects): union
    by MIN root with path compression — the component root is provably
    its minimum id, so labels match the distributed loop exactly.
    Id-TYPE-agnostic like the distributed loop (its F.least/F.min work
    on any orderable type): values are compared with Python ``<``, which
    for ints and strings orders identically to Spark's comparators
    (UTF-8 strings compare by code point in both)."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"], pdf["dst"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # larger root under smaller: root stays the min
    nodes = pdf["src"].drop_duplicates()  # both directions present
    import pandas as pd

    out = pd.DataFrame({"doc_id": nodes, "cluster": [find(n) for n in nodes]})
    return spark.createDataFrame(
        out,
        StructType(
            [StructField("doc_id", id_type), StructField("cluster", id_type)]
        ),
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20, *, driver_threshold: int = 1_000_000
) -> DataFrame:
    """``pairs``: (doc_a, doc_b) undirected edges. Returns (doc_id, cluster)
    where cluster = min doc_id reachable. ``driver_threshold``: directed
    edge count at or below which the driver union-find path is taken
    (module doc); 0 forces the distributed loop."""
    # both edge directions from ONE pass over pairs (map-side explode):
    # a union of two selects would evaluate the pairs lineage — often an
    # expensive minhash/LSH plan — once per branch before the cache
    # materializes
    edges_plan = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    if driver_threshold > 0:
        # ONE bounded action decides the path AND delivers the edges
        # (round 12, guide §1.2/§5): limit(threshold+1).toPandas() runs
        # the pairs lineage once and collects at most threshold+1 rows —
        # when nothing is truncated (the common, by-design regime) the
        # driver path needs no cache write, no separate count job and no
        # second pass. The previous shape paid cache-materialize+count
        # then a cache-read collect: two jobs and an InMemoryRelation
        # write for the same bytes. An over-threshold graph pays the
        # probe once more when the distributed loop re-materializes the
        # edges below — the documented trade: that regime is the huge-
        # graph path where one extra bounded probe is noise against the
        # O(log n) join rounds that follow.
        pdf = edges_plan.limit(driver_threshold + 1).toPandas()
        if len(pdf) <= driver_threshold:
            return _driver_union_find(
                pairs.sparkSession, pdf, edges_plan.schema["src"].dataType
            )
    edges = edges_plan.cache()
    edges.count()  # materialize the cache before the loop reads it twice per round
    # Initialization FOLDS the would-be first propagation round into one
    # aggregation: with identity labels, round 0's neighbor-min is just
    # min(neighbor doc_id) and the pointer-jump hop is the identity, so
    # labels₀ = min(self, min neighbor) — computed with a single
    # map-side-combined groupBy instead of the distinct + two joins +
    # checkpoint a loop round costs. (Every node appears as src because
    # edges carry both directions.)
    # cache(), not localCheckpoint: the lineage is one agg over the cached
    # edges (no truncation needed yet), and round 1's labels.unpersist()
    # actually frees a CACHE entry — DataFrame.unpersist is a no-op for
    # localCheckpoint blocks, which only ContextCleaner reclaims on GC
    labels = (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("dst").alias("_m"))
        .select("doc_id", F.least(F.col("doc_id"), F.col("_m")).alias("cluster"))
        .cache()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("cluster").alias("n_cluster"))
        )
        # pointer jumping: each node also looks up its LABEL's label, so a
        # min label travels 2^round hops instead of `round` hops
        hop = labels.select(
            F.col("doc_id").alias("h_id"), F.col("cluster").alias("h_cluster")
        )
        # localCheckpoint (eager) TRUNCATES the logical plan each round:
        # with cache() alone the lineage still grows per iteration and
        # Catalyst analysis time explodes exponentially (~2× per round).
        # On a cluster with unreliable executors use checkpoint() to a
        # reliable dir instead.
        new_cluster = F.least(
            F.col("cluster"),
            F.coalesce(F.col("n_cluster"), F.col("cluster")),
            F.coalesce(F.col("h_cluster"), F.col("cluster")),
        )
        # the convergence flag rides the checkpointed frame (old cluster is
        # in scope during the update), so the per-round check is a plain
        # filter-count over checkpointed blocks — no old-vs-new join
        new_labels = (
            labels.join(neighbor_min, labels["doc_id"] == neighbor_min["src"], "left")
            .join(hop, labels["cluster"] == hop["h_id"], "left")
            .select(
                "doc_id",
                new_cluster.alias("cluster"),
                (new_cluster != F.col("cluster")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("_changed").count()
        # Release the superseded round's blocks: unpersist frees the
        # round-1 CACHE entry eagerly; for the checkpointed frames of
        # later rounds it is a no-op — their RDD blocks are reclaimed by
        # ContextCleaner once this (the only) reference is dropped, so
        # at most a few label-set copies are ever live between GCs.
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("doc_id", "cluster")


def dedup_decision(pairs: DataFrame, corpus_ids: DataFrame) -> DataFrame:
    """Full dedup decision: (doc_id, cluster, keep). Docs in no pair keep
    themselves; within a cluster only the min doc_id survives."""
    comps = connected_components(pairs)
    out = corpus_ids.join(comps, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster"), F.col("doc_id")).alias("cluster"),
    )
    return out.withColumn("keep", F.col("doc_id") == F.col("cluster"))
