"""Cross-corpus overlap estimation: "how much of the new crawl is
already in the old one?" — answered with k-minimum-values (KMV) sketches
instead of a corpus×corpus join.

Each group's sketch is its k smallest document-hash values (hashes are
uniform in [0,1), so the k-th smallest value also encodes the group's
distinct count: D ≈ (k-1)/u_k). Jaccard between two groups is estimated
from the merged sketch: take the k smallest of the union, count how many
of those sit in BOTH input sketches — that fraction IS the standard KMV
Jaccard estimator, with error ~1/sqrt(k). EXACTNESS regime: the
Jaccard/est_common for a PAIR is exact only when k >= the size of that
pair's UNION of distinct keys (then ``sorted(sa|sb)[:k]`` truncates
nothing) — k merely exceeding each group's own distinct count is NOT
enough, since two full sets of size < k can still union past k, leaving
~1/sqrt(k) estimator error. ``est_distinct`` for a single group is exact
whenever that group has STRICTLY FEWER than k distinct keys (at exactly
k a full set is indistinguishable from a truncated sketch, so the
(k-1)/u_k estimator applies). Size k with headroom over the largest
expected pairwise union when exactness matters — the regime the tests
and the corpus_report gate pin.

Scale design:
- partition-LOCAL dedup + k-min first (an Arrow-batched ``mapInPandas``
  over the two narrow ``(group, u)`` columns — the text itself never
  leaves the JVM): every input partition emits at most groups×k rows
  BEFORE any exchange, so a group with a billion docs ships k rows per
  mapper and no shuffle ever carries the corpus-wide distinct key space
  (a previous version ran a global ``distinct()`` first, whose exchange
  moved every distinct (group, hash) pair — the dominant cost at scale);
- the global step then runs on the bounded intermediate: ``distinct()``
  collapses cross-partition duplicate minima and ``row_number() <= k``
  (compiled to WindowGroupLimit, same shape as ``operators/capping.py``)
  takes the true per-group k minima;
- the surviving sketch is ≤ groups×k rows — the RESULT of the bounded
  aggregation, collected like any metrics frame (this is a deliberate,
  size-bounded collect, not a driver-side loop over data);
- pairwise estimates are O(groups² · k) driver arithmetic on that
  bounded sketch, returned as a small DataFrame for composition.

xxhash64 keys the documents: deterministic across runs/partitionings,
64-bit collisions (~n²/2⁶⁵) negligible for overlap ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def _u() -> "F.Column":
    # map xxhash64's signed-long range onto [0, 1): u = h/2^64 + 0.5
    # (built lazily — Column construction needs an active session)
    return (F.xxhash64("_key").cast("double") / F.lit(float(2**64))) + F.lit(0.5)


def kmv_sketches(
    docs: DataFrame, group_col: str = "source", k: int = 256, *, key_col: str = "text"
) -> DataFrame:
    """``(group, u)`` rows: each group's k smallest normalized hashes of
    DISTINCT ``key_col`` values. NULL keys are excluded (a NULL document
    is not content).

    Plan shape (see module doc): hash + normalize in the JVM, then a
    partition-local dedup + k-min ``mapInPandas`` over just the two
    narrow output columns — Python is the point here: Spark has no
    partial top-k-distinct aggregate, and without the local prune the
    first exchange would carry the corpus-wide distinct key space. The
    global ``distinct()`` + WindowGroupLimit then run on ≤ partitions ×
    groups × k rows."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = (
        docs.filter(F.col(key_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.col(key_col).alias("_key"),
        )
        .select("group", _u().alias("u"))
    )

    def local_kmin(batches):
        import pandas as pd

        def prune(pdf):
            return (
                pdf.drop_duplicates()
                .sort_values("u", kind="mergesort")
                .groupby("group", sort=False, dropna=False)
                .head(k)
            )

        # fold batches into a running per-group k-min of distinct u's;
        # the sort+groupby prune runs only when the accumulator crosses
        # the bound (amortized O(n log n) per partition, not per batch),
        # keeping memory at ~bound + one Arrow batch. Doubles round-trip
        # Arrow bit-exactly, so local minima equal the values the global
        # distinct sees.
        acc, bound = None, 1_000_000
        for pdf in batches:
            pdf = pdf.drop_duplicates()
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            if len(acc) > bound:
                acc = prune(acc)
        if acc is not None:
            acc = prune(acc)
            if len(acc):
                yield acc

    pruned = hashed.mapInPandas(local_kmin, "group string, u double")
    w = Window.partitionBy("group").orderBy("u")
    return (
        pruned.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def corpus_overlap_frame(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 256,
    *,
    key_col: str = "text",
) -> DataFrame:
    """:func:`corpus_overlap` as a pure PLAN — same columns, same values,
    no driver collect (round 12 optimization, guide §1.2/§5: the collect
    forced every composed report to pay an extra eager Spark job per
    invocation and disqualified it from plan memoization).

    The KMV sketch aggregation — the part that carries the 100 TB scale
    argument — is unchanged (:func:`kmv_sketches`); only the final
    O(groups² · k) pair arithmetic moves from driver Python into a tiny
    self-join over the per-group sketch ARRAYS (groups × k doubles).
    Value equivalence with the driver path:

    - the sketch arrays hold the identical doubles (``array_sort`` over
      the same k minima the collect saw), so ``merged``/``both`` compare
      bit-equal values and the set arithmetic is exact;
    - divisions/products mirror the Python expressions operand-for-
      operand in IEEE double, so unrounded intermediates are bit-equal;
    - ``F.round`` is HALF_UP while Python ``round`` is banker's — they
      can only disagree when an estimate lands EXACTLY on a rounding
      boundary (integer + 0.5, or a 4th-decimal 5 for the jaccard), a
      measure-zero event for hash-derived doubles and impossible in the
      exact full-set regime where the estimates are integer ± 1 ulp.
      ``test_overlap.py`` pins driver/frame parity in both regimes.

    A NULL group is its own group ordered FIRST (the driver path's
    contract): the pair predicate is ``a IS NULL AND b IS NOT NULL OR
    a < b``, which reproduces Python's None-first sorted enumeration.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    sk = kmv_sketches(docs, group_col, k, key_col=key_col)
    ag = sk.groupBy("group").agg(F.array_sort(F.collect_list("u")).alias("us"))
    a = ag.select(F.col("group").alias("group_a"), F.col("us").alias("ua"))
    b = ag.select(F.col("group").alias("group_b"), F.col("us").alias("ub"))
    pair_cond = (
        F.col("group_a").isNull() & F.col("group_b").isNotNull()
    ) | (F.col("group_a") < F.col("group_b"))
    merged = F.expr(f"slice(array_sort(array_union(ua, ub)), 1, {k})")
    # elements of the merged k-min present in BOTH sketches. Nested
    # array_intersect (hash-set build, O(k) per pair) replaces the
    # original filter(x -> array_contains(ua, x) AND array_contains(ub,
    # x)) HOF, whose per-element linear array_contains scans made the
    # pair arithmetic O(k²) — measured 2x the section wall at k=8192
    # (round 12). Count equivalence: _merged is distinct by
    # construction (array_union), array_intersect preserves the
    # left argument's distinct elements in order, and both forms
    # compare the identical doubles bit-equal, so the surviving
    # element SET — and therefore the count — is the same.
    both = F.size(
        F.expr("array_intersect(array_intersect(_merged, ua), ub)")
    ).cast("double")
    jac = F.when(F.size("_merged") == 0, F.lit(0.0)).otherwise(
        F.col("_both") / F.size("_merged").cast("double")
    )

    def est_distinct(us: str) -> F.Column:
        # full-set regime (fewer than k distinct): the sketch IS the set
        return F.when(
            F.size(us) < k, F.size(us).cast("double")
        ).otherwise(F.lit(float(k - 1)) / F.element_at(us, -1))

    common = F.when(
        F.col("_j") > 0.0,
        F.col("_j") / (F.lit(1.0) + F.col("_j")) * (F.col("_da") + F.col("_db")),
    ).otherwise(F.lit(0.0))
    return (
        a.join(b, pair_cond)
        .withColumn("_merged", merged)
        .withColumn("_both", both)
        .withColumn("_j", jac)
        .withColumn("_da", est_distinct("ua"))
        .withColumn("_db", est_distinct("ub"))
        .select(
            "group_a",
            "group_b",
            F.round("_j", 4).alias("est_jaccard"),
            F.round("_da", 0).cast("bigint").alias("est_distinct_a"),
            F.round("_db", 0).cast("bigint").alias("est_distinct_b"),
            F.round(common, 0).cast("bigint").alias("est_common"),
        )
    )


def corpus_overlap(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 256,
    *,
    key_col: str = "text",
) -> DataFrame:
    """Pairwise overlap report between every pair of ``group_col``
    values: ``(group_a, group_b, est_jaccard, est_distinct_a,
    est_distinct_b, est_common)`` with ``group_a < group_b``.

    ``est_common`` is the estimated number of distinct documents shared
    (J/(1+J) × (Da+Db) via inclusion–exclusion on the estimates).
    """
    spark = docs.sparkSession
    rows = kmv_sketches(docs, group_col, k, key_col=key_col).collect()
    by_group: dict[str | None, list[float]] = {}
    for r in rows:
        by_group.setdefault(r.group, []).append(r.u)
    for vals in by_group.values():
        vals.sort()
    # a NULL group is its own group (matching cap_per_group's contract);
    # it sorts first so pair enumeration tolerates the None key
    groups = sorted(by_group, key=lambda g: (g is not None, g))

    def est_distinct(vals: list[float]) -> float:
        # full-set regime (fewer than k distinct): the sketch IS the set
        if len(vals) < k:
            return float(len(vals))
        return (k - 1) / vals[-1]

    out = []
    for ia, ga in enumerate(groups):
        for gb in groups[ia + 1 :]:
            sa, sb = set(by_group[ga]), set(by_group[gb])
            merged = sorted(sa | sb)[:k]
            both = sum(1 for u in merged if u in sa and u in sb)
            j = both / len(merged) if merged else 0.0
            da, db = est_distinct(by_group[ga]), est_distinct(by_group[gb])
            common = j / (1.0 + j) * (da + db) if j > 0 else 0.0
            out.append((ga, gb, round(j, 4), round(da), round(db), round(common)))
    return spark.createDataFrame(
        out,
        "group_a string, group_b string, est_jaccard double, "
        "est_distinct_a bigint, est_distinct_b bigint, est_common bigint",
    )
