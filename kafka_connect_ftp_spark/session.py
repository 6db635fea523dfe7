"""SparkSession factory tuned for the local[32] test harness.

At cluster scale the same settings apply except ``master`` and memory come
from the deploy environment; AQE handles runtime re-planning (partition
coalescing, skew-join splitting) so the static ``shuffle.partitions`` value
only sets the upper bound pre-AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kafka_connect_ftp_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    UTC session timezone is pinned so timestamp semantics match the DuckDB
    oracle (duckdb timestamps are UTC-naive).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces DOWN only — shuffle.partitions is a hard CEILING
        # it can never split past (skew-join splitting covers joins, not
        # aggregates). Measured round 11: a 100x corpus replication drove
        # repetition_profile's aggregate shuffle into spill at 32
        # partitions (183s; 45s at 256) and the scaling slope read a
        # phantom 1.39 superlinear term — AQE starts every shuffle at
        # this count and merges to the advisory size, so big shuffles
        # fan out while small-SF queries coalesce back to a handful of
        # partitions: same results, same plan shapes. 256 chosen by
        # interleaved A/B at both scales: the full x100 win, and within
        # host noise (±5%) of 32 on the sf0.1 bench set, where 1024's
        # per-map 1024-bucket shuffle writes cost a real ~10%. On a
        # real cluster raise it toward executor-count x cores (the
        # same knob, spark.sql.adaptive.coalescePartitions.
        # initialPartitionNum).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "256"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata parquet stores naive timestamp[us]; read as TimestampType
        # (LTZ, pinned UTC above) not TIMESTAMP_NTZ so arithmetic casts
        # (unix seconds, bigint) work and semantics match the DuckDB oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def balanced(df, spark: SparkSession, *keys: str):
    """Repartition a scan to full parallelism ONLY when it under-splits.

    A fan-out stage (shingle explode, tokenization) needs parallelism
    decoupled from input-file splittability: the driver's testdata is one
    row group per file, so a scan yields 1-3 partitions and a downstream
    explode would serialize on as many cores. At production scale the
    input has many splits and this helper is a no-op — the guard avoids
    paying a gratuitous shuffle exactly where it would hurt (large,
    already-parallel scans).

    Intended for RAW SCANS only: probing partition counts goes through
    ``df.rdd``, which under AQE would EXECUTE any upstream shuffle stages
    just to count partitions. Frames whose plan already contains a
    shuffle-inducing operator are returned untouched (their parallelism
    is governed by ``spark.sql.shuffle.partitions``, not file splits).
    The guard walks the analyzed logical plan's node types — not the plan
    STRING, which would false-positive on column names like "SortKey".

    Classic sessions only: the guard needs the JVM plan handle
    (``df._jdf``); under Spark Connect the frame is returned untouched.
    """
    jdf = getattr(df, "_jdf", None)
    if jdf is None:
        return df
    stack = [jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if any(tok in name for tok in _SHUFFLE_NODE_TOKENS):
            return df
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)


# Logical-plan node-name TOKENS whose presence means parallelism is
# governed by spark.sql.shuffle.partitions (or an explicit repartition),
# not by input file splits — balanced() must not add a shuffle on top of
# these. Matched as substrings of NODE CLASS NAMES (never the rendered
# plan string, which would false-positive on column aliases like
# "SortKey"), so the whole node family is covered: "Join" catches Join,
# AsOfJoin and LateralJoin; "Group" catches the applyInPandas/cogroup
# family (FlatMapGroupsInPandas, FlatMapCoGroupsInPandas, MapGroups, …).
_SHUFFLE_NODE_TOKENS = (
    "Join",
    "Aggregate",
    "Sort",
    "Window",
    "Repartition",
    "Rebalance",
    "Distinct",
    "Deduplicate",
    "Intersect",
    "Except",
    "Group",
)


# footer-scan memo for _nano_timestamp_cols: the pyarrow dataset walk +
# footer parse costs ~10-40ms per table per load_tables call, re-paid
# for an identical answer on every query build (round 12). Keyed by
# (path, mtime) so a regenerated testdata file invalidates its entry.
_NANO_COLS_CACHE: dict[tuple[str, float], list[str]] = {}


def _nano_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects (PARQUET_TYPE_ILLEGAL). Footer-only check via pyarrow,
    memoized per (path, mtime)."""
    key = (path, os.path.getmtime(path))
    hit = _NANO_COLS_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.dataset as ds
    import pyarrow.types as pt

    schema = ds.dataset(path, format="parquet").schema
    out = [f.name for f in schema if pt.is_timestamp(f.type) and f.type.unit == "ns"]
    _NANO_COLS_CACHE[key] = out
    if len(_NANO_COLS_CACHE) > 256:
        _NANO_COLS_CACHE.pop(next(iter(_NANO_COLS_CACHE)))
    return out


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load testdata parquet tables and register them as temp views.

    Returns a dict name -> DataFrame. Filters/projections on the returned
    frames push down to the parquet scan (verify via ``.explain``).

    Nanosecond-precision timestamp columns (unsupported by Spark's parquet
    reader) are read as raw INT64 via ``legacy.parquet.nanosAsLong`` and
    truncated to microsecond TimestampType — same instant the DuckDB oracle
    sees (test timestamps carry no sub-microsecond component).
    """
    from pyspark.sql import functions as F

    # defensive for sessions not built by get_spark: naive parquet
    # timestamps must surface as TimestampType (see get_spark)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        # scan-frame memo (round 12): spark.read.parquet pays a JVM
        # schema-analysis round trip (~0.1-0.2s) per call for an
        # identical immutable PLAN — the same argument as the registry
        # plan memo (plans/__init__.py _PLAN_MEMO). Nothing materialized
        # is cached; every execution still scans the parquet file. The
        # temp view is RE-registered on every call (cheap), so callers
        # that overwrote the view name still see load_tables restore it.
        mkey = (spark, path, os.path.getmtime(path))
        df = None
        for s, p, m, built in _SCAN_MEMO:
            if s is spark and p == path and m == mkey[2]:
                df = built
                break
        if df is None:
            nano_cols = _nano_timestamp_cols(path)
            if nano_cols:
                # restore the caller's prior value, not a hardcoded 'false' —
                # a caller running its own nano-parquet reads must not have
                # the conf silently flipped under it
                prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                try:
                    df = spark.read.parquet(path)
                    for c in nano_cols:
                        # integer div: ns epochs exceed double's 2^53 mantissa
                        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
                finally:
                    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
            else:
                df = spark.read.parquet(path)
            _SCAN_MEMO.append((spark, path, mkey[2], df))
            del _SCAN_MEMO[:-64]
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# (session object, path, mtime, DataFrame) — bounded; holds the session
# reference so a recycled id can never alias a stale entry
_SCAN_MEMO: list = []
