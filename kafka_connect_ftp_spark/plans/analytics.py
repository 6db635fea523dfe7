"""General analytics operators: aggregations, windows, set ops, scalar
functions, pivot, sessionization, as-of join, changelog state-merge.

The changelog/state queries (``changelog_latest_state``, ``asof_join``)
re-express the reference's keyed-state semantics (SURVEY.md §2.4 J1, §2.5,
FtpMonitor.scala:114-117, ConnectFileMetaDataStore.scala:26) as set-based
plans: "latest record per key" is exactly the metadata-store overwrite, and
the as-of join is the state lookup generalized to event time.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables


# ---------------------------------------------------------------- aggregates


@register(
    "agg_distinct_per_status",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS total,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Hash aggregate with COUNT DISTINCT (expands to two-phase agg).",
)
def agg_distinct_per_status(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "rollup_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals (status → priority → grand total).",
)
def rollup_status_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "cube_returnflag_linestatus",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE over the two lineitem flags — all 4 grouping combinations.",
)
def cube_returnflag_linestatus(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "case_when_price_buckets",
    """
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS bucket,
           COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
    doc="CASE WHEN bucketing + aggregate.",
)
def case_when_price_buckets(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("bucket")
    )


# ------------------------------------------------------------------ windows


@register(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    doc="Top-3-per-group via ROW_NUMBER window (SURVEY §2.11 window family).",
)
def window_topk_orders_per_customer(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), F.col("rn").cast("long").alias("rn"))
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    doc="Cumulative sum per key — same shuffle profile as the state-merge.",
)
def window_running_total(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_value_delta",
    """
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS delta
    FROM events ORDER BY user_id, event_id
    """,
    doc="LAG-based per-user delta over event time.",
)
def window_lag_value_delta(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select("event_id", "user_id", F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"))
        .orderBy("user_id", "event_id")
    )


@register(
    "sort_topk_orders",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="Global top-k (TakeOrderedAndProject — no full sort at scale).",
)
def sort_topk_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


# ------------------------------------------------------------------ set ops


@register(
    "setop_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT of customer and supplier nation keys.",
)
def setop_intersect_nations(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


@register(
    "setop_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="EXCEPT: nations with customers but no suppliers.",
)
def setop_except_nations(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


@register(
    "setop_union_high_value_parties",
    """
    SELECT party, party_key FROM (
        SELECT 'customer' AS party, c_custkey AS party_key FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT 'supplier' AS party, s_suppkey AS party_key FROM supplier WHERE s_acctbal > 9000
    ) ORDER BY party, party_key
    """,
    doc="UNION (distinct) of two filtered scans with a tag column.",
)
def setop_union_high_value_parties(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].filter(F.col("c_acctbal") > 9000).select(
        F.lit("customer").alias("party"), F.col("c_custkey").alias("party_key")
    )
    s = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.lit("supplier").alias("party"), F.col("s_suppkey").alias("party_key")
    )
    return c.unionByName(s).distinct().orderBy("party", "party_key")


# ------------------------------------------------------------ scalar funcs


@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part ORDER BY p_partkey
    """,
    doc="String function projection (upper/length/substr/replace/concat).",
)
def scalar_string_funcs(spark, sf_dir):
    t = load_tables(spark, sf_dir, "part")
    return (
        t["part"]
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


@register(
    "scalar_date_funcs",
    """
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY 1, 2 ORDER BY yr, mon
    """,
    doc="Date extraction + monthly aggregate.",
)
def scalar_date_funcs(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("yr", "mon")
    )


@register(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           ROUND(POW(l_discount + 1, 3), 6) AS disc_pow,
           ROUND(ABS(l_quantity - 25), 2) AS qty_dev,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_kbucket
    FROM lineitem WHERE l_orderkey <= 1000 ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math function projection; all codegen'd JVM-side.",
)
def scalar_math_funcs(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.round(F.pow(F.col("l_discount") + 1, 3), 6).alias("disc_pow"),
            F.round(F.abs(F.col("l_quantity") - 25), 2).alias("qty_dev"),
            F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kbucket"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------- events / changelog ops


@register(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Pivot (wide counts per event type) — single-shuffle conditional agg.",
)
def pivot_event_type_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    df = t["events"].groupBy("user_id").pivot("event_type", types).count()
    return df.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in types]
    ).orderBy("user_id")


@register(
    "hour_rollup_events",
    """
    SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type
    """,
    doc="Tumbling-hour rollup — the batch analog of a streaming window agg.",
)
def hour_rollup_events(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


@register(
    "changelog_latest_state",
    """
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           ROUND(value, 4) AS last_value
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
    """,
    doc=(
        "Latest-record-per-key: the set-based form of the reference's keyed "
        "metadata store overwrite (ConnectFileMetaDataStore.scala:26; "
        "SURVEY.md §2.5). One shuffle on the state key."
    ),
)
def changelog_latest_state(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("last_ts"), F.col("event_type").alias("last_type"), F.round("value", 4).alias("last_value"))
        .orderBy("user_id")
    )


@register(
    "sessionize_events",
    """
    SELECT user_id, CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_new
        FROM events)
    ) GROUP BY user_id ORDER BY user_id
    """,
    doc="Sessionization (30-min gap) via lag + running sum — no UDF.",
)
def sessionize_events(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    is_new = F.when(gap <= 1800, F.lit(0)).otherwise(F.lit(1))
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        t["events"]
        .withColumn("session_id", F.sum(is_new).over(wsum))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "asof_join_click_purchase",
    """
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS last_purchase_ts,
           ROUND(p.value, 4) AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    ORDER BY c.event_id
    """,
    doc=(
        "As-of join: each click matched to the user's most recent prior "
        "purchase. Spark lacks a native ASOF operator; implemented as a "
        "union + last_value window over a single user_id shuffle (no "
        "pairwise range join, so it scales linearly at 100 TB). The "
        "reference's state lookup (FtpMonitor.scala:114-115) is the "
        "processing-time special case of this."
    ),
)
def asof_join_click_purchase(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"].filter(F.col("event_type").isin("click", "purchase"))
    is_p = F.col("event_type") == "purchase"
    # purchases sort before clicks at the same ts so p.ts <= c.ts is inclusive
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.when(is_p, 0).otherwise(1), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn("last_purchase_ts", F.last(F.when(is_p, F.col("ts")), ignorenulls=True).over(w))
        .withColumn("last_purchase_value", F.last(F.when(is_p, F.col("value")), ignorenulls=True).over(w))
        .filter(~is_p)
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_purchase_ts",
            F.round("last_purchase_value", 4).alias("last_purchase_value"),
        )
        .orderBy("event_id")
    )


@register(
    "sliding_window_counts",
    """
    WITH w AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - CAST(k AS INTEGER) * INTERVAL '15 minutes'
               AS window_start,
             event_type, value
      FROM events, generate_series(0, 3) AS g(k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM w GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    doc=(
        "Sliding event-time windows (1 hour every 15 min) in batch: Spark's "
        "window() expands each event into its 4 covering windows (Expand "
        "operator); the oracle replays the same expansion with a series "
        "join. The streaming form is the identical expression on a stream."
    ),
)
def sliding_window_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "normalize_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm_text
    FROM documents ORDER BY doc_id
    """,
    doc="Text normalization for dedup/matching: lowercase, strip "
    "non-alphanumerics, collapse runs of spaces — pure projection.",
)
def normalize_text(spark, sf_dir):
    t = load_tables(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " ")
    )
    return t["documents"].select("doc_id", norm.alias("norm_text")).orderBy("doc_id")
