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

from kafka_connect_ftp_spark.operators.layout import zorder_key, zorder_key_sql
from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables

# the Z-order key the scalar_funcs gate pins: exact-int dims only, so the
# interleave is deterministic on both engines (no float bucket boundary)
_Z_BITS = 8
_Z_DUCK = zorder_key_sql(["(p_size)", "(p_partkey % 256)"], bits=_Z_BITS)


# ---------------------------------------------------------------- aggregates


# status_profile (rounds 1-5: per-status COUNT DISTINCT / money totals /
# exact percentiles) was merged into advanced.order_rollup_family in
# round 6 — the identical aggregate battery now runs per GROUPING SET on
# the same orders scan, keeping the registry inside the driver's bounded
# correctness window.


@register(
    "cube_returnflag_linestatus",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty,
           ROUND(stddev_samp(l_extendedprice), 4) AS price_std,
           ROUND(var_samp(l_quantity), 4) AS qty_var,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc=(
        "CUBE over the two lineitem flags (all 4 grouping combinations) "
        "carrying the statistical aggregates (stddev/variance/corr/covar) "
        "per cell — round 1's stats_aggregates folded into the cube. "
        "ROLLUP is the subset of these grouping sets without the "
        "(linestatus)-only cell; order_rollup_family covers the "
        "explicit GROUPING SETS form."
    ),
)
def cube_returnflag_linestatus(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


# ------------------------------------------------------------------ windows


# ------------------------------------------------------------------ set ops


@register(
    "setop_family",
    """
    SELECT setop, key FROM (
      SELECT 'intersect' AS setop, nationkey AS key FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
      )
      UNION ALL
      SELECT 'except', nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9900
      )
      UNION ALL
      SELECT party, party_key FROM (
        SELECT 'union_customer' AS party, c_custkey AS party_key FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT 'union_supplier', s_suppkey FROM supplier WHERE s_acctbal > 9000
      )
    ) ORDER BY setop, key
    """,
    doc=(
        "All three set operators in one tagged result: INTERSECT (nations "
        "with customers AND suppliers), EXCEPT (nations with customers but "
        "no high-balance supplier — the s_acctbal > 9900 predicate keeps "
        "the result non-empty at every SF; round 1's plain EXCEPT matched "
        "on 0 rows and tested nothing), and UNION-distinct of high-value "
        "customer/supplier keys. Round 1's three setop_* queries merged."
    ),
)
def setop_family(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust_nations = t["customer"].select(F.col("c_nationkey").alias("key"))
    supp_nations = t["supplier"].select(F.col("s_nationkey").alias("key"))
    intersect = (
        cust_nations.intersect(supp_nations)
        .select(F.lit("intersect").alias("setop"), "key")
    )
    except_ = (
        cust_nations.subtract(
            t["supplier"].filter(F.col("s_acctbal") > 9900).select(F.col("s_nationkey").alias("key"))
        )
        .select(F.lit("except").alias("setop"), "key")
    )
    c_hi = t["customer"].filter(F.col("c_acctbal") > 9000).select(
        F.lit("union_customer").alias("setop"), F.col("c_custkey").alias("key")
    )
    s_hi = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.lit("union_supplier").alias("setop"), F.col("s_suppkey").alias("key")
    )
    union = c_hi.unionByName(s_hi).distinct()
    return intersect.unionByName(except_).unionByName(union).orderBy("setop", "key")


# ------------------------------------------------------------ scalar funcs


@register(
    "scalar_funcs",
    """
    WITH uraw AS (
      SELECT p_partkey,
             'HTTPS://User:pw@Shop' || CAST(p_partkey % 5 AS VARCHAR)
               || '.Example.COM:443/Item/' || CAST(p_partkey AS VARCHAR)
               || '?utm_source=s&id=' || CAST(p_partkey AS VARCHAR)
               || '&fbclid=x'
               || CASE WHEN p_partkey % 2 = 0 THEN '&gclid=g' ELSE '' END
               || '&ok=1#sec' AS u1,
             'HTTP://Ex' || CAST(p_partkey % 3 AS VARCHAR)
               || '.COM:80'
               || CASE WHEN p_partkey % 2 = 0 THEN '?utm_medium=m' ELSE '' END
               AS u2
      FROM part
    ),
    unorm AS (
      SELECT p_partkey,
             'https://shop' || CAST(p_partkey % 5 AS VARCHAR)
               || '.example.com/Item/' || CAST(p_partkey AS VARCHAR)
               || '?id=' || CAST(p_partkey AS VARCHAR) || '&ok=1' AS url_norm,
             'http://ex' || CAST(p_partkey % 3 AS VARCHAR) || '.com/' AS url_norm2
      FROM uraw
    ),
    -- frame-blocklist oracle twin (round 11): the FULL suffix-chain
    -- semi-join re-derived in DuckDB over bounded host probes (u2's 3
    -- distinct hosts, u3's 7) — host extraction by the same authority
    -- regex, proper dot-suffixes only when the host has > 2 labels
    -- (bare-TLD entries like 'com'/'uk' in the seeded list must match
    -- nothing), semi-join against the entry frame, decision joined
    -- back on the modular key
    blf AS (
      SELECT * FROM (VALUES ('com'), ('ex1.com'), ('shop2.co.uk'), ('uk')) b(domain)
    ),
    probes AS (
      SELECT 2 AS fam, i AS k,
             lower(regexp_extract('HTTP://Ex' || CAST(i AS VARCHAR) || '.COM:80/x',
                   '^[^:/?#]+://(?:[^/@?#]*@)?([^/?#:]+)', 1)) AS h
      FROM generate_series(0, 2) s(i)
      UNION ALL
      SELECT 3 AS fam, i AS k,
             lower(regexp_extract('http://WWW.Shop' || CAST(i AS VARCHAR) || '.co.UK/p',
                   '^[^:/?#]+://(?:[^/@?#]*@)?([^/?#:]+)', 1)) AS h
      FROM generate_series(0, 6) s(i)
    ),
    psfx AS (
      SELECT fam, k, u.sfx FROM (
        SELECT fam, k, h, string_split(h, '.') AS parts FROM probes
      ) p, UNNEST(list_prepend(p.h,
          CASE WHEN len(p.parts) > 2
               THEN list_transform(generate_series(2, len(p.parts) - 1),
                                   i -> array_to_string(p.parts[i:], '.'))
               ELSE [] END)) AS u(sfx)
    ),
    pblocked AS (
      SELECT DISTINCT fam, k FROM psfx SEMI JOIN blf ON psfx.sfx = blf.domain
    )
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
           ROUND(LN(p_retailprice + 1), 6) AS price_ln,
           ROUND(POW(p_size, 2), 2) AS size_sq,
           ROUND(ABS(p_retailprice - 1000), 2) AS price_dev,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket,
           CASE WHEN p_retailprice < 500  THEN 'cheap'
                WHEN p_retailprice < 1500 THEN 'mid'
                ELSE 'premium' END AS price_band,
           CAST({zexpr} AS BIGINT) AS zval,
           unorm.url_norm, unorm.url_norm2,
           'shop' || CAST(p_partkey % 5 AS VARCHAR) || '.example.com' AS u1_host,
           'example.com' AS u1_domain,
           p_partkey % 5 = 0 AS u1_blocked,
           p_partkey % 3 = 1 AS u2_blocked,
           'shop' || CAST(p_partkey % 7 AS VARCHAR) || '.co.uk' AS u3_domain,
           b2.k IS NOT NULL AS u2_fb,
           b3.k IS NOT NULL AS u3_fb
    FROM part JOIN unorm USING (p_partkey)
    LEFT JOIN (SELECT k FROM pblocked WHERE fam = 2) b2 ON p_partkey % 3 = b2.k
    LEFT JOIN (SELECT k FROM pblocked WHERE fam = 3) b3 ON p_partkey % 7 = b3.k
    ORDER BY p_partkey
    """.format(zexpr=_Z_DUCK),
    doc=(
        "Scalar-function projection over one scan: string functions "
        "(upper/length/substr/replace/concat), math functions "
        "(sqrt/ln/pow/abs/floor), CASE WHEN banding, and the Z-order "
        "(Morton) layout key of (p_size, p_partkey%256) — all codegen'd "
        "JVM-side. The zval column hash-pins operators/layout.py's bit "
        "interleave against the oracle's explicit shift-and-mask sum "
        "(exact integer inputs, so no float-boundary risk). Round 7 "
        "adds url_norm/url_norm2: operators/url_norm.py's REAL "
        "normalization chain over per-row constructed gnarly URLs "
        "(mixed-case scheme/host, userinfo, default ports, tracking "
        "params in every position, fragments, empty paths) — the "
        "oracle states the hand-derived canonical forms, so the whole "
        "rule set is value-checked per row. Round 10 adds the URL "
        "blocklist family (operators/url_filter.py — the C4/UT1-style "
        "domain-filter curation step): host extraction (userinfo/port "
        "stripped), the registered-domain heuristic including the "
        "multi-label-TLD branch (u3's *.co.uk), and literal-blocklist "
        "decisions with subdomain semantics (u1 blocked by exact host "
        "for partkey%5=0, u2 by entry ex1.com for partkey%3=1) — the "
        "oracle states the hand-derived hosts/domains/decisions, so "
        "the extraction+heuristic+match chain is value-checked per "
        "row. Round 11 hash-gates the FRAME blocklist path too "
        "(u2_fb/u3_fb): filter_by_blocklist's suffix-chain explode + "
        "semi-join runs over bounded probe frames and the oracle "
        "re-derives the whole chain in DuckDB (regexp host extraction, "
        ">2-label proper-suffix UNNEST, SEMI JOIN against the entry "
        "frame) — seeded entries pin bare-TLD non-matching at 2-label "
        "depth (the r10 sequence(1,0) regression) and mid-level-entry "
        "subdomain blocking. Round 1's scalar_string_funcs + "
        "scalar_math_funcs + case_when_price_buckets merged onto the "
        "part table."
    ),
)
def scalar_funcs(spark, sf_dir):
    from kafka_connect_ftp_spark.operators.url_filter import (
        filter_by_blocklist,
        host_blocked,
        registered_domain,
        url_host,
    )
    from kafka_connect_ftp_spark.operators.url_norm import normalize_url

    t = load_tables(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    u1 = F.concat(
        F.lit("HTTPS://User:pw@Shop"), (pk % 5).cast("string"),
        F.lit(".Example.COM:443/Item/"), pk.cast("string"),
        F.lit("?utm_source=s&id="), pk.cast("string"),
        F.lit("&fbclid=x"),
        F.when(pk % 2 == 0, F.lit("&gclid=g")).otherwise(F.lit("")),
        F.lit("&ok=1#sec"),
    )
    u2 = F.concat(
        F.lit("HTTP://Ex"), (pk % 3).cast("string"), F.lit(".COM:80"),
        F.when(pk % 2 == 0, F.lit("?utm_medium=m")).otherwise(F.lit("")),
    )
    band = (
        F.when(F.col("p_retailprice") < 500, "cheap")
        .when(F.col("p_retailprice") < 1500, "mid")
        .otherwise("premium")
    )
    # round 10: the URL blocklist family (operators/url_filter.py) over
    # a third constructed URL exercising the multi-label-TLD branch;
    # the oracle states the hand-derived hosts/domains/decisions
    u3 = F.concat(F.lit("http://WWW.Shop"), (pk % 7).cast("string"), F.lit(".co.UK/p"))
    _block = ("shop0.example.com", "ex1.com")
    # round 11: the FRAME blocklist path (filter_by_blocklist — suffix
    # chain explode + semi-join) hash-gated, not just plan/property
    # pinned. The corpus's u2/u3 hosts depend only on pk%3 / pk%7, so
    # the operator runs over BOUNDED probe frames (3 + 7 distinct
    # hosts) and the decision joins back on the modular key — the gate
    # exercises the real chain while every broadcast stays O(1) in SF.
    # Seeded entries cover: a bare TLD at 2-label-host depth ('com' vs
    # exN.com — the r10 sequence(1,0) regression), an exact 2-label
    # host (ex1.com), a MID-LEVEL 3-label entry under a 4-label host
    # (shop2.co.uk vs www.shop2.co.uk — the shape a two-probe design
    # misses), and a bare ccTLD ('uk').
    _bl = spark.createDataFrame(
        [("com",), ("ex1.com",), ("shop2.co.uk",), ("uk",)], "domain string"
    )
    _p2 = spark.range(3).select(
        F.col("id").alias("_k2"),
        F.concat(F.lit("HTTP://Ex"), F.col("id").cast("string"), F.lit(".COM:80/x"))
        .alias("url"),
    )
    _p3 = spark.range(7).select(
        F.col("id").alias("_k3"),
        F.concat(F.lit("http://WWW.Shop"), F.col("id").cast("string"), F.lit(".co.UK/p"))
        .alias("url"),
    )
    _b2 = filter_by_blocklist(
        _p2, _bl, keep_blocked=True, max_broadcast_entries=None
    ).select("_k2", F.lit(True).alias("_fb2"))
    _b3 = filter_by_blocklist(
        _p3, _bl, keep_blocked=True, max_broadcast_entries=None
    ).select("_k3", F.lit(True).alias("_fb3"))
    return (
        t["part"]
        .join(F.broadcast(_b2), pk % 3 == F.col("_k2"), "left")
        .join(F.broadcast(_b3), pk % 7 == F.col("_k3"), "left")
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
            F.round(F.pow(F.col("p_size"), 2), 2).alias("size_sq"),
            F.round(F.abs(F.col("p_retailprice") - 1000), 2).alias("price_dev"),
            F.floor(F.col("p_retailprice") / 100).cast("long").alias("price_bucket"),
            band.alias("price_band"),
            zorder_key(
                [F.col("p_size"), F.col("p_partkey") % 256], bits=_Z_BITS
            ).alias("zval"),
            normalize_url(u1).alias("url_norm"),
            normalize_url(u2).alias("url_norm2"),
            url_host(u1).alias("u1_host"),
            registered_domain(url_host(u1)).alias("u1_domain"),
            host_blocked(url_host(u1), _block).alias("u1_blocked"),
            host_blocked(url_host(u2), _block).alias("u2_blocked"),
            registered_domain(url_host(u3)).alias("u3_domain"),
            F.coalesce(F.col("_fb2"), F.lit(False)).alias("u2_fb"),
            F.coalesce(F.col("_fb3"), F.lit(False)).alias("u3_fb"),
        )
        # round 12: materialization boundary before the global sort (the
        # governance_profile trade) — the range sort's sampling pass
        # re-executed the whole url_norm/suffix-chain/zorder projection
        # (no shuffle between the part scan and the sort: the blocklist
        # exchanges live in broadcast side branches). Measured 3.2s ->
        # 1.7s on the sort subchain, ~5.5s -> ~3.3s for the full query
        # at sf0.1; values unchanged (plan-only), oracle gate re-run.
        .repartition("p_partkey")
        .orderBy("p_partkey")
    )


# date_rollup_funcs (round 1-3) was merged into advanced.order_rollup_family
# — the same (year,month)/(quarter,isodow) grouping sets now share one
# orders scan with the status/priority sets.


# --------------------------------------------------- events / changelog ops


@register(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COALESCE(ROUND(AVG(value) FILTER (WHERE event_type = 'purchase'), 3), -1.0)
             AS avg_purchase,
           NULLIF(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS n_errors_or_null
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc=(
        "Pivot (wide per-type counts AND averages via the real pivot "
        "relational operator) + NULL-semantics functions on top: aggregates "
        "skip NULLs, coalesce defaults the never-purchased, nullif "
        "re-NULLs zero error counts. Round 1's null_handling_funcs merged "
        "into the pivot — both were one shuffle on user_id."
    ),
)
def pivot_event_type_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    df = (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg"))
    )
    return df.select(
        "user_id",
        *[F.coalesce(F.col(f"{c}_n"), F.lit(0)).cast("long").alias(c) for c in types],
        F.coalesce(F.round(F.col("purchase_avg"), 3), F.lit(-1.0)).alias("avg_purchase"),
        F.nullif(F.coalesce(F.col("error_n"), F.lit(0)).cast("long"), F.lit(0)).alias(
            "n_errors_or_null"
        ),
    ).orderBy("user_id")


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
    # unix_micros, not cast('long'): the long cast floors to whole seconds
    # while the oracle compares exact INTERVAL arithmetic — a sub-second
    # gap straddling the 30-min boundary would sessionize differently
    # (same fix as window_events_range_lag's range frame)
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    is_new = F.when(gap <= 1800 * 1_000_000, F.lit(0)).otherwise(F.lit(1))
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
             event_type, value, CAST(props->>'$.k' AS BIGINT) AS k_val
      FROM events, generate_series(0, 3) AS g(k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(k_val) AS BIGINT) AS k_total,
           ROUND(AVG(k_val), 4) AS k_avg
    FROM w GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    doc=(
        "Sliding event-time windows (1 hour every 15 min) in batch: Spark's "
        "window() expands each event into its 4 covering windows (Expand "
        "operator); the oracle replays the same expansion with a series "
        "join. The streaming form is the identical expression on a stream. "
        "k_total/k_avg extract a JSON field from the props string column "
        "and aggregate it per window — round 3's json_extract_props merged "
        "onto the same events scan (NULL-skipping avg included)."
    ),
)
def sliding_window_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.sum(k).alias("k_total"),
            F.round(F.avg(k), 4).alias("k_avg"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "k_total",
            "k_avg",
        )
        .orderBy("window_start", "event_type")
    )


