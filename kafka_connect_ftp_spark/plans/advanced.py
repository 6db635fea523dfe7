"""Second-wave operator coverage: grouping sets, exact percentiles,
statistical aggregates, ordered string aggregation, JSON extraction,
range joins, correlated-subquery shapes, the full window-rank family,
range window frames, unpivot, TF-IDF, and per-label vector centroids.

Everything stays in built-in JVM expressions; where the DataFrame API has
no construct (GROUPING SETS), the SQL API is used over temp views —
Catalyst plans both identically.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.plans import register
from kafka_connect_ftp_spark.session import load_tables


@register(
    "order_rollup_family",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), (),
                            (YEAR(o_orderdate), MONTH(o_orderdate)),
                            (quarter(o_orderdate), isodow(o_orderdate)))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST,
             yr NULLS FIRST, mon NULLS FIRST, qtr NULLS FIRST, iso_dow NULLS FIRST
    """,
    doc=(
        "Explicit GROUPING SETS over orders at six grains in ONE scan: the "
        "status/priority pair, each dimension alone, the grand total "
        "(= GROUP BY ROLLUP(s,p); CUBE is covered by "
        "cube_returnflag_linestatus), plus the (year, month) monthly "
        "rollup and the (quarter, ISO day-of-week) distribution — round "
        "3's date_rollup_funcs merged in. Spark's dayofweek is 1=Sunday "
        "while DuckDB's is 0=Sunday — both sides use ISO numbering "
        "(Mon=1): Spark weekday()+1 ≡ DuckDB isodow."
    ),
)
def order_rollup_family(spark, sf_dir):
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
               CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
               CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
               CAST(WEEKDAY(o_orderdate) + 1 AS BIGINT) AS iso_dow,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), (),
                                (YEAR(o_orderdate), MONTH(o_orderdate)),
                                (QUARTER(o_orderdate), WEEKDAY(o_orderdate) + 1))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
                 yr ASC NULLS FIRST, mon ASC NULLS FIRST,
                 qtr ASC NULLS FIRST, iso_dow ASC NULLS FIRST
        """
    )


@register(
    "argmax_order_per_customer",
    """
    SELECT c_custkey,
           arg_max(o_orderkey, o_totalprice ORDER BY o_orderkey) AS best_order,
           ROUND(MAX(o_totalprice), 2) AS best_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="max_by/arg_max: the argmax aggregate (ties broken by orderkey).",
)
def argmax_order_per_customer(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    # deterministic ties: max_by on a (price, -orderkey) struct picks the
    # lowest orderkey among equal prices, matching the oracle's ORDER BY
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.expr("max_by(o_orderkey, struct(o_totalprice, -o_orderkey))").alias("best_order"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
        .orderBy("c_custkey")
    )


@register(
    "region_nation_lists",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(LEN(list_distinct(list(n_name))) AS BIGINT) AS n_nations,
           list_sort(list(n_name))[1] AS first_nation,
           list_contains(list(n_name), 'NATION_3') AS has_n3
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc=(
        "Collection aggregation per region in one shuffle: ordered string "
        "aggregation (collect_list → sort → join) plus array functions "
        "(distinct size, element access, membership). Round 1's "
        "string_agg_nations_per_region + array_agg_nations merged."
    ),
)
def region_nation_lists(spark, sf_dir):
    t = load_tables(spark, sf_dir, "region", "nation")
    arr = F.collect_list("n_name")
    return (
        t["region"]
        .join(t["nation"], F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(arr), ",").alias("nations"),
            F.size(F.array_distinct(arr)).cast("long").alias("n_nations"),
            F.element_at(F.array_sort(arr), 1).alias("first_nation"),
            F.array_contains(arr, "NATION_3").alias("has_n3"),
        )
        .orderBy("r_name")
    )


# json_extract_props (round 1-3) was merged into
# analytics.sliding_window_counts — the JSON field extraction + aggregate
# now rides the same events scan as the sliding-window rollup.


_BANDS = [(0.0, 20000.0, "low"), (20000.0, 60000.0, "mid"), (60000.0, 1e18, "high")]


@register(
    "range_join_price_bands",
    f"""
    SELECT b.band, COUNT(*) AS n, ROUND(SUM(l.l_extendedprice), 2) AS total
    FROM lineitem l
    JOIN (VALUES {", ".join(f"({lo}, {hi}, '{nm}')" for lo, hi, nm in _BANDS)})
         AS b(lo, hi, band)
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
    doc=(
        "Range (non-equi) join against a tiny band dimension — broadcast "
        "nested-loop with an interval predicate; the band table is O(1) so "
        "the scan side streams once at any scale."
    ),
)
def range_join_price_bands(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    bands = t["lineitem"].sparkSession.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        t["lineitem"]
        .join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("band")
    )


@register(
    "above_nation_avg_customers",
    """
    SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c_custkey
    """,
    doc=(
        "Correlated scalar subquery (above-per-group-average), planned as "
        "a single window pass instead of a per-row subquery — the standard "
        "decorrelation."
    ),
)
def above_nation_avg_customers(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    return (
        t["customer"]
        .withColumn("nation_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           CAST(ROW_NUMBER()   OVER w AS BIGINT) AS rn,
           CAST(DENSE_RANK()   OVER w AS BIGINT) AS drank,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           CAST(NTILE(4)       OVER w AS BIGINT) AS quartile,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc=(
        "The window-function family over orders: row_number / dense_rank / "
        "percent_rank / ntile on a rank window, plus the per-customer "
        "cumulative sum (ROWS frame — same shuffle profile as the "
        "state-merge) as a second window definition in the same pass. "
        "Round 1's window_running_total merged in."
    ),
)
def window_rank_family(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_run = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.dense_rank().over(w).cast("long").alias("drank"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_events_range_lag",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                            AND CURRENT ROW), 4)
             AS sum_1h,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4)
             AS delta
    FROM events ORDER BY event_id
    """,
    doc=(
        "Event-time windows per user in one pass: the rolling 1-hour RANGE "
        "frame sum (a streaming deployment uses a sliding window "
        "aggregation instead) and the LAG-based delta to the previous "
        "event. Round 1's window_range_1h_sum + window_lag_value_delta "
        "merged — both shuffle once on user_id."
    ),
)
def window_events_range_lag(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    # order by epoch MICROS: casting ts to long truncates to seconds and
    # shifts the frame boundary by up to 1s relative to the oracle's
    # native-precision interval arithmetic (caught at sf0.1)
    w_range = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    w_lag = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w_range), 4).alias("sum_1h"),
            F.round(F.col("value") - F.lag("value").over(w_lag), 4).alias("delta"),
        )
        .orderBy("event_id")
    )


@register(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, ROUND(val, 2) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'price' AS measure, l_extendedprice AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'qty', l_quantity FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    doc="Unpivot (wide→long) via stack — the inverse of the pivot operator.",
)
def unpivot_measures(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "stack(3, 'price', l_extendedprice, 'qty', l_quantity, 'tax', l_tax)"
            ).alias("measure", "val"),
        )
        .select("l_orderkey", "l_linenumber", "measure", F.round("val", 2).alias("val"))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@register(
    "tfidf_top_term",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, ROUND(tfidf, 6) AS tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn = 1 ORDER BY doc_id
    """,
    doc=(
        "TF-IDF top term per document: term frequencies and document "
        "frequencies as two hash aggregations, idf joined back on term "
        "(broadcast — the vocabulary is tiny relative to the corpus)."
    ),
)
def tfidf_top_term(spark, sf_dir):
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # n_docs as a broadcast 1-row frame, not an eager docs.count(): keeps
    # the IDF denominator inside the single job instead of a separate
    # driver-side scan per invocation
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf", 6).alias("tfidf"))
        .orderBy("doc_id")
    )
