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
    "grouping_sets_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (each dimension alone + grand total).",
)
def grouping_sets_status_priority(spark, sf_dir):
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@register(
    "percentiles_per_status",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (Spark percentile ≡ DuckDB "
    "quantile_cont). At 100 TB swap for approx_percentile + rows-only check.",
)
def percentiles_per_status(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS price_std,
           ROUND(var_samp(l_quantity), 4) AS qty_var,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Statistical aggregates (stddev/variance/corr/covar).",
)
def stats_aggregates(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
        )
        .orderBy("l_returnflag")
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
    "string_agg_nations_per_region",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="Ordered string aggregation (collect_list → sort → join).",
)
def string_agg_nations_per_region(spark, sf_dir):
    t = load_tables(spark, sf_dir, "region", "nation")
    return (
        t["region"]
        .join(t["nation"], F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("r_name")
    )


@register(
    "json_extract_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_total,
           ROUND(AVG(CAST(props->>'$.k' AS BIGINT)), 4) AS k_avg
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON field extraction from a string column + aggregate.",
)
def json_extract_props(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(F.sum(k).alias("k_total"), F.round(F.avg(k), 4).alias("k_avg"))
        .orderBy("event_type")
    )


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
           CAST(DENSE_RANK()   OVER w AS BIGINT) AS drank,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           CAST(NTILE(4)       OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="dense_rank / percent_rank / ntile over one window definition.",
)
def window_rank_family(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.dense_rank().over(w).cast("long").alias("drank"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_range_1h_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                            AND CURRENT ROW), 4)
             AS sum_1h
    FROM events ORDER BY event_id
    """,
    doc=(
        "RANGE window frame: per-user rolling 1-hour sum over event time "
        "(expressed as a seconds-valued range frame; a streaming deployment "
        "uses a sliding window aggregation instead)."
    ),
)
def window_range_1h_sum(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    # order by epoch MICROS: casting ts to long truncates to seconds and
    # shifts the frame boundary by up to 1s relative to the oracle's
    # native-precision interval arithmetic (caught at sf0.1)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        t["events"]
        .select("event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("sum_1h"))
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
    n_docs = docs.count()
    scored = tf.join(F.broadcast(df), "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf", 6).alias("tfidf"))
        .orderBy("doc_id")
    )


@register(
    "embedding_centroid_components",
    """
    SELECT label, CAST(i AS BIGINT) AS pos, ROUND(AVG(e), 4) AS c
    FROM (SELECT label,
                 UNNEST(embedding::DOUBLE[]) AS e,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, i ORDER BY label, pos
    """,
    doc=(
        "Per-label centroid (the IVF training step), long-format: "
        "posexplode the vectors, average per (label, position). One "
        "shuffle keyed on (label, pos) with map-side partial sums."
    ),
)
def embedding_centroid_components(spark, sf_dir):
    t = load_tables(spark, sf_dir, "embeddings")
    e = t["embeddings"].select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("p", "e")
    )
    return (
        e.groupBy(F.col("label").cast("int").alias("label"), (F.col("p") + 1).cast("long").alias("pos"))
        .agg(F.round(F.avg("e"), 4).alias("c"))
        .orderBy("label", "pos")
    )


@register(
    "array_agg_nations",
    """
    SELECT r_name,
           CAST(LEN(list_distinct(list(n_name))) AS BIGINT) AS n_nations,
           list_sort(list(n_name))[1] AS first_nation,
           list_contains(list(n_name), 'NATION_3') AS has_n3
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    doc="Array aggregation + array functions (collect, distinct size, "
    "element access, membership).",
)
def array_agg_nations(spark, sf_dir):
    t = load_tables(spark, sf_dir, "region", "nation")
    arr = F.collect_list("n_name")
    return (
        t["region"]
        .join(t["nation"], F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(
            F.size(F.array_distinct(arr)).cast("long").alias("n_nations"),
            F.element_at(F.array_sort(arr), 1).alias("first_nation"),
            F.array_contains(arr, "NATION_3").alias("has_n3"),
        )
        .orderBy("r_name")
    )


@register(
    "date_parts_distribution",
    """
    SELECT CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           COUNT(*) AS n
    FROM orders GROUP BY 1, 2 ORDER BY qtr, iso_dow
    """,
    doc=(
        "Quarter / ISO day-of-week distribution. Spark's dayofweek is "
        "1=Sunday while DuckDB's is 0=Sunday — both sides use the ISO "
        "numbering (Mon=1) to agree: Spark weekday()+1 ≡ DuckDB isodow."
    ),
)
def date_parts_distribution(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy(
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("qtr", "iso_dow")
    )


@register(
    "null_handling_funcs",
    """
    SELECT user_id,
           COALESCE(ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 3), -1.0)
             AS avg_purchase,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases,
           NULLIF(CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT), 0) AS n_errors_or_null
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="NULL semantics: aggregates skip NULLs; coalesce/nullif round-trip.",
)
def null_handling_funcs(spark, sf_dir):
    t = load_tables(spark, sf_dir, "events")
    purchase = F.when(F.col("event_type") == "purchase", F.col("value"))
    err = F.when(F.col("event_type") == "error", F.lit(1))
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.coalesce(F.round(F.avg(purchase), 3), F.lit(-1.0)).alias("avg_purchase"),
            F.count(purchase).alias("n_purchases"),
            F.nullif(F.count(err), F.lit(0)).alias("n_errors_or_null"),
        )
        .orderBy("user_id")
    )
