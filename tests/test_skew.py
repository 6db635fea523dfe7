"""Salting operators: results must equal the unsalted plans while spreading
hot keys across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.skew import salted_aggregate, salted_join, with_salt


def skewed_df(spark, n=10_000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id") % 97)).alias("key"),
        (F.col("id") % 7).cast("double").alias("x"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r.key): (r.n, r.total, r.mx)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("total"), F.max("x").alias("mx"))
        .collect()
    }
    salted = {
        (r.key): (r.n, r.total, r.mx)
        for r in salted_aggregate(
            df,
            ["key"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("x")),
                "mx": ("max", F.max("x")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    probe = skewed_df(spark, 5000)
    build = spark.createDataFrame(
        [("HOT", 1.5)] + [(f"k{i}", float(i)) for i in range(97)], "key string, w double"
    )
    plain = probe.join(build, "key").agg(F.count(F.lit(1)), F.round(F.sum(F.col("x") * F.col("w")), 4)).collect()[0]
    salted = salted_join(probe, build, ["key"], n_salts=8).agg(
        F.count(F.lit(1)), F.round(F.sum(F.col("x") * F.col("w")), 4)
    ).collect()[0]
    assert tuple(salted) == tuple(plain)


def test_salted_left_join_preserves_unmatched(spark):
    probe = spark.createDataFrame([("a", 1), ("b", 2)], "key string, x int")
    build = spark.createDataFrame([("a", 10.0)], "key string, w double")
    rows = {r.key: r.w for r in salted_join(probe, build, ["key"], n_salts=4, how="left").collect()}
    assert rows == {"a": 10.0, "b": None}


def test_salt_spreads_hot_key(spark):
    df = with_salt(skewed_df(spark), 8)
    buckets = df.filter(F.col("key") == "HOT").groupBy("_salt").count().collect()
    assert len(buckets) == 8  # the hot key occupies all salt buckets


def test_salted_join_rejects_build_preserving_modes(spark):
    # right/full would surface each unmatched build replica as its own
    # null-probe row (xn_salts duplicates) — a config error, not a result
    import pytest

    from kafka_connect_ftp_spark.operators.skew import salted_join

    a = spark.range(5).withColumnRenamed("id", "k")
    b = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(a, b, ["k"], how=how)
