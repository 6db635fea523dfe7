"""Bucketing demo: two tables bucketed by the join key co-locate, so the
join plan has NO shuffle exchange — the storage-level answer to repeated
large-fact joins at 100 TB (vs paying a sort-merge shuffle per query)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # bucketed tables go to the session's default warehouse dir
    # (spark.sql.warehouse.dir is static); dropped in teardown
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _shuffles(df) -> int:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    return len([l for l in plan.splitlines() if re.fullmatch(r"\(\d+\) Exchange", l.strip())])


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join strategy decision is about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        agg = j.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        # join itself: no exchange on either side (bucket co-location)
        assert _shuffles(j) == 0
        # and results are correct
        got = {r.o_orderstatus: r.n for r in agg.collect()}
        plain = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got == {r.o_orderstatus: r.n for r in plain.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_same_join_shuffles(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        assert _shuffles(j) >= 2  # both sides exchange for sort-merge
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
