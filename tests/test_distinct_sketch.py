"""HLL distinct sketches (operators/distinct_sketch.py): accuracy vs
exact counts, lossless mergeability across shards, parquet persistence
of the sketch column (the rescan-free rollup contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.distinct_sketch import (
    hll_group_distinct,
    hll_rollup,
)
from kafka_connect_ftp_spark.session import load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toks(spark):
    docs = load_tables(spark, SF, "documents")["documents"]
    return docs.select(
        "source",
        F.explode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("tk"),
    )


def test_estimates_match_exact_within_error(spark, toks):
    est = {r["source"]: r.est_distinct for r in hll_group_distinct(toks, "source", "tk").collect()}
    exact = {
        r["source"]: r.n
        for r in toks.groupBy("source").agg(F.count_distinct("tk").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for s, e in exact.items():
        assert abs(est[s] - e) <= max(2, 0.05 * e), (s, est[s], e)


def test_shard_sketches_union_to_the_global_estimate(spark, toks):
    # the mergeability contract: per-shard sketches stored, rolled up
    # later WITHOUT rescanning — estimate equals the one-shot global
    sharded = toks.withColumn("shard", F.pmod(F.xxhash64("tk"), F.lit(4)))
    per_shard = hll_group_distinct(sharded, "shard", "tk")
    rolled = hll_rollup(per_shard).collect()[0]
    direct = hll_group_distinct(
        toks.withColumn("g", F.lit("all")), "g", "tk"
    ).collect()[0]
    assert rolled.est_distinct == direct.est_distinct


def test_grouped_rollup_and_parquet_round_trip(spark, toks, tmp_path):
    # daily-sketch shape: (source, day) sketches persisted, then rolled
    # up per source from STORAGE
    daily = toks.withColumn("day", F.pmod(F.xxhash64("tk", F.lit(7)), F.lit(3)))
    sk = hll_group_distinct(
        daily.withColumn("sd", F.concat_ws("|", "source", "day")), "sd", "tk"
    ).withColumn("source", F.split("sd", "\\|")[0])
    path = str(tmp_path / "sketches")
    sk.select("source", "hll").write.parquet(path)
    stored = spark.read.parquet(path)
    rolled = {
        r["source"]: r.est_distinct
        for r in hll_rollup(stored, group_col="source").collect()
    }
    direct = {
        r["source"]: r.est_distinct
        for r in hll_group_distinct(toks, "source", "tk").collect()
    }
    assert rolled == direct


def test_lgk_validation(spark, toks):
    with pytest.raises(ValueError, match="lgk"):
        hll_group_distinct(toks, "source", "tk", lgk=2)
