"""balanced() guard: logical-plan node walk, not plan-string sniffing."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_ftp_spark.session import balanced


def _tiny_parquet(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    # single file, single row group -> scan yields 1 partition
    return spark.read.parquet(path)


def test_join_bearing_frame_untouched(spark, tmp_path):
    a = _tiny_parquet(spark, tmp_path, "a")
    b = _tiny_parquet(spark, tmp_path, "b")
    joined = a.join(b, "id")
    assert balanced(joined, spark) is joined


def test_aggregate_and_window_untouched(spark, tmp_path):
    df = _tiny_parquet(spark, tmp_path)
    agg = df.groupBy("id").count()
    assert balanced(agg, spark) is agg
    from pyspark.sql import Window

    win = df.withColumn("rn", F.row_number().over(Window.partitionBy("id").orderBy("id")))
    assert balanced(win, spark) is win


def test_group_family_frames_untouched(spark, tmp_path):
    # applyInPandas compiles to FlatMapGroupsInPandas — a shuffle-governed
    # node the old exact-name allowlist missed; the family-token match
    # must leave it alone instead of stacking a repartition on top
    df = _tiny_parquet(spark, tmp_path)
    out = df.groupBy("id").applyInPandas(lambda p: p, "id long")
    assert balanced(out, spark) is out


def test_shuffle_words_in_column_names_do_not_false_positive(spark, tmp_path):
    # the old string-matching guard saw "Join"/"Sort"/"Window" in the plan
    # text and skipped the rebalance; aliases containing those words must
    # not suppress it
    import pytest

    if spark.sparkContext.defaultParallelism <= 1:
        pytest.skip("needs >1 core: a 1-partition scan already meets the target")
    df = _tiny_parquet(spark, tmp_path).select(
        F.col("id").alias("JoinKey"),
        (F.col("id") * 2).alias("SortOrderWindowValue"),
    )
    out = balanced(df, spark)
    assert out is not df
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_changelog_top1_keeps_windowgrouplimit(spark):
    """The latest-record-per-key plan must compile to WindowGroupLimit
    with a Partial pass — the map-side top-1 that keeps a hot state key
    from funneling all its rows into one reducer (docs/SCALING.md
    hot-key rule). A formulation change that silently loses this (e.g.
    filtering on rank computed in a prior select) would regress the
    state-merge's skew behavior without failing any result check."""
    from kafka_connect_ftp_spark.plans import registry

    df = registry()["changelog_latest_state"].fn(spark, "/root/testdata/sf0.001")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "WindowGroupLimit" in plan
    # the Partial-mode pass is what runs before the shuffle
    assert "Partial" in plan.split("WindowGroupLimit", 1)[1]


def test_already_parallel_scan_untouched(spark, tmp_path):
    path = str(tmp_path / "many")
    target = spark.sparkContext.defaultParallelism
    spark.range(10_000).repartition(target).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    if df.rdd.getNumPartitions() >= target:
        assert balanced(df, spark) is df


def test_connect_fallback_is_untouched_noop(spark):
    # under Spark Connect there is no _jdf handle; balanced() must return
    # the frame unchanged rather than raising (documented in README —
    # "Scale design notes"). Simulated with a minimal stand-in object so
    # the test doesn't need a Connect server.
    class FakeConnectFrame:
        pass  # no _jdf attribute, like pyspark.sql.connect.DataFrame

    fake = FakeConnectFrame()
    assert balanced(fake, spark) is fake
