"""Training-shard assembly (operators/sharding.py): deterministic
hash-random order, split partitioning, bounded files."""

from __future__ import annotations

import glob
import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.sharding import (
    epoch_salt,
    shuffled_shards,
    write_training_shards,
)


@pytest.fixture()
def docs(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
        F.when(F.col("id") % 10 < 8, "train").when(F.col("id") % 10 == 8, "val")
        .otherwise("test").alias("split"),
    )


def _file_order(spark, path):
    """Per-split list of per-file doc_id sequences, file-name independent."""
    out = {}
    for f in sorted(glob.glob(f"{path}/split=*/part-*")):
        split = f.split("split=")[1].split("/")[0]
        ids = tuple(r.doc_id for r in spark.read.parquet(f).collect())
        out.setdefault(split, []).append(ids)
    for k in out:
        out[k] = sorted(out[k])
    return out


def test_round_trip_and_split_partitioning(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=4)
    counts = {r.split: r.n_rows for r in manifest.collect()}
    assert counts == {"train": 400, "val": 50, "test": 50}
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert {r.doc_id for r in back.collect()} == set(range(500))
    assert glob.glob(f"{path}/split=train/part-*")  # hive-style split dirs


def test_order_is_hash_random_not_source_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=2)
    files = _file_order(spark, path)["train"]
    # within every file the ids must NOT be in ascending source order
    # (hash order decorrelates adjacent documents)
    assert all(list(ids) != sorted(ids) for ids in files if len(ids) > 2)


def test_deterministic_across_reruns_and_salts(spark, docs, tmp_path):
    p1, p2, p3 = (str(tmp_path / n) for n in ("a", "b", "c"))
    write_training_shards(docs, p1, n_shards=3, salt="s")
    write_training_shards(docs, p2, n_shards=3, salt="s")
    write_training_shards(docs, p3, n_shards=3, salt=epoch_salt("s", 1))
    assert _file_order(spark, p1) == _file_order(spark, p2)  # re-run reproduces
    assert _file_order(spark, p1) != _file_order(spark, p3)  # new epoch, new order


def test_max_records_per_file_bounds_shards(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=2, max_records_per_file=50)
    for f in glob.glob(f"{path}/split=*/part-*"):
        assert spark.read.parquet(f).count() <= 50


def test_unsplit_corpus_and_validation(spark, docs, tmp_path):
    path = str(tmp_path / "flat")
    manifest = write_training_shards(
        docs.drop("split"), path, split_col=None, n_shards=2
    )
    assert manifest.collect()[0].n_rows == 500
    with pytest.raises(ValueError, match="n_shards"):
        shuffled_shards(docs, n_shards=0)


def test_shard_count_pinned(spark, docs):
    assert shuffled_shards(docs, n_shards=7).rdd.getNumPartitions() == 7


def test_shard_key_collision_rejected(spark, docs):
    clash = docs.withColumn("_shard_key", F.lit(1))
    with pytest.raises(ValueError, match="_shard_key"):
        shuffled_shards(clash, n_shards=2)


def test_duplicate_ids_still_deterministic(spark, tmp_path):
    # duplicate doc_ids tie on the hash key; the id tie-break keeps
    # re-runs byte-identical (same-id rows here are identical rows)
    dup = spark.range(100).select(
        (F.col("id") % 20).alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % 20)).alias("text"),
        F.lit("train").alias("split"),
    )
    p1, p2 = str(tmp_path / "x"), str(tmp_path / "y")
    write_training_shards(dup, p1, n_shards=3)
    write_training_shards(dup, p2, n_shards=3)
    assert _file_order(spark, p1) == _file_order(spark, p2)
