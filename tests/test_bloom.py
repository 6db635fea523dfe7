"""Bloom-filter membership (operators/bloom.py).

Evidence for the three contracts: no false negatives ever, false-positive
rate near the sized target, and the bloom-prefiltered semi/anti joins
byte-identical to the plain exact joins (the production composition).
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_ftp_spark.operators.bloom import (
    bloom_build,
    bloom_build_sharded,
    bloom_might_contain,
    bloom_might_contain_sharded,
    bloom_prefilter_join,
    optimal_num_bits,
    optimal_num_hashes,
)


@pytest.fixture(scope="module")
def member_keys(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def built(spark, member_keys):
    m = optimal_num_bits(2000, 0.01)
    k = optimal_num_hashes(2000, m)
    return bloom_build(member_keys, "k", num_bits=m, num_hashes=k), m, k


def test_sizing_formulas():
    m = optimal_num_bits(1000, 0.01)
    assert m % 64 == 0
    assert 9_000 <= m <= 10_100  # ~9.6 bits/key at 1% fpp
    assert optimal_num_hashes(1000, m) == 7


def test_build_shape(built):
    bloom, m, k = built
    [row] = bloom.collect()
    assert len(row.bits) == m // 64
    assert row.num_bits == m and row.num_hashes == k
    assert any(w != 0 for w in row.bits)


def test_no_false_negatives(spark, member_keys, built):
    bloom, m, k = built
    flagged = bloom_might_contain(member_keys, "k", bloom, num_bits=m, num_hashes=k)
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_false_positive_rate_near_target(spark, built):
    bloom, m, k = built
    others = spark.range(0, 5000).select(
        F.concat(F.lit("outsider-"), F.col("id")).alias("k")
    )
    flagged = bloom_might_contain(others, "k", bloom, num_bits=m, num_hashes=k)
    fp = flagged.filter("might_contain").count()
    # sized for 1%; allow generous headroom for hash variance
    assert fp / 5000 < 0.05


def test_null_keys_flag_false_and_skip_build(spark, built):
    bloom, m, k = built
    with_null = spark.createDataFrame([("member-1",), (None,)], "k string")
    rows = {
        r.k: r.might_contain
        for r in bloom_might_contain(
            with_null, "k", bloom, num_bits=m, num_hashes=k
        ).collect()
    }
    assert rows["member-1"] is True
    assert rows[None] is False


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_prefilter_join_identical_to_exact(spark, member_keys, how):
    big = spark.range(0, 4000).select(
        F.concat(
            F.when(F.col("id") % 2 == 0, "member-").otherwise("outsider-"),
            F.col("id"),
        ).alias("k"),
        (F.col("id") * 10).alias("payload"),
    )
    exact = sorted(
        (r.k, r.payload) for r in big.join(member_keys, "k", how).collect()
    )
    pre = sorted(
        (r.k, r.payload)
        for r in bloom_prefilter_join(big, member_keys, "k", fpp=0.01, how=how).collect()
    )
    assert pre == exact
    # sanity: the predicate actually splits the data both ways
    assert 0 < len(exact) < 4000


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_prefilter_join_unicode_and_empty_keys(spark, how):
    # membership is pure hashing — empty strings, astral-plane emoji and
    # duplicate keys must all behave byte-identically to the exact join
    keys = spark.createDataFrame(
        [("",), ("🙂",), ("héllo",), ("日本語",), ("héllo",)], "k string"
    )
    big = spark.createDataFrame(
        [("",), ("🙂",), ("outsider",), ("héllo",), ("🙃",), (None,)], "k string"
    )
    canon = lambda rows: sorted((r.k is None, r.k or "") for r in rows)
    exact = canon(big.join(keys, "k", how).collect())
    pre = canon(bloom_prefilter_join(big, keys, "k", how=how).collect())
    assert pre == exact
    if how == "left_anti":
        # the NULL-key row never matches and must survive the anti join
        assert (True, "") in pre


def test_prefilter_join_empty_reference(spark, member_keys):
    empty = member_keys.filter(F.lit(False))
    big = spark.range(5).select(F.concat(F.lit("x-"), F.col("id")).alias("k"))
    assert bloom_prefilter_join(big, empty, "k", how="left_semi").count() == 0
    assert bloom_prefilter_join(big, empty, "k", how="left_anti").count() == 5


def test_sizing_mismatch_raises_not_silent(spark, member_keys, built):
    # probing with the wrong plan-time sizing must fail loudly: without
    # the guard an oversized probe indexes past the bits array, which
    # under non-ANSI Spark NULLs the flag and rows vanish from BOTH the
    # semi and anti results
    bloom, m, k = built
    wrong = bloom_might_contain(
        member_keys, "k", bloom, num_bits=m * 2, num_hashes=k
    )
    with pytest.raises(Exception, match="sizing mismatch"):
        wrong.collect()


def test_build_scales_to_100k_keys(spark):
    # regression for the O((m/64)^2) in-plan dense-array assembly: at
    # 100k keys (~15k words) the quadratic form took tens of seconds and
    # at 1M keys minutes; the numpy scatter build finishes in seconds —
    # a hang here is the bug coming back
    n = 100_000
    m = optimal_num_bits(n, 0.01)
    k = optimal_num_hashes(n, m)
    keys = spark.range(n).select(F.concat(F.lit("s-"), F.col("id")).alias("k"))
    bloom = bloom_build(keys, "k", num_bits=m, num_hashes=k)
    sample = keys.sample(0.01, seed=7)
    flagged = bloom_might_contain(sample, "k", bloom, num_bits=m, num_hashes=k)
    assert flagged.filter(~F.col("might_contain")).count() == 0


@pytest.fixture(scope="module")
def sharded(spark, member_keys):
    # total budget rounded up to a multiple of 64*n_shards
    n_shards = 4
    m = optimal_num_bits(2000, 0.01)
    m = ((m + 64 * n_shards - 1) // (64 * n_shards)) * 64 * n_shards
    k = optimal_num_hashes(2000, m)
    sk = bloom_build_sharded(member_keys, "k", num_bits=m, num_hashes=k, n_shards=n_shards)
    return sk, m, k, n_shards


def test_sharded_build_shape(sharded):
    sk, m, k, n = sharded
    rows = sorted(sk.collect(), key=lambda r: r.shard)
    assert [r.shard for r in rows] == list(range(n))
    for r in rows:
        assert r.num_bits == m // n and r.num_hashes == k and r.n_shards == n
        assert len(r.bits) == m // n // 64
    # keys are hash-split, so every shard should have set bits
    assert all(any(w != 0 for w in r.bits) for r in rows)


def test_sharded_no_false_negatives(member_keys, sharded):
    sk, m, k, n = sharded
    flagged = bloom_might_contain_sharded(
        member_keys, "k", sk, num_bits=m, num_hashes=k, n_shards=n
    )
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_sharded_fp_rate_near_target(spark, sharded):
    sk, m, k, n = sharded
    others = spark.range(0, 5000).select(
        F.concat(F.lit("outsider-"), F.col("id")).alias("k")
    )
    flagged = bloom_might_contain_sharded(
        others, "k", sk, num_bits=m, num_hashes=k, n_shards=n
    )
    assert flagged.filter("might_contain").count() / 5000 < 0.05


def test_sharded_null_key_flags_false(spark, sharded):
    sk, m, k, n = sharded
    with_null = spark.createDataFrame([("member-1",), (None,)], "k string")
    rows = {
        r.k: r.might_contain
        for r in bloom_might_contain_sharded(
            with_null, "k", sk, num_bits=m, num_hashes=k, n_shards=n
        ).collect()
    }
    assert rows["member-1"] is True
    assert rows[None] is False


def test_sharded_probe_missing_shard_raises_not_drops(member_keys, sharded):
    # a probe row whose shard has NO sketch row (truncated sketch, or a
    # larger probe n_shards than built) must raise loudly — an inner
    # join would silently drop the row before any guard could fire,
    # vanishing it from semi AND anti results
    sk, m, k, n = sharded
    truncated = sk.filter("shard <> 1")
    flagged = bloom_might_contain_sharded(
        member_keys, "k", truncated, num_bits=m, num_hashes=k, n_shards=n
    )
    with pytest.raises(Exception, match="no row for probe shard"):
        flagged.collect()


def test_prefilter_rejects_bad_n_shards(spark, member_keys):
    big = spark.range(5).select(F.concat(F.lit("x-"), F.col("id")).alias("k"))
    with pytest.raises(ValueError, match="n_shards must be >= 1"):
        bloom_prefilter_join(big, member_keys, "k", n_shards=0)


def test_sharded_mismatch_raises(member_keys, sharded):
    # probing with the wrong n_shards fails loudly on whichever guard a
    # row hits first: the meta sizing check (shard exists, sizing
    # differs) or the missing-shard check (shard id beyond the sketch)
    sk, m, k, n = sharded
    wrong = bloom_might_contain_sharded(
        member_keys, "k", sk, num_bits=m, num_hashes=k, n_shards=n * 2
    )
    with pytest.raises(Exception, match="sizing mismatch|no row for probe shard"):
        wrong.collect()


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_sharded_prefilter_join_identical_to_exact(spark, member_keys, how):
    # the documented >2 GB envelope exercised at test scale: explicit
    # n_shards routes through the sharded build+probe, and the result
    # must stay byte-identical to the plain exact join
    big = spark.range(0, 4000).select(
        F.concat(
            F.when(F.col("id") % 2 == 0, "member-").otherwise("outsider-"),
            F.col("id"),
        ).alias("k"),
        (F.col("id") * 10).alias("payload"),
    )
    exact = sorted((r.k, r.payload) for r in big.join(member_keys, "k", how).collect())
    pre = sorted(
        (r.k, r.payload)
        for r in bloom_prefilter_join(
            big, member_keys, "k", fpp=0.01, how=how, n_shards=4
        ).collect()
    )
    assert pre == exact
    assert 0 < len(exact) < 4000


def test_sharded_probe_stays_jvm_side(member_keys, sharded):
    # the sharded probe is a broadcast HASH join on the shard id — still
    # codegen column expressions, no Python evaluation nodes
    sk, m, k, n = sharded
    plan = (
        bloom_might_contain_sharded(
            member_keys, "k", sk, num_bits=m, num_hashes=k, n_shards=n
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    for bad in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
    ):
        assert bad not in plan


def test_meta_col_collision_proof(spark, built):
    # a caller frame already holding "_bloom_bits_meta" (but NOT
    # "_bloom_bits") must not make the probe's meta reference ambiguous
    bloom, m, k = built
    df = spark.createDataFrame([("member-1", "x")], "k string, _bloom_bits_meta string")
    [row] = bloom_might_contain(df, "k", bloom, num_bits=m, num_hashes=k).collect()
    assert row.might_contain is True and row._bloom_bits_meta == "x"


def test_probe_stays_jvm_side(spark, member_keys, built):
    # the probe must be codegen-able column expressions over a broadcast
    # single-row join — no Python evaluation nodes in the plan
    bloom, m, k = built
    plan = (
        bloom_might_contain(member_keys, "k", bloom, num_bits=m, num_hashes=k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    for bad in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
        "FlatMapGroupsInPandas",
    ):
        assert bad not in plan
