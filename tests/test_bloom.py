"""Bloom-filter join pruning (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_pruned_join,
)


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_bits=1 << 13)
    hits = (
        keys.filter(bloom_might_contain(F.col("k"), words, num_bits=1 << 13))
        .count()
    )
    assert hits == 500, "every inserted key must probe positive"


def test_bloom_false_positive_rate_bounded(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k", num_bits=1 << 13)
    # 2^13 bits / 500 keys ≈ 16 bits/key at k=3 → FP well under 5%
    probes = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom_might_contain(F.col("k"), words, num_bits=1 << 13)).count()
    assert fp / 20_000 < 0.05, f"false-positive rate too high: {fp}/20000"


def test_bloom_pruned_join_equals_plain_join(spark):
    fact = spark.range(0, 2_000).select(
        F.col("id").alias("fk"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(0, 2_000, 13).select(F.col("id").alias("dk"))
    got = (
        bloom_pruned_join(fact, dim, "fk", "dk", num_bits=1 << 10)
        .select("fk", "v")
        .collect()
    )
    want = fact.join(dim, fact.fk == dim.dk).select("fk", "v").collect()
    assert sorted((r.fk, r.v) for r in got) == sorted((r.fk, r.v) for r in want)


def test_bloom_prune_actually_cuts_rows(spark):
    """The point of the filter: most non-matching fact rows are dropped
    before the join. With 1/13 of keys in the dim and ~16 bits/key the
    pruned fact side must be far below the full fact count."""
    fact = spark.range(0, 10_000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 10_000, 13).select(F.col("id").alias("dk"))
    words = bloom_build(dim, "dk", num_bits=1 << 14)
    kept = fact.filter(bloom_might_contain(F.col("fk"), words, num_bits=1 << 14)).count()
    assert kept < 2_000, f"prune kept {kept}/10000 rows — filter ineffective"
    assert kept >= 770  # every true match must survive


def test_bloom_pruned_join_rejects_outer_joins(spark):
    import pytest

    fact = spark.range(3).select(F.col("id").alias("fk"))
    dim = spark.range(2).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_pruned_join(fact, dim, "fk", "dk", how="left")


def test_bloom_auto_sizing_scales_with_key_count(spark):
    from employee_data_management_system_data_engineering_solution_spark.operators import bloom

    # the registered default: auto-size keeps >= 16 bits/key (pow2)
    fact = spark.range(100).select(F.col("id").alias("fk"))
    dim = spark.range(20_000).select(F.col("id").alias("dk"))
    out = bloom.bloom_pruned_join(fact, dim, "fk", "dk")
    assert out.count() == 100  # all match; correctness regardless of size


def test_bloom_join_probe_path_matches_literal_path(spark):
    """Above LITERAL_MAX_BITS the probe runs as broadcast joins; the
    result must equal both the literal path and the plain join."""
    from employee_data_management_system_data_engineering_solution_spark.operators import bloom

    fact = spark.range(0, 5_000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 5_000, 7).select(F.col("id").alias("dk"))
    big = 1 << 19  # forces the join-probe path
    via_join = bloom.bloom_pruned_join(fact, dim, "fk", "dk", num_bits=big)
    want = fact.join(dim, fact.fk == dim.dk)
    assert sorted(r.fk for r in via_join.collect()) == sorted(
        r.fk for r in want.collect()
    )
    # and the join-probe prune actually prunes
    wdf = bloom.bloom_build_df(dim, "dk", big)
    kept = bloom.bloom_prune_by_join(fact, "fk", wdf, big).count()
    assert kept < 1_500
    assert kept >= 715
