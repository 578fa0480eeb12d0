"""Distributed prefix scan: two-level bucket scan must equal the
single-task global window it replaces."""

from __future__ import annotations

import random

from pyspark.sql import Row

from employee_data_management_system_data_engineering_solution_spark.operators.prefix import (
    prefix_sum,
)


def _check(spark, rows, bucket_width):
    df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows])
    got = {
        r.k: r.running_total
        for r in prefix_sum(df, "k", "v", bucket_width=bucket_width).collect()
    }
    run, want = 0, {}
    for k, v in sorted(rows):
        run += v
        want[k] = run
    assert got == want


def test_prefix_sum_matches_serial_fold(spark):
    rng = random.Random(11)
    rows = [(k, rng.randint(0, 50)) for k in rng.sample(range(10_000), 500)]
    _check(spark, rows, bucket_width=64)


def test_prefix_sum_sparse_keys_and_tiny_buckets(spark):
    # keys far sparser than the bucket width, many empty buckets, and a
    # bucket width of 1 (every row its own bucket: pure offset path)
    rows = [(0, 5), (1, 0), (7, 3), (4_096, 2), (1_000_000, 9)]
    _check(spark, rows, bucket_width=1)
    _check(spark, rows, bucket_width=4096)


def test_prefix_sum_keeps_fractional_value_type(spark):
    # double value column: the running total must stay double (no long
    # truncation) and match the serial fold exactly
    rows = [(1, 0.5), (2, 0.25), (3, 1.75), (4, 0.5)]
    df = spark.createDataFrame(rows, "k long, v double")
    got = {
        r.k: r.running_total
        for r in prefix_sum(df, "k", "v", bucket_width=2).collect()
    }
    assert got == {1: 0.5, 2: 0.75, 3: 2.5, 4: 3.0}
