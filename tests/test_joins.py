"""Ordered-join semantics on hand-built frames (asof_join,
interval_bucket_join)."""

from __future__ import annotations

import datetime as dt

from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
    asof_join,
    interval_bucket_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T10:00:00")),
         (2, "a", _ts("2024-01-01T12:00:00")),
         (3, "b", _ts("2024-01-01T09:00:00"))],
        "id bigint, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T09:30:00"), 100),
         ("a", _ts("2024-01-01T12:00:00"), 200),  # equal ts → inclusive match
         ("b", _ts("2024-01-01T09:30:00"), 300)],  # after left b → no match
        "k string, ts timestamp, payload bigint",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", payload=["payload"])
    got = {r["id"]: r["r_payload"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None}


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T12:00:00"))], "id bigint, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T12:00:00"), 200),
         ("a", _ts("2024-01-01T11:00:00"), 100)],
        "k string, ts timestamp, payload bigint",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", payload=["payload"], strict=True
    )
    assert out.collect()[0]["r_payload"] == 100


def test_asof_multi_key_and_prefix(spark):
    left = spark.createDataFrame(
        [(1, "a", 7, _ts("2024-01-01T10:00:00"))],
        "id bigint, k string, k2 bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", 7, _ts("2024-01-01T09:00:00"), 1),
         ("a", 8, _ts("2024-01-01T09:30:00"), 2)],  # wrong k2 → not eligible
        "k string, k2 bigint, ts timestamp, payload bigint",
    )
    out = asof_join(
        left, right, on=["k", "k2"], left_ts="ts", right_ts="ts",
        payload=["payload"], payload_prefix="m_",
    )
    assert out.collect()[0]["m_payload"] == 1


def test_interval_bucket_join_boundaries(spark):
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        "wid bigint, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00")),   # start inclusive
         (2, _ts("2024-01-01T10:59:59")),   # inside
         (3, _ts("2024-01-01T11:00:00")),   # end exclusive
         (4, _ts("2024-01-01T09:59:59"))],  # before
        "pid bigint, ts timestamp",
    )
    out = interval_bucket_join(points, intervals, "ts", "s", "e", bucket_seconds=600)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_interval_bucket_join_multibucket_no_dupes(spark):
    """An interval spanning many buckets matches each point exactly once."""
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T13:00:00"))],
        "wid bigint, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:30:00"))], "pid bigint, ts timestamp"
    )
    out = interval_bucket_join(points, intervals, "ts", "s", "e", bucket_seconds=60)
    assert out.count() == 1


def test_interval_bucket_join_rejects_outer(spark):
    import pytest
    from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
        interval_bucket_join,
    )

    pts = spark.createDataFrame([(1,)], "p bigint").selectExpr("timestamp'2024-01-01' AS ts")
    ivs = spark.createDataFrame([(1,)], "i bigint").selectExpr(
        "timestamp'2024-01-01' AS s", "timestamp'2024-01-02' AS e"
    )
    with pytest.raises(ValueError, match="inner"):
        interval_bucket_join(pts, ivs, "ts", "s", "e", bucket_seconds=3600, how="left")


def _iv(spark, rows, id_col, start, end):
    import datetime as dt

    return spark.createDataFrame(
        [
            (i, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
             dt.datetime(2024, 1, 1) + dt.timedelta(seconds=e))
            for i, k, s, e in rows
        ],
        f"{id_col} INT, k INT, {start} TIMESTAMP, {end} TIMESTAMP",
    )


def test_interval_overlap_join_pairs_and_dedup(spark):
    """Pair semantics against a hand-computed truth: closed-interval
    overlap (touching endpoints included), multi-bucket intervals
    emitted exactly ONCE (the anchor-bucket rule), different keys never
    joined."""
    from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
        interval_overlap_join,
    )

    left = _iv(
        spark,
        [
            (1, 1, 0, 10000),     # spans many 600 s buckets
            (2, 1, 20000, 20010),
            (3, 2, 0, 10000),     # same span, other key
        ],
        "lid", "ls", "le",
    )
    right = _iv(
        spark,
        [
            (10, 1, 5000, 15000),   # overlaps lid=1 across several shared buckets
            (11, 1, 10000, 10500),  # touches lid=1 exactly at its end point
            (12, 1, 19000, 20000),  # touches lid=2 at its start
            (13, 1, 30000, 31000),  # no overlap
            (14, 3, 0, 10000),      # key never present on left
        ],
        "rid", "rs", "re",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "k", "ls", "le", "rs", "re", bucket_seconds=600
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (2, 12)]  # each pair exactly once


def test_interval_overlap_join_rejects_colliding_columns(spark):
    import pytest

    from employee_data_management_system_data_engineering_solution_spark.operators.joins import (
        interval_overlap_join,
    )

    left = _iv(spark, [(1, 1, 0, 10)], "x", "s", "e")
    right = _iv(spark, [(2, 1, 0, 10)], "x", "rs", "re")
    with pytest.raises(ValueError, match="non-key columns"):
        interval_overlap_join(left, right, "k", "s", "e", "rs", "re", bucket_seconds=60)
