"""connected_components semantics on hand-built edge lists."""

from __future__ import annotations

import pytest

from employee_data_management_system_data_engineering_solution_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


def test_two_components_transitive(spark):
    # 1-2, 2-3 chain + separate 10-11
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # a 6-node path: label must propagate across the diameter
    got = _cc(spark, [(i, i + 1) for i in range(1, 6)])
    assert set(got.values()) == {1}


def test_direction_irrelevant(spark):
    assert _cc(spark, [(5, 1), (1, 9)]) == {1: 1, 5: 1, 9: 1}


def test_max_iter_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "src bigint, dst bigint")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=1)
