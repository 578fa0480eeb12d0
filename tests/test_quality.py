"""profile_columns / approx_distinct semantics."""

from __future__ import annotations

from employee_data_management_system_data_engineering_solution_spark.operators.quality import (
    approx_distinct,
    profile_columns,
)


def test_profile_columns_nulls_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 3.5), (3, "b", None), (4, "a", 0.5)],
        "k bigint, s string, v double",
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df).collect()}
    assert set(got) == {"k", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["s"]["n_nonnull"], got["s"]["n_distinct"]) == (3, 2)
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    assert (got["v"]["n_nonnull"], got["v"]["min_value"], got["v"]["max_value"]) == (3, "0.5", "3.5")
    assert got["k"]["n_distinct"] == 4


def test_profile_columns_subset(spark):
    df = spark.createDataFrame([(1, "x")], "k bigint, s string")
    out = profile_columns(df, ["s"]).collect()
    assert [r["col_name"] for r in out] == ["s"]


def test_approx_distinct_close_to_exact(spark):
    df = spark.range(10_000).selectExpr("id", "id % 137 AS m")
    row = approx_distinct(df, ["id", "m"], rsd=0.02).collect()[0]
    assert abs(row["id_approx"] - 10_000) / 10_000 < 0.1
    assert abs(row["m_approx"] - 137) / 137 < 0.1
