"""Exact-decimal money aggregation (functions/money.py): pins the
half-cent-tie regression that double summation caused at sf0.1, the
cross-engine agreement on EXACT .005 ties, and avg NULL semantics."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.functions.money import (
    money,
    money_avg,
    money_sum,
    one_minus_rate,
    sql_money,
    sql_money_avg,
    sql_money_sum,
    sql_one_minus_rate,
)


def test_money_sum_half_cent_tie_matches_duckdb(spark, tmp_path):
    """A group whose EXACT sum lands on .005 — the case double
    summation + double rounding resolved differently per engine. Both
    engines must now agree (decimal HALF_UP → rounds the tie up)."""
    # clean 2-dec inputs whose product is an exact .005 tie:
    # 10.01 * (1 - 0.50) = 5.005 in decimal arithmetic
    rows = [(1, 10.01, 0.50)]
    df = spark.createDataFrame(rows, "g INT, price DOUBLE, disc DOUBLE")
    got = (
        df.groupBy("g")
        .agg(money_sum(money("price") * one_minus_rate("disc"), "rev"))
        .collect()[0]
        .rev
    )
    p = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT {sql_money_sum(f"{sql_money('price')} * {sql_one_minus_rate('disc')}")} AS rev
            FROM '{p}/*.parquet' GROUP BY g"""
    ).fetchone()[0]
    assert got == want == 5.01  # HALF_UP on the exact 5.005 tie, both engines


def test_money_sum_is_order_independent(spark):
    """The defect class itself: many 2-dec values whose double sum is
    order-sensitive at the rounding digit must produce ONE value
    regardless of partitioning."""
    vals = [0.01] * 7 + [123456.78, 99999.99] * 3
    rows = [(1, v) for v in vals]
    a = (
        spark.createDataFrame(rows, "g INT, v DOUBLE")
        .repartition(1)
        .groupBy("g")
        .agg(money_sum(money("v"), "s"))
        .collect()[0]
        .s
    )
    b = (
        spark.createDataFrame(list(reversed(rows)), "g INT, v DOUBLE")
        .repartition(13)
        .groupBy("g")
        .agg(money_sum(money("v"), "s"))
        .collect()[0]
        .s
    )
    assert a == b


def test_money_avg_skips_nulls_like_avg(spark, tmp_path):
    rows = [(1, 10.00), (1, None), (1, 20.00)]
    df = spark.createDataFrame(rows, "g INT, v DOUBLE")
    got = df.groupBy("g").agg(money_avg(money("v"), 4, "a")).collect()[0].a
    assert got == 15.0  # divisor 2, not 3
    p = str(tmp_path / "t2.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {sql_money_avg(sql_money('v'), 4)} AS a FROM '{p}/*.parquet' GROUP BY g"
    ).fetchone()[0]
    assert want == 15.0


def test_money_contract_audit_flags_sub_cent_inputs(spark):
    """The ADVICE-proposed ingest audit: >2-decimal doubles (which
    money() would silently round, with engine-divergent .xx5 tie
    behavior) surface as a named count instead of a flaky oracle
    mismatch downstream."""
    from employee_data_management_system_data_engineering_solution_spark.functions.money import (
        money_contract_violation,
    )

    rows = [
        (1.23,),      # clean 2-dec
        (1.20,),      # trailing zero
        (-45.00,),    # negative, clean
        (None,),      # NULL: not a violation
        (1.234,),     # violation: 3 decimals
        (2.005,),     # violation: exact half-cent tie — the worst case
        (0.001,),     # violation: sub-cent
    ]
    df = spark.createDataFrame(rows, "v DOUBLE")
    n = df.agg(
        F.sum(money_contract_violation("v").cast("long")).alias("n")
    ).collect()[0].n
    assert n == 3


def test_money_contract_holds_on_driver_fixtures(spark):
    """Every column the engine feeds through money() honors the
    <=2-decimal contract on the driver's own tables — a contract break
    in a future fixture fails HERE as a named assertion, not as a
    half-cent oracle flake at one SF."""
    from employee_data_management_system_data_engineering_solution_spark.functions.money import (
        money_contract_violation,
    )

    sf = "/root/testdata/sf0.001"
    for table, col in [
        ("lineitem", "l_extendedprice"),
        ("orders", "o_totalprice"),
        ("events", "value"),
    ]:
        df = spark.read.parquet(f"{sf}/{table}.parquet")
        bad = df.agg(
            F.sum(money_contract_violation(col).cast("long")).alias("n")
        ).collect()[0].n
        assert (bad or 0) == 0, f"{table}.{col}: {bad} sub-cent rows"


def test_money_contract_audit_flags_overflow(spark):
    """Values money() would overflow to NULL are violations, not clean
    rows — the audit must flag exactly the rows the cast corrupts."""
    from employee_data_management_system_data_engineering_solution_spark.functions.money import (
        money_contract_violation,
    )

    rows = [
        (99999999999.99,),  # 11 integral digits: overflows DECIMAL(12,2)
        (1e18,),            # beyond even the audit's DECIMAL(24,8)
        (1234567890.12,),   # 10 integral digits: fits, clean
        (None,),
    ]
    df = spark.createDataFrame(rows, "v DOUBLE")
    n = df.agg(
        F.sum(money_contract_violation("v").cast("long")).alias("n")
    ).collect()[0].n
    assert n == 2
