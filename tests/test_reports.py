"""Report operators: count_by, pct_of_quota, upcoming_pct_report,
top_k_per_group (reference Task_4 jobs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.reports import (
    count_by,
    pct_of_quota,
    top_k_per_group,
    upcoming_pct_report,
)


def test_count_by_with_predicate(spark):
    df = spark.createDataFrame(
        [
            Row(designation="eng", status="Active"),
            Row(designation="eng", status="Active"),
            Row(designation="eng", status="Inactive"),
            Row(designation="ops", status="Active"),
        ]
    )
    out = {
        r.designation: r.active_count
        for r in count_by(
            df, "designation", predicate=F.col("status") == "Active", alias="active_count"
        ).collect()
    }
    assert out == {"eng": 2, "ops": 1}


def test_pct_of_quota_threshold(spark):
    quota = spark.createDataFrame([Row(emp_id=1, q=10.0), Row(emp_id=2, q=10.0), Row(emp_id=3, q=10.0)])
    availed = spark.createDataFrame([Row(emp_id=1, a=9), Row(emp_id=2, a=5)])
    out = pct_of_quota(quota, availed, key="emp_id", quota_col="q", availed_col="a", threshold=80.0)
    rows = out.collect()
    assert len(rows) == 1  # emp 1 at 90%; emp 2 at 50% below; emp 3 not availed (inner join)
    assert rows[0].emp_id == 1 and rows[0].percentage == 90.0


def test_upcoming_pct_report_end_to_end(spark):
    # window (Sun 2021-01-03, Sun 2021-01-10]: 5 weekdays, 1 weekday
    # holiday (Mon 4th) → 4 working days. emp 1 takes Tue+Wed (2/4=50%);
    # emp 2's only leave falls on the holiday (anti-joined away);
    # emp 3 cancelled; emp 4 weekend-only.
    leaves = spark.createDataFrame(
        [
            Row(emp_id=1, d=dt.date(2021, 1, 5), status="OK"),
            Row(emp_id=1, d=dt.date(2021, 1, 6), status="OK"),
            Row(emp_id=1, d=dt.date(2021, 1, 6), status="OK"),  # dup date counts once
            Row(emp_id=2, d=dt.date(2021, 1, 4), status="OK"),
            Row(emp_id=3, d=dt.date(2021, 1, 7), status="CANCELLED"),
            Row(emp_id=4, d=dt.date(2021, 1, 9), status="OK"),
        ]
    )
    hol = spark.createDataFrame([Row(holiday_date=dt.date(2021, 1, 4))])
    out = upcoming_pct_report(
        spark,
        leaves,
        emp_col="emp_id",
        date_col="d",
        status_col="status",
        cancelled="CANCELLED",
        anchor="2021-01-03",
        horizon="2021-01-10",
        holidays=hol,
        threshold_pct=25.0,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.emp_id == 1 and r.upcoming_leaves == 2
    assert r.total_working_days == 4 and r.percentage == 50.0


def test_top_k_per_group_rank_and_limit(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=i) for i in range(5)] + [Row(g="b", v=9)]
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 2).collect()
    got = {(r.g, r.v): r.rank_in_group for r in out}
    assert got == {("a", 4): 1, ("a", 3): 2, ("b", 9): 1}
