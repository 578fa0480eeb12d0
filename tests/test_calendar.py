"""Working-day arithmetic (SURVEY.md §5 item 3; reference
``Task_4_80perc.py:75-85``)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.operators.calendar import (
    date_series,
    is_weekday,
    working_days,
)


def test_date_series_is_exclusive_start_inclusive_end(spark):
    out = [r.d for r in date_series(spark, "2021-01-01", "2021-01-04").collect()]
    assert sorted(out) == [dt.date(2021, 1, 2), dt.date(2021, 1, 3), dt.date(2021, 1, 4)]


def test_is_weekday(spark):
    df = spark.createDataFrame(
        [Row(d=dt.date(2021, 1, 4)), Row(d=dt.date(2021, 1, 9)), Row(d=dt.date(2021, 1, 10))]
    )  # Mon, Sat, Sun
    out = df.select(is_weekday(F.col("d")).alias("w")).collect()
    assert [r.w for r in out] == [True, False, False]


def test_working_days_plain_week(spark):
    # (Sun 2021-01-03, Sun 2021-01-10] = Mon..Sun → 5 weekdays
    n = working_days(spark, "2021-01-03", "2021-01-10").collect()[0].total_working_days
    assert n == 5


def test_weekend_holiday_not_double_subtracted(spark):
    # the reference's weekday filter on holidays is load-bearing
    # (Task_4_80perc.py:53): a Saturday holiday must not reduce the count
    hol = spark.createDataFrame(
        [Row(holiday_date=dt.date(2021, 1, 9)), Row(holiday_date=dt.date(2021, 1, 4))]
    )  # Sat + Mon
    n = working_days(spark, "2021-01-03", "2021-01-10", holidays=hol).collect()[0]
    assert n.total_working_days == 4  # only the Monday holiday subtracts


def test_duplicate_holidays_subtract_once(spark):
    hol = spark.createDataFrame(
        [Row(holiday_date=dt.date(2021, 1, 4)), Row(holiday_date=dt.date(2021, 1, 4))]
    )
    n = working_days(spark, "2021-01-03", "2021-01-10", holidays=hol).collect()[0]
    assert n.total_working_days == 4
