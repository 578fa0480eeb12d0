"""Calendar arithmetic (SURVEY.md §2.1 S5/S6 + ``Task_4_80perc.py:75-85``).

The reference synthesizes a date series with ``spark.range`` over a
driver-side ``datediff`` scalar, counts weekdays, and subtracts
weekday-holidays. This module keeps the whole computation distributed
and lazy — no ``collect()`` between plan fragments (the reference pulls
the holiday list and the datediff scalar to the driver at
``Task_4_80perc.py:59,78``; at scale that is a plan break and a
driver-memory hazard).

Day-of-week convention: Spark ``dayofweek`` is 1=Sunday … 7=Saturday,
so weekdays are ``dayofweek IN (2..6)`` (reference ``Task_4_80perc.py:53``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WEEKDAYS = [2, 3, 4, 5, 6]  # Mon..Fri in Spark dayofweek numbering


def date_series(
    spark: SparkSession, start: str | dt.date, end: str | dt.date, col_name: str = "d"
) -> DataFrame:
    """All dates in (start, end] as one DateType column.

    ``spark.range`` + ``date_add`` (reference pattern ``Task_4_80perc.py:81``)
    but the day count comes from ``sequence``-free lazy arithmetic: the
    range bound is computed once from the two literals, never from data.
    """
    start_d = dt.date.fromisoformat(start) if isinstance(start, str) else start
    end_d = dt.date.fromisoformat(end) if isinstance(end, str) else end
    n_days = (end_d - start_d).days
    return spark.range(1, n_days + 1).select(
        F.date_add(F.lit(start_d), F.col("id").cast("int")).alias(col_name)
    )


def is_weekday(col: Column) -> Column:
    return F.dayofweek(col).isin(WEEKDAYS)


def working_days(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    holidays: DataFrame | None = None,
    holiday_col: str = "holiday_date",
) -> DataFrame:
    """One-row DataFrame ``(total_working_days)``: weekdays in (start, end]
    minus weekday holidays (reference ``Task_4_80perc.py:75-85``; its
    weekday filter on holidays at line 53 is load-bearing — holidays on
    weekends must not be double-subtracted — and is preserved here).

    Returned as a DataFrame (not a collected scalar) so callers can
    cross-join it into the plan and keep everything lazy.
    """
    days = date_series(spark, start, end).filter(is_weekday(F.col("d")))
    if holidays is not None:
        wk_holidays = holidays.filter(is_weekday(F.col(holiday_col))).select(
            F.col(holiday_col).alias("d")
        ).distinct()
        # tiny dim: broadcast anti-join replaces the reference's collect+isin
        days = days.join(F.broadcast(wk_holidays), on="d", how="left_anti")
    return days.agg(F.count("*").alias("total_working_days"))
