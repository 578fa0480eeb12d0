"""Analytical reports (SURVEY.md §2.5 A1-A6, §2.4 J2/J3, §2.3 P5-P17).

The reference's three reporting jobs, generalized:

* ``count_by`` — active-employees-per-designation
  (``Task_4_generate_active_table.py:27-30``).
* ``pct_of_quota`` — monthly >80 %-of-leave-quota report
  (``Task_4_monthly_80_percent.py:48-66``): quota sum ⋈ availed count,
  percentage, threshold.
* ``upcoming_pct_report`` — upcoming-leave >N %-of-working-days report
  (``Task_4_80perc.py:40-89``), with the driver-side ``collect()`` +
  ``isin`` holiday filter replaced by a broadcast anti-join and the
  scalar working-days denominator kept lazy via a 1-row cross join
  (broadcast — no shuffle).

Every aggregate output is explicitly aliased (the reference leaked an
auto-generated ``min(start_date)`` name, SURVEY.md §2.12).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .calendar import is_weekday, working_days


def count_by(
    df: DataFrame,
    group_col: str,
    predicate: Column | None = None,
    alias: str = "count",
) -> DataFrame:
    """Filtered group-count (A1/A3). One partial-agg shuffle; the
    map-side combine makes the shuffle payload one row per group per task."""
    if predicate is not None:
        df = df.filter(predicate)
    return df.groupBy(group_col).agg(F.count("*").alias(alias))


def pct_of_quota(
    quota: DataFrame,
    availed: DataFrame,
    key: str,
    quota_col: str,
    availed_col: str,
    threshold: float,
    pct_alias: str = "percentage",
) -> DataFrame:
    """quota ⋈ availed on ``key``; keep rows above ``threshold`` percent
    (reference ``Task_4_monthly_80_percent.py:59-66``). Both inputs are
    already per-key aggregates, so the join is between two shuffled-and-
    reduced sides — AQE picks broadcast when one fits."""
    joined = quota.join(availed, on=key, how="inner")
    pct = F.round(F.col(availed_col) / F.col(quota_col) * 100, 2).alias(pct_alias)
    return joined.select(key, quota_col, availed_col, pct).filter(
        F.col(pct_alias) > threshold
    )


def upcoming_pct_report(
    spark: SparkSession,
    leaves: DataFrame,
    emp_col: str,
    date_col: str,
    status_col: str,
    cancelled: str,
    anchor: str | dt.date,
    horizon: str | dt.date,
    holidays: DataFrame | None = None,
    holiday_col: str = "holiday_date",
    threshold_pct: float = 8.0,
) -> DataFrame:
    """Upcoming-leave percentage report (reference ``Task_4_80perc.py``).

    Pipeline: future-window filter → exclude cancelled → weekdays only →
    anti-join weekday holidays → dedup (emp, date) → count per emp →
    divide by the working-day count of (anchor, horizon] → keep > N %.

    ``anchor`` replaces the reference's ``current_date()`` so results
    are reproducible against historical test data.
    """
    d = F.col(date_col)
    upcoming = (
        leaves.filter((d > F.lit(anchor)) & (d <= F.lit(horizon)))
        .filter(F.col(status_col) != cancelled)
        .filter(is_weekday(d))
    )
    if holidays is not None:
        wk_hol = (
            holidays.filter(is_weekday(F.col(holiday_col)))
            .select(F.col(holiday_col).alias(date_col))
            .distinct()
        )
        upcoming = upcoming.join(F.broadcast(wk_hol), on=date_col, how="left_anti")

    per_emp = (
        upcoming.select(emp_col, date_col)
        .dropDuplicates([emp_col, date_col])
        .groupBy(emp_col)
        .agg(F.count("*").alias("upcoming_leaves"))
    )
    denom = working_days(spark, anchor, horizon, holidays, holiday_col)
    return (
        per_emp.crossJoin(F.broadcast(denom))
        .withColumn(
            "percentage",
            F.round(F.col("upcoming_leaves") / F.col("total_working_days") * 100, 2),
        )
        .filter(F.col("percentage") > threshold_pct)
        .select(emp_col, "upcoming_leaves", "total_working_days", "percentage")
    )


def ordered_with_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "position"
) -> DataFrame:
    """Ordered output (SURVEY §2.7 O1/O2, reference
    ``clean_load_2_tf_staging.py:85``, ``Task_4_monthly_80_percent.py:51,66``)
    with the ordering made hash-visible: a global ``row_number`` stamps
    each row's position so an order-insensitive comparison still proves
    the sort.

    The rank window is a single-partition sort — use ONLY on small
    report outputs (the reference's sorted writes are final reports).
    Large ordered exports should use ``df.orderBy`` alone, which Spark
    executes as a range-partitioned parallel sort without the window
    bottleneck.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*order_cols)
    return df.orderBy(*order_cols).withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via rank window; Catalyst rewrites the
    ``rn <= k`` filter into WindowGroupLimit so only k rows per group
    ever leave the sort. Callers must give a total order."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )
