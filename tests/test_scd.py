"""SCD-2 close-out and keyed-upsert semantics (SURVEY.md §5 item 3;
reference ``merge2_tf_dim_staging.py:32-48`` and ``daily_dag.py:198-210``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from employee_data_management_system_data_engineering_solution_spark.operators.scd import (
    keyed_upsert,
    scd2_close_out,
)

D = dt.date


_SCHEMA = "emp_id long, start_date date, end_date date, status string, salary long"


def _dim(spark):
    return spark.createDataFrame(
        [
            # open period, will be closed by the batch
            (1, D(2020, 1, 1), None, "Active", 100),
            # already-closed period for the same key: untouched
            (1, D(2019, 1, 1), D(2020, 1, 1), "Inactive", 90),
            # open period with no batch match: stays open
            (2, D(2020, 6, 1), None, "Active", 200),
        ],
        _SCHEMA,
    )


def _staging(spark):
    return spark.createDataFrame(
        [
            # two batch rows for emp 1 — the EARLIEST start closes the dim
            (1, D(2021, 3, 1), None, "Active", 110),
            (1, D(2021, 2, 1), None, "Active", 105),
        ],
        _SCHEMA,
    )


def test_scd2_close_out_semantics(spark):
    out = scd2_close_out(_dim(spark), _staging(spark), key="emp_id")
    rows = {(r.emp_id, r.start_date): r for r in out.collect()}
    assert len(rows) == 5  # 3 dim + 2 batch

    closed = rows[(1, D(2020, 1, 1))]
    assert closed.end_date == D(2021, 2, 1)  # earliest batch start wins
    assert closed.status == "Inactive"

    untouched = rows[(1, D(2019, 1, 1))]
    assert untouched.end_date == D(2020, 1, 1) and untouched.status == "Inactive"

    unmatched_open = rows[(2, D(2020, 6, 1))]
    assert unmatched_open.end_date is None and unmatched_open.status == "Active"

    # the batch is appended as-is
    assert rows[(1, D(2021, 3, 1))].end_date is None
    assert rows[(1, D(2021, 2, 1))].status == "Active"


def test_scd2_close_out_broadcast_same_result(spark):
    plain = scd2_close_out(_dim(spark), _staging(spark), key="emp_id")
    forced = scd2_close_out(_dim(spark), _staging(spark), key="emp_id", broadcast_batch=True)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, forced.collect()))


def test_keyed_upsert(spark):
    dim = spark.createDataFrame(
        [
            Row(emp_id=1, day="2021-01-01", status="PENDING"),
            Row(emp_id=2, day="2021-01-01", status="ACTIVE"),
        ]
    )
    stg = spark.createDataFrame(
        [
            Row(emp_id=1, day="2021-01-01", status="CANCELLED"),  # matched → update
            Row(emp_id=3, day="2021-01-02", status="NEW"),  # not matched → insert
        ]
    )
    out = {(r.emp_id, r.day): r.status for r in keyed_upsert(dim, stg, keys=["emp_id", "day"]).collect()}
    assert out == {
        (1, "2021-01-01"): "CANCELLED",
        (2, "2021-01-01"): "ACTIVE",
        (3, "2021-01-02"): "NEW",
    }


def test_keyed_upsert_null_staging_value_falls_back_to_dim(spark):
    # coalesce semantics: a NULL in the staging value column keeps dim's value
    dim = spark.createDataFrame([(1, "d", "OLD")], "emp_id long, day string, status string")
    stg = spark.createDataFrame([(1, "d", None)], "emp_id long, day string, status string")
    out = keyed_upsert(dim, stg, keys=["emp_id", "day"]).collect()
    assert out[0].status == "OLD"
