"""Distributed prefix scan (running totals over a global order).

The naive Spark spelling — ``sum(x) OVER (ORDER BY k)`` with no
partition — funnels the WHOLE table through one task (Catalyst plans a
single-partition window), the same hazard the decile operator removed
from ``price_decile_stats``. This module implements the classic
two-level scan instead:

1. bucket rows by a range function of the order key (narrow map),
2. aggregate one subtotal per bucket (partial-agg shuffle on the
   bucket id — thousands of rows, not billions),
3. window the TINY bucket-subtotal table into exclusive bucket
   offsets and broadcast them back,
4. finish with a within-bucket running sum (window partitioned BY
   BUCKET, so every partition scans only its own slice).

Every step is plain DataFrame ops; results are identical to the
single-task window, which is exactly what the DuckDB oracle runs.

Scale: with ``bucket_width`` rows per bucket the driver-side table is
``n / bucket_width`` rows; pick a width that keeps it in the low
millions at most (or recurse the same construction once more —
documented, not needed at tested scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    bucket_width: int = 4096,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be unique (it defines the scan order; ties would
    make "inclusive" ambiguous and break oracle determinism) and
    numeric, since buckets come from integer-dividing it. NULL order
    keys are rejected by the floor() arithmetic upstream of the join —
    callers filter them first. The output column keeps ``sum()``'s
    natural type for the input (long for integral ``value_col``,
    double for fractional) — no narrowing cast.
    """
    bkt = F.floor(F.col(order_col) / bucket_width)
    with_b = df.withColumn("__bkt", bkt)
    subtotal = with_b.groupBy("__bkt").agg(F.sum(value_col).alias("__bsum"))
    # exclusive offsets over the bucket table: tiny (n / bucket_width
    # rows), so the unpartitioned window is safe HERE and only here
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtotal.select(
        "__bkt", F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__bkt").orderBy(order_col)
    return (
        with_b.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__off") + F.sum(value_col).over(w_in))
        .drop("__bkt", "__off")
    )
