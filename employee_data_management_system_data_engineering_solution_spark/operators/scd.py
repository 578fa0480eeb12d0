"""SCD-2 merge and keyed upsert (SURVEY.md §2.4 J1/J4, §2.2 K5/K6).

* ``scd2_close_out`` — the reference's dim merge
  (``merge2_tf_dim_staging.py:32-48``): per-key min(start_date) of the
  incoming batch closes every open period (``end_date IS NULL``) of a
  matching key, then the batch is appended. Fixes the reference's
  fragile unaliased ``min(start_date)`` column (its line 43-45) and its
  positional ``union`` (line 48) — here everything is aliased and
  ``unionByName``.
* ``keyed_upsert`` — Postgres ``MERGE`` semantics
  (``daily_dag.py:198-210``: ON (emp_id,date), matched→update,
  not-matched→insert) as a full-outer join + per-column coalesce.

Scale notes: both are single-shuffle joins on the merge key. The
batch-mins side of the close-out is an aggregated daily batch — orders
of magnitude smaller than the dim — so AQE will usually pick a
broadcast join at runtime; pass ``broadcast_batch=True`` to force it
when the caller knows the batch is small. The upsert's full-outer join
cannot broadcast (outer side must shuffle); co-partitioning dim and
staging on the key (bucketing) removes the dim-side shuffle on a real
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_close_out(
    dim: DataFrame,
    staging: DataFrame,
    key: str,
    start_col: str = "start_date",
    end_col: str = "end_date",
    status_col: str = "status",
    inactive: str = "Inactive",
    broadcast_batch: bool = False,
) -> DataFrame:
    """Close open dim periods against an incoming batch, append batch.

    A dim row is "open" iff ``end_col IS NULL``; it gets closed with
    the batch's earliest ``start_col`` for that key and flipped to
    ``inactive`` (reference semantics at ``merge2_tf_dim_staging.py:39-45``).
    Non-matching / already-closed rows pass through unchanged.
    """
    mins = staging.groupBy(key).agg(F.min(start_col).alias("__batch_min_start"))
    if broadcast_batch:
        mins = F.broadcast(mins)

    joined = dim.join(mins, on=key, how="left")
    closing = F.col(end_col).isNull() & F.col("__batch_min_start").isNotNull()
    updated = joined.select(
        *[
            F.when(closing, F.col("__batch_min_start")).otherwise(F.col(c)).alias(c)
            if c == end_col
            else F.when(closing, F.lit(inactive)).otherwise(F.col(c)).alias(c)
            if c == status_col
            else F.col(c)
            for c in dim.columns
        ]
    )
    return updated.unionByName(staging.select(*dim.columns))


def keyed_upsert(dim: DataFrame, staging: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed upsert: staging wins on matched keys, unmatched rows from
    both sides survive (reference ``daily_dag.py:200-208`` SQL MERGE).

    Implemented as full-outer join + coalesce(staging, dim) per value
    column — the join-based MERGE emulation since Delta isn't assumed.
    """
    value_cols = [c for c in dim.columns if c not in keys]
    stg = staging.select(
        *keys, *[F.col(c).alias(f"__stg_{c}") for c in value_cols]
    )
    joined = dim.join(stg, on=keys, how="full")
    return joined.select(
        *keys,
        *[
            F.coalesce(F.col(f"__stg_{c}"), F.col(c)).alias(c)
            for c in value_cols
        ],
    )
