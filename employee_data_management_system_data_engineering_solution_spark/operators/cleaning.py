"""Cleaning & dedup operators (SURVEY.md §2.6 W1/W2, §2.7 O3/O5, §2.8).

Covers the reference's two dedup strategies plus the epoch/status
derivations that precede them:

* W1 "keep best": among duplicate open periods keep the highest-salary
  row (``clean_load_2_tf_staging.py:78-84`` — window ``row_number`` over
  ``(emp_id, end_date)`` ordered by salary desc, then ``exceptAll`` the
  losers out of the batch).
* W2 "last write wins": one row per ``(emp_id, date)``, latest arrival
  wins (``clean_load_3_ld_staging.py:54-63``).

Scale notes: each window is ONE hash-partition shuffle on the partition
keys — there is no cheaper way to express "pick one row per key with a
specific winner" and Catalyst pushes the ``rn = 1`` filter into the
window via ``WindowGroupLimit`` (top-k pushdown), so only the winning
row per key survives the sort buffer. Determinism: callers must pass a
total order (tie-break on a unique column) or results are
nondeterministic under retries — the reference gets this wrong by
ordering on salary alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds_to_timestamp(df: DataFrame, cols: list[str]) -> DataFrame:
    """Epoch-seconds → TimestampType (reference ``clean_load_2_tf_staging.py:73-74``,
    which used ``from_unixtime`` + LEGACY parser; ``timestamp_seconds`` is
    the modern, timezone-stable equivalent)."""
    for c in cols:
        df = df.withColumn(c, F.timestamp_seconds(F.col(c).cast("bigint")))
    return df


def derive_status(
    df: DataFrame,
    end_col: str = "end_date",
    out_col: str = "status",
    active: str = "Active",
    inactive: str = "Inactive",
) -> DataFrame:
    """NULL end ⇒ open/Active period (reference ``clean_load_2_tf_staging.py:76``)."""
    return df.withColumn(
        out_col, F.when(F.col(end_col).isNull(), F.lit(active)).otherwise(F.lit(inactive))
    )


def _rn(partition_cols: list[str], order_cols: list[Column]) -> Column:
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return F.row_number().over(w)


def dedup_keep_best(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """W1: keep exactly one row per key, the first under ``order_cols``.

    Reference keeps the highest-salary open period per
    ``(emp_id, end_date)`` (``clean_load_2_tf_staging.py:78-82``).
    """
    return (
        df.withColumn("__rn", _rn(partition_cols, order_cols))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_last_write_wins(
    df: DataFrame,
    key_cols: list[str],
    arrival_col: str,
    tie_breakers: list[Column] | None = None,
) -> DataFrame:
    """W2: one row per key, the latest ``arrival_col`` wins
    (reference ``clean_load_3_ld_staging.py:57-63``, which synthesized
    arrival order with ``monotonically_increasing_id``; callers here
    must supply a real, totally-ordered column for determinism).
    ``tie_breakers`` extend the order when ``arrival_col`` alone is not
    unique within a key group."""
    order = [F.col(arrival_col).desc(), *(tie_breakers or [])]
    return dedup_keep_best(df, key_cols, order)


def remove_dupes_except_all(
    df: DataFrame, partition_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """The reference's literal W1+O3 flow: identify ``row_number > 1``
    losers, then multiset-subtract them (``clean_load_2_tf_staging.py:80-84``
    uses ``exceptAll``). Kept for bag-semantics parity — result equals
    :func:`dedup_keep_best` when the order is total, but preserves exact
    duplicate multiplicity the way ``exceptAll`` does."""
    with_rn = df.withColumn("__rn", _rn(partition_cols, order_cols))
    dupes = with_rn.filter(F.col("__rn") > 1).drop("__rn")
    return df.exceptAll(dupes)


def forward_fill(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    filled_alias: str | None = None,
) -> DataFrame:
    """Per-key forward fill (last-observation-carried-forward): NULLs
    in ``value_col`` take the most recent non-null value in key order.
    One shuffle on the key, sorted within partitions — the same
    merge-pass shape as the as-of join, and the standard repair step
    for gappy sensor/price/telemetry series. ``order_cols`` must be a
    total order per key or ties make the fill nondeterministic."""
    from pyspark.sql import Window

    out = filled_alias or f"{value_col}_filled"
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.last(value_col, ignorenulls=True).over(w))


def resample_interpolate(
    df: DataFrame,
    grid: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    round_digits: int = 4,
) -> DataFrame:
    """Linear interpolation of an irregular series onto a caller-built
    grid: every grid instant takes
    ``prev + (next − prev) · (t − t_prev) / (t_next − t_prev)`` from
    its surrounding observations (boundary instants clamp to the one
    neighbor that exists) — the resampling step that turns event-time
    telemetry into the regular series downstream models consume,
    extending :func:`forward_fill` (step repair) to linear repair.

    ``df``: (key, ts, order, value) observations — ``ts`` an integer
    epoch-seconds column, ``order`` a per-key total tiebreak (events in
    the same second interpolate in ``order`` order; grid rows sort
    BEFORE same-second events, so a grid instant colliding with an
    observation reproduces that observation's value exactly).
    ``grid``: (key, ts) instants to evaluate.

    Shape: one union, ONE shuffle on the key with two frame passes over
    the same sort (preceding-last + following-first, both
    ignore-nulls) — per-key state is a single row regardless of series
    length, and the arithmetic is a plain per-row expression, identical
    operation order in any engine.
    """
    ev = df.select(
        F.col(key_col),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(order_col).cast("long").alias("__o"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    )
    gr = grid.select(
        F.col(key_col),
        F.col(ts_col).cast("long").alias("__t"),
        F.lit(-1).cast("long").alias("__o"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(0).alias("__is_obs"),
    )
    u = ev.unionByName(gr)
    wprev = (
        Window.partitionBy(key_col)
        .orderBy("__t", "__o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy(key_col)
        .orderBy("__t", "__o")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("__v").isNotNull(), F.col("__t"))
    pv = F.last("__v", ignorenulls=True).over(wprev)
    pt = F.last(obs_t, ignorenulls=True).over(wprev)
    nv = F.first("__v", ignorenulls=True).over(wnext)
    nt = F.first(obs_t, ignorenulls=True).over(wnext)
    interp = (
        F.when(pv.isNull(), F.round(nv, round_digits))
        .when(nv.isNull(), F.round(pv, round_digits))
        .when(nt == pt, F.round(pv, round_digits))
        .otherwise(
            F.round(
                pv + (nv - pv) * (F.col("__t") - pt) / (nt - pt), round_digits
            )
        )
    )
    return (
        u.select(F.col(key_col), F.col("__t"), F.col("__is_obs"), interp.alias("__vi"))
        .filter(F.col("__is_obs") == 0)
        .select(key_col, F.col("__t").alias(ts_col), F.col("__vi").alias("v_interp"))
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-key winsorization (percentile clipping): values below the
    key's ``lo`` quantile or above its ``hi`` quantile are clamped to
    the cut — the standard robust repair for heavy-tailed metrics
    before aggregation/training (an outlier repair that, unlike the
    z-score DELETION in ``value_outliers``'s family, preserves row
    count and bounded mass).

    Appends ``<value>_wins`` plus the per-key ``__lo``/``__hi`` cuts.
    NULL discipline: a NULL value stays NULL (``least``/``greatest``
    alone would skip the NULL and fabricate the low cut — a repair must
    never invent readings), and a NULL KEY is a legitimate stratum —
    the cuts join is null-safe so its rows are clipped against their
    own group's percentiles rather than dropped.

    Boundary determinism: the interpolated cut either IS a data value
    (interpolation fraction 0) or lies strictly between two adjacent
    distinct data values, so a last-ulp engine difference in the
    interpolation can never flip a comparison against a data point.

    Scale: one groupBy computes both cuts per key (|keys| rows), then
    a join + narrow clamp — the corpus is touched twice. The cuts side
    is deliberately NOT force-broadcast: its cardinality is the KEY's,
    which a generic repair operator cannot bound (a high-cardinality
    key force-broadcast through the driver is an OOM at 100 TB). AQE
    observes the aggregate's actual runtime size and picks broadcast
    when it fits (the bounded-strata case here) or a shuffle join when
    it doesn't — both plans are correct; only one is safe at every
    cardinality."""
    cuts = df.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, array({lo}, {hi}))").alias("__ps")
    ).select(
        F.col(key_col).alias("__cut_key"),
        F.col("__ps")[0].alias("__lo"),
        F.col("__ps")[1].alias("__hi"),
    )
    v = F.col(value_col)
    clamped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    )
    return (
        df.join(cuts, F.col(key_col).eqNullSafe(F.col("__cut_key")))
        .drop("__cut_key")
        .withColumn(f"{value_col}_wins", clamped)
    )


def priority_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    *,
    k: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: priority
    sampling (Duffield, Lund & Thorup, "Priority sampling for
    estimation of arbitrary subset sums", JACM 2007). Each row draws a
    pseudo-uniform u_i from the seeded md5 of its key and gets
    priority w_i / u_i; the k highest priorities form the sample — an
    inclusion-probability-~proportional-to-weight design with
    near-optimal variance for subset-sum estimation, and the standard
    way to keep a FIXED-SIZE weighted sample of an unboundedly large
    table (uniform `TABLESAMPLE` under-represents exactly the heavy
    rows an audit cares about).

    Determinism discipline (cross-engine hash-exactness): u_i is the
    60-bit integer h_i from the md5 hex prefix, and the ordering
    w_i/u_i DESC is materialized as the EXACT integer ``h_i div w_i``
    ASC — floor division of two BIGINTs, bit-identical in Spark and
    DuckDB, with no float anywhere in the sort key (a libm-rounded
    double priority could flip boundary ranks between engines). The
    floor perturbs the true real-valued order only when two priorities
    agree to ~16 significant digits, and any tie breaks on the key
    columns, so the sample is a pure function of (keys, weights,
    seed): stable under reruns, row order, and cluster resizes, and
    joinable downstream like every other seeded-hash operator here.

    Weights are FLOORED to integers before use (the exact integer
    sort key requires a BIGINT divisor): rows whose floored weight is
    < 1 — NULL, non-positive, or fractional in (0, 1) — are excluded,
    and a fractional weight like 2.7 participates as 2. Inclusion is
    therefore proportional to ``floor(w)``, not ``w``; callers with
    sub-unit or precision-critical fractional weights should pre-scale
    to integers (e.g. ``round(w * 1000)``). The filter runs on the
    FLOORED value, never the raw column — a raw-positive fractional
    weight must not truncate to a zero divisor (``h div 0`` is NULL,
    and NULLS FIRST would silently hand such rows the sample slots).

    Scale shape: one narrow map computes the sort key; the top-k runs
    as TakeOrderedAndProject (per-partition bounded heaps merged on
    the driver — k rows, not a global sort of the corpus). The
    ``sample_rank`` window orders the k-row result only, a bounded
    barrier.
    """
    key_str = F.concat_ws("-", *[F.col(c).cast("string") for c in key_cols])
    digest = F.md5(F.concat(key_str, F.lit(":" + seed)))
    scored = (
        df.withColumn("weight", F.floor(weight_col).cast("bigint"))
        .filter(F.col("weight").isNotNull() & (F.col("weight") >= 1))
        .withColumn("__h", F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint"))
        .withColumn("priority_key", F.expr("__h div weight"))
        .drop("__h")
    )
    order_cols = [F.col("priority_key").asc()] + [F.col(c).asc() for c in key_cols]
    topk = scored.orderBy(*order_cols).limit(k)
    rank_w = Window.orderBy("priority_key", *key_cols)
    return topk.withColumn("sample_rank", F.row_number().over(rank_w).cast("int"))
