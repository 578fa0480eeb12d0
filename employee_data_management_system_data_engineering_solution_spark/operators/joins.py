"""Ordered joins: as-of join and interval (range) join.

The reference engine has no ordered joins (SURVEY §2.4 lists only
equi-joins); these are north-star extensions for event/time-series
processing at scale — attribution ("latest view before each purchase"),
state lookup as-of a timestamp, and point-in-interval containment.

Scale design
------------
``asof_join`` is the canonical distributed merge-as-of: both sides are
unioned, hash-partitioned on the join key (ONE shuffle), sorted within
each partition on the event time, and the most recent right-side payload
is carried forward with a running ``last(ignorenulls=True)`` window.
No range explosion, no per-key collect, no broadcast requirement —
each key's timeline is processed in a single sorted pass, so the cost
is the same as one sort-merge join regardless of time-gap distribution.

``interval_bucket_join`` avoids the cross-join that a naive
point-in-interval predicate would produce when there is NO equality
key: intervals are exploded onto coarse time buckets (an interval of
typical length ≈ bucket width lands in 1–2 buckets), points map to
exactly one bucket, and the join becomes an equi-join on the bucket id
with a residual range filter. Each (interval, point) pair can only meet
in the point's single bucket, so no post-join dedup is needed. At 100 TB
the bucket key distributes uniformly when event time does; hot buckets
(flash-crowd seconds) can additionally be salted by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_BUCKET = "__range_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    *,
    strict: bool = False,
    payload_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the most recent
    right row with ``right_ts <= left_ts`` (``< left_ts`` when
    ``strict``) for the same key.

    ``payload`` columns from the matched right row are appended to the
    left row as ``{payload_prefix}{col}`` (NULL when no right row
    precedes the left row). Right-side rows must be unique per
    ``(key, right_ts)`` for a deterministic result — pre-dedup with a
    total order otherwise (see ``cleaning.dedup_last_write_wins``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.struct(*[F.col(c) for c in payload]).alias(_PAYLOAD),
    )
    # At equal timestamps the right row must sort BEFORE the left row for
    # inclusive (backward) semantics, AFTER it for strict semantics.
    l_side, r_side = (1, 0) if not strict else (0, 1)
    lhs = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(l_side))
    rhs = r.withColumn(_SIDE, F.lit(r_side))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_left = F.col(_SIDE) == F.lit(l_side)
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    return matched.filter(is_left).select(
        *left.columns,
        *[
            F.col(f"{_PAYLOAD}.{c}").alias(f"{payload_prefix}{c}")
            for c in payload
        ],
    )


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join points to half-open intervals ``[start, end)`` with no
    equality key, via time-bucket equi-join + residual range filter.

    Returns ``intervals ⋈ points`` rows (all columns of both; callers
    project/aggregate). ``bucket_seconds`` should be on the order of the
    typical interval length; an interval spanning B buckets is
    replicated B times (bounded, unlike a cross join).

    Inner-join only: the bucket-replication scheme would emit one
    unmatched row per spanned bucket under outer join types, so those
    are rejected rather than silently returning duplicates.
    """
    if how != "inner":
        raise ValueError(
            "interval_bucket_join supports how='inner' only: interval "
            "replication across buckets would duplicate unmatched rows "
            f"under outer join types (got {how!r})"
        )
    b = int(bucket_seconds)
    ivals = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                # end is exclusive: last bucket that can contain a point < end
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        _BUCKET, F.floor(F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    cond: Column = (
        (ivals[_BUCKET] == pts[_BUCKET])
        & (pts[point_ts] >= ivals[start_col])
        & (pts[point_ts] < ivals[end_col])
    )
    return ivals.join(pts, cond, how).drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    *,
    bucket_seconds: int,
) -> DataFrame:
    """Keyed interval × interval OVERLAP join: all (left, right) pairs
    sharing the equality key whose CLOSED intervals intersect
    (``ls <= re AND rs <= le`` — touching endpoints count; pre-shrink
    an endpoint for open semantics).

    Scale shape: both sides explode onto coarse time buckets
    (⌈len/bucket⌉+1 replicas per interval — bounded, unlike the theta
    join Spark would otherwise plan as key-equi-join + per-key
    quadratic filter on hot keys), the join is a pure equi-join on
    (key, bucket), and the residual overlap predicate runs on the
    bucket-matched candidates only. A pair can meet in every bucket
    its intervals share, so the join is made DEDUP-FREE by keeping
    each pair only in the bucket containing ``greatest(ls, rs)`` —
    the overlap's start — which both spans provably contain; no
    post-join ``distinct`` shuffle. Pick ``bucket_seconds`` on the
    order of the typical interval length.

    Output: all left columns then all right columns except the shared
    keys. Non-key column names must be disjoint (rename before
    calling); NULL keys do not join (standard equi-join semantics,
    matching the SQL the oracle would write).
    """
    keys = [on] if isinstance(on, str) else list(on)
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(shared)}; "
            "rename before joining"
        )
    b = int(bucket_seconds)

    def span(start: str, end: str) -> Column:
        return F.sequence(
            F.floor(F.unix_timestamp(F.col(start)) / b).cast("long"),
            F.floor(F.unix_timestamp(F.col(end)) / b).cast("long"),
        )

    l = left.withColumn(_BUCKET, F.explode(span(left_start, left_end))).alias("__l")
    r = right.withColumn(_BUCKET, F.explode(span(right_start, right_end))).alias("__r")
    ls, le = F.col(f"__l.{left_start}"), F.col(f"__l.{left_end}")
    rs, re_ = F.col(f"__r.{right_start}"), F.col(f"__r.{right_end}")
    cond: Column = F.col(f"__l.{_BUCKET}") == F.col(f"__r.{_BUCKET}")
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    overlap = (ls <= re_) & (rs <= le)
    anchor = F.col(f"__l.{_BUCKET}") == F.floor(
        F.unix_timestamp(F.greatest(ls, rs)) / b
    ).cast("long")
    joined = l.join(r, cond & overlap & anchor, "inner")
    return joined.select(
        *[F.col(f"__l.{c}") for c in left.columns],
        *[F.col(f"__r.{c}") for c in right.columns if c not in keys],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the MITIGATION to the measurement
    ``join_key_skew_report`` (X112) provides. A hot join key sends all
    its rows to one reducer and one task runs for hours while the rest
    idle; salting splits each key's LEFT rows across ``salts``
    sub-partitions and replicates the RIGHT side once per salt, so the
    hot key's work spreads over ``salts`` tasks. Use when the PROBE
    side is skewed and the BUILD side's per-key payload is small
    (dimension-shaped); AQE's skew-join handles the symmetric case,
    but salting is the portable, plannable form that also works under
    static partitioning and in streaming micro-batches.

    Result contract: IDENTICAL to the plain join. Each left row gets
    exactly ONE deterministic salt (``pmod(xxhash64(whole row), salts)``
    — derived from the row, not rand(), so reruns and retries agree),
    and each right row is replicated to ALL salts, so every matching
    (left, right) pair meets in exactly one (key, salt) bucket — no
    dup, no loss; unmatched left rows under ``how='left'`` survive
    exactly once. Property-tested equal to the plain join on random
    frames.

    Cost model: right side is written ``salts``× through the shuffle
    (or broadcast ``salts``× larger) — the classic trade: pay
    replication on the small side to buy parallelism on the big side.
    Keep ``salts`` ~ (hot-key share × target tasks), not huge.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_l = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salts)
    ).cast("int")
    l = left.withColumn("__salt", salt_l)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")
