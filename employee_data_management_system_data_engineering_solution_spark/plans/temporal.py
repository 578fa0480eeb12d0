"""Ordered-join queries (as-of, interval containment) over ``events``.

North-star extensions (SURVEY §2.11.1): the reference has only
equi-joins; event/time-series pipelines additionally need "latest state
as of T" (attribution, dimension snapshot lookup) and
point-in-interval containment, both implemented shuffle-lean in
``operators/joins.py``.

Timestamp parity convention: epoch seconds as BIGINT on both sides
(Spark ``unix_timestamp`` ≡ DuckDB ``CAST(floor(epoch(ts)) AS
BIGINT)``), and NULL-free sentinel ``-1`` for unmatched left-join
payloads so integer columns stay integer-typed through pandas on both
sides of the driver's canonicalizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import money, money_sum
from ..operators.joins import asof_join, interval_bucket_join
from ..sources.io import read_table
from .registry import register


# --------------------------------------------------------------------------
# As-of join: most recent 'view' at/before each 'purchase' per user
# (attribution shape; distributed merge-as-of, one shuffle)
# --------------------------------------------------------------------------
@register(
    "purchase_asof_view",
    """
    SELECT l.event_id,
           l.user_id,
           CAST(floor(epoch(l.ts)) AS BIGINT)                   AS purchase_ts,
           round(l.value, 2)                                    AS amount,
           COALESCE(r.event_id, -1)                             AS prior_view_id,
           COALESCE(CAST(floor(epoch(r.ts)) AS BIGINT), -1)     AS prior_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def purchase_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("amount")
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "ts"],
        payload_prefix="view_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("purchase_ts"),
        "amount",
        F.coalesce(F.col("view_event_id"), F.lit(-1)).alias("prior_view_id"),
        F.coalesce(F.unix_timestamp("view_ts"), F.lit(-1)).alias("prior_view_ts"),
    )


# --------------------------------------------------------------------------
# Interval (range) join with NO equality key: traffic inside the hour
# after each high-severity error, via bucketed containment join
# --------------------------------------------------------------------------
@register(
    "events_in_error_windows",
    """
    SELECT w.event_id                     AS window_id,
           count(*)                       AS n_events,
           CAST(round(sum(CAST(e.value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
    FROM (SELECT event_id, ts, ts + INTERVAL 1 HOUR AS te
          FROM events WHERE event_type = 'error' AND value > 150) w
    JOIN events e ON e.ts >= w.ts AND e.ts < w.te
    GROUP BY 1
    """,
)
def events_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    windows = ev.filter((F.col("event_type") == "error") & (F.col("value") > 150)).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    points = ev.select(F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value"))
    joined = interval_bucket_join(
        points, windows, "p_ts", "w_start", "w_end", bucket_seconds=3600
    )
    # every window contains its own error event, so inner join loses none
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        money_sum(money("p_value"), "sum_value"),
    )


@register(
    "purchase_error_overlap",
    # overlap_s is microsecond-exact on both engines (integer micros
    # floor-divided to seconds), so the hash covers the overlap length,
    # not just the pair set.
    """
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             ts - INTERVAL 2 HOUR AS s, ts AS e
      FROM events WHERE event_type = 'purchase'
    ),
    w AS (
      SELECT event_id AS error_id, user_id,
             ts AS s, ts + INTERVAL 1 HOUR AS e
      FROM events WHERE event_type = 'error'
    )
    SELECT p.purchase_id, w.error_id, p.user_id AS user_id,
           date_diff('microsecond', greatest(p.s, w.s), least(p.e, w.e))
             // 1000000 AS overlap_s
    FROM p JOIN w
      ON p.user_id = w.user_id AND p.s <= w.e AND w.s <= p.e
    """,
)
def purchase_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval OVERLAP join (X118): each purchase's 2-hour
    consideration window against the same user's 1-hour error windows —
    which purchases were shopped through an incident, and for how long.
    Runs through ``operators.joins.interval_overlap_join``: both
    interval sets explode onto hour buckets, the join is a pure
    (user, bucket) equi-join with a residual overlap predicate, and
    each pair is kept only in the bucket holding ``greatest(starts)``
    so the result is dedup-free with no distinct shuffle — the keyed
    generalization of ``events_in_error_windows``'s point-in-interval
    machinery, closing the interval-join family. The oracle is the
    naive theta join, so the bucket algebra (span coverage, anchor
    uniqueness, boundary-touching pairs) is hash-checked pairwise."""
    from ..operators.joins import interval_overlap_join

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("p_s"),
        F.col("ts").alias("p_e"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("w_s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_e"),
    )
    j = interval_overlap_join(
        purchases, errors, "user_id", "p_s", "p_e", "w_s", "w_e",
        bucket_seconds=3600,
    )
    return j.select(
        "purchase_id",
        "error_id",
        "user_id",
        # `div` = integral division, so the micros→seconds floor stays
        # in exact integer arithmetic (a double quotient could land on
        # x.999… and truncate differently from the oracle's `//`)
        F.expr(
            "(unix_micros(least(p_e, w_e)) - unix_micros(greatest(p_s, w_s)))"
            " div 1000000"
        ).alias("overlap_s"),
    )


# --------------------------------------------------------------------------
# Grouped Arrow UDAF (applyInPandas): per-user least-squares value trend
# --------------------------------------------------------------------------
@register(
    "user_value_trend",
    """
    SELECT user_id,
           count(*) AS n,
           round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4) AS slope
    FROM events
    GROUP BY user_id
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key model fitting via ``applyInPandas`` — the grouped-UDAF
    shape for logic the built-ins can't express (here OLS slope,
    chosen BECAUSE it has a closed-form SQL oracle: regr_slope).
    Arrow moves each key group to Python as one batch; numpy does the
    math vectorized. One shuffle on the group key; group size bounds
    worker memory, key cardinality does not. The time axis is exact
    microseconds on both sides so the regression inputs are
    bit-identical."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") / F.lit(86400000000.0)).alias("x_day"),
        "value",
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x_day"].to_numpy()
        y = pdf["value"].to_numpy()
        xc = x - x.mean()
        slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n": [len(pdf)], "slope": [round(slope, 4)]}
        )

    return ev.groupBy("user_id").applyInPandas(fit, "user_id bigint, n bigint, slope double")


# --------------------------------------------------------------------------
# Gap-fill imputation: per-user forward fill over masked readings
# --------------------------------------------------------------------------
@register(
    "forward_fill_values",
    """
    WITH masked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE round(value, 2) END AS v
      FROM events
    )
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
           coalesce(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS v_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_imputed
    FROM masked
    """,
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward repair: 'error' events mask
    their reading to NULL and inherit the user's most recent healthy
    value (leading NULLs → sentinel -1). Exercises
    ``cleaning.forward_fill`` — one keyed sort pass."""
    from ..operators.cleaning import forward_fill

    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        # null-safe: NULL event_type must KEEP its value (mirrors the
        # oracle's CASE WHEN event_type = 'error'), not be masked
        F.when(~F.col("event_type").eqNullSafe("error"), F.round("value", 2)).alias("v"),
    )
    filled = forward_fill(ev, ["user_id"], ["ts", "event_id"], "v", filled_alias="vf")
    return filled.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_sec"),
        F.coalesce(F.col("vf"), F.lit(-1.0)).alias("v_filled"),
        F.when(F.col("v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_imputed"),
    )


# --------------------------------------------------------------------------
# Batch sessionization: gaps-and-islands over per-user event timelines
# --------------------------------------------------------------------------
@register(
    "event_sessions",
    """
    WITH t AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts_sec,
             CASE WHEN ts_sec - lag(ts_sec) OVER w > 1800
                    OR lag(ts_sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    ),
    numbered AS (
      SELECT user_id, event_id, ts_sec,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id,
           session_no,
           count(*)                    AS n_events,
           min(ts_sec)                 AS first_sec,
           max(ts_sec)                 AS last_sec,
           max(ts_sec) - min(ts_sec)   AS duration_sec
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks after
    a >30-minute silence per user; one row per session with event count
    and span. The batch twin of the streaming ``session_window_counts``
    carrier — same boundary rule, windowed instead of stateful.

    Scale: one shuffle on ``user_id`` shared by BOTH window functions
    and the final aggregate (same partitioning key), so the plan is
    sort-once within partitions; no joins, no collect. Tie-break on
    ``event_id`` makes the running session numbering a total order
    (engine-portable)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_sec")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec").over(w) > 1800, F.lit(1)
        ).when(F.lag("ts_sec").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(run))
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_sec").alias("first_sec"),
        F.max("ts_sec").alias("last_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
    )


# ---------------------------------------------------------------------------
# Per-key z-score outliers — metric anomaly pass
# ---------------------------------------------------------------------------
def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outliers (X121): events whose value sits
    ≥3 robust z-units from their event type's MEDIAN, with the scale
    estimated by the median absolute deviation — the heavy-tail-proof
    sibling of ``value_outliers``'s mean/stddev z-score (one extreme
    value inflates σ and can mask every other outlier; the median and
    MAD have 50% breakdown, so contamination can't hide itself). The
    1.4826 factor rescales MAD to σ-equivalents under normality; the
    threshold applies to z rounded to 6 dp (repo convention — the
    division carries ulp noise near the cut).

    Scale shape: two aggregation passes (the second median genuinely
    depends on the first — MAD is not a single-pass statistic), each
    a per-type partial agg; the stats tables are |event_types| rows so
    both joins broadcast under AQE. Exact distributed medians sort
    within groups; at corpus scale the sketch twin is
    ``approx_percentile`` exactly as the X32/X108 pairing."""
    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("__m"))
    mad = (
        ev.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.median(F.abs(F.col("value") - F.col("__m"))).alias("__mad"),
            F.first("__m").alias("__m"),
        )
    )
    z = (F.col("value") - F.col("__m")) / (F.lit(1.4826) * F.col("__mad"))
    return (
        ev.join(mad, "event_type")
        .filter((F.col("__mad") > 0) & (F.abs(F.round(z, 6)) >= 3))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("robust_z"),
        )
    )


register(
    "value_outliers_mad",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - med.m)) AS mad,
             any_value(med.m) AS m
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 4) AS value,
           round((e.value - mad.m) / (1.4826 * mad.mad), 4) AS robust_z
    FROM events e JOIN mad ON e.event_type = mad.event_type
    WHERE mad.mad > 0
      AND abs(round((e.value - mad.m) / (1.4826 * mad.mad), 6)) >= 3
    """,
)(value_outliers_mad)


@register(
    "value_outliers",
    """
    WITH stats AS (
      SELECT user_id,
             avg(value)    AS mu,
             stddev(value) AS sigma,
             count(*)      AS n
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round(e.value, 4)                    AS value,
           round((e.value - s.mu) / s.sigma, 4) AS z
    FROM events e JOIN stats s ON e.user_id = s.user_id
    WHERE s.n >= 2 AND s.sigma > 0
      AND abs(round((e.value - s.mu) / s.sigma, 6)) >= 2.5
    """,
)
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers over the event value metric: events
    more than 2.5 sample standard deviations from their user's mean —
    the standard per-entity anomaly pass of a metrics/quality pipeline.

    Scale shape: one partial-agg shuffle builds the per-key stats table
    (one row per user — entity-bounded, far smaller than the event
    log), the probability lookup is an equi-join of events against that
    aggregated table (broadcast when the key space is small, shuffle
    join otherwise — Spark picks via AQE), and the z filter is a narrow
    codegen'd map. No window over the raw events, so nothing ever
    single-partitions. The threshold applies to z ROUNDED to 6 dp on
    both engines (repo convention for cross-engine comparisons): the
    raw z carries avg/stddev summation-order ulp noise, and an
    unrounded >= 2.5 test could flip a borderline event's membership
    between Spark and the oracle; projection rounds to 4 dp."""
    ev = read_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("__mu"),
        F.stddev("value").alias("__sigma"),
        F.count(F.lit(1)).alias("__n"),
    )
    z = (F.col("value") - F.col("__mu")) / F.col("__sigma")
    return (
        ev.join(stats, "user_id")
        .filter(
            (F.col("__n") >= 2)
            & (F.col("__sigma") > 0)
            & (F.abs(F.round(z, 6)) >= 2.5)
        )
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "hourly_interpolated_series",
    """
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             event_id,
             round(value, 2) AS v
      FROM events WHERE user_id < 20
    ),
    b AS (SELECT user_id, min(tsec) AS mn, max(tsec) AS mx FROM ev GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(mn // 3600 * 3600, mx, 3600)) AS tsec
      FROM b
    ),
    u AS (
      SELECT user_id, tsec AS t, event_id AS o, v, 1 AS is_obs FROM ev
      UNION ALL
      SELECT user_id, tsec AS t, -1 AS o, NULL AS v, 0 AS is_obs FROM grid
    ),
    w AS (
      SELECT user_id, t, is_obs,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, o
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, o
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM u
    )
    SELECT user_id, t AS ts_sec,
           CASE WHEN pv IS NULL THEN round(nv, 4)
                WHEN nv IS NULL THEN round(pv, 4)
                WHEN nt = pt THEN round(pv, 4)
                ELSE round(pv + (nv - pv) * (t - pt) / (nt - pt), 4)
           END AS v_interp
    FROM w WHERE is_obs = 0
    """,
)
def hourly_interpolated_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular event-value series onto an hourly
    grid by linear interpolation (``operators.cleaning
    .resample_interpolate``) — forward_fill's step repair upgraded to
    linear repair, the standard feature-engineering step that turns
    event-time telemetry into the regular series sequence models train
    on. Grid instants are integer epoch-seconds (min-hour .. max event
    per user), so grid arithmetic is integer on both engines and the
    single float expression evaluates in identical order.

    Scale: grid construction is one per-key min/max agg + an explode
    bounded by the series' time span; the interpolation is ONE shuffle
    on the key with two ignore-nulls frame passes over one sort."""
    from ..operators.cleaning import resample_interpolate

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("tsec"),
            "event_id",
            F.round("value", 2).alias("v"),
        )
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("tsec").alias("mn"), F.max("tsec").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.expr("mn div 3600") * 3600, F.col("mx"), F.lit(3600)
            )
        ).alias("tsec"),
    )
    return resample_interpolate(
        ev, grid, "user_id", "tsec", "event_id", "v", round_digits=4
    ).select("user_id", F.col("tsec").alias("ts_sec"), "v_interp")


# --------------------------------------------------------------------------
# Product analytics: ordered funnel conversion + weekly cohort retention
# --------------------------------------------------------------------------
_EPOCH_2024 = 1704067200  # epoch seconds of 2024-01-01 UTC (data start)


@register(
    "funnel_conversion_report",
    """
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
    ),
    v AS (SELECT user_id, min(es) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(es) AS t_click
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE event_type = 'click' AND es > t_view GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(es) AS t_purchase
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE event_type = 'purchase' AND es > t_click GROUP BY e.user_id),
    counts AS (
      SELECT 1 AS step_no, '1_view' AS step, count(*) AS n_users FROM v
      UNION ALL SELECT 2, '2_click', count(*) FROM c
      UNION ALL SELECT 3, '3_purchase', count(*) FROM p
    )
    SELECT step_no, step, n_users,
           round(n_users * 1.0 /
                 NULLIF((SELECT max(n_users) FROM counts WHERE step_no = 1), 0), 4)
             AS conv_from_view
    FROM counts
    """,
)
def funnel_conversion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each step counts users
    whose FIRST qualifying event strictly follows their previous step's
    first event (min-timestamp chaining — the standard sequenced-funnel
    semantics, not mere per-type presence).

    Scale: ONE shuffle total. The three step timestamps are cascading
    window minima over the SAME ``partitionBy(user_id)`` spec —
    ``t_click = min(click es where es > t_view) over w`` can reference
    the previous window column, and Spark chains the Window operators
    over one Exchange (consecutive windows + the following
    groupBy(user_id) all reuse the partitioning); the per-user frame
    then collapses to three counts in a global agg whose input is one
    row per user. (A first cut joined three per-step aggregations —
    8 shuffles of the same key; the plan-audit shuffle count flagged
    it.) The final report is 3 rows, reshaped via a literal explode."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("es")
    )
    w = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("es"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("es") > F.col("t_view")),
                F.col("es"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("es") > F.col("t_click")),
                F.col("es"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    totals = per_user.agg(
        F.count("t_view").alias("n1"),
        F.count("t_click").alias("n2"),
        F.count("t_purchase").alias("n3"),
    )
    steps = F.array(
        F.struct(F.lit(1).alias("step_no"), F.lit("1_view").alias("step"), F.col("n1").alias("n_users")),
        F.struct(F.lit(2).alias("step_no"), F.lit("2_click").alias("step"), F.col("n2").alias("n_users")),
        F.struct(F.lit(3).alias("step_no"), F.lit("3_purchase").alias("step"), F.col("n3").alias("n_users")),
    )
    return totals.select(F.explode(steps).alias("s"), "n1").select(
        F.col("s.step_no").alias("step_no"),
        F.col("s.step").alias("step"),
        F.col("s.n_users").alias("n_users"),
        # NULL (not an engine-specific x/0 artifact) on an empty funnel:
        # the oracle SQL mirrors this with NULLIF(denominator, 0).
        F.when(
            F.col("n1") > 0, F.round(F.col("s.n_users") / F.col("n1"), 4)
        ).alias("conv_from_view"),
    )


@register(
    "weekly_cohort_retention",
    f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor((floor(epoch(ts)) - {_EPOCH_2024}) / 604800) AS BIGINT) AS wk
      FROM events
    ),
    firstwk AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
    SELECT cohort_wk, wk - cohort_wk AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM e JOIN firstwk ON e.user_id = firstwk.user_id
    GROUP BY cohort_wk, week_offset
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week
    (epoch-week arithmetic, no calendar/timezone hazards), counted
    distinct in each subsequent week offset — the standard
    product-retention report.

    Scale: the cohort week is a window min over ONE
    partitionBy(user_id) exchange (no separate first-touch agg joined
    back — the join was a second shuffle of the same key), then a
    distinct-count whose key space is (weeks × offsets) — tiny. The
    distinct dedup happens map-side per (cohort, offset, user) before
    the final count shuffle."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor((F.unix_timestamp("ts") - _EPOCH_2024) / 604800)
        .cast("bigint")
        .alias("wk"),
    )
    e2 = e.withColumn("cohort_wk", F.min("wk").over(Window.partitionBy("user_id")))
    return (
        e2.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "value_winsorized_stats",
    """
    WITH live AS (
      -- NULL contract: a row with NULL group key or NULL metric
      -- carries no winsorizable signal (NULL type would silently form
      -- its own Spark group while the USING join drops it here)
      SELECT event_type, value FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ),
    b AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS lo,
             quantile_cont(value, 0.99) AS hi
      FROM live GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           count(*) FILTER (WHERE value < lo) AS n_clipped_low,
           count(*) FILTER (WHERE value > hi) AS n_clipped_high,
           round(avg(value), 4) AS mean_raw,
           round(avg(CASE WHEN value < lo THEN lo
                          WHEN value > hi THEN hi
                          ELSE value END), 4) AS mean_winsorized
    FROM live e JOIN b USING (event_type)
    GROUP BY e.event_type
    """,
)
def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust repair for heavy-tailed metric columns: per-type p01/p99
    winsorization (``operators.cleaning.winsorize``) with before/after
    means and clip counts — the clamping complement to the z-score
    outlier DETECTOR (``value_outliers``): detection tells you what is
    extreme, winsorization caps its mass so a few spikes cannot own a
    mean, while every row survives for downstream counts.

    Scale: cuts are one groupBy to |event types| rows, then broadcast
    back over the corpus for a narrow clamp + one aggregation — two
    corpus passes, no corpus shuffle."""
    from ..operators.cleaning import winsorize

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
    )
    w = winsorize(ev, "event_type", "value", lo=0.01, hi=0.99)
    return w.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < F.col("__lo")).cast("long")).alias("n_clipped_low"),
        F.sum((F.col("value") > F.col("__hi")).cast("long")).alias("n_clipped_high"),
        F.round(F.avg("value"), 4).alias("mean_raw"),
        F.round(F.avg("value_wins"), 4).alias("mean_winsorized"),
    )


# --------------------------------------------------------------------------
# Trailing-window feature backfill (X130): 7-day rolling user features
# --------------------------------------------------------------------------
@register(
    "rolling_user_features",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n_events,
             sum(CAST(value AS DECIMAL(12,2))) AS v
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT user_id, d, n_events, v,
             date_diff('day', DATE '1970-01-01', d) AS di
      FROM daily
    )
    SELECT user_id, CAST(d AS VARCHAR) AS day, n_events,
           CAST(sum(n_events) OVER win AS BIGINT) AS n_7d,
           round(CAST(sum(v) OVER win AS DOUBLE), 2) AS sum_7d,
           round(CAST(sum(v) OVER win AS DOUBLE) / sum(n_events) OVER win, 6)
             AS avg_7d,
           CAST(di - lag(di) OVER (PARTITION BY user_id ORDER BY di) AS INT)
             AS days_since_prev
    FROM base
    WINDOW win AS (PARTITION BY user_id ORDER BY di
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window feature backfill (X130): for every (user, active
    day), the 7-day trailing event count, value sum and mean, plus the
    recency gap to the user's previous active day — the classic
    point-in-time feature table an ML pipeline materializes so training
    joins see exactly what an online store would have served (no
    look-ahead: the frame ends at CURRENT ROW).

    Scale discipline: the raw stream is first collapsed to a DAILY
    per-user aggregate (one map-side-combined shuffle, report
    cardinality |users|×|days|); the RANGE window then slides over the
    compact daily series, never over raw events — at 100 TB the window
    state per user is days, not events. Value sums ride DECIMAL(12,2)
    through the window (exact, order-independent) and convert to
    double only at the projection, so engine summation order cannot
    move a bit; day ids are integer datediffs, so the 7-day RANGE
    frame has no timestamp/timezone edge.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("v"),
    )
    base = daily.withColumn(
        "di", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    )
    win = Window.partitionBy("user_id").orderBy("di").rangeBetween(-6, 0)
    seq = Window.partitionBy("user_id").orderBy("di")
    return base.select(
        "user_id",
        F.col("d").cast("string").alias("day"),
        "n_events",
        F.sum("n_events").over(win).alias("n_7d"),
        F.round(F.sum("v").over(win).cast("double"), 2).alias("sum_7d"),
        F.round(
            F.sum("v").over(win).cast("double") / F.sum("n_events").over(win), 6
        ).alias("avg_7d"),
        (F.col("di") - F.lag("di").over(seq)).cast("int").alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# CUSUM level-shift detection over the daily revenue series (X136)
# --------------------------------------------------------------------------
@register(
    "revenue_cusum_shift",
    """
    WITH daily AS (
      -- NULL contract: an order with no date sits nowhere on the time
      -- axis (Spark sorts NULL first, DuckDB last — the cumulative
      -- chain would diverge on a single malformed row)
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS x
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    c AS (
      SELECT d, x,
             sum(x) OVER (ORDER BY d)            AS cx,
             row_number() OVER (ORDER BY d)      AS t,
             sum(x) OVER ()                      AS sx,
             count(*) OVER ()                    AS n
      FROM daily
    ),
    s AS (
      SELECT d, x, n,
             n * cx - t * sx AS tt
      FROM c
    )
    SELECT CAST(d AS VARCHAR) AS day,
           round(CAST(x AS DOUBLE), 2)       AS daily_revenue,
           round(CAST(tt AS DOUBLE) / n, 4)  AS cusum,
           CAST(row_number() OVER (
             ORDER BY abs(tt) DESC, d) AS INT) AS shift_rank
    FROM s
    ORDER BY abs(tt) DESC, d
    LIMIT 5
    """,
)
def revenue_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection (X136): the five days where the
    cumulative sum of mean-deviations of daily revenue peaks in
    magnitude — the standard changepoint ESTIMATE (argmax |S_t| of the
    CUSUM statistic) that flags "the level moved around here" in a
    metric series, long before a per-day threshold alarm would.

    Exactness discipline: the float-free CUSUM identity. Instead of
    cumulating double deviations (whose summation-tree shape differs
    between engines), the statistic is computed as
    ``T_t = n·C_t − t·Σx`` — cumulative decimal sum C_t, integer day
    rank t, exact decimal total Σx — which equals ``n·S_t`` exactly.
    Every comparison and the top-5 ordering ride the EXACT decimal
    |T_t| (tie-broken by day); doubles appear only in the reported
    ``cusum = T_t / n``, rounded to 4 dp.

    Scale: one map-side-combined daily rollup (|days| rows), then
    windows over the tiny series — the single-partition ordered
    window is a |days|-row barrier, not a corpus sort. The top-5 is a
    bounded heap."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()  # time-axis NULL contract
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(money("o_totalprice")).alias("x")
    )
    seq = Window.orderBy("d")
    allw = Window.partitionBy()
    c = daily.select(
        "d",
        "x",
        F.sum("x").over(seq).alias("cx"),
        F.row_number().over(seq).alias("t"),
        F.sum("x").over(allw).alias("sx"),
        F.count("*").over(allw).alias("n"),
    )
    s = c.select(
        "d", "x", "n", (F.col("n") * F.col("cx") - F.col("t") * F.col("sx")).alias("tt")
    )
    rank_w = Window.orderBy(F.abs(F.col("tt")).desc(), F.col("d").asc())
    return (
        s.orderBy(F.abs(F.col("tt")).desc(), F.col("d").asc())
        .limit(5)
        .select(
            F.col("d").cast("string").alias("day"),
            F.round(F.col("x").cast("double"), 2).alias("daily_revenue"),
            F.round(F.col("tt").cast("double") / F.col("n"), 4).alias("cusum"),
            F.row_number().over(rank_w).cast("int").alias("shift_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast skill score (X153): MASE over daily revenue
# ---------------------------------------------------------------------------
@register(
    "revenue_forecast_mase",
    # Same daily decimal rollup, calendar-true lag joins (DATE + int),
    # exact decimal absolute-error sums, the identical fixed double
    # chain for the two MAEs and their ratio.
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT a.d, a.rev, s.rev AS rev7, n.rev AS rev1
      FROM daily a
      LEFT JOIN daily s ON a.d = s.d + 7
      LEFT JOIN daily n ON a.d = n.d + 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(count(rev7) AS BIGINT) AS n_seasonal,
             CAST(count(rev1) AS BIGINT) AS n_naive,
             sum(abs(rev - rev7)) AS ss,
             sum(abs(rev - rev1)) AS sn
      FROM j
    )
    SELECT n_days, n_seasonal, n_naive,
           CASE WHEN n_seasonal > 0
                THEN round(CAST(ss AS DOUBLE) / n_seasonal, 6) END AS mae_seasonal,
           CASE WHEN n_naive > 0
                THEN round(CAST(sn AS DOUBLE) / n_naive, 6) END AS mae_naive,
           CASE WHEN n_seasonal > 0 AND n_naive > 0 AND sn > 0
                THEN round((CAST(ss AS DOUBLE) / n_seasonal)
                           / (CAST(sn AS DOUBLE) / n_naive), 6) END AS mase
    FROM t
    """,
)
def revenue_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X153: forecast-baseline skill score — the Mean Absolute Scaled
    Error of the SEASONAL-NAIVE forecast (revenue seven calendar days
    ago predicts today) against the one-step naive baseline, the
    standard pre-model sanity check a forecasting pipeline runs before
    trusting anything fancier: MASE < 1 means weekly seasonality
    carries real signal. Lags are CALENDAR-true (a date joins to
    date−7, never to the 7th previous observed row — gap days don't
    smear errors); absolute errors sum as exact DECIMAL (no float
    summation tree), and the two MAEs and their ratio are the same
    fixed double chain on both engines, rounded 6 dp, NULL-guarded on
    empty lag sets and a zero naive denominator.

    Scale: one map-side-combined groupBy to |days| rows; the lag joins
    and the final aggregate run over that report-sized series."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(money("o_totalprice")).alias("rev"))
    s7 = daily.select(F.date_add("d", 7).alias("d"), F.col("rev").alias("rev7"))
    n1 = daily.select(F.date_add("d", 1).alias("d"), F.col("rev").alias("rev1"))
    j = daily.join(s7, "d", "left").join(n1, "d", "left")
    t = j.agg(
        F.count("*").alias("n_days"),
        F.count("rev7").alias("n_seasonal"),
        F.count("rev1").alias("n_naive"),
        F.sum(F.abs(F.col("rev") - F.col("rev7"))).alias("ss"),
        F.sum(F.abs(F.col("rev") - F.col("rev1"))).alias("sn"),
    )
    ns, nn = F.col("n_seasonal"), F.col("n_naive")
    mae_s = F.round(F.col("ss").cast("double") / ns, 6)
    mae_n = F.round(F.col("sn").cast("double") / nn, 6)
    mase = F.round(
        (F.col("ss").cast("double") / ns) / (F.col("sn").cast("double") / nn), 6
    )
    return t.select(
        "n_days",
        "n_seasonal",
        "n_naive",
        F.when(ns > 0, mae_s).alias("mae_seasonal"),
        F.when(nn > 0, mae_n).alias("mae_naive"),
        F.when((ns > 0) & (nn > 0) & (F.col("sn") > 0), mase).alias("mase"),
    )


@register(
    "user_survival_km",
    # Same per-duration aggregate, descending risk sets from one
    # cumulative window, 6-dp-rounded ln factors summed as DECIMAL
    # (deterministic cumulative order), one exp at the end.
    """
    WITH ue AS (
      -- time-axis NULL contract: a user whose every event is
      -- timestamp-less has no duration and no censoring status
      SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    se AS (SELECT max(ts) AS study_end FROM events WHERE ts IS NOT NULL),
    u AS (
      SELECT datediff('day', first_ts, last_ts) AS t,
             CASE WHEN datediff('day', last_ts, study_end) > 14
                  THEN 1 ELSE 0 END AS ev
      FROM ue CROSS JOIN se
    ),
    g AS (
      SELECT t, CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) - sum(ev) AS BIGINT) AS c
      FROM u GROUP BY 1
    ),
    w AS (
      SELECT t, d, c,
             CAST(sum(d + c) OVER () AS BIGINT)
               - CAST(sum(d + c) OVER (ORDER BY t
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT)
               + (d + c) AS n_risk
      FROM g
    ),
    f AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d = 0 THEN CAST(0 AS DECIMAL(12,6))
                  WHEN d < n_risk
                  THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 6)
                            AS DECIMAL(12,6))
                  ELSE CAST(0 AS DECIMAL(12,6)) END AS lnf,
             CASE WHEN d = n_risk THEN 1 ELSE 0 END AS zf
      FROM w
    ),
    s AS (
      SELECT t, d, c, n_risk,
             sum(lnf) OVER (ORDER BY t
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
             max(zf) OVER (ORDER BY t
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anyzero
      FROM f
    )
    SELECT t AS t_days, n_risk, d AS d_churned, c AS c_censored,
           CASE WHEN anyzero = 1 THEN CAST(0 AS DOUBLE)
                ELSE round(exp(CAST(cl AS DOUBLE)), 6) END AS survival
    FROM s
    """,
)
def user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X165: Kaplan-Meier survival curve over user activity — the
    time-to-churn estimator with CENSORING done right (users still
    active at the study end are censored, not counted as churned —
    the mistake naive retention math makes). Duration = days between a
    user's first and last event; churn = last event more than 14 days
    before the study end; S(t) = Π_{s ≤ t} (1 − d_s/n_s) over the
    per-duration aggregate.

    Float discipline: each factor enters as round(ln((n−d)/n), 6) in
    DECIMAL(12,6) and the product is an EXACT decimal cumulative sum
    in log space (a deterministic RANGE window over the bounded
    distinct-duration aggregate — a direct running double product
    would be order-fragile); one exp + round at the end. A duration
    where the whole risk set churns (d = n) pins survival to exactly
    0.0 from that point via an explicit flag — never exp(−∞).

    Scale: one corpus groupBy per user, one groupBy per distinct
    duration (bounded by the calendar), cumulative windows over that
    aggregate only; the study-end scalar rides a lazy broadcast."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # time-axis NULL contract (see module doc)
    )
    ue = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    se = F.broadcast(ev.agg(F.max("ts").alias("study_end")))
    u = ue.crossJoin(se).select(
        F.datediff("last_ts", "first_ts").alias("t"),
        F.when(F.datediff("study_end", "last_ts") > 14, 1)
        .otherwise(0)
        .alias("ev"),
    )
    g = u.groupBy("t").agg(
        F.sum("ev").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c"),
    )
    w_cum = Window.orderBy("t").rangeBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    tot = F.col("d") + F.col("c")
    w = g.select(
        "t",
        "d",
        "c",
        (
            F.sum(tot).over(w_all) - F.sum(tot).over(w_cum) + tot
        ).alias("n_risk"),
    )
    zero6 = F.lit(0).cast("decimal(12,6)")
    lnf = (
        F.when(F.col("d") == 0, zero6)
        .when(
            F.col("d") < F.col("n_risk"),
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk")
                ),
                6,
            ).cast("decimal(12,6)"),
        )
        .otherwise(zero6)
    )
    zf = F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    f = w.select("t", "d", "c", "n_risk", lnf.alias("lnf"), zf.alias("zf"))
    s = f.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.sum("lnf").over(w_cum).alias("cl"),
        F.max("zf").over(w_cum).alias("anyzero"),
    )
    survival = F.when(F.col("anyzero") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("cl").cast("double")), 6)
    )
    return s.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_churned"),
        F.col("c").alias("c_censored"),
        survival.alias("survival"),
    )


# ---------------------------------------------------------------------------
# Weekly seasonal decomposition of daily revenue (X182)
# ---------------------------------------------------------------------------
@register(
    "seasonal_decompose_report",
    """
    WITH daily AS (
      -- time-axis NULL contract: an undated order sits nowhere on the
      -- series (same guard as revenue_cusum_shift)
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ),
    t AS (
      SELECT d, rev,
             datediff('day', DATE '1970-01-01', d) AS di
      FROM daily
    ),
    w AS (
      SELECT d, rev,
             sum(rev)  OVER (ORDER BY di RANGE BETWEEN 3 PRECEDING
                             AND 3 FOLLOWING) AS trend_sum,
             count(*)  OVER (ORDER BY di RANGE BETWEEN 3 PRECEDING
                             AND 3 FOLLOWING) AS trend_n
      FROM t
    ),
    det AS (
      -- float-free detrending: det7 = 7*rev - trend_sum equals
      -- 7*(rev - trend) exactly in DECIMAL; only full, gap-free
      -- centered weeks carry a trend estimate
      SELECT isodow(d) AS dow, rev,
             -- clamp to DECIMAL(18,2) so det7*det7 fits DECIMAL(37,4)
             -- EXACTLY in both engines (unclamped inference overflows
             -- 38 digits and each engine rounds differently)
             CAST(7 * rev - trend_sum AS DECIMAL(18,2)) AS det7
      FROM w WHERE trend_n = 7
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(rev) AS DOUBLE) / count(*), 6) AS avg_revenue,
           round(CAST(sum(det7) AS DOUBLE) / (7 * count(*)), 6) AS seasonal,
           -- widen ONE factor to DECIMAL(19,2): DuckDB's 18-digit
           -- multiply stays in INT64 and overflows; 19+18=37 digits
           -- rides INT128 and stays exact (Spark's (18,2)x(18,2) is
           -- (37,4) — the same exact product). The sum carries ~20
           -- significant digits, and DuckDB's direct DECIMAL→DOUBLE
           -- double-rounds (INT128→double, then /10^4) — one ulp off
           -- Java's correctly-rounded BigDecimal cast — so the cast
           -- routes through VARCHAR (decimal→string is exact, and
           -- string→double correctly rounds ONCE in both engines)
           -- greatest(.,0): cancellation can leave an epsilon-negative
           -- variance when the true residual spread is ~0
           round(sqrt(greatest((CAST(CAST(sum(CAST(det7 AS DECIMAL(19,2))
                                            * det7)
                            AS VARCHAR) AS DOUBLE)
                  - CAST(sum(det7) AS DOUBLE) * CAST(sum(det7) AS DOUBLE)
                    / count(*))
                 / (49.0 * count(*)), 0.0)), 6) AS resid_stddev
    FROM det
    GROUP BY 1
    """,
)
def seasonal_decompose_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X182: classical additive seasonal decomposition of the daily
    revenue series on a weekly period — per ISO day-of-week: the mean
    seasonal component (average deviation from the centered 7-day
    trend) and the within-dow residual STDDEV (the spread of the
    detrended values around their dow mean — exactly the residual
    variance of the trend+seasonal model, since the seasonal component
    IS the dow mean of the detrended series).

    Exactness discipline: the decomposition never divides early.
    ``det7 = 7*rev − Σ₍₋₃..₊₃₎rev`` is exact DECIMAL (equal to 7× the
    detrended value), computed only where the centered window holds a
    FULL gap-free week (count==7 over an integer-day RANGE frame, so
    calendar holes disqualify a day rather than skewing its trend).
    Sums and the variance numerator stay DECIMAL; doubles appear only
    in the final per-dow divisions, rounded 6 dp. Day-of-week parity:
    Spark ``weekday(d)+1`` ≡ DuckDB ``isodow(d)`` (Mon=1..Sun=7).

    Scale: one map-side-combined daily rollup (|days| rows); the
    ordered RANGE window runs over the tiny series, not the fact
    table; output is ≤7 rows. At 100 TB the rollup is the only
    corpus-sized shuffle — identical shape to revenue_cusum_shift."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(money("o_totalprice")).alias("rev")
    )
    t = daily.withColumn(
        "di", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    )
    win = Window.orderBy("di").rangeBetween(-3, 3)
    w = t.select(
        "d",
        "rev",
        F.sum("rev").over(win).alias("trend_sum"),
        F.count("*").over(win).alias("trend_n"),
    )
    det = w.filter(F.col("trend_n") == 7).select(
        (F.expr("weekday(d)") + F.lit(1)).alias("dow"),
        "rev",
        (F.lit(7) * F.col("rev") - F.col("trend_sum"))
        .cast("decimal(18,2)")
        .alias("det7"),
    )
    n = F.count("*")
    sdet = F.sum("det7").cast("double")
    return det.groupBy(F.col("dow").cast("int").alias("dow")).agg(
        n.cast("long").alias("n_days"),
        F.round(F.sum("rev").cast("double") / n, 6).alias("avg_revenue"),
        F.round(sdet / (F.lit(7) * n), 6).alias("seasonal"),
        F.round(
            F.sqrt(
                F.greatest(
                    (
                        # string-routed cast: see the oracle comment —
                        # the 20-digit exact decimal must round ONCE
                        F.sum(F.col("det7") * F.col("det7"))
                        .cast("string")
                        .cast("double")
                        - sdet * sdet / n
                    )
                    / (F.lit(49.0) * n),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("resid_stddev"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall monotone-trend test per nation (X183)
# ---------------------------------------------------------------------------
@register(
    "mann_kendall_trend",
    """
    WITH monthly AS (
      SELECT n.n_name,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
             sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT a.n_name,
             CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM monthly a
      JOIN monthly b ON a.n_name = b.n_name AND a.m < b.m
      GROUP BY 1
    ),
    ties AS (
      SELECT n_name,
             sum(tc * (tc - 1) * (2 * tc + 5)) AS tie_term
      FROM (SELECT n_name, rev, CAST(count(*) AS BIGINT) AS tc
            FROM monthly GROUP BY 1, 2)
      GROUP BY 1
    ),
    nn AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n_months FROM monthly
      GROUP BY 1
    )
    SELECT nn.n_name,
           CAST(nn.n_months AS INT) AS n_months,
           coalesce(s.s_stat, 0) AS s_stat,
           round((nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
                  - ties.tie_term) / 18.0, 4) AS var_s,
           CASE WHEN nn.n_months >= 3
                 AND (nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
                      - ties.tie_term) > 0
                THEN round(
                  (coalesce(s.s_stat, 0)
                   - CASE WHEN coalesce(s.s_stat, 0) > 0 THEN 1
                          WHEN coalesce(s.s_stat, 0) < 0 THEN -1
                          ELSE 0 END)
                  / sqrt((nn.n_months * (nn.n_months - 1)
                          * (2 * nn.n_months + 5) - ties.tie_term) / 18.0),
                  4) END AS z_stat,
           CASE WHEN nn.n_months < 3
                 OR (nn.n_months * (nn.n_months - 1) * (2 * nn.n_months + 5)
                     - ties.tie_term) <= 0 THEN 'insufficient'
                WHEN abs((coalesce(s.s_stat, 0)
                   - CASE WHEN coalesce(s.s_stat, 0) > 0 THEN 1
                          WHEN coalesce(s.s_stat, 0) < 0 THEN -1
                          ELSE 0 END)
                  / sqrt((nn.n_months * (nn.n_months - 1)
                          * (2 * nn.n_months + 5) - ties.tie_term) / 18.0))
                  <= 1.96 THEN 'no trend'
                WHEN coalesce(s.s_stat, 0) > 0 THEN 'increasing'
                ELSE 'decreasing' END AS trend
    FROM nn
    JOIN ties ON ties.n_name = nn.n_name
    LEFT JOIN s ON s.n_name = nn.n_name
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X183: the Mann-Kendall monotone-trend test (Mann 1945 /
    Kendall 1975) on each nation's monthly revenue series —
    S = Σ_{i<j} sign(x_j − x_i), the tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    continuity-corrected normal statistic z = (S∓1)/√Var(S); verdict
    at the two-sided 5% level (|z| > 1.96). The standard
    distribution-free "is this metric drifting?" monitor — no
    linearity or normality assumption, exactly what a per-segment
    revenue/quality drift gate wants (complements revenue_cusum_shift,
    which LOCATES a level shift, and brand_price_theilsen, which fits
    a slope).

    Exactness: sign comparisons on exact DECIMAL monthly sums; S and
    the tie/variance terms are pure integer arithmetic; doubles appear
    only in the final z (÷18, sqrt), rounded 4 dp, and the verdict
    re-derives z from the same integers so no engine compares against
    a differently-rounded intermediate.

    Scale: one map-side-combined nation×month rollup is the only
    corpus-sized shuffle, localCheckpointed so its four consumers
    (sign pairs, ties, n) read the tiny series instead of re-deriving
    the corpus join; the pairwise sign join is within-nation over
    the |months|-row series (n≈24 ⇒ ~276 pairs per nation), bounded by
    |nations|·n² regardless of fact-table size."""
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
        )
        .agg(F.sum(money("o_totalprice")).alias("rev"))
        # four consumers (pairwise a/b, ties, n) would each re-derive
        # the corpus join+rollup — pin the |nations x months|-row
        # series once so the fact table is scanned exactly once
        .localCheckpoint(eager=True)
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.n_name") == F.col("b.n_name"))
            & (F.col("a.m") < F.col("b.m")),
        )
        .groupBy(F.col("a.n_name").alias("n_name"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    tc = F.col("tc")
    ties = (
        monthly.groupBy("n_name", "rev")
        .agg(F.count("*").cast("long").alias("tc"))
        .groupBy("n_name")
        .agg(F.sum(tc * (tc - 1) * (2 * tc + 5)).alias("tie_term"))
    )
    nn = monthly.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_months")
    )
    j = (
        nn.join(ties, "n_name")
        .join(s, "n_name", "left")
        .select(
            "n_name",
            "n_months",
            F.coalesce(F.col("s_stat"), F.lit(0).cast("long")).alias("s0"),
            (
                F.col("n_months")
                * (F.col("n_months") - 1)
                * (2 * F.col("n_months") + 5)
                - F.col("tie_term")
            ).alias("var18"),
        )
    )
    sgn = (
        F.when(F.col("s0") > 0, 1).when(F.col("s0") < 0, -1).otherwise(0)
    )
    z = (F.col("s0") - sgn) / F.sqrt(F.col("var18") / F.lit(18.0))
    ok = (F.col("n_months") >= 3) & (F.col("var18") > 0)
    return j.select(
        "n_name",
        F.col("n_months").cast("int").alias("n_months"),
        F.col("s0").alias("s_stat"),
        F.round(F.col("var18") / F.lit(18.0), 4).alias("var_s"),
        F.when(ok, F.round(z, 4)).alias("z_stat"),
        F.when(~ok, F.lit("insufficient"))
        .when(F.abs(z) <= 1.96, F.lit("no trend"))
        .when(F.col("s0") > 0, F.lit("increasing"))
        .otherwise(F.lit("decreasing"))
        .alias("trend"),
    )
