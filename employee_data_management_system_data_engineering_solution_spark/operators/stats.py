"""Two-sample inference statistics: Welch's t-test and the
Kolmogorov-Smirnov distance — the A/B-experiment and
distribution-drift significance tests a data platform runs beside the
descriptive reports (PSI in ``operators/quality.py`` measures HOW MUCH
a distribution moved; KS/Welch answer IS THE MOVE REAL).

Float discipline: both tests reduce each sample to EXACT integer
sufficient statistics first — (n, Σx, Σx²) for Welch over an
integer-valued measure, per-value cumulative counts for KS — carried
in DECIMAL(38,0) so 10^11-row groups cannot overflow (DuckDB mirrors
with HUGEINT). Doubles appear only in the final closed forms, as a
fixed-order chain of correctly-rounded IEEE ops that both engines
evaluate identically; outputs round at 6 dp. Significance decisions
compare ROUNDED statistics against pinned critical-value literals
(z₀.₀₂₅ = 1.96, KS c(0.05) = 1.358 — the exact-p-value CDFs are not
SQL-expressible and are deliberately out of scope).

Scale: Welch is one groupBy pass to |report| rows. KS is one groupBy
per distinct quantized value + windows OVER THAT AGGREGATE — callers
quantize the measure (e.g. whole dollars) so the aggregate stays
report-sized; the unpartitioned cumulative window is bounded by that
cardinality, the same contract as the AUC rank windows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def welch_ttest(
    df: DataFrame,
    value: str,
    flag_a: Column,
    by: Sequence[str],
) -> DataFrame:
    """Per-``by``-group Welch unequal-variance t-test comparing
    ``value`` (an INTEGER-VALUED measure; cast enforced) between the
    rows where ``flag_a`` holds (sample A) and the rest (sample B).

    One groupBy pass accumulates (n, Σx, Σx²) per side; variances use
    the exact identity var = (n·Σx² − (Σx)²) / (n·(n−1)) with a
    DECIMAL(38,0) numerator, so only the final divisions, the t ratio,
    and the Welch-Satterthwaite df touch doubles. t/df are NULL when
    either side has < 2 rows or both variances are zero.
    ``significant_95``: |t| (rounded) > 1.96."""
    x = F.col(value).cast("long")
    side = lambda c: F.sum(F.when(flag_a, c).otherwise(F.lit(0)))  # noqa: E731
    other = lambda c: F.sum(F.when(flag_a, F.lit(0)).otherwise(c))  # noqa: E731
    g = df.groupBy(*by).agg(
        side(F.lit(1)).alias("n_a"),
        side(x).alias("s_a"),
        side(x * x).alias("q_a"),
        other(F.lit(1)).alias("n_b"),
        other(x).alias("s_b"),
        other(x * x).alias("q_b"),
    )

    def var(n, s, q):  # exact rational → one double division
        num = n.cast(_D38) * q - s.cast(_D38) * s
        return num.cast("double") / (n.cast(_D38) * (n - 1)).cast("double")

    na, nb = F.col("n_a"), F.col("n_b")
    ma = F.col("s_a").cast("double") / na
    mb = F.col("s_b").cast("double") / nb
    va = var(na, F.col("s_a"), F.col("q_a"))
    vb = var(nb, F.col("s_b"), F.col("q_b"))
    se2 = va / na + vb / nb
    t = F.round((ma - mb) / F.sqrt(se2), 6)
    dfw = F.round(
        (se2 * se2)
        / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)),
        6,
    )
    ok = (na > 1) & (nb > 1)
    return g.select(
        *by,
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.when(ok & (se2 > 0), t).alias("t_stat"),
        F.when(ok & (se2 > 0), dfw).alias("df_welch"),
        F.when(ok & (se2 > 0), F.abs(t) > F.lit(1.96)).alias("significant_95"),
    )


def ks_two_sample(df: DataFrame, value: str, flag_a: Column) -> DataFrame:
    """One-row two-sample Kolmogorov-Smirnov report over the QUANTIZED
    integer column ``value``: D = max |ECDF_A − ECDF_B|, evaluated as
    the exact integer max |cum_a·n_b − cum_b·n_a| over the per-value
    aggregate, divided once at the end. ``drift_05``: rounded D
    exceeds the rounded large-sample critical value
    1.358·√((n_a+n_b)/(n_a·n_b))."""
    g = df.groupBy(value).agg(
        F.sum(F.when(flag_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(flag_a, 0).otherwise(1)).alias("cb"),
    )
    w_cum = Window.orderBy(value).rangeBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    g = g.select(
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_all).alias("n_a"),
        F.sum("cb").over(w_all).alias("n_b"),
    )
    num = F.abs(
        F.col("cum_a").cast(_D38) * F.col("n_b")
        - F.col("cum_b").cast(_D38) * F.col("n_a")
    )
    t = g.agg(
        F.max(num).alias("dnum"),
        F.max("n_a").alias("n_a"),  # window constants — max is exact
        F.max("n_b").alias("n_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    d = F.round(
        F.col("dnum").cast("double") / (na.cast(_D38) * nb).cast("double"), 6
    )
    crit = F.round(
        F.lit(1.358)
        * F.sqrt((na + nb).cast("double") / (na.cast(_D38) * nb).cast("double")),
        6,
    )
    return t.select(
        "n_a", "n_b", d.alias("ks_d"), crit.alias("crit_05"),
        (d > crit).alias("drift_05"),
    )
