"""Exact decimal aggregation for money columns.

Group sums of 2-decimal money values are summation-order-dependent in
double precision: with enough rows a group's sum lands on a half-cent
boundary and ``round(x, 2)`` flips between engines (observed at sf0.1:
``q3_shipping_priority`` had 6 of 5,277 groups off by 0.01 vs the
DuckDB oracle while green at sf0.01 — the hazard scales with group
size). Casting the 2-decimal inputs to DECIMAL first makes every
product and sum EXACT and order-independent in BOTH Spark and DuckDB,
so the aggregate is one well-defined number; the trailing double cast
+ round is then deterministic.

Where this is NOT needed:
- integer-valued doubles (quantities): double sums are exact below 2^53;
- window running sums: their summation order is pinned by the window
  ORDER BY, so both engines fold in the same order;
- averages of integer-valued columns (exact sum / count);
- computed scores that are not decimal-representable (quality ratios):
  no decimal rescue exists — they rely on rounding margin.

INPUT CONTRACT: ``money()`` assumes its column holds values with at
most 2 decimal digits (true for every driver table; asserted nowhere
per-row — a per-row guard would tax every scan). A >2-decimal input is
silently rounded to cents by the cast, and a cast-time tie (a double
that is exactly N.xx5) would be resolved differently by the two
engines (Spark rounds the shortest decimal representation, DuckDB the
binary value). If a source can violate the contract, either validate
at ingest (one audit pass: ``round(x*100) != x*100`` count, the
column_profile pattern) or — the real 100 TB answer — store money AS
DECIMAL in the warehouse (TPC-H itself declares DECIMAL), which makes
this module's casts no-ops. Decimal hash aggregation stays inside
codegen, and exactness no longer depends on partitioning or AQE plan
choices.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: money columns — fits every TPC-H amount at any SF
MONEY = "decimal(12,2)"
#: rates in [0, 1): discounts, taxes
RATE = "decimal(3,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    """A 2-decimal money column as exact DECIMAL."""
    return _c(col).cast(MONEY)


def one_minus_rate(col: Column | str) -> Column:
    """(1 - rate) as exact DECIMAL — e.g. the discount multiplier."""
    return F.lit("1.00").cast(RATE) - _c(col).cast(RATE)


def one_plus_rate(col: Column | str) -> Column:
    """(1 + rate) as exact DECIMAL — e.g. the tax multiplier."""
    return F.lit("1.00").cast(RATE) + _c(col).cast(RATE)


def money_contract_violation(col: Column | str) -> Column:
    """Ingest-audit predicate for the ``money()`` INPUT CONTRACT: TRUE
    where a double carries MORE than 2 decimal digits (so the
    ``money()`` cast would silently round it, with engine-divergent
    tie behavior on exact ``.xx5``). Exact decimal compare, no double
    ``x*100`` arithmetic: the double is rendered at 8 decimal digits
    and compared against its cents rounding; any sub-cent residue at
    or above 1e-8, including a tie, differs and is flagged. The
    tolerance is explicit contract, not an accident: residues BELOW
    1e-8 (e.g. ``1.000000001``) are rounded away by the
    ``decimal(24,8)`` rendering and pass as clean — at 8 fractional
    digits the 16 integral digits exhaust double precision for
    realistic money magnitudes (≳1e8 cents), and a residue that small
    is representation noise, not a price. NULLs are not violations
    (aggregates skip them).

    Overflow is a violation too: a magnitude beyond DECIMAL(12,2) is
    precisely the class ``money()`` corrupts worst (NULL with ANSI
    off, a runtime error with ANSI on), so the audit uses ``try_cast``
    — which yields NULL instead of throwing in either mode — and flags
    the cast-failure case explicitly rather than letting a NULL
    comparison count the row as clean.

    One narrow scan, no shuffle: ``df.agg(F.sum(pred.cast("long")))``
    is the whole 100 TB audit pass — run it once at ingest per the
    module docstring, not per query."""
    raw = _c(col)
    hi = raw.try_cast("decimal(24,8)")
    as_money = hi.try_cast(MONEY)
    return raw.isNotNull() & (
        hi.isNull() | as_money.isNull() | (hi != as_money)
    )


def money_sum(expr: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as the conventional rounded double.
    The ROUND happens in DECIMAL (ties are real here — e.g. an exact
    group sum of 289679.3450 — and decimal round is HALF_UP away from
    zero in both engines), only then cast to double; rounding after a
    double cast would hand the tie to engine-specific double-round
    behavior (Spark rounds the shortest representation, DuckDB the
    binary value — they disagree on exact .005)."""
    return F.round(F.sum(expr), 2).cast("double").alias(alias)


def money_avg(expr: Column, digits: int, alias: str) -> Column:
    """Average via exact decimal numerator: one well-defined double
    division instead of an order-dependent running double sum. The
    denominator is the NON-NULL count of the expression — avg()
    semantics (sum skips NULLs, so must the divisor). The division
    result is far from representable ties with overwhelming
    probability; the numerator itself is exact."""
    return F.round(F.sum(expr).cast("double") / F.count(expr), digits).alias(alias)


# --- the identical arithmetic as DuckDB SQL text -------------------------
def sql_money(col: str) -> str:
    return f"CAST({col} AS DECIMAL(12,2))"


def sql_one_minus_rate(col: str) -> str:
    return f"(CAST(1.00 AS DECIMAL(3,2)) - CAST({col} AS DECIMAL(3,2)))"


def sql_one_plus_rate(col: str) -> str:
    return f"(CAST(1.00 AS DECIMAL(3,2)) + CAST({col} AS DECIMAL(3,2)))"


def sql_money_sum(expr: str) -> str:
    return f"CAST(round(sum({expr}), 2) AS DOUBLE)"


def sql_money_avg(expr: str, digits: int) -> str:
    # count({expr}) not count(*): sum() skips NULLs, so must the divisor
    return f"round(CAST(sum({expr}) AS DOUBLE) / count({expr}), {digits})"
