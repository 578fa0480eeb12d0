"""Named query registry — the driver contract surface.

Each entry maps a query name to ``(spark_fn, oracle_sql)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
DuckDB-runnable ANSI SQL equivalent (or ``None`` for operators that are
not SQL-expressible — stateful streaming, Pandas-UDF media decode —
which get the driver's weaker rows-only check).

Column-name parity rule: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL; DATE columns are cast
to strings on both sides so value hashing is representation-stable;
computed doubles are rounded on both sides so summation order can't
flip low bits.
"""

from __future__ import annotations

from . import core, curation, llm, pipeline, temporal  # noqa: F401  (import populates REGISTRY)
from .registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
