"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 (plus the
north-star LLM-pipeline operators); ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible query.

Implementation lives in
``employee_data_management_system_data_engineering_solution_spark/``
(``plans/`` holds the registry; ``operators/``, ``functions/``,
``sources/``, ``streaming/`` hold the engine).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from employee_data_management_system_data_engineering_solution_spark.plans import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys (stateful
    streaming, Pandas-UDF decode) get the weaker rows-only check."""
    return {
        name: spec.oracle_sql
        for name, spec in REGISTRY.items()
        if spec.oracle_sql is not None
    }
