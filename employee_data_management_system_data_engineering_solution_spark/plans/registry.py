from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle_sql: str | None  # None => non-SQL-expressible, rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle_sql: str | None):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle_sql=oracle_sql)
        return fn

    return deco
