"""Central registry mapping query names → (spark callable, oracle SQL).

``__spark_entry__`` (the driver contract) and the parity tests both
read from here, so a query is declared exactly once. Oracle SQL of
``None`` marks a non-SQL-expressible operator (driver falls back to
a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, sql: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = (fn, sql)


# ---------------------------------------------------------- §2.2 TPC-H
register("q1_pricing_summary", tpch.q1_pricing_summary, tpch.Q1_SQL)


def queries() -> dict[str, QueryFn]:
    return {k: fn for k, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_, sql) in _REGISTRY.items() if sql is not None}
