"""Central registry mapping query names → (spark callable, oracle SQL).

``__spark_entry__`` (the driver contract) and the parity tests both
read from here, so a query is declared exactly once. Oracle SQL of
``None`` marks a non-SQL-expressible operator (driver falls back to
a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import probes, tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, sql: str | None) -> None:
    # idempotent: module re-exec (importlib.reload, harness re-import)
    # simply overwrites; a module-level dict is the single source of
    # truth either way
    _REGISTRY[name] = (fn, sql)


# ---------------------------------------------------------- §2.2 TPC-H
register("q1_pricing_summary", tpch.q1_pricing_summary, tpch.Q1_SQL)

# --------------------------------------- hash-canonicalization probes
# (diagnostics for the driver's correctness gate — see probes.py)
register("probe_bigint", probes.probe_bigint, probes.PROBE_BIGINT_SQL)
register("probe_string", probes.probe_string, probes.PROBE_STRING_SQL)
register("probe_decimal", probes.probe_decimal, probes.PROBE_DECIMAL_SQL)
register("probe_double", probes.probe_double, probes.PROBE_DOUBLE_SQL)
register("probe_date", probes.probe_date, probes.PROBE_DATE_SQL)
register("probe_timestamp", probes.probe_timestamp, probes.PROBE_TIMESTAMP_SQL)
register("probe_boolean", probes.probe_boolean, probes.PROBE_BOOLEAN_SQL)


def queries() -> dict[str, QueryFn]:
    return {k: fn for k, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_, sql) in _REGISTRY.items() if sql is not None}
