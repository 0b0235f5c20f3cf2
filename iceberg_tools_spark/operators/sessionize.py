"""Generic gap-based sessionizer.

lag → new-session flag → running sum, all inside one window
partition per entity: ONE shuffle on the entity keys, then
in-partition streaming evaluation. The classic scalable plan — no
joins, no state beyond the sort buffer, unchanged at 1000 executors.

``assign_sessions`` labels every row; ``sessionize`` aggregates to
one row per session. The registered ``sessionize_events`` operator
(operators/events.py) is this shape specialized to the events table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap: str = "30 MINUTES",
    session_col: str = "session_idx",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Adds ``session_col``: a 1-based per-entity session index.

    A row starts a new session when it is the entity's first row or
    arrives more than ``gap`` (SQL INTERVAL string) after the
    previous row's ``ts``.
    """
    order = [F.col(ts)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    lag_ts = F.lag(ts).over(w)
    is_new: Column = F.when(
        lag_ts.isNull() | (F.col(ts) > lag_ts + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running).cast("bigint"))


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap: str = "30 MINUTES",
    aggs: dict[str, Column] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per (entity, session): start/end/n_events plus any
    caller-supplied aggregate columns (name → Column)."""
    labeled = assign_sessions(df, keys, ts, gap, tiebreak=tiebreak)
    base = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    extra = [c.alias(n) for n, c in (aggs or {}).items()]
    return labeled.groupBy(*keys, "session_idx").agg(*base, *extra)
