"""ANALYZE-style column statistics — the table-stats surface real
engines persist (Iceberg keeps NDV sketches in Puffin files; Spark's
``ANALYZE TABLE ... FOR COLUMNS`` computes the same shape) so a
cost-based planner can size joins and pick broadcast sides.

Two paths, one operator:

* the ORACLE-CHECKED gate uses EXACT distinct counts (identical on
  both engines at any SF — it certifies the stats pipeline's
  plumbing and min/max/null logic bit-for-bit);
* the SCALE path is :func:`approx_column_ndv` — HLL++
  (``approx_count_distinct``, JVM-side partial-aggregating sketch,
  the same family as Iceberg's theta sketches). Its error is
  bounded against the exact counts by pytest (a cross-engine hash
  can't check it: every engine's sketch differs by design).

One pass over the table computes every column's stats (a single
wide aggregate — no per-column scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# columns the gate profiles (orders: ids, enums, dates, decimals)
_ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def column_stats(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-form stats table — one row per column: row count, null
    count, EXACT distinct count, and min/max rendered as strings
    (type-erased so heterogeneous columns share one schema). ONE
    aggregate job computes all columns."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stacked = wide.selectExpr(
        "stack({n}, {args}) as (column_name, n_rows, n_nulls, n_distinct, min_value, max_value)".format(
            n=len(columns),
            args=", ".join(
                f"'{c}', __n, __n - {c}__nn, {c}__nd, {c}__mn, {c}__mx"
                for c in columns
            ),
        )
    )
    return stacked.orderBy("column_name")


def approx_column_ndv(df: DataFrame, columns: list[str], rsd: float = 0.05) -> DataFrame:
    """The 100 TB NDV path: HLL++ sketches (one pass, map-side
    partials, fixed memory per column regardless of cardinality)."""
    aggs = [
        F.approx_count_distinct(F.col(c), rsd).alias(c) for c in columns
    ]
    wide = df.agg(*aggs)
    return wide.selectExpr(
        "stack({n}, {args}) as (column_name, approx_ndv)".format(
            n=len(columns),
            args=", ".join(f"'{c}', {c}" for c in columns),
        )
    ).orderBy("column_name")


def column_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: per-column stats of the orders table — the
    ANALYZE output a cost-based planner consumes. Exact distinct
    counts so the DuckDB oracle checks every cell bit-for-bit."""
    o = load_table(spark, sf_dir, "orders", _ORDERS_COLS)
    return column_stats(o, _ORDERS_COLS)


COLUMN_STATS_SQL = """
SELECT column_name, n_rows, n_nulls, n_distinct, min_value, max_value
FROM (
  SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
         COUNT(*) - COUNT(o_orderkey) AS n_nulls,
         COUNT(DISTINCT o_orderkey) AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
  FROM orders
  UNION ALL
  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
         COUNT(DISTINCT o_custkey),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
         COUNT(DISTINCT o_orderstatus),
         CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
         COUNT(DISTINCT o_orderpriority),
         CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
  FROM orders
)
ORDER BY column_name
"""
