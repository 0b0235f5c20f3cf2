"""TPC-H-derived relational battery over the driver test tables.

Every query here is oracle-checked against DuckDB (see
``__spark_entry__.oracle_sql``), so numeric outputs follow the
determinism rules from SURVEY.md §3:

* money/quantity aggregation is done in exact DECIMAL arithmetic
  (parquet doubles hold 2-dp values; cast at ingestion), with the
  result cast to an explicit DECIMAL(p,s) so Spark and DuckDB agree
  on the output type;
* averages / ratios are one IEEE double op on exact inputs
  (``cast(sum as double) / count``) — bit-identical across engines;
* no order-dependent float accumulation anywhere.

Scale notes: dims (region/nation/supplier/part at test SF) are
broadcast; fact-fact joins shuffle on their keys with AQE skew
handling enabled by the session factory. All scans go through
``load_table`` with explicit column lists for parquet pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

# money columns fit comfortably in DECIMAL(12,2) at the per-value
# level (these are per-row prices/quantities, not sums)
D12_2 = "decimal(12,2)"
# checked-output rule (driver hash determinism): no raw doubles in
# query outputs — ratios/averages are one IEEE double op on exact
# DECIMAL inputs, then cast to a fixed-scale decimal IDENTICALLY in
# the Spark plan and the DuckDB oracle (verified bit-exact both ways)
D38_6 = "decimal(38,6)"


def _dec(col: str | F.Column, typ: str = D12_2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Reference capability parity: aggregate scan with stats — the
    Spark plan pushes the shipdate filter into the parquet scan and
    does partial aggregation map-side (2 grouping cols, 8 aggs).
    """
    l = load_table(
        spark,
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    qty = _dec("l_quantity")
    price = _dec("l_extendedprice")
    one_minus_disc = _dec(F.lit(1.0) - F.col("l_discount"))
    one_plus_tax = _dec(F.lit(1.0) + F.col("l_tax"))
    disc_price = (price * one_minus_disc).cast("decimal(18,4)")
    charge = disc_price * one_plus_tax

    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 23:59:59").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).cast(D38_6).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).cast(D38_6).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).cast(D38_6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,6)) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,6)) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(38,6)) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
