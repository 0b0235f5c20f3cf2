"""Point-in-interval (range) join — the non-equi join family Spark
has no native operator for, expressed as an EQUI-join Catalyst can
hash/broadcast.

A naive ``points JOIN intervals ON start <= p AND p < end`` plans as
BroadcastNestedLoopJoin: O(|points| x |intervals|) comparisons, the
join that falls over first at 100 TB. The standard scale shape is
bucketization: chop the time axis into fixed-width buckets at least
as wide as the longest interval, tag each point with its bucket, and
explode each interval into the (at most 2) buckets it overlaps. The
join becomes ``ON bucket`` — a plain hash join with shuffle/broadcast
freedom — and the original range predicate re-applied post-join does
the exact refinement. Row expansion is bounded by 2x on the interval
side, independent of data volume.

Reference parity: the reference's query surface is manifest-bound
metadata; this operator extends the engine's relational core (the
asof join's sibling) per the brief's "operators Spark lacks" clause.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _day_bucket(col: Column, width_days: int) -> Column:
    # datediff-from-epoch floor-divided; floor (not cast) so
    # pre-1970 dates bucket correctly
    return F.floor(
        F.datediff(col, F.lit("1970-01-01").cast("date")) / width_days
    ).cast("long")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    max_interval_days: int,
    broadcast_points: bool = True,
) -> DataFrame:
    """Join each interval row to every point with
    ``start <= point < end`` (dates). ``max_interval_days`` must be a
    true upper bound on interval length — it sizes the buckets so an
    interval spans at most 2 of them (asserted at plan level by the
    ``sequence`` length, which errors if the bound is violated by
    more than Spark's sequence cap, and refined exactly either way).

    ``broadcast_points`` hints the usual asymmetry (few audit points
    vs a corpus of intervals); pass ``False`` to let AQE choose when
    both sides are large.
    """
    w = max(1, int(max_interval_days))
    pts = points.withColumn("_b", _day_bucket(F.col(point_col), w))
    if broadcast_points:
        pts = F.broadcast(pts)
    ivs = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _day_bucket(F.col(start_col), w),
                _day_bucket(F.col(end_col), w),
            )
        ),
    )
    return (
        ivs.join(pts, "_b")
        .where(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )


# ------------------------------------------------ driver-gate query


def range_join_transit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-transit inventory per audit month: each lineitem is in
    transit over ``[ship, ship + (3 + l_orderkey % 25) days)`` (the
    synthetic tables carry no receiptdate, so transit time is derived
    deterministically); audit points are the distinct order months.
    Counts and quantity totals per audit point — the classic
    "how many intervals cover each timestamp" rollup, exercised
    through the bucketized equi-join above (intervals <= 28 days →
    28-day buckets → <= 2 buckets per interval)."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.col("l_shipdate").cast("date").alias("ship"),
            F.col("l_quantity").alias("qty"),
            F.col("l_orderkey"),
        )
        .withColumn(
            "receipt",
            F.date_add(F.col("ship"), (F.lit(3) + F.col("l_orderkey") % 25).cast("int")),
        )
    )
    points = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("audit_month"))
        .distinct()
    )
    joined = point_in_interval_join(
        points, li, "audit_month", "ship", "receipt", max_interval_days=28
    )
    return (
        joined.groupBy("audit_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in_transit"),
            F.sum("qty").alias("qty_total"),
        )
        .orderBy("audit_month")
    )


RANGE_JOIN_TRANSIT_SQL = """
SELECT p.audit_month,
       CAST(COUNT(*) AS BIGINT) AS n_in_transit,
       SUM(l.qty) AS qty_total
FROM (SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)) AS audit_month
      FROM orders) p
JOIN (SELECT CAST(l_shipdate AS DATE) AS ship,
             CAST(l_shipdate AS DATE)
               + CAST((3 + l_orderkey % 25) AS INTEGER) * INTERVAL 1 DAY AS receipt,
             l_quantity AS qty
      FROM lineitem) l
  ON l.ship <= p.audit_month AND p.audit_month < l.receipt
GROUP BY p.audit_month
ORDER BY p.audit_month
"""
