"""Window / rollup / pivot / percentile analytics over the test
tables — the generic-analytics half of SURVEY.md §2.2.

Determinism rules are the same as ``tpch.py``: DECIMAL-exact money,
ratios as a single double division cast to DECIMAL(38,6), every
int-producing engine function (row_number, ntile, grouping, year,
rank) cast to BIGINT on both sides, and every window that feeds a
row filter carries a unique-key tiebreak so Spark and DuckDB agree
on ties.

Scale notes: each operator is a single hash-shuffle on its natural
partition key followed by in-partition window evaluation — the same
plan shape survives a 1000-executor scale-up. No collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

D12_2 = "decimal(12,2)"
D38_6 = "decimal(38,6)"


def _dec(col: str | F.Column, typ: str = D12_2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number windowing).

    One shuffle on o_custkey; the rank filter is evaluated
    in-partition, so at scale this is shuffle + streaming window.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    w = Window.partitionBy("o_custkey").orderBy(
        _dec("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            _dec("o_totalprice").alias("o_totalprice"),
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


TOP_K_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC, o_orderkey) AS BIGINT) AS rk
  FROM orders) t
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) order revenue with explicit grouping
    flags (NULL keys coalesced to 'ALL' so both engines emit
    identical group labels)."""
    r = load_table(spark, sf_dir, "region", ["r_regionkey", "r_name"])
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o = load_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("r_name").cast("bigint").alias("g_region"),
            F.grouping("n_name").cast("bigint").alias("g_nation"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
            "g_region",
            "g_nation",
        )
        .orderBy("region", "nation")
    )


ROLLUP_SQL = """
SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(r_name) AS BIGINT) AS g_region,
       CAST(GROUPING(n_name) AS BIGINT) AS g_nation
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, priority rows × status columns (Spark
    ``pivot`` API with a pinned value list — no extra distinct scan)."""
    o = load_table(spark, sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    ).orderBy("o_orderpriority")


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99) of order value per
    priority — percentile_disc semantics spelled out with
    row_number/ceil so both engines follow the identical definition
    (built-in percentile functions interpolate differently)."""
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    v = _dec("o_totalprice")
    w = Window.partitionBy("o_orderpriority").orderBy(v, F.col("o_orderkey"))
    wp = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        v.alias("v"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )

    def pick(p: float, name: str) -> F.Column:
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"), F.col("v"))
        ).alias(name)

    return (
        ranked.groupBy("o_orderpriority")
        .agg(pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"))
        .orderBy("o_orderpriority")
    )


PERCENTILES_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(12,2)) AS v,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM orders)
SELECT o_orderpriority,
       MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN v END) AS p50,
       MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN v END) AS p90,
       MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN v END) AS p99
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def decile_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value deciles: ntile(10) over total spend
    (unique-key tiebreak), then per-decile aggregates.

    The decile assignment is a TWO-PHASE distributed ntile (guide
    §2): range-partition by the window order, rank within each
    partition, add per-partition row-count offsets (a tiny
    #partitions-row frame) to get the global rank, and map it
    through NTILE's fill rule (n÷10 rows per tile, the first n%10
    tiles one extra). (ltv desc, o_custkey) is a total order, so
    this is bit-identical to ``ntile(10)`` over one global window —
    without the single task holding every customer at scale. The
    range-partitioned frame materializes once (``localCheckpoint``):
    the range exchange samples its child and the offsets pass
    re-reads it, three traversals of the aggregation otherwise."""
    o = load_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    ltv = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("ltv")
    )
    ranked = (
        ltv.repartitionByRange(F.col("ltv").desc(), F.col("o_custkey"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    w_in = Window.partitionBy("_pid").orderBy(
        F.col("ltv").desc(), F.col("o_custkey")
    )
    tiled = (
        ranked.join(F.broadcast(offs), "_pid")
        .withColumn("_rk", F.col("_off") + F.row_number().over(w_in))
        # NTILE fill rule, integer-exact: ceil(a/b) = (a + b - 1) div b
        .withColumn(
            "decile",
            F.expr(
                "CAST(IF(_rk <= (_n % 10) * (_n div 10 + 1),"
                " (_rk + _n div 10) div (_n div 10 + 1),"
                " _n % 10 + (_rk - (_n % 10) * (_n div 10 + 1)"
                "            + greatest(_n div 10, 1) - 1)"
                "           div greatest(_n div 10, 1)) AS BIGINT)"
            ),
        )
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("ltv").cast("decimal(38,2)").alias("sum_ltv"),
            (F.sum("ltv").cast("double") / F.count(F.lit(1))).cast(D38_6).alias("avg_ltv"),
        )
        .orderBy("decile")
    )


DECILE_SQL = """
WITH ltv AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS ltv
  FROM orders GROUP BY o_custkey),
tiled AS (
  SELECT o_custkey, ltv, CAST(NTILE(10) OVER (ORDER BY ltv DESC, o_custkey) AS BIGINT) AS decile
  FROM ltv)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(ltv) AS DECIMAL(38,2)) AS sum_ltv,
       CAST(CAST(SUM(ltv) AS DOUBLE) / COUNT(*) AS DECIMAL(38,6)) AS avg_ltv
FROM tiled
GROUP BY decile
ORDER BY decile
"""


def orders_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist of order totals within priority.

    Both functions are pure integer-ratio doubles (identical IEEE
    ops in every engine) cast to DECIMAL(38,6).

    Computed distributedly (guide §2): (priority, price) tie groups
    aggregate first (one row per group, so ties can never straddle a
    partition boundary), a range-partitioned running count plus
    per-(partition, priority) offsets (a tiny frame) yields each
    group's min rank and rows-≤ count, and the per-order rows join
    back on the group key. Replaces the per-priority window — five
    single tasks each holding ~20% of all orders at scale. The
    ratios divide the same integers Spark's PERCENT_RANK/CUME_DIST
    divide ((rank−1)/(n−1), rows≤/n, both as doubles), so the
    DECIMAL(38,6) casts are bit-identical.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    op = o.select(
        "o_orderkey", "o_orderpriority", _dec("o_totalprice").alias("o_totalprice")
    )
    g = op.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    ranked = (
        g.repartitionByRange("o_orderpriority", "o_totalprice")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # consumed by the offsets pass AND the rank pass
    )
    part = ranked.groupBy("_pid", "o_orderpriority").agg(F.sum("_cnt").alias("_s"))
    w_off = (
        Window.partitionBy("o_orderpriority")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = part.select(
        "_pid",
        "o_orderpriority",
        F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_s").over(w_n).alias("_n"),
    )
    w_run = (
        Window.partitionBy("_pid", "o_orderpriority")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    le = F.col("_off") + F.sum("_cnt").over(w_run)  # rows with value <= this
    ranked2 = (
        ranked.join(F.broadcast(offs), ["_pid", "o_orderpriority"])
        .withColumn("_le", le)
        .withColumn("_rank", F.col("_le") - F.col("_cnt") + 1)  # min rank of ties
    )
    pct = F.when(
        F.col("_n") > 1,
        (F.col("_rank") - 1).cast("double") / (F.col("_n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    cume = F.col("_le").cast("double") / F.col("_n").cast("double")
    dist = ranked2.select(
        "o_orderpriority",
        "o_totalprice",
        pct.cast(D38_6).alias("pct_rank"),
        cume.cast(D38_6).alias("cume"),
    )
    return (
        op.join(dist, ["o_orderpriority", "o_totalprice"])
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "pct_rank", "cume")
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    )


CUME_DIST_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
       CAST(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                 ORDER BY CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS pct_rank,
       CAST(CUME_DIST() OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS cume
FROM orders
ORDER BY o_orderpriority, o_totalprice, o_orderkey
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(orderstatus, orderpriority): all four grouping-set
    combinations of order counts/revenue with grouping flags
    (ROLLUP's sibling; NULL keys coalesced to 'ALL').

    Scale: Spark expands the cube map-side (one row per grouping
    set) then runs ONE partial-agg shuffle — same cost class as a
    plain groupBy with 4x the grouping keys.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "revenue",
            "n_orders",
            "g_status",
            "g_priority",
        )
        .orderBy("status", "priority")
    )


CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def approx_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for percentiles_order_value: Spark's
    GK-sketch `percentile_approx` — ONE partial-aggregable pass, no
    per-partition global sort, mergeable across executors.

    rows-only (the sketch is engine-specific); closeness to the
    exact operator is pytest-asserted (tests/test_analytics_scale.py)
    and surfaced through the driver gate by
    ``approx_percentiles_check``.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    v = _dec("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx(v, 0.5, 10000).alias("p50"),
            F.percentile_approx(v, 0.9, 10000).alias("p90"),
            F.percentile_approx(v, 0.99, 10000).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# GK sketch guarantee: rank error ≤ n/accuracy (+1 slack for the
# discrete rank-of-duplicates edge)
_APPROX_ACCURACY = 10000


def approx_percentiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable form of the GK-sketch percentiles (VERDICT r2
    #3): per priority the EXACT p50/p90/p99 (recomputed genuinely by
    the DuckDB oracle) plus booleans asserting each approx value's
    rank sits within the sketch's guaranteed rank-error band
    ``⌈p·n⌉ ± (n/accuracy + 1)``. The sketch values themselves are
    engine-specific and never hashed."""
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    v = _dec("o_totalprice")
    approx = approx_percentiles_order_value(spark, sf_dir).select(
        "o_orderpriority",
        F.col("p50").alias("a50"),
        F.col("p90").alias("a90"),
        F.col("p99").alias("a99"),
    )
    exact = percentiles_order_value(spark, sf_dir)
    ranks = (
        o.join(F.broadcast(approx), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                agg
                for p in (50, 90, 99)
                for agg in (
                    F.sum((v <= F.col(f"a{p}")).cast("bigint")).alias(f"le{p}"),
                    F.sum((v < F.col(f"a{p}")).cast("bigint")).alias(f"lt{p}"),
                )
            ],
        )
    )

    def ok(p: int, frac: float) -> F.Column:
        target = F.ceil(F.lit(frac) * F.col("n"))
        tol = F.col("n") / _APPROX_ACCURACY + 1
        return (
            (F.col(f"le{p}") >= target - tol) & (F.col(f"lt{p}") <= target + tol)
        ).alias(f"p{p}_in_band")

    return (
        exact.join(ranks.select("o_orderpriority", ok(50, 0.5), ok(90, 0.9), ok(99, 0.99)),
                   "o_orderpriority")
        .select("o_orderpriority", "p50", "p90", "p99",
                "p50_in_band", "p90_in_band", "p99_in_band")
        .orderBy("o_orderpriority")
    )


APPROX_CHECK_SQL = f"""
SELECT o_orderpriority, p50, p90, p99,
       TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS p99_in_band
FROM ({PERCENTILES_SQL}) exact
ORDER BY o_orderpriority
"""


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order dates (ROWS frame,
    unique-key ordering) — top-5 customers by lifetime value, their
    order-by-order cumulative spend.

    One shuffle on custkey; the cumulative sum is evaluated
    streaming within the partition.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    v = _dec("o_totalprice")
    ltv = o.groupBy("o_custkey").agg(F.sum(v).cast("decimal(38,2)").alias("ltv"))
    # top-5 selection as orderBy().limit() — a distributed
    # TakeOrderedAndProject (per-partition heaps), not a single-task
    # global row_number window; (ltv desc, custkey) is a total order
    # so the 5 survivors are identical
    top5 = (
        ltv.orderBy(F.col("ltv").desc(), F.col("o_custkey"))
        .limit(5)
        .select("o_custkey")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        o.join(F.broadcast(top5), "o_custkey")
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderkey",
            v.alias("o_totalprice"),
            F.sum(v).over(w).cast("decimal(38,2)").alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


RUNNING_TOTAL_SQL = """
WITH ltv AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS ltv
  FROM orders GROUP BY o_custkey),
top5 AS (
  SELECT o_custkey FROM (
    SELECT o_custkey, ROW_NUMBER() OVER (ORDER BY ltv DESC, o_custkey) AS rk FROM ltv) t
  WHERE rk <= 5)
SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderkey,
       CAST(o.o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
              OVER (PARTITION BY o.o_custkey ORDER BY o.o_orderdate, o.o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS running_total
FROM orders o JOIN top5 USING (o_custkey)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def monthly_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue: per-month totals with lag delta and
    growth ratio (lag window over the 80-row month sequence)."""
    o = load_table(spark, sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    month = F.trunc(F.col("o_orderdate").cast("date"), "MM")
    monthly = (
        o.groupBy(month.alias("month"))
        .agg(F.sum(_dec("o_totalprice")).cast("decimal(38,2)").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.select(
            "month",
            "revenue",
            (F.col("revenue") - F.coalesce(prev, F.col("revenue"))).cast("decimal(38,2)").alias("delta"),
            F.when(prev.isNotNull(),
                   (F.col("revenue").cast("double") / prev.cast("double")).cast(D38_6)
                   ).alias("growth"),
        )
        .orderBy("month")
    )


MONTHLY_DELTA_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS revenue
  FROM orders GROUP BY 1)
SELECT month, revenue,
       CAST(revenue - COALESCE(LAG(revenue) OVER (ORDER BY month), revenue) AS DECIMAL(38,2)) AS delta,
       CASE WHEN LAG(revenue) OVER (ORDER BY month) IS NOT NULL
            THEN CAST(CAST(revenue AS DOUBLE)
                      / CAST(LAG(revenue) OVER (ORDER BY month) AS DOUBLE) AS DECIMAL(38,6))
       END AS growth
FROM monthly
ORDER BY month
"""
