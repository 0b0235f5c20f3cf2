"""TPC-H battery, extension set: Q2/Q8/Q11/Q15/Q16/Q17/Q20/Q21
re-expressed over the driver test tables.

The test schema ships no ``partsupp`` and no commit/receipt dates,
so the queries that depend on them (Q2, Q11, Q16, Q20, Q21) are
adapted to draw the same relationships from ``lineitem`` — the
supplier↔part association IS the set of lines a supplier shipped
for a part. Join shapes, aggregation patterns, and output
disciplines mirror the originals.

Determinism rules are the same as operators/tpch.py: exact DECIMAL
sums, ratios as ONE IEEE double op on exact inputs then cast to
DECIMAL(38,6), dates as DATE, every output aliased identically in
the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .tpch import D38_6, _dec, _disc_price, _DISC_PRICE_SQL, _ts


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adapted (no partsupp): for LARGE parts of size ≥ 45, the
    EUROPE supplier with the lowest observed unit price
    (min l_extendedprice / l_quantity over that supplier's lines).

    Scale: part filter broadcast into the lineitem scan side;
    supplier⋈nation⋈region broadcast; one shuffle on (part,
    supplier) for the min, one window per part for the argmin.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_type", "p_size"]).filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 45)
    )
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    r = load_table(spark, sf_dir, "region", ["r_regionkey", "r_name"]).filter(
        F.col("r_name") == "EUROPE"
    )
    l = load_table(spark, sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    sn = F.broadcast(
        s.join(F.broadcast(n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
               F.col("s_nationkey") == F.col("n_nationkey"))
    )
    unit = _dec("l_extendedprice").cast("double") / _dec("l_quantity").cast("double")
    per = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(unit).alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "s_suppkey")
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "s_name",
            _dec("s_acctbal").alias("s_acctbal"),
            "n_name",
            # NOT cast(double AS DECIMAL): 2dp/2dp quotients often
            # terminate exactly on a half-ulp at scale 7 (e.g.
            # 3799.41/32 = 118.73156250) and Spark (shortest-string
            # HALF_UP) and DuckDB (binary-value) round those ties
            # differently. floor(x*1e6) is the same IEEE product +
            # floor in both engines — exact BIGINT micros.
            F.floor(F.col("unit_price") * 1e6).cast("bigint").alias("min_unit_price_micros"),
        )
        .orderBy("p_partkey")
    )


Q2_SQL = """
WITH per AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
             / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE)) AS unit_price
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'LARGE' AND p_size >= 45 AND r_name = 'EUROPE'
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name)
SELECT p_partkey, s_name, CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal, n_name,
       CAST(floor(unit_price * 1e6) AS BIGINT) AS min_unit_price_micros
FROM (SELECT per.*, ROW_NUMBER() OVER (PARTITION BY p_partkey
                                       ORDER BY unit_price, s_suppkey) AS rk
      FROM per) t
WHERE rk = 1
ORDER BY p_partkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_2's share of ASIA-customer revenue on PROMO parts,
    per order year (supplier nation = market participant).

    Scale: part/supplier/nation/region broadcast; lineitem⋈orders
    shuffles on orderkey, orders⋈customer on custkey; the share is a
    two-conditional-sum aggregate per year.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_type"]).filter(
        F.col("p_type") == "PROMO"
    )
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    ns = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    nc = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    r = load_table(spark, sf_dir, "region", ["r_regionkey", "r_name"]).filter(
        F.col("r_name") == "ASIA"
    )
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    sup = F.broadcast(
        s.join(F.broadcast(ns), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_asia = c.join(
        F.broadcast(nc.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    rev = _disc_price()
    nat_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(nat_rev).cast("decimal(38,4)").alias("nation_revenue"),
            F.sum(rev).cast("decimal(38,4)").alias("total_revenue"),
            (F.sum(nat_rev).cast("double") / F.sum(rev).cast("double"))
            .cast(D38_6)
            .alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_2' THEN {_DISC_PRICE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS nation_revenue,
       CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS total_revenue,
       CAST(CAST(SUM(CASE WHEN n_name = 'NATION_2' THEN {_DISC_PRICE_SQL}
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS DECIMAL(38,6)) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE p_type = 'PROMO'
  AND c_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'ASIA')
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adapted (no partsupp): parts whose shipped revenue from
    NATION_7 suppliers exceeds 0.1% of that nation's total.

    Scale: the national total is a one-row aggregate broadcast back
    over the per-part sums — no second pass over lineitem.
    """
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"]).filter(
        F.col("n_name") == "NATION_7"
    )
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    sn = F.broadcast(s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")))
    per_part = (
        l.join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("part_value"))
    )
    total = per_part.agg(
        F.sum(F.col("part_value")).cast("decimal(38,4)").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value").cast("double")
            > F.col("total_value").cast("double") * 0.001
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "part_value",
            (F.col("part_value").cast("double") / F.col("total_value").cast("double"))
            .cast(D38_6)
            .alias("value_share"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey),
total AS (SELECT CAST(SUM(part_value) AS DECIMAL(38,4)) AS total_value FROM per_part)
SELECT l_partkey AS p_partkey, part_value,
       CAST(CAST(part_value AS DOUBLE) / CAST(total_value AS DOUBLE) AS DECIMAL(38,6)) AS value_share
FROM per_part, total
WHERE CAST(part_value AS DOUBLE) > CAST(total_value AS DOUBLE) * 0.001
ORDER BY part_value DESC, p_partkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) with maximum revenue in 1996Q1 (exact
    DECIMAL max — ties all returned, like the spec's view form).

    Scale: one shuffle for the per-supplier sum; the max is a
    one-row broadcast joined back (no window over all suppliers).
    """
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_name"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    rev = (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"),
            "s_name",
            "total_revenue",
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted (no partsupp): distinct suppliers observed
    shipping each (brand, type, size) combination, excluding
    Brand#5 and restricted to 5 sizes; descending variety.

    Scale: the distinct is pushed into the aggregate
    (countDistinct on the shuffled key) — one exchange on the
    3-column group key after the broadcast part join.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]).filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 9, 19, 29, 49)
    )
    l = load_table(spark, sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 19, 29, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost to small-quantity (< 20% of part average)
    orders of Brand#3 parts, expressed as avg yearly revenue.

    Scale: the per-part average is a second aggregate over the SAME
    filtered join output (self-joined back on partkey, broadcast —
    part count after the brand filter is small), not a re-scan.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_brand"]).filter(
        F.col("p_brand") == "Brand#3"
    )
    l = load_table(spark, sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    lines = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_partkey", _dec("l_quantity").alias("qty"), _dec("l_extendedprice").alias("price")
    )
    avg_q = lines.groupBy("p_partkey").agg(
        (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    ).select(F.col("p_partkey").alias("ap"), "avg_qty")
    small = lines.join(F.broadcast(avg_q), F.col("p_partkey") == F.col("ap")).filter(
        F.col("qty").cast("double") < F.col("avg_qty") * 0.2
    )
    return small.agg(
        F.sum("price").cast("decimal(38,2)").alias("small_qty_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("price").cast("double") / F.lit(7.0)).cast(D38_6).alias("avg_yearly"),
    )


Q17_SQL = """
WITH lines AS (
  SELECT p_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'),
avg_q AS (
  SELECT p_partkey AS ap, CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lines GROUP BY p_partkey)
SELECT CAST(SUM(price) AS DECIMAL(38,2)) AS small_qty_revenue,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(price) AS DOUBLE) / 7.0 AS DECIMAL(38,6)) AS avg_yearly
FROM lines JOIN avg_q ON p_partkey = ap
WHERE CAST(qty AS DOUBLE) < avg_qty * 0.2
"""


def q20_promo_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adapted (no partsupp): NATION_3 suppliers who shipped
    more than 100 units of PROMO parts during 1996 — candidates for
    a promotion audit.

    Scale: part filter broadcast; per-supplier sum is one shuffle;
    supplier⋈nation broadcast at the end.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_type"]).filter(
        F.col("p_type") == "PROMO"
    )
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"]).filter(
        F.col("n_name") == "NATION_3"
    )
    l = load_table(
        spark, sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    )
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("promo_qty"))
        .filter(F.col("promo_qty").cast("double") > 100.0)
    )
    sn = F.broadcast(s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")))
    return (
        shipped.join(sn, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "promo_qty")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, promo_qty
FROM (
  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS promo_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey) t
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3' AND CAST(promo_qty AS DOUBLE) > 100.0
ORDER BY s_name
"""


def q21_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted (no commit/receipt dates): suppliers who were the
    ONLY supplier with returned lines (l_returnflag = 'R') on a
    failed order (o_orderstatus = 'F') — per-supplier count of such
    orders, top 20.

    Scale: returned lines per failed order are aggregated once on
    orderkey (count distinct suppliers + min supplier); the sole-
    fault filter is a HAVING on that aggregate — the exists/
    not-exists pair of the original collapses into one shuffle.
    """
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_name"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).filter(
        F.col("o_orderstatus") == "F"
    )
    l = load_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"]).filter(
        F.col("l_returnflag") == "R"
    )
    sole = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.min("l_suppkey").alias("the_supp"),
        )
        .filter(F.col("n_supp") == 1)
    )
    return (
        sole.groupBy("the_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("the_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH sole AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp, MIN(l_suppkey) AS the_supp
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) = 1)
SELECT s_suppkey, s_name, numwait
FROM (SELECT the_supp, COUNT(*) AS numwait FROM sole GROUP BY the_supp) t
JOIN supplier ON the_supp = s_suppkey
ORDER BY numwait DESC, s_name
LIMIT 20
"""
