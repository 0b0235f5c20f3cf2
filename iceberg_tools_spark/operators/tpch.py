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


# shared building block: discounted line revenue, exact DECIMAL
def _disc_price() -> F.Column:
    return (
        _dec("l_extendedprice") * _dec(F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,4)")


_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4))"
)


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue, top 10.

    Scale: customer⋈orders shuffles on custkey only after the
    segment filter prunes customer; lineitem join shuffles on
    orderkey. The top-10 is a TakeOrdered — no global sort.
    """
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    o = load_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )
    l = load_table(
        spark, sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    cutoff = _ts("1998-07-01 00:00:00")
    return (
        l.filter(F.col("l_shipdate") > cutoff)
        .join(o.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.filter(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderpriority,
       CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: orders with any late-shipped line
    (l_shipdate > o_orderdate + 30 days) in 1997Q3, by priority.

    Spark plan: left-semi join (equi on orderkey + residual range
    predicate) — one shuffle, no duplicate-elimination needed.
    """
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    l = load_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    o = o.filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where customer and supplier share a nation,
    ASIA region, 1996 orders.

    Scale: region/nation/supplier broadcast (provably small);
    customer and the fact tables shuffle on their join keys.
    """
    r = load_table(spark, sf_dir, "region", ["r_regionkey", "r_name"])
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nr = F.broadcast(
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nr, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue — selective scan, no join.

    All three predicates push into the parquet scan.
    """
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (_dec("l_discount").between(F.lit("0.02").cast(D12_2), F.lit("0.04").cast(D12_2)))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN CAST('0.02' AS DECIMAL(12,2)) AND CAST('0.04' AS DECIMAL(12,2))
  AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations, by year."""
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_nationkey"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") <= _ts("1997-12-31 23:59:59"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 23:59:59'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, l_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp in the test schema): profit =
    disc revenue − 0.5·retailprice·qty proxy cost, parts named
    '%red%', by supplier nation × order year. All-exact DECIMAL
    (scales chosen so no lossy rounding occurs anywhere)."""
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    s = load_table(spark, sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    cost = (
        _dec("l_quantity") * _dec("p_retailprice") * F.lit("0.5").cast("decimal(2,1)")
    ).cast("decimal(30,5)")
    amount = (_disc_price().cast("decimal(30,5)") - cost).alias("amount")
    return (
        l.join(F.broadcast(p.filter(F.col("p_name").like("%red%"))), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("decimal(38,5)").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST({_DISC_PRICE_SQL} AS DECIMAL(30,5))
              - CAST(CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST('0.5' AS DECIMAL(2,1)) AS DECIMAL(30,5))) AS DECIMAL(38,5)) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS BIGINT)
ORDER BY nation, o_year DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue, 1997Q4."""
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    n = load_table(spark, sf_dir, "nation", ["n_nationkey", "n_name"])
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= _ts("1997-10-01 00:00:00"))
                & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", _dec("c_acctbal").alias("c_acctbal"), "n_name")
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal, n_name,
       CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)), n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode): ship-latency buckets ×
    priority-class line counts."""
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    l = load_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(lat <= 30, "fast").when(lat <= 90, "medium").otherwise("slow").alias("latency_bucket")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket)
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


Q12_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 'fast'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 'medium'
            ELSE 'slow' END AS latency_bucket,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY latency_bucket
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer
    (zero-order customers included via left join)."""
    c = load_table(spark, sf_dir, "customer", ["c_custkey"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey"])
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship-month.

    Ratio rule: exact DECIMAL sums → two double casts → one double
    division → ×100.0 → DECIMAL(38,6), identical op order both sides.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_type"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit("0").cast("decimal(18,4)"))
    ).cast("decimal(38,4)")
    total = F.sum(_disc_price()).cast("decimal(38,4)")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * (promo.cast("double") / total.cast("double")))
            .cast(D38_6)
            .alias("promo_revenue_pct")
        )
    )


Q14_SQL = f"""
SELECT CAST(100.0 * (CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                        ELSE CAST('0' AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS DOUBLE)
                   / CAST(CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS DOUBLE)) AS DECIMAL(38,6)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order of total quantity > 300."""
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_name"])
    o = load_table(spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    l = load_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(38,2)").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            _dec("o_totalprice").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey) t ON o_orderkey = t.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 300
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs brand/size/quantity bands.

    The disjunction stays a single residual predicate on one
    broadcast-joined scan — no union of three subqueries.
    """
    p = load_table(spark, sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    l = load_table(
        spark, sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    qty = _dec("l_quantity")
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(16, 30) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(31, 50) & qty.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(F.sum(_disc_price()).cast("decimal(38,4)").alias("revenue"))
    )


Q19_SQL = f"""
SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DECIMAL(38,4)) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30 AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50 AND CAST(l_quantity AS DECIMAL(12,2)) BETWEEN 20 AND 30)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: per-segment acctbal above the positive-
    balance average, customers DORMANT since 2000-07-01 (every
    customer in the synthetic data has at least one order, so the
    classic "no orders at all" filter is vacuous — dormancy keeps
    the anti-join semantics meaningful).

    The per-segment threshold is a 5-row aggregate → broadcast back;
    the dormancy test is a left-anti join (one shuffle on custkey).
    """
    c = load_table(spark, sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
    o = load_table(spark, sf_dir, "orders", ["o_custkey", "o_orderdate"]).filter(
        F.col("o_orderdate") >= _ts("2000-07-01 00:00:00")
    )
    avg_bal = (
        c.filter(_dec("c_acctbal") > F.lit("0.00").cast(D12_2))
        .groupBy("c_mktsegment")
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
        )
        .withColumnRenamed("c_mktsegment", "seg")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_mktsegment") == F.col("seg"))
        .filter(_dec("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("decimal(38,2)").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT c_mktsegment AS seg,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer
  WHERE CAST(c_acctbal AS DECIMAL(12,2)) > CAST('0.00' AS DECIMAL(12,2))
  GROUP BY c_mktsegment)
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS totacctbal
FROM customer JOIN avg_bal ON c_mktsegment = seg
WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
