"""Hash-canonicalization probes (diagnostics, not operators).

Round-1 CORRECTNESS showed ``q1_pricing_summary`` with
``rows_match`` and ``schema_match`` true but ``hash_match`` false,
while the values are bit-identical when compared locally via Arrow.
The driver's value-hash canonicalization is not visible from this
repo, so each probe below emits a SINGLE column of one type from a
tiny table; the per-probe hash_match bits in CORRECTNESS_r{N}.json
then isolate exactly which value type (if any) the driver
canonicalizes differently between the Spark and DuckDB paths.

These are intentionally trivial and clearly named ``probe_*`` —
they are diagnostics for the correctness gate, not claimed operator
coverage, and are excluded from SURVEY.md §2 counts and bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def probe_bigint(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region", ["r_regionkey"])
    return r.select(F.col("r_regionkey").cast("bigint").alias("v")).orderBy("v")


PROBE_BIGINT_SQL = "SELECT CAST(r_regionkey AS BIGINT) AS v FROM region ORDER BY v"


def probe_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region", ["r_name"])
    return r.select(F.col("r_name").alias("v")).orderBy("v")


PROBE_STRING_SQL = "SELECT r_name AS v FROM region ORDER BY v"


def probe_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation", ["n_nationkey"])
    return n.select(
        (F.col("n_nationkey").cast("decimal(12,2)") / F.lit(4).cast("decimal(12,2)"))
        .cast("decimal(18,4)")
        .alias("v")
    ).orderBy("v")


PROBE_DECIMAL_SQL = """
SELECT CAST(CAST(n_nationkey AS DECIMAL(12,2)) / CAST(4 AS DECIMAL(12,2)) AS DECIMAL(18,4)) AS v
FROM nation ORDER BY v
"""


def probe_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one IEEE double division on exact integers: bit-identical in
    # any engine; if THIS hash mismatches, the driver canonicalizes
    # doubles representationally (e.g. repr of numpy scalars)
    n = load_table(spark, sf_dir, "nation", ["n_nationkey"])
    return n.select(
        (F.col("n_nationkey").cast("double") / F.lit(8).cast("double")).alias("v")
    ).orderBy("v")


PROBE_DOUBLE_SQL = "SELECT CAST(n_nationkey AS DOUBLE) / 8 AS v FROM nation ORDER BY v"


def probe_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders", ["o_orderdate"])
    return (
        o.select(F.col("o_orderdate").cast("date").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("v")
        .limit(30)
        .select("v")
    )


PROBE_DATE_SQL = """
SELECT v FROM (
  SELECT CAST(o_orderdate AS DATE) AS v, COUNT(*) AS n FROM orders GROUP BY v ORDER BY v LIMIT 30
) t
"""


def probe_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events", ["ts", "event_type"])
    return (
        e.groupBy("event_type")
        .agg(F.min("ts").alias("v"))
        .select("v")
        .orderBy("v")
    )


PROBE_TIMESTAMP_SQL = """
SELECT v FROM (SELECT MIN(ts) AS v FROM events GROUP BY event_type) t ORDER BY v
"""


def probe_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation", ["n_nationkey"])
    return n.select((F.col("n_nationkey") % 2 == 0).alias("v")).orderBy("v")


PROBE_BOOLEAN_SQL = "SELECT n_nationkey % 2 = 0 AS v FROM nation ORDER BY v"
