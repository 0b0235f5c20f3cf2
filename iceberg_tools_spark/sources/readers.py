"""Schema-pinned loaders for the driver test tables.

Every operator reads through :func:`load_table` with an explicit
column list so Catalyst prunes the parquet scan (`ReadSchema` shows
only the referenced columns). At 100 TB a full-width scan of
`lineitem` is the difference between minutes and hours — column
selection is non-negotiable at the source layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read one test table; `columns` prunes the scan.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright; we read it as a raw long
    (``nanosAsLong``) and rebuild a TIMESTAMP_NTZ with pure integer
    arithmetic on an NTZ epoch — session-timezone-independent, and
    microsecond-truncated exactly like DuckDB's nanos→us read.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    if columns:
        df = df.select(*columns)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
