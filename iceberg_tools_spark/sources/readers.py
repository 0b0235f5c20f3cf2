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

    ``events.ts`` has shipped in two physical forms across driver
    testdata generations: parquet TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects outright, so it is read as a raw long
    (``nanosAsLong``) and rebuilt with integer arithmetic on an NTZ
    epoch, microsecond-truncated exactly like DuckDB's nanos→us
    read — and plain TIMESTAMP(MICROS), which Spark reads natively.
    The loader inspects the read dtype and normalizes both to
    TIMESTAMP_NTZ so every downstream operator sees one
    session-timezone-independent type.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif not isinstance(ts_type, T.TimestampNTZType):
            # TIMESTAMP(MICROS) read as session-zoned TIMESTAMP —
            # rebuild NTZ from UTC epoch micros (session-tz-free),
            # matching DuckDB's naive-UTC read of the same file
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    if columns:
        df = df.select(*columns)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
