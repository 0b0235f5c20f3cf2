"""Partitioned-layout writer + pruning contract.

At 100 TB the cheapest rows are the ones never read: a layout
partitioned by a low-cardinality predicate column (ship date month,
event day) lets Catalyst eliminate whole directories at plan time —
`PartitionFilters` in the scan, zero I/O for pruned partitions.
This is the file-layout analogue of Iceberg's partition pruning
(iceberg/pruning.py does the same over manifest stats).

`write_partitioned` materializes that layout;
`tests/test_partitioning.py` proves a filtered read shows the
pruned plan AND reads only the matching directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
