"""Bucketed-table helpers: co-located joins with NO shuffle.

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling
both sides. If both tables are written bucketed (and sorted) by the
join key with the same bucket count, Spark's scan reports a
compatible `HashPartitioning` and the join planner skips both
exchanges entirely — the join runs scan→scan→sort-merge with zero
network movement. That only works through the catalog
(`saveAsTable`; bucket metadata lives in the table definition, plain
`parquet(path)` writes lose it).

`write_bucketed` / `read_bucketed` wrap that contract;
`tests/test_sampling_skew.py::test_bucketed_join_has_no_shuffle`
proves the exchange-free plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a catalog table bucketed (and sorted, for
    merge-join-ready runs) by `bucket_cols`."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
