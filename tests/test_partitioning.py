"""Partition-pruning contract: a filter on the partition column
must become PartitionFilters (plan-time directory elimination),
not a post-scan filter."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_tools_spark.plans import checks
from iceberg_tools_spark.sources.partitioning import read_partitioned, write_partitioned
from iceberg_tools_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_partitioned_scan_prunes(spark, tmp_path):
    path = str(tmp_path / "orders_by_status")
    o = load_table(spark, SF_ORACLE, "orders")
    write_partitioned(o, path, ["o_orderstatus"])

    df = read_partitioned(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = checks.plan_string(df)
    # the status predicate must appear as a PartitionFilter on the
    # scan, and NOT as a pushed data filter / post-scan condition
    assert "PartitionFilters" in plan
    import re

    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in pf

    # row parity with the unpartitioned filter
    expected = o.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected

    # directory-level check: only the F partition is listed in the
    # scan's file index when the filter is applied
    files = [
        r[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("o_orderstatus=F" in f for f in files)
