"""Lakehouse connector gating: typed error without the runtime jars,
real end-to-end read if the jars ever appear (VERDICT r3 #7).

This sandbox ships no Iceberg/Delta jars, so the e2e legs skip
cleanly today; the gating legs assert the typed ConnectorUnavailable
is raised instead of a JVM stack trace.
"""

from __future__ import annotations

import pytest

from iceberg_tools_spark.sources import connectors

ICEBERG_CLS = "org.apache.iceberg.spark.source.IcebergSource"
DELTA_CLS = "org.apache.spark.sql.delta.DeltaLog"


def test_iceberg_gating_or_end_to_end(spark, tmp_path):
    if not connectors._has_class(spark, ICEBERG_CLS):
        with pytest.raises(connectors.ConnectorUnavailable, match="Iceberg runtime jar"):
            connectors.read_iceberg(spark, str(tmp_path / "t"))
        pytest.skip("iceberg runtime jar not on classpath (expected in sandbox)")
    # jars present (real cluster): path-based HadoopTables round-trip
    path = str(tmp_path / "iceberg_t")
    src = spark.range(10).withColumnRenamed("id", "v")
    src.write.format("iceberg").mode("overwrite").save(path)
    got = connectors.read_iceberg(spark, path)
    assert got.count() == 10
    assert {f.name for f in got.schema.fields} == {"v"}


def test_delta_gating_or_end_to_end(spark, tmp_path):
    if not connectors._has_class(spark, DELTA_CLS):
        with pytest.raises(connectors.ConnectorUnavailable, match="Delta runtime jar"):
            connectors.read_delta(spark, str(tmp_path / "t"))
        pytest.skip("delta runtime jar not on classpath (expected in sandbox)")
    path = str(tmp_path / "delta_t")
    src = spark.range(7).withColumnRenamed("id", "v")
    src.write.format("delta").mode("overwrite").save(path)
    got = connectors.read_delta(spark, path)
    assert got.count() == 7
