"""Local replica of the driver's correctness gate: every registered
query must match its DuckDB oracle bit-exactly at sf0.01."""

from __future__ import annotations

import pytest

from iceberg_tools_spark import registry
from iceberg_tools_spark.parity import compare

from .conftest import SF_ORACLE

CHECKED = sorted(registry.oracle_sql())


@pytest.mark.parametrize("name", CHECKED)
def test_parity(spark, duck, name):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    res = compare(name, fn(spark, SF_ORACLE), sql, SF_ORACLE, con=duck)
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_rows(spark):
    for name, fn in registry.queries().items():
        assert fn(spark, SF_ORACLE).limit(1).count() == 1, f"{name} returned no rows"
