"""Local replica of the driver's correctness gate: every registered
query must match its DuckDB oracle bit-exactly — at sf0.01 (the
driver's SF) AND sf0.001 (catches cross-engine rounding ties the
bigger SF can mask; restored per VERDICT r6 #6)."""

from __future__ import annotations

import pytest

from iceberg_tools_spark import registry
from iceberg_tools_spark.parity import compare, duck_connection

from .conftest import SF_ORACLE, SF_SMOKE

CHECKED = sorted(registry.oracle_sql())

_CONS: dict[str, object] = {}


def _con(sf_dir: str):
    if sf_dir not in _CONS:
        _CONS[sf_dir] = duck_connection(sf_dir)
    return _CONS[sf_dir]


@pytest.mark.parametrize(
    "sf_dir", [SF_ORACLE, SF_SMOKE], ids=["sf0.01", "sf0.001"]
)
@pytest.mark.parametrize("name", CHECKED)
def test_parity(spark, name, sf_dir):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    res = compare(name, fn(spark, sf_dir), sql, sf_dir, con=_con(sf_dir))
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_rows(spark):
    # sf0.01 only: selective filters (q7, q11) are legitimately
    # empty at sf0.001
    for name, fn in registry.queries().items():
        assert fn(spark, SF_ORACLE).limit(1).count() == 1, f"{name} returned no rows"
