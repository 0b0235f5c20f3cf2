"""Hash-safety invariants for the driver's value-hash gate.

VERDICT r2 #1: any DECIMAL cell in a checked output is a hash
coin-flip (trailing-zero rendering differs between the driver's two
canonicalization paths). The registry therefore casts final decimal
columns to double on both engines; these tests pin that contract:

* the generated column map is not stale;
* no wrapped oracle SQL produces DECIMAL/HUGEINT columns;
* no wrapped Spark query schema contains DecimalType;
* probe_decimal (raw diagnostic) still emits a real DECIMAL.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from iceberg_tools_spark import registry
from iceberg_tools_spark._hash_safe_cols import DECIMAL_COLS

from .conftest import SF_ORACLE

SQL_BACKED = sorted(registry.oracle_sql())


def test_generated_map_not_stale():
    import sys

    sys.path.insert(0, "scripts")
    from gen_hash_safe_cols import compute_mapping

    assert compute_mapping() == DECIMAL_COLS, (
        "stale _hash_safe_cols.py — rerun scripts/gen_hash_safe_cols.py"
    )


@pytest.mark.parametrize("name", SQL_BACKED)
def test_wrapped_oracle_has_no_decimal(duck: duckdb.DuckDBPyConnection, name):
    sql = registry.oracle_sql()[name]
    desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c, t) for c, t, *_ in desc if t.startswith("DECIMAL") or t == "HUGEINT"]
    if name == "probe_decimal":
        assert bad, "probe_decimal must stay a raw DECIMAL diagnostic"
    else:
        assert not bad, f"{name}: decimal-typed oracle output {bad}"


@pytest.mark.parametrize("name", SQL_BACKED)
def test_wrapped_spark_schema_has_no_decimal(spark, name):
    df = registry.queries()[name](spark, SF_ORACLE)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)]
    if name == "probe_decimal":
        assert bad, "probe_decimal must stay a raw DECIMAL diagnostic"
    else:
        assert not bad, f"{name}: decimal-typed Spark output {bad}"
