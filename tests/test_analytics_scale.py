"""Scale-path variants vs their exact counterparts."""

from __future__ import annotations

from iceberg_tools_spark.operators import analytics

from .conftest import SF_ORACLE


def test_approx_percentiles_close_to_exact(spark):
    exact = {
        r.o_orderpriority: (float(r.p50), float(r.p90), float(r.p99))
        for r in analytics.percentiles_order_value(spark, SF_ORACLE).collect()
    }
    approx = {
        r.o_orderpriority: (float(r.p50), float(r.p90), float(r.p99))
        for r in analytics.approx_percentiles_order_value(spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx)
    for prio, (e50, e90, e99) in exact.items():
        a50, a90, a99 = approx[prio]
        for e, a in ((e50, a50), (e90, a90), (e99, a99)):
            assert abs(a - e) / max(e, 1.0) < 0.02, (prio, e, a)
