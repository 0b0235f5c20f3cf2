"""Bucketized point-in-interval join: exact vs the naive non-equi
join on synthetic data (boundaries, pre-1970 dates, empty overlap),
and the plan contract (hash join, never a nested loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iceberg_tools_spark.operators.rangejoin import point_in_interval_join


def _mk(spark, points, intervals):
    p = spark.createDataFrame([(d,) for d in points], "p date")
    iv = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(intervals)],
        "iv_id long, s date, e date",
    )
    return p, iv


def _pairs(df):
    return sorted((r["iv_id"], r["p"]) for r in df.collect())


def _naive(p, iv):
    return iv.join(p, (F.col("s") <= F.col("p")) & (F.col("p") < F.col("e")))


def test_matches_naive_join_with_boundaries(spark):
    d = dt.date
    points = [d(2020, 1, 1), d(2020, 1, 15), d(2020, 2, 1), d(2020, 3, 10)]
    intervals = [
        (d(2020, 1, 1), d(2020, 1, 15)),   # start inclusive, end exclusive
        (d(2020, 1, 10), d(2020, 2, 2)),   # spans a bucket boundary
        (d(2020, 2, 1), d(2020, 2, 1)),    # empty interval: matches nothing
        (d(2019, 12, 20), d(2020, 1, 2)),  # covers only the first point
    ]
    p, iv = _mk(spark, points, intervals)
    got = _pairs(point_in_interval_join(p, iv, "p", "s", "e", max_interval_days=31))
    want = _pairs(_naive(p, iv))
    assert got == want
    # boundary semantics pinned explicitly, not just vs the naive join
    assert (0, d(2020, 1, 1)) in got and (0, d(2020, 1, 15)) not in got


def test_pre_epoch_dates(spark):
    d = dt.date
    points = [d(1969, 12, 31), d(1970, 1, 1), d(1969, 11, 1)]
    intervals = [(d(1969, 12, 25), d(1970, 1, 5)), (d(1969, 10, 20), d(1969, 11, 2))]
    p, iv = _mk(spark, points, intervals)
    got = _pairs(point_in_interval_join(p, iv, "p", "s", "e", max_interval_days=15))
    assert got == _pairs(_naive(p, iv))
    assert (0, d(1969, 12, 31)) in got and (1, d(1969, 11, 1)) in got


def test_plan_is_hash_join_not_nested_loop(spark):
    d = dt.date
    p, iv = _mk(
        spark,
        [d(2021, 5, 1)],
        [(d(2021, 4, 20), d(2021, 5, 3))],
    )
    out = point_in_interval_join(p, iv, "p", "s", "e", max_interval_days=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
