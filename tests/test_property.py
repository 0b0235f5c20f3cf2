"""Property-based tests (hypothesis): the generic library operators
against independent reference implementations — pandas
``merge_asof`` for the as-of join, a plain Python fold for the
sessionizer. Example counts are kept small: every example runs
Spark jobs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_tools_spark.operators.asof import asof_join
from iceberg_tools_spark.operators.sessionize import assign_sessions

BASE = dt.datetime(2024, 1, 1)

_prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, seconds-offset) pairs; few keys → plenty of per-key collisions
_left_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 500)),
    min_size=1,
    max_size=12,
)
_right_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 500)),
    min_size=1,
    max_size=12,
)


@given(left=_left_rows, right=_right_rows, direction=st.sampled_from(["backward", "forward"]))
@_prop_settings
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    # unique right (key, time) — the documented uniqueness contract
    right = sorted({(k, s) for k, s in right})
    left = sorted(left)
    ldf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "lid bigint, k string, t timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), float(s)) for k, s in right],
        "k string, rt timestamp, v double",
    )
    out = asof_join(ldf, rdf, on=["k"], left_time="t", right_time="rt", right_values=["v"],
                    direction=direction)
    got = {r.lid: r.v_asof for r in out.collect()}

    lp = pd.DataFrame(
        {"lid": range(len(left)), "k": [k for k, _ in left],
         "t": [BASE + dt.timedelta(seconds=s) for _, s in left]}
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in right], "rt": [BASE + dt.timedelta(seconds=s) for _, s in right],
         "v": [float(s) for _, s in right]}
    ).sort_values("rt", kind="stable")
    exp_df = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k", direction=direction)
    exp = {int(r.lid): (None if pd.isna(r.v) else float(r.v)) for r in exp_df.itertuples()}
    assert got == exp


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 3000)), min_size=1, max_size=15
    ),
    gap_s=st.sampled_from([60, 300]),
)
@_prop_settings
def test_assign_sessions_matches_python_fold(spark, rows, gap_s):
    # unique (uid, ts) so ordering is total and the fold is exact
    rows = sorted({(u, s) for u, s in rows})
    df = spark.createDataFrame(
        [(u, BASE + dt.timedelta(seconds=s)) for u, s in rows],
        "uid bigint, ts timestamp",
    )
    out = assign_sessions(df, ["uid"], "ts", gap=f"{gap_s} SECONDS")
    got = {(r.uid, r.ts): r.session_idx for r in out.collect()}

    exp: dict = {}
    by_user: dict = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    for u, ss in by_user.items():
        idx = 0
        prev = None
        for s in sorted(ss):
            if prev is None or s - prev > gap_s:
                idx += 1
            exp[(u, BASE + dt.timedelta(seconds=s))] = idx
            prev = s
    assert got == exp


# ---------------------------------------- planner-twin equivalence

_file_sizes = st.lists(st.integers(1, 5000), min_size=1, max_size=14)
_targets = st.integers(100, 6000)


@given(sizes=_file_sizes, target=_targets)
@_prop_settings
def test_plan_manifest_groups_equals_plan_compaction(spark, sizes, target, tmp_path_factory):
    """The pure-Python first-fit (iceberg/rewrite.py) and the Spark
    window-based bin-packer (maintenance.plan_compaction) are twins:
    identical groups for ANY file-size multiset and target."""
    import os

    from iceberg_tools_spark.iceberg.maintenance import plan_compaction
    from iceberg_tools_spark.iceberg.rewrite import plan_manifest_groups

    td = tmp_path_factory.mktemp("plan_prop")
    paths = []
    for i, size in enumerate(sizes):
        p = os.path.join(str(td), f"f{i:03d}.bin")
        with open(p, "wb") as f:
            f.write(b"\0" * size)
        paths.append(p)

    listing = spark.createDataFrame(
        [("", p, os.path.getsize(p)) for p in paths],
        "partition_json string, file_path string, file_size_in_bytes long",
    )
    spark_groups = [
        sorted(r.files)
        for r in plan_compaction(listing, target).orderBy("group_id").collect()
    ]
    local_groups = [sorted(g) for g in plan_manifest_groups(paths, target)]
    assert spark_groups == local_groups


# --------------------------------- decimal serialization round-trip

_decimals = st.decimals(
    min_value="-9999999.99", max_value="9999999.99", places=2, allow_nan=False
)


@given(value=_decimals)
@settings(max_examples=200, deadline=None)
def test_decimal_bytes_roundtrip_and_minimality(value):
    """to_bytes/from_bytes round-trip for decimal(9,2), and the
    byte length is Java-BigInteger-minimal (bitLength//8 + 1) —
    covers the 2^(8k-1) negative boundary (ADVICE r4)."""
    from iceberg_tools_spark.iceberg import conversions as C

    data = C.to_bytes("decimal(9, 2)", value)
    assert C.from_bytes("decimal(9, 2)", data) == value
    unscaled = int(value.scaleb(2))
    bl = unscaled.bit_length() if unscaled >= 0 else (~unscaled).bit_length()
    assert len(data) == bl // 8 + 1
