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


@given(
    vals=st.sets(st.integers(min_value=-(2**62), max_value=2**62), max_size=300),
    lg_k=st.integers(min_value=4, max_value=12),
)
@settings(max_examples=150, deadline=None)
def test_theta_serialize_roundtrip_property(vals, lg_k):
    """Any hash set round-trips the serial-version-3 bytes exactly;
    estimate is exact (== |set|) whenever the set fits k."""
    from iceberg_tools_spark.iceberg.theta import (
        build_compact_theta,
        deserialize_compact_theta,
        serialize_compact_theta,
        theta_estimate,
        theta_hash,
    )

    hashes = [theta_hash(v) for v in vals]
    sk = build_compact_theta(hashes, lg_k=lg_k)
    back = deserialize_compact_theta(serialize_compact_theta(sk))
    assert back["hashes"] == sk["hashes"] and back["theta"] == sk["theta"]
    if len(vals) <= (1 << lg_k):
        assert round(theta_estimate(sk)) == len(set(hashes))


@given(
    h=st.integers(min_value=1, max_value=6).map(lambda x: x * 8),
    w=st.integers(min_value=1, max_value=6).map(lambda x: x * 8),
    seed=st.integers(min_value=0, max_value=2**31),
    gray=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_property(h, w, seed, gray):
    """Smooth images survive encode→decode within a lossy bound at
    q=95, for arbitrary 8-aligned shapes, color and grayscale."""
    import numpy as np

    from iceberg_tools_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (1 + h // 8, 1 + w // 8, 3)).astype(np.float64)
    # bilinear-ish upsample → smooth (JPEG-friendly) content
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1)))[:h, :w], 0, 255
    ).astype(np.uint8)
    if gray:
        img = img[..., 0]
    out = decode_jpeg(encode_jpeg(img, quality=95))
    ref = img if not gray else np.stack([img] * 3, axis=-1)
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 6


@given(
    a=st.sets(st.integers(min_value=0, max_value=10**6), max_size=200),
    b=st.sets(st.integers(min_value=0, max_value=10**6), max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_theta_merge_is_set_union_in_exact_mode(a, b):
    from iceberg_tools_spark.iceberg.theta import (
        build_compact_theta,
        merge_compact_theta,
        theta_hash,
    )

    sa = build_compact_theta(theta_hash(v) for v in a)
    sb = build_compact_theta(theta_hash(v) for v in b)
    m = merge_compact_theta([sa, sb])
    u = build_compact_theta(theta_hash(v) for v in a | b)
    assert m == u


@given(days=st.integers(min_value=-100_000, max_value=100_000))
def test_partition_date_serialization_roundtrip(days):
    """The Iceberg→Delta writer's spec serialization and the
    Delta→Iceberg reader's raw conversion are exact inverses for
    DATE identity partitions (r14: both directions ship this pair,
    so a table replicated out and back must keep its raw values)."""
    from iceberg_tools_spark.sources.migrate import _iceberg_pv

    iso = (dt.date(1970, 1, 1) + dt.timedelta(days=days)).isoformat()
    assert _iceberg_pv(iso, "date") == days


@given(micros=st.integers(min_value=0, max_value=4_102_444_800_000_000))
def test_partition_timestamp_serialization_roundtrip(micros):
    """Same inverse law for TIMESTAMP partitions (micros since
    epoch ↔ the spec's '%Y-%m-%d %H:%M:%S[.ffffff]' string)."""
    from iceberg_tools_spark.sources.migrate import _iceberg_pv

    d = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
    base = d.strftime("%Y-%m-%d %H:%M:%S")
    s = f"{base}.{d.microsecond:06d}" if d.microsecond else base
    assert _iceberg_pv(s, "timestamptz") == micros
    assert _iceberg_pv(s, "timestamp") == micros


@given(nanos=st.integers(min_value=0, max_value=4_102_444_800_000_000_000))
def test_partition_timestamp_ns_serialization_roundtrip(nanos):
    """v3 nanosecond inverse law: raw long nanos ↔ the spec string
    with up to 9 fractional digits."""
    from iceberg_tools_spark.sources.migrate import _iceberg_pv

    secs, frac = divmod(nanos, 1_000_000_000)
    d = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=secs)
    base = d.strftime("%Y-%m-%d %H:%M:%S")
    s = f"{base}.{frac:09d}" if frac else base
    assert _iceberg_pv(s, "timestamp_ns") == nanos
    assert _iceberg_pv(s, "timestamptz_ns") == nanos
