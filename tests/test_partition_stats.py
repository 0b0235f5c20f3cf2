"""Partition statistics files: compute/write/register/read-back
(`iceberg/partition_stats.py`) over the MoR and DV fixtures."""

from __future__ import annotations

import os

import pytest

from iceberg_tools_spark.iceberg.metadata import parse_metadata
from iceberg_tools_spark.iceberg.partition_stats import (
    compute_partition_stats,
    read_partition_stats,
    write_partition_stats,
)


@pytest.fixture()
def mor_scratch():
    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR

    root = _scratch_table("pstats_test_", MOR_DIR)
    return root, os.path.join(root, "v2.metadata.json")


def test_write_registers_and_reads_back(spark, mor_scratch):
    root, mpath = mor_scratch
    res = write_partition_stats(spark, mpath, 2004, root)
    assert res["n_partitions"] == 4
    meta = parse_metadata(res["metadata_path"])
    (entry,) = meta.raw["partition-statistics"]
    assert entry["snapshot-id"] == 2004
    assert entry["file-size-in-bytes"] == os.path.getsize(res["statistics_path"])
    df = read_partition_stats(spark, res["metadata_path"], 2004, root)
    rows = {
        (r["partition"]["category"], r["partition"]["id_trunc"]): r
        for r in df.collect()
    }
    assert rows[("x", None)]["position_delete_record_count"] == 15
    assert rows[("x", None)]["total_record_count"] == 185
    assert rows[("z", None)]["equality_delete_file_count"] == 1
    assert rows[("w", 300)]["spec_id"] == 1
    assert all(r["total_data_file_size_in_bytes"] > 0 for r in rows.values())


def test_rewrite_same_snapshot_replaces_entry(spark, mor_scratch):
    root, mpath = mor_scratch
    r1 = write_partition_stats(spark, mpath, 2004, root)
    r2 = write_partition_stats(spark, r1["metadata_path"], 2004, root)
    meta = parse_metadata(r2["metadata_path"])
    assert len(meta.raw["partition-statistics"]) == 1  # replaced, not duplicated


def test_multiple_snapshots_coexist(spark, mor_scratch):
    root, mpath = mor_scratch
    r1 = write_partition_stats(spark, mpath, 2002, root)
    r2 = write_partition_stats(spark, r1["metadata_path"], 2004, root)
    meta = parse_metadata(r2["metadata_path"])
    assert [p["snapshot-id"] for p in meta.raw["partition-statistics"]] == [2002, 2004]
    early = read_partition_stats(spark, r2["metadata_path"], 2002, root)
    # at 2002 no delete files exist yet and F is not live
    rows = {r["partition"]["category"]: r for r in early.collect()}
    assert set(rows) == {"x", "y", "z"}
    assert all(r["position_delete_file_count"] == 0 for r in rows.values())


def test_dv_cardinality_counts_without_blob_read(spark):
    # deletion vectors contribute their manifest cardinality to
    # position_delete_record_count — straight from the locator
    from iceberg_tools_spark.iceberg.deletes import DV_DIR, DV_METADATA

    df = compute_partition_stats(spark, DV_METADATA, 3003, DV_DIR)
    rows = {r["partition"]["category"]: r for r in df.collect()}
    assert rows["x"]["position_delete_record_count"] == 15  # DV(A)=10 + DV(C)=5
    assert rows["x"]["position_delete_file_count"] == 2
    assert rows["x"]["total_record_count"] == 185
    assert rows["y"]["position_delete_file_count"] == 0


def test_unregistered_snapshot_raises(spark, mor_scratch):
    root, mpath = mor_scratch
    with pytest.raises(ValueError, match="no partition-statistics"):
        read_partition_stats(spark, mpath, 2004, root)


# --------------------------------------- table statistics (Puffin)


def test_table_stats_write_read_roundtrip(spark, mor_scratch):
    from iceberg_tools_spark.iceberg.table_stats import (
        read_table_stats,
        write_table_stats,
    )

    root, mpath = mor_scratch
    res = write_table_stats(spark, mpath, 2004, root)
    assert res["ndv"] == {"id": 323, "category": 4}  # LIVE rows, deletes applied
    meta = parse_metadata(res["metadata_path"])
    (entry,) = meta.raw["statistics"]
    assert entry["snapshot-id"] == 2004
    assert entry["file-size-in-bytes"] == os.path.getsize(res["statistics_path"])
    assert entry["file-footer-size-in-bytes"] > 8
    df = read_table_stats(spark, res["metadata_path"], 2004, root)
    rows = {r["col_name"]: r for r in df.collect()}
    assert rows["id"]["ndv"] == 323 and rows["id"]["field_id"] == 1
    assert rows["category"]["ndv"] == 4
    assert all(r["payload_agrees"] for r in rows.values())


def test_table_stats_estimation_mode_close_to_exact(spark, mor_scratch):
    # lg_k=6 → k=64 < 323 distinct ids: the id sketch enters KMV
    # estimation mode; theta RSE at k=64 is ~12.5 %, so 35 % is a
    # generous determinism-safe bound. category (4 < 64) stays exact.
    from iceberg_tools_spark.iceberg.table_stats import write_table_stats

    root, mpath = mor_scratch
    res = write_table_stats(spark, mpath, 2004, root, lg_k=6)
    assert abs(res["ndv"]["id"] - 323) / 323 < 0.35
    assert res["ndv"]["category"] == 4


def test_table_stats_unknown_column_raises(spark, mor_scratch):
    from iceberg_tools_spark.iceberg.table_stats import write_table_stats

    root, mpath = mor_scratch
    with pytest.raises(ValueError, match="not in the current schema"):
        write_table_stats(spark, mpath, 2004, root, columns=["nope"])


def test_table_stats_tampered_registration_raises(spark, mor_scratch):
    # a metadata entry whose blob list disagrees with the file's own
    # footer is rejected (stale registration after a file rewrite)
    import json as _json

    from iceberg_tools_spark.iceberg.table_stats import (
        read_table_stats,
        write_table_stats,
    )

    root, mpath = mor_scratch
    res = write_table_stats(spark, mpath, 2004, root)
    doc = _json.load(open(res["metadata_path"]))
    doc["statistics"][0]["blob-metadata"].append(
        dict(doc["statistics"][0]["blob-metadata"][0])
    )
    _json.dump(doc, open(res["metadata_path"], "w"))
    with pytest.raises(ValueError, match="footer lists"):
        read_table_stats(spark, res["metadata_path"], 2004, root)


def test_expire_drops_stats_of_expired_snapshots(spark, mor_scratch):
    # expiry removes BOTH kinds of stats registrations for expired
    # snapshots and reports their files as removable; survivors keep
    # theirs
    from iceberg_tools_spark.iceberg.commit import expire_snapshots
    from iceberg_tools_spark.iceberg.table_stats import write_table_stats

    root, mpath = mor_scratch
    r1 = write_partition_stats(spark, mpath, 2002, root)
    r2 = write_table_stats(spark, r1["metadata_path"], 2004, root)
    res = expire_snapshots(r2["metadata_path"], keep_last=2, base_dir=root)
    assert 2002 in res["expired"]
    meta = parse_metadata(res["metadata_path"])
    assert meta.raw.get("partition-statistics", []) == []  # 2002's gone
    (t,) = meta.raw["statistics"]  # 2004 survived
    assert t["snapshot-id"] == 2004
    assert any(p.endswith("partition-stats-2002.parquet") for p in res["removable"])


# --------------------------------- theta sketch format (interop)


def test_murmur3_128_public_vector():
    # the widely published x64_128 reference vector for "foo", seed 0
    from iceberg_tools_spark.iceberg.theta import murmur3_128

    h1, h2 = murmur3_128(b"foo", 0)

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    assert (signed(h1), signed(h2)) == (
        -2129773440516405919, 9128664383759220103
    )
    # block + tail coverage: 16-byte-aligned and unaligned inputs
    # are deterministic and seed-sensitive
    assert murmur3_128(b"0123456789abcdef", 0) != murmur3_128(b"0123456789abcdef", 1)
    assert murmur3_128(b"0123456789abcdefX", 0) != murmur3_128(b"0123456789abcdef", 0)


def test_theta_golden_header_and_roundtrip():
    """The serialized bytes carry the documented serial-version-3
    COMPACT preamble (the 'golden sketch' structural pin: a real
    DataSketches reader dispatches on exactly these bytes)."""
    from iceberg_tools_spark.iceberg.theta import (
        build_compact_theta,
        compute_seed_hash,
        deserialize_compact_theta,
        serialize_compact_theta,
        theta_estimate,
        theta_hash,
    )

    sk = build_compact_theta(theta_hash(i) for i in range(1000))
    b = serialize_compact_theta(sk)
    # preamble: preLongs=2 (exact), serVer=3, family=3 (COMPACT),
    # flags = READ_ONLY|COMPACT|ORDERED = 0x1A, seed hash of 9001
    assert b[0] == 2 and b[1] == 3 and b[2] == 3
    assert b[5] == 0x1A
    assert int.from_bytes(b[6:8], "little") == compute_seed_hash(9001)
    assert int.from_bytes(b[8:12], "little") == 1000
    # bytes 12-15: sampling probability p = 1.0f (ADVICE r7 — the
    # library stores the float, not zeros)
    import struct as _s0

    assert _s0.unpack_from("<f", b, 12)[0] == 1.0
    assert len(b) == 16 + 8 * 1000
    # retained hashes are ascending int64 (ORDERED flag honesty)
    import struct as _s

    hs = list(_s.unpack_from("<1000q", b, 16))
    assert hs == sorted(hs) and all(h > 0 for h in hs)
    back = deserialize_compact_theta(b)
    assert back["hashes"] == sk["hashes"] and theta_estimate(back) == 1000.0


def test_theta_estimation_mode_and_empty():
    from iceberg_tools_spark.iceberg.theta import (
        build_compact_theta,
        deserialize_compact_theta,
        serialize_compact_theta,
        theta_estimate,
        theta_hash,
    )

    n = 100_000
    sk = build_compact_theta((theta_hash(i) for i in range(n)), lg_k=12)
    b = serialize_compact_theta(sk)
    assert b[0] == 3  # estimation form stores thetaLong
    back = deserialize_compact_theta(b)
    assert len(back["hashes"]) == 4096
    assert abs(theta_estimate(back) - n) / n < 0.07  # ~4 RSE at k=4096
    # empty form: 8 bytes, EMPTY flag set
    eb = serialize_compact_theta(build_compact_theta([]))
    assert len(eb) == 8 and eb[5] & 0x04
    assert theta_estimate(deserialize_compact_theta(eb)) == 0.0
    # single-item shortcut form (real writers may emit it) parses
    one = bytes([1, 3, 3, 0, 0, 0x1A]) + eb[6:8] + (12345).to_bytes(8, "little")
    got = deserialize_compact_theta(one)
    assert got["hashes"] == [12345] and not got["empty"]
    # ... and the WRITER now emits it for count==1 (ADVICE r7):
    # 16 bytes, preLongs=1, SINGLEITEM flag set, round-trips
    sb = serialize_compact_theta(build_compact_theta([12345]))
    assert len(sb) == 16 and sb[0] == 1 and sb[5] & 0x20
    back1 = deserialize_compact_theta(sb)
    assert back1["hashes"] == [12345] and theta_estimate(back1) == 1.0


def test_theta_iceberg_single_value_encoding():
    # the Puffin theta blob hashes ICEBERG single-value bytes: a
    # long and an int with the same numeric value hash DIFFERENTLY
    # (8 vs 4 byte encodings) — pin the dispatch so nobody
    # "simplifies" it back to Python-type hashing
    from iceberg_tools_spark.iceberg.conversions import to_bytes
    from iceberg_tools_spark.iceberg.theta import theta_hash

    assert to_bytes("long", 34) != to_bytes("int", 34)
    assert theta_hash(to_bytes("long", 34)) != theta_hash(to_bytes("int", 34))
    assert theta_hash(to_bytes("string", "hi")) == theta_hash("hi".encode())


def test_incremental_stats_update_matches_full_recompute(spark, mor_scratch):
    """Append-only theta union (update_table_stats_incremental)
    produces the SAME sketches as a full recompute — exact mode
    merges are set unions — while reading only the appended files."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.table_stats import (
        read_table_stats,
        update_table_stats_incremental,
        write_table_stats,
    )

    root, mpath = mor_scratch
    r0 = write_table_stats(spark, mpath, 2004, root)
    assert r0["ndv"] == {"id": 323, "category": 4}

    pq.write_table(
        pa.table({
            "id": np.arange(1000, 1050, dtype="int64"),
            "category": ["q"] * 50,
        }),
        os.path.join(root, "data", "new1.parquet"),
    )
    r1 = append_snapshot(
        r0["metadata_path"],
        [{"path": "data/new1.parquet",
          "partition": {"category": "q", "id_trunc": 1000}}],
        base_dir=root,
    )
    inc = update_table_stats_incremental(
        spark, r1["metadata_path"], r1["snapshot_id"], root
    )
    assert inc["base_snapshot_id"] == 2004 and inc["added_files"] == 1
    assert inc["ndv"] == {"id": 373, "category": 5}
    # byte-identical to the full recompute (exact-mode set union)
    full = write_table_stats(spark, r1["metadata_path"], r1["snapshot_id"], root)
    assert full["ndv"] == inc["ndv"]
    assert (
        open(inc["statistics_path"], "rb").read()
        == open(full["statistics_path"], "rb").read()
    )
    df = read_table_stats(spark, inc["metadata_path"], r1["snapshot_id"], root)
    assert all(r["payload_agrees"] for r in df.collect())


def test_incremental_stats_refuses_delete_in_range(spark, mor_scratch):
    from iceberg_tools_spark.iceberg.dml import delete_where
    from iceberg_tools_spark.iceberg.table_stats import (
        update_table_stats_incremental,
        write_table_stats,
    )

    root, mpath = mor_scratch
    r0 = write_table_stats(spark, mpath, 2004, root)
    rd = delete_where(spark, r0["metadata_path"], "id = 50", base_dir=root)
    with pytest.raises(ValueError, match="not append-only"):
        update_table_stats_incremental(
            spark, rd["metadata_path"], rd["snapshot_id"], root
        )


def test_incremental_stats_requires_a_registered_ancestor(spark, mor_scratch):
    from iceberg_tools_spark.iceberg.table_stats import (
        update_table_stats_incremental,
    )

    root, mpath = mor_scratch
    with pytest.raises(ValueError, match="no ancestor"):
        update_table_stats_incremental(spark, mpath, 2004, root)


def test_theta_merge_estimation_mode():
    from iceberg_tools_spark.iceberg.theta import (
        build_compact_theta,
        merge_compact_theta,
        theta_estimate,
        theta_hash,
    )

    a = build_compact_theta((theta_hash(i) for i in range(30_000)), lg_k=12)
    b = build_compact_theta(
        (theta_hash(i) for i in range(20_000, 60_000)), lg_k=12
    )
    m = merge_compact_theta([a, b], lg_k=12)
    assert len(m["hashes"]) <= 4096
    est = theta_estimate(m)
    assert abs(est - 60_000) / 60_000 < 0.07
    # merge with an empty sketch is identity
    e = build_compact_theta([])
    assert merge_compact_theta([a, e], lg_k=12) == a


def test_theta_fixed_batch_kernel_matches_scalar():
    import numpy as np

    from iceberg_tools_spark.iceberg.conversions import to_bytes
    from iceberg_tools_spark.iceberg.theta import (
        theta_hash,
        theta_hash_fixed_batch,
    )

    rng = np.random.default_rng(11)
    longs = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    assert (
        theta_hash_fixed_batch(longs, 8)
        == np.array([theta_hash(to_bytes("long", int(v))) for v in longs])
    ).all()
    ints = rng.integers(-(2**31), 2**31, 1000, dtype=np.int64)
    assert (
        theta_hash_fixed_batch(ints, 4)
        == np.array([theta_hash(to_bytes("int", int(v))) for v in ints])
    ).all()
    dbl = rng.normal(size=1000)
    assert (
        theta_hash_fixed_batch(np.frombuffer(dbl.tobytes(), dtype=np.int64), 8)
        == np.array([theta_hash(to_bytes("double", float(v))) for v in dbl])
    ).all()


def test_theta_double_batch_canonicalizes_neg_zero_and_nan():
    """The batch double path canonicalizes raw IEEE bits before
    hashing (ADVICE r7): un-normalized -0.0 and odd-payload NaNs
    must hash exactly like the scalar reference path."""
    import struct as _s

    import numpy as np

    from iceberg_tools_spark.iceberg.conversions import to_bytes
    from iceberg_tools_spark.iceberg.theta import (
        canonical_double_bits,
        theta_hash,
        theta_hash_fixed_batch,
    )

    weird_nan = np.frombuffer(
        _s.pack("<q", 0x7FF8000000000123), dtype=np.float64
    )
    arr = np.concatenate(
        [np.array([-0.0, 0.0, 1.5, float("nan")], dtype=np.float64), weird_nan]
    )
    got = theta_hash_fixed_batch(canonical_double_bits(arr), 8)
    # scalar reference: the TYPED dispatch (it owns the -0.0/NaN
    # canonicalization rule; byte inputs are hashed as-given)
    want = np.array([theta_hash(float(v)) for v in arr])
    assert (got == want).all()
    # normal values agree with the single-value-serialization path too
    assert theta_hash(to_bytes("double", 1.5)) == theta_hash(1.5)
    # and -0.0 collapsed onto +0.0, both NaNs onto one hash
    assert got[0] == got[1] and got[3] == got[4]


def test_partition_scoped_stats_reads_only_touched_partition(spark, mor_scratch):
    """VERDICT r7 #7: a one-partition delete triggers a recompute
    that reads ONLY that partition's data files; untouched
    partitions reuse their registered sketches; the merged
    table-level sketch is byte-identical to a full recompute."""
    from iceberg_tools_spark.iceberg.commit import (
        commit_delete_snapshot,
        write_position_deletes,
    )
    from iceberg_tools_spark.iceberg.puffin import read_blob
    from iceberg_tools_spark.iceberg.table_stats import (
        update_table_stats_incremental,
        update_table_stats_partition_scoped,
        write_table_stats,
    )

    root, mpath = mor_scratch
    r0 = write_table_stats(spark, mpath, 2004, root, per_partition=True)
    assert r0["ndv"] == {"id": 323, "category": 4}
    rel = write_position_deletes(
        root, "data/deletes/ps1.parquet",
        [("data/category=z/D.parquet", p) for p in range(5, 10)],
    )
    r1 = commit_delete_snapshot(
        r0["metadata_path"],
        [{"path": rel, "partition": {"category": "z"}, "content": 1}],
        spec_id=0,
    )
    # the insert-only incremental path must refuse this range
    import pytest as _pt

    with _pt.raises(ValueError, match="not append-only"):
        update_table_stats_incremental(spark, r1["metadata_path"], r1["snapshot_id"], root)

    upd = update_table_stats_partition_scoped(
        spark, r1["metadata_path"], r1["snapshot_id"], root
    )
    assert upd["ndv"] == {"id": 319, "category": 4}
    assert upd["touched_partitions"] == ['{"category": "z", "id_trunc": null}']
    assert len(upd["reused_partitions"]) == 3
    # plan pin: ONLY partition z's data file was read
    assert [p.rsplit("/", 1)[-1] for p in upd["recomputed_files"]] == ["D.parquet"]

    # table-level blobs byte-identical to a FULL per-partition recompute
    full = write_table_stats(
        spark, r1["metadata_path"], r1["snapshot_id"], root, per_partition=True
    )

    def table_blobs(res, mp):
        from iceberg_tools_spark.iceberg.metadata import parse_metadata

        meta = parse_metadata(res["metadata_path"])
        entry = next(
            s for s in meta.raw["statistics"]
            if s["snapshot-id"] == res["snapshot_id"]
        )
        return {
            b["properties"]["column"]: read_blob(
                res["statistics_path"], b["offset"], b["length"]
            )
            for b in entry["blob-metadata"]
            if "partition" not in b.get("properties", {})
        }

    assert table_blobs(upd, root) == table_blobs(full, root)


def test_per_partition_write_matches_direct_table_sketch(spark, mor_scratch):
    """write_table_stats(per_partition=True): the table-level union
    of partition sketches equals the direct whole-table build."""
    from iceberg_tools_spark.iceberg.table_stats import write_table_stats

    root, mpath = mor_scratch
    direct = write_table_stats(spark, mpath, 2004, root)
    per = write_table_stats(spark, mpath, 2004, root, per_partition=True)
    assert direct["ndv"] == per["ndv"] == {"id": 323, "category": 4}
