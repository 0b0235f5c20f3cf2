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


def test_table_stats_approximate_close_to_exact(spark, mor_scratch):
    from iceberg_tools_spark.iceberg.table_stats import write_table_stats

    root, mpath = mor_scratch
    res = write_table_stats(spark, mpath, 2004, root, approximate=True)
    assert abs(res["ndv"]["id"] - 323) / 323 < 0.15  # HLL++ rsd default 5%
    assert res["ndv"]["category"] == 4  # tiny cardinality is exact in HLL++


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
