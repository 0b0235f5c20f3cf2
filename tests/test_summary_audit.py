"""Snapshot-summary audit: manifests-vs-summary reconciliation,
including the corrupted-summary detection leg."""

from __future__ import annotations

import json
import os
import shutil

from iceberg_tools_spark.iceberg.snapshots import (
    MS_DIR,
    MS_METADATA,
    audit_snapshot_summaries,
    meta_all_manifests,
    snapshot_summary_audit,
)


def test_fixture_summaries_all_consistent(spark):
    rows = snapshot_summary_audit(spark, "").collect()
    assert [r.snapshot_id for r in rows] == [1001, 1002, 1003, 1004]
    assert all(r.consistent for r in rows)
    r3 = next(r for r in rows if r.snapshot_id == 1003)
    assert r3.deleted_files_actual == 1 and r3.deleted_rows_actual == 50


def test_corrupted_summary_detected(spark, tmp_path):
    """Tamper with one snapshot's claimed added-records: the audit
    must flag exactly that snapshot as inconsistent."""
    work = tmp_path / "ms"
    shutil.copytree(MS_DIR, work)
    mp = str(work / os.path.basename(MS_METADATA))
    meta = json.load(open(mp))
    for s in meta["snapshots"]:
        if s["snapshot-id"] == 1002:
            s["summary"]["added-records"] = "999"
    json.dump(meta, open(mp, "w"))
    rows = {r.snapshot_id: r for r in
            audit_snapshot_summaries(spark, mp, str(work)).collect()}
    assert not rows[1002].consistent
    assert rows[1002].added_rows_claimed == 999
    assert rows[1002].added_rows_actual == 150
    assert all(rows[s].consistent for s in (1001, 1003, 1004))


def test_engine_commits_pass_their_own_audit(spark, tmp_path):
    """The engine's own append + delete commits must write summaries
    the audit reconciles — writer and auditor are independent code
    paths over the same manifests."""
    import pyspark.sql.functions as F

    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.dml import delete_where

    root = tmp_path / "t"
    (root / "metadata").mkdir(parents=True)
    (root / "data").mkdir()
    meta0 = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000aa",
        "location": f"file://{root}",
        "last-sequence-number": 0, "last-updated-ms": 0, "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "long"},
        ]}],
        "default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0, "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}, "snapshots": [], "snapshot-log": [], "metadata-log": [],
    }
    mp = str(root / "v1.metadata.json")
    json.dump(meta0, open(mp, "w"))
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "stage"))
    import glob

    part = glob.glob(str(root / "stage" / "part-*.parquet"))[0]
    os.replace(part, str(root / "data" / "f0.parquet"))
    res = append_snapshot(mp, [{"path": "data/f0.parquet", "partition": {}}])
    res2 = delete_where(spark, res["metadata_path"], "id < 10")
    rows = audit_snapshot_summaries(
        spark, res2["metadata_path"], str(root)
    ).collect()
    assert len(rows) >= 2 and all(r.consistent for r in rows)
    # the delete snapshot must account its rows under
    # added-position-deletes, NOT added-records (data rows only)
    meta2 = json.load(open(res2["metadata_path"]))
    s2 = next(s for s in meta2["snapshots"]
              if s["snapshot-id"] == res2["snapshot_id"])
    assert "added-records" not in s2["summary"]
    assert int(s2["summary"]["added-position-deletes"]) == 10


def test_all_manifests_reference_counts(spark):
    rows = {r.manifest_name: r for r in meta_all_manifests(spark, "").collect()}
    assert rows["m1.avro"].n_referencing_snapshots == 3
    assert rows["m3.avro"].existing_files_count == 3
    assert rows["m3.avro"].deleted_files_count == 1
