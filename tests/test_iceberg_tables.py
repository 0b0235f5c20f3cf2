"""Metadata tables, maintenance planners, and stats pruning over the
reference fixture + synthetic metadata."""

from __future__ import annotations

import pytest

from iceberg_tools_spark.iceberg import tables
from iceberg_tools_spark.iceberg.maintenance import (
    compact_parquet,
    find_orphan_files,
    plan_compaction,
    plan_expire_snapshots,
)
from iceberg_tools_spark.iceberg.metadata import parse_metadata
from iceberg_tools_spark.iceberg.pruning import prune_files, pruning_stats


def test_meta_files_from_fixture(spark):
    import json

    df = tables.meta_files(spark, "unused")
    rows = df.collect()
    assert len(rows) == 2
    assert all(r.file_format == "PARQUET" for r in rows)
    lb0 = json.loads(rows[0].lower_bounds_json)
    assert lb0["1"] == "value:1;type:long"
    assert lb0["2"] == "value:a;type:string"
    assert json.loads(rows[1].upper_bounds_json)["1"] == "value:2;type:long"


def _fixture_files_df(spark):
    meta = parse_metadata(tables.FIXTURE_METADATA)
    return tables.files_df(spark, [tables.FIXTURE_MANIFEST], meta.raw)


def test_meta_partitions_rollup(spark):
    rows = tables.meta_partitions(spark, "unused").collect()
    # fixture has two single-file partitions (data=a, data=b)
    assert len(rows) == 2
    assert all(r.file_count == 1 and r.record_count == 1 for r in rows)


def test_meta_snapshots_and_history(spark):
    snaps = tables.meta_snapshots(spark, "unused").collect()
    assert len(snaps) >= 1
    assert all(r.snapshot_id is not None for r in snaps)
    hist = tables.meta_history(spark, "unused").collect()
    assert len(hist) >= 1
    assert any(r.is_current_ancestor for r in hist)


# ------------------------------------------------------- maintenance


def test_plan_compaction_invariants(spark):
    files = spark.createDataFrame(
        [("p1", f"f{i}", s) for i, s in enumerate([10, 20, 30, 40, 50, 60])]
        + [("p2", "big", 500)],
        "partition_json string, file_path string, file_size_in_bytes long",
    )
    plan = plan_compaction(files, target_size_bytes=100).collect()
    # every file appears exactly once
    all_files = [f for r in plan for f in r.files]
    assert sorted(all_files) == sorted(["f0", "f1", "f2", "f3", "f4", "f5", "big"])
    # group size exceeds target only for oversized single files
    for r in plan:
        assert r.group_bytes <= 100 + 60 or r.n_files == 1


def test_plan_expire_snapshots():
    meta = parse_metadata(
        {
            "format-version": 2,
            "current-schema-id": 0,
            "schemas": [{"schema-id": 0, "fields": []}],
            "current-snapshot-id": 3,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1000},
                {"snapshot-id": 2, "timestamp-ms": 2000},
                {"snapshot-id": 3, "timestamp-ms": 3000},
            ],
        }
    )
    plan = plan_expire_snapshots(meta, keep_last=1)
    actions = {p["snapshot_id"]: p["action"] for p in plan}
    assert actions == {1: "expire", 2: "expire", 3: "keep"}


def test_find_orphans(spark):
    listing = spark.createDataFrame([("a",), ("b",), ("c",)], "file_path string")
    files = spark.createDataFrame([("a",), ("c",)], "file_path string")
    orphans = {r.file_path for r in find_orphan_files(listing, files).collect()}
    assert orphans == {"b"}


def test_compact_parquet_executor(spark, tmp_path):
    src = spark.range(0, 10000).withColumnRenamed("id", "v")
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    src.repartition(16).write.parquet(in_dir)  # 16 small files
    n = compact_parquet(spark, in_dir, out_dir, target_file_bytes=10**9)
    assert n == 1
    assert spark.read.parquet(out_dir).count() == 10000


# ----------------------------------------------------------- pruning


def test_prune_files_on_fixture_bounds(spark):
    entries = _fixture_files_df(spark)
    # fixture: file A has id∈[1,1], file B id∈[2,2]
    kept = prune_files(entries, field_id=1, lo=2, hi=None).collect()
    assert len(kept) == 1 and kept[0].upper_bounds[1] == "value:2;type:long"
    stats = pruning_stats(entries, field_id=1, lo=3)
    assert stats == {"total_files": 2, "kept_files": 0, "skipped_files": 2}
    # string column (field 2): value ranges a..a / b..b
    kept2 = prune_files(entries, field_id=2, lo="b", hi=None, cast_to="string").collect()
    assert len(kept2) == 1


# ------------------------------------------------ orphan deletion


def test_orphan_delete_protects_all_snapshots(spark, tmp_path):
    # after rewrite_data_files, the replaced A.parquet is still
    # referenced by snapshots 2001-2004 -> protected; only true
    # strays are removed, and a dry run removes nothing
    import os
    import shutil

    from iceberg_tools_spark.iceberg.deletes import MOR_DIR
    from iceberg_tools_spark.iceberg.maintenance import delete_orphan_files
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    mp = str(root / "v2.metadata.json")
    res = rewrite_data_files(spark, mp, target_rels=["data/category=x/A.parquet"])
    stray = root / "data" / "leftover.parquet"
    stray.write_bytes(b"junk")
    dry = delete_orphan_files(spark, res["metadata_path"], dry_run=True)
    assert dry["removed"] == 0 and stray.exists()
    assert [os.path.basename(p) for p in dry["orphans"]] == ["leftover.parquet"]
    out = delete_orphan_files(spark, res["metadata_path"])
    assert out["removed"] == 1 and not stray.exists()
    # A.parquet survives: old snapshots still reference it
    assert (root / "data" / "category=x" / "A.parquet").exists()


def test_orphan_delete_after_expiry_frees_old_files(spark, tmp_path):
    # compose with expiry: once every snapshot referencing only-old
    # files is expired, those files become deletable orphans
    import shutil

    from iceberg_tools_spark.iceberg.commit import expire_snapshots
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.maintenance import delete_orphan_files
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    mp = str(root / "v2.metadata.json")
    res = rewrite_data_files(spark, mp)  # folds all pos-deletes
    res2 = expire_snapshots(res["metadata_path"], keep_last=1)
    out = delete_orphan_files(spark, res2["metadata_path"])
    # the replaced originals (A, C) are now unreferenced
    names = {p.rsplit("/", 1)[-1] for p in out["orphans"]}
    assert {"A.parquet", "C.parquet"} <= names
    meta = parse_metadata(res2["metadata_path"])
    live = read_mor(
        spark, res2["metadata_path"], meta.current_snapshot_id, base_dir=str(root)
    )
    assert live.count() == 323  # table unharmed
