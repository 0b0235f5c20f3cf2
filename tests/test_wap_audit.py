"""WAP audit gates: check evaluation scoping, abort semantics,
publish composition."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.iceberg.audits import (
    abort_staged,
    audit_and_publish,
    audit_staged,
)
from iceberg_tools_spark.iceberg.commit import _scratch_table, append_snapshot
from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
from iceberg_tools_spark.iceberg.metadata import parse_metadata


@pytest.fixture()
def staged_table():
    root = _scratch_table("wap_audit_t_", MOR_DIR)
    mp = os.path.join(root, "v2.metadata.json")
    rel = "data/category=w/id_trunc=400/S.parquet"
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table({
            "id": pa.array([400, 401, 401], pa.int64()),
            "category": pa.array(["w", "w", "w"], pa.string()),
        }),
        p,
    )
    res = append_snapshot(
        mp, [{"path": rel, "partition": {"category": "w", "id_trunc": 400}}],
        stage_ref="aud",
    )
    return root, res["metadata_path"], res["snapshot_id"]


def test_added_scope_checks_see_only_staged_rows(spark, staged_table):
    root, mp, _sid = staged_table
    # the fixture holds ids far beyond 401; a bound that only the
    # STAGED rows satisfy must still pass -> proof of added-scoping
    res = audit_staged(
        spark, mp, "aud",
        [{"type": "min_max", "column": "id", "lo": 400, "hi": 401}],
        base_dir=root,
    )
    assert res[0]["passed"], res


def test_unique_key_sees_full_state(spark, staged_table):
    root, mp, _sid = staged_table
    # 401 duplicated WITHIN the staged file -> fails on full state
    res = audit_staged(
        spark, mp, "aud", [{"type": "unique_key", "columns": ["id"]}],
        base_dir=root,
    )
    assert not res[0]["passed"]
    assert "duplicate_keys=1" in res[0]["observed"]


def test_abort_drops_ref_and_keeps_main(spark, staged_table):
    root, mp, sid = staged_table
    cur_before = parse_metadata(mp).current_snapshot_id
    res = audit_and_publish(
        spark, mp, "aud", [{"type": "unique_key", "columns": ["id"]}],
        base_dir=root,
    )
    assert not res["published"]
    meta2 = parse_metadata(res["metadata_path"])
    assert "aud" not in meta2.raw.get("refs", {})
    assert meta2.current_snapshot_id == cur_before
    # the aborted snapshot still exists (expiry reclaims it later)
    assert any(s["snapshot-id"] == sid for s in meta2.snapshots)
    # main's rows unchanged
    n = read_mor(spark, res["metadata_path"], cur_before, root).count()
    n0 = read_mor(spark, mp, cur_before, root).count()
    assert n == n0


def test_unknown_check_raises(spark, staged_table):
    root, mp, _sid = staged_table
    with pytest.raises(ValueError, match="unknown audit check"):
        audit_staged(spark, mp, "aud", [{"type": "bogus"}], base_dir=root)


def test_missing_ref_raises(staged_table):
    _root, mp, _sid = staged_table
    with pytest.raises(ValueError, match="no staged ref"):
        abort_staged(mp, "nope")


# --------------------------------------------- maintenance orchestrator


def _fresh_table(tmp_path, spark):
    import glob
    import json

    import pyspark.sql.functions as F

    root = tmp_path / "mt"
    (root / "metadata").mkdir(parents=True)
    (root / "data").mkdir()
    meta0 = {
        "format-version": 2, "table-uuid": "00000000-0000-0000-0000-0000000000bb",
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
    spark.range(200).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "stage"))
    part = glob.glob(str(root / "stage" / "part-*.parquet"))[0]
    os.replace(part, str(root / "data" / "f0.parquet"))
    return root, append_snapshot(mp, [{"path": "data/f0.parquet", "partition": {}}])


def test_run_maintenance_end_to_end(spark, tmp_path):
    """delete → run_maintenance: deletes folded, history expired,
    the pre-rewrite data file reclaimed as an orphan, live rows
    preserved exactly."""
    from iceberg_tools_spark.iceberg.dml import delete_where
    from iceberg_tools_spark.iceberg.maintenance import run_maintenance

    root, res = _fresh_table(tmp_path, spark)
    res2 = delete_where(spark, res["metadata_path"], "id < 40")
    rep = run_maintenance(spark, res2["metadata_path"], keep_last=1)
    steps = {s["step"]: s for s in rep["steps"]}
    assert steps["rewrite_data_files"]["targets"] == ["data/f0.parquet"]
    assert len(steps["expire_snapshots"]["expired"]) >= 1
    # the pre-rewrite file is now unreferenced and physically gone
    # (orphans are reported as absolute paths)
    assert any(
        o.endswith("data/f0.parquet")
        for o in steps["delete_orphan_files"]["orphans"]
    )
    assert not os.path.exists(str(root / "data" / "f0.parquet"))
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    final = parse_metadata(rep["metadata_path"])
    live = read_mor(spark, rep["metadata_path"], final.current_snapshot_id, str(root))
    assert live.count() == 160
    assert live.filter("id < 40").count() == 0


def test_run_maintenance_dry_run_touches_nothing(spark, tmp_path):
    from iceberg_tools_spark.iceberg.dml import delete_where
    from iceberg_tools_spark.iceberg.maintenance import run_maintenance

    root, res = _fresh_table(tmp_path, spark)
    res2 = delete_where(spark, res["metadata_path"], "id < 40")
    import glob

    before = sorted(glob.glob(str(root / "**" / "*"), recursive=True))
    rep = run_maintenance(spark, res2["metadata_path"], keep_last=1, dry_run=True)
    after = sorted(glob.glob(str(root / "**" / "*"), recursive=True))
    assert before == after
    assert rep["metadata_path"] == res2["metadata_path"]
    steps = {s["step"]: s for s in rep["steps"]}
    assert steps["rewrite_data_files"]["skipped"]
    assert steps["expire_snapshots"]["skipped"]


def test_orphan_age_guard(spark, tmp_path):
    """A young unreferenced file (an in-flight writer's staging) is
    reported too_young and NOT deleted; an old one is reclaimed."""
    from iceberg_tools_spark.iceberg.maintenance import delete_orphan_files

    root, res = _fresh_table(tmp_path, spark)
    young = root / "data" / "inflight.parquet"
    young.write_bytes(b"PAR1junkPAR1")
    old = root / "data" / "stale.parquet"
    old.write_bytes(b"PAR1junkPAR1")
    past = (os.stat(old).st_mtime - 7200, os.stat(old).st_mtime - 7200)
    os.utime(old, past)
    rep = delete_orphan_files(
        spark, res["metadata_path"], older_than_ms=3_600_000
    )
    assert [os.path.basename(p) for p in rep["orphans"]] == ["stale.parquet"]
    assert [os.path.basename(p) for p in rep["too_young"]] == ["inflight.parquet"]
    assert young.exists() and not old.exists()
