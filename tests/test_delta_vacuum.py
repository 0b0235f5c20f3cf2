"""Delta VACUUM (retention-gated physical file removal) and
timestampAsOf time travel — round 12 additions to the pure-Python
Delta surface."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.sources.delta_log import (
    append_delta_commit,
    commit_delta_dv,
    read_delta_cdf,
    read_delta_log,
    vacuum_delta,
    version_at_timestamp,
)

NOW = 1_700_000_000_000  # fixed clock for every test
DAY = 24 * 3600 * 1000


def _schema(*fields):
    return json.dumps({"type": "struct", "fields": [
        {"name": n, "type": t, "nullable": True, "metadata": {}}
        for n, t in fields
    ]})


def _meta(schema):
    return {"metaData": {
        "id": "x", "format": {"provider": "parquet", "options": {}},
        "schemaString": schema, "partitionColumns": [],
        "configuration": {}, "createdTime": 0,
    }}


def _write(root, name, ids, mtime_ms=None):
    p = os.path.join(root, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), p)
    if mtime_ms is not None:
        os.utime(p, (mtime_ms / 1000, mtime_ms / 1000))
    return p


def _base_table(root):
    os.makedirs(os.path.join(root, "_delta_log"))
    _write(root, "f1.parquet", [1, 2], mtime_ms=NOW - 30 * DAY)
    _write(root, "f2.parquet", [3, 4], mtime_ms=NOW - 30 * DAY)
    append_delta_commit(root, [
        _meta(_schema(("id", "long"))),
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"commitInfo": {"operation": "WRITE", "timestamp": NOW - 20 * DAY}},
    ], checkpoint_interval=None)


def test_vacuum_protects_live_recent_tombstones_and_inflight(spark, tmp_path):
    root = str(tmp_path / "t")
    _base_table(root)
    # v1: drop f2 with a RECENT deletionTimestamp (inside retention)
    _write(root, "f3.parquet", [5], mtime_ms=NOW - 10 * DAY)
    append_delta_commit(root, [
        {"remove": {"path": "f2.parquet", "deletionTimestamp": NOW - 1000,
                    "dataChange": True}},
        {"add": {"path": "f3.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"commitInfo": {"operation": "MERGE", "timestamp": NOW - 10 * DAY}},
    ], checkpoint_interval=None)
    stray_old = _write(root, "stray_old.parquet", [9], mtime_ms=NOW - 10 * DAY)
    stray_new = _write(root, "stray_new.parquet", [9], mtime_ms=NOW - 1000)

    plan = vacuum_delta(spark, root, now_ms=NOW, dry_run=True)
    assert plan["removed"] == 0 and plan["candidates"] == [stray_old]
    assert plan["too_young"] == [stray_new]
    assert os.path.exists(stray_old)  # dry run touches nothing

    res = vacuum_delta(spark, root, now_ms=NOW)
    assert res["removed"] == 1 and not os.path.exists(stray_old)
    assert os.path.exists(stray_new)  # the in-flight race guard
    assert os.path.exists(os.path.join(root, "f2.parquet"))  # recent tombstone
    assert res["n_tombstone_protected"] == 1
    # the table still reads at head AND the pre-delete version
    assert sorted(r.id for r in read_delta_log(spark, root).collect()) == [1, 2, 5]
    assert sorted(r.id for r in read_delta_log(spark, root, 0).collect()) == [1, 2, 3, 4]


def test_vacuum_reaps_expired_tombstones(spark, tmp_path):
    root = str(tmp_path / "t")
    _base_table(root)
    append_delta_commit(root, [
        {"remove": {"path": "f2.parquet",
                    "deletionTimestamp": NOW - 10 * DAY,  # past retention
                    "dataChange": True}},
        {"commitInfo": {"operation": "DELETE", "timestamp": NOW - 10 * DAY}},
    ], checkpoint_interval=None)
    res = vacuum_delta(spark, root, now_ms=NOW)
    assert res["removed"] == 1
    assert not os.path.exists(os.path.join(root, "f2.parquet"))
    # head unaffected; time travel BEFORE the delete now fails on
    # read — the documented VACUUM trade
    assert sorted(r.id for r in read_delta_log(spark, root).collect()) == [1, 2]
    with pytest.raises(Exception):
        read_delta_log(spark, root, 0).collect()


def test_vacuum_protects_dv_bins_and_cdc_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _base_table(root)
    commit_delta_dv(root, {"f1.parquet": [0]}, checkpoint_interval=None,
                    write_cdf=True)
    # age every non-log file past the cutoff: only protection can
    # save them now
    for dp, _dns, fns in os.walk(root):
        if "_delta_log" in dp:
            continue
        for fn in fns:
            p = os.path.join(dp, fn)
            t = (NOW - 30 * DAY) / 1000
            os.utime(p, (t, t))
    res = vacuum_delta(spark, root, now_ms=NOW)
    assert res["removed"] == 0 and res["candidates"] == []
    # DV read and CDF read both still work post-vacuum
    assert sorted(r.id for r in read_delta_log(spark, root).collect()) == [2, 3, 4]
    cdf = read_delta_cdf(spark, root, 1, 1)
    assert [r.id for r in cdf.collect()] == [1]


def test_timestamp_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _base_table(root)  # v0 at NOW - 20d
    _write(root, "f3.parquet", [5])
    append_delta_commit(root, [
        {"add": {"path": "f3.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"commitInfo": {"operation": "WRITE", "timestamp": NOW - 5 * DAY}},
    ], checkpoint_interval=None)
    assert version_at_timestamp(root, NOW) == 1
    assert version_at_timestamp(root, NOW - 10 * DAY) == 0
    assert version_at_timestamp(root, NOW - 5 * DAY) == 1  # inclusive
    with pytest.raises(ValueError, match="precedes the earliest commit"):
        version_at_timestamp(root, NOW - 25 * DAY)
    got = sorted(r.id for r in read_delta_log(
        spark, root, timestamp_ms=NOW - 10 * DAY).collect())
    assert got == [1, 2, 3, 4]
    got = sorted(r.id for r in read_delta_log(
        spark, root, timestamp_ms=NOW).collect())
    assert got == [1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="not both"):
        read_delta_log(spark, root, 0, timestamp_ms=NOW)


def test_vacuum_and_cleanup_cli(spark, tmp_path, capsys):
    """CLI dispatch: dry-run by default, --execute to act, usage
    errors exit 1."""
    from iceberg_tools_spark.__main__ import main
    from iceberg_tools_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "t")
    _base_table(root)
    stray = _write(root, "stray.parquet", [9], mtime_ms=NOW - 10 * DAY)
    assert main(["delta-vacuum", f"--now-ms={NOW}", root]) == 0
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["dry_run"] is True and head["n_candidates"] == 1
    assert os.path.exists(stray)
    assert main(["delta-vacuum", f"--now-ms={NOW}", "--execute", root]) == 0
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["removed"] == 1 and not os.path.exists(stray)

    # log cleanup: base table's v0 commitInfo is NOW - 20d; a 10d
    # retention with a checkpoint at head makes nothing removable
    # (v0 IS the checkpoint version)
    write_delta_checkpoint(root, now_ms=NOW)
    assert main(["delta-log-cleanup", f"--now-ms={NOW}",
                 "--retention-ms=864000000", root]) == 0
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["dry_run"] is True and head["n_removed_commits"] == 0
    # usage errors
    assert main(["delta-vacuum"]) == 1
    assert main(["delta-log-cleanup", "--bogus=1", root]) == 1
