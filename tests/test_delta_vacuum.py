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


def test_vacuum_checkpointed_table_protects_via_spark_read(spark, tmp_path):
    """VERDICT r12 #3: with a checkpoint present, the protected set's
    bulk derives from a SPARK read of the checkpoint parquet (the
    old path replayed it driver-side and broadcast the frame). The
    checkpoint's live files, their DV bins, its unexpired tombstones
    — and post-checkpoint state overriding checkpoint state — all
    protect correctly after the pre-checkpoint commits are gone."""
    from iceberg_tools_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "t")
    _base_table(root)  # v0: f1 (1,2) + f2 (3,4)
    # v1: DV-delete position 0 of f1 (recent delete: bin + tombstone)
    commit_delta_dv(root, {"f1.parquet": [0]}, checkpoint_interval=None)
    # v2: drop f2 with a RECENT deletionTimestamp
    append_delta_commit(root, [
        {"remove": {"path": "f2.parquet", "deletionTimestamp": NOW - 1000,
                    "dataChange": True}},
        {"commitInfo": {"operation": "DELETE", "timestamp": NOW - 1000}},
    ], checkpoint_interval=None)
    write_delta_checkpoint(root, now_ms=NOW)
    for v in (0, 1):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    # v3 (post-checkpoint): append f3, then age EVERYTHING so only
    # protection can save a file
    _write(root, "f3.parquet", [5])
    append_delta_commit(root, [
        {"add": {"path": "f3.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"commitInfo": {"operation": "WRITE", "timestamp": NOW - 500}},
    ], checkpoint_interval=None)
    stray = _write(root, "stray.parquet", [9])
    for dp, _dns, fns in os.walk(root):
        if "_delta_log" in dp:
            continue
        for fn in fns:
            p = os.path.join(dp, fn)
            t = (NOW - 30 * DAY) / 1000
            os.utime(p, (t, t))
    res = vacuum_delta(spark, root, now_ms=NOW)
    assert res["candidates"] == [stray] and res["removed"] == 1
    assert res["n_tombstone_protected"] >= 1  # f2's recent tombstone
    # live head = f1 minus DV position 0 (id 2) + f3 (id 5); f1 and
    # its DV bin survived via the checkpoint-side protection
    assert sorted(r.id for r in read_delta_log(spark, root).collect()) == [2, 5]
    # f2 is no longer live but its RECENT tombstone protects the file
    assert os.path.exists(os.path.join(root, "f2.parquet"))


def test_vacuum_protects_inline_actions_in_v2_json_top(spark, tmp_path):
    """ADVICE r13 high: a spec-legal v2 JSON top-level checkpoint may
    carry INLINE add/remove actions (no sidecars). Building the
    protected frame before harvesting them dropped those files from
    the protected set — vacuum listed LIVE data as delete candidates
    (data loss on foreign v2 checkpoints)."""
    root = str(tmp_path / "t")
    _base_table(root)  # v0: f1 (1,2) + f2 (3,4), both live
    d = os.path.join(root, "_delta_log")
    # foreign writer: a v2 JSON top at v0 with INLINE file actions
    # (spec-legal — sidecars are optional), plus a recent inline
    # tombstone for a third file
    _write(root, "f3.parquet", [5], mtime_ms=NOW - 30 * DAY)
    with open(os.path.join(d, "00000000000000000000.checkpoint.abc0.json"),
              "w") as f:
        f.write(json.dumps({"checkpointMetadata": {"version": 0,
                                                   "tags": {}}}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint"]}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema(("id", "long")),
            "partitionColumns": [], "configuration": {}, "createdTime": 0,
        }}) + "\n")
        for rel in ("f1.parquet", "f2.parquet"):
            f.write(json.dumps({"add": {
                "path": rel, "partitionValues": {}, "size": 1,
                "modificationTime": 0, "dataChange": True}}) + "\n")
        f.write(json.dumps({"remove": {
            "path": "f3.parquet", "deletionTimestamp": NOW - 1000,
            "dataChange": True}}) + "\n")
    # age everything: only protection can save a file now
    for dp, _dns, fns in os.walk(root):
        if "_delta_log" in dp:
            continue
        for fn in fns:
            p = os.path.join(dp, fn)
            t = (NOW - 30 * DAY) / 1000
            os.utime(p, (t, t))
    plan = vacuum_delta(spark, root, now_ms=NOW, dry_run=True)
    assert plan["candidates"] == []  # f1/f2 live, f3 recent tombstone
    assert plan["n_live_protected"] == 2
    assert plan["n_tombstone_protected"] == 1
    for rel in ("f1.parquet", "f2.parquet", "f3.parquet"):
        assert os.path.exists(os.path.join(root, rel))


def test_vacuum_single_log_walk(spark, tmp_path, monkeypatch):
    """VERDICT r12 #8: vacuum makes ONE pass over the JSON log — no
    replay_log / replay_tombstones / separate cdc walk."""
    import iceberg_tools_spark.sources.delta_log as dl

    root = str(tmp_path / "t")
    _base_table(root)
    calls = {"list_commits": 0, "replay_log": 0, "replay_tombstones": 0}
    orig = dl.list_commits
    monkeypatch.setattr(dl, "list_commits", lambda r: (
        calls.__setitem__("list_commits", calls["list_commits"] + 1)
        or orig(r)
    ))
    monkeypatch.setattr(dl, "replay_log", lambda *a, **k: (
        calls.__setitem__("replay_log", calls["replay_log"] + 1)
        or (_ for _ in ()).throw(AssertionError("replay_log called"))
    ))
    monkeypatch.setattr(dl, "replay_tombstones", lambda *a, **k: (
        calls.__setitem__("replay_tombstones", calls["replay_tombstones"] + 1)
        or (_ for _ in ()).throw(AssertionError("replay_tombstones called"))
    ))
    res = dl.vacuum_delta(spark, root, now_ms=NOW, dry_run=True)
    assert res["dry_run"] is True
    assert calls == {"list_commits": 1, "replay_log": 0,
                     "replay_tombstones": 0}


def test_replay_gap_after_partial_cleanup_raises(spark, tmp_path):
    """ADVICE r12: cleanup_delta_log age-gates pre-checkpoint commits
    INDIVIDUALLY, so commits 0..k can be gone while k+1..cp-1 survive.
    A time-travel read into that window must raise naming the
    earliest readable version — not silently replay the tail (wrong
    live set, missing metaData)."""
    from iceberg_tools_spark.sources.delta_log import write_delta_checkpoint

    root = str(tmp_path / "t")
    _base_table(root)  # v0: f1 + f2
    for i, name in enumerate(["f3.parquet", "f4.parquet", "f5.parquet"]):
        _write(root, name, [10 + i])
        append_delta_commit(root, [
            {"add": {"path": name, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ], checkpoint_interval=None)
    write_delta_checkpoint(root)  # checkpoint at v3
    # partial cleanup: v0 gone, v1/v2 retained
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    # head and the checkpoint version still read exactly
    assert sorted(r.id for r in read_delta_log(spark, root).collect()) == \
        [1, 2, 3, 4, 10, 11, 12]
    # the gap window raises with guidance, for every version in it
    for v in (1, 2):
        with pytest.raises(ValueError, match="earliest readable version is 3"):
            read_delta_log(spark, root, v)
    # no checkpoint at all + a missing base commit = unreadable, said aloud
    root2 = str(tmp_path / "t2")
    _base_table(root2)
    _write(root2, "g.parquet", [9])
    append_delta_commit(root2, [
        {"add": {"path": "g.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    os.remove(os.path.join(root2, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="no checkpoint covers the gap"):
        read_delta_log(spark, root2)


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


def test_cli_flag_parsing_booleans_and_empty_values(tmp_path, capsys):
    """ADVICE r12: ``--execute=false`` must be an opt-OUT (bool("false")
    is True in Python — the old parse turned it into a destructive
    execute), and an empty typed value is a usage error, not a
    literal True that TypeErrors later."""
    from iceberg_tools_spark.iceberg.cli_tools import _parse_flags
    from iceberg_tools_spark.__main__ import main

    flags, args = _parse_flags(
        ["--execute=false", "t"], {"execute": bool, "retention-ms": int}
    )
    assert flags == {"execute": False} and args == ["t"]
    flags, _ = _parse_flags(["--execute=true"], {"execute": bool})
    assert flags == {"execute": True}
    flags, _ = _parse_flags(["--execute"], {"execute": bool})
    assert flags == {"execute": True}
    with pytest.raises(ValueError, match="true/false"):
        _parse_flags(["--execute=maybe"], {"execute": bool})
    with pytest.raises(ValueError, match="requires a value"):
        _parse_flags(["--retention-ms="], {"retention-ms": int})

    # end-to-end: --execute=false stays a dry run
    root = str(tmp_path / "t")
    _base_table(root)
    stray = _write(root, "stray.parquet", [9], mtime_ms=NOW - 10 * DAY)
    assert main(["delta-vacuum", f"--now-ms={NOW}", "--execute=false",
                 root]) == 0
    head = json.loads(capsys.readouterr().out.splitlines()[0])
    assert head["dry_run"] is True and os.path.exists(stray)
    # and an empty typed flag is a reported usage error, exit 1
    assert main(["delta-vacuum", "--retention-ms=", root]) == 1
