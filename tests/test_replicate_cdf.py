"""CDF-driven Delta → Iceberg replication (VERDICT r10 #6 / r11 #7):
a DML-heavy source replicates at changelog cost, and the replica
agrees with the file-copying full-fidelity path at EVERY version."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.iceberg.deletes import read_mor
from iceberg_tools_spark.sources.delta_log import (
    append_delta_commit,
    commit_delta_dv,
    read_delta_log,
)
from iceberg_tools_spark.sources.migrate import (
    replicate_delta_cdf,
    replicate_delta_versions,
)


def _dml_heavy_source(root: str) -> int:
    """v0 append (2 files), v1 CDF-emitting DV delete, v2 append,
    v3 remove of a file, v4 second DV delete overlapping the first.
    Returns the head version."""
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "cat", "type": "string", "nullable": True, "metadata": {}},
    ]})
    def write(name, ids, cat):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "cat": pa.array([cat] * len(ids))}),
            os.path.join(root, name),
        )
    write("a.parquet", range(10), "x")
    write("b.parquet", range(100, 105), "y")
    append_delta_commit(root, [
        {"metaData": {
            "id": "src", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    commit_delta_dv(root, {"a.parquet": [1, 3]}, checkpoint_interval=None,
                    write_cdf=True)
    write("c.parquet", range(200, 203), "z")
    append_delta_commit(root, [
        {"add": {"path": "c.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    append_delta_commit(root, [
        {"remove": {"path": "b.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"commitInfo": {"operation": "DELETE", "timestamp": 0}},
    ], checkpoint_interval=None)
    commit_delta_dv(root, {"a.parquet": [3, 7]}, checkpoint_interval=None,
                    write_cdf=True)
    return 4


def test_cdf_replica_equals_full_fidelity_replica_every_version(spark, tmp_path):
    src = str(tmp_path / "src")
    head = _dml_heavy_source(src)
    full = replicate_delta_versions(spark, src, str(tmp_path / "full"))
    cdf = replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    assert cdf["head_delta_version"] == full["head_delta_version"] == head
    assert cdf["n_snapshots"] == head + 1  # every version changed rows
    cols = ["id", "cat"]
    for v in range(head + 1):
        want = sorted(map(tuple, read_delta_log(spark, src, v)
                          .select(*cols).collect()))
        got_full = sorted(map(tuple, read_mor(
            spark, full["metadata_path"], 8000 + v).select(*cols).collect()))
        got_cdf = sorted(map(tuple, read_mor(
            spark, cdf["metadata_path"], 8000 + v).select(*cols).collect()))
        assert got_cdf == want == got_full, f"version {v} diverged"


def test_cdf_replication_moves_changed_rows_not_files(spark, tmp_path):
    """The cost model the capstone exists for: the v1 DV delete of 2
    rows lands as an equality-delete file of exactly 2 rows — not a
    rewritten or re-copied 10-row data file."""
    src = str(tmp_path / "src")
    _dml_heavy_source(src)
    res = replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    tgt = res["table_root"]
    del_dir = os.path.join(tgt, "data", "deletes")
    del_rows = {
        f: pq.read_metadata(os.path.join(del_dir, f)).num_rows
        for f in sorted(os.listdir(del_dir))
    }
    # v1 deletes rows [1,3]; v3 drops b.parquet (5 live rows); v4
    # newly deletes row 7 only (3 was already dead)
    assert sorted(del_rows.values()) == [1, 2, 5]
    # and inserts total exactly the source's inserted row count
    ins_rows = sum(
        pq.read_metadata(os.path.join(tgt, "data", f)).num_rows
        for f in os.listdir(os.path.join(tgt, "data"))
        if f.endswith(".parquet")
    )
    assert ins_rows == 10 + 5 + 3


def test_cdf_replication_skips_metadata_only_versions(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(os.path.join(src, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}),
                   os.path.join(src, "f.parquet"))
    append_delta_commit(src, [
        {"metaData": {
            "id": "src", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    # v1: a pure-metadata commit (no file actions) is silent
    append_delta_commit(src, [
        {"commitInfo": {"operation": "SET TBLPROPERTIES", "timestamp": 0}},
    ], checkpoint_interval=None)
    # v2: a DV delete WITHOUT a cdc file reads through reconstruction
    # (its remove+re-add pair is dataChange-true per upstream) and
    # MUST land in the replica — ADVICE r12's invisibility bug
    commit_delta_dv(src, {"f.parquet": [0]}, checkpoint_interval=None,
                    write_cdf=False)
    res = replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    assert res["n_versions"] == 3 and res["n_snapshots"] == 2
    got = sorted(r.id for r in read_mor(
        spark, res["metadata_path"], 8000).collect())
    assert got == [1, 2]
    got = sorted(r.id for r in read_mor(
        spark, res["metadata_path"], 8002).collect())
    assert got == [2]


def test_cdf_stream_replica_equals_batch_replica(spark, tmp_path):
    """The streaming CDC apply (foreachBatch, one commit per Delta
    version, exactly-once summary props) lands the same replica as
    the batch applier — deletes included."""
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.sources.delta_log import read_delta_cdf
    from iceberg_tools_spark.sources.migrate import replicate_delta_cdf_stream

    src = str(tmp_path / "src")
    head = _dml_heavy_source(src)
    batch = replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    res = replicate_delta_cdf_stream(
        spark, src, str(tmp_path / "stream"), 0, head, str(tmp_path / "work")
    )
    assert res["n_batches"] == head + 1
    assert res["batches_committed"] == list(range(head + 1))
    cols = ["id", "cat"]
    want = sorted(map(tuple, read_mor(
        spark, batch["metadata_path"], 8000 + head).select(*cols).collect()))
    meta = parse_metadata(res["metadata_path"])
    got = sorted(map(tuple, read_mor(
        spark, res["metadata_path"], meta.raw["current-snapshot-id"]
    ).select(*cols).collect()))
    assert got == want
    # source head too — the full three-way agreement
    src_rows = sorted(map(tuple, read_delta_log(spark, src, head)
                          .select(*cols).collect()))
    assert got == src_rows
    # exactly-once: replaying an already-committed batch id SKIPS
    n_snaps = len(meta.raw["snapshots"])
    res["apply_batch"](read_delta_cdf(spark, src, 1, 1), 1)
    meta2 = parse_metadata(res["metadata_path"])
    assert len(meta2.raw["snapshots"]) == n_snaps


def test_cdf_replication_key_columns(spark, tmp_path):
    """A declared row identity: deletes match on key_columns only,
    so a source whose NON-key columns repeat across rows still
    replicates correctly (the all-columns default would also work
    here, but the key-scoped equality_ids are what land in the
    replica's delete files)."""
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    src = str(tmp_path / "src")
    head = _dml_heavy_source(src)
    res = replicate_delta_cdf(
        spark, src, str(tmp_path / "cdf"), key_columns=["id"]
    )
    cols = ["id", "cat"]
    for v in range(head + 1):
        want = sorted(map(tuple, read_delta_log(spark, src, v)
                          .select(*cols).collect()))
        got = sorted(map(tuple, read_mor(
            spark, res["metadata_path"], 8000 + v).select(*cols).collect()))
        assert got == want, f"version {v} diverged"
    # the committed equality_ids are the KEY subset (field id 1)
    meta = parse_metadata(res["metadata_path"])
    _, dels = mor_entries_at(
        meta, meta.raw["current-snapshot-id"],
        os.path.dirname(res["metadata_path"]),
    )
    assert dels and all(e["equality_ids"] == [1] for e in dels)
    # unknown key column: guided error
    with pytest.raises(ValueError, match="key_columns"):
        replicate_delta_cdf(
            spark, src, str(tmp_path / "cdf2"), key_columns=["ghost"]
        )


def _update_carrying_source(root: str) -> int:
    """v0 append of ids 0..4, v1 an UPDATE (id 2 → 12) as a real
    Delta writer commits it: rewritten data file + an explicit cdc
    file carrying update_preimage / update_postimage rows. Returns
    the head version."""
    from iceberg_tools_spark.sources.delta_log import write_delta_cdf_file

    os.makedirs(os.path.join(root, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "cat", "type": "string", "nullable": True, "metadata": {}},
    ]})
    def write(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "cat": pa.array(["x"] * len(ids))}),
            os.path.join(root, name),
        )
    write("a.parquet", range(5))
    append_delta_commit(root, [
        {"metaData": {
            "id": "src", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    write("a2.parquet", [0, 1, 12, 3, 4])
    cdc_action = write_delta_cdf_file(root, 1, pa.table({
        "id": pa.array([2, 12], pa.int64()),
        "cat": pa.array(["x", "x"]),
        "_change_type": pa.array(["update_preimage", "update_postimage"]),
    }))
    append_delta_commit(root, [
        cdc_action,
        {"remove": {"path": "a.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": {"path": "a2.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"commitInfo": {"operation": "UPDATE", "timestamp": 0}},
    ], checkpoint_interval=None)
    return 1


def test_cdf_consumers_fold_update_rows(spark, tmp_path):
    """ADVICE r12: update_postimage folds as insert and
    update_preimage as delete in the CDF replica, the streaming
    replica, and the cross-format IVM — the old isin filter silently
    dropped both and an UPDATE-carrying source diverged."""
    from iceberg_tools_spark.iceberg.ivm import grouped_agg
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.sources.migrate import (
        delta_grouped_ivm,
        replicate_delta_cdf_stream,
    )

    src = str(tmp_path / "src")
    head = _update_carrying_source(src)
    want = sorted(map(tuple, read_delta_log(spark, src, head)
                      .select("id", "cat").collect()))
    assert sorted(t[0] for t in want) == [0, 1, 3, 4, 12]

    res = replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    got = sorted(map(tuple, read_mor(
        spark, res["metadata_path"], 8000 + head)
        .select("id", "cat").collect()))
    assert got == want

    sres = replicate_delta_cdf_stream(
        spark, src, str(tmp_path / "stream"), 0, head, str(tmp_path / "work")
    )
    meta = parse_metadata(sres["metadata_path"])
    got_s = sorted(map(tuple, read_mor(
        spark, sres["metadata_path"], meta.raw["current-snapshot-id"]
    ).select("id", "cat").collect()))
    assert got_s == want

    got_ivm = sorted(map(tuple, delta_grouped_ivm(
        spark, src, ["cat"], ["id"]).collect()))
    want_ivm = sorted(map(tuple, grouped_agg(
        read_delta_log(spark, src, head), ["cat"], ["id"]).collect()))
    assert got_ivm == want_ivm


def test_cdf_consumers_raise_on_unknown_change_type(spark, tmp_path):
    """An unrecognized _change_type must fail the fold loudly, not
    vanish from the replica."""
    from iceberg_tools_spark.sources.delta_log import write_delta_cdf_file

    src = str(tmp_path / "src")
    os.makedirs(os.path.join(src, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                   os.path.join(src, "f.parquet"))
    append_delta_commit(src, [
        {"metaData": {
            "id": "src", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    cdc_action = write_delta_cdf_file(src, 1, pa.table({
        "id": pa.array([9], pa.int64()),
        "_change_type": pa.array(["mutate"]),
    }))
    append_delta_commit(src, [cdc_action], checkpoint_interval=None)
    with pytest.raises(Exception, match="unhandled _change_type"):
        replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))


def test_cdf_replication_refuses_cleaned_log(spark, tmp_path):
    """ADVICE r12: a checkpointed table whose early commits were
    cleaned must refuse CDF replication (the checkpointed state would
    silently be missing from the replica) with the guided error."""
    src = str(tmp_path / "src")
    _dml_heavy_source(src)
    from iceberg_tools_spark.sources.delta_log import write_delta_checkpoint

    write_delta_checkpoint(src)
    os.remove(os.path.join(src, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="earliest readable version"):
        replicate_delta_cdf(spark, src, str(tmp_path / "cdf"))
    # the full-fidelity path owes the same refusal (same bug class)
    with pytest.raises(ValueError, match="earliest readable version"):
        replicate_delta_versions(spark, src, str(tmp_path / "full2"))


def test_delta_grouped_ivm_equals_recompute_every_version(spark, tmp_path):
    """Cross-format IVM: the CDF-maintained COUNT/SUM state equals a
    full recompute at EVERY version of the DML-heavy source."""
    from iceberg_tools_spark.iceberg.ivm import grouped_agg
    from iceberg_tools_spark.sources.migrate import delta_grouped_ivm

    src = str(tmp_path / "src")
    head = _dml_heavy_source(src)
    for v in range(head + 1):
        got = sorted(map(tuple, delta_grouped_ivm(
            spark, src, ["cat"], ["id"], to_version=v).collect()))
        want = sorted(map(tuple, grouped_agg(
            read_delta_log(spark, src, v), ["cat"], ["id"]).collect()))
        assert got == want, f"version {v} diverged"


def test_delta_grouped_ivm_minmax_recomputes_from_time_travel(spark, tmp_path):
    """A DV delete of the current group MIN forces the non-
    incrementable path: the affected group recomputes from the DELTA
    table read AT that version — cross-format time travel feeding
    the Iceberg IVM kernel."""
    from iceberg_tools_spark.iceberg.ivm import grouped_agg
    from iceberg_tools_spark.sources.migrate import delta_grouped_ivm

    src = str(tmp_path / "src")
    _dml_heavy_source(src)  # v1 DV-deletes positions 1,3 of a (ids 1,3)
    got = sorted(map(tuple, delta_grouped_ivm(
        spark, src, ["cat"], ["id"], mins=["id"], maxs=["id"],
        to_version=1).collect()))
    want = sorted(map(tuple, grouped_agg(
        read_delta_log(spark, src, 1), ["cat"], ["id"],
        ["id"], ["id"]).collect()))
    assert got == want
    # the x-group min moved off a deleted value: 0 stays the min
    # (position 0 wasn't deleted) but id 1's removal is visible in
    # the count/sum; delete id 0 next and the min must recompute
    from iceberg_tools_spark.sources.delta_log import commit_delta_dv

    commit_delta_dv(src, {"a.parquet": [0]}, checkpoint_interval=None,
                    write_cdf=True)
    head = 5
    got = sorted(map(tuple, delta_grouped_ivm(
        spark, src, ["cat"], ["id"], mins=["id"], maxs=["id"],
        to_version=head).collect()))
    want = sorted(map(tuple, grouped_agg(
        read_delta_log(spark, src, head), ["cat"], ["id"],
        ["id"], ["id"]).collect()))
    assert got == want
