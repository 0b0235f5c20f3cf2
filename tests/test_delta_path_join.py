"""The scan-path ↔ log-path join contract (VERDICT r11 #1).

Every Delta read-path join in ``sources/delta_log.py`` is keyed on
``_scan_path_col()`` (the scan side) against ``_strip_scheme()`` of a
log-derived absolute path (the log side). Round 11 shipped a scheme
regex requiring ``://`` while this Spark build renders local scan
paths as ``file:/abs/path`` (single slash) — so every join missed,
DV-deleted rows resurrected, CDF read empty, and non-hive partition
values came back NULL. These tests pin the contract the way that
would have caught it: against a REAL local scan, not a synthesized
literal."""

from __future__ import annotations

import json
import os

import pytest

from iceberg_tools_spark.sources.delta_log import (
    _scan_path_col,
    _strip_scheme,
    append_delta_commit,
    commit_delta_dv,
    read_delta_cdf,
    read_delta_log,
    write_delta_dv_file,
)


def _schema_string(*fields):
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True, "metadata": {}}
            for n, t in fields
        ],
    })


def _meta_action(schema, part_cols=()):
    return {"metaData": {
        "id": "x", "format": {"provider": "parquet", "options": {}},
        "schemaString": schema, "partitionColumns": list(part_cols),
        "configuration": {}, "createdTime": 0,
    }}


def test_scan_path_col_equals_stripped_log_path(spark, tmp_path):
    """THE missing regression test: on a real local scan, the join
    key `_scan_path_col()` must equal `_strip_scheme()` of the
    os-level absolute path for EVERY row — the exact equality every
    DV / CDF / partition-value join in the module relies on."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    f = tmp_path / "f.parquet"
    pq.write_table(pa.table({"id": pa.array([1, 2, 3], pa.int64())}), f)
    got = {
        r["k"]
        for r in spark.read.parquet(str(f))
        .select(_scan_path_col().alias("k"))
        .collect()
    }
    assert got == {_strip_scheme(os.path.abspath(f))}
    # and the raw rendered path really does carry a scheme the old
    # `://`-only regex would have missed on at least one Spark build
    raw = spark.read.parquet(str(f)).select(
        F.col("_metadata.file_path").alias("p")).first()["p"]
    assert raw != _strip_scheme(raw)


def test_strip_scheme_uri_forms():
    # both local URI renderings normalize to the SAME key as the
    # plain os path — the single-slash form is what this Spark build
    # emits and what r11's `://`-only regex missed
    assert _strip_scheme("file:/tmp/t/f.parquet") == "/tmp/t/f.parquet"
    assert _strip_scheme("file:///tmp/t/f.parquet") == "/tmp/t/f.parquet"
    assert _strip_scheme("/tmp/t/f.parquet") == "/tmp/t/f.parquet"
    # non-local roots strip identically on both sides of the join
    assert _strip_scheme("s3://bucket/tbl/f.parquet") == "bucket/tbl/f.parquet"
    assert _strip_scheme("hdfs://nn:8020/w/f.parquet") == "nn:8020/w/f.parquet"


def test_dv_join_survives_percent_encoded_scan_path(spark, tmp_path):
    """Hadoop's URI rendering percent-encodes specials (space →
    %20) that the log stores raw; the scan side must decode back or
    the DV anti-join misses exactly like the scheme bug did."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t able")  # space lands in every file path
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array(list(range(6)), pa.int64())}),
        os.path.join(root, "f.parquet"),
    )
    append_delta_commit(root, [
        _meta_action(_schema_string(("id", "long"))),
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    commit_delta_dv(root, {"f.parquet": [0, 4]}, checkpoint_interval=None)
    got = sorted(r.id for r in read_delta_log(spark, root).collect())
    assert got == [1, 2, 3, 5]


def test_non_hive_layout_with_dv(spark, tmp_path):
    """The protocol-legal composition r10 flagged and r11 claimed:
    a NON-hive layout (partition values only in the log) whose add
    ALSO carries a deletion vector — partition injection and the DV
    anti-join must both hold on the same scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    for name, ids in [("a.parquet", [0, 1, 2, 3]), ("b.parquet", [10, 11])]:
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            os.path.join(root, name),
        )
    desc = write_delta_dv_file(root, {"a.parquet": [1, 3]})["a.parquet"]
    append_delta_commit(root, [
        _meta_action(_schema_string(("id", "long")), part_cols=["cat"]),
        {"add": {"path": "a.parquet", "partitionValues": {"cat": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": desc}},
        {"add": {"path": "b.parquet", "partitionValues": {"cat": "y"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    rows = {(r["id"], r["cat"]) for r in read_delta_log(spark, root).collect()}
    assert rows == {(0, "x"), (2, "x"), (10, "y"), (11, "y")}


def _three_version_table(root):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, "_delta_log"))
    for v, ids in enumerate([[1, 2], [3], [4]]):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            os.path.join(root, f"f{v}.parquet"),
        )
        acts = [_meta_action(_schema_string(("id", "long")))] if v == 0 else []
        acts.append({"add": {
            "path": f"f{v}.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
        }})
        # checkpoint every commit so replay survives the pruned JSON
        append_delta_commit(root, acts, checkpoint_interval=1)


def test_cdf_missing_commit_names_earliest_readable(spark, tmp_path):
    """VERDICT r10 #7's guided error, untested in r11: a CDF range
    reaching past the retained JSON commits raises naming the
    earliest READABLE version so a consumer can resume."""
    root = str(tmp_path / "t")
    _three_version_table(root)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    # state replay still works through the checkpoint…
    assert read_delta_log(spark, root).count() == 4
    # …but CDF from the pruned version names where to resume
    with pytest.raises(ValueError, match="earliest readable version is 1"):
        read_delta_cdf(spark, root, 0)
    # resuming at the advertised version works
    got = {r._commit_version for r in read_delta_cdf(spark, root, 1).collect()}
    assert got == {1, 2}


def test_cdf_reconstruction_is_dv_aware(spark, tmp_path):
    """ADVICE r10's DV-aware reconstruction, untested in r11: an add
    carrying a deletionVector in a data-changing commit reports only
    its LIVE rows as inserts, and a remove carrying the DV the file
    had when dropped reports only the still-live rows as deletes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array(list(range(5)), pa.int64())}),
        os.path.join(root, "f.parquet"),
    )
    desc = write_delta_dv_file(root, {"f.parquet": [1, 3]})["f.parquet"]
    add = {"path": "f.parquet", "partitionValues": {}, "size": 1,
           "modificationTime": 0, "dataChange": True, "deletionVector": desc}
    append_delta_commit(root, [
        _meta_action(_schema_string(("id", "long"))),
        {"add": {**add}},
    ], checkpoint_interval=None)
    ins = read_delta_cdf(spark, root, 0, 0)
    assert sorted(r.id for r in ins.collect()) == [0, 2, 4]
    assert {r._change_type for r in ins.collect()} == {"insert"}
    # drop the file: the remove carries the DV it died with
    append_delta_commit(root, [
        {"remove": {"path": "f.parquet", "deletionTimestamp": 0,
                    "dataChange": True, "deletionVector": desc}},
        {"commitInfo": {"operation": "DELETE", "timestamp": 0}},
    ], checkpoint_interval=None)
    dels = read_delta_cdf(spark, root, 1, 1)
    assert sorted(r.id for r in dels.collect()) == [0, 2, 4]
    assert {r._change_type for r in dels.collect()} == {"delete"}


def test_cdf_reconstruction_mixed_physical_partition_columns(spark, tmp_path):
    """ADVICE r11: one file physically carries the partition column,
    the other takes it from the log — the merged single-scan
    reconstruction must not sample one file's schema and null the
    rest. Physical value wins per-cell; the log's partitionValues
    fill the gap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "cat": pa.array(["x", "x"])}),
        os.path.join(root, "a.parquet"),
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64())}),
        os.path.join(root, "b.parquet"),
    )
    append_delta_commit(root, [
        _meta_action(_schema_string(("id", "long"), ("cat", "string")),
                     part_cols=["cat"]),
        {"add": {"path": "a.parquet", "partitionValues": {"cat": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    append_delta_commit(root, [
        {"add": {"path": "b.parquet", "partitionValues": {"cat": "y"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    cdf = read_delta_cdf(spark, root, 0, 1)
    got = sorted((r.id, r.cat, r._commit_version) for r in cdf.collect())
    assert got == [(1, "x", 0), (2, "x", 0), (3, "y", 1)]
