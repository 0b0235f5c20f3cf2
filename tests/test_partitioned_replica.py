"""Partitioned Iceberg→Delta replicas (VERDICT r12 #7): identity
partition layout carries into the replica's partitionValues, and
Delta-side consumers prune on the LOG — the plan contract that makes
the replica useful at 100 TB, not just byte-equal."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.iceberg.commit import append_snapshot, create_table
from iceberg_tools_spark.sources.delta_log import read_delta_log, replay_log
from iceberg_tools_spark.sources.migrate import replicate_iceberg_to_delta

NOW = 1_700_000_001_000


def _partitioned_source(work: str) -> str:
    """Iceberg table partitioned by identity(cat): 3 snapshots, two
    files per cat across them."""
    ice_root = os.path.join(work, "ice")
    os.makedirs(ice_root)
    mp = create_table(
        ice_root,
        [("id", "long"), ("cat", "string")],
        partition_by=[("cat", "identity", "cat")],
    )
    n = 0
    for snap in range(3):
        files = []
        for cat in ("x", "y"):
            rel = f"data/cat={cat}/f{snap}.parquet"
            os.makedirs(os.path.dirname(os.path.join(ice_root, rel)),
                        exist_ok=True)
            ids = list(range(n, n + 4))
            n += 4
            pq.write_table(
                pa.table({
                    "id": pa.array(ids, pa.int64()),
                    "cat": pa.array([cat] * 4, pa.string()),
                }),
                os.path.join(ice_root, rel),
            )
            files.append({"path": rel, "partition": {"cat": cat}})
        mp = append_snapshot(mp, files)["metadata_path"]
    return mp


def test_partitioned_replica_layout_and_equality(spark, tmp_path):
    work = str(tmp_path)
    mp = _partitioned_source(work)
    tgt = os.path.join(work, "delta")
    res = replicate_iceberg_to_delta(spark, mp, tgt, now_ms=NOW)
    assert res["n_versions"] == 3
    adds, meta, _ = replay_log(tgt)
    assert meta["partitionColumns"] == ["cat"]
    assert all(a["partitionValues"].get("cat") in ("x", "y") for a in adds)
    # rows equal an unpartitioned replica of the same source
    tgt2 = os.path.join(work, "delta_flat")
    replicate_iceberg_to_delta(spark, mp, tgt2, now_ms=NOW, partition_by=())
    cols = ["id", "cat"]
    got = sorted(map(tuple, read_delta_log(spark, tgt).select(*cols).collect()))
    flat = sorted(map(tuple, read_delta_log(spark, tgt2).select(*cols).collect()))
    assert got == flat and len(got) == 24


def test_partition_filter_prunes_scan(spark, tmp_path):
    """The plan contract: a partition_filter read opens ONLY the
    matching partition's files (log-level pruning, the real Delta
    scan model)."""
    work = str(tmp_path)
    mp = _partitioned_source(work)
    tgt = os.path.join(work, "delta")
    replicate_iceberg_to_delta(spark, mp, tgt, now_ms=NOW)
    adds, _, _ = replay_log(tgt)
    x_files = [a for a in adds if a["partitionValues"]["cat"] == "x"]
    df = read_delta_log(spark, tgt, partition_filter={"cat": "x"})
    assert sorted(os.path.basename(p) for p in df.inputFiles()) == sorted(
        os.path.basename(a["path"]) for a in x_files
    )
    rows = sorted((r["id"], r["cat"]) for r in df.collect())
    assert all(c == "x" for _i, c in rows) and len(rows) == 12
    # guided error for an UNKNOWN column; an empty PARTITION is a
    # legitimate result, not an error (ADVICE r13 low): empty frame
    # with the table's logical schema
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta_log(spark, tgt, partition_filter={"ghost": "1"})
    empty = read_delta_log(spark, tgt, partition_filter={"cat": "zzz"})
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["id", "cat"]


def test_partitioned_replica_dv_keeps_partition_values(spark, tmp_path):
    """A positional delete maps to a Delta DV on the partitioned
    replica: the re-add keeps its partitionValues and the pruned
    read composes with merge-on-read."""
    from iceberg_tools_spark.iceberg.dml import delete_where

    work = str(tmp_path)
    mp = _partitioned_source(work)
    # positional delete of two ids inside cat=x (position-expressible)
    ice_root = os.path.dirname(os.path.dirname(mp))  # <root>/metadata/v1...
    mp = delete_where(spark, mp, "id IN (0, 1)", base_dir=ice_root)[
        "metadata_path"
    ]
    tgt = os.path.join(work, "delta")
    replicate_iceberg_to_delta(spark, mp, tgt, now_ms=NOW)
    adds, _, _ = replay_log(tgt)
    dv_adds = [a for a in adds if a.get("deletionVector")]
    assert dv_adds and all(
        a["partitionValues"].get("cat") == "x" for a in dv_adds
    )
    df = read_delta_log(spark, tgt, partition_filter={"cat": "x"})
    assert sorted(r["id"] for r in df.collect()) == sorted(
        i for i in range(0, 24) if i % 8 < 4 and i not in (0, 1)
    )


def test_date_partition_values_serialize_per_spec(spark, tmp_path):
    """Iceberg stores identity date partitions as raw int days; the
    replica's partitionValues must carry Delta's spec serialization
    ('2022-01-08', not '19000') so FOREIGN Delta readers that take
    column values from the log read real dates (ADVICE r13 low)."""
    import datetime as dt

    work = str(tmp_path)
    ice_root = os.path.join(work, "ice")
    os.makedirs(ice_root)
    mp = create_table(
        ice_root,
        [("id", "long"), ("d", "date")],
        partition_by=[("d", "identity", "d")],
    )
    days = 19000  # 1970-01-01 + 19000 days
    iso = (dt.date(1970, 1, 1) + dt.timedelta(days=days)).isoformat()
    rel = f"data/d={iso}/f0.parquet"
    os.makedirs(os.path.dirname(os.path.join(ice_root, rel)), exist_ok=True)
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "d": pa.array([dt.date(1970, 1, 1) + dt.timedelta(days=days)] * 2,
                          pa.date32()),
        }),
        os.path.join(ice_root, rel),
    )
    mp = append_snapshot(mp, [{"path": rel, "partition": {"d": days}}])[
        "metadata_path"
    ]
    tgt = os.path.join(work, "delta")
    replicate_iceberg_to_delta(spark, mp, tgt, now_ms=NOW)
    adds, meta, _ = replay_log(tgt)
    assert meta["partitionColumns"] == ["d"]
    assert [a["partitionValues"]["d"] for a in adds] == [iso]
    # and the pruned read resolves the spec-serialized value
    df = read_delta_log(spark, tgt, partition_filter={"d": iso})
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_partition_by_rejects_non_identity(spark, tmp_path):
    work = str(tmp_path)
    mp = _partitioned_source(work)
    with pytest.raises(ValueError, match="identity"):
        replicate_iceberg_to_delta(
            spark, mp, os.path.join(work, "t"), now_ms=NOW,
            partition_by=("id",),
        )


def test_partition_filter_under_column_mapping(spark, tmp_path):
    """Log-level pruning composes with column mapping: the filter is
    by LOGICAL name, the partitionValues keys are PHYSICAL."""
    import json

    from iceberg_tools_spark.sources.delta_log import append_delta_commit

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    fields = [
        {"name": "id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "cat", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb"}},
    ]
    for i, cat in enumerate(("x", "y")):
        pq.write_table(
            pa.table({"col-aaa": pa.array([i * 10, i * 10 + 1], pa.int64())}),
            os.path.join(root, f"f{i}.parquet"),
        )
    append_delta_commit(root, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "cmpf", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": ["cat"],
            "configuration": {"delta.columnMapping.mode": "name"},
            "createdTime": 0,
        }},
        {"add": {"path": "f0.parquet", "partitionValues": {"col-bbb": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "f1.parquet", "partitionValues": {"col-bbb": "y"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    df = read_delta_log(spark, root, partition_filter={"cat": "y"})
    assert [os.path.basename(p) for p in df.inputFiles()] == ["f1.parquet"]
    assert sorted((r["id"], r["cat"]) for r in df.collect()) == \
        [(10, "y"), (11, "y")]


def test_date_partitioned_delta_replicates_to_iceberg(spark, tmp_path):
    """The OTHER direction (review r14): a Delta source with
    date+long identity partitions replicates full-fidelity into
    Iceberg — partitionValues strings convert to the manifests' raw
    forms (int days / long), the Avro partition encoder accepts
    them, and the round trip back to Delta re-serializes per spec."""
    import datetime as dt

    import pyspark.sql.functions as F

    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.sources.delta_log import append_delta_commit
    from iceberg_tools_spark.sources.migrate import (
        replicate_delta_versions,
        replicate_iceberg_to_delta,
    )

    root = str(tmp_path / "delta_src")
    os.makedirs(os.path.join(root, "_delta_log"))
    iso = "2022-01-08"
    days = (dt.date.fromisoformat(iso) - dt.date(1970, 1, 1)).days
    import json as _json

    schema = _json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "d", "type": "date", "nullable": True, "metadata": {}},
        {"name": "bucket", "type": "long", "nullable": True, "metadata": {}},
    ]})
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "d": pa.array([dt.date.fromisoformat(iso)] * 2, pa.date32()),
            "bucket": pa.array([7, 7], pa.int64()),
        }),
        os.path.join(root, "f0.parquet"),
    )
    append_delta_commit(root, [
        {"metaData": {
            "id": "dp", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": ["d", "bucket"],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "f0.parquet",
                 "partitionValues": {"d": iso, "bucket": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)

    ice = str(tmp_path / "ice")
    res = replicate_delta_versions(spark, root, ice)
    from iceberg_tools_spark.iceberg.metadata import parse_metadata

    meta = parse_metadata(res["metadata_path"])
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at

    data, _dels = mor_entries_at(
        meta, meta.raw["current-snapshot-id"], os.path.dirname(ice + "/x")
    )
    # manifests carry the RAW forms
    assert data[0]["partition"] == {"d": days, "bucket": 7}
    got = sorted(map(tuple, read_mor(
        spark, res["metadata_path"], meta.raw["current-snapshot-id"]
    ).select("id", "d", "bucket").collect()))
    assert got == [(1, dt.date.fromisoformat(iso), 7),
                   (2, dt.date.fromisoformat(iso), 7)]

    # ...and back: the Iceberg→Delta writer re-serializes per spec
    back = str(tmp_path / "back")
    replicate_iceberg_to_delta(spark, res["metadata_path"], back,
                               now_ms=1700000001000)
    from iceberg_tools_spark.sources.delta_log import replay_log

    adds, meta_b, _ = replay_log(back)
    assert [a["partitionValues"] for a in adds] == [{"d": iso, "bucket": "7"}]
