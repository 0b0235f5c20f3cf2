"""Delta TYPE WIDENING reads (PROTOCOL.md "Type Widening", VERDICT
r13 #4): the log's widened schema is the read schema, so narrower
pre-widening footers upcast inside Spark's parquet scan — no footer
inference, no file rewrite. Composes with time travel (each version
reads with ITS schema), CDF (the range reads with the end version's
schema) and deletion vectors on pre-widening files."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.sources.delta_log import (
    append_delta_commit,
    check_reader_support,
    commit_delta_dv,
    read_delta_cdf,
    read_delta_log,
    replay_log,
)


def _schema_json(id_t, score_t, changes=None):
    md = {"delta.typeChanges": changes} if changes else {}
    return json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": id_t, "nullable": True, "metadata": md},
        {"name": "score", "type": score_t, "nullable": True, "metadata": {}},
    ]})


def _meta(s):
    return {"metaData": {
        "id": "tw", "format": {"provider": "parquet", "options": {}},
        "schemaString": s, "partitionColumns": [],
        "configuration": {}, "createdTime": 0,
    }}


def _widened_table(root: str) -> None:
    """v0: int/float schema + narrow.parquet (int32/float32 footers);
    v1: ALTER COLUMN TYPE to long/double (metaData only);
    v2: wide.parquet written wide (int64/float64 footers)."""
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(
        pa.table({
            "id": pa.array(range(10), pa.int32()),
            "score": pa.array([v / 2 for v in range(10)], pa.float32()),
        }),
        os.path.join(root, "narrow.parquet"),
    )
    append_delta_commit(root, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        _meta(_schema_json("integer", "float")),
        {"add": {"path": "narrow.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    append_delta_commit(root, [
        _meta(_schema_json(
            "long", "double",
            changes=[{"fromType": "integer", "toType": "long",
                      "tableVersion": 1}],
        )),
    ], checkpoint_interval=None)
    pq.write_table(
        pa.table({
            "id": pa.array(range(10, 15), pa.int64()),
            "score": pa.array([v / 2 for v in range(10, 15)], pa.float64()),
        }),
        os.path.join(root, "wide.parquet"),
    )
    append_delta_commit(root, [
        {"add": {"path": "wide.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)


def test_head_read_widens_narrow_footers(spark, tmp_path):
    root = str(tmp_path / "t")
    _widened_table(root)
    df = read_delta_log(spark, root)
    assert dict(df.dtypes) == {"id": "bigint", "score": "double"}
    rows = sorted((r["id"], r["score"]) for r in df.collect())
    assert rows == [(v, v / 2) for v in range(15)]


def test_time_travel_reads_each_versions_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    _widened_table(root)
    v0 = read_delta_log(spark, root, 0)
    assert dict(v0.dtypes) == {"id": "int", "score": "float"}
    assert sorted(r["id"] for r in v0.collect()) == list(range(10))
    v1 = read_delta_log(spark, root, 1)  # widened schema, same file
    assert dict(v1.dtypes) == {"id": "bigint", "score": "double"}


def test_dv_on_pre_widening_file(spark, tmp_path):
    root = str(tmp_path / "t")
    _widened_table(root)
    commit_delta_dv(root, {"narrow.parquet": [2, 3]},
                    checkpoint_interval=None)
    df = read_delta_log(spark, root)
    assert sorted(r["id"] for r in df.collect()) == [
        v for v in range(15) if v not in (2, 3)
    ]


def test_cdf_across_widening_reads_end_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    _widened_table(root)
    cdf = read_delta_cdf(spark, root, 0, 2)
    assert dict((n, t) for n, t in cdf.dtypes
                if n in ("id", "score")) == {"id": "bigint",
                                             "score": "double"}
    inserts = sorted(r["id"] for r in cdf.collect())
    assert inserts == list(range(15))


def test_feature_gate_accepts_widening_rejects_unknown(tmp_path):
    root = str(tmp_path / "t")
    _widened_table(root)
    _, meta, v = replay_log(root)
    check_reader_support(root, v, proto=meta["__protocol__"])  # no raise
    # the preview name is accepted too; a genuinely unknown feature
    # still fails loudly
    for feats, ok in ((["typeWidening-preview"], True),
                      (["unknownFutureFeature"], False)):
        proto = {"minReaderVersion": 3, "minWriterVersion": 7,
                 "readerFeatures": feats}
        if ok:
            check_reader_support(root, v, proto=proto)
        else:
            with pytest.raises(ValueError, match="unsupported reader"):
                check_reader_support(root, v, proto=proto)
