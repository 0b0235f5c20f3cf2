"""Delta SOURCE schema evolution (r13): the read schema comes from
the LOG's schemaString, so ranges spanning ADD/DROP COLUMN read
uniformly — pre-evolution files serve added columns as null, dropped
columns vanish — and the downstream consumers (incremental stream,
CDF, both replication directions) inherit it."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_tools_spark.sources.delta_log import (
    append_delta_commit,
    read_delta_cdf,
    read_delta_log,
)

S1 = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True, "metadata": {}}]})
S2 = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True, "metadata": {}},
    {"name": "cat", "type": "string", "nullable": True, "metadata": {}}]})


def _meta(schema):
    return {"metaData": {
        "id": "evo", "format": {"provider": "parquet", "options": {}},
        "schemaString": schema, "partitionColumns": [],
        "configuration": {}, "createdTime": 0,
    }}


def _evolving_source(root: str) -> None:
    """v0: add a.parquet (id only); v1: ADD COLUMN cat + b.parquet
    carrying it."""
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}),
                   os.path.join(root, "a.parquet"))
    append_delta_commit(root, [
        _meta(S1),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    pq.write_table(pa.table({"id": pa.array([3], pa.int64()),
                             "cat": pa.array(["x"])}),
                   os.path.join(root, "b.parquet"))
    append_delta_commit(root, [
        _meta(S2),
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)


def test_read_spans_add_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _evolving_source(root)
    df = read_delta_log(spark, root)
    assert df.columns == ["id", "cat"]
    rows = sorted((r["id"], r["cat"]) for r in df.collect())
    assert rows == [(1, None), (2, None), (3, "x")]
    # time travel BEFORE the evolution serves the v0 schema
    df0 = read_delta_log(spark, root, 0)
    assert df0.columns == ["id"]
    assert sorted(r["id"] for r in df0.collect()) == [1, 2]


def test_read_spans_drop_column(spark, tmp_path):
    """A dropped column vanishes even though old files still carry
    it physically — the log schema is the truth."""
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(pa.table({"id": pa.array([1], pa.int64()),
                             "cat": pa.array(["x"])}),
                   os.path.join(root, "a.parquet"))
    append_delta_commit(root, [
        _meta(S2),
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    append_delta_commit(root, [_meta(S1)], checkpoint_interval=None)
    df = read_delta_log(spark, root)
    assert df.columns == ["id"]
    assert [r["id"] for r in df.collect()] == [1]


def test_incremental_stream_spans_evolution(spark, tmp_path):
    from iceberg_tools_spark.sources.delta_log import (
        delta_incremental_stream,
    )
    from iceberg_tools_spark.streaming.jobs import run_to_memory

    root = str(tmp_path / "t")
    _evolving_source(root)
    stream, n = delta_incremental_stream(
        spark, root, -1, 1, str(tmp_path / "stage")
    )
    assert n == 2
    rows = sorted(
        (r["id"], r["cat"], r["_delta_version"])
        for r in run_to_memory(stream, "evo_inc").collect()
    )
    assert rows == [(1, None, 0), (2, None, 0), (3, "x", 1)]


def test_cdf_and_replications_span_evolution(spark, tmp_path):
    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.sources.delta_log import commit_delta_dv
    from iceberg_tools_spark.sources.migrate import (
        replicate_delta_cdf,
        replicate_delta_versions,
    )

    root = str(tmp_path / "t")
    _evolving_source(root)
    # v2: a CDF-emitting DV delete of a PRE-evolution file — its cdc
    # parquet physically lacks `cat` while the table schema has it
    # (the mixed-schema explicit-cdc case)
    commit_delta_dv(root, {"a.parquet": [0]}, checkpoint_interval=None,
                    write_cdf=True)
    cdf = read_delta_cdf(spark, root, 0, 2)
    got = sorted((r["id"], r["cat"], r["_change_type"],
                  r["_commit_version"]) for r in cdf.collect())
    assert got == [
        (1, None, "delete", 2), (1, None, "insert", 0),
        (2, None, "insert", 0), (3, "x", "insert", 1),
    ]
    want = sorted(map(tuple, read_delta_log(spark, root)
                      .select("id", "cat").collect()))
    assert want == [(2, None), (3, "x")]
    for fn, name in ((replicate_delta_versions, "full"),
                     (replicate_delta_cdf, "cdf")):
        res = fn(spark, root, str(tmp_path / name))
        from iceberg_tools_spark.iceberg.metadata import parse_metadata

        m = parse_metadata(res["metadata_path"])
        rows = sorted(map(tuple, read_mor(
            spark, res["metadata_path"], m.raw["current-snapshot-id"]
        ).select("id", "cat").collect()))
        assert rows == want, name


def test_ivm_seed_before_evolution_is_guided(spark, tmp_path):
    """Cross-format IVM seeded at a version that predates the column
    it aggregates gets a guided error, not an unresolved-column
    crash — and seeding AT the evolution works."""
    import pytest

    from iceberg_tools_spark.iceberg.ivm import grouped_agg
    from iceberg_tools_spark.sources.migrate import delta_grouped_ivm

    root = str(tmp_path / "t")
    _evolving_source(root)
    with pytest.raises(ValueError, match="at or after the schema evolution"):
        delta_grouped_ivm(spark, root, ["cat"], ["id"], from_version=0)
    got = {tuple(r) for r in delta_grouped_ivm(
        spark, root, ["cat"], ["id"], from_version=1).collect()}
    want = {tuple(r) for r in grouped_agg(
        read_delta_log(spark, root), ["cat"], ["id"]).collect()}
    assert got == want and len(want) == 2  # cat null group + 'x'


def test_cdf_stream_spans_evolution(spark, tmp_path):
    """The streaming CDF source across an ADD COLUMN: early
    micro-batches null-fill the added column (the staged-file reader
    takes the head schema) and the stream equals the batch feed."""
    from iceberg_tools_spark.sources.delta_log import (
        commit_delta_dv,
        delta_cdf_stream,
    )
    from iceberg_tools_spark.streaming.jobs import run_to_memory

    root = str(tmp_path / "t")
    _evolving_source(root)
    commit_delta_dv(root, {"a.parquet": [0]}, checkpoint_interval=None,
                    write_cdf=True)
    stream, n = delta_cdf_stream(spark, root, 0, 2, str(tmp_path / "stage"))
    assert n == 3
    got = sorted(
        (r["id"], r["cat"], r["_change_type"], r["_commit_version"])
        for r in run_to_memory(stream, "evo_cdf_stream").collect()
    )
    # the batch comparison uses the RANGE read (head schema); a
    # per-version read at v0 correctly serves the v0 schema instead
    want = sorted(
        (r["id"], r["cat"], r["_change_type"], r["_commit_version"])
        for r in read_delta_cdf(spark, root, 0, 2).collect()
    )
    assert got == want
    assert (1, None, "delete", 2) in got
