"""Delta VARIANT reads (PROTOCOL.md "Variant Data Type", r14): the
schemaString's ``variant`` type parses to Spark's native VariantType
and the parquet layout Delta-on-Spark writers land (the
struct<metadata,value> binary pair under the VARIANT logical
annotation) is Spark's own — so reads, ``variant_get`` extraction,
deletion vectors and CDF compose through the existing log-schema
read path."""

from __future__ import annotations

import json
import os

import pytest

from iceberg_tools_spark.sources.delta_log import (
    _write_variant_file,
    append_delta_commit,
    commit_delta_dv,
    read_delta_cdf,
    read_delta_log,
)


def _variant_table(spark, root: str) -> None:
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "payload", "type": "variant", "nullable": True,
         "metadata": {}},
    ]})
    _write_variant_file(spark, root, "a.parquet", range(10))
    append_delta_commit(root, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["variantType"],
                      "writerFeatures": ["variantType"]}},
        {"metaData": {
            "id": "var", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)


def test_variant_read_and_extraction(spark, tmp_path):
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    _variant_table(spark, root)
    df = read_delta_log(spark, root)
    assert dict(df.dtypes)["payload"] == "variant"
    got = sorted(
        (r["id"], r["a"], r["tag"])
        for r in df.select(
            "id",
            F.try_variant_get("payload", "$.a", "long").alias("a"),
            F.try_variant_get("payload", "$.tag", "string").alias("tag"),
        ).collect()
    )
    assert got == [(i, i, f"t{i % 3}") for i in range(10)]


def test_variant_with_dv_and_cdf_reconstruction(spark, tmp_path):
    """DV merge-on-read composes with variant, and CDF
    RECONSTRUCTION of the DV commit (no explicit cdc file — our toy
    DV writer's pyarrow cdc materialization can't read VARIANT
    footers, so exact-delta cdc stays a real-writer concern) reports
    the net-correct churn with the variant column intact."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    _variant_table(spark, root)
    commit_delta_dv(root, {"a.parquet": [1, 2]}, checkpoint_interval=None)
    df = read_delta_log(spark, root)
    assert sorted(r["id"] for r in df.collect()) == [
        i for i in range(10) if i not in (1, 2)
    ]
    cdf = read_delta_cdf(spark, root, 1, 1)
    dels = cdf.filter("_change_type = 'delete'").select(
        "id", F.try_variant_get("payload", "$.a", "long").alias("a")
    )
    ins = cdf.filter("_change_type = 'insert'")
    # reconstruction: then-live rows (no prior DV) delete, survivors
    # re-insert — net-correct churn, variant extraction working
    assert sorted((r["id"], r["a"]) for r in dels.collect()) == [
        (i, i) for i in range(10)
    ]
    assert sorted(r["id"] for r in ins.collect()) == [
        i for i in range(10) if i not in (1, 2)
    ]


def test_variant_explicit_cdc_file_reads(spark, tmp_path):
    """An explicit ``_change_data`` cdc file carrying a variant
    column — what a REAL variant-writing engine lands — reads
    through the CDF path's log-schema reader."""
    import glob
    import shutil

    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    _variant_table(spark, root)
    # hand-land a Spark-written cdc file for a delete of ids 3,4
    cdc_rel = "_change_data/cdc-0001.parquet"
    tmpdir = str(tmp_path / "cdcpart")
    (
        spark.range(3, 5)
        .select(
            F.col("id"),
            F.parse_json(
                F.concat(F.lit('{"a": '), F.col("id").cast("string"),
                         F.lit(', "tag": "t'), (F.col("id") % 3).cast("string"),
                         F.lit('"}'))
            ).alias("payload"),
            F.lit("delete").alias("_change_type"),
        )
        .coalesce(1)
        .write.parquet(tmpdir)
    )
    os.makedirs(os.path.join(root, "_change_data"))
    shutil.move(glob.glob(os.path.join(tmpdir, "*.parquet"))[0],
                os.path.join(root, cdc_rel))
    append_delta_commit(root, [
        {"cdc": {"path": cdc_rel, "partitionValues": {}, "size": 1,
                 "dataChange": False}},
        {"remove": {"path": "a.parquet", "deletionTimestamp": 1,
                    "dataChange": True}},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    cdf = read_delta_cdf(spark, root, 1, 1)
    got = sorted(
        (r["id"], r["a"], r["_change_type"])
        for r in cdf.select(
            "id", F.try_variant_get("payload", "$.a", "long").alias("a"),
            "_change_type",
        ).collect()
    )
    assert got == [(3, 3, "delete"), (4, 4, "delete")]


def test_vacuum_protocol_check_acknowledged(spark, tmp_path):
    """vacuumProtocolCheck: readers only acknowledge the feature —
    a table stamping it must open normally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    pq.write_table(pa.table({"id": pa.array([1, 2], "int64")}),
                   os.path.join(root, "a.parquet"))
    append_delta_commit(root, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["vacuumProtocolCheck"],
                      "writerFeatures": ["vacuumProtocolCheck"]}},
        {"metaData": {
            "id": "vpc", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}}]}),
            "partitionColumns": [], "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    assert sorted(r["id"] for r in read_delta_log(spark, root).collect()) == [1, 2]


def test_variant_migrates_delta_to_iceberg_and_back(spark, tmp_path):
    """The migration bridge carries variant columns: Delta source →
    Iceberg v2 materialization (per-file record counts from ONE
    Spark job — pyarrow can't parse VARIANT footers) → export back
    to Delta, extraction equal at every hop."""
    import pyspark.sql.functions as F

    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.sources.migrate import (
        export_iceberg_to_delta,
        migrate_delta_to_iceberg,
    )

    root = str(tmp_path / "t")
    _variant_table(spark, root)

    def extraction(df):
        return sorted(
            (r["id"], r["a"], r["tag"])
            for r in df.select(
                "id",
                F.try_variant_get("payload", "$.a", "long").alias("a"),
                F.try_variant_get("payload", "$.tag", "string").alias("tag"),
            ).collect()
        )

    want = extraction(read_delta_log(spark, root))
    assert len(want) == 10

    ice = str(tmp_path / "ice")
    res = migrate_delta_to_iceberg(spark, root, ice)
    ice_df = read_mor(spark, res["metadata_path"], res["snapshot_id"])
    assert dict(ice_df.dtypes)["payload"] == "variant"
    assert extraction(ice_df) == want

    back = str(tmp_path / "back")
    meta = parse_metadata(res["metadata_path"])
    export_iceberg_to_delta(
        spark, res["metadata_path"], meta.current_snapshot_id, back
    )
    assert extraction(read_delta_log(spark, back)) == want


def test_variant_fixture_is_physically_shredded_and_gated(spark, tmp_path):
    """Spark 4.1 writes variant SHREDDED by default
    (inferShreddingSchema — typed_value columns in the footer) and
    reassembles shredded values on read, so the variantShredding
    feature reads through the same path: the fixture file is
    footer-pinned shredded, and a table stamping
    variantShredding-preview opens and extracts correctly."""
    import pyspark.sql.functions as F

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_variant_file(spark, root, "a.parquet", range(6))
    raw = open(os.path.join(root, "a.parquet"), "rb").read()
    assert b"typed_value" in raw  # physically shredded layout
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "payload", "type": "variant", "nullable": True,
         "metadata": {}},
    ]})
    append_delta_commit(root, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["variantType",
                                         "variantShredding-preview"],
                      "writerFeatures": ["variantType",
                                         "variantShredding-preview"]}},
        {"metaData": {
            "id": "vs", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": "a.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    df = read_delta_log(spark, root)
    got = sorted(
        (r["id"], r["a"])
        for r in df.select(
            "id", F.try_variant_get("payload", "$.a", "long").alias("a")
        ).collect()
    )
    assert got == [(i, i) for i in range(6)]


def test_variant_incremental_stream(spark, tmp_path):
    """Variant columns flow through the incremental STREAMING source
    (staged-file reader takes the log schema; VariantType rides
    Structured Streaming micro-batches)."""
    import pyspark.sql.functions as F

    from iceberg_tools_spark.sources.delta_log import delta_incremental_stream
    from iceberg_tools_spark.streaming.jobs import run_to_memory

    root = str(tmp_path / "t")
    _variant_table(spark, root)  # v0: a.parquet ids 0..9
    _write_variant_file(spark, root, "b.parquet", range(10, 13))
    append_delta_commit(root, [
        {"add": {"path": "b.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ], checkpoint_interval=None)
    stream, n = delta_incremental_stream(
        spark, root, 0, 1, str(tmp_path / "stage")
    )
    assert n == 1
    rows = run_to_memory(
        stream.select(
            "id",
            F.try_variant_get("payload", "$.a", "long").alias("a"),
            "_delta_version",
        ),
        "variant_inc",
    ).collect()
    assert sorted((r["id"], r["a"], r["_delta_version"]) for r in rows) == [
        (10, 10, 1), (11, 11, 1), (12, 12, 1)
    ]
