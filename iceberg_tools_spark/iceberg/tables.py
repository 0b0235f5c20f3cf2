"""Iceberg metadata tables as Spark DataFrames.

The Spark-native re-expression of the reference's capability: where
`manifest2json` dumps manifest entries as JSON text, these builders
expose the same records — snapshots, history, manifest entries,
live files, partition summaries — as queryable DataFrames (the
`table$snapshots` / `$files` / `$partitions` surface of Spark's
Iceberg connector, rebuilt from the raw metadata files).

Scale note: manifest/metadata files are KB–MB; they are parsed
driver-side with the pure-Python reader and handed to Spark via
``createDataFrame`` with explicit schemas. The DATA files they
describe are what a cluster reads in parallel — planning metadata
through the driver is exactly what query engines do.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..avro.reader import AvroContainerFile
from .conversions import decode_bound
from .metadata import TableMetadata, field_id_types, parse_metadata

ENTRY_STATUS = {0: "EXISTING", 1: "ADDED", 2: "DELETED"}

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("committed_at", T.TimestampNTZType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("manifest_list", T.StringType()),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
    ]
)

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("made_current_at", T.TimestampNTZType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ]
)

ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("status", T.IntegerType()),
        T.StructField("status_name", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_format", T.StringType()),
        T.StructField("partition_json", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
        T.StructField("column_sizes", T.MapType(T.IntegerType(), T.LongType())),
        T.StructField("value_counts", T.MapType(T.IntegerType(), T.LongType())),
        T.StructField("null_value_counts", T.MapType(T.IntegerType(), T.LongType())),
        T.StructField("nan_value_counts", T.MapType(T.IntegerType(), T.LongType())),
        T.StructField("lower_bounds", T.MapType(T.IntegerType(), T.StringType())),
        T.StructField("upper_bounds", T.MapType(T.IntegerType(), T.StringType())),
        T.StructField("split_offsets", T.ArrayType(T.LongType())),
        T.StructField("sort_order_id", T.IntegerType()),
    ]
)


def _ts(ms: int | None) -> _dt.datetime | None:
    if ms is None:
        return None
    return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(tzinfo=None)


def snapshots_df(spark: SparkSession, meta: TableMetadata) -> DataFrame:
    rows = [
        (
            _ts(s.get("timestamp-ms")),
            s.get("snapshot-id"),
            s.get("parent-snapshot-id"),
            (s.get("summary") or {}).get("operation"),
            s.get("manifest-list"),
            {k: str(v) for k, v in (s.get("summary") or {}).items() if k != "operation"},
        )
        for s in meta.snapshots
    ]
    return spark.createDataFrame(rows, SNAPSHOTS_SCHEMA)


def history_df(spark: SparkSession, meta: TableMetadata) -> DataFrame:
    ancestors = set()
    cur = meta.current_snapshot_id
    by_id = {s.get("snapshot-id"): s for s in meta.snapshots}
    while cur is not None and cur in by_id:
        ancestors.add(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    rows = [
        (_ts(e.get("timestamp-ms")), e.get("snapshot-id"), e.get("snapshot-id") in ancestors)
        for e in meta.snapshot_log
    ]
    return spark.createDataFrame(rows, HISTORY_SCHEMA)


def _kv_map(arr: Any) -> dict[int, int] | None:
    if arr is None:
        return None
    return {e["key"]: e["value"] for e in arr}


def manifest_entries_rows(
    manifest_paths: list[str], meta_raw: dict[str, Any]
) -> list[tuple]:
    """Parse manifest avro files (driver-side) into ENTRIES_SCHEMA
    rows, decoding bounds with the metadata's field-id → type map."""
    import json as _json

    fid_types = field_id_types(meta_raw)

    def bounds(arr: Any) -> dict[int, str] | None:
        if arr is None:
            return None
        out = {}
        for e in arr:
            k, v = e["key"], e["value"]
            out[k] = decode_bound(fid_types[k], v) if k in fid_types else v.hex()
        return out

    rows = []
    for p in manifest_paths:
        with open(p, "rb") as f:
            avro = AvroContainerFile(f.read())
        for rec in avro:
            df_ = rec["data_file"]
            rows.append(
                (
                    rec["status"],
                    ENTRY_STATUS.get(rec["status"], str(rec["status"])),
                    rec.get("snapshot_id"),
                    df_["file_path"],
                    df_["file_format"],
                    _json.dumps(df_.get("partition"), sort_keys=True),
                    df_["record_count"],
                    df_["file_size_in_bytes"],
                    _kv_map(df_.get("column_sizes")),
                    _kv_map(df_.get("value_counts")),
                    _kv_map(df_.get("null_value_counts")),
                    _kv_map(df_.get("nan_value_counts")),
                    bounds(df_.get("lower_bounds")),
                    bounds(df_.get("upper_bounds")),
                    df_.get("split_offsets"),
                    df_.get("sort_order_id"),
                )
            )
    return rows


def manifest_entries_df(
    spark: SparkSession, manifest_paths: list[str], meta_raw: dict[str, Any]
) -> DataFrame:
    return spark.createDataFrame(manifest_entries_rows(manifest_paths, meta_raw), ENTRIES_SCHEMA)


def files_df(spark: SparkSession, manifest_paths: list[str], meta_raw: dict[str, Any]) -> DataFrame:
    """Live data files: manifest entries not marked DELETED."""
    return manifest_entries_df(spark, manifest_paths, meta_raw).filter(F.col("status") != 2)


def partitions_df(
    spark: SparkSession, manifest_paths: list[str], meta_raw: dict[str, Any]
) -> DataFrame:
    """Per-partition rollup of the live files."""
    return (
        files_df(spark, manifest_paths, meta_raw)
        .groupBy("partition_json")
        .agg(
            F.count(F.lit(1)).alias("file_count"),
            F.sum("record_count").alias("record_count"),
            F.sum("file_size_in_bytes").alias("total_size_in_bytes"),
            F.min("file_size_in_bytes").alias("min_file_size"),
            F.max("file_size_in_bytes").alias("max_file_size"),
        )
        .orderBy("partition_json")
    )


# ---------------------------------------------------------------------
# driver-contract entries (rows-only): the reference fixture is the
# only Iceberg table available in the test environment, so these
# queries ignore sf_dir and introspect that fixture.
# ---------------------------------------------------------------------

FIXTURE_MANIFEST = (
    "/root/reference/src/test/resources/1702989a-f66f-423a-aaf1-a01b9a699685-m0.avro"
)
FIXTURE_METADATA = "/root/reference/src/test/resources/v1.metadata.json"


def meta_manifest_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = parse_metadata(FIXTURE_METADATA)
    return manifest_entries_df(spark, [FIXTURE_MANIFEST], meta.raw).orderBy("file_path")


def meta_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = parse_metadata(FIXTURE_METADATA)
    return (
        files_df(spark, [FIXTURE_MANIFEST], meta.raw)
        .select(
            "file_path",
            "file_format",
            "partition_json",
            "record_count",
            "file_size_in_bytes",
            "lower_bounds",
            "upper_bounds",
        )
        .orderBy("file_path")
    )


def meta_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = parse_metadata(FIXTURE_METADATA)
    return partitions_df(spark, [FIXTURE_MANIFEST], meta.raw)


def meta_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = parse_metadata(FIXTURE_METADATA)
    return snapshots_df(spark, meta).orderBy("committed_at")


def meta_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = parse_metadata(FIXTURE_METADATA)
    return history_df(spark, meta).orderBy("made_current_at")
