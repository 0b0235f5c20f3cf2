"""Table statistics files (Iceberg spec, "Table statistics"): a
Puffin file with one NDV blob per column, registered in table
metadata under ``statistics`` as ``{"snapshot-id",
"statistics-path", "file-size-in-bytes",
"file-footer-size-in-bytes", "blob-metadata": [...]}``.

Engine interop note: real writers store Apache DataSketches theta
sketches (blob type ``apache-datasketches-theta-v1``); consumers
(Trino, Spark) read the REQUIRED ``ndv`` blob property without
decoding the sketch bytes. This engine writes blob type
``iceberg-tools-ndv-v1`` — honestly labeled, with the estimate
itself as the payload (8 LE bytes, round-trip-checked against the
property on read), while carrying the same ``ndv`` property surface
a property-reading consumer uses. Mislabeling non-theta bytes as
theta would corrupt a real DataSketches reader; a custom type is
spec-legal (Puffin: "file may contain blobs of any type").

Spark-first shape: NDV computation is ONE distributed aggregation
over the live MoR read (exact ``count_distinct`` by default,
``approx_count_distinct`` HLL++ for the 100 TB path — same switch
as ``operators/stats.py``); only the KB-scale per-column results
reach the driver for the Puffin write.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .metadata import parse_metadata

NDV_BLOB_TYPE = "iceberg-tools-ndv-v1"


def _field_ids(meta) -> dict[str, int]:
    raw = meta.raw
    schema = next(
        s for s in raw.get("schemas", [raw.get("schema", {})])
        if s.get("schema-id", 0) == raw.get("current-schema-id", 0)
    )
    return {f["name"]: f["id"] for f in schema.get("fields", [])}


def compute_ndv(
    df: DataFrame, columns: list[str], *, approximate: bool = False
) -> dict[str, int]:
    """Per-column NDV in one aggregation pass (exact by default;
    ``approximate`` flips to HLL++ ``approx_count_distinct`` — the
    one-pass map-side-partial sketch that holds at any scale)."""
    fn = F.approx_count_distinct if approximate else F.count_distinct
    row = df.agg(
        *[fn(F.col(c)).alias(c) for c in columns]
    ).collect()[0]
    return {c: int(row[c]) for c in columns}


def write_table_stats(
    spark: SparkSession,
    metadata_path: str,
    snapshot_id: int | None = None,
    base_dir: str | None = None,
    *,
    columns: list[str] | None = None,
    approximate: bool = False,
) -> dict[str, Any]:
    """Compute per-column NDV over the LIVE rows at a snapshot (the
    MoR read — deletes applied), write one Puffin statistics file
    with an NDV blob per column (``ndv`` property + the blob's field
    id), and register it in the metadata ``statistics`` list
    (replacing any prior entry for the snapshot)."""
    from .deletes import read_mor
    from .puffin import write_puffin

    base_dir = base_dir or os.path.dirname(metadata_path)
    meta = parse_metadata(metadata_path)
    if snapshot_id is None:
        snapshot_id = meta.current_snapshot_id
    table_root = (
        base_dir
        if os.path.isdir(os.path.join(base_dir, "metadata"))
        else os.path.dirname(base_dir)
    )
    loc = meta.raw.get("location") or f"file://{table_root}"
    fids = _field_ids(meta)
    columns = columns or list(fids)
    unknown = set(columns) - set(fids)
    if unknown:
        raise ValueError(f"columns {sorted(unknown)} not in the current schema")
    snap = next(s for s in meta.snapshots if s["snapshot-id"] == snapshot_id)

    live = read_mor(spark, metadata_path, snapshot_id, base_dir)
    ndvs = compute_ndv(live, columns, approximate=approximate)

    rel = f"metadata/stats-{snapshot_id}.puffin"
    out_path = os.path.join(table_root, *rel.split("/"))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    blobs = [
        {
            "type": NDV_BLOB_TYPE,
            # payload: the ndv as 8 LE bytes — self-describing enough
            # to round-trip; the interop surface is the property
            "data": struct.pack("<Q", ndvs[c]),
            "fields": [fids[c]],
            "snapshot-id": snapshot_id,
            "sequence-number": snap.get("sequence-number", -1),
            "properties": {"ndv": str(ndvs[c]), "column": c},
        }
        for c in columns
    ]
    blob_metas = write_puffin(out_path, blobs)

    file_size = os.path.getsize(out_path)
    # footer = everything after the last blob: Magic + payload +
    # size + flags + Magic
    footer_start = blob_metas[-1]["offset"] + blob_metas[-1]["length"]
    raw = json.loads(json.dumps(meta.raw))
    entry = {
        "snapshot-id": snapshot_id,
        "statistics-path": f"{loc}/{rel}",
        "file-size-in-bytes": file_size,
        "file-footer-size-in-bytes": file_size - footer_start,
        "blob-metadata": blob_metas,
    }
    stats = [
        s for s in raw.get("statistics", []) if s.get("snapshot-id") != snapshot_id
    ]
    stats.append(entry)
    raw["statistics"] = sorted(stats, key=lambda s: s["snapshot-id"])
    new_path = metadata_path.replace(
        ".metadata.json", f".tstats{snapshot_id}.metadata.json"
    )
    if new_path == metadata_path:
        new_path = metadata_path + f".tstats{snapshot_id}.json"
    with open(new_path, "w") as f:
        json.dump(raw, f, indent=2)
    return {
        "metadata_path": new_path,
        "statistics_path": out_path,
        "snapshot_id": snapshot_id,
        "ndv": ndvs,
    }


def read_table_stats(
    spark: SparkSession,
    metadata_path: str,
    snapshot_id: int | None = None,
    base_dir: str | None = None,
) -> DataFrame:
    """The registered statistics file's NDV surface, read back the
    way a property-consuming engine does (footer blob metadata), and
    cross-checked against the decoded blob payloads: one row per
    column with field id, the property NDV, and ``payload_agrees``."""
    from .puffin import read_blob, read_puffin_footer
    from .snapshots import _local

    base_dir = base_dir or os.path.dirname(metadata_path)
    meta = parse_metadata(metadata_path)
    if snapshot_id is None:
        snapshot_id = meta.current_snapshot_id
    entry = next(
        (
            s
            for s in meta.raw.get("statistics", [])
            if s.get("snapshot-id") == snapshot_id
        ),
        None,
    )
    if entry is None:
        raise ValueError(f"no statistics registered for snapshot {snapshot_id}")
    table_root = (
        base_dir
        if os.path.isdir(os.path.join(base_dir, "metadata"))
        else os.path.dirname(base_dir)
    )
    local = _local(entry["statistics-path"], table_root, meta.raw.get("location"))
    # integrity: the footer must agree with the registered metadata
    footer = read_puffin_footer(local)
    if len(footer.get("blobs", [])) != len(entry.get("blob-metadata", [])):
        raise ValueError(
            f"{local}: footer lists {len(footer.get('blobs', []))} blobs, "
            f"metadata registered {len(entry.get('blob-metadata', []))}"
        )
    rows = []
    for b in entry["blob-metadata"]:
        props = b.get("properties", {})
        ndv = int(props["ndv"])
        (payload_ndv,) = struct.unpack(
            "<Q", read_blob(local, b["offset"], b["length"])
        )
        rows.append(
            (
                props.get("column"),
                b["fields"][0] if b.get("fields") else None,
                b["type"],
                ndv,
                payload_ndv == ndv,
            )
        )
    return spark.createDataFrame(
        rows, "col_name string, field_id int, blob_type string, ndv long, payload_agrees boolean"
    ).orderBy("field_id")


# ------------------------------------------------ driver-gate query


def meta_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: write + register + read back table statistics
    for the MoR fixture at snapshot 2004 on a scratch copy. NDV is
    computed over the LIVE rows (323 after deletes): 323 distinct
    ids, 4 distinct categories. Golden oracle."""
    from .commit import _scratch_table
    from .deletes import MOR_DIR

    root = _scratch_table("tstats_gate_", MOR_DIR)
    res = write_table_stats(
        spark, os.path.join(root, "v2.metadata.json"), 2004, root
    )
    return read_table_stats(spark, res["metadata_path"], 2004, root)


META_TABLE_STATS_SQL = f"""
SELECT col_name, CAST(field_id AS INTEGER) AS field_id, blob_type,
       CAST(ndv AS BIGINT) AS ndv, payload_agrees
FROM (VALUES
  ('id', 1, '{NDV_BLOB_TYPE}', 323, true),
  ('category', 2, '{NDV_BLOB_TYPE}', 4, true)
) t(col_name, field_id, blob_type, ndv, payload_agrees)
ORDER BY field_id
"""
