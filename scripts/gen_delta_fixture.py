"""Build tests/fixtures/delta — a protocol-valid Delta Lake table
written BY HAND from the public PROTOCOL.md (no delta-spark):
hive-layout parquet + 4 JSON commits + a v2 checkpoint parquet +
_last_checkpoint pointer.

History:
  v0  metaData/protocol, add cat=x/f1 (ids 1-50), add cat=y/f2 (100-130)
  v1  add cat=x/f3 (51-60), remove cat=y/f2
  v2  add cat=z/f4 (200-219)  [+ checkpoint of the v2 state]
  v3  add cat=y/f5 (300-304), remove cat=x/f1

Live at head: f3 + f4 + f5 = 35 rows; at v1: f1 + f3 = 60 rows;
at v0: f1 + f2 = 81 rows. Deterministic bytes: fixed timestamps,
fixed ids, no RNG.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "fixtures", "delta")

SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "val", "type": "string", "nullable": True, "metadata": {}},
        {"name": "cat", "type": "string", "nullable": True, "metadata": {}},
    ],
})

META = {
    "id": "00000000-0000-0000-0000-0000000d0001",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": SCHEMA_STRING,
    "partitionColumns": ["cat"],
    "configuration": {},
    "createdTime": 1700000000000,
}
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}

FILES = {
    "cat=x/f1.parquet": ("x", list(range(1, 51))),
    "cat=y/f2.parquet": ("y", list(range(100, 131))),
    "cat=x/f3.parquet": ("x", list(range(51, 61))),
    "cat=z/f4.parquet": ("z", list(range(200, 220))),
    "cat=y/f5.parquet": ("y", list(range(300, 305))),
}


def _write_file(rel: str) -> dict:
    cat, ids = FILES[rel]
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # partition column NOT in the parquet (Delta stores it in the log)
    pq.write_table(
        pa.table({
            "id": pa.array(ids, pa.int64()),
            "val": pa.array([f"v{i}" for i in ids], pa.string()),
        }),
        path,
    )
    return {
        "path": rel,
        "partitionValues": {"cat": cat},
        "size": os.path.getsize(path),
        "modificationTime": 1700000001000,
        "dataChange": True,
    }


def _commit(version: int, actions: list[dict]) -> None:
    name = f"{version:020d}.json"
    with open(os.path.join(ROOT, "_delta_log", name), "w") as f:
        for a in actions:
            f.write(json.dumps(a, sort_keys=True) + "\n")


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(os.path.join(ROOT, "_delta_log"))
    adds = {rel: _write_file(rel) for rel in FILES}

    _commit(0, [
        {"protocol": PROTOCOL},
        {"metaData": META},
        {"add": adds["cat=x/f1.parquet"]},
        {"add": adds["cat=y/f2.parquet"]},
        {"commitInfo": {"operation": "WRITE", "timestamp": 1700000001000}},
    ])
    _commit(1, [
        {"add": adds["cat=x/f3.parquet"]},
        {"remove": {"path": "cat=y/f2.parquet",
                    "deletionTimestamp": 1700000002000, "dataChange": True}},
        {"commitInfo": {"operation": "MERGE", "timestamp": 1700000002000}},
    ])
    _commit(2, [
        {"add": adds["cat=z/f4.parquet"]},
        {"commitInfo": {"operation": "WRITE", "timestamp": 1700000003000}},
    ])

    # ---- v2 checkpoint: the v2 state (protocol + metaData + live
    # adds), columnar, one action per row
    cp_rows = [
        {"protocol": PROTOCOL, "metaData": None, "add": None, "remove": None},
        {"protocol": None, "metaData": META, "add": None, "remove": None},
    ]
    for rel in ("cat=x/f1.parquet", "cat=x/f3.parquet", "cat=z/f4.parquet"):
        cp_rows.append({"protocol": None, "metaData": None,
                        "add": adds[rel], "remove": None})
    protocol_t = pa.struct([("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32())])
    format_t = pa.struct([("provider", pa.string()),
                          ("options", pa.map_(pa.string(), pa.string()))])
    meta_t = pa.struct([
        ("id", pa.string()), ("format", format_t),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", pa.map_(pa.string(), pa.string())),
        ("createdTime", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()), ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
    ])
    remove_t = pa.struct([
        ("path", pa.string()), ("deletionTimestamp", pa.int64()),
        ("dataChange", pa.bool_()),
    ])
    cp_schema = pa.schema([
        ("protocol", protocol_t), ("metaData", meta_t),
        ("add", add_t), ("remove", remove_t),
    ])

    def _conv(row):
        out = dict(row)
        if out["metaData"]:
            m = dict(out["metaData"])
            m["format"] = {"provider": m["format"]["provider"],
                           "options": list(m["format"]["options"].items())}
            m["configuration"] = list(m["configuration"].items())
            out["metaData"] = m
        if out["add"]:
            a = dict(out["add"])
            a["partitionValues"] = list(a["partitionValues"].items())
            out["add"] = a
        return out

    pq.write_table(
        pa.Table.from_pylist([_conv(r) for r in cp_rows], schema=cp_schema),
        os.path.join(ROOT, "_delta_log", f"{2:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(ROOT, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 2, "size": len(cp_rows)}, f)

    _commit(3, [
        {"add": adds["cat=y/f5.parquet"]},
        {"remove": {"path": "cat=x/f1.parquet",
                    "deletionTimestamp": 1700000004000, "dataChange": True}},
        {"commitInfo": {"operation": "DELETE", "timestamp": 1700000004000}},
    ])
    print(f"wrote {ROOT}")


if __name__ == "__main__":
    main()
