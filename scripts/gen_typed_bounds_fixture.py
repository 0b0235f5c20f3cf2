"""Generate the synthetic typed-bounds manifest fixture
(tests/fixtures/typed_bounds/): a v2 metadata.json + one manifest
Avro whose two data-file entries carry lower/upper bounds across
float / double / decimal / date / timestamp / boolean / string /
long / binary columns (VERDICT r3 #4 — the reference fixture only
has long/string bounds, so float32 shortest-round-trip rendering
etc. was never exercised end-to-end through the manifest pipeline).

Deterministic: byte-identical output on every run (md5-derived Avro
sync marker, fixed timestamps). Run from the repo root:

    python scripts/gen_typed_bounds_fixture.py
"""

from __future__ import annotations

import json
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_tools_spark.avro.writer import write_container
from iceberg_tools_spark.iceberg.conversions import to_bytes

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "typed_bounds",
)

# field-id → iceberg type (mirrored in the metadata schema below)
FIELDS = {
    1: ("f32", "float"),
    2: ("f64", "double"),
    3: ("dec", "decimal(9, 2)"),
    4: ("day", "date"),
    5: ("ts", "timestamp"),
    6: ("flag", "boolean"),
    7: ("label", "string"),
    8: ("num", "long"),
    9: ("bin", "binary"),
}

# per-file (lower, upper) python values; picked to stress rendering:
# float shortest-round-trip (0.1), float/double scientific-notation
# cutoffs (1.5E7 / 1.0E-8 / 2.5E300), max-float/max-long, trailing-
# zero decimals, negative/zero dates
BOUNDS = {
    "part=a": {
        1: (0.1, 1.5e7),
        2: (1e-8, 123456.789),
        3: (Decimal("-12.50"), Decimal("99999.99")),
        4: (7000, 19000),
        5: (1500000000000000, 1700000000123456),
        6: (False, True),
        7: ("aardvark", "zebra"),
        8: (-5, 99),
        9: (b"\x00\x01", b"\xff\xfe"),
    },
    "part=b": {
        1: (2.5, 3.4028235e38),
        2: (-0.001, 2.5e300),
        3: (Decimal("0.01"), Decimal("1234567.89")),
        4: (-3650, 0),
        5: (-1, 0),
        6: (True, True),
        7: ("mango", "papaya"),
        8: (0, 9223372036854775807),
        9: (b"\x00", b"\x7f\x80"),
    },
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
                            "fields": [{"name": "part", "type": ["null", "string"]}],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "column_sizes", "type": ["null", {"type": "array", "items": _KV_LONG("k117_v118")}], "default": None},
                    {"name": "value_counts", "type": ["null", {"type": "array", "items": _KV_LONG("k119_v120")}], "default": None},
                    {"name": "null_value_counts", "type": ["null", {"type": "array", "items": _KV_LONG("k121_v122")}], "default": None},
                    {"name": "nan_value_counts", "type": ["null", {"type": "array", "items": _KV_LONG("k138_v139")}], "default": None},
                    {"name": "lower_bounds", "type": ["null", {"type": "array", "items": _KV_BYTES("k126_v127")}], "default": None},
                    {"name": "upper_bounds", "type": ["null", {"type": "array", "items": _KV_BYTES("k129_v130")}], "default": None},
                    {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": None},
                    {"name": "sort_order_id", "type": ["null", "int"], "default": None},
                ],
            },
        },
    ],
}

METADATA = {
    "format-version": 2,
    "table-uuid": "11111111-2222-3333-4444-555555555555",
    "location": "file:///tmp/typed_bounds",
    "last-sequence-number": 1,
    "last-updated-ms": 1700000000000,
    "last-column-id": 9,
    "current-schema-id": 0,
    "schemas": [
        {
            "schema-id": 0,
            "type": "struct",
            "fields": [
                {"id": fid, "name": name, "required": False, "type": typ}
                for fid, (name, typ) in FIELDS.items()
            ],
        }
    ],
    "default-spec-id": 0,
    "partition-specs": [
        {
            "spec-id": 0,
            "fields": [
                {"name": "part", "transform": "identity", "source-id": 7, "field-id": 1000}
            ],
        }
    ],
    "last-partition-id": 1000,
    "default-sort-order-id": 0,
    "sort-orders": [{"order-id": 0, "fields": []}],
    "properties": {},
    "current-snapshot-id": 777,
    "snapshots": [
        {
            "sequence-number": 1,
            "snapshot-id": 777,
            "timestamp-ms": 1700000000000,
            "summary": {"operation": "append", "added-data-files": "2"},
            "manifest-list": "file:///tmp/typed_bounds/snap-777.avro",
            "schema-id": 0,
        }
    ],
    "snapshot-log": [{"timestamp-ms": 1700000000000, "snapshot-id": 777}],
    "metadata-log": [],
}


def _entry(part: str, size: int) -> dict:
    b = BOUNDS[part]
    kv = lambda i: [{"key": k, "value": v} for k, v in i]  # noqa: E731
    return {
        "status": 1,
        "snapshot_id": 777,
        "data_file": {
            "file_path": f"file:///tmp/typed_bounds/data/{part}/00000-0-typed.parquet",
            "file_format": "PARQUET",
            "partition": {"part": part.split("=")[1]},
            "record_count": 2,
            "file_size_in_bytes": size,
            "column_sizes": kv((fid, 40 + fid) for fid in FIELDS),
            "value_counts": kv((fid, 2) for fid in FIELDS),
            "null_value_counts": kv((fid, 0) for fid in FIELDS),
            "nan_value_counts": kv((fid, 0) for fid in (1, 2)),
            "lower_bounds": kv(
                (fid, to_bytes(FIELDS[fid][1], lo)) for fid, (lo, _) in b.items()
            ),
            "upper_bounds": kv(
                (fid, to_bytes(FIELDS[fid][1], hi)) for fid, (_, hi) in b.items()
            ),
            "split_offsets": [4],
            "sort_order_id": 0,
        },
    }


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    avro = write_container(
        MANIFEST_SCHEMA, [_entry("part=a", 1234), _entry("part=b", 2345)]
    )
    with open(os.path.join(OUT_DIR, "typed-bounds-m0.avro"), "wb") as f:
        f.write(avro)
    with open(os.path.join(OUT_DIR, "v2.metadata.json"), "w") as f:
        json.dump(METADATA, f, indent=2)
    print(f"wrote {OUT_DIR}: {len(avro)} avro bytes")


if __name__ == "__main__":
    main()
