"""Generate the schema-evolution fixture (tests/fixtures/evolution/):
an unpartitioned Iceberg v2 table whose history exercises every
evolution kind the engine claims — rename, drop, type promotion,
add — with parquet data files that carry ``PARQUET:field_id``
column metadata (the handle field-id projection binds by).

Built THROUGH the engine's own write path (``append_snapshot`` +
``evolve_schema``), so the fixture doubles as a round-trip of the
commit machinery on an unpartitioned spec:

    v1.metadata.json   schema 0: id(1) int, name(2) string,
                                 score(3) float, scrap(4) int
    v2.metadata.json   snapshot 3001: append data/fileA.parquet
                       (5 rows, written under schema 0)
    v3.metadata.json   schema 1: rename name→title,
                       promote id int→long + score float→double,
                       drop scrap, add extra(5) string
    v4.metadata.json   snapshot 3002: append data/fileB.parquet
                       (3 rows, written under schema 1)
    v5.metadata.json   schema 2: rename title→headline
                       (chained rename: fileA's column binds
                       through TWO renames by id alone)

Projected read at current (schema 2): id BIGINT, headline, score
DOUBLE, extra — fileA widens id/score file-side and null-fills
extra; fileB binds title→headline.

Deterministic: identical metadata/Avro bytes every run (parquet
bytes depend only on the installed pyarrow). Run from the repo
root:

    python scripts/gen_evolution_fixture.py

Public-spec anchors: field-id column resolution and the
promotion/rename/drop rules are the Iceberg spec's "Column
Projection" and "Schema Evolution" sections; ``PARQUET:field_id``
is the parquet-format standard key both Spark and pyarrow write.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_tools_spark.iceberg.commit import append_snapshot
from iceberg_tools_spark.iceberg.evolution import evolve_schema

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "evolution",
)

LOCATION = "file:///tmp/evolution_table"


def _fid(name: str, typ: pa.DataType, fid: int) -> pa.Field:
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


def main() -> None:
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(os.path.join(OUT_DIR, "data"))
    os.makedirs(os.path.join(OUT_DIR, "metadata"))

    # ---- v1: fresh table, schema 0, unpartitioned spec
    meta0 = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000e001",
        "location": LOCATION,
        "last-sequence-number": 0,
        "last-updated-ms": 1700000000000,
        "last-column-id": 4,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "int"},
                    {"id": 2, "name": "name", "required": False, "type": "string"},
                    {"id": 3, "name": "score", "required": False, "type": "float"},
                    {"id": 4, "name": "scrap", "required": False, "type": "int"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    v1 = os.path.join(OUT_DIR, "v1.metadata.json")
    with open(v1, "w") as f:
        json.dump(meta0, f, indent=2)

    # ---- fileA under schema 0 (scores exactly representable in
    # float so the float→double widening is bit-identical on both
    # engines)
    schema_a = pa.schema([
        _fid("id", pa.int32(), 1),
        _fid("name", pa.string(), 2),
        _fid("score", pa.float32(), 3),
        _fid("scrap", pa.int32(), 4),
    ])
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], pa.int32()),
                "name": pa.array(["alpha", "beta", "gamma", "delta", "epsilon"]),
                "score": pa.array([1.5, 2.25, 3.0, 4.75, 5.5], pa.float32()),
                "scrap": pa.array([10, 20, 30, 40, 50], pa.int32()),
            },
            schema=schema_a,
        ),
        os.path.join(OUT_DIR, "data", "fileA.parquet"),
    )
    res = append_snapshot(
        v1,
        [{"path": "data/fileA.parquet", "partition": {}}],
        snapshot_id=3001,
        timestamp_ms=1700000001000,
    )

    # ---- schema 1: the four evolution kinds in one commit
    res = evolve_schema(
        res["metadata_path"],
        rename={"name": "title"},
        promote={"id": "long", "score": "double"},
        drop=["scrap"],
        add=[("extra", "string")],
        timestamp_ms=1700000002000,
    )
    assert res["schema_id"] == 1 and res["last_column_id"] == 5

    # ---- fileB under schema 1
    schema_b = pa.schema([
        _fid("id", pa.int64(), 1),
        _fid("title", pa.string(), 2),
        _fid("score", pa.float64(), 3),
        _fid("extra", pa.string(), 5),
    ])
    pq.write_table(
        pa.table(
            {
                "id": pa.array([6, 7, 8], pa.int64()),
                "title": pa.array(["zeta", "eta", "theta"]),
                "score": pa.array([6.125, 7.0, 8.5], pa.float64()),
                "extra": pa.array(["x6", "x7", "x8"]),
            },
            schema=schema_b,
        ),
        os.path.join(OUT_DIR, "data", "fileB.parquet"),
    )
    res = append_snapshot(
        res["metadata_path"],
        [{"path": "data/fileB.parquet", "partition": {}}],
        snapshot_id=3002,
        timestamp_ms=1700000003000,
    )

    # ---- schema 2: chained rename
    res = evolve_schema(
        res["metadata_path"],
        rename={"title": "headline"},
        timestamp_ms=1700000004000,
    )
    assert res["schema_id"] == 2
    assert os.path.basename(res["metadata_path"]) == "v5.metadata.json"
    print(f"wrote {OUT_DIR}")


if __name__ == "__main__":
    main()
