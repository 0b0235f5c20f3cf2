"""Generate the partition-transforms fixture
(tests/fixtures/transforms/): an Iceberg v2 table partitioned by
``bucket[4](id), day(ts)`` — the two transform families the engine
previously couldn't derive or prune by.

    v1.metadata.json   schema: id(1) long, ts(2) timestamp,
                               payload(3) string
                       spec 0: id_bucket = bucket[4](id),
                               ts_day    = day(ts)
    v2.metadata.json   snapshot 4001: day 19737 (2024-01-15) —
                       b0.parquet (bucket 0: ids 1,2,10)
                       b1.parquet (bucket 1: ids 6,13,14)
    v3.metadata.json   snapshot 4002: day 19738 (2024-01-16) —
                       b2.parquet (bucket 2: ids 4,16,19)
                       b3.parquet (bucket 3: ids 3,5,7)

Bucket membership comes from the engine's own spec-vector-pinned
murmur3 (``iceberg/transforms.py``); the generator asserts it for
every row, so the fixture is self-checking against the Iceberg
spec's Appendix-B hash. Partition dicts are derived with
``apply_transform`` — the same function `plan_scan` uses to project
source predicates, closing the write/plan loop.

Deterministic: identical metadata/Avro bytes every run. Run from
the repo root:

    python scripts/gen_transforms_fixture.py
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_tools_spark.iceberg.commit import append_snapshot
from iceberg_tools_spark.iceberg.transforms import apply_transform, bucket_value

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "transforms",
)

LOCATION = "file:///tmp/transforms_table"

# bucket[4] membership (verified against the engine's murmur3 below)
FILES = {
    # name → (bucket, day string, ids)
    "b0": (0, "2024-01-15", [1, 2, 10]),
    "b1": (1, "2024-01-15", [6, 13, 14]),
    "b2": (2, "2024-01-16", [4, 16, 19]),
    "b3": (3, "2024-01-16", [3, 5, 7]),
}


def _fid(name: str, typ: pa.DataType, fid: int) -> pa.Field:
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


def main() -> None:
    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(os.path.join(OUT_DIR, "metadata"))

    meta0 = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000f001",
        "location": LOCATION,
        "last-sequence-number": 0,
        "last-updated-ms": 1700000000000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
                    {"id": 3, "name": "payload", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "id_bucket", "transform": "bucket[4]",
                     "source-id": 1, "field-id": 1000},
                    {"name": "ts_day", "transform": "day",
                     "source-id": 2, "field-id": 1001},
                ],
            }
        ],
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

    schema = pa.schema([
        _fid("id", pa.int64(), 1),
        _fid("ts", pa.timestamp("us"), 2),
        _fid("payload", pa.string(), 3),
    ])

    by_snapshot: dict[str, list[dict]] = {"2024-01-15": [], "2024-01-16": []}
    for name, (bucket, day, ids) in FILES.items():
        ts = dt.datetime.fromisoformat(day) + dt.timedelta(hours=12)
        for i in ids:  # self-check vs the spec-pinned hash
            assert bucket_value(i, "long", 4) == bucket, (name, i)
        day_ord = apply_transform("day", ts, "timestamp")
        rel = f"data/id_bucket={bucket}/ts_day={day_ord}/{name}.parquet"
        path = os.path.join(OUT_DIR, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "ts": pa.array([ts] * len(ids), pa.timestamp("us")),
                    "payload": pa.array([f"p{i}" for i in ids]),
                },
                schema=schema,
            ),
            path,
        )
        by_snapshot[day].append(
            {"path": rel, "partition": {"id_bucket": bucket, "ts_day": day_ord}}
        )

    res = {"metadata_path": v1}
    for sid, day in ((4001, "2024-01-15"), (4002, "2024-01-16")):
        res = append_snapshot(
            res["metadata_path"],
            by_snapshot[day],
            snapshot_id=sid,
            timestamp_ms=1700000000000 + (sid - 4000) * 1000,
        )
    assert os.path.basename(res["metadata_path"]) == "v3.metadata.json"
    print(f"wrote {OUT_DIR}")


if __name__ == "__main__":
    main()
