"""Write plans/r16/<name>_<tag>.txt for the named queries (and the
geo planning frame), without timing — evidence capture for the
optimization round. Usage:
    python scripts/capture_plans.py <tag> <query> [...]
Special names: geo_plan (the plan_scan decision-table frame with a
geo_bbox predicate), mor_read (read_mor over the delete-bearing MoR
fixture — shows the positional-delete scan consolidation).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    tag, names = sys.argv[1], sys.argv[2:]

    from iceberg_tools_spark import registry
    from iceberg_tools_spark.plans.checks import plan_string
    from iceberg_tools_spark.session import get_spark

    spark = get_spark("plancap", cpus=cpus)
    plans_dir = os.path.join(repo, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)
    available = registry.queries()

    def emit(name: str, df) -> None:
        p = plan_string(df)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(p)
        print(
            name,
            "exchanges", p.count("Exchange"),
            "python", p.count("EvalPython") + p.count("MapInArrow")
            + p.count("MapInPandas") + p.count("FlatMapGroupsInPandas"),
            "scans", p.count("Scan parquet"),
        )

    for name in names:
        if name == "geo_plan":
            import glob
            import shutil
            import tempfile

            from iceberg_tools_spark.iceberg.deletes import MOR_DIR  # noqa: F401
            from iceberg_tools_spark.iceberg.snapshots import geo_scan_rows  # noqa: F401
            # build the same scratch geo table the gate builds, then
            # capture ONE plan_scan frame's plan
            import pyarrow as pa
            import pyarrow.parquet as pq

            from iceberg_tools_spark.iceberg.commit import (
                append_snapshot,
                create_table,
            )
            from iceberg_tools_spark.iceberg.conversions import wkb_point
            from iceberg_tools_spark.iceberg.snapshots import plan_scan

            root = tempfile.mkdtemp(prefix="geo_plan_")
            mp = create_table(
                os.path.join(root, "t"),
                [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "shape", "required": False,
                     "type": "geometry"},
                ],
                format_version=3,
            )
            troot = os.path.join(root, "t")
            pq.write_table(
                pa.table({"id": pa.array([1], "int64"),
                          "shape": pa.array([b"\x00"], pa.binary())}),
                os.path.join(troot, "data", "west.parquet"),
            )
            res = append_snapshot(mp, [{
                "path": "data/west.parquet", "partition": {},
                "lower_bounds": [{"key": 2, "value": wkb_point(0, 0)}],
                "upper_bounds": [{"key": 2, "value": wkb_point(10, 10)}],
            }])
            df = plan_scan(
                spark, res["metadata_path"], res["snapshot_id"],
                geo_bbox={2: (5, 5, 20, 20)}, base_dir=troot,
            )
            emit("geo_plan", df)
            shutil.rmtree(root, ignore_errors=True)
        elif name == "mor_read":
            import glob

            from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor

            mp = sorted(glob.glob(os.path.join(MOR_DIR, "*.metadata.json")))[-1]
            import json

            snap = json.load(open(mp))["current-snapshot-id"]
            emit("mor_read", read_mor(spark, mp, snap))
        else:
            emit(name, available[name](spark, sf_dir))


if __name__ == "__main__":
    main()
