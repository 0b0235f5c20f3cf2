"""Sort orders + sorted rewrite: metadata commits, content
preservation through delete folding, bound-stat stamping, the
z-order key, and the pruning payoff."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from iceberg_tools_spark.iceberg.metadata import parse_metadata
from iceberg_tools_spark.iceberg.sortorder import (
    commit_sort_order,
    rewrite_sorted,
    zorder_long_pair,
)

MOR_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "mor")


def _scratch(tmp_path):
    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    return str(root)


def test_commit_sort_order_metadata(tmp_path):
    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    res = commit_sort_order(mp, [("id", "asc"), ("category", "desc")])
    raw = parse_metadata(res["metadata_path"]).raw
    order = next(o for o in raw["sort-orders"] if o["order-id"] == res["order_id"])
    assert [f["source-id"] for f in order["fields"]] == [1, 2]
    assert [f["direction"] for f in order["fields"]] == ["asc", "desc"]
    assert raw["default-sort-order-id"] == res["order_id"]
    with pytest.raises(ValueError, match="not in the current schema"):
        commit_sort_order(res["metadata_path"], [("nope", "asc")])
    with pytest.raises(ValueError, match="direction"):
        commit_sort_order(res["metadata_path"], [("id", "up")])


def test_rewrite_sorted_preserves_rows_and_folds_deletes(spark, tmp_path):
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at, read_mor

    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    before = sorted(
        tuple(r)
        for r in read_mor(spark, mp, 2004, base_dir=root).select("id", "category").collect()
    )
    res = commit_sort_order(mp, [("id", "asc")])
    res = rewrite_sorted(spark, res["metadata_path"], target_files=2)
    after_meta = parse_metadata(res["metadata_path"])
    data, dels = mor_entries_at(after_meta, res["snapshot_id"], root)
    assert dels == []  # full rewrite: all delete files dropped
    after = sorted(
        tuple(r)
        for r in read_mor(spark, res["metadata_path"], res["snapshot_id"], base_dir=root)
        .select("id", "category")
        .collect()
    )
    assert before == after and len(after) == 323


def test_rewrite_sorted_files_are_sorted_with_bounds(spark, tmp_path):
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.conversions import from_bytes
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at

    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    res = commit_sort_order(mp, [("id", "asc")])
    res = rewrite_sorted(spark, res["metadata_path"], target_files=2)
    meta = parse_metadata(res["metadata_path"])
    data, _ = mor_entries_at(meta, res["snapshot_id"], root)
    assert data and all(e["rel"].startswith("data/sorted/") for e in data)
    # every file physically sorted, and its committed bounds match
    # its true min/max
    from iceberg_tools_spark.avro.reader import AvroContainerFile
    from iceberg_tools_spark.iceberg.snapshots import manifest_paths_at

    for e in data:
        ids = pq.read_table(e["local_path"], columns=["id"])["id"].to_pylist()
        assert ids == sorted(ids)
    for p in manifest_paths_at(meta, res["snapshot_id"], root):
        with open(p, "rb") as f:
            recs = list(AvroContainerFile(f.read()))
        for rec in recs:
            df_ = rec["data_file"]
            assert df_["sort_order_id"] == 1  # stamped
            lb = {kv["key"]: kv["value"] for kv in df_["lower_bounds"]}
            ub = {kv["key"]: kv["value"] for kv in df_["upper_bounds"]}
            ids = pq.read_table(
                os.path.join(root, df_["file_path"].split("mor_table/")[-1]),
                columns=["id"],
            )["id"].to_pylist()
            assert from_bytes("long", lb[1]) == min(ids)
            assert from_bytes("long", ub[1]) == max(ids)


def test_bound_pruning_uses_committed_stats(spark, tmp_path):
    # the MoR fixture's entries carry id bounds: id ∈ [120,150]
    # selects exactly B (101-150) — same decode path the sorted
    # rewrite's stamped bounds feed (gate pins the no-stats→stats
    # transition on a fresh table)
    from iceberg_tools_spark.iceberg.snapshots import plan_scan

    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    sel = [
        r["file_path"].rsplit("/", 1)[-1]
        for r in plan_scan(spark, mp, 2002, field_id=1, lo=120, hi=150).collect()
        if r["selected"]
    ]
    assert sel == ["B.parquet"]


def test_zorder_key_matches_python_morton(spark):
    def morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 128, 65535)],
        "a long, b long",
    )
    out = df.select("a", "b", zorder_long_pair(F.col("a"), F.col("b")).alias("z"))
    for r in out.collect():
        assert r["z"] == morton(r["a"], r["b"]), (r["a"], r["b"])
    # pure JVM: no Python evaluation nodes in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_rewrite_sorted_without_order_raises(spark, tmp_path):
    root = _scratch(tmp_path)
    with pytest.raises(ValueError, match="no usable sort order"):
        rewrite_sorted(spark, os.path.join(root, "v2.metadata.json"))
