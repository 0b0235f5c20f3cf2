"""Rewrite-data-files (delete folding) round-trips on a scratch copy
of the physical MoR fixture. The headline invariant: the table's
ROWS are identical before and after the rewrite."""

from __future__ import annotations

import os
import shutil

import pytest

from iceberg_tools_spark.iceberg.deletes import MOR_DIR, plan_scan_tasks, read_mor
from iceberg_tools_spark.iceberg.metadata import parse_metadata
from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files
from iceberg_tools_spark.iceberg.snapshots import files_at


@pytest.fixture()
def table(tmp_path):
    root = tmp_path / "mor"
    shutil.copytree(MOR_DIR, root)
    return str(root)


def _mp(root):
    return os.path.join(root, "v2.metadata.json")


def test_rewrite_preserves_rows(spark, table):
    before = sorted(r.id for r in read_mor(spark, _mp(table), 2004).collect())
    res = rewrite_data_files(spark, _mp(table))  # defaults: pos-deleted files
    assert sorted(res["rewritten"]) == [
        "data/category=x/A.parquet", "data/category=x/C.parquet",
    ]
    after = sorted(
        r.id for r in read_mor(spark, res["metadata_path"], res["snapshot_id"]).collect()
    )
    assert after == before  # the whole point


def test_rewrite_file_listing_and_stats(spark, table):
    res = rewrite_data_files(spark, _mp(table))
    files = {r.file_path.rsplit("/", 1)[-1]: r
             for r in files_at(spark, res["metadata_path"], res["snapshot_id"]).collect()}
    assert "A.parquet" not in files and "C.parquet" not in files
    # folded counts: A lost 10 rows, C lost 5
    assert files[f"A-rw{res['snapshot_id']}.parquet"].record_count == 90
    assert files[f"C-rw{res['snapshot_id']}.parquet"].record_count == 95
    # untouched files keep original snapshot attribution
    assert files["B.parquet"].snapshot_id == 2001
    assert files["F.parquet"].snapshot_id == 2004


def test_rewrite_clears_delete_attachment(spark, table):
    """At the new snapshot, no delete file attaches to the rewritten
    files (their data seq > every existing delete seq), while the
    un-rewritten z-partition file keeps its equality exposure."""
    res = rewrite_data_files(spark, _mp(table))
    meta = parse_metadata(res["metadata_path"])
    tasks = plan_scan_tasks(meta, res["snapshot_id"], table)
    by_file = {t[0].rsplit("/", 1)[-1]: t for t in tasks}
    assert by_file[f"A-rw{res['snapshot_id']}.parquet"][5] == "none"
    assert by_file[f"C-rw{res['snapshot_id']}.parquet"][5] == "none"
    assert by_file["D.parquet"][3] == "EQUALITY_DELETES"


def test_rewrite_explicit_targets_and_errors(spark, table):
    res = rewrite_data_files(spark, _mp(table), ["data/category=x/A.parquet"])
    assert res["rewritten"] == ["data/category=x/A.parquet"]
    # second rewrite at the new snapshot: C still has applicable deletes
    res2 = rewrite_data_files(spark, res["metadata_path"])
    assert res2["rewritten"] == ["data/category=x/C.parquet"]
    # a third has nothing left to fold
    with pytest.raises(ValueError, match="no files to rewrite"):
        rewrite_data_files(spark, res2["metadata_path"])
    with pytest.raises(ValueError, match="not live"):
        rewrite_data_files(spark, res2["metadata_path"], ["data/nope.parquet"])


def test_rewrite_carries_untouched_manifests_verbatim(spark, table):
    """Only manifests containing a replaced file are rebuilt; the
    rest (m6 with F, the delete manifest m5) keep their original
    paths in the new manifest list."""
    from iceberg_tools_spark.iceberg.snapshots import manifest_files_at

    res = rewrite_data_files(spark, _mp(table), ["data/category=x/A.parquet"])
    meta = parse_metadata(res["metadata_path"])
    names = sorted(
        m["manifest_path"].rsplit("/", 1)[-1]
        for m in manifest_files_at(meta, res["snapshot_id"], table)
    )
    # m1 (held A) rebuilt; m2/m5/m6 carried forward verbatim
    assert "m2.avro" in names and "m5.avro" in names and "m6.avro" in names
    assert "m1.avro" not in names
    assert any(n.startswith("m1-rw") for n in names)


def test_plan_execute_replan_coherence(spark, table):
    """The maintenance loop closes: delete_compaction_plan flags the
    threshold-crossing file, rewrite_data_files executes the fold,
    and the FileScanTask planner confirms no positional delete
    attaches to any file afterwards."""
    from iceberg_tools_spark.iceberg.deletes import delete_compaction_plan

    plan = {r.file_path.rsplit("/", 1)[-1]: r.action
            for r in delete_compaction_plan(spark, "unused").collect()}
    assert plan["A.parquet"] == "rewrite"

    res = rewrite_data_files(spark, _mp(table))  # folds A and C
    meta = parse_metadata(res["metadata_path"])
    tasks = plan_scan_tasks(meta, res["snapshot_id"], table)
    assert not any(t[3] == "POSITION_DELETES" for t in tasks)


def test_rebuilt_manifests_keep_partition_summaries(spark, tmp_path):
    # rewrites must not degrade manifest-level pruning: after a
    # rewrite, a predicate on a partition value no manifest covers
    # prunes every manifest at LEVEL 1 (their Avro never opens)
    import os
    import shutil

    from iceberg_tools_spark.iceberg.deletes import MOR_DIR
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files
    from iceberg_tools_spark.iceberg.snapshots import plan_scan

    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    res = rewrite_data_files(spark, str(root / "v2.metadata.json"))
    out = plan_scan(
        spark,
        res["metadata_path"],
        res["snapshot_id"],
        partition_pred={"category": "zz"},
        debug=True,
    ).collect()
    assert out and all(r["manifest_pruned"] for r in out)
    # and a real value still resolves through the summaries
    sel = plan_scan(
        spark,
        res["metadata_path"],
        res["snapshot_id"],
        partition_pred={"category": "w"},
    ).collect()
    assert {r["file_path"].rsplit("/", 1)[-1] for r in sel if r["selected"]} == {
        "F.parquet"
    }


def test_rewrite_after_rename_preserves_column_values(spark, table):
    """ADVICE r7: a rewrite whose targets predate a column rename
    must project each file through the name mapping — a plain
    name-based union silently null-fills the old-named column and
    the REPLACE commit persists the nulls forever."""
    from iceberg_tools_spark.iceberg.deletes import read_mor_projected
    from iceberg_tools_spark.iceberg.evolution import evolve_schema

    before = read_mor_projected(spark, _mp(table), 2004, table)
    before_rows = sorted((r.id, r.category) for r in before.collect())
    evo = evolve_schema(_mp(table), rename={"category": "cat"})
    res = rewrite_data_files(spark, evo["metadata_path"])
    after = read_mor_projected(
        spark, res["metadata_path"], res["snapshot_id"], table
    )
    after_rows = sorted((r.id, r.cat) for r in after.collect())
    assert after_rows == before_rows  # values survive the rename
    # the rewritten files themselves carry real values, no null-fill
    import pyarrow.parquet as pq

    for p in res["new_files"]:
        local = os.path.join(table, "data", p.split("/data/", 1)[1])
        t = pq.read_table(local)
        name = "cat" if "cat" in t.schema.names else "category"
        assert t.column(name).null_count == 0
