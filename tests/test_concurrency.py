"""Optimistic-concurrency commit validation (VERDICT r7 #4): append
rebase, validateDataFilesExist for position deletes, serializable
vs snapshot isolation for equality deletes, divergent-base refusal.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_tools_spark.iceberg.commit import (
    _scratch_table,
    append_snapshot,
    write_equality_deletes,
    write_position_deletes,
)
from iceberg_tools_spark.iceberg.concurrency import (
    CommitConflictError,
    commit_append_concurrent,
    commit_delete_concurrent,
    validate_concurrent_commits,
)
from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
from iceberg_tools_spark.iceberg.metadata import parse_metadata


@pytest.fixture()
def table():
    root = _scratch_table("conc_test_", MOR_DIR)
    return root, os.path.join(root, "v2.metadata.json")


def _mk_file(root, rel, ids, category):
    out = os.path.join(root, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()),
                  "category": pa.array([category] * len(ids))}),
        out,
    )
    return rel


def _head_id(mpath):
    return parse_metadata(mpath).raw["current-snapshot-id"]


def test_append_rebase_keeps_both_writers_rows(spark, table):
    root, base = table
    rel_b = _mk_file(root, "data/category=x/b1.parquet", [700], "x")
    head = append_snapshot(
        base, [{"path": rel_b, "partition": {"category": "x"}}],
        base_dir=root, spec_id=0,
    )["metadata_path"]
    rel_a = _mk_file(root, "data/category=y/a1.parquet", [800, 801], "y")
    res = commit_append_concurrent(
        base, head, [{"path": rel_a, "partition": {"category": "y"}}],
        base_dir=root, spec_id=0,
    )
    assert res["retried"] is True
    ids = {
        r.id for r in read_mor(
            spark, res["metadata_path"], res["snapshot_id"], root
        ).collect()
    }
    assert {700, 800, 801} <= ids and len(ids) == 326
    # clean path: head never moved → retried False
    rel_c = _mk_file(root, "data/category=y/a2.parquet", [802], "y")
    res2 = commit_append_concurrent(
        res["metadata_path"], res["metadata_path"],
        [{"path": rel_c, "partition": {"category": "y"}}],
        base_dir=root, spec_id=0,
    )
    assert res2["retried"] is False


def test_pos_delete_missing_referenced_file_aborts(spark, table):
    root, base = table
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    head = rewrite_data_files(spark, base)["metadata_path"]
    loc = parse_metadata(base).raw["location"]
    rel = write_position_deletes(
        root, "data/deletes/c1.parquet", [("data/category=x/A.parquet", 0)]
    )
    with pytest.raises(CommitConflictError, match="no longer live"):
        commit_delete_concurrent(
            base, head,
            [{"path": rel, "partition": {"category": "x"}, "content": 1}],
            referenced_data_files=[f"{loc}/data/category=x/A.parquet"],
            base_dir=root, spec_id=0,
        )
    # the same staged delete against a still-live file commits
    rel2 = write_position_deletes(
        root, "data/deletes/c2.parquet", [("data/category=y/B.parquet", 3)]
    )
    res = commit_delete_concurrent(
        base, head,
        [{"path": rel2, "partition": {"category": "y"}, "content": 1}],
        referenced_data_files=[f"{loc}/data/category=y/B.parquet"],
        base_dir=root, spec_id=0,
    )
    assert res["retried"] is True
    assert read_mor(spark, res["metadata_path"], res["snapshot_id"], root).count() == 322


def test_eq_delete_isolation_levels(table):
    root, base = table
    rel_b = _mk_file(root, "data/category=x/nb.parquet", [710], "x")
    head = append_snapshot(
        base, [{"path": rel_b, "partition": {"category": "x"}}],
        base_dir=root, spec_id=0,
    )["metadata_path"]
    rel_eq = write_equality_deletes(root, "data/deletes/e1.parquet", [{"id": 30}])
    staged = [{"path": rel_eq, "partition": {"category": "x"}, "content": 2,
               "equality_ids": [1]}]
    # serializable: the concurrent x append conflicts
    with pytest.raises(CommitConflictError, match="partition scope"):
        commit_delete_concurrent(base, head, staged, base_dir=root, spec_id=0)
    # snapshot isolation tolerates concurrent appends
    res = commit_delete_concurrent(
        base, head, staged, base_dir=root, spec_id=0, isolation="snapshot"
    )
    assert res["retried"] is True
    # serializable but DISJOINT partition: z delete vs x append is clean
    rel_eq2 = write_equality_deletes(root, "data/deletes/e2.parquet", [{"id": 260}])
    res2 = commit_delete_concurrent(
        res["metadata_path"], res["metadata_path"],
        [{"path": rel_eq2, "partition": {"category": "z"}, "content": 2,
          "equality_ids": [1]}],
        base_dir=root, spec_id=0,
    )
    assert res2["retried"] is False


def test_eq_delete_ignores_concurrent_replace(spark, table):
    """A concurrent compaction REWRITE adds files but no logical
    rows — it must not trip the conflicting-appends validation."""
    root, base = table
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    head = rewrite_data_files(spark, base)["metadata_path"]
    v = validate_concurrent_commits(
        base, head,
        equality_delete_partitions=[{"category": "x"}],
        base_dir=root,
    )
    assert v["clean"] is False  # head moved, but no conflict raised


def test_divergent_base_refused(table):
    root, base = table
    from iceberg_tools_spark.iceberg.commit import rollback_to

    rel = _mk_file(root, "data/category=x/d1.parquet", [720], "x")
    head1 = append_snapshot(
        base, [{"path": rel, "partition": {"category": "x"}}],
        base_dir=root, spec_id=0,
    )
    # roll the table back past the staged writer's base
    rb = rollback_to(head1["metadata_path"], 2003)
    rel2 = _mk_file(root, "data/category=x/d2.parquet", [721], "x")
    with pytest.raises(CommitConflictError, match="not an ancestor"):
        commit_append_concurrent(
            head1["metadata_path"], rb["metadata_path"],
            [{"path": rel2, "partition": {"category": "x"}}],
            base_dir=root, spec_id=0,
        )
