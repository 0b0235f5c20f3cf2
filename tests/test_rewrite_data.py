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


def _scratch_table(tmp_path, layout, *, name="bp"):
    """Minimal 2-column (id long, cat string) identity-partitioned
    scratch table; ``layout`` = [(cat, [id lists per file])]. Returns
    (metadata_path, root)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.commit import append_snapshot

    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    meta0 = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000d4",
        "location": f"file://{root}",
        "last-sequence-number": 0, "last-updated-ms": 0, "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "cat", "required": False, "type": "string"},
        ]}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "cat", "transform": "identity", "source-id": 2,
             "field-id": 1000},
        ]}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}, "snapshots": [], "snapshot-log": [],
        "metadata-log": [],
    }
    mp = os.path.join(root, "v1.metadata.json")
    with open(mp, "w") as f:
        json.dump(meta0, f, indent=2)
    files = []
    for cat, id_lists in layout:
        for i, ids in enumerate(id_lists):
            rel = f"data/{cat}{i}.parquet"
            pq.write_table(
                pa.table({"id": pa.array(ids, pa.int64()),
                          "cat": pa.array([cat] * len(ids), pa.string())}),
                os.path.join(root, rel),
            )
            files.append({"path": rel, "partition": {"cat": cat}})
    return append_snapshot(mp, files)["metadata_path"], root


def test_binpack_excludes_equality_delete_affected(spark, tmp_path):
    """ADVICE r8 (high): repacking a file with an applicable
    EQUALITY delete commits its rows at a sequence number past the
    delete's gate, resurrecting deleted rows. Binpack must exclude
    such files — conservatively, from manifest metadata alone."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.commit import commit_delete_snapshot
    from iceberg_tools_spark.iceberg.deletes import read_mor
    from iceberg_tools_spark.iceberg.rewrite_data import binpack_rewrite

    mp, root = _scratch_table(
        tmp_path,
        [("a", [list(range(0, 10)), list(range(10, 20)), list(range(20, 30))]),
         ("b", [list(range(100, 110)), list(range(110, 120))])],
    )
    # equality delete id=105 scoped to partition b (seq 2 > data seq 1)
    rel = "data/eq-del.parquet"
    pq.write_table(pa.table({"id": pa.array([105], pa.int64())}),
                   os.path.join(root, rel))
    resd = commit_delete_snapshot(
        mp, [{"path": rel, "partition": {"cat": "b"}, "content": 2,
              "equality_ids": [1]}],
    )
    before = sorted(
        r.id for r in read_mor(spark, resd["metadata_path"],
                               resd["snapshot_id"]).collect()
    )
    assert 105 not in before and len(before) == 49
    res = binpack_rewrite(spark, resd["metadata_path"],
                          target_size_bytes=1 << 20)
    # both b files are (conservatively) equality-affected → excluded
    assert res["skipped_delete_bearing"] == ["data/b0.parquet",
                                             "data/b1.parquet"]
    assert all("a" in g[0] for g in res["groups"])
    after = sorted(
        r.id for r in read_mor(spark, res["metadata_path"],
                               res["snapshot_id"]).collect()
    )
    assert after == before  # 105 stays dead: no resurrection


def test_equality_affected_partition_scope_and_seq_gate(tmp_path):
    """Unit: the metadata gate keeps files provably out of the
    delete's partition scope, and files written AT/after the delete's
    sequence number."""
    from iceberg_tools_spark.iceberg.rewrite_data import _equality_affected

    def d(rel, part, seq):
        return {"rel": rel, "partition": part, "sequence_number": seq,
                "content": 0}

    dels = [{"content": 2, "partition": {"cat": "b"},
             "sequence_number": 5, "rel": "del"}]
    data = [
        d("in-scope-old", {"cat": "b"}, 4),       # affected
        d("other-part", {"cat": "a"}, 4),          # provably out
        d("same-seq", {"cat": "b"}, 5),            # strict gate: out
        d("newer", {"cat": "b"}, 6),               # out
        d("cross-spec", {"bucket": 3}, 4),         # conservative: in
        d("null-part", {"cat": None}, 4),          # scope differs: out
    ]
    assert _equality_affected(data, dels) == {"in-scope-old", "cross-spec"}
    # a null-scoped delete hits only the null partition
    dels_null = [{"content": 2, "partition": {"cat": None},
                  "sequence_number": 5, "rel": "del"}]
    assert _equality_affected(data, dels_null) == {"null-part", "cross-spec"}


def test_equality_affected_spec_id_gates_value_exclusion():
    """ADVICE r9: a partition field NAME reused across specs (same
    source column, different transform) makes values differ
    spuriously — the value-based exclusion must apply only when the
    data entry's spec_id matches the delete's; cross-spec files stay
    conservatively affected."""
    from iceberg_tools_spark.iceberg.rewrite_data import _equality_affected

    dels = [{"content": 2, "partition": {"cat": "b"}, "spec_id": 1,
             "sequence_number": 5, "rel": "del"}]
    data = [
        # same spec, different value: provably out of scope
        {"rel": "same-spec-out", "partition": {"cat": "a"}, "spec_id": 1,
         "sequence_number": 4, "content": 0},
        # same NAME, different spec (e.g. bucket[4] vs bucket[8] of
        # the same column): values are incomparable — keep affected
        {"rel": "cross-spec-same-name", "partition": {"cat": "a"},
         "spec_id": 2, "sequence_number": 4, "content": 0},
        # same spec, matching value: affected
        {"rel": "same-spec-in", "partition": {"cat": "b"}, "spec_id": 1,
         "sequence_number": 4, "content": 0},
    ]
    assert _equality_affected(data, dels) == {
        "cross-spec-same-name", "same-spec-in"
    }


def test_binpack_after_rename_preserves_column_values(spark, tmp_path):
    """ADVICE r8 (medium): binpack must project packed files through
    the current schema (name mapping) like the fold rewrite — a
    plain name union null-fills the renamed column of pre-rename
    files and the REPLACE commit persists the nulls."""
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.deletes import read_mor_projected
    from iceberg_tools_spark.iceberg.evolution import evolve_schema
    from iceberg_tools_spark.iceberg.rewrite_data import binpack_rewrite

    mp, root = _scratch_table(
        tmp_path,
        [("a", [list(range(0, 10)), list(range(10, 20))])],
        name="bprn",
    )
    before = sorted(
        (r.id, r.ident) for r in read_mor_projected(
            spark,
            evolve_schema(mp, rename={"cat": "ident"})["metadata_path"],
            1,
            root,
        ).collect()
    )
    evo_mp = os.path.join(root, "v3.metadata.json")
    res = binpack_rewrite(spark, evo_mp, target_size_bytes=1 << 20)
    after_df = read_mor_projected(
        spark, res["metadata_path"], res["snapshot_id"], root
    )
    after = sorted((r.id, r.ident) for r in after_df.collect())
    assert after == before
    # the physical rewritten file carries real values, no null-fill
    (g,) = res["groups"]
    new_rel = f"data/binpack-{res['snapshot_id']}-g0000.parquet"
    t = pq.read_table(os.path.join(root, new_rel))
    name = "ident" if "ident" in t.schema.names else "cat"
    assert t.column(name).null_count == 0


def test_rewrite_preserves_row_lineage(spark, tmp_path):
    """r15 (found by the row-tracking bridge): compaction on a v3
    table must PRESERVE row lineage — the replacement files
    materialize the spec's reserved ``_row_id`` /
    ``_last_updated_sequence_number`` columns, the rebuilt manifests
    keep carried-forward entries' first_row_id, and the lineage read
    shows the ORIGINAL ids after the fold (plain reads never leak
    the reserved columns)."""
    from iceberg_tools_spark.iceberg.commit import append_snapshot
    from iceberg_tools_spark.iceberg.deletes import (
        read_mor,
        read_mor_lineage,
    )
    from iceberg_tools_spark.iceberg.dml import delete_where
    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files
    from tests.test_dv import _fresh_v3_table, _pq_write

    root, mp = _fresh_v3_table(tmp_path)
    _pq_write(root, "data/X.parquet", [1, 2, 3, 4], "a")
    s1 = append_snapshot(mp, [{"path": "data/X.parquet", "partition": {}}])
    _pq_write(root, "data/Y.parquet", [10, 11], "b")
    s2 = append_snapshot(
        s1["metadata_path"], [{"path": "data/Y.parquet", "partition": {}}]
    )
    before = {
        r["id"]: r["_row_id"]
        for r in read_mor_lineage(
            spark, s2["metadata_path"], s2["snapshot_id"], root
        ).collect()
    }
    assert before == {1: 0, 2: 1, 3: 2, 4: 3, 10: 4, 11: 5}
    # position-delete id=2, then FOLD X (Y's manifest entry is
    # carried forward through the rebuilt manifest)
    s3 = delete_where(spark, s2["metadata_path"], "id = 2", base_dir=root)
    res = rewrite_data_files(spark, s3["metadata_path"], base_dir=root)
    after = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in read_mor_lineage(
            spark, res["metadata_path"], res["snapshot_id"], root
        ).collect()
    }
    # survivors keep their ORIGINAL row ids through the rewrite
    assert {i: rid for i, (rid, _s) in after.items()} == {
        1: 0, 3: 2, 4: 3, 10: 4, 11: 5}
    # ...and their original data sequence numbers (the rewrite is
    # not a content change)
    assert after[1][1] == 1 and after[10][1] == 2
    # the plain read neither leaks the reserved columns nor the rows
    plain = read_mor(spark, res["metadata_path"], res["snapshot_id"], root)
    assert "_row_id" not in plain.columns
    assert sorted(r["id"] for r in plain.collect()) == [1, 3, 4, 10, 11]
