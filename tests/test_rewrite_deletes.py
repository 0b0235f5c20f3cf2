"""Rewrite-position-deletes execution: table-content invariance,
dangling-delete dropping, equality-delete carry-forward, sequence
preservation, and output ordering."""

from __future__ import annotations

import os
import shutil

import pytest

from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
from iceberg_tools_spark.iceberg.metadata import parse_metadata
from iceberg_tools_spark.iceberg.rewrite_deletes import rewrite_position_deletes


def _scratch(tmp_path):
    root = tmp_path / "t"
    shutil.copytree(MOR_DIR, root)
    return str(root)


def _rows(spark, metadata_path, snapshot_id, root):
    return sorted(
        tuple(r)
        for r in read_mor(spark, metadata_path, snapshot_id, base_dir=root)
        .select("id", "category")
        .collect()
    )


def test_read_identical_before_and_after(spark, tmp_path):
    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    before = _rows(spark, mp, 2004, root)
    res = rewrite_position_deletes(spark, mp)
    after = _rows(spark, res["metadata_path"], res["snapshot_id"], root)
    assert before == after
    assert len(after) == 323
    # no dangling deletes in the fixture: all 15 rows survive
    assert res["rows_before"] == 15 and res["rows_after"] == 15
    assert res["removed_files"] == 1 and res["added_files"] == 1


def test_compacted_file_is_sorted_and_live_only(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.rewrite_data import rewrite_data_files

    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    r1 = rewrite_data_files(spark, mp, target_rels=["data/category=x/A.parquet"])
    r2 = rewrite_position_deletes(spark, r1["metadata_path"])
    assert r2["rows_before"] == 15 and r2["rows_after"] == 5  # A's 10 dangled
    [pd_path] = glob.glob(os.path.join(root, "data", "deletes", "pd-rw*.parquet"))
    t = pq.read_table(pd_path).to_pydict()
    pairs = list(zip(t["file_path"], t["pos"]))
    assert pairs == sorted(pairs)  # spec ordering: (file_path, pos)
    assert all("C.parquet" in p for p, _ in pairs)  # only the live target


def test_equality_deletes_survive_rewrite(spark, tmp_path):
    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    res = rewrite_position_deletes(spark, mp)
    ids = {
        r[0]
        for r in read_mor(spark, res["metadata_path"], res["snapshot_id"], base_dir=root)
        .select("id")
        .collect()
    }
    assert 260 not in ids and 270 not in ids  # ed1 still applies to D
    assert 1 not in ids and 151 not in ids  # compacted pd still applies


def test_sequence_gate_preserved_for_later_data(spark, tmp_path):
    # F was appended at seq 4 > the deletes' seq 3: it must stay
    # untouched by the compacted delete file (explicit seq 3), and
    # the new snapshot's OWN sequence must not leak into gating
    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    res = rewrite_position_deletes(spark, mp)
    meta = parse_metadata(res["metadata_path"])
    from iceberg_tools_spark.iceberg.deletes import mor_entries_at

    _, dels = mor_entries_at(meta, res["snapshot_id"], root)
    pos = [d for d in dels if d["content"] == 1]
    assert [d["sequence_number"] for d in pos] == [3]  # preserved, not 5
    f_rows = [
        r
        for r in read_mor(spark, res["metadata_path"], res["snapshot_id"], base_dir=root)
        .filter("category = 'w'")
        .collect()
    ]
    assert len(f_rows) == 40


def test_no_position_deletes_raises(spark, tmp_path):
    # the evolution fixture has no delete files at all
    evo = os.path.join(os.path.dirname(__file__), "fixtures", "evolution")
    root = tmp_path / "evo"
    shutil.copytree(evo, root)
    with pytest.raises(ValueError, match="no positional delete parquet files"):
        rewrite_position_deletes(spark, str(root / "v5.metadata.json"))


def test_chained_with_expiry_readable(spark, tmp_path):
    # the compaction composes with the rest of the lifecycle: the
    # new snapshot time-travels and the old one still reads
    root = _scratch(tmp_path)
    mp = os.path.join(root, "v2.metadata.json")
    res = rewrite_position_deletes(spark, mp)
    assert _rows(spark, res["metadata_path"], 2004, root) == _rows(
        spark, res["metadata_path"], res["snapshot_id"], root
    )
