"""Incremental view maintenance: the maintained aggregate must be
indistinguishable from a full recompute — one hop, two hops, and
group drop-out."""

from __future__ import annotations

from iceberg_tools_spark.iceberg.changelog import changelog_between
from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA, read_mor
from iceberg_tools_spark.iceberg.ivm import grouped_agg, maintain_grouped_agg


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _recompute(spark, snapshot_id):
    return grouped_agg(
        read_mor(spark, MOR_METADATA, snapshot_id, MOR_DIR), ["category"], ["id"]
    )


def test_one_hop_equals_recompute(spark):
    base = _recompute(spark, 2001)
    deltas = changelog_between(spark, MOR_METADATA, 2001, 2004, MOR_DIR)
    maintained = maintain_grouped_agg(base, deltas, ["category"], ["id"])
    assert _rows(maintained) == _rows(_recompute(spark, 2004))


def test_two_hops_equal_one_hop(spark):
    base = _recompute(spark, 2001)
    hop1 = maintain_grouped_agg(
        base,
        changelog_between(spark, MOR_METADATA, 2001, 2003, MOR_DIR),
        ["category"],
        ["id"],
    )
    hop2 = maintain_grouped_agg(
        hop1,
        changelog_between(spark, MOR_METADATA, 2003, 2004, MOR_DIR),
        ["category"],
        ["id"],
    )
    assert _rows(hop2) == _rows(_recompute(spark, 2004))
    # and each intermediate state is itself a faithful recompute
    assert _rows(hop1) == _rows(_recompute(spark, 2003))


def test_group_dropout_and_birth(spark):
    # a group whose count reaches 0 vanishes; a brand-new group
    # appears via the full-outer join — both without touching base
    base = grouped_agg(
        spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, category string"),
        ["category"],
        ["id"],
    )
    changelog = spark.createDataFrame(
        [
            (10, "DELETE", 3, "b"),  # b's only row → group drops
            (10, "INSERT", 9, "c"),  # new group c is born
            (10, "DELETE", 1, "a"),
            (10, "INSERT", 5, "a"),
        ],
        "snapshot_id long, change_type string, id long, category string",
    )
    out = _rows(maintain_grouped_agg(base, changelog, ["category"], ["id"]))
    assert out == [("a", 2, 7), ("c", 1, 9)]


def test_stream_maintained_view_equals_recompute(spark, tmp_path):
    from iceberg_tools_spark.streaming.ivm import maintain_view_stream

    res = maintain_view_stream(
        spark,
        MOR_METADATA,
        2001,
        2004,
        str(tmp_path / "staging"),
        str(tmp_path / "view"),
        ["category"],
        ["id"],
        base_dir=MOR_DIR,
    )
    assert res["n_batches"] == 3  # one per source commit
    got = _rows(spark.read.parquet(res["view_path"]))
    assert got == _rows(_recompute(spark, 2004))


# --------------------------------------- materialized views (r9)


class TestMaterializedView:
    def _mk(self, spark, tmp_path):
        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import create_materialized_view

        root = str(tmp_path / "mv")
        return root, create_materialized_view(
            spark, root, MOR_METADATA,
            keys=["category"], sums=["id"],
            base_dir=MOR_DIR, snapshot_id=2001,
        )

    def test_refresh_matches_full_recompute(self, spark, tmp_path):
        from iceberg_tools_spark.iceberg.deletes import (
            MOR_DIR,
            MOR_METADATA,
            read_mor,
        )
        from iceberg_tools_spark.iceberg.ivm import (
            grouped_agg,
            read_materialized_view,
            refresh_materialized_view,
        )

        root, res = self._mk(spark, tmp_path)
        ref = refresh_materialized_view(
            spark, res["view_metadata_path"], MOR_METADATA, base_dir=MOR_DIR
        )
        assert ref["refreshed"] and ref["to_snapshot"] == 2004
        got = sorted(
            map(tuple, read_materialized_view(
                spark, ref["view_metadata_path"]
            ).select("category", "n_rows", "id_sum").collect())
        )
        want = sorted(
            map(tuple, grouped_agg(
                read_mor(spark, MOR_METADATA, 2004, MOR_DIR),
                ["category"], ["id"],
            ).collect())
        )
        assert got == want

    def test_stepwise_equals_single_refresh(self, spark, tmp_path):
        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import (
            read_materialized_view,
            refresh_materialized_view,
        )

        root, res = self._mk(spark, tmp_path)
        vmp = res["view_metadata_path"]
        for sid in (2002, 2003, 2004):
            vmp = refresh_materialized_view(
                spark, vmp, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=sid
            )["view_metadata_path"]
        stepped = sorted(
            map(tuple, read_materialized_view(spark, vmp).collect())
        )
        root2, res2 = self._mk(spark, tmp_path / "b")
        vmp2 = refresh_materialized_view(
            spark, res2["view_metadata_path"], MOR_METADATA, base_dir=MOR_DIR
        )["view_metadata_path"]
        assert stepped == sorted(
            map(tuple, read_materialized_view(spark, vmp2).collect())
        )

    def test_noop_when_current_and_uuid_guard(self, spark, tmp_path):
        import os

        import pytest

        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import refresh_materialized_view

        root, res = self._mk(spark, tmp_path)
        noop = refresh_materialized_view(
            spark, res["view_metadata_path"], MOR_METADATA,
            base_dir=MOR_DIR, to_snapshot=2001,
        )
        assert not noop["refreshed"]
        assert noop["view_metadata_path"] == res["view_metadata_path"]
        # a different base table is refused
        import json
        import shutil

        other = str(tmp_path / "other")
        shutil.copytree(MOR_DIR, other)
        mp2 = os.path.join(other, "v2.metadata.json")
        raw = json.load(open(mp2))
        raw["table-uuid"] = "11111111-2222-3333-4444-555555555555"
        json.dump(raw, open(mp2, "w"))
        with pytest.raises(ValueError, match="tracks base table"):
            refresh_materialized_view(
                spark, res["view_metadata_path"], mp2, base_dir=other
            )

    def test_crash_safety_old_state_survives(self, spark, tmp_path):
        """write-then-swap: the pre-refresh metadata still reads the
        OLD state after a refresh (view time travel for MVs)."""
        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import (
            read_materialized_view,
            refresh_materialized_view,
        )

        root, res = self._mk(spark, tmp_path)
        before = sorted(
            map(tuple, read_materialized_view(
                spark, res["view_metadata_path"]
            ).collect())
        )
        refresh_materialized_view(
            spark, res["view_metadata_path"], MOR_METADATA, base_dir=MOR_DIR
        )
        after_old_pointer = sorted(
            map(tuple, read_materialized_view(
                spark, res["view_metadata_path"]
            ).collect())
        )
        assert after_old_pointer == before

    def test_state_expiry_keeps_referenced(self, spark, tmp_path):
        """Superseded MV states GC like expired snapshots; the
        states the newest metadata versions reference survive."""
        import os

        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import (
            expire_materialized_view_states,
            read_materialized_view,
            refresh_materialized_view,
        )

        root, res = self._mk(spark, tmp_path)
        vmp = res["view_metadata_path"]
        for sid in (2002, 2003, 2004):
            vmp = refresh_materialized_view(
                spark, vmp, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=sid
            )["view_metadata_path"]
        out = expire_materialized_view_states(vmp, keep_last=2)
        assert out["removed"] == ["data/state-2001", "data/state-2002"]
        assert "data/state-2004" in out["kept"]
        assert read_materialized_view(spark, vmp).count() > 0
        assert not os.path.exists(os.path.join(root, "data", "state-2001"))

    def test_refresh_to_non_ancestor_raises(self, spark, tmp_path):
        """A refresh target off the tracked ancestor chain raises
        (changelog undefined across branches) instead of silently
        corrupting the state."""
        import pytest

        from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
        from iceberg_tools_spark.iceberg.ivm import refresh_materialized_view

        root, res = self._mk(spark, tmp_path)
        with pytest.raises(ValueError, match="ancestor|not in log|undefined"):
            refresh_materialized_view(
                spark, res["view_metadata_path"], MOR_METADATA,
                base_dir=MOR_DIR, to_snapshot=999999,
            )


# ---- MIN/MAX maintenance (r10: VERDICT r9 #7) --------------------


def _mm_base(spark, tmp_path, rows):
    """Write a tiny base table to parquet so predicate pushdown on
    the group-scoped recompute is observable in the scan."""
    p = str(tmp_path / "mm_base")
    spark.createDataFrame(rows, "id long, category string").write.parquet(p)
    return spark.read.parquet(p)


def test_minmax_delete_of_current_min_recomputes_one_group(spark, tmp_path):
    """A delete AT group a's current min forces a's recompute — and
    the base read is scoped to exactly that group (pushed filter),
    while group b folds incrementally."""
    from pyspark.sql import functions as F

    base_rows = [(1, "a"), (2, "a"), (5, "a"), (3, "b"), (4, "b")]
    base = grouped_agg(
        spark.createDataFrame(base_rows, "id long, category string"),
        ["category"], ["id"], ["id"], ["id"],
    )
    changelog = spark.createDataFrame(
        [(10, "DELETE", 1, "a"), (10, "INSERT", 7, "b")],
        "snapshot_id long, change_type string, id long, category string",
    )
    # base AT the target snapshot (post-changelog state)
    target = _mm_base(spark, tmp_path, [(2, "a"), (5, "a"), (3, "b"), (4, "b"), (7, "b")])
    out = maintain_grouped_agg(
        base, changelog, ["category"], ["id"],
        mins=["id"], maxs=["id"], base_df=target,
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [("a", 2, 7, 2, 5), ("b", 3, 14, 3, 7)]
    # plan contract: the parquet base scan carries the one-group
    # IN-list as a pushed filter — b never re-reads the base
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    scan_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(category,a)" in ln for ln in scan_lines)
    assert not any("EqualTo(category,b)" in ln for ln in scan_lines)


def test_minmax_inner_delete_folds_without_base_scan(spark, tmp_path):
    """A delete strictly inside the extremum range never touches the
    base: MIN/MAX fold with least/greatest over inserts only."""
    base = grouped_agg(
        spark.createDataFrame(
            [(1, "a"), (2, "a"), (5, "a")], "id long, category string"
        ),
        ["category"], ["id"], ["id"], ["id"],
    )
    changelog = spark.createDataFrame(
        [(10, "DELETE", 2, "a"), (10, "INSERT", 0, "a"), (10, "INSERT", 9, "a")],
        "snapshot_id long, change_type string, id long, category string",
    )
    target = _mm_base(spark, tmp_path, [(1, "a"), (5, "a"), (0, "a"), (9, "a")])
    out = maintain_grouped_agg(
        base, changelog, ["category"], ["id"],
        mins=["id"], maxs=["id"], base_df=target,
    )
    assert sorted(map(tuple, out.collect())) == [("a", 4, 15, 0, 9)]
    # no affected group → the returned plan is the folded branch,
    # with no parquet scan of the base at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "mm_base" not in plan


def test_minmax_requires_base_df(spark):
    import pytest as _pytest

    base = grouped_agg(
        spark.createDataFrame([(1, "a")], "id long, category string"),
        ["category"], ["id"], ["id"], [],
    )
    changelog = spark.createDataFrame(
        [(10, "DELETE", 1, "a")],
        "snapshot_id long, change_type string, id long, category string",
    )
    with _pytest.raises(ValueError, match="requires base_df"):
        maintain_grouped_agg(
            base, changelog, ["category"], ["id"], mins=["id"]
        )


def test_minmax_mv_refresh_equals_recompute(spark, tmp_path):
    """End-to-end MV with MIN/MAX through the MoR insert/delete/insert
    chain: the incrementally maintained state equals a full recompute
    at the head snapshot."""
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA, read_mor
    from iceberg_tools_spark.iceberg.ivm import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )

    root = str(tmp_path / "mv_mm")
    res = create_materialized_view(
        spark, root, MOR_METADATA,
        keys=["category"], sums=["id"], mins=["id"], maxs=["id"],
        base_dir=MOR_DIR, snapshot_id=2001,
    )
    vmp = res["view_metadata_path"]
    # stepwise through every snapshot, so the MoR delete commit's
    # recompute path runs in isolation too
    for sid in (2002, 2003, 2004):
        vmp = refresh_materialized_view(
            spark, vmp, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=sid
        )["view_metadata_path"]
        want = sorted(map(tuple, grouped_agg(
            read_mor(spark, MOR_METADATA, sid, MOR_DIR),
            ["category"], ["id"], ["id"], ["id"],
        ).collect()))
        got = sorted(map(tuple, read_materialized_view(spark, vmp).collect()))
        assert got == want, f"divergence at snapshot {sid}"


def test_refresh_version_numbering_survives_deletion(spark, tmp_path):
    """ADVICE r9: the next metadata version is max(vN)+1, so deleting
    an old version file can no longer collide-and-overwrite a live
    one; and a stale unreferenced state dir from a crashed refresh is
    cleared on retry."""
    import os

    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
    from iceberg_tools_spark.iceberg.ivm import (
        create_materialized_view,
        read_materialized_view,
        refresh_materialized_view,
    )

    root = str(tmp_path / "mv_vnum")
    res = create_materialized_view(
        spark, root, MOR_METADATA,
        keys=["category"], sums=["id"],
        base_dir=MOR_DIR, snapshot_id=2001,
    )
    vmp = res["view_metadata_path"]
    vmp2 = refresh_materialized_view(
        spark, vmp, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=2002
    )["view_metadata_path"]
    # delete v1: a file-count scheme would now reuse the LIVE v2 name
    os.remove(vmp)
    vmp3 = refresh_materialized_view(
        spark, vmp2, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=2003
    )["view_metadata_path"]
    assert os.path.basename(vmp3) == "v3.metadata.json"
    assert os.path.exists(vmp2)  # the live v2 was not overwritten

    # crashed-refresh retry: plant a stale state dir for the NEXT
    # target snapshot; the retry must clear and rewrite it
    stale = os.path.join(root, "data", "state-2004")
    os.makedirs(stale)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("partial")
    vmp4 = refresh_materialized_view(
        spark, vmp3, MOR_METADATA, base_dir=MOR_DIR, to_snapshot=2004
    )["view_metadata_path"]
    assert not os.path.exists(os.path.join(stale, "junk"))
    assert read_materialized_view(spark, vmp4).count() > 0
