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
