"""Row-level CDC changelog tests (iceberg/changelog.py): per-commit
net changes on the MoR fixture, consistency with full MoR reads, and
the cross-branch guard."""

from __future__ import annotations

import pytest

from iceberg_tools_spark.iceberg.changelog import changelog_between, changelog_rows
from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA, read_mor


def test_changelog_per_commit_counts(spark):
    rows = changelog_rows(spark, None).collect()
    by = {}
    for r in rows:
        by[(r.snapshot_id, r.change_type)] = by.get((r.snapshot_id, r.change_type), 0) + 1
    assert by == {
        (2002, "INSERT"): 150,
        (2003, "DELETE"): 17,
        (2004, "INSERT"): 40,
    }


def test_changelog_deletes_are_the_mor_victims(spark):
    """The 2003 DELETE rows are exactly visible(2002) − visible(2003)."""
    dels = {
        (r.id, r.category)
        for r in changelog_between(spark, MOR_METADATA, 2002, 2003, MOR_DIR).collect()
        if r.change_type == "DELETE"
    }
    vis2 = {(r.id, r.category) for r in read_mor(spark, MOR_METADATA, 2002, MOR_DIR).collect()}
    vis3 = {(r.id, r.category) for r in read_mor(spark, MOR_METADATA, 2003, MOR_DIR).collect()}
    assert dels == vis2 - vis3
    assert len(dels) == 17


def test_changelog_replays_to_current_state(spark):
    """Folding the whole changelog over visible(2001) must reproduce
    visible(2004) — the CDC consumer's contract."""
    state = {
        (r.id, r.category) for r in read_mor(spark, MOR_METADATA, 2001, MOR_DIR).collect()
    }
    changes = changelog_between(spark, MOR_METADATA, 2001, 2004, MOR_DIR).collect()
    for r in sorted(changes, key=lambda r: (r.snapshot_id, r.change_type != "DELETE")):
        key = (r.id, r.category)
        if r.change_type == "DELETE":
            state.discard(key)
        else:
            state.add(key)
    vis4 = {(r.id, r.category) for r in read_mor(spark, MOR_METADATA, 2004, MOR_DIR).collect()}
    assert state == vis4


def test_changelog_empty_range(spark):
    df = changelog_between(spark, MOR_METADATA, 2003, 2003, MOR_DIR)
    assert df.count() == 0
    assert df.columns == ["snapshot_id", "change_type", "id", "category"]


def test_changelog_cross_branch_raises(spark):
    with pytest.raises(ValueError, match="not an ancestor"):
        changelog_between(spark, MOR_METADATA, 2004, 2001, MOR_DIR)
