"""Incremental scan × streaming composition: streamed consumption of
a snapshot range's added files equals the batch time-travel diff
``files_at(to) − files_at(from)`` (VERDICT r5 "Next round" #5), on
the physical MoR fixture.

Fixture chain (scripts/gen_mor_fixture.py): 2001 adds A,B → 2002
adds C,D → 2003 is a DELETE snapshot (adds delete files, no data) →
2004 adds F.
"""

from __future__ import annotations

import pytest

from iceberg_tools_spark.iceberg.deletes import MOR_METADATA
from iceberg_tools_spark.iceberg.snapshots import files_at
from iceberg_tools_spark.streaming.incremental import (
    added_data_file_paths,
    incremental_scan_stream,
)
from iceberg_tools_spark.streaming.jobs import run_to_memory


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def _batch_ids_at(spark, snapshot_id):
    import os

    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.iceberg.snapshots import _local

    base_dir = os.path.dirname(MOR_METADATA)
    loc = parse_metadata(MOR_METADATA).raw.get("location")
    paths = [
        _local(r.file_path, base_dir, loc)
        for r in files_at(spark, MOR_METADATA, snapshot_id).collect()
    ]
    return sorted(_ids(spark.read.parquet(*paths)))


def test_planned_paths_match_chain_attribution():
    # 2001→2002 added C and D; 2002→2004 added only F (2003 is the
    # delete snapshot: no data files)
    p12 = added_data_file_paths(MOR_METADATA, 2001, 2002)
    assert sorted(p.rsplit("/", 1)[-1] for p in p12) == ["C.parquet", "D.parquet"]
    p24 = added_data_file_paths(MOR_METADATA, 2002, 2004)
    assert [p.rsplit("/", 1)[-1] for p in p24] == ["F.parquet"]


def test_stream_equals_time_travel_diff(spark, tmp_path):
    stream = incremental_scan_stream(
        spark, MOR_METADATA, 2001, 2002, str(tmp_path / "stage")
    )
    assert stream.isStreaming
    got = run_to_memory(stream, "inc_2001_2002")
    to_ids = _batch_ids_at(spark, 2002)
    from_ids = _batch_ids_at(spark, 2001)
    assert _ids(got) == sorted(set(to_ids) - set(from_ids))


def test_stream_across_delete_snapshot(spark, tmp_path):
    # (2002, 2004] spans the delete snapshot 2003: the data increment
    # is exactly F's rows — delete files are planning input for the
    # MoR reader, never rows in the append stream
    stream = incremental_scan_stream(
        spark, MOR_METADATA, 2002, 2004, str(tmp_path / "stage")
    )
    got = run_to_memory(stream, "inc_2002_2004")
    assert _ids(got) == list(range(301, 341))  # F holds ids 301..340


def test_micro_batch_rate_limit(spark, tmp_path):
    # maxFilesPerTrigger=1 over a 2-file increment → ≥2 micro-batches
    stream = incremental_scan_stream(
        spark, MOR_METADATA, 2001, 2002, str(tmp_path / "stage"), max_files_per_trigger=1
    )
    batches = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: batches.append(df.count())
        ).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) >= 2
    assert sum(batches) == 150  # C (100 raw rows) + D (50 raw rows)


def test_empty_increment_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="added no data files"):
        incremental_scan_stream(
            spark, MOR_METADATA, 2004, 2004, str(tmp_path / "stage")
        )


def test_same_basename_staging(tmp_path):
    # two files with identical basenames in different dirs must both
    # survive staging (the ordinal prefix)
    import os

    from iceberg_tools_spark.streaming.incremental import stage_increment

    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    (d1 / "f.parquet").write_bytes(b"one")
    (d2 / "f.parquet").write_bytes(b"two")
    out = stage_increment([str(d1 / "f.parquet"), str(d2 / "f.parquet")], str(tmp_path / "s"))
    assert len(os.listdir(out)) == 2


# ---------------------------------------- corpus intake stream twin

def test_corpus_intake_stream_equals_batch(spark):
    """Same job body over the documents table: streamed (file
    source, complete mode) == batch, row for row — the
    deterministic min-survivor aggregation makes the comparison
    exact, unlike dropDuplicates' arbitrary-arrival keep."""
    from iceberg_tools_spark.streaming.corpus import (
        batch_documents,
        corpus_intake_survivors,
        documents_stream,
    )
    from .conftest import SF_ORACLE

    batch = sorted(
        corpus_intake_survivors(batch_documents(spark, SF_ORACLE)).collect()
    )
    stream_df = corpus_intake_survivors(documents_stream(spark, SF_ORACLE))
    got = sorted(run_to_memory(stream_df, "corpus_intake", mode="complete").collect())
    assert got == batch
    assert len(batch) > 0
    # survivors are distinct hashes and min ids
    hashes = [r.content_hash for r in batch]
    assert len(hashes) == len(set(hashes))


# ------------------------------ CDC changelog as a stream


def test_changelog_stream_equals_batch(spark, tmp_path):
    from iceberg_tools_spark.iceberg.changelog import changelog_between
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, MOR_METADATA
    from iceberg_tools_spark.streaming.cdc import changelog_stream
    from iceberg_tools_spark.streaming.jobs import run_to_memory

    staging = str(tmp_path / "cdc")
    stream, n_commits = changelog_stream(spark, MOR_METADATA, 2001, 2004, staging)
    assert n_commits == 3  # 2002, 2003, 2004: one micro-batch each
    assert stream.isStreaming
    import os

    assert len([f for f in os.listdir(staging) if f.endswith(".parquet")]) == 3
    got = run_to_memory(stream, "cdc_eq_test")
    try:
        streamed = sorted(
            tuple(r)
            for r in got.select("snapshot_id", "change_type", "id", "category").collect()
        )
        batch = sorted(
            tuple(r)
            for r in changelog_between(spark, MOR_METADATA, 2001, 2004, MOR_DIR)
            .select("snapshot_id", "change_type", "id", "category")
            .collect()
        )
        assert streamed == batch and len(streamed) == 207
    finally:
        spark.catalog.dropTempView("cdc_eq_test")


def test_changelog_stream_empty_range_raises(spark, tmp_path):
    import pytest

    from iceberg_tools_spark.iceberg.deletes import MOR_METADATA
    from iceberg_tools_spark.streaming.cdc import changelog_stream

    with pytest.raises(ValueError, match="empty snapshot range"):
        changelog_stream(spark, MOR_METADATA, 2004, 2004, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="not an ancestor"):
        changelog_stream(spark, MOR_METADATA, 9999, 2004, str(tmp_path / "y"))


def test_cdc_replication_replica_matches_source(spark, tmp_path):
    from iceberg_tools_spark.iceberg.deletes import MOR_METADATA, read_mor
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.streaming.cdc import replicate_changelog

    res = replicate_changelog(
        spark,
        MOR_METADATA,
        2001,
        2004,
        str(tmp_path / "staging"),
        str(tmp_path / "replica"),
    )
    assert res["n_batches"] == 3
    meta = parse_metadata(res["metadata_path"])
    replica = sorted(
        tuple(r)
        for r in read_mor(
            spark, res["metadata_path"], meta.current_snapshot_id, res["target_root"]
        )
        .select("id", "category")
        .collect()
    )
    source = sorted(
        tuple(r)
        for r in read_mor(spark, MOR_METADATA, 2004).select("id", "category").collect()
    )
    assert replica == source and len(replica) == 323
    # the replica carries a real commit HISTORY, not one blob:
    # seed + (2002 insert) + (2003 delete) + (2004 insert)
    assert len(meta.snapshots) == 4
    ops = [s["summary"]["operation"] for s in meta.snapshots]
    assert ops == ["append", "append", "delete", "append"]


def test_cdc_replication_never_collects_row_keys(spark, tmp_path, monkeypatch):
    """VERDICT r6 #1: the replay path must not round-trip delete
    keys through the driver. Audit every DataFrame.collect during
    replication — none may carry the key shape (a bare ``id``
    column); the only legitimate collects are KB-scale planning
    metadata."""
    from pyspark.sql import DataFrame

    from iceberg_tools_spark.iceberg.deletes import MOR_METADATA
    from iceberg_tools_spark.streaming.cdc import replicate_changelog

    seen = []
    orig = DataFrame.collect

    def audit(self):
        seen.append(tuple(self.columns))
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", audit)
    res = replicate_changelog(
        spark, MOR_METADATA, 2001, 2004,
        str(tmp_path / "staging"), str(tmp_path / "replica"),
    )
    assert res["n_batches"] == 3
    assert ("id",) not in seen
    assert ("id", "category") not in seen


# ------------------------------------------- streaming INGEST sink

import os


def test_stream_ingest_restart_is_exactly_once(spark, tmp_path):
    """Round 8: re-running the ingest query over the same inbox +
    checkpoint commits NOTHING new (batch replay hits the on-chain
    markers), and adding a file then re-running commits exactly the
    delta."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.streaming.ingest import (
        ingest_stream_to_table,
        latest_metadata_path,
    )

    root = _scratch_table("ingest_restart_", MOR_DIR)
    mp = os.path.join(root, "v2.metadata.json")
    inbox = os.path.join(root, "_inbox")
    os.makedirs(inbox)

    def drop(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "category": pa.array(["s"] * len(ids))}),
            os.path.join(inbox, name),
        )

    def run():
        stream = (
            spark.readStream.schema("id long, category string")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        return ingest_stream_to_table(
            stream, mp, query_name="restart",
            checkpoint_dir=os.path.join(root, "_ckpt"),
            partition_cols=("category",), spec_id=0,
        )

    drop("a.parquet", [500, 501])
    r1 = run()
    assert r1["batches_committed"] == [0]
    n_snaps_1 = len(parse_metadata(latest_metadata_path(mp)).snapshots)
    r2 = run()  # nothing new: no commit, no snapshot
    assert r2["batches_committed"] == [0]
    assert len(parse_metadata(latest_metadata_path(mp)).snapshots) == n_snaps_1
    drop("b.parquet", [600])
    r3 = run()
    assert r3["batches_committed"] == [0, 1]
    head = latest_metadata_path(mp)
    meta = parse_metadata(head)
    assert read_mor(spark, head, meta.raw["current-snapshot-id"], root).count() == 326


def test_stream_ingest_survives_concurrent_writer(spark):
    """A maintenance/second-writer commit landing between micro-
    batches just rebases the sink's next append (the optimistic-
    concurrency path) — both writers' rows land."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_tools_spark.iceberg.commit import _scratch_table, append_snapshot
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.streaming.ingest import (
        latest_metadata_path,
        make_batch_committer,
    )

    root = _scratch_table("ingest_conc_", MOR_DIR)
    mp = os.path.join(root, "v2.metadata.json")
    committer = make_batch_committer(
        mp, query_name="conc", partition_cols=("category",), spec_id=0
    )
    r0 = committer(spark.createDataFrame([(700, "s")], "id long, category string"), 0)
    assert r0 is not None and r0["retried"] is False
    # external writer commits between batches
    ext = os.path.join(root, "data", "ext.parquet")
    pq.write_table(
        pa.table({"id": pa.array([800], pa.int64()),
                  "category": pa.array(["x"])}), ext)
    append_snapshot(
        latest_metadata_path(mp),
        [{"path": "data/ext.parquet", "partition": {"category": "x"}}],
        base_dir=root, spec_id=0,
    )
    r1 = committer(spark.createDataFrame([(701, "s")], "id long, category string"), 1)
    assert r1 is not None
    head = latest_metadata_path(mp)
    meta = parse_metadata(head)
    ids = {
        r.id for r in read_mor(
            spark, head, meta.raw["current-snapshot-id"], root
        ).collect()
    }
    assert {700, 701, 800} <= ids and len(ids) == 326


def test_streamed_rows_keep_partition_column(spark):
    # round-8 regression pin: the sink's staged parquet must carry
    # the partition COLUMN in-file (partitionBy alone drops it and
    # every later MoR read sees NULL partition values)
    import os

    from iceberg_tools_spark.iceberg.commit import _scratch_table
    from iceberg_tools_spark.iceberg.deletes import MOR_DIR, read_mor
    from iceberg_tools_spark.iceberg.metadata import parse_metadata
    from iceberg_tools_spark.streaming.ingest import (
        latest_metadata_path,
        make_batch_committer,
    )

    root = _scratch_table("sink_pin_", MOR_DIR)
    mp = os.path.join(root, "v2.metadata.json")
    committer = make_batch_committer(
        mp, query_name="pin", partition_cols=("category",), spec_id=0
    )
    committer(spark.createDataFrame([(500, "s")], "id long, category string"), 0)
    head = latest_metadata_path(mp)
    meta = parse_metadata(head)
    (row,) = read_mor(
        spark, head, meta.raw["current-snapshot-id"], root
    ).filter("id = 500").collect()
    assert row["category"] == "s"
