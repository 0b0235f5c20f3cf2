"""Row-level CDC changelog × Structured Streaming: consume a
snapshot range's net INSERT/DELETE rows as micro-batches, ONE
COMMIT PER BATCH — the "subscribe to a table's changes" feed a
downstream incremental materialization runs on.

Composition of two existing pieces (same pattern as
``streaming/incremental.py``):

* ``changelog.changelog_between`` — per-commit net change rows
  derived from metadata increments (scans only CHANGED files);
* the file-stream source with ``maxFilesPerTrigger=1`` over a
  staging directory holding ONE parquet file per commit, named in
  commit order — so the stream replays commits in order and each
  micro-batch is exactly one commit's delta (the transactional
  granularity a CDC consumer needs; processing two commits' rows
  in one batch could observe a row's DELETE before its INSERT).

Staging is the local stand-in for a changelog topic/queue: the
planning half (which rows changed, attributed to which commit) and
the consumption half (ordered, rate-limited micro-batches) are the
production shape; only the hand-off medium differs.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..iceberg.changelog import changelog_between
from ..iceberg.metadata import parse_metadata
from ..iceberg.snapshots import ancestor_chain

_GATE_SEQ = itertools.count()


def changelog_stream(
    spark: SparkSession,
    metadata_path: str,
    from_id: int,
    to_id: int,
    staging_dir: str,
    base_dir: str | None = None,
) -> tuple[DataFrame, int]:
    """Streaming DataFrame over the changelog of ``(from_id,
    to_id]`` plus the number of commits staged (== micro-batches a
    ``maxFilesPerTrigger=1`` drain will see). Raises on an empty
    range like the incremental file stream."""
    from ..iceberg.rewrite_data import _write_single_parquet

    base_dir = base_dir or os.path.dirname(metadata_path)
    meta = parse_metadata(metadata_path)
    chain = ancestor_chain(meta, to_id)
    if from_id not in chain:
        raise ValueError(
            f"snapshot {from_id} is not an ancestor of {to_id}; "
            "changelog undefined across branches"
        )
    sids = list(reversed(chain[: chain.index(from_id)]))  # oldest first
    if not sids:
        raise ValueError(f"empty snapshot range ({from_id}, {to_id}]")

    if os.path.isdir(staging_dir):
        shutil.rmtree(staging_dir)
    os.makedirs(staging_dir)
    prev = from_id
    schema = None
    for i, sid in enumerate(sids):
        batch = changelog_between(spark, metadata_path, prev, sid, base_dir)
        schema = batch.schema
        _write_single_parquet(
            batch, os.path.join(staging_dir, f"{i:05d}-snap-{sid}.parquet")
        )
        prev = sid
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
    )
    return stream, len(sids)


# ------------------------------------------------ driver-gate query


def changelog_stream_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: the MoR fixture's full CDC history (2001 →
    2004) consumed THROUGH the commit-per-batch stream and drained
    to a memory sink. The oracle is the same independent
    full-materialization diff `changelog_rows` uses (DuckDB EXCEPT
    ALL over every snapshot's visible row set) — certifying that
    streamed CDC consumption loses/dups/reorders nothing vs the
    batch changelog. (``sf_dir`` unused.)"""
    import tempfile

    from ..iceberg.deletes import MOR_METADATA
    from .jobs import run_to_memory

    seq = next(_GATE_SEQ)
    name = f"cdc_stream_gate_rows_{seq}"
    staging = tempfile.mkdtemp(prefix=f"cdc_stream_gate_{seq}_")
    try:
        stream, _ = changelog_stream(spark, MOR_METADATA, 2001, 2004, staging)
        got = run_to_memory(stream, name)
        out = got.orderBy("snapshot_id", "change_type", "id").select(
            "snapshot_id", "change_type", "id", "category"
        )
        rows = out.collect()  # materialize BEFORE the memory sink's
        # temp view drops (same containment as the incremental
        # stream gate; the changelog is bounded by design)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        spark.catalog.dropTempView(name)


def _sql() -> str:
    from ..iceberg.changelog import CHANGELOG_SQL

    return CHANGELOG_SQL


CHANGELOG_STREAM_SQL = _sql()
