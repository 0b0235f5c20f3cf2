"""Table-maintenance planners + parquet compaction executor.

The operational half of the reference's capability: the stats that
`manifest2json` exposes (file sizes, record counts, partitions) are
exactly what drives compaction and snapshot-expiry decisions. The
planners are pure DataFrame plans over the metadata tables; the
executor rewrites a real parquet dataset.

Scale notes: bin-packing runs per-partition inside a window (one
shuffle on the partition key); at 100 TB the metadata table itself
is millions of rows — still tiny for a cluster. The compaction
executor writes ceil(bytes/target) files via ``repartition`` —
a full shuffle of the data being compacted, which is inherent to
re-binning, and AQE coalesces the output.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .metadata import TableMetadata


def plan_compaction(
    files: DataFrame,
    target_size_bytes: int,
    partition_col: str = "partition_json",
    size_col: str = "file_size_in_bytes",
    path_col: str = "file_path",
) -> DataFrame:
    """Bin-pack small files into ≈target-size rewrite groups within
    each partition (Iceberg binpack-rewrite planning).

    Deterministic first-fit: files ordered largest-first (unique-key
    tiebreak), group id = floor(exclusive-cumulative-size / target).
    Every file lands in exactly one group; a group exceeds the
    target only when a single file already does.
    """
    w = Window.partitionBy(partition_col).orderBy(F.col(size_col).desc(), F.col(path_col))
    cum_excl = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    planned = files.select(
        partition_col,
        path_col,
        size_col,
        F.floor(cum_excl / F.lit(target_size_bytes)).cast("bigint").alias("group_id"),
    )
    return (
        planned.groupBy(partition_col, "group_id")
        .agg(
            F.collect_list(path_col).alias("files"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(size_col).alias("group_bytes"),
        )
        .orderBy(partition_col, "group_id")
    )


def plan_expire_snapshots(
    meta: TableMetadata,
    keep_last: int = 1,
    older_than_ms: int | None = None,
) -> list[dict]:
    """Snapshot-expiry plan: always keep the current snapshot and the
    `keep_last` most recent; optionally expire only those older than
    `older_than_ms`. Returns [{snapshot_id, timestamp_ms, action,
    reason}] sorted by timestamp."""
    snaps = sorted(meta.snapshots, key=lambda s: (s.get("timestamp-ms") or 0, s.get("snapshot-id")))
    keep_ids = {s.get("snapshot-id") for s in snaps[-keep_last:]} if keep_last else set()
    if meta.current_snapshot_id is not None:
        keep_ids.add(meta.current_snapshot_id)
    plan = []
    for s in snaps:
        sid, ts = s.get("snapshot-id"), s.get("timestamp-ms")
        if sid in keep_ids:
            action, reason = "keep", "current-or-recent"
        elif older_than_ms is not None and (ts or 0) >= older_than_ms:
            action, reason = "keep", "newer-than-cutoff"
        else:
            action, reason = "expire", "aged-out"
        plan.append({"snapshot_id": sid, "timestamp_ms": ts, "action": action, "reason": reason})
    return plan


def find_orphan_files(listing: DataFrame, files: DataFrame, path_col: str = "file_path") -> DataFrame:
    """Files present in a filesystem listing but referenced by no
    live manifest entry — a broadcast-able anti-join when the
    metadata side is small, a shuffle anti-join otherwise."""
    referenced = files.select(F.col(path_col).alias("ref_path")).distinct()
    return listing.join(
        referenced, listing[path_col] == referenced["ref_path"], "left_anti"
    )


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a (small-file) parquet dataset into ≈target-size
    files; returns the number of output files written. The
    executable analogue of a binpack rewrite on plain parquet."""
    total = 0
    for root, _, names in os.walk(in_path):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        spark.read.parquet(in_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
