"""Optimistic-concurrency commit validation — the multi-writer half
of the table-lifecycle surface (VERDICT r7 "Next round" #4).

Iceberg writers commit optimistically: stage files against a BASE
metadata version, then at commit time re-read the table's CURRENT
(head) metadata and, if another writer committed meanwhile, either
REBASE (re-apply the operation on the head) or ABORT (the staged
operation's assumptions no longer hold). Which one is legal depends
on the operation — the logic of Iceberg's
``MergingSnapshotProducer.validate()`` chain (public source,
``core/src/main/java/org/apache/iceberg/MergingSnapshotProducer``):

* **append**: always rebase-safe — appended files conflict with
  nothing; the retry simply parents the new snapshot on the head
  (``SnapshotProducer``'s retry loop does exactly this);
* **position-delete row delta**: rebase-safe iff every data file
  the staged deletes reference is STILL LIVE at the head
  (``validateDataFilesExist``) — a concurrent rewrite/compaction
  that replaced a referenced file invalidates the staged (path,
  pos) rows, so the commit must abort and the writer re-plan;
* **equality-delete row delta** under serializable isolation:
  additionally no data file may have been APPENDED since the base
  in a partition the delete's scope can match
  (``validateNoConflictingAppends``/``validateAddedDataFiles``) —
  a rebased eq delete commits at a NEWER sequence number, so
  concurrently-appended matching rows (logically written before
  the delete) would suddenly fall in scope.

All validation is METADATA-scale: live-file sets come from manifest
entries (KB per snapshot), never from reading data. The retry
itself re-runs the ordinary commit builders against the head
metadata, so sequence numbers, manifest inheritance and summaries
stay exactly the single-writer code path's.

Reference anchor: the reference reads what commits write
(ManifestFileReadTool.java) — this module completes the write-side
dual for the multi-writer case its tables come from.
"""

from __future__ import annotations

import os
from typing import Any

from .commit import append_snapshot, commit_delete_snapshot, commit_row_delta
from .deletes import EQUALITY_DELETES, POSITION_DELETES, mor_entries_at
from .metadata import parse_metadata
from .snapshots import ancestor_chain


class CommitConflictError(RuntimeError):
    """A concurrent commit invalidated the staged operation; the
    writer must re-plan against the new head (Iceberg's
    ``ValidationException`` role)."""


def _heads(base_metadata_path: str, head_metadata_path: str, base_dir: str | None):
    base_meta = parse_metadata(base_metadata_path)
    head_meta = parse_metadata(head_metadata_path)
    base_id = base_meta.raw.get("current-snapshot-id")
    head_id = head_meta.raw.get("current-snapshot-id")
    if base_id is None or head_id is None:
        raise ValueError("both base and head metadata need a current snapshot")
    if base_id != head_id and base_id not in ancestor_chain(head_meta, head_id):
        raise CommitConflictError(
            f"base snapshot {base_id} is not an ancestor of head {head_id}: "
            "the table diverged (rollback or branch switch); re-plan required"
        )
    return base_meta, head_meta, base_id, head_id


def commit_append_concurrent(
    base_metadata_path: str,
    head_metadata_path: str,
    data_files: list[dict[str, Any]],
    *,
    base_dir: str | None = None,
    **kwargs: Any,
) -> dict[str, Any]:
    """Commit an append staged against ``base`` when the table head
    may have moved to ``head``: appends conflict with nothing, so a
    moved head just means the retry re-applies the append on the
    head metadata (one extra KB-scale metadata read — the staged
    parquet is reused untouched). Returns the ordinary commit result
    plus ``retried`` / ``base_snapshot_id`` / ``head_snapshot_id``."""
    _, _, base_id, head_id = _heads(base_metadata_path, head_metadata_path, base_dir)
    res = append_snapshot(head_metadata_path, data_files, base_dir=base_dir, **kwargs)
    res.update(
        retried=base_id != head_id,
        base_snapshot_id=base_id,
        head_snapshot_id=head_id,
    )
    return res


def _live_data_by_path(meta, snapshot_id: int, base_dir: str):
    data, _ = mor_entries_at(meta, snapshot_id, base_dir)
    return {e["file_path"]: e for e in data}


def _added_data_entries_between(meta, base_id: int, head_id: int, base_dir: str):
    """Data files ADDED by append/overwrite snapshots in
    ``(base_id, head_id]`` — the set ``validateAddedDataFiles``
    inspects. REPLACE (compaction/rewrite) and DELETE snapshots add
    no logical rows, so their ADDED entries never conflict with an
    equality delete (their rows already existed at the base)."""
    from ..avro.reader import AvroContainerFile
    from .snapshots import manifest_files_at

    by_id = {s["snapshot-id"]: s for s in meta.snapshots}
    chain = ancestor_chain(meta, head_id)
    between = chain[: chain.index(base_id)]
    out = []
    for sid in between:
        op = by_id[sid].get("summary", {}).get("operation")
        if op not in ("append", "overwrite"):
            continue
        for mrow in manifest_files_at(meta, sid, base_dir):
            if mrow.get("content", 0) != 0:
                continue
            if mrow.get("added_snapshot_id") not in (None, sid):
                continue  # carried-forward manifest: nothing new here
            with open(mrow["local_path"], "rb") as f:
                for rec in AvroContainerFile(f.read()):
                    if (
                        rec["status"] == 1
                        and rec.get("snapshot_id") in (None, sid)
                        and rec["data_file"].get("content", 0) == 0
                    ):
                        out.append(rec["data_file"])
    return out


def _partitions_can_match(delete_partition: dict, data_partition: dict) -> bool:
    """Conservative shared-field comparison (the same rule
    ``plan_scan_tasks`` uses): partitions conflict unless a field
    BOTH tuples carry proves them disjoint."""
    shared = set(delete_partition) & set(data_partition)
    return all(delete_partition[k] == data_partition[k] for k in shared)


def validate_concurrent_commits(
    base_metadata_path: str,
    head_metadata_path: str,
    *,
    referenced_data_files: list[str] = (),
    equality_delete_partitions: list[dict[str, Any]] | None = None,
    base_dir: str | None = None,
) -> dict[str, Any]:
    """The ``validate*`` chain against everything committed between
    ``base`` and ``head``, metadata-only:

    * every path in ``referenced_data_files`` (the data files staged
      position deletes point into) must still be live at head —
      ``validateDataFilesExist``;
    * when ``equality_delete_partitions`` is given (one partition
      tuple per staged equality-delete file; ``{}`` = table-wide),
      no data file appended since base may sit in a partition a
      tuple can match — ``validateNoConflictingAppends`` under
      serializable isolation.

    Raises :class:`CommitConflictError` on the first violation;
    returns ``{"base_snapshot_id", "head_snapshot_id", "clean":
    bool}`` (``clean`` = head never moved) otherwise."""
    base_dir = base_dir or os.path.dirname(head_metadata_path)
    base_meta, head_meta, base_id, head_id = _heads(
        base_metadata_path, head_metadata_path, base_dir
    )
    if base_id == head_id:
        return {
            "base_snapshot_id": base_id,
            "head_snapshot_id": head_id,
            "clean": True,
        }
    head_live = _live_data_by_path(head_meta, head_id, base_dir)
    missing = [p for p in referenced_data_files if p not in head_live]
    if missing:
        raise CommitConflictError(
            "staged position deletes reference data files no longer live "
            f"at head {head_id} (concurrently rewritten or deleted): "
            f"{sorted(missing)}"
        )
    if equality_delete_partitions is not None:
        added = _added_data_entries_between(head_meta, base_id, head_id, base_dir)
        conflicts = [
            e["file_path"]
            for e in added
            for dpart in equality_delete_partitions
            if _partitions_can_match(dpart, e.get("partition") or {})
        ]
        if conflicts:
            raise CommitConflictError(
                "data files appended since the base fall inside the staged "
                "equality deletes' partition scope (serializable isolation): "
                f"{sorted(set(conflicts))}"
            )
    return {
        "base_snapshot_id": base_id,
        "head_snapshot_id": head_id,
        "clean": False,
    }


def commit_delete_concurrent(
    base_metadata_path: str,
    head_metadata_path: str,
    delete_files: list[dict[str, Any]],
    *,
    referenced_data_files: list[str] = (),
    base_dir: str | None = None,
    isolation: str = "serializable",
    **kwargs: Any,
) -> dict[str, Any]:
    """Commit staged delete files against a possibly-moved head:
    validate (position deletes via ``referenced_data_files``;
    equality deletes via their partition tuples under
    ``serializable`` isolation — pass ``isolation='snapshot'`` to
    allow concurrent appends, Iceberg's weaker documented level),
    then re-apply on the head. Raises :class:`CommitConflictError`
    instead of committing when validation fails."""
    if isolation not in ("serializable", "snapshot"):
        raise ValueError(f"unknown isolation level {isolation!r}")
    eq_parts = [
        d.get("partition") or {}
        for d in delete_files
        if d.get("content") == EQUALITY_DELETES
    ]
    v = validate_concurrent_commits(
        base_metadata_path,
        head_metadata_path,
        referenced_data_files=referenced_data_files,
        equality_delete_partitions=(
            eq_parts if (eq_parts and isolation == "serializable") else None
        ),
        base_dir=base_dir,
    )
    res = commit_delete_snapshot(
        head_metadata_path, delete_files, base_dir=base_dir, **kwargs
    )
    res.update(
        retried=not v["clean"],
        base_snapshot_id=v["base_snapshot_id"],
        head_snapshot_id=v["head_snapshot_id"],
    )
    return res


def commit_row_delta_concurrent(
    base_metadata_path: str,
    head_metadata_path: str,
    new_data_files: list[dict[str, Any]],
    delete_files: list[dict[str, Any]],
    *,
    referenced_data_files: list[str] = (),
    base_dir: str | None = None,
    isolation: str = "serializable",
    **kwargs: Any,
) -> dict[str, Any]:
    """The row-delta (UPDATE/MERGE) twin of
    :func:`commit_delete_concurrent`: same validation, then one
    ``commit_row_delta`` on the head."""
    if isolation not in ("serializable", "snapshot"):
        raise ValueError(f"unknown isolation level {isolation!r}")
    eq_parts = [
        d.get("partition") or {}
        for d in delete_files
        if d.get("content") == EQUALITY_DELETES
    ]
    v = validate_concurrent_commits(
        base_metadata_path,
        head_metadata_path,
        referenced_data_files=referenced_data_files,
        equality_delete_partitions=(
            eq_parts if (eq_parts and isolation == "serializable") else None
        ),
        base_dir=base_dir,
    )
    res = commit_row_delta(
        head_metadata_path, new_data_files, delete_files, base_dir=base_dir, **kwargs
    )
    res.update(
        retried=not v["clean"],
        base_snapshot_id=v["base_snapshot_id"],
        head_snapshot_id=v["head_snapshot_id"],
    )
    return res


# ------------------------------------------------ driver-gate query


def commit_conflict_roundtrip(spark, sf_dir):
    """Driver gate for optimistic concurrency on a scratch MoR
    table (``sf_dir`` unused). Four writers race head 2004:

    1. **append_rebase** — writer A stages a 10-row append against
       the 2004 base; writer B's 5-row append lands first; A's
       retry rebases onto B's head and commits → 338 live rows
       (323 + 5 + 10);
    2. **pos_delete_clean** — writer C staged 2 position deletes
       into B.parquet against the same old base; B.parquet is still
       live at head, validation passes, the delete rebases →
       336 live rows;
    3. **pos_delete_missing_file** — writer D staged deletes into
       A.parquet, but a concurrent ``rewrite_data_files`` replaced
       A (and C) with folded rewrites; ``validateDataFilesExist``
       aborts the commit — live rows unchanged;
    4. **eq_delete_conflicting_append** — writer E staged an
       equality delete scoped to partition x against the pre-append
       base; writer A+B's appends added a category-x file since,
       so serializable validation aborts — live rows unchanged.

    Golden oracle: (case, outcome, retried, live_rows) per writer.
    Every live-row count is re-read through the full MoR path after
    each attempt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .commit import _scratch_table, write_position_deletes
    from .deletes import MOR_DIR, read_mor
    from .rewrite_data import rewrite_data_files

    root = _scratch_table("conflict_gate_", MOR_DIR)
    base = os.path.join(root, "v2.metadata.json")
    loc = parse_metadata(base).raw["location"]

    def _mk_data(name: str, ids: list[int], category: str) -> str:
        rel = f"data/category={category}/{name}"
        out = os.path.join(root, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pq.write_table(
            pa.table(
                {"id": pa.array(ids, pa.int64()),
                 "category": pa.array([category] * len(ids))}
            ),
            out,
        )
        return rel

    rows = []

    def _live(mpath: str) -> int:
        return read_mor(spark, mpath, parse_metadata(mpath).raw["current-snapshot-id"], root).count()

    # writer B lands first (plain append on the base = the head moves)
    rel_b = _mk_data("WB.parquet", list(range(400, 405)), "x")
    res_b = append_snapshot(base, [{"path": rel_b, "partition": {"category": "x"}}], base_dir=root, spec_id=0)
    head = res_b["metadata_path"]

    # 1. writer A staged against `base`, commits against the moved head
    rel_a = _mk_data("WA.parquet", list(range(500, 510)), "y")
    res_a = commit_append_concurrent(
        base, head, [{"path": rel_a, "partition": {"category": "y"}}],
        base_dir=root, spec_id=0,
    )
    head = res_a["metadata_path"]
    rows.append(("append_rebase", "committed", res_a["retried"], _live(head)))

    # 2. writer C: position deletes into still-live B.parquet
    rel_pd = write_position_deletes(
        root, "data/deletes/wc.parquet",
        [("data/category=y/B.parquet", 0), ("data/category=y/B.parquet", 1)],
    )
    res_c = commit_delete_concurrent(
        base, head,
        [{"path": rel_pd, "partition": {"category": "y"}, "content": 1}],
        referenced_data_files=[f"{loc}/data/category=y/B.parquet"],
        base_dir=root, spec_id=0,
    )
    head = res_c["metadata_path"]
    rows.append(("pos_delete_clean", "committed", res_c["retried"], _live(head)))

    # concurrent maintenance: fold A's and C's deletes (replaces both)
    head = rewrite_data_files(spark, head)["metadata_path"]
    live_after_rewrite = _live(head)

    # 3. writer D: staged deletes reference the now-replaced A.parquet
    rel_pd2 = write_position_deletes(
        root, "data/deletes/wd.parquet",
        [("data/category=x/A.parquet", 20)],
    )
    try:
        commit_delete_concurrent(
            base, head,
            [{"path": rel_pd2, "partition": {"category": "x"}, "content": 1}],
            referenced_data_files=[f"{loc}/data/category=x/A.parquet"],
            base_dir=root, spec_id=0,
        )
        rows.append(("pos_delete_missing_file", "committed", True, _live(head)))
    except CommitConflictError:
        rows.append(("pos_delete_missing_file", "aborted", True, live_after_rewrite))

    # 4. writer E: eq delete scoped to x vs the concurrently-appended
    # category-x file WB.parquet (serializable isolation)
    from .commit import write_equality_deletes

    rel_eq = write_equality_deletes(root, "data/deletes/we.parquet", [{"id": 30}])
    try:
        commit_delete_concurrent(
            base, head,
            [{"path": rel_eq, "partition": {"category": "x"}, "content": 2,
              "equality_ids": [1]}],
            base_dir=root, spec_id=0,
        )
        rows.append(("eq_delete_conflicting_append", "committed", True, _live(head)))
    except CommitConflictError:
        rows.append(
            ("eq_delete_conflicting_append", "aborted", True, live_after_rewrite)
        )

    return spark.createDataFrame(
        rows, "case_name string, outcome string, retried boolean, live_rows bigint"
    ).orderBy("case_name")


COMMIT_CONFLICT_SQL = """
SELECT case_name, outcome, retried, CAST(live_rows AS BIGINT) AS live_rows
FROM (VALUES
  ('append_rebase', 'committed', true, 338),
  ('eq_delete_conflicting_append', 'aborted', true, 336),
  ('pos_delete_clean', 'committed', true, 336),
  ('pos_delete_missing_file', 'aborted', true, 336)
) t(case_name, outcome, retried, live_rows)
ORDER BY case_name
"""
