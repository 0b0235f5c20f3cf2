"""Pure-Python Delta Lake transaction-log reader — no delta-spark
jar, no extension: just the PUBLIC Delta protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md).

A Delta table is parquet data files + ``_delta_log/`` holding one
newline-delimited-JSON commit per version
(``00000000000000000000.json``, …), each line ONE action:
``metaData`` (schema, partition columns), ``add`` (a live data
file + its partitionValues), ``remove`` (a tombstone), ``protocol``,
``commitInfo``. Every 10th commit may add a parquet CHECKPOINT
(the same actions, columnar) referenced by ``_last_checkpoint``.

State reconstruction is last-action-wins per file path: a file is
live at version V iff its latest action ≤ V is an ``add``. This
module replays that (checkpoint first when present, then JSON
tail) driver-side — the log is KB/MB metadata, exactly like the
Iceberg manifest planning elsewhere in this engine — and hands the
live file list to an ordinary distributed parquet scan.

``read_delta_log`` reads partitioned tables through Spark's own
hive-style directory inference (``basePath`` option) when the
paths carry ``key=value`` segments — Delta does not store
partition columns IN the parquet, so inference (or explicit
injection from ``partitionValues``) is REQUIRED for correctness,
not cosmetics.

The jar-gated ``sources/connectors.read_delta`` remains the
integration path when a real runtime is present; this reader is
its sandbox-honest dual, fixture-pinned against a hand-built
protocol-valid log (including a checkpoint) in
``tests/fixtures/delta``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


def _log_dir(table_root: str) -> str:
    d = os.path.join(table_root, "_delta_log")
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{table_root!r} has no _delta_log — not a Delta table")
    return d


def list_commits(table_root: str) -> list[tuple[int, str]]:
    """(version, path) of every JSON commit, ascending."""
    d = _log_dir(table_root)
    out = []
    for name in os.listdir(d):
        m = _COMMIT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    return sorted(out)


def latest_checkpoint(table_root: str) -> tuple[int, str] | None:
    """(version, path) of the newest checkpoint, preferring the
    ``_last_checkpoint`` pointer and falling back to a listing (the
    pointer is an optimization; the listing is the truth)."""
    d = _log_dir(table_root)
    cands: dict[int, str] = {}
    for name in os.listdir(d):
        m = _CHECKPOINT_RE.match(name)
        if m:
            cands[int(m.group(1))] = os.path.join(d, name)
    ptr = os.path.join(d, "_last_checkpoint")
    if os.path.exists(ptr):
        try:
            with open(ptr) as f:
                v = int(json.load(f)["version"])
            if v in cands:
                return v, cands[v]
        except (ValueError, KeyError, json.JSONDecodeError):
            pass
    if cands:
        v = max(cands)
        return v, cands[v]
    return None


def _pairs_to_maps(v: Any) -> Any:
    """pyarrow ``to_pylist`` renders MAP columns as lists of (k, v)
    tuples; normalize them back to dicts so checkpoint-sourced
    actions look exactly like JSON-sourced ones (``partitionValues``
    consumers call ``.get``)."""
    if isinstance(v, list) and v and all(
        isinstance(e, tuple) and len(e) == 2 for e in v
    ):
        return dict(v)
    if isinstance(v, dict):
        return {k: _pairs_to_maps(x) for k, x in v.items()}
    return v


def _apply_action(state: dict[str, dict], meta: dict, action: dict[str, Any]) -> None:
    if "metaData" in action and action["metaData"]:
        meta.update(action["metaData"])
    add = action.get("add")
    if add:
        state[add["path"]] = add
    rem = action.get("remove")
    if rem:
        state.pop(rem["path"], None)


def replay_log(
    table_root: str, version: int | None = None
) -> tuple[list[dict[str, Any]], dict[str, Any], int]:
    """Reconstruct (live_add_actions, metaData, effective_version) at
    ``version`` (None = latest). Starts from the newest checkpoint at
    or below the target when one exists; JSON commits after it replay
    on top."""
    commits = list_commits(table_root)
    if not commits:
        raise FileNotFoundError(f"{table_root!r} has an empty _delta_log")
    head = commits[-1][0]
    target = head if version is None else int(version)
    if target > head or not any(v <= target for v, _ in commits):
        known = [v for v, _ in commits]
        raise ValueError(f"version {target} not in log (have {known[0]}..{head})")

    state: dict[str, dict] = {}
    meta: dict[str, Any] = {}
    start_after = -1
    cp = latest_checkpoint(table_root)
    if cp is not None and cp[0] <= target:
        import pyarrow.parquet as pq

        for row in pq.read_table(cp[1]).to_pylist():
            _apply_action(
                state,
                meta,
                {k: _pairs_to_maps(v) for k, v in row.items() if v is not None},
            )
        start_after = cp[0]
    for v, path in commits:
        if v <= start_after or v > target:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(state, meta, json.loads(line))
    return list(state.values()), meta, target


def delta_live_files(table_root: str, version: int | None = None) -> list[str]:
    """Absolute paths of the data files live at ``version``."""
    adds, _, _ = replay_log(table_root, version)
    return sorted(os.path.join(table_root, a["path"]) for a in adds)


def read_delta_log(
    spark: SparkSession, table_root: str, version: int | None = None
) -> DataFrame:
    """Distributed read of the live file set (time travel via
    ``version``). Partitioned tables: hive-style ``key=value`` path
    segments go through Spark's own directory inference
    (``basePath``); non-hive layouts inject the log's
    ``partitionValues`` per file group explicitly."""
    from functools import reduce

    import pyspark.sql.functions as F

    adds, meta, _ = replay_log(table_root, version)
    if not adds:
        raise ValueError(f"Delta table {table_root!r} has no live files")
    part_cols = meta.get("partitionColumns") or []
    paths = [os.path.join(table_root, a["path"]) for a in adds]
    hive = all(
        all(f"{c}=" in a["path"] for c in part_cols) for a in adds
    )
    if not part_cols or hive:
        reader = spark.read.option("basePath", table_root) if part_cols else spark.read
        return reader.parquet(*paths)
    groups: dict[tuple, list[str]] = {}
    for a in adds:
        key = tuple((a.get("partitionValues") or {}).get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table_root, a["path"]))
    frames = []
    for key, gpaths in sorted(groups.items()):
        df = spark.read.parquet(*gpaths)
        for c, val in zip(part_cols, key):
            df = df.withColumn(c, F.lit(val))
        frames.append(df)
    return reduce(DataFrame.unionByName, frames)


# ------------------------------------------------ driver-gate query

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DELTA_FIXTURE = os.path.join(_REPO_ROOT, "tests", "fixtures", "delta")


def delta_log_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: per-partition rollup of the Delta fixture at
    HEAD (v3) — the replay must apply v0-v2 state (via the
    checkpoint) plus v3's add AND remove. The oracle replays the
    SAME transaction log in pure SQL (read_json over the commits,
    last-action-wins anti-join) — no shared code with the Python
    replay. (``sf_dir`` unused.)"""
    import pyspark.sql.functions as F

    return (
        read_delta_log(spark, DELTA_FIXTURE)
        .groupBy("cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("id").cast("long").alias("id_sum"),
        )
        .orderBy("cat")
    )


DELTA_LOG_SQL = f"""
WITH actions AS (
  SELECT add.path AS apath, remove.path AS rpath,
         CAST(regexp_extract(filename, '(\\d+)\\.json', 1) AS BIGINT) AS v
  FROM read_json_auto('{DELTA_FIXTURE}/_delta_log/*.json',
                      filename=true, format='newline_delimited',
                      union_by_name=true)
),
adds AS (SELECT apath AS path, v FROM actions WHERE apath IS NOT NULL),
removes AS (SELECT rpath AS path, v FROM actions WHERE rpath IS NOT NULL),
live AS (
  SELECT a.path FROM adds a
  WHERE NOT EXISTS (SELECT 1 FROM removes r WHERE r.path = a.path AND r.v >= a.v)
),
rows AS (
  SELECT id, cat, regexp_extract(filename, 'cat=[^/]+/[^/]+$') AS rel
  FROM read_parquet('{DELTA_FIXTURE}/cat=*/*.parquet',
                    filename=true, hive_partitioning=true)
)
SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(id) AS BIGINT) AS id_sum
FROM rows JOIN live ON rows.rel = live.path
GROUP BY cat
ORDER BY cat
"""


# ------------------------------- incremental + streaming consumption


def delta_adds_between(
    table_root: str, from_version: int, to_version: int
) -> dict[int, list[dict[str, Any]]]:
    """Incremental file listing: the ``add`` actions committed by
    each version on ``(from_version, to_version]`` — the "what's new
    since checkpoint X" primitive an ingest pipeline consumes.
    Replays ONLY the JSON commits in range (KB metadata; no
    checkpoint needed — the range is explicit)."""
    out: dict[int, list[dict[str, Any]]] = {}
    commits = dict(list_commits(table_root))
    if from_version >= to_version:
        raise ValueError(f"empty version range ({from_version}, {to_version}]")
    for v in range(from_version + 1, to_version + 1):
        if v not in commits:
            raise ValueError(f"version {v} missing from log")
        adds = []
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if line:
                    a = json.loads(line).get("add")
                    if a:
                        adds.append(a)
        out[v] = adds
    return out


def delta_incremental_stream(
    spark: SparkSession,
    table_root: str,
    from_version: int,
    to_version: int,
    staging_dir: str,
):
    """Streaming DataFrame over the rows ADDED per version on
    ``(from_version, to_version]`` — one micro-batch per version
    (``maxFilesPerTrigger=1`` over one staged parquet per commit,
    the same local stand-in for a log-tailing source that
    ``streaming/incremental.py`` and ``streaming/cdc.py`` use).
    Each staged file carries a ``_delta_version`` column. Returns
    ``(stream, n_batches)``."""
    import shutil

    import pyspark.sql.functions as F

    _, meta, _ = replay_log(table_root, to_version)
    part_cols = meta.get("partitionColumns") or []
    per_version = delta_adds_between(table_root, from_version, to_version)
    if os.path.isdir(staging_dir):
        shutil.rmtree(staging_dir)
    os.makedirs(staging_dir)
    schema = None
    n = 0
    for v in sorted(per_version):
        adds = per_version[v]
        if not adds:
            continue
        frames = []
        for a in adds:
            df = spark.read.parquet(os.path.join(table_root, a["path"]))
            for c in part_cols:
                df = df.withColumn(c, F.lit((a.get("partitionValues") or {}).get(c)))
            frames.append(df)
        from functools import reduce

        batch = reduce(lambda x, y: x.unionByName(y), frames).withColumn(
            "_delta_version", F.lit(v).cast("long")
        )
        schema = batch.schema
        batch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(staging_dir, f"_stage-{v}")
        )
        import glob as _glob

        (part,) = _glob.glob(os.path.join(staging_dir, f"_stage-{v}", "part-*.parquet"))
        os.replace(part, os.path.join(staging_dir, f"{n:05d}-v{v}.parquet"))
        shutil.rmtree(os.path.join(staging_dir, f"_stage-{v}"), ignore_errors=True)
        n += 1
    if schema is None:
        raise ValueError("no adds in range")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging_dir)
    )
    return stream, n


# ------------------------------- checkpoint WRITE (VERDICT r8 #7)
# PROTOCOL.md "Checkpoints": every N commits a writer may serialize
# the reconstructed state (protocol + metaData + live adds) as ONE
# parquet file `<v>.checkpoint.parquet` and point `_last_checkpoint`
# at it, so a reader opens the table with one parquet read + the
# JSON tail instead of replaying every version since 0. The reader
# half (`latest_checkpoint` / `replay_log`) already consumes these;
# this is the producer half a long-running replica needs.

CHECKPOINT_INTERVAL = 10


def _checkpoint_schema():
    import pyarrow as pa

    protocol_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    format_t = pa.struct(
        [("provider", pa.string()), ("options", pa.map_(pa.string(), pa.string()))]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", format_t),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    import pyarrow as pa2

    return pa2.schema(
        [
            ("protocol", protocol_t),
            ("metaData", meta_t),
            ("add", add_t),
            ("remove", remove_t),
        ]
    )


def _maps_to_pairs_meta(m: dict[str, Any]) -> dict[str, Any]:
    out = dict(m)
    fmt = dict(out.get("format") or {"provider": "parquet", "options": {}})
    opts = fmt.get("options") or {}
    fmt["options"] = sorted(opts.items()) if isinstance(opts, dict) else opts
    out["format"] = fmt
    cfg = out.get("configuration") or {}
    out["configuration"] = sorted(cfg.items()) if isinstance(cfg, dict) else cfg
    return out


def _maps_to_pairs_add(a: dict[str, Any]) -> dict[str, Any]:
    out = {
        "path": a["path"],
        "partitionValues": a.get("partitionValues") or {},
        "size": a.get("size"),
        "modificationTime": a.get("modificationTime"),
        "dataChange": a.get("dataChange", True),
    }
    pv = out["partitionValues"]
    if isinstance(pv, dict):
        out["partitionValues"] = sorted(pv.items())
    return out


def _current_protocol(table_root: str, version: int) -> dict[str, Any]:
    """Latest protocol action at or below ``version`` (replay_log
    tracks only file state + metaData; the checkpoint must carry the
    protocol row per spec)."""
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    cp = latest_checkpoint(table_root)
    start_after = -1
    if cp is not None and cp[0] <= version:
        import pyarrow.parquet as pq

        for row in pq.read_table(cp[1], columns=["protocol"]).to_pylist():
            if row.get("protocol") is not None:
                proto = {
                    k: v for k, v in row["protocol"].items() if v is not None
                } or proto
        start_after = cp[0]
    for v, path in list_commits(table_root):
        if v <= start_after or v > version:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    p = json.loads(line).get("protocol")
                    if p:
                        proto = p
    return proto


# PROTOCOL.md: remove tombstones stay in checkpoints until they are
# older than the table's deletedFileRetentionDuration (default one
# week) so VACUUM and incremental readers can still see them
DELETED_FILE_RETENTION_MS = 7 * 24 * 3600 * 1000


def replay_tombstones(
    table_root: str, version: int | None = None
) -> dict[str, dict[str, Any]]:
    """path → latest ``remove`` action still standing at ``version``
    (a later re-``add`` of the same path drops its tombstone, exactly
    as the per-path latest-action rule reconstructs state). Starts
    from the newest checkpoint at or below the target — checkpoints
    carry unexpired tombstones — with JSON commits replayed on top."""
    commits = list_commits(table_root)
    if not commits:
        raise FileNotFoundError(f"{table_root!r} has an empty _delta_log")
    head = commits[-1][0]
    target = head if version is None else int(version)
    tomb: dict[str, dict[str, Any]] = {}
    start_after = -1
    cp = latest_checkpoint(table_root)
    if cp is not None and cp[0] <= target:
        import pyarrow.parquet as pq

        for row in pq.read_table(cp[1], columns=["add", "remove"]).to_pylist():
            rem = row.get("remove")
            if rem is not None:
                r = {k: v for k, v in rem.items() if v is not None}
                tomb[r["path"]] = r
            add = row.get("add")
            if add is not None:
                tomb.pop(add["path"], None)
        start_after = cp[0]
    for v, path in commits:
        if v <= start_after or v > target:
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                rem = a.get("remove")
                if rem:
                    tomb[rem["path"]] = rem
                elif a.get("add"):
                    tomb.pop(a["add"]["path"], None)
    return tomb


def write_delta_checkpoint(
    table_root: str,
    version: int | None = None,
    *,
    retention_ms: int = DELETED_FILE_RETENTION_MS,
    now_ms: int | None = None,
) -> dict[str, Any]:
    """Serialize the table state at ``version`` (default: head) as a
    ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` pointer. The
    state rows come from the same replay readers use, so a
    checkpoint-opened table is bit-identical to a full JSON replay
    (pytest-pinned). Remove tombstones younger than ``retention_ms``
    ride along (ADVICE r9: PROTOCOL.md requires them, or VACUUM and
    incremental readers watch deletes vanish at every checkpoint
    boundary)."""
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, meta, v = replay_log(table_root, version)
    proto = _current_protocol(table_root, v)
    cutoff = (now_ms if now_ms is not None else _time.time() * 1000) - retention_ms
    tombstones = [
        r
        for r in sorted(replay_tombstones(table_root, v).values(),
                        key=lambda x: x["path"])
        # a tombstone with no timestamp never expires (conservative:
        # VACUUM safety beats checkpoint size)
        if r.get("deletionTimestamp") is None
        or r["deletionTimestamp"] >= cutoff
    ]
    rows: list[dict[str, Any]] = [
        {"protocol": proto, "metaData": None, "add": None, "remove": None},
    ]
    if meta:
        rows.append(
            {
                "protocol": None,
                "metaData": _maps_to_pairs_meta(meta),
                "add": None,
                "remove": None,
            }
        )
    for a in sorted(adds, key=lambda x: x["path"]):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": _maps_to_pairs_add(a),
                "remove": None,
            }
        )
    for r in tombstones:
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "remove": {
                    "path": r["path"],
                    "deletionTimestamp": r.get("deletionTimestamp"),
                    "dataChange": r.get("dataChange", True),
                },
            }
        )
    d = _log_dir(table_root)
    path = os.path.join(d, f"{v:020d}.checkpoint.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=_checkpoint_schema()), path)
    tmp = os.path.join(d, "_last_checkpoint.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": v, "size": len(rows)}, f)
    os.replace(tmp, os.path.join(d, "_last_checkpoint"))
    return {"version": v, "path": path, "size": len(rows)}


def append_delta_commit(
    table_root: str,
    actions: list[dict[str, Any]],
    *,
    checkpoint_interval: int | None = CHECKPOINT_INTERVAL,
) -> dict[str, Any]:
    """Append ONE commit (`<v+1>.json`, newline-delimited actions)
    and auto-checkpoint when the new version is a multiple of
    ``checkpoint_interval`` — the writer-side cadence PROTOCOL.md
    describes, so a replica accumulating versions stays cheap to
    open (VERDICT r8 #7: JSON-only replication replayed every
    version on each open)."""
    commits = list_commits(table_root)
    v = commits[-1][0] + 1 if commits else 0
    d = _log_dir(table_root)
    tmp = os.path.join(d, f".{v:020d}.json.tmp")
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, sort_keys=True) + "\n")
    os.replace(tmp, os.path.join(d, f"{v:020d}.json"))
    out = {"version": v, "checkpointed": False}
    if checkpoint_interval and v > 0 and v % checkpoint_interval == 0:
        write_delta_checkpoint(table_root, v)
        out["checkpointed"] = True
    return out
