"""Incremental view maintenance (IVM) over the row-level CDC
changelog — keep a downstream GROUP BY aggregate current by applying
per-snapshot deltas instead of recomputing the base table.

This is the consumption-side payoff of ``changelog.py``: at 100 TB a
materialized ``GROUP BY`` over the table costs a full scan + shuffle
every refresh, but a snapshot that touched 0.1% of rows emits a
changelog of just those rows. ``maintain_grouped_agg`` folds that
changelog into the existing aggregate with one KB-to-GB-scale
aggregation and a join on the group keys — the classic
"delta-processing" identity for self-maintainable aggregates
(COUNT/SUM are self-maintainable; inserts weigh +1, deletes -1):

    agg(head) == agg(base) ⊕ agg±(changelog(base → head))

Plan shape: the changelog delta aggregate partial-aggregates
map-side (tiny result: one row per touched group), then a single
equi-join on the group keys against the maintained view — broadcast
when the delta is small, which is the whole point. No Python rows,
no collect.

Reference parity: the reference tool exposes table state as manifest
dumps (``ManifestFileReadTool``); this module composes the engine's
own changelog (same metadata increments) into the maintenance
primitive a warehouse consumer builds on top of those dumps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changelog import VIS_CTES, changelog_between
from .deletes import MOR_DIR, MOR_METADATA, read_mor

def _weight():
    # +1 per INSERT, -1 per DELETE (built lazily: classic-mode Column
    # construction needs an active SparkContext)
    return F.when(F.col("change_type") == "INSERT", F.lit(1)).otherwise(F.lit(-1))


def grouped_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    mins: list[str] | tuple[str, ...] = (),
    maxs: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """The maintained view's shape: COUNT(*) + SUM(col) per group,
    plus optional MIN/MAX columns. COUNT and SUM are
    self-maintainable (a delete folds as −1/−value); MIN/MAX are
    NOT — a delete of the current extremum invalidates the value
    without the changelog saying what the new one is — so
    :func:`maintain_grouped_agg` maintains them with the standard
    fallback: recompute ONLY the affected groups from the base."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[F.sum(F.col(c)).cast("long").alias(f"{c}_sum") for c in sums],
        *[F.min(F.col(c)).cast("long").alias(f"{c}_min") for c in mins],
        *[F.max(F.col(c)).cast("long").alias(f"{c}_max") for c in maxs],
    )


# above this many extremum-affected groups the recompute scopes by
# left-semi join instead of a driver-collected IN-list (the IN-list
# pushes to the parquet scan; the semi join stays fully distributed)
AFFECTED_INLIST_MAX = 1000


def maintain_grouped_agg(
    base_agg: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    sums: list[str],
    *,
    mins: list[str] | tuple[str, ...] = (),
    maxs: list[str] | tuple[str, ...] = (),
    base_df: DataFrame | None = None,
) -> DataFrame:
    """Fold a changelog into an existing COUNT/SUM(/MIN/MAX)
    aggregate.

    ``base_agg`` must have the :func:`grouped_agg` shape; ``changelog``
    is ``changelog_between`` output (``change_type`` + data columns).
    Groups whose maintained count reaches 0 drop out, exactly as a
    recompute would drop them.

    MIN/MAX (VERDICT r9 #7): inserts fold (``least``/``greatest``
    with the insert-side extremum); a DELETE at or past a group's
    current extremum makes that group non-incrementable, so exactly
    those groups recompute from ``base_df`` (the base table AT the
    target snapshot), scoped to the affected group keys — the
    partition-scoped stats pattern. ``base_df`` is required when
    ``mins``/``maxs`` are non-empty; its plan only executes when
    affected groups exist.
    """
    if (mins or maxs) and base_df is None:
        raise ValueError("mins/maxs maintenance requires base_df")
    w = _weight()
    is_del = F.col("change_type") != "INSERT"
    is_ins = ~is_del
    delta = changelog.groupBy(*keys).agg(
        F.sum(w).cast("long").alias("_d_n"),
        *[F.sum(w * F.col(c)).cast("long").alias(f"_d_{c}") for c in sums],
        *[
            F.min(F.when(is_ins, F.col(c))).cast("long").alias(f"_insmin_{c}")
            for c in mins
        ],
        *[
            F.min(F.when(is_del, F.col(c))).cast("long").alias(f"_delmin_{c}")
            for c in mins
        ],
        *[
            F.max(F.when(is_ins, F.col(c))).cast("long").alias(f"_insmax_{c}")
            for c in maxs
        ],
        *[
            F.max(F.when(is_del, F.col(c))).cast("long").alias(f"_delmax_{c}")
            for c in maxs
        ],
    )
    if mins or maxs:
        # the affected-keys probe below COLLECTS from the joined
        # frame, and the returned plan evaluates it again — without
        # this the whole changelog_between subtree (multi-commit MoR
        # visibility resolution) executes TWICE per refresh.
        # Checkpoint the delta rollup: one row per TOUCHED group —
        # KB at any scale by IVM's premise (r17; guide §5, the same
        # materialize-once argument as semdedup r16). The COUNT/SUM
        # path has a single consumer and stays lazy.
        delta = delta.localCheckpoint()
    joined = base_agg.join(delta, keys, "full_outer")
    zero = F.lit(0).cast("long")
    folded_cols = [
        (F.coalesce(F.col("n_rows"), zero) + F.coalesce(F.col("_d_n"), zero)).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"{c}_sum"), zero) + F.coalesce(F.col(f"_d_{c}"), zero)
            ).alias(f"{c}_sum")
            for c in sums
        ],
        *[
            F.least(F.col(f"{c}_min"), F.col(f"_insmin_{c}")).alias(f"{c}_min")
            for c in mins
        ],
        *[
            F.greatest(F.col(f"{c}_max"), F.col(f"_insmax_{c}")).alias(f"{c}_max")
            for c in maxs
        ],
    ]
    if not mins and not maxs:
        out = joined.select(*keys, *folded_cols)
        return out.where(F.col("n_rows") > 0)

    # a group is extremum-affected when a delete lands AT or PAST its
    # current extremum (a delete strictly inside the range can't move
    # MIN/MAX), or when deletes hit a group the state doesn't know
    affected_cond = F.lit(False)
    for c in mins:
        affected_cond = affected_cond | (
            F.col(f"_delmin_{c}").isNotNull()
            & (F.col(f"{c}_min").isNull() | (F.col(f"_delmin_{c}") <= F.col(f"{c}_min")))
        )
    for c in maxs:
        affected_cond = affected_cond | (
            F.col(f"_delmax_{c}").isNotNull()
            & (F.col(f"{c}_max").isNull() | (F.col(f"_delmax_{c}") >= F.col(f"{c}_max")))
        )
    unaffected = joined.where(~affected_cond).select(*keys, *folded_cols).where(
        F.col("n_rows") > 0
    )
    affected_keys = joined.where(affected_cond).select(*keys)
    rows = affected_keys.limit(AFFECTED_INLIST_MAX + 1).collect()
    if not rows:
        return unaffected
    if len(rows) <= AFFECTED_INLIST_MAX:
        # literal IN-list → predicate pushdown reaches the base scan
        cond = F.lit(False)
        for r in rows:
            c = F.lit(True)
            for k in keys:
                c = c & (F.col(k) == F.lit(r[k]))
            cond = cond | c
        scoped = base_df.where(cond)
    else:
        scoped = base_df.join(F.broadcast(affected_keys), list(keys), "left_semi")
    recomputed = grouped_agg(scoped, keys, sums, list(mins), list(maxs))
    return unaffected.unionByName(recomputed)


# ------------------------------------------------ driver-gate query


def changelog_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate on the MoR fixture (``sf_dir`` unused): the
    per-category COUNT/SUM(id) view is materialized at snapshot 2001
    (files A+B, 178 rows) and then maintained PURELY from the
    2001→2004 changelog — through an insert commit, a MoR delete
    commit (positional + equality), and another insert. The oracle
    recomputes the head state from the physical parquet + v2
    sequence rules in DuckDB (``VIS_CTES``) and aggregates — full
    recompute vs incremental maintenance, zero shared code."""
    base = grouped_agg(
        read_mor(spark, MOR_METADATA, 2001, MOR_DIR), ["category"], ["id"]
    )
    deltas = changelog_between(spark, MOR_METADATA, 2001, 2004, MOR_DIR)
    return maintain_grouped_agg(base, deltas, ["category"], ["id"]).orderBy(
        "category"
    )


IVM_SQL = f"""
WITH
{VIS_CTES}
SELECT category,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(id) AS BIGINT) AS id_sum
FROM vis4
GROUP BY category
ORDER BY category
"""


# --------------------------------------- materialized views (r9)
# The capstone of the r8 views + IVM pair (VERDICT r8 "Next round"
# #6): an Iceberg VIEW whose result is MATERIALIZED as a state
# table and kept current INCREMENTALLY from the base table's CDC
# changelog — never by re-scanning the base table after the seed.
#
# Layout (under view_root):
#   metadata/vN.metadata.json   — the view spec v1 metadata
#                                 (views.py), whose PROPERTIES carry
#                                 the refresh state:
#       ivm.base-uuid            base table-uuid (refresh validates)
#       ivm.refresh-snapshot-id  base snapshot the state reflects
#       ivm.state-path           state parquet, view-root-relative
#       ivm.keys / ivm.sums      the grouped_agg shape
#   data/state-<snapshot>/      — the materialized COUNT/SUM state
#
# A refresh is write-then-swap: the new state lands in a NEW
# directory named for the base snapshot it reflects, and only then
# does a new view metadata version (with updated properties) become
# current — a crashed refresh leaves the old state referenced and
# intact. Old state dirs are retired like superseded snapshots.


def _view_props(view_metadata_path: str) -> dict[str, str]:
    import json as _json

    with open(view_metadata_path) as f:
        return _json.load(f)["properties"]


def create_materialized_view(
    spark: SparkSession,
    view_root: str,
    base_metadata_path: str,
    *,
    keys: list[str],
    sums: list[str],
    mins: list[str] | tuple[str, ...] = (),
    maxs: list[str] | tuple[str, ...] = (),
    base_dir: str | None = None,
    snapshot_id: int | None = None,
) -> dict:
    """Materialize COUNT/SUM-per-group over the base table at a
    snapshot and store it as an Iceberg VIEW (stored SQL = the
    GROUP BY a recompute would run) + state parquet + refresh
    marker. One full scan HERE — every later refresh is
    changelog-sized."""
    import os as _os

    from .metadata import parse_metadata
    from .views import create_view

    base_dir = base_dir or _os.path.dirname(base_metadata_path)
    meta = parse_metadata(base_metadata_path)
    sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
    sql = (
        "SELECT "
        + ", ".join(keys)
        + ", COUNT(*) AS n_rows"
        + "".join(f", SUM({c}) AS {c}_sum" for c in sums)
        + "".join(f", MIN({c}) AS {c}_min" for c in mins)
        + "".join(f", MAX({c}) AS {c}_max" for c in maxs)
        + " FROM base GROUP BY "
        + ", ".join(keys)
    )
    state_rel = f"data/state-{sid}"
    state = grouped_agg(
        read_mor(spark, base_metadata_path, sid, base_dir),
        keys,
        sums,
        list(mins),
        list(maxs),
    )
    state.write.mode("errorifexists").parquet(_os.path.join(view_root, state_rel))
    vmp = create_view(
        view_root,
        sql,
        properties={
            "ivm.base-uuid": meta.raw.get("table-uuid", ""),
            "ivm.refresh-snapshot-id": str(sid),
            "ivm.state-path": state_rel,
            "ivm.keys": ",".join(keys),
            "ivm.sums": ",".join(sums),
            "ivm.mins": ",".join(mins),
            "ivm.maxs": ",".join(maxs),
        },
    )
    return {"view_metadata_path": vmp, "state_path": state_rel, "snapshot_id": sid}


def refresh_materialized_view(
    spark: SparkSession,
    view_metadata_path: str,
    base_metadata_path: str,
    *,
    base_dir: str | None = None,
    to_snapshot: int | None = None,
) -> dict:
    """Advance the materialized state to ``to_snapshot`` (default:
    the base table's current) by folding ONLY the changelog of the
    covered range — zero base-table re-scan. No-op (no new state,
    no new metadata) when already current. Returns the (possibly
    unchanged) view metadata path plus the covered range."""
    import json as _json
    import os as _os

    from .metadata import parse_metadata

    view_root = _os.path.dirname(_os.path.dirname(view_metadata_path))
    props = _view_props(view_metadata_path)
    base_dir = base_dir or _os.path.dirname(base_metadata_path)
    meta = parse_metadata(base_metadata_path)
    if props.get("ivm.base-uuid") and props["ivm.base-uuid"] != meta.raw.get(
        "table-uuid"
    ):
        raise ValueError(
            f"view tracks base table {props['ivm.base-uuid']}, got "
            f"{meta.raw.get('table-uuid')!r}"
        )
    from_id = int(props["ivm.refresh-snapshot-id"])
    to_id = to_snapshot if to_snapshot is not None else meta.current_snapshot_id
    if to_id == from_id:
        return {
            "view_metadata_path": view_metadata_path,
            "from_snapshot": from_id,
            "to_snapshot": to_id,
            "refreshed": False,
        }
    keys = props["ivm.keys"].split(",")
    sums = [c for c in props["ivm.sums"].split(",") if c]
    state = spark.read.parquet(_os.path.join(view_root, props["ivm.state-path"]))
    delta = changelog_between(spark, base_metadata_path, from_id, to_id, base_dir)
    mins = [c for c in props.get("ivm.mins", "").split(",") if c]
    maxs = [c for c in props.get("ivm.maxs", "").split(",") if c]
    base_at_to = (
        read_mor(spark, base_metadata_path, to_id, base_dir)
        if (mins or maxs)
        else None
    )
    new_state = maintain_grouped_agg(
        state, delta, keys, sums, mins=mins, maxs=maxs, base_df=base_at_to
    )
    new_rel = f"data/state-{to_id}"
    new_abs = _os.path.join(view_root, new_rel)
    # a crashed refresh can leave a COMPLETE or PARTIAL state dir
    # that no metadata version references (the write landed, the
    # swap didn't) — retrying the same refresh must not fail
    # forever on errorifexists (ADVICE r9). The dir is provably
    # stale: the swap below is what publishes it.
    if _os.path.isdir(new_abs) and new_rel != props["ivm.state-path"]:
        import shutil as _shutil

        _shutil.rmtree(new_abs)
    new_state.write.mode("errorifexists").parquet(new_abs)
    # swap: new metadata version with updated refresh properties
    # (same stored SQL — a refresh is not a view redefinition)
    with open(view_metadata_path) as f:
        vmeta = _json.load(f)
    vmeta["properties"] = {
        **vmeta["properties"],
        "ivm.refresh-snapshot-id": str(to_id),
        "ivm.state-path": new_rel,
    }
    mdir = _os.path.dirname(view_metadata_path)
    # next version = max(parsed vN) + 1 — a COUNT of files collides
    # (and silently overwrites a live version) after any deletion
    # (ADVICE r9)
    import re as _re

    vre = _re.compile(r"v(\d+)\.metadata\.json$")
    n = 1 + max(
        (int(m.group(1)) for x in _os.listdir(mdir) if (m := vre.fullmatch(x))),
        default=0,
    )
    new_vmp = _os.path.join(mdir, f"v{n}.metadata.json")
    with open(new_vmp, "w") as f:
        _json.dump(vmeta, f, indent=2)
    with open(_os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(n))
    return {
        "view_metadata_path": new_vmp,
        "from_snapshot": from_id,
        "to_snapshot": to_id,
        "refreshed": True,
    }


def read_materialized_view(spark: SparkSession, view_metadata_path: str) -> DataFrame:
    """The current materialized state (a parquet scan — no base
    table access, the entire point)."""
    import os as _os

    props = _view_props(view_metadata_path)
    view_root = _os.path.dirname(_os.path.dirname(view_metadata_path))
    return spark.read.parquet(_os.path.join(view_root, props["ivm.state-path"]))


def view_ivm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate (``sf_dir`` unused): materialize the
    per-category COUNT/SUM(id) view at MoR snapshot 2001, refresh
    it incrementally through the insert/MoR-delete/insert chain to
    2004 (changelog only — the base is never re-scanned), and read
    the state back THROUGH the view metadata. Oracle: full DuckDB
    recompute of head state from the physical parquet + v2
    sequence rules, plus the refresh range as constants."""
    import tempfile

    root = tempfile.mkdtemp(prefix="view_ivm_") + "/mv"
    res = create_materialized_view(
        spark, root, MOR_METADATA,
        keys=["category"], sums=["id"],
        base_dir=MOR_DIR, snapshot_id=2001,
    )
    ref = refresh_materialized_view(
        spark, res["view_metadata_path"], MOR_METADATA, base_dir=MOR_DIR
    )
    out = read_materialized_view(spark, ref["view_metadata_path"])
    return (
        out.withColumn("from_snap", F.lit(ref["from_snapshot"]).cast("long"))
        .withColumn("to_snap", F.lit(ref["to_snapshot"]).cast("long"))
        .orderBy("category")
    )


VIEW_IVM_SQL = f"""
WITH
{VIS_CTES}
SELECT category,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(2001 AS BIGINT) AS from_snap,
       CAST(2004 AS BIGINT) AS to_snap
FROM vis4
GROUP BY category
ORDER BY category
"""


def view_ivm_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate (``sf_dir`` unused) for MIN/MAX view maintenance
    (VERDICT r9 #7): the per-category COUNT/SUM/MIN/MAX(id) view is
    materialized at MoR snapshot 2001 and refreshed incrementally to
    2004 — inserts fold with least/greatest; the MoR delete commit's
    extremum-affected groups (and ONLY those) recompute from a
    group-scoped base read. Oracle: full DuckDB recompute of head
    state from the physical parquet + v2 sequence rules."""
    import tempfile

    root = tempfile.mkdtemp(prefix="view_ivm_mm_") + "/mv"
    res = create_materialized_view(
        spark, root, MOR_METADATA,
        keys=["category"], sums=["id"], mins=["id"], maxs=["id"],
        base_dir=MOR_DIR, snapshot_id=2001,
    )
    ref = refresh_materialized_view(
        spark, res["view_metadata_path"], MOR_METADATA, base_dir=MOR_DIR
    )
    out = read_materialized_view(spark, ref["view_metadata_path"])
    return (
        out.withColumn("from_snap", F.lit(ref["from_snapshot"]).cast("long"))
        .withColumn("to_snap", F.lit(ref["to_snapshot"]).cast("long"))
        .orderBy("category")
    )


VIEW_IVM_MINMAX_SQL = f"""
WITH
{VIS_CTES}
SELECT category,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(id) AS BIGINT) AS id_sum,
       CAST(MIN(id) AS BIGINT) AS id_min,
       CAST(MAX(id) AS BIGINT) AS id_max,
       CAST(2001 AS BIGINT) AS from_snap,
       CAST(2004 AS BIGINT) AS to_snap
FROM vis4
GROUP BY category
ORDER BY category
"""


def expire_materialized_view_states(
    view_metadata_path: str, *, keep_last: int = 2
) -> dict:
    """Garbage-collect superseded MV state directories — the MV
    analogue of snapshot expiry: every ``data/state-*`` dir not
    referenced by the ``keep_last`` newest view metadata versions is
    deleted (the CURRENT state is always kept). Returns the removed
    and kept state paths."""
    import os as _os
    import re as _re
    import shutil as _shutil

    mdir = _os.path.dirname(view_metadata_path)
    view_root = _os.path.dirname(mdir)
    vre = _re.compile(r"v(\d+)\.metadata\.json$")
    versions = sorted(
        (int(m.group(1)), _os.path.join(mdir, n))
        for n in _os.listdir(mdir)
        if (m := vre.fullmatch(n))
    )
    keep: set[str] = set()
    for _, p in versions[-max(keep_last, 1):]:
        keep.add(_view_props(p)["ivm.state-path"])
    keep.add(_view_props(view_metadata_path)["ivm.state-path"])
    removed = []
    data_dir = _os.path.join(view_root, "data")
    for name in sorted(_os.listdir(data_dir)) if _os.path.isdir(data_dir) else []:
        rel = f"data/{name}"
        if name.startswith("state-") and rel not in keep:
            _shutil.rmtree(_os.path.join(data_dir, name))
            removed.append(rel)
    return {"removed": removed, "kept": sorted(keep)}
