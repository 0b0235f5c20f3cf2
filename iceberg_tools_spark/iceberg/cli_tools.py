"""Extra CLI tools registered alongside ``manifest2json`` in
``__main__.py`` — the by-hand workflows the reference's README walks
users through (find the table, find its current metadata, see its
state), minus the hand part. All pure metadata; no SparkSession.

* ``catalog-list <warehouse> [namespace]`` — tables under a
  Hadoop-style warehouse, one dotted identifier per line;
* ``catalog-resolve <warehouse> <identifier>`` — the table's
  CURRENT ``vN.metadata.json`` (version-hint honored, listing
  fallback);
* ``delta2json [--version=N] <table_root>`` — a Delta table's
  reconstructed state as JSON: effective version, partition
  columns, and one line per LIVE file (path, partitionValues,
  size) — the Delta analog of ``manifest2json``.
"""

from __future__ import annotations

import json
import sys


def catalog_list_main(argv: list[str]) -> int:
    from .catalog import list_tables

    if not argv or len(argv) > 2:
        sys.stderr.write("usage: catalog-list <warehouse> [namespace]\n")
        return 1
    for name in list_tables(argv[0], argv[1] if len(argv) > 1 else None):
        sys.stdout.write(name + "\n")
    return 0


def catalog_resolve_main(argv: list[str]) -> int:
    from .catalog import current_metadata_path

    if len(argv) != 2:
        sys.stderr.write("usage: catalog-resolve <warehouse> <db.table>\n")
        return 1
    try:
        sys.stdout.write(current_metadata_path(argv[0], argv[1]) + "\n")
    except FileNotFoundError as exc:
        sys.stderr.write(f"{exc}\n")
        return 1
    return 0


def delta2json_main(argv: list[str]) -> int:
    from ..sources.delta_log import replay_log

    version = None
    args = []
    for a in argv:
        if a.startswith("--version="):
            try:
                version = int(a.split("=", 1)[1])
            except ValueError:
                sys.stderr.write(f"bad --version: {a!r}\n")
                return 1
        else:
            args.append(a)
    if len(args) != 1:
        sys.stderr.write("usage: delta2json [--version=N] <table_root>\n")
        return 1
    try:
        adds, meta, eff = replay_log(args[0], version)
    except (FileNotFoundError, ValueError) as exc:
        sys.stderr.write(f"{exc}\n")
        return 1
    sys.stdout.write(json.dumps({
        "version": eff,
        "partitionColumns": meta.get("partitionColumns") or [],
        "n_live_files": len(adds),
    }) + "\n")
    for a in sorted(adds, key=lambda x: x["path"]):
        sys.stdout.write(json.dumps({
            "path": a["path"],
            "partitionValues": dict(a.get("partitionValues") or {}),
            "size": a.get("size"),
        }, sort_keys=True) + "\n")
    return 0
