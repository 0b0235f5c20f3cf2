"""Hadoop-style filesystem catalog: name → current table metadata,
no external service — the resolution layer that lets a user point at
a WAREHOUSE directory instead of a ``vN.metadata.json`` path.

Layout (Iceberg's HadoopCatalog contract):

    <warehouse>/<namespace>/<table>/metadata/v<N>.metadata.json
    <warehouse>/<namespace>/<table>/metadata/version-hint.text

``version-hint.text`` holds the integer N of the current metadata
version; a missing or stale hint falls back to the highest vN
present (the recovery behavior HadoopTableOperations implements —
the hint is an optimization, the file listing is the truth). All of
this is driver-side KB metadata: resolution lists ONE directory.

The reference tool takes explicit file paths
(``ManifestFileReadTool`` args); this layer adds the by-name lookup
its README assumes users perform by hand.
"""

from __future__ import annotations

import os
import re

_V_RE = re.compile(r"v(\d+)\.metadata\.json(\.gz)?$")


def table_location(warehouse: str, identifier: str) -> str:
    """``db.table`` (arbitrary dot-namespace depth) → table root."""
    parts = [p for p in identifier.split(".") if p]
    if not parts:
        raise ValueError(f"empty table identifier {identifier!r}")
    return os.path.join(warehouse, *parts)


def current_metadata_path(warehouse: str, identifier: str) -> str:
    """Resolve a table identifier to its CURRENT metadata file.

    ``version-hint.text`` is a STARTING POINT, not the answer:
    like HadoopTableOperations.findVersion, resolution probes past
    the hint for newer versions (every commit writes v(N+1) next to
    vN; stamping the hint is an optional last step), so a table
    appended-to after creation resolves to its newest metadata even
    with a stale hint. A missing/corrupt hint falls back to the
    full listing the same way.
    """
    mdir = os.path.join(table_location(warehouse, identifier), "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no such table {identifier!r} under {warehouse!r}")
    versions: dict[int, str] = {}
    for name in os.listdir(mdir):
        m = _V_RE.fullmatch(name)
        if m:
            versions[int(m.group(1))] = os.path.join(mdir, name)
    if not versions:
        raise FileNotFoundError(f"table {identifier!r} has no metadata versions")
    hint_path = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint_path):
        try:
            with open(hint_path) as f:
                hinted = int(f.read().strip())
            if hinted in versions:
                # probe upward: newest version at or past the hint
                return versions[max(v for v in versions if v >= hinted)]
        except (ValueError, OSError):
            pass  # corrupt hint → listing fallback below
    return versions[max(versions)]


def write_version_hint(metadata_path: str) -> str:
    """Stamp ``version-hint.text`` next to a just-committed
    ``vN.metadata.json`` (the commit protocol's last step in a
    Hadoop catalog). Returns the hint path."""
    m = _V_RE.search(os.path.basename(metadata_path))
    if not m:
        raise ValueError(f"{metadata_path!r} is not a vN.metadata.json")
    hint_path = os.path.join(os.path.dirname(metadata_path), "version-hint.text")
    tmp = hint_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(m.group(1))
    os.replace(tmp, hint_path)  # atomic on POSIX
    return hint_path


def list_tables(warehouse: str, namespace: str | None = None) -> list[str]:
    """Dotted identifiers of every table under the warehouse (a
    directory is a table iff it has a metadata/ dir with at least
    one vN.metadata.json), depth-first, sorted."""
    out: list[str] = []
    base = (
        os.path.join(warehouse, *namespace.split("."))
        if namespace
        else warehouse
    )
    if not os.path.isdir(base):
        return []
    for dirpath, dirnames, _ in os.walk(base):
        mdir = os.path.join(dirpath, "metadata")
        if os.path.isdir(mdir) and any(
            _V_RE.fullmatch(n) for n in os.listdir(mdir)
        ):
            rel = os.path.relpath(dirpath, warehouse)
            out.append(rel.replace(os.sep, "."))
            dirnames.clear()  # tables don't nest
    return sorted(out)


def load_table(
    spark,
    warehouse: str,
    identifier: str,
    snapshot_id: int | None = None,
    *,
    as_of_ms: int | None = None,
):
    """By-name MoR read: resolve the identifier through the catalog
    and read the (optionally time-traveled) snapshot via the
    engine's own reader. ``as_of_ms`` resolves ``AS OF TIMESTAMP``
    through the snapshot log (mutually exclusive with
    ``snapshot_id``)."""
    from .deletes import read_mor
    from .metadata import parse_metadata

    mpath = current_metadata_path(warehouse, identifier)
    meta = parse_metadata(mpath)
    if as_of_ms is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id OR as_of_ms, not both")
        from .snapshots import snapshot_as_of

        snapshot_id = snapshot_as_of(meta, as_of_ms)
    if snapshot_id is None:
        snapshot_id = meta.current_snapshot_id
    base_dir = os.path.dirname(os.path.dirname(mpath))  # table root
    return read_mor(spark, mpath, snapshot_id, base_dir)
