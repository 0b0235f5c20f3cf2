"""Tool dispatch: ``python -m iceberg_tools_spark <tool> [args...]``.

Mirrors the reference's `Main.java` registry (its single registered
tool is `manifest2json`; the additions cover the by-hand steps its
README assumes — resolving tables and inspecting Delta state)."""

from __future__ import annotations

import sys

from .iceberg import cli_tools
from .iceberg import manifest2json as m2j

TOOLS = {
    "manifest2json": (
        m2j.main,
        "Dumps an Iceberg Manifest Avro data file as JSON, record per line or pretty.",
    ),
    "catalog-list": (
        cli_tools.catalog_list_main,
        "Lists tables under a Hadoop-style warehouse directory.",
    ),
    "catalog-resolve": (
        cli_tools.catalog_resolve_main,
        "Prints a table's current vN.metadata.json (version-hint honored).",
    ),
    "delta2json": (
        cli_tools.delta2json_main,
        "Dumps a Delta table's reconstructed live-file state as JSON.",
    ),
    "delta-vacuum": (
        cli_tools.delta_vacuum_main,
        "Plans (default) or executes retention-gated physical file removal.",
    ),
    "delta-log-cleanup": (
        cli_tools.delta_log_cleanup_main,
        "Plans (default) or executes checkpoint-gated log retention cleanup.",
    ),
    "rest-serve": (
        cli_tools.rest_serve_main,
        "Serves a Hadoop-style warehouse through the REST catalog protocol.",
    ),
    "rest-resolve": (
        cli_tools.rest_resolve_main,
        "Prints a table's current metadata location via a REST catalog.",
    ),
}


def main(argv: list[str]) -> int:
    if not argv or argv[0] not in TOOLS:
        sys.stderr.write("Available tools:\n")
        for name, (_, desc) in sorted(TOOLS.items()):
            sys.stderr.write(f"    {name}  {desc}\n")
        return 1
    fn, _ = TOOLS[argv[0]]
    return fn(argv[1:])


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
