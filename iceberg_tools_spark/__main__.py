"""Tool dispatch: ``python -m iceberg_tools_spark <tool> [args...]``.

Mirrors the reference's `Main.java` registry (single registered
tool, `manifest2json`)."""

from __future__ import annotations

import sys

from .iceberg import manifest2json as m2j

TOOLS = {
    "manifest2json": (
        m2j.main,
        "Dumps an Iceberg Manifest Avro data file as JSON, record per line or pretty.",
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
