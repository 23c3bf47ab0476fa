"""Generate QUERIES.md — the user-facing catalog index — from the registry.

Run: python tools/gen_query_docs.py  (rewrites QUERIES.md at the repo root).
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text


def main() -> None:
    from importer_spark.queries import DIAGNOSTICS, ORACLES, QUERIES

    lines = [
        "# QUERIES — the catalog, generated from the registry",
        "",
        "Regenerate with `python tools/gen_query_docs.py`. Every catalog row",
        "has a DuckDB oracle (the external gate compares them at sf0.01);",
        "diagnostics rows are verified by dedicated tests instead.",
        "",
        f"{len(QUERIES)} catalog queries · {len(DIAGNOSTICS)} diagnostics.",
        "",
        "| Query | Module | Oracle | Summary |",
        "|---|---|---|---|",
    ]
    for name, fn in sorted({**QUERIES, **DIAGNOSTICS}.items()):
        mod = fn.__module__.removeprefix("importer_spark.queries.")
        kind = "✓" if name in ORACLES else "diagnostics"
        summary = first_sentence(inspect.getdoc(fn)).replace("|", "\\|")
        lines.append(f"| `{name}` | {mod} | {kind} | {summary} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md with {len(QUERIES) + len(DIAGNOSTICS)} rows")


if __name__ == "__main__":
    main()
