"""Regenerate QUERIES.md — the catalog of every queries() entry in
driver grading order, with its oracle status and first docstring line.

Usage: python scripts/gen_queries_md.py
"""

from __future__ import annotations

import sys


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = set(e.oracle_sql().keys())
    lines = [
        "# Query catalog",
        "",
        f"All {len(qs)} `queries()` entries in driver grading order "
        "(the driver's CORRECTNESS sweep grades roughly the first 50). "
        '"oracle" = full value-hash DuckDB twin in `oracle_sql()`; '
        '"rows-only" = principled no-oracle entry (LSH-dependent '
        "candidate sets, stub codecs, or no SQL equivalent such as "
        "DEFLATE) with a planted-oracle or unit-test sibling.",
        "",
    ]
    for i, (name, fn) in enumerate(qs.items(), 1):
        kind = "oracle" if name in oracles else "rows-only"
        doc = (fn.__doc__ or "").strip().split("\n")
        summary = " ".join(s.strip() for s in doc)
        if len(summary) > 180:
            summary = summary[:177] + "..."
        lines.append(f"{i}. **{name}** ({kind}) — {summary}")
    with open("/root/repo/QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md with {len(qs)} entries")


if __name__ == "__main__":
    main()
