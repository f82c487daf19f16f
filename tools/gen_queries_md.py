"""Regenerate QUERIES.md — the auto-generated index of every
registered query: name, SURVEY §2 tags, oracle kind, first docstring
sentence. Usage: python tools/gen_queries_md.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.suite import REGISTRY  # noqa: E402


def first_sentence(doc: str) -> str:
    doc = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in doc:
            return doc.split(stop)[0] + "."
    return doc[:160]


def main() -> None:
    lines = [
        "# QUERIES — auto-generated registry index",
        "",
        "Regenerate with `python tools/gen_queries_md.py`. One row per",
        "`queries()` entry; **oracle** is `sql` (full DuckDB value-hash",
        "differential) or `rows` (rows-only by design).",
        "",
        f"{len(REGISTRY)} queries, "
        f"{sum(1 for s in REGISTRY.values() if s.oracle)} with SQL oracles.",
        "",
        "| query | survey tags | oracle | what |",
        "|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        tags = " ".join(spec.survey) or "—"
        kind = "sql" if spec.oracle else "rows"
        doc = first_sentence(spec.doc).replace("|", "\\|")
        lines.append(f"| `{name}` | {tags} | {kind} | {doc} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"QUERIES.md regenerated ({len(REGISTRY)} rows)")


if __name__ == "__main__":
    main()
