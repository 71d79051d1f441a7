"""Regenerate QUERIES.md from the workload registry."""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from frontmatter_mcp_spark.workload import QUERIES

lines = [
    "# QUERIES — the oracle-checked workload inventory",
    "",
    "Generated from `workload/registry` (every entry has BOTH a Spark",
    "implementation and a DuckDB oracle; the driver hash-compares them at",
    "sf0.01). Regenerate with: `python scripts/gen_queries_md.py`.",
    "",
    f"**{len(QUERIES)} queries, {sum(1 for q in QUERIES.values() if q.oracle)} oracle-bearing.**",
    "",
    "| query | what it does |",
    "|---|---|",
]
for name in sorted(QUERIES, key=lambda n: int(re.match(r"q(\d+)", n).group(1))):
    q = QUERIES[name]
    doc = " ".join((q.doc or "(see implementation)").split())
    if len(doc) > 220:
        doc = doc[:217] + "..."
    lines.append(f"| {name} | {doc} |")
open("QUERIES.md", "w").write("\n".join(lines) + "\n")
