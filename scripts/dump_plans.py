"""Dump .explain("formatted") for named workload queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag-dir> <suffix> q137_dup_window_ladder ...

Writes plans/<tag-dir>/<query>_<suffix>.txt for each query. Queries whose
result DataFrame is driver-assembled (e.g. q164's trace) dump the final
DataFrame plan too — the per-step job plans are captured separately by the
optimization notes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frontmatter_mcp_spark.session import get_spark  # noqa: E402
from frontmatter_mcp_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"WROTE {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
