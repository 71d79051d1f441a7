"""Benchmark harness: runs every workload query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "workload_total", "value": <sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + collect), matching how
the reference's pytest-benchmark times its e2e query tool
(reference: tests/benchmarks/test_query.py:127-158).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from frontmatter_mcp_spark.session import get_spark  # noqa: E402
from frontmatter_mcp_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="frontmatter_mcp_spark_bench")
    # warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-call JIT + session setup
    QUERIES["q01_pricing_summary"].spark(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, q in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "workload_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
