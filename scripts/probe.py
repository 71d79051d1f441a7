"""Bracketed min-of-N probe for individual workload queries.

Usage: python scripts/probe.py [-n 3] q137_dup_window_ladder [q164_... ...]

Methodology (spark_optimization_guide §1 + this repo's host-noise
discipline): warm the session (q01 + a full-parallelism mapInPandas
no-op), time the q77_power_iteration control min-of-2 BEFORE and AFTER
the targets, then each target min-of-N serialized. Prints one line per
query: raw best, the control bracket, and the ratio vs the best-known
recorded in BENCH_LOCAL.json (normalized by the control factor).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frontmatter_mcp_spark.session import get_spark  # noqa: E402
from frontmatter_mcp_spark.workload import QUERIES  # noqa: E402

CONTROL = "q77_power_iteration"


def best_known(sf: float | None) -> dict[str, float]:
    from bench import _load_local_best

    return _load_local_best(sf)


def time_query(spark, name: str, sf_dir: str, n: int) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        QUERIES[name].spark(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    bk = best_known(sf)

    spark = get_spark(app_name="probe")
    QUERIES["q01_pricing_summary"].spark(spark, sf_dir).collect()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(lambda it: it, "id long").count()

    ctrl_before = time_query(spark, CONTROL, sf_dir, 2)
    results = {q: time_query(spark, q, sf_dir, args.n) for q in args.queries}
    ctrl_after = time_query(spark, CONTROL, sf_dir, 2)

    ctrl_best = bk.get(CONTROL)
    factor = min(ctrl_before, ctrl_after) / ctrl_best if ctrl_best else None
    out = {
        "control_best_known": ctrl_best,
        "control_before": round(ctrl_before, 3),
        "control_after": round(ctrl_after, 3),
        "host_factor": round(factor, 3) if factor else None,
    }
    for q, t in results.items():
        prev = bk.get(q)
        out[q] = {
            "best_of_n": round(t, 3),
            "best_known": prev,
            "ratio_raw": round(t / prev, 3) if prev else None,
            "ratio_norm": round(t / prev / factor, 3) if prev and factor else None,
        }
    print("PROBE| " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
