"""Libm-divergence simulation over the transcendental-tainted oracles.

The r10 driver reds (q273/q279) proved the driver environment computes
some double chains differently from this sandbox — a different DuckDB
build's libm (or ROUND implementation) shifting exp/ln results by
1 ulp. scripts/round_audit.py certifies the ROUND/FLOOR surface; this
script certifies the rest of the transcendental exposure EMPIRICALLY:
it re-runs every tainted oracle with ALL exp/ln/log2/pow calls replaced
by 1-ulp-shifted UDF versions (coherently up, then coherently down —
the worst-case build difference) and hash-compares against an
unshifted run of the SAME rewritten SQL, using the driver's own
canonicalization. Comparing rewritten-vs-rewritten isolates the 1-ulp
shift itself (not Python-math-vs-DuckDB-libm formula differences).

A query whose canonical output survives both shifts cannot go
driver-red from a libm difference at this data: every downstream
quantization (ROUND/FLOOR/DECIMAL cast) absorbs the shift, and every
comparison/ordering the values feed lands on the same side.

sqrt is NOT perturbed: IEEE 754 requires correct rounding, so it is
bit-identical across builds by definition.

Usage:
    python scripts/libm_perturb.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oracle_check import TABLE_NAMES, canonicalize  # noqa: E402

_FUNCS = ("ln", "exp", "log2", "pow")


def _shift(v: float, d: int) -> float:
    if v is None or not math.isfinite(v):
        return v
    if d == 0:
        return v
    return math.nextafter(v, math.inf if d > 0 else -math.inf)


def perturbed_sql(sql: str) -> str:
    """Replace every tainted call with its pert_* twin (no site tags —
    SELECT and GROUP BY copies stay textually identical)."""
    for fn in _FUNCS:
        sql = re.sub(rf"\b{fn}\s*\(", f"pert_{fn}(", sql, flags=re.I)
    return sql


def connect(sf_dir: str, d: int) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection whose pert_* functions shift by d ulp."""
    from duckdb.typing import DOUBLE

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    def _mk(fn):
        # DuckDB inspects the Python signature — exactly one positional
        # parameter (a default-arg closure would read as two)
        def f(x):
            return None if x is None else _shift(fn(x), d)

        return f

    for name, fn in (
        ("pert_ln", math.log),
        ("pert_exp", math.exp),
        ("pert_log2", math.log2),
    ):
        con.create_function(name, _mk(fn), [DOUBLE], DOUBLE)
    con.create_function(
        "pert_pow",
        lambda x, y: None if x is None or y is None else _shift(math.pow(x, y), d),
        [DOUBLE, DOUBLE],
        DOUBLE,
    )
    return con


def run_query(name: str, sql: str, sf_dir: str) -> dict[str, bool]:
    """{'up': same_as_base, 'down': same_as_base} under coherent shifts."""
    psql = perturbed_sql(sql)
    results = {}
    for tag, d in (("base", 0), ("up", 1), ("down", -1)):
        con = connect(sf_dir, d)
        try:
            rel = con.sql(psql)
            results[tag] = canonicalize(rel.columns, rel.fetchall())
        finally:
            con.close()
    return {
        "up": results["up"] == results["base"],
        "down": results["down"] == results["base"],
    }


def taint_counts(sql: str) -> int:
    return len(re.findall(r"\b(exp|ln|log2|pow)\s*\(", sql, re.I))


def main() -> int:
    from frontmatter_mcp_spark.workload import QUERIES

    args = [a for a in sys.argv[1:] if not a.startswith("--receipt")]
    receipt_path = None
    for a in sys.argv[1:]:
        if a.startswith("--receipt="):
            receipt_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or [
        n
        for n in sorted(QUERIES)
        if QUERIES[n].oracle and taint_counts(QUERIES[n].oracle)
    ]
    flips, errors = [], []
    receipt: dict = {"sf_dir": sf_dir, "queries": {}}
    for name in names:
        sites = taint_counts(QUERIES[name].oracle)
        try:
            res = run_query(name, QUERIES[name].oracle, sf_dir)
        except Exception as e:
            errors.append((name, str(e)[:160]))
            receipt["queries"][name] = {"sites": sites, "error": str(e)[:160]}
            print(f"ERROR|{name}|{str(e)[:160]}", flush=True)
            continue
        receipt["queries"][name] = {
            "sites": sites,
            "up_same": res["up"],
            "down_same": res["down"],
        }
        status = "SAME" if res["up"] and res["down"] else "FLIP"
        if status == "FLIP":
            flips.append(name)
        print(f"{status}|{name}|up={res['up']}|down={res['down']}", flush=True)
    if receipt_path:
        import json

        with open(receipt_path, "w") as fh:
            json.dump(receipt, fh, indent=1, sort_keys=True)
        print(f"RECEIPT|{receipt_path}", flush=True)
    print(
        f"SUMMARY|queries={len(names)}|flips={len(flips)}|errors={len(errors)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
