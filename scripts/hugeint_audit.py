"""Audit of every DECIMAL -> DOUBLE cast for the int128 misround regime.

Discovered in r11 while attributing q177's sf0.1-only 1-ulp divergence:
DuckDB converts HUGEINT (int128) to double as
``double(upper) * 2^64 + double(lower)`` — TWO roundings — while
Spark's BigDecimal/Java path is correctly rounded. Measured: ~3.4% of
random integers above 2^63 misround (all values <= 2^63 are exact or
correctly rounded in both engines). Every ``CAST(<decimal expr> AS
DOUBLE)`` in the oracle corpus whose unscaled int128 magnitude crosses
2^63 is therefore a latent cross-engine divergence — the fixed-point
``_fx`` sums (DECIMAL(38,0) of value*2^49) and the DECIMAL(28,12)
term-sum family both approach the boundary as data grows.

This script rewrites each such cast to a site-tagged UDF over an exact
VARCHAR bridge, records per site: the max |unscaled| seen, how many
values sit in the int128 regime, and how many ACTUALLY misround under
the two-half emulation (validated against DuckDB's native cast).

Usage:
    python scripts/hugeint_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oracle_check import TABLE_NAMES  # noqa: E402

TWO63 = 1 << 63
TWO64 = 1 << 64


def duck_two_half_cast(u: int) -> float:
    """DuckDB's Hugeint::Cast<double>: sign-magnitude, then
    double(upper)*2^64 + double(lower) on the magnitude (validated
    against native casts: negatives convert via negate-first)."""
    if u < 0:
        return -duck_two_half_cast(-u)
    upper = u >> 64
    lower = u & (TWO64 - 1)
    return float(upper) * float(TWO64) + float(lower)


def _rewrite(sql: str) -> tuple[str, int]:
    """CAST(expr AS DOUBLE) with 'DECIMAL(' inside expr ->
    audit_hug(site, CAST(expr AS VARCHAR))."""
    out = []
    last = 0
    site = 0
    tail_re = re.compile(r"\bAS\s+DOUBLE\s*$", re.I)
    for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
        start = m.start()
        if start < last:
            continue
        i = m.end()
        depth = 1
        while i < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        inner = sql[m.end() : i - 1]
        t = tail_re.search(inner)
        if not t or "DECIMAL(" not in inner[: t.start()].upper().replace(" ", ""):
            continue
        expr = inner[: t.start()].rstrip()
        out.append(sql[last:start])
        out.append(f"audit_hug({site}, CAST(({expr}) AS VARCHAR))")
        site += 1
        last = i
    out.append(sql[last:])
    return "".join(out), site


def audit_query(name: str, sql: str, sf_dir: str) -> tuple[list[dict], dict]:
    sql_r, n = _rewrite(sql)
    if n == 0:
        return [], {"sites": 0, "max_bits": 0.0, "in_regime": 0, "misround": 0}
    stats: dict[int, dict] = {}

    def audit_hug(site: int, s: str) -> float:
        if s is None:
            return None
        d = decimal.Decimal(s)
        sign, digits, exp = d.as_tuple()
        u = int("".join(map(str, digits)) or "0") * (-1 if sign else 1)
        scale = -exp if exp < 0 else 0
        st = stats.setdefault(
            site, {"calls": 0, "in_regime": 0, "misround": 0, "max_abs_unscaled": 0}
        )
        st["calls"] += 1
        if abs(u) > st["max_abs_unscaled"]:
            st["max_abs_unscaled"] = abs(u)
        correct = float(d)
        if abs(u) >= TWO63:
            st["in_regime"] += 1
            approx = duck_two_half_cast(u) / (10.0**scale) if scale else duck_two_half_cast(u)
            if approx != correct:
                st["misround"] += 1
        return correct

    from duckdb.typing import BIGINT, DOUBLE, VARCHAR

    con = duckdb.connect()
    try:
        con.create_function("audit_hug", audit_hug, [BIGINT, VARCHAR], DOUBLE)
        for t in TABLE_NAMES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(sf_dir, t + '.parquet')}'"
            )
        con.sql(sql_r).fetchall()
    finally:
        con.close()

    flags = []
    max_abs = 0
    in_regime = misround = 0
    for site, st in sorted(stats.items()):
        max_abs = max(max_abs, st["max_abs_unscaled"])
        in_regime += st["in_regime"]
        misround += st["misround"]
        if st["in_regime"]:
            flags.append({"query": name, "site": site, **st})
    summary = {
        "sites": n,
        "max_bits": round(math.log2(max_abs), 1) if max_abs else 0.0,
        "in_regime": in_regime,
        "misround": misround,
    }
    return flags, summary


def main() -> int:
    import json

    from frontmatter_mcp_spark.workload import QUERIES

    args = [a for a in sys.argv[1:] if not a.startswith("--receipt")]
    receipt_path = None
    for a in sys.argv[1:]:
        if a.startswith("--receipt="):
            receipt_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or [
        n for n in sorted(QUERIES)
        if QUERIES[n].oracle and re.search(r"DECIMAL\(", QUERIES[n].oracle, re.I)
    ]
    total_flags = 0
    errors = 0
    receipt: dict[str, dict] = {}
    for name in names:
        try:
            flags, summary = audit_query(name, QUERIES[name].oracle, sf_dir)
        except Exception as e:
            errors += 1
            print(f"ERROR|{name}|{str(e)[:160]}", flush=True)
            continue
        receipt[name] = summary
        for f in flags:
            frac = math.log2(f["max_abs_unscaled"]) if f["max_abs_unscaled"] else 0
            print(
                f"FLAG|{f['query']}|site={f['site']}|calls={f['calls']}"
                f"|in_regime={f['in_regime']}|misround={f['misround']}"
                f"|max_bits={frac:.1f}",
                flush=True,
            )
        total_flags += len(flags)
    print(f"SUMMARY|queries={len(names)}|flagged_sites={total_flags}|errors={errors}", flush=True)
    if receipt_path:
        if errors:
            print("RECEIPT|refused: audit had errors", flush=True)
            return 1
        with open(receipt_path, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "queries": receipt},
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"RECEIPT|{receipt_path}|queries={len(receipt)}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
