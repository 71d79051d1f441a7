"""Boundary audit of every ROUND/FLOOR input in the oracle workload.

Round 10 shipped two driver-red rows (q273/q279) where the output hash
depended on ROUND(double, 6): the rounded value differed between this
sandbox's DuckDB/libm and the driver's, while rows and schema matched.
The hazard is structural, not query-specific: a rounding function can
only diverge across engines/builds when its INPUT lies on or within a
few ulp of a rounding boundary (half-integers at the scaled value for
ROUND, integers for FLOOR), or when the input itself moved by ~1 ulp
through a build-dependent transcendental (exp/ln/pow).

This script measures that hazard on the driver's OWN data (the parquet
at sf0.01 is fixed): it rewrites each oracle's ROUND(/FLOOR( calls to
site-tagged DuckDB Python UDFs that record every input, runs the
rewritten SQL, and reports every site whose captured inputs come within
MARGIN ulp of a boundary. A site with zero boundary-proximal inputs
cannot flip on the driver's data no matter which ROUND implementation
or libm build the driver uses (pure-arithmetic inputs are bit-identical
across IEEE engines; transcendental-tainted inputs move by a few ulp,
covered by the margin).

Usage:
    python scripts/round_audit.py [sf_dir] [query ...]

Prints one line per flagged site plus a summary; exit 1 if any site in
a hash-significant position is flagged outside the reviewed whitelist
in tests/test_round_discipline.py.
"""

from __future__ import annotations

import math
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oracle_check import TABLE_NAMES  # noqa: E402

# Flag an input whose scaled distance to the nearest rounding boundary
# is within this many ulp.  1 ulp is the theoretical libm divergence;
# 1024 gives three orders of magnitude of slack and still flags
# essentially nothing on continuous data.
MARGIN_ULP = 1024.0


def _ulp(y: float) -> float:
    return max(abs(y), 1.0) * 2.0**-52


def _rewrite(sql: str, fn: str, repl: str) -> tuple[str, int]:
    """Replace every `fn(` with `repl(<site>, ` (site = occurrence idx)."""
    out = []
    last = 0
    site = 0
    for m in re.finditer(rf"\b{fn}\s*\(", sql, re.I):
        out.append(sql[last : m.start()])
        out.append(f"{repl}({site}, ")
        site += 1
        last = m.end()
    out.append(sql[last:])
    return "".join(out), site


def _site_snippet(sql: str, fn: str, site: int) -> str:
    if fn == "DEC":
        # i-th CAST(... AS DECIMAL(p, s>0)) in text order (mirrors
        # _rewrite_decimal_casts' numbering)
        i = -1
        last = 0
        for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
            if m.start() < last:
                continue
            j = m.end()
            depth = 1
            while j < len(sql) and depth:
                depth += {"(": 1, ")": -1}.get(sql[j], 0)
                j += 1
            tail = _DEC_TAIL.search(sql[m.end() : j - 1])
            if not tail or int(tail.group(1)) == 0:
                continue
            i += 1
            last = j
            if i == site:
                return " ".join(sql[m.start() : m.start() + 64].split())
        return "?"
    for i, m in enumerate(re.finditer(rf"\b{fn}\s*\(", sql, re.I)):
        if i == site:
            return " ".join(sql[m.start() : m.start() + 64].split())
    return "?"


_DEC_TAIL = re.compile(r"\bAS\s+DECIMAL\s*\(\s*\d+\s*,\s*(\d+)\s*\)\s*$", re.I)


def _rewrite_decimal_casts(sql: str) -> tuple[str, int]:
    """Wrap every CAST(expr AS DECIMAL(p, s)) with s > 0 as
    CAST(audit_dec(site, s, expr) AS DECIMAL(p, s)).

    The double->DECIMAL(p,s) cast is a rounding function too: Spark
    (BigDecimal HALF_UP) and DuckDB round the 53-bit double to the
    1e-s quantum with different algorithms, so an input on/near a
    half-quantum is the same divergence class as ROUND (observed live:
    q76's inertia at sf0.1 differed in one 1e-12 quantum). s = 0 casts
    are the fx SUM discipline over exact integers — floor-audited
    separately, skipped here."""
    out = []
    last = 0
    site = 0
    for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
        start = m.start()
        if start < last:
            continue  # inside a CAST we already rewrote
        i = m.end()
        depth = 1
        while i < len(sql) and depth:
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        inner = sql[m.end() : i - 1]
        tail = _DEC_TAIL.search(inner)
        if not tail:
            continue
        scale = int(tail.group(1))
        if scale == 0:
            continue
        expr = inner[: tail.start()].rstrip()
        out.append(sql[last:start])
        # keep the original `AS DECIMAL(p, s)` tail verbatim
        out.append(f"CAST(audit_dec({site}, {scale}, {expr}) {inner[tail.start():]})")
        site += 1
        last = i
    out.append(sql[last:])
    return "".join(out), site


def audit_query(name: str, sql: str, sf_dir: str, tag_sites: bool = True) -> list[dict]:
    if tag_sites:
        sql_r, n_round = _rewrite(sql, "ROUND", "audit_round")
        sql_rf, n_floor = _rewrite(sql_r, "FLOOR", "audit_floor")
    else:
        # untagged fallback: a rounding call inside a GROUP BY expression
        # must stay textually identical between SELECT and GROUP BY, so
        # per-occurrence site ids cannot be injected — every occurrence
        # reports as site -1 (still boundary-measured, just unattributed)
        sql_r = re.sub(r"\bROUND\s*\(", "audit_round(-1, ", sql, flags=re.I)
        sql_rf = re.sub(r"\bFLOOR\s*\(", "audit_floor(-1, ", sql_r, flags=re.I)
        n_round = len(re.findall(r"\bROUND\s*\(", sql, re.I))
        n_floor = len(re.findall(r"\bFLOOR\s*\(", sql, re.I))
    sql_rf, n_dec = _rewrite_decimal_casts(sql_rf)
    if n_round + n_floor + n_dec == 0:
        return []

    # per-site stats: calls, exact-boundary hits, near-boundary hits,
    # worst (smallest) ulp distance, sample flagged inputs
    stats: dict[tuple[str, int], dict] = {}

    def _rec(kind: str, site: int, dist_ulp: float, x: float) -> None:
        s = stats.setdefault(
            (kind, site),
            {"calls": 0, "exact": 0, "near": 0, "min_ulp": math.inf, "samples": []},
        )
        s["calls"] += 1
        if dist_ulp <= MARGIN_ULP:
            if dist_ulp == 0.0:
                s["exact"] += 1
            else:
                s["near"] += 1
            if len(s["samples"]) < 3:
                s["samples"].append(x)
        if dist_ulp < s["min_ulp"]:
            s["min_ulp"] = dist_ulp

    def audit_round(site: int, x: float, k: int) -> float:
        if x is None or k is None:
            return None
        y = x * (10.0**k)
        if math.isfinite(y):
            d = abs(y - math.floor(y) - 0.5)
            _rec("ROUND", site, d / _ulp(y), x)
        # DuckDB-style scaled round-half-away (semantics preserved
        # closely enough to keep downstream query flow realistic)
        s = 10.0**k
        return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s

    def audit_floor(site: int, x: float) -> float:
        if x is None:
            return None
        if math.isfinite(x):
            d = abs(x - round(x))
            _rec("FLOOR", site, d / _ulp(x), x)
        return math.floor(x)

    def audit_dec(site: int, k: int, x: float) -> float:
        # double->DECIMAL(p,k) rounds x to the 1e-k quantum half-up(ish):
        # divergence-prone exactly when x*10^k is on/near a half-integer
        if x is None or k is None:
            return None
        y = x * (10.0**k)
        if math.isfinite(y):
            d = abs(y - math.floor(y) - 0.5)
            _rec("DEC", site, d / _ulp(y), x)
        return x

    con = duckdb.connect()
    try:
        from duckdb.typing import BIGINT, DOUBLE

        con.create_function("audit_round", audit_round, [BIGINT, DOUBLE, BIGINT], DOUBLE)
        con.create_function("audit_floor", audit_floor, [BIGINT, DOUBLE], DOUBLE)
        con.create_function("audit_dec", audit_dec, [BIGINT, BIGINT, DOUBLE], DOUBLE)
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        con.sql(sql_rf).fetchall()
    finally:
        con.close()

    flags = []
    for (kind, site), s in sorted(stats.items()):
        hit = s["exact"] + s["near"]
        if hit:
            flags.append(
                {
                    "query": name,
                    "kind": kind,
                    "site": site,
                    "snippet": _site_snippet(sql, kind, site),
                    "calls": s["calls"],
                    "exact": s["exact"],
                    "near": s["near"],
                    "min_ulp": s["min_ulp"],
                    "samples": s["samples"],
                }
            )
    return flags


def site_counts(sql: str) -> dict[str, int]:
    return {
        "round_sites": len(re.findall(r"\bROUND\s*\(", sql, re.I)),
        "floor_sites": len(re.findall(r"\bFLOOR\s*\(", sql, re.I)),
        "dec_sites": _rewrite_decimal_casts(sql)[1],
    }


def main() -> int:
    from frontmatter_mcp_spark.workload import QUERIES

    args = [a for a in sys.argv[1:] if not a.startswith("--receipt")]
    receipt_path = None
    for a in sys.argv[1:]:
        if a.startswith("--receipt="):
            receipt_path = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or [n for n in QUERIES if QUERIES[n].oracle]
    all_flags = []
    errors = []
    receipt: dict = {"sf_dir": sf_dir, "margin_ulp": MARGIN_ULP, "queries": {}}
    for name in names:
        sql = QUERIES[name].oracle
        if not sql:
            continue
        entry = dict(site_counts(sql))
        try:
            try:
                flags = audit_query(name, sql, sf_dir)
            except duckdb.BinderException:
                # site-tagged SELECT/GROUP BY copies stopped being
                # structurally equal — retry untagged (site -1)
                flags = audit_query(name, sql, sf_dir, tag_sites=False)
                entry["untagged"] = True
            entry["flags"] = [
                {k: v for k, v in f.items() if k != "query"} for f in flags
            ]
        except Exception as e:  # rewrite edge case or UDF type mismatch
            errors.append((name, str(e)[:200]))
            entry["error"] = str(e)[:200]
            flags = []
        receipt["queries"][name] = entry
        for f in flags:
            print(
                f"FLAG|{f['query']}|{f['kind']}#{f['site']}|calls={f['calls']}"
                f"|exact={f['exact']}|near={f['near']}|min_ulp={f['min_ulp']:.1f}"
                f"|{f['snippet']}|samples={f['samples']}",
                flush=True,
            )
        all_flags.extend(flags)
    for name, err in errors:
        print(f"ERROR|{name}|{err}", flush=True)
    if receipt_path:
        import json

        with open(receipt_path, "w") as fh:
            json.dump(receipt, fh, indent=1, sort_keys=True)
        print(f"RECEIPT|{receipt_path}", flush=True)
    print(
        f"SUMMARY|queries={len(names)}|flagged_sites={len(all_flags)}"
        f"|errors={len(errors)}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
