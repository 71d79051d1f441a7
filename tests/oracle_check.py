"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a workload query on Spark and its oracle SQL on DuckDB over the same
sf dir, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by their serialized
form). Used by tests/test_oracle_parity.py and runnable standalone:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"float:{float(v)!r}"
    except ImportError:
        pass
    return f"{type(v).__name__}:{v}"


def canonicalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def compare_query(spark, con, name: str, spark_fn, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sdf = spark_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols, s_vals = canonicalize(sdf.columns, s_rows)

    # Fetch via Arrow, not fetchall(): the driver's hash boundary is
    # Arrow-typed, and DuckDB HUGEINT (e.g. un-cast windowed SUM(BIGINT))
    # crosses Arrow as decimal128(38,0) → Decimal → float-class, while
    # fetchall() hands back a plain int that hashes identically to
    # Spark's int64 and hides the divergence (r11 verdict: q273/q279
    # passed five fetchall sweeps while staying driver-red).
    tbl = con.sql(oracle).fetch_arrow_table()
    d_cols_raw = list(tbl.schema.names)
    d_rows = [tuple(d[c] for c in d_cols_raw) for d in tbl.to_pylist()]
    d_cols, d_vals = canonicalize(d_cols_raw, d_rows)

    if s_cols != d_cols:
        problems.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return problems
    if len(s_vals) != len(d_vals):
        problems.append(f"row count differs: spark={len(s_vals)} duckdb={len(d_vals)}")
    diffs = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
    if diffs:
        i = diffs[0]
        problems.append(
            f"{len(diffs)} differing rows (of {len(s_vals)}); first at sorted idx {i}:\n"
            f"  spark : {s_vals[i][:400]}\n  duckdb: {d_vals[i][:400]}"
        )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frontmatter_mcp_spark.session import get_spark
    from frontmatter_mcp_spark.workload import QUERIES

    from frontmatter_mcp_spark.operators.holds import _persistent_ids
    from frontmatter_mcp_spark.workload.registry import release_pinned

    only = set(sys.argv[2:])
    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duck_connection(sf_dir)
    failures = 0
    for name, q in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            print(f"SKIP (no oracle) {name}")
            continue
        try:
            problems = compare_query(spark, con, name, q.spark, q.oracle, sf_dir)
            # standing no-leak sweep over the WHOLE registry (the pytest
            # sweep covers representatives; this catches every hold()/pin()
            # call site each full-registry run): after replaying the
            # registry's next-query release step, no persistent RDD may
            # survive
            release_pinned()
            leaked = _persistent_ids(spark)
            if leaked:
                problems.append(
                    f"leaked persistent RDD ids {sorted(leaked)} past "
                    "release_pinned()"
                )
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {str(e)[:500]}"]
        if problems:
            failures += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"PASS {name}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
