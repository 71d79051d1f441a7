"""Structural gate for the oracle OUTPUT-TYPING divergence class.

Round 11's two driver reds (q273/q279) were never rounding: they were
the only two of 369 oracles whose output columns were DuckDB HUGEINT
(windowed ``SUM(BIGINT)`` promotes to int128 and the columns were left
un-cast). HUGEINT crosses the driver's Arrow hash boundary as
``decimal128(38,0)`` and canonicalizes float-class against Spark's
int64 — hash-mismatch with rows and schema green, invisible to any
``fetchall()``-based local check because DuckDB hands HUGEINT back as
a plain Python int there.

Defense is layered:

1. ``tests/oracle_check.py`` now fetches DuckDB results via
   ``fetch_arrow_table()`` so the class fails LOCALLY (a Decimal cell
   normalizes float-class against Spark's int).
2. This gate binds ``DESCRIBE`` over every registered oracle (schema
   binding only — no execution, no Spark) and asserts that no output
   column types HUGEINT/UHUGEINT, and that any DECIMAL output is
   explicitly allowlisted with a review reason.

DECIMAL outputs are near-hazards, not automatic reds: the driver
normalizes decimal cells NUMERICALLY to float-class, so a decimal
oracle column paired with a Spark ``double`` of equal value stays
green (q217 proved it in r8). That pairing is fragile — it depends on
both engines producing the identical double — so every DECIMAL output
must be reviewed here rather than silently added.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from frontmatter_mcp_spark.workload import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TINY", "/root/testdata/sf0.001")

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Every DECIMAL-typed oracle output column, with the review that keeps
# it. Key: (query, column). New DECIMAL outputs fail the gate until
# reviewed — prefer casting to DOUBLE/BIGINT in the oracle instead.
REVIEWED_DECIMAL: dict[tuple[str, str], str] = {
    # DECIMAL(13,6) literal lookup table vs Spark double; driver
    # canonicalizes the decimal numerically, values are exact 6-dp
    # constants representable identically on both sides — driver-green
    # since r8 (CORRECTNESS_r08).
    ("q217_benford_audit", "p_expected"): "exact 6-dp Benford constants",
}


@pytest.fixture(scope="module")
def described():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out: dict[str, list[tuple[str, str]]] = {}
    for name, q in sorted(QUERIES.items()):
        assert q.oracle is not None, f"{name} lost its oracle"
        rows = con.sql(f"DESCRIBE {q.oracle}").fetchall()
        out[name] = [(r[0], r[1]) for r in rows]
    con.close()
    return out


def test_describe_binds_every_oracle(described):
    assert len(described) == len(QUERIES)


def test_no_hugeint_output_columns(described):
    bad = [
        (name, col, typ)
        for name, cols in described.items()
        for col, typ in cols
        if "HUGEINT" in typ.upper()
    ]
    assert not bad, (
        "oracle output columns type as DuckDB HUGEINT/UHUGEINT — these "
        "cross Arrow as decimal128 and hash float-class against Spark "
        "integers at the driver (the r11 q273/q279 red). CAST the "
        f"column to BIGINT in the oracle SQL: {bad}"
    )


def test_every_decimal_output_is_reviewed(described):
    seen = {
        (name, col)
        for name, cols in described.items()
        for col, typ in cols
        if typ.upper().startswith("DECIMAL")
    }
    unreviewed = seen - set(REVIEWED_DECIMAL)
    assert not unreviewed, (
        "DECIMAL-typed oracle output columns need explicit review (the "
        "driver hashes them float-class; the pairing with a Spark "
        "double is value-fragile). CAST to DOUBLE/BIGINT or add a "
        f"reviewed entry: {sorted(unreviewed)}"
    )
    stale = set(REVIEWED_DECIMAL) - seen
    assert not stale, f"stale REVIEWED_DECIMAL entries: {sorted(stale)}"
