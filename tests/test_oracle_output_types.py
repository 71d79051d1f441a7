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


# --- int128-misround headroom gate (VERDICT r11 item 7) -------------------
#
# DuckDB converts HUGEINT/large-unscaled-DECIMAL to double via
# double(upper)*2^64 + double(lower) — TWO roundings — while Spark's
# BigDecimal path is correctly rounded; ~3.4% of integers above 2^63
# misround (scripts/hugeint_audit.py, validated against native casts).
# Every CAST(<decimal expr> AS DOUBLE) in the oracle corpus is therefore
# a latent divergence once its unscaled int128 magnitude crosses 2^63.
# The receipt pins the audit run on the driver's own sf0.01 data:
# per-query DECIMAL->DOUBLE site counts and the max unscaled magnitude
# observed. This gate (a) recomputes the cast-site counts statically so
# editing the cast surface without re-running the audit fails loudly,
# and (b) asserts every query keeps >= HEADROOM_BITS below 2^63 — the
# early-warning margin as data grows (the 2^49-scaled _fx sums are the
# closest approach: q76 at 2^55.1).

HUGEINT_RECEIPT = os.path.join(
    os.path.dirname(__file__), "data", "hugeint_audit_receipt.json"
)

# Enforced distance from the 2^63 misround boundary: 3 bits = the data
# may grow 8x before this gate fires, which fires long before the
# first actual misround. Queries needing more magnitude must move to
# sorted exact folds or rescale their fixed point.
HEADROOM_BITS = 3.0

# (query) -> review reason, for any site allowed inside the headroom
# band or the regime. Empty today — nothing is close.
REVIEWED_HEADROOM: dict[str, str] = {}


@pytest.fixture(scope="module")
def hugeint_receipt():
    import json

    with open(HUGEINT_RECEIPT) as fh:
        return json.load(fh)


def _decimal_cast_queries():
    import re as _re

    from frontmatter_mcp_spark.workload import QUERIES as _Q

    return {
        n: _Q[n].oracle
        for n in sorted(_Q)
        if _Q[n].oracle and _re.search(r"DECIMAL\(", _Q[n].oracle, _re.I)
    }


def test_hugeint_receipt_covers_every_decimal_oracle(hugeint_receipt):
    expected = set(_decimal_cast_queries())
    got = set(hugeint_receipt["queries"])
    assert got == expected, (
        "DECIMAL-bearing oracle set changed since the int128 audit — "
        "re-run scripts/hugeint_audit.py --receipt="
        f"{HUGEINT_RECEIPT}: missing={sorted(expected - got)} "
        f"stale={sorted(got - expected)}"
    )


def test_decimal_to_double_cast_surface_unchanged(hugeint_receipt):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "hugeint_audit",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "hugeint_audit.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    drift = []
    for name, sql in _decimal_cast_queries().items():
        _, n = mod._rewrite(sql)
        pinned = hugeint_receipt["queries"][name]["sites"]
        if n != pinned:
            drift.append((name, pinned, n))
    assert not drift, (
        "DECIMAL->DOUBLE cast sites changed since the int128 audit — "
        f"re-run scripts/hugeint_audit.py: {drift}"
    )


def test_no_unscaled_magnitude_near_int128_regime(hugeint_receipt):
    bad = []
    for name, st in hugeint_receipt["queries"].items():
        if name in REVIEWED_HEADROOM:
            assert st["misround"] == 0, (
                f"{name} is reviewed but MEASURED misrounds: {st}"
            )
            continue
        if st["in_regime"] or st["max_bits"] > 63.0 - HEADROOM_BITS:
            bad.append((name, st))
    assert not bad, (
        "oracle DECIMAL->DOUBLE casts within "
        f"{HEADROOM_BITS} bits of the 2^63 int128-misround boundary — "
        "rescale the fixed point or convert to a sorted exact fold, "
        f"then re-run the audit: {bad}"
    )
