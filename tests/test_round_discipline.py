"""Structural gate for the ROUND-of-double environment-divergence class.

Round 10 proved that local-green is not sufficient evidence for
hash-significant rounding: q273/q279 passed the full local oracle sweep
at three scale factors and still went driver-red, because Spark round
(BigDecimal HALF_UP), DuckDB ROUND (scaled-double; algorithm varies by
version), and Python floor(x*1e6+0.5) are DIFFERENT functions that
disagree when the scaled value lands on or within ~1 ulp of a
half-integer — and ratio-of-small-integer scores land on exact halves
routinely.

The r11 defense is layered:

1. Conversion: every site the runtime boundary audit
   (scripts/round_audit.py at sf0.01 — the driver's own data) flagged
   on/near a boundary was converted to floor fixed-point (`_fx` BIGINT
   or FLOOR(x*s)/s, both engine-independent for bit-identical inputs).
2. Receipt: the post-conversion audit run is pinned here as per-query
   ROUND/FLOOR site counts plus the reviewed surviving flags. This test
   recomputes the site counts statically from the live oracle SQL —
   editing any oracle's rounding surface without re-running the audit
   and updating the receipt fails loudly.
3. Taint rule: FLOOR is IEEE-exact, so a floor site is only hazardous
   when its input passed through a build-dependent transcendental
   (exp/ln/log/pow/trig — NOT sqrt, which IEEE requires correctly
   rounded). Queries mixing FLOOR with those functions need a reviewed
   reason below.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from frontmatter_mcp_spark.workload import QUERIES

RECEIPT = os.path.join(os.path.dirname(__file__), "data", "round_audit_receipt.json")

# Build-dependent transcendentals. sqrt is excluded: IEEE 754 requires
# correct rounding, so it is bit-identical across engines and builds.
_TAINT = re.compile(
    r"\b(exp|ln|log|log2|log10|pow|power|sin|cos|atan|atan2|tanh)\s*\(", re.I
)

# Surviving audit flags, each with the human review that keeps it.
# key: (query, kind, site index in SQL text order)
REVIEWED_FLAGS: dict[tuple[str, str, int], str] = {
    # min_ulp 17.4: >4 ulp from any half — no implementation pair can
    # disagree; inputs are pure-arithmetic gamma moment ratios
    ("q215_interarrival_gamma", "ROUND", 1): "min_ulp 17 — safe margin",
    # min_ulp 352: same reasoning, HHI concentration ratios
    ("q227_revenue_concentration", "ROUND", 0): "min_ulp 352 — safe margin",
    # min_ulp 188: frame-energy ratios, pure arithmetic
    ("q327_wav_frame_features", "ROUND", 0): "min_ulp 188 — safe margin",
}

# FLOOR sites flagged with exact-integer inputs are the _fx discipline
# BY DESIGN (the scaled value is constructed to be an exact integer;
# floor of an exact integer cannot flip for bit-identical inputs). They
# are hazardous only under transcendental taint; reviewed cases:
REVIEWED_TAINTED_FLOOR: dict[str, str] = {
    # exp enters lambda, but the flagged exact-integer floors are the
    # p_always rows clamped to the literal 1.0 by LEAST(1e0, ...) with
    # 1/lambda ~ 30 — a 1-ulp libm shift cannot cross the clamp
    "q273_msprt_sequential_ab": "clamp-stable LEAST(1.0,...) rows",
}

# Queries whose FLOOR/ROUND appears inside a GROUP BY expression the
# audit's site-tagged rewrite cannot bind get an untagged retry
# (site -1, boundary-measured but unattributed) — r11 closed the only
# such case (q21). Entries here cover any future query where even the
# untagged rewrite fails; each needs a manual review reason.
REWRITE_BLIND: dict[str, str] = {}


def _load_audit_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "round_audit",
        os.path.join(
            os.path.dirname(__file__), "..", "scripts", "round_audit.py"
        ),
    )
    ra = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ra)
    return ra


_RA = _load_audit_module()


def _site_counts(sql: str) -> tuple[int, int, int]:
    return (
        len(re.findall(r"\bROUND\s*\(", sql, re.I)),
        len(re.findall(r"\bFLOOR\s*\(", sql, re.I)),
        _RA._rewrite_decimal_casts(sql)[1],
    )


@pytest.fixture(scope="module")
def receipt() -> dict:
    with open(RECEIPT) as fh:
        return json.load(fh)


def test_receipt_covers_every_oracle(receipt):
    live = {n for n in QUERIES if QUERIES[n].oracle}
    recorded = set(receipt["queries"])
    assert live == recorded, (
        f"missing={sorted(live - recorded)} stale={sorted(recorded - live)} "
        "— re-run scripts/round_audit.py --receipt=tests/data/"
        "round_audit_receipt.json after changing the registry"
    )


def test_rounding_surface_unchanged_since_audit(receipt):
    """Any edit to an oracle's ROUND/FLOOR site count invalidates the
    audit receipt — re-run the audit, review new flags, update."""
    drifted = {}
    for name, entry in receipt["queries"].items():
        sql = QUERIES[name].oracle
        r, f, d = _site_counts(sql)
        rec = (
            entry["round_sites"],
            entry["floor_sites"],
            entry.get("dec_sites", d),
        )
        if (r, f, d) != rec:
            drifted[name] = {"receipt": rec, "live": (r, f, d)}
    assert not drifted, (
        f"rounding surface drifted since the audit: {drifted} — re-run "
        "scripts/round_audit.py --receipt=... and review the flags"
    )


def test_every_surviving_round_flag_is_reviewed(receipt):
    unreviewed = []
    for name, entry in receipt["queries"].items():
        for fl in entry.get("flags", []):
            if fl["kind"] != "ROUND":
                continue
            key = (name, "ROUND", fl["site"])
            if key not in REVIEWED_FLAGS:
                unreviewed.append((key, fl["min_ulp"], fl["snippet"]))
    assert not unreviewed, (
        "audit-flagged ROUND sites without a review entry: "
        f"{unreviewed} — convert to floor fixed-point or add a reviewed "
        "reason to REVIEWED_FLAGS"
    )


def test_reviewed_round_flags_keep_safe_margins(receipt):
    """A reviewed keep must stay >4 ulp from a boundary with zero exact
    hits — tighter data (a regenerated testdata set) re-triggers review."""
    for (name, kind, site), _reason in REVIEWED_FLAGS.items():
        entry = receipt["queries"][name]
        fl = next(
            f for f in entry["flags"] if f["kind"] == kind and f["site"] == site
        )
        assert fl["exact"] == 0 and fl["min_ulp"] > 4.0, (name, site, fl)


# Hazard-class DEC flags (an input ON or within 4 ulp of a half-quantum
# of its double->DECIMAL(p,s) cast) in driver-GREEN queries: the driver
# has already hash-verified these queries on this very data
# (CORRECTNESS r5-r10 rows), so its decimal cast provably agrees with
# Spark's HALF_UP on every one of these inputs. Transcendental-tainted
# members are additionally certified by the libm perturbation receipt.
# The one proven flip (q76 at sf0.1) and the one never-verified carrier
# (q339) were converted to floor fixed-point / sorted exact folds in
# r11 and must stay OUT of this set.
REVIEWED_DEC_QUERIES: set[str] = {
    "q105_bigram_lm_score",
    "q167_perplexity_buckets",
    "q171_curriculum_schedule",
    "q180_embedding_isotropy",
    "q181_all_but_the_top",
    "q196_zipf_fit",
    "q205_crossentropy_matrix",
    "q223_embedding_drift",
    "q227_revenue_concentration",
    "q263_token_entropy",
    "q265_lof_outliers",
    "q278_stream_audience_entropy",
    "q300_corpus_scorecard",
    "q77_power_iteration",
    "q94_unigram_lm_score",
}


def test_dec_hazards_are_reviewed(receipt):
    """Every hazard-class DEC flag needs the driver-green review (or a
    conversion); wide-margin DEC flags (exact=0, >4 ulp) are
    divergence-free for bit-identical inputs and auto-pass."""
    unreviewed = []
    for name, entry in receipt["queries"].items():
        for fl in entry.get("flags", []):
            if fl["kind"] != "DEC":
                continue
            if fl["exact"] > 0 or fl["min_ulp"] <= 4.0:
                if name not in REVIEWED_DEC_QUERIES:
                    unreviewed.append((name, fl["site"], fl["exact"], fl["min_ulp"]))
    assert not unreviewed, (
        "hazard-class double->DECIMAL cast inputs in unreviewed queries: "
        f"{unreviewed} — convert to floor fixed-point (q76/q339 pattern) "
        "or add the driver-green review to REVIEWED_DEC_QUERIES"
    )


def test_reviewed_dec_queries_are_driver_green(receipt):
    """The review reason is 'the driver already verified these exact
    inputs' — so every member must actually hold a green row."""
    from frontmatter_mcp_spark.workload import _LAST_GREEN_ROUND

    not_green = sorted(REVIEWED_DEC_QUERIES - set(_LAST_GREEN_ROUND))
    assert not not_green, (
        f"REVIEWED_DEC_QUERIES without a driver-green row: {not_green} — "
        "the green-row evidence does not cover them; convert instead"
    )


def test_tainted_floor_queries_are_reviewed(receipt):
    """FLOOR flags only matter under exp/ln/pow taint (floor of a
    bit-identical double is exact; sqrt is correctly rounded)."""
    need = set()
    for name, entry in receipt["queries"].items():
        has_floor_flag = any(f["kind"] == "FLOOR" for f in entry.get("flags", []))
        if has_floor_flag and _TAINT.search(QUERIES[name].oracle):
            need.add(name)
    missing = need - set(REVIEWED_TAINTED_FLOOR)
    assert not missing, (
        f"transcendental-tainted queries with boundary-proximal FLOOR "
        f"inputs lack review: {sorted(missing)}"
    )


def test_audit_errors_are_reviewed(receipt):
    unr = {
        name
        for name, entry in receipt["queries"].items()
        if "error" in entry and name not in REWRITE_BLIND
    }
    assert not unr, f"audit could not rewrite these queries: {sorted(unr)}"


# ---------------------------------------------------------------------------
# libm perturbation receipt (scripts/libm_perturb.py): every oracle
# carrying a build-dependent transcendental (exp/ln/log2/pow) re-run
# with ALL such calls shifted coherently by 1 ulp (both directions) and
# hash-compared against the unshifted run. up_same/down_same == True
# means no libm build difference can flip that query's hash at the
# driver's data — the empirical closure of the q273 exp divergence.
# ---------------------------------------------------------------------------
LIBM_RECEIPT = os.path.join(
    os.path.dirname(__file__), "data", "libm_perturb_receipt.json"
)

_LIBM_TAINT = re.compile(r"\b(exp|ln|log2|pow)\s*\(", re.I)


@pytest.fixture(scope="module")
def libm_receipt() -> dict:
    with open(LIBM_RECEIPT) as fh:
        return json.load(fh)


def test_libm_receipt_covers_every_tainted_oracle(libm_receipt):
    live = {
        n: len(_LIBM_TAINT.findall(QUERIES[n].oracle))
        for n in QUERIES
        if QUERIES[n].oracle and _LIBM_TAINT.search(QUERIES[n].oracle)
    }
    recorded = {n: e["sites"] for n, e in libm_receipt["queries"].items()}
    assert live == recorded, (
        "transcendental surface drifted since the perturbation run — "
        "re-run scripts/libm_perturb.py --receipt=tests/data/"
        f"libm_perturb_receipt.json (live={live} receipt={recorded})"
    )


def test_every_tainted_oracle_survives_1ulp_shifts(libm_receipt):
    failing = {
        n: e
        for n, e in libm_receipt["queries"].items()
        if "error" in e or not (e["up_same"] and e["down_same"])
    }
    assert not failing, (
        f"queries whose hash flips under a 1-ulp libm shift: {failing} — "
        "strengthen the quantization at the emission site (the q273 "
        "fixed-point discipline)"
    )
