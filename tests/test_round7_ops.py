"""Property tests for the round-7 operators: the multiplicative
Holt-Winters fold against a plain Python loop, the two-stage pinned
Misra-Gries against a pure-Python replica, the 3D skyline against the
brute-force dominance filter, and the MMR sweep's 0.7 chain against
q224 (same algorithm, same constants)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
_HEX = "0123456789abcdef"


def _hash_bucket(key: object, buckets: int) -> int:
    h = hashlib.md5(str(key).encode()).hexdigest()
    val = 0
    for ch in h[:7]:
        val = val * 16 + _HEX.index(ch)
    return val % buckets


def _tokens(text: str) -> list[str]:
    # Java \s (ASCII) — the corpus is ASCII so Python \s is equivalent
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def test_hw_multiplicative_fold_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        q257_holt_winters_multiplicative,
    )

    out = {r.event_type: r for r in
           q257_holt_winters_multiplicative(spark, SF).collect()}
    e = spark.read.parquet(f"{SF}/events.parquet")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(float(r.n))
    for et, xs in series.items():
        if len(xs) < 8:
            assert et not in out
            continue
        level = sum(xs[:7]) / 7.0
        trend, err = 0.0, 0.0
        seas = [v / level for v in xs[:7]]
        for i in range(8, len(xs) + 1):
            s_idx = (i - 1) % 7
            sv = seas[s_idx]
            x = xs[i - 1]
            err += abs(x - (level + trend) * sv)
            nl = 0.25 * (x / sv) + 0.75 * (level + trend)
            trend = 0.125 * (nl - level) + 0.875 * trend
            seas[s_idx] = 0.25 * (x / nl) + 0.75 * sv
            level = nl
        r = out[et]
        assert abs(r.level - round(level, 6)) < 1e-9, et
        assert abs(r.trend - round(trend, 6)) < 1e-9, et
        assert abs(
            r.forecast_next - round((level + trend) * seas[len(xs) % 7], 6)
        ) < 1e-9, et
        assert abs(
            r.season_ratio - round(max(seas) / min(seas), 6)
        ) < 1e-9, et
        assert abs(r.mae_1step - round(err / (len(xs) - 7), 6)) < 1e-9, et


def _mg_insert(S: list[list], t: str, c: int, k: int) -> list[list]:
    for e in S:
        if e[0] == t:
            e[1] += c
            return S
    S = S + [[t, c]]
    if len(S) <= k:
        return S
    delta = min(e[1] for e in S)
    return [[e[0], e[1] - delta] for e in S if e[1] - delta > 0]


def test_misra_gries_matches_python_replica_and_bounds(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _MG_BUCKETS,
        _MG_K,
        q259_misra_gries,
    )

    rows = q259_misra_gries(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    # pure-Python replica of the two pinned folds
    hists: dict[int, dict[str, int]] = {}
    truth: dict[str, int] = {}
    total = 0
    for d in docs:
        w = _tokens(d.text)
        b = _hash_bucket(d.doc_id, _MG_BUCKETS)
        for i in range(len(w) - 1):
            g = w[i] + " " + w[i + 1]
            hists.setdefault(b, {})[g] = hists.setdefault(b, {}).get(g, 0) + 1
            truth[g] = truth.get(g, 0) + 1
            total += 1
    entries: list[tuple[int, str, int]] = []
    for b, hist in hists.items():
        S: list[list] = []
        for t in sorted(hist):
            S = _mg_insert(S, t, hist[t], _MG_K)
        for t, c in S:
            entries.append((b, t, c))
    S: list[list] = []
    for b, t, c in sorted(entries):
        S = _mg_insert(S, t, c, _MG_K)
    expect = {t: c for t, c in S}
    got = {r.gram: r.est_c for r in rows}
    assert got == expect
    bound = (2 * total) // (_MG_K + 1)
    for r in rows:
        assert r.est_c <= truth[r.gram] <= r.est_c + bound, r
        assert r.lower_ok == 1 and r.upper_ok == 1, r


def test_skyline_3d_matches_bruteforce(spark):
    from frontmatter_mcp_spark.workload.datapipe import q261_skyline_3d

    got = {r.doc_id for r in q261_skyline_3d(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    ).collect()
    pts = []
    for d in docs:
        w = _tokens(d.text)
        pts.append((d.doc_id, d.n_chars, len(set(w)), max(map(len, w))))

    def dominated(p, q):
        return (
            q[1] >= p[1] and q[2] >= p[2] and q[3] >= p[3]
            and (q[1] > p[1] or q[2] > p[2] or q[3] > p[3])
        )

    expect = {
        p[0]
        for p in pts
        if not any(dominated(p, q) for q in pts if q[0] != p[0])
    }
    assert got == expect


def test_mmr_sweep_lambda07_matches_q224(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        q224_mmr_rerank,
        q260_mmr_lambda_sweep,
    )

    base = {}
    for r in q224_mmr_rerank(spark, SF).collect():
        base.setdefault(r.qid, []).append((r.step, r.cid))
    expect = {
        q: "|".join(str(c) for _, c in sorted(v)) for q, v in base.items()
    }
    sweep = {
        r.qid: r.selection
        for r in q260_mmr_lambda_sweep(spark, SF).collect()
        if abs(r.lam - 0.7) < 1e-12
    }
    assert sweep == expect
