"""Property tests for the round-6 operators: the Viterbi tokenizer DP
against a brute-force enumerator, the sequential smoothing folds against
plain Python loops, and the compaction bin rule's invariants."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import tokenize as tk


def _brute_best(word: str, freqs: dict[str, int], max_piece: int):
    """Enumerate every segmentation into vocab pieces; return the optimal
    (tokens, -sumfreq) segmentation with the longest-final-piece
    tie-break applied the same way the DP applies it (prefer larger
    piece at every split point, scanning left to right)."""
    best = None

    def rec(pos: int, acc: list[str]):
        nonlocal best
        if pos == len(word):
            key = (len(acc), -sum(freqs[p] for p in acc))
            if best is None or key < best[0]:
                best = (key, list(acc))
            return
        for k in range(1, max_piece + 1):
            piece = word[pos : pos + k]
            if len(piece) == k and piece in freqs:
                rec(pos + k, acc + [piece])

    rec(0, [])
    return best[0]


def test_unigram_segmentation_is_optimal_and_lossless(spark):
    rows = [
        ("aaab", 5),
        ("abab", 4),
        ("banana", 3),
        ("bnb", 2),
        ("a", 7),
        ("zzz", 1),
    ]
    words = spark.createDataFrame(rows, "w string, wc long")
    seg = tk.unigram_segment_vocab(words, "w", "wc", max_piece=3, vocab_size=50)
    out = {r.w: list(r.ps) for r in seg.collect()}
    # rebuild the piece-frequency table the operator derives
    freqs: dict[str, int] = {}
    for w, wc in rows:
        for i in range(len(w)):
            for k in range(1, 4):
                if i + k <= len(w):
                    freqs[w[i : i + k]] = freqs.get(w[i : i + k], 0) + wc
    # vocab_size=50 keeps every multi-char candidate here (there are <50)
    for w, _ in rows:
        ps = out[w]
        assert "".join(ps) == w, (w, ps)  # lossless
        assert all(1 <= len(p) <= 3 for p in ps)
        got = (len(ps), -sum(freqs[p] for p in ps))
        assert got == _brute_best(w, freqs, 3), (w, ps)  # optimal objective


def test_unigram_induce_counts_match_segmentations(spark):
    rows = [("abcabc", 4), ("bca", 2), ("cab", 1)]
    words = spark.createDataFrame(rows, "w string, wc long")
    seg = {r.w: list(r.ps) for r in
           tk.unigram_segment_vocab(words, "w", "wc", max_piece=3,
                                    vocab_size=50).collect()}
    est = {r.piece: r.est_count for r in
           tk.unigram_induce(words, "w", "wc", max_piece=3, vocab_size=50,
                             top=100).collect()}
    expected: dict[str, int] = {}
    for w, wc in rows:
        for p in seg[w]:
            expected[p] = expected.get(p, 0) + wc
    assert est == expected


def test_ewma_fold_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import q172_ewma_daily

    out = {r.event_type: r for r in
           q172_ewma_daily(spark, "/root/testdata/sf0.001").collect()}
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
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
        level, err = xs[0], 0.0
        for x in xs[1:]:
            err += abs(x - level)
            level = level * 0.75 + x * 0.25
        assert abs(out[et].ewma_level - round(level, 6)) < 1e-9, et
        if len(xs) > 1:
            assert abs(out[et].mae_1step - round(err / (len(xs) - 1), 6)) < 1e-9


def test_holt_fold_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import q176_holt_trend

    out = {r.event_type: r for r in
           q176_holt_trend(spark, "/root/testdata/sf0.001").collect()}
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
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
        level, trend, err = xs[0], 0.0, 0.0
        for x in xs[1:]:
            err += abs(x - (level + trend))
            nl = 0.25 * x + 0.75 * (level + trend)
            trend = 0.125 * (nl - level) + 0.875 * trend
            level = nl
        assert abs(out[et].level - round(level, 6)) < 1e-9, et
        assert abs(out[et].forecast_next - round(level + trend, 6)) < 1e-9, et


def test_compaction_bins_are_contiguous_and_sized(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _COMPACT_TARGET,
        q168_compaction_plan,
    )

    rows = q168_compaction_plan(spark, "/root/testdata/sf0.001").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r.bin)
        # bins are consecutive integers from 0 and doc ranges don't overlap
        for i, r in enumerate(bins):
            assert r.bin == i, (source, [b.bin for b in bins])
            if i:
                assert r.first_doc > bins[i - 1].last_doc
        # every bin except the last clears the target once its first file
        # lands (next-fit: a bin closes only when the cumsum passes target)
        for r in bins[:-1]:
            assert r.bytes > 0
        total = sum(r.bytes for r in bins)
        # next-fit never creates more bins than total/target + 1 per source
        assert len(bins) <= total // _COMPACT_TARGET + 1


def _gapfilled_daily(spark) -> dict[str, list[tuple[str, int]]]:
    """Per-type (day, count) series on the per-type gap-filled day axis."""
    import datetime as dt

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_type: dict[str, dict[dt.date, int]] = {}
    for r in daily:
        by_type.setdefault(r.event_type, {})[r.day.date()] = r.n
    out: dict[str, list[tuple[str, int]]] = {}
    for et, m in by_type.items():
        d, d1 = min(m), max(m)
        xs = []
        while d <= d1:
            xs.append((d.isoformat(), m.get(d, 0)))
            d += dt.timedelta(days=1)
        out[et] = xs
    return out


def test_cusum_fold_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import q192_cusum_changepoint

    out = {r.event_type: r for r in
           q192_cusum_changepoint(spark, "/root/testdata/sf0.001").collect()}
    for et, xs in _gapfilled_daily(spark).items():
        total = sum(n for _, n in xs)
        n_days = len(xs)
        s = max_s = n_alarms = 0
        first_alarm = None
        for day, n in xs:
            d = n * n_days - total - total // 4
            s = max(0, s + d)
            max_s = max(max_s, s)
            if s > 3 * total:
                n_alarms += 1
                if first_alarm is None:
                    first_alarm = day
        r = out[et]
        assert r.n_days == n_days and r.total_events == total, et
        assert r.max_cusum == max_s, et
        assert r.first_alarm_day == first_alarm, et
        assert r.n_alarms == n_alarms, et


def test_attribution_credit_conservation(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _ATTR_SCALE,
        _ATTR_TOUCH_TYPES,
        q194_touch_attribution,
    )

    rows = q194_touch_attribution(spark, "/root/testdata/sf0.001").collect()
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"), "user_id", F.col("ts").alias("cts")
    )
    touch = e.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES)).select(
        "user_id", "ts"
    )
    n_attributed = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("ts") < F.col("cts"))
            & (F.col("ts") >= F.col("cts") - F.expr("interval 3 days"))
        )
        .select("conv_id")
        .distinct()
        .count()
    )
    expected = n_attributed * _ATTR_SCALE
    # every attributed conversion distributes EXACTLY one credit unit
    # under each model (the integer remainder rule leaves no residue)
    assert sum(r.credit_linear for r in rows) == expected
    assert sum(r.credit_first for r in rows) == expected
    assert sum(r.credit_last for r in rows) == expected


def test_volume_correlation_matches_numpy(spark):
    import numpy as np

    from frontmatter_mcp_spark.workload.datapipe import q200_volume_correlation

    rows = q200_volume_correlation(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no type pairs"
    # replicate on the SHARED gap-filled axis (global span)
    per_type = _gapfilled_daily(spark)
    import datetime as dt

    d0 = min(dt.date.fromisoformat(xs[0][0]) for xs in per_type.values())
    d1 = max(dt.date.fromisoformat(xs[-1][0]) for xs in per_type.values())
    axis = []
    d = d0
    while d <= d1:
        axis.append(d.isoformat())
        d += dt.timedelta(days=1)
    series = {
        et: np.array([dict(xs).get(day, 0) for day in axis], dtype=float)
        for et, xs in per_type.items()
    }
    for r in rows:
        assert abs(r.corr) <= 1.0 + 1e-12
        expect = np.corrcoef(series[r.type_a], series[r.type_b])[0, 1]
        assert abs(r.corr - expect) < 1e-6, (r.type_a, r.type_b)


def test_zipf_fit_matches_numpy(spark):
    import numpy as np

    from frontmatter_mcp_spark.workload.datapipe import _ZIPF_TOP, q196_zipf_fit

    rows = {r.source: r for r in
            q196_zipf_fit(spark, "/root/testdata/sf0.001").collect()}
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    vocab = words.groupBy("source", "term").count().collect()
    by_src: dict[str, list[tuple[int, str]]] = {}
    for r in vocab:
        by_src.setdefault(r.source, []).append((r["count"], r.term))
    for src, terms in by_src.items():
        top = sorted(terms, key=lambda t: (-t[0], t[1]))[:_ZIPF_TOP]
        x = np.log(np.arange(1, len(top) + 1, dtype=float))
        y = np.log(np.array([c for c, _ in top], dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        r = rows[src]
        assert r.n_terms == len(top)
        assert abs(r.zipf_slope - slope) < 1e-4, src
        assert abs(r.intercept - intercept) < 1e-4, src
        assert -1e-9 <= r.r2 <= 1 + 1e-9


def test_markov_fixed_point_invariants(spark):
    from frontmatter_mcp_spark.workload.datapipe import (
        _MKV_SCALE,
        q193_markov_transitions,
    )

    rows = q193_markov_transitions(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # stationary mass: non-negative, total bounded by the scale (floor
    # division only loses mass, never creates it)
    assert all(r.pi_fx >= 0 for r in rows)
    assert sum(r.pi_fx for r in rows) <= _MKV_SCALE
    for r in rows:
        if r.n_out > 0:
            assert r.top_next is not None
            assert 0 <= r.self_p_fx <= r.top_next_p_fx <= _MKV_SCALE


def test_holt_winters_fold_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import q201_holt_winters

    out = {r.event_type: r for r in
           q201_holt_winters(spark, "/root/testdata/sf0.001").collect()}
    # q201 folds over OBSERVED days only (no gap fill) — rebuild that
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
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
        level = sum(xs[:7]) / 7.0  # float sum == left-assoc chain
        trend, err = 0.0, 0.0
        seas = [v - level for v in xs[:7]]
        for i in range(8, len(xs) + 1):
            s_idx = (i - 1) % 7
            sv = seas[s_idx]
            x = xs[i - 1]
            err += abs(x - (level + trend + sv))
            nl = 0.25 * (x - sv) + 0.75 * (level + trend)
            trend = 0.125 * (nl - level) + 0.875 * trend
            seas[s_idx] = 0.25 * (x - nl) + 0.75 * sv
            level = nl
        r = out[et]
        assert abs(r.level - round(level, 6)) < 1e-9, et
        assert abs(r.trend - round(trend, 6)) < 1e-9, et
        assert abs(
            r.forecast_next - round(level + trend + seas[len(xs) % 7], 6)
        ) < 1e-9, et
        assert abs(r.mae_1step - round(err / (len(xs) - 7), 6)) < 1e-9, et


def test_conformal_coverage_guarantee(spark):
    """Split-conformal's marginal guarantee: coverage on the held-out
    split lands at or above ~(1 - alpha) minus finite-sample slack.
    This pins the STATISTICAL property, not just cross-engine parity."""
    from frontmatter_mcp_spark.workload.datapipe import (
        q229_conformal_calibration,
    )

    row = q229_conformal_calibration(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.n_cal_pos > 20 and row.n_eval_pos > 20
    # finite-sample slack ~ 2 binomial sigmas at the eval size
    slack = 2.0 * (0.09 / row.n_eval_pos) ** 0.5 + 0.02
    assert row.coverage >= 0.9 - slack, row
    # the set must not be trivial (selecting everything)
    assert row.selection_rate < 1.0, row


def test_water_filling_invariants(spark):
    from frontmatter_mcp_spark.workload.datapipe import q233_water_filling

    rows = q233_water_filling(spark, "/root/testdata/sf0.001").collect()
    budget = rows[0].budget
    assert all(r.allocated <= r.capacity for r in rows)
    if any(r.capped for r in rows):
        # with any capped source the allocations exhaust the budget exactly
        assert sum(r.allocated for r in rows) == budget
        lo = min(r.allocated for r in rows if r.capped)
        # uncapped sources never exceed any capped source's level
        for r in rows:
            if not r.capped:
                assert r.capacity <= lo + 1
    else:
        assert sum(r.allocated for r in rows) <= budget


def test_km_survival_matches_python_loop(spark):
    from frontmatter_mcp_spark.workload.datapipe import q209_km_survival

    rows = q209_km_survival(spark, "/root/testdata/sf0.001").collect()
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    recs = e.select("user_id", "ts", "event_type").collect()
    entry, pts, mx = {}, {}, None
    for r in recs:
        entry[r.user_id] = min(entry.get(r.user_id, r.ts), r.ts)
        if r.event_type == "purchase":
            pts[r.user_id] = min(pts.get(r.user_id, r.ts), r.ts)
        mx = r.ts if mx is None else max(mx, r.ts)
    durs = []
    for u, t0 in entry.items():
        if u in pts:
            durs.append(((pts[u].date() - t0.date()).days, 1))
        else:
            durs.append(((mx.date() - t0.date()).days, 0))
    from collections import Counter

    d_at = Counter(t for t, ev in durs if ev)
    c_at = Counter(t for t, _ in durs)
    s = 1.0
    expect = []
    alive = len(durs)
    for t in sorted(c_at):
        n_risk = alive
        if d_at.get(t, 0) > 0:
            s = s * (1.0 - d_at[t] / n_risk)
            expect.append((t, n_risk, d_at[t], round(s, 6)))
        alive -= c_at[t]
    got = [(r.t_days, r.n_risk, r.d_events, r.s_hat) for r in rows]
    assert got == expect


def test_ks_statistic_matches_python(spark):
    from frontmatter_mcp_spark.workload.datapipe import q203_ks_source_shift

    rows = q203_ks_source_shift(spark, "/root/testdata/sf0.001").collect()
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    by_src: dict[str, list[int]] = {}
    for r in d.select("source", "n_chars").collect():
        by_src.setdefault(r.source, []).append(r.n_chars)
    vals = sorted({v for xs in by_src.values() for v in xs})
    for r in rows[:30]:
        xa = sorted(by_src[r.source_a])
        xb = sorted(by_src[r.source_b])
        na, nb = len(xa), len(xb)
        import bisect

        dmax = max(
            abs(bisect.bisect_right(xa, v) * nb - bisect.bisect_right(xb, v) * na)
            for v in vals
        )
        assert (r.n_a, r.n_b, r.d_scaled) == (na, nb, dmax), (
            r.source_a,
            r.source_b,
        )
