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
