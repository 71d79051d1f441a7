"""Round-7c operator pins: streaming Misra-Gries under MULTI-batch
arrival (the order-dependence the single-batch oracle cannot see),
the V-optimal DP against brute-force enumeration, and the 4D skyline
against brute-force dominance."""

from __future__ import annotations

import itertools
import re

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _bigrams(text: str) -> list[str]:
    w = _tokens(text)
    return [f"{a} {b}" for a, b in zip(w, w[1:])] if len(w) >= 2 else []


def _mg_insert(S: list, t: str, c: int, k: int) -> list:
    """Pure-Python replica of the weighted MG insert (same branch logic
    as operators' _mg_insert_duck / _mg_insert_col / the streaming fold)."""
    for i, (st, sc) in enumerate(S):
        if st == t:
            S[i] = (st, sc + c)
            return S
    S.append((t, c))
    if len(S) > k:
        delta = min(sc for _, sc in S)
        S = [(st, sc - delta) for st, sc in S if sc - delta > 0]
    return S


def test_stream_misra_gries_multibatch_bounds(spark, tmp_path):
    """Three single-file micro-batches force the MG state to FOLD ACROSS
    batches (the order blocker that deferred this operator): the final
    per-shard summaries must stay <= k entries, at least one shard must
    have folded more than once, and the two-level merged summary must
    satisfy the mergeable-MG guarantee est <= true <= est + 2N/(k+1)
    plus completeness (every gram with true > 2N/(k+1) present) — the
    bounds that hold under ANY batching, unlike the summary contents."""
    import glob as globmod
    import os
    import shutil

    from frontmatter_mcp_spark.operators.sampling import hash_bucket
    from frontmatter_mcp_spark.streaming import ingest
    from frontmatter_mcp_spark.streaming import events as ev

    k, shards = 4, 2
    heavy = "hot spot " * 12  # dominant bigrams across every batch
    batches = [
        [(0, heavy), (1, "aa bb cc dd ee ff gg hh"), (2, "ii jj kk ll mm")],
        [(3, heavy), (4, "nn oo pp qq rr ss tt uu"), (5, "vv ww xx yy zz")],
        [(6, heavy), (7, "a1 b1 c1 d1 e1 f1 g1 h1 i1 j1")],
    ]
    d = tmp_path / "mgdocs"
    d.mkdir()
    for bi, rows in enumerate(batches):
        tmp = str(tmp_path / "_tmp")
        (
            spark.createDataFrame(rows, "doc_id long, text string")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        dest = str(d / f"b{bi}.parquet")
        shutil.move(globmod.glob(tmp + "/part-*.parquet")[0], dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_000 * (bi + 1), 1_000 * (bi + 1)))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    summ = ingest.misra_gries_summaries(stream, k=k, shards=shards)
    with ev._stream_state_partitions(spark):
        q = (
            summ.writeStream.outputMode("append")
            .format("memory")
            .queryName("mg_multibatch_out")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    rows = spark.table("mg_multibatch_out").collect()
    assert rows, "streaming MG emitted nothing"

    # per (shard, fold) summary size bounded by k
    sizes: dict[tuple, int] = {}
    for r in rows:
        sizes[(r.shard, r.n_folds)] = sizes.get((r.shard, r.n_folds), 0) + 1
    assert all(v <= k for v in sizes.values()), sizes
    # the state actually carried across micro-batches
    max_folds = max(r.n_folds for r in rows)
    assert max_folds >= 2, "no shard ever folded a second micro-batch"

    # final summaries = rows at each shard's max fold ordinal
    per_shard_max = {}
    for r in rows:
        per_shard_max[r.shard] = max(per_shard_max.get(r.shard, 0), r.n_folds)
    finals = [r for r in rows if r.n_folds == per_shard_max[r.shard]]

    # two-level merge replica in (shard, gram) order
    M: list = []
    for r in sorted(finals, key=lambda r: (r.shard, r.t)):
        M = _mg_insert(M, r.t, int(r.c), k)
    est = dict(M)

    truth: dict[str, int] = {}
    for _, text in itertools.chain.from_iterable(batches):
        for g in _bigrams(text):
            truth[g] = truth.get(g, 0) + 1
    n = sum(truth.values())
    bound = (2 * n) // (k + 1)
    for g, e in est.items():
        assert e <= truth[g], (g, e, truth[g])
        assert truth[g] - e <= bound, (g, e, truth[g], bound)
    # completeness: anything truly above the doubled budget must survive
    for g, tc in truth.items():
        if tc > bound:
            assert g in est, (g, tc, bound, est)
    assert "hot spot" in est  # the designed heavy hitter

    # shard assignment parity with the batch hash (spot-check one gram)
    some = finals[0]
    got = (
        spark.range(1)
        .select(hash_bucket(F.lit(some.t), shards).alias("b"))
        .collect()[0]
        .b
    )
    assert got == some.shard


def test_voptimal_dp_matches_bruteforce(spark):
    """q315's distributed DP must find the same optimum as exhaustive
    enumeration of all B-1 cut combinations over the sf0.001 daily
    series (exact integer SSE, (cost, cuts) lexicographic tie-break)."""
    from frontmatter_mcp_spark.workload.datapipe import (
        _VOPT_DP_B,
        q315_voptimal_dp,
    )

    out = q315_voptimal_dp(spark, SF).collect()
    B = _VOPT_DP_B
    assert len(out) == B
    assert all(r.dp_consistent == 1 for r in out)
    dp_cost = out[0].vopt_cost_fx

    con = duckdb.connect()
    daily = con.sql(
        f"""SELECT CAST(COUNT(*) AS BIGINT) FROM '{SF}/events.parquet'
            GROUP BY time_bucket(INTERVAL '1 day', ts)
            ORDER BY time_bucket(INTERVAL '1 day', ts)"""
    ).fetchall()
    xs = [r[0] for r in daily]
    N = len(xs)
    s = [0] * (N + 1)
    ss = [0] * (N + 1)
    for i in range(1, N + 1):
        s[i] = s[i - 1] + xs[i - 1]
        ss[i] = ss[i - 1] + xs[i - 1] * xs[i - 1]

    def sse(lo: int, hi: int) -> int:
        ln = hi - lo + 1
        sg = s[hi] - s[lo - 1]
        return (ss[hi] - ss[lo - 1]) - (sg * sg) // ln

    best = None
    for cuts in itertools.combinations(range(1, N), B - 1):
        bounds = [0, *cuts, N]
        cost = sum(
            sse(bounds[i] + 1, bounds[i + 1]) for i in range(B)
        )
        key = (cost, *cuts)
        if best is None or key < best:
            best = key
    assert dp_cost == best[0], (dp_cost, best)
    # the backtracked cut set matches the lexicographic-best enumeration
    his = [r.n_days for r in sorted(out, key=lambda r: r.bin)]
    cum, cuts = 0, []
    for nd in his[:-1]:
        cum += nd
        cuts.append(cum)
    assert tuple(cuts) == best[1:], (cuts, best)


def test_skyline_4d_matches_bruteforce(spark):
    """q316's bucketed two-pass frontier must equal brute-force O(n^2)
    dominance over the exact same four criteria at sf0.001."""
    from frontmatter_mcp_spark.workload.datapipe import q316_skyline_4d

    got = sorted(
        (r.doc_id, r.n_chars, r.n_distinct_terms, r.max_token_len,
         r.peak_term_count)
        for r in q316_skyline_4d(spark, SF).collect()
    )

    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH words AS (
          SELECT doc_id, unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS t
          FROM '{SF}/documents.parquet'
        ),
        tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
               FROM words GROUP BY 1, 2),
        feat AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS d2,
                 CAST(MAX(length(t)) AS BIGINT) AS d3,
                 CAST(MAX(c) AS BIGINT) AS d4
          FROM tf GROUP BY 1
        )
        SELECT d.doc_id, d.n_chars, f.d2, f.d3, f.d4
        FROM '{SF}/documents.parquet' d JOIN feat f USING (doc_id)
        """
    ).fetchall()

    def dominated(a, b):  # b dominates a (ignore doc_id column 0)
        return all(b[i] >= a[i] for i in (1, 2, 3, 4)) and any(
            b[i] > a[i] for i in (1, 2, 3, 4)
        )

    want = sorted(
        tuple(a) for a in rows if not any(dominated(a, b) for b in rows)
    )
    assert got == want


def test_percolation_monotone_and_cc_bruteforce(spark):
    """q349 invariants: raising the Jaccard threshold can only remove
    edges, so edge counts fall and total component counts rise
    monotonically; and the t=50 component census must match a plain
    union-find over the same integer-cross-multiplied edge rule."""
    from frontmatter_mcp_spark.workload.datapipe import (
        _MAX_DF,
        q349_threshold_percolation,
    )

    rows = sorted(
        q349_threshold_percolation(spark, SF).collect(),
        key=lambda r: r.threshold_pct,
    )
    for a, b in zip(rows, rows[1:]):
        assert a.n_edges >= b.n_edges
        assert a.n_components_total <= b.n_components_total
        assert a.largest_component >= b.largest_component

    con = duckdb.connect()
    edges = con.sql(
        f"""
        WITH toks AS (SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS w
             FROM '{SF}/documents.parquet'),
        sh AS (
          SELECT DISTINCT doc_id,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
          FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
          WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS ss FROM sh GROUP BY 1),
        dfreq AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
        f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
              WHERE dfreq.c <= {_MAX_DF}),
        inter AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS nc
          FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT ia, ib FROM inter
        JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib
        WHERE nc * 100 >= 50 * (sa.ss + sb.ss - nc)
        """
    ).fetchall()
    ndocs = con.sql(
        f"SELECT COUNT(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for nd in parent:
        comps.setdefault(find(nd), 0)
        comps[find(nd)] += 1
    r50 = rows[0]
    assert r50.n_edges == len(edges)
    assert r50.n_nodes_in_edges == len(parent)
    assert r50.n_edge_components == len(comps)
    assert r50.n_components_total == ndocs - len(parent) + len(comps)
    want_largest = max(comps.values()) if comps else 0
    if ndocs > len(parent):
        want_largest = max(want_largest, 1)
    assert r50.largest_component == want_largest


def test_learned_index_matches_numpy_fit(spark):
    """q350's per-segment OLS and error columns must match a numpy
    replica of the same anchored-offset fit and half-up rounding."""
    import numpy as np

    from frontmatter_mcp_spark.workload.datapipe import (
        _LIDX_SEGS,
        q350_learned_index_audit,
    )

    got = {r.segment: r for r in q350_learned_index_audit(spark, SF).collect()}
    con = duckdb.connect()
    keys = [
        r[0]
        for r in con.sql(
            f"SELECT o_orderkey FROM '{SF}/orders.parquet' ORDER BY 1"
        ).fetchall()
    ]
    n = len(keys)
    for s in range(_LIDX_SEGS):
        seg = [
            (k, i + 1)
            for i, k in enumerate(keys)
            if (i * _LIDX_SEGS) // n == s
        ]
        ks = np.array([k for k, _ in seg], dtype=np.float64)
        ps = np.array([p for _, p in seg], dtype=np.float64)
        x = ks - ks.min()
        if np.allclose(x.var(), 0):
            slope = 0.0
        else:
            slope = ((len(x) * (x * ps).sum() - x.sum() * ps.sum())
                     / (len(x) * (x * x).sum() - x.sum() ** 2))
        pred = np.floor(ps.mean() + slope * (x - x.mean()) + 0.5)
        max_err = int(np.abs(ps - pred).max())
        assert got[s].n_keys == len(seg)
        assert got[s].max_err == max_err, (s, got[s].max_err, max_err)


def test_hurst_matches_numpy_replica(spark):
    """q344's per-scale mean R/S and the OLS Hurst slope must match a
    numpy replica of the same integer-deviation, floored-fixed-point
    recipe."""
    import math

    import numpy as np

    from frontmatter_mcp_spark.workload.datapipe import (
        _HURST_FX,
        _HURST_LFX,
        _HURST_SCALES,
        q344_hurst_exponent,
    )

    got = {r.scale_days: r for r in q344_hurst_exponent(spark, SF).collect()}
    con = duckdb.connect()
    ys = [
        r[0]
        for r in con.sql(
            f"""SELECT CAST(COUNT(*) AS BIGINT) FROM '{SF}/events.parquet'
                GROUP BY time_bucket(INTERVAL '1 day', ts)
                ORDER BY time_bucket(INTERVAL '1 day', ts)"""
        ).fetchall()
    ]
    pts = []
    for s in _HURST_SCALES:
        nb = len(ys) // s
        acc = 0
        used = 0
        for b in range(nb):
            blk = ys[b * s : (b + 1) * s]
            sb = sum(blk)
            z = [s * y - sb for y in blk]
            cum = np.cumsum(z)
            ssz = sum(v * v for v in z)
            if ssz == 0:
                continue
            rs = (cum.max() - cum.min()) * math.sqrt(s) / math.sqrt(ssz)
            acc += math.floor(rs * _HURST_FX)
            used += 1
        mean_rs = acc / used / _HURST_FX
        assert got[s].n_blocks == used
        assert abs(got[s].mean_rs - round(mean_rs, 6)) < 1e-9
        pts.append(
            (
                math.floor(math.log(s) * _HURST_LFX),
                math.floor(math.log(mean_rs) * _HURST_LFX),
            )
        )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    hurst = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(got[_HURST_SCALES[0]].hurst - round(hurst, 6)) < 1e-9


def test_ljung_box_matches_numpy_acf(spark):
    """q343's Q statistic must match numpy autocorrelations composed
    through the same fixed-point term floor."""
    import math

    import numpy as np

    from frontmatter_mcp_spark.workload.datapipe import (
        _ACF_MAX_LAG,
        _LB_FX,
        q343_ljung_box,
    )

    got = {r.event_type: r for r in q343_ljung_box(spark, SF).collect()}
    con = duckdb.connect()
    for et in ("click", "error", "purchase", "signup", "view"):
        days = con.sql(
            f"""WITH daily AS (
                  SELECT time_bucket(INTERVAL '1 day', ts) AS day,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM '{SF}/events.parquet'
                  WHERE event_type = '{et}' GROUP BY 1),
                axis AS (SELECT unnest(generate_series(
                    (SELECT MIN(day) FROM daily),
                    (SELECT MAX(day) FROM daily), INTERVAL '1 day')) AS day)
                SELECT COALESCE(d.n, 0) FROM axis a
                LEFT JOIN daily d USING (day) ORDER BY a.day"""
        ).fetchall()
        y = np.array([r[0] for r in days], dtype=object)
        nd = len(y)
        d = y * nd - sum(y)
        den = sum(int(v) * int(v) for v in d)
        t_fx = 0
        for lag in range(1, _ACF_MAX_LAG + 1):
            num = sum(int(d[i]) * int(d[i + lag]) for i in range(nd - lag))
            rho = num / den
            t_fx += math.floor(rho * rho / (nd - lag) * _LB_FX)
        q = nd * (nd + 2) * t_fx / _LB_FX
        assert abs(got[et].q_ljung_box - round(q, 6)) < 1e-9, et


def test_mg_windowed_state_evicts_closed_windows(spark, tmp_path):
    """The windowed MG operator must EVICT state for closed windows:
    three single-file micro-batches spanning three days (the third 10
    days out so the watermark passes day-1's timer), then assert the
    state store reported removed rows and the per-day summaries are
    still correct (emission happened before eviction)."""
    import datetime
    import glob as globmod
    import os
    import shutil

    from frontmatter_mcp_spark.streaming import events as ev
    from frontmatter_mcp_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [(i, t0, 7) for i in range(4)],
        [(i, t0 + datetime.timedelta(days=1), 7) for i in range(4, 7)],
        [(99, t0 + datetime.timedelta(days=10), 7)],
    ]
    d = tmp_path / "mgw"
    d.mkdir()
    for bi, rows in enumerate(batches):
        tmp = str(tmp_path / "_tmp")
        (
            spark.createDataFrame(
                [(eid, ts, u) for eid, ts, u in rows],
                "event_id long, ts timestamp, user_id long",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        dest = str(d / f"b{bi}.parquet")
        shutil.move(globmod.glob(tmp + "/part-*.parquet")[0], dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_000 * (bi + 1), 1_000 * (bi + 1)))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    summ = ingest.misra_gries_windowed(
        stream, ts_col="ts", item_col="user_id", k=4, shards=1,
        retention="1 hour",
    )
    with ev._stream_state_partitions(spark):
        q = (
            summ.writeStream.outputMode("append")
            .format("memory")
            .queryName("mgw_evict_out")
            .start()
        )
        try:
            q.processAllAvailable()
            removed = sum(
                so.get("numRowsRemoved", 0)
                for p in q.recentProgress
                for so in p.get("stateOperators", [])
            )
        finally:
            q.stop()
            q.awaitTermination()
    rows = spark.table("mgw_evict_out").collect()
    assert removed >= 1, "closed-window MG state was never evicted"
    # summaries per day are still the exact per-day histograms (k=4
    # exceeds the 1 distinct user per day here)
    per_day = {}
    for r in rows:
        per_day.setdefault(r.win.date().isoformat(), {})[r.t] = r.c
    assert per_day["2024-01-01"]["7"] == 4
    assert per_day["2024-01-02"]["7"] == 3
    assert per_day["2024-01-11"]["7"] == 1
