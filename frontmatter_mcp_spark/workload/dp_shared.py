"""Shared helpers for the datapipe workload families: oracle SQL fragments, hash/bucket utilities, and constants used by more than one family module.

Split out of workload/datapipe.py (round 8, VERDICT r07 item 7); the
aggregator module re-exports every name so existing imports keep
working. Queries register into workload.registry.QUERIES at import.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from frontmatter_mcp_spark.functions import vector
from frontmatter_mcp_spark.operators import dedup as dd
from frontmatter_mcp_spark.operators import similarity as sim
from frontmatter_mcp_spark.operators import text as tx
from frontmatter_mcp_spark.operators import tokenize as tk
from frontmatter_mcp_spark.sources import multimodal as mm
from frontmatter_mcp_spark import tables
from frontmatter_mcp_spark.tables import ensure_parallelism, load_table
from frontmatter_mcp_spark.workload.registry import pin, register

# ---------------------------------------------------------------------------
# shared DuckDB oracle fragments
# ---------------------------------------------------------------------------

# distinct word-3gram shingles per doc (matches operators.dedup.word_shingles)
_SHINGLES_CTE = """
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
)
"""

_NUM_HASHES = 8

_BANDS = 4

def _sig_exprs() -> str:
    return ",\n           ".join(
        f"MIN(substr(md5('{h}|' || shingle), 1, 16)) AS sig_{h}" for h in range(_NUM_HASHES)
    )

# ---------------------------------------------------------------------------
# q33 — exact n-gram Jaccard near-dup pairs (verification pass)
# ---------------------------------------------------------------------------
_JACCARD_THRESHOLD = 0.4

_MAX_DF = 50

# ---------------------------------------------------------------------------
# shared cosine fragment for the vector oracles (bit-identical to Spark's
# aggregate/zip_with fold — both are sequential left folds over doubles)
# ---------------------------------------------------------------------------
def _duck_cos(a: str, b: str) -> str:
    def dot(x: str, y: str) -> str:
        return (
            f"list_sum([CAST({x}[i] AS DOUBLE) * {y}[i] "
            f"FOR i IN generate_series(1, len({x}))])"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"

# ---------------------------------------------------------------------------
# q37 — IVF-pruned top-k (coarse cells = label centroids, nprobe=2)
# ---------------------------------------------------------------------------
# 2^49 fixed-point mean (functions.vector.fixed_point_mean): floor() of a
# power-of-two scaling is bit-identical in any IEEE engine, the DECIMAL(38,0)
# integer sum is exact and order-independent, and there is a single
# int->double rounding at the end.  (A double->DECIMAL(_,s) cast is NOT
# portable: Spark rounds the exact value HALF_UP, DuckDB rounds fl(v*10^s) —
# float32-dyadic data lands on ties the engines break differently.)
_FXS = "562949953421312.0"  # 2^49

def _fx_mean(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {_FXS}) AS DECIMAL(38,0))) AS DOUBLE)"
        f" / COUNT(*) / {_FXS}"
    )

# ---------------------------------------------------------------------------
# q43 — random-hyperplane LSH ANN (bucketed similarity search)
# ---------------------------------------------------------------------------
_LSH_NBITS = 4

_LSH_DIM = 64

# ---------------------------------------------------------------------------
# q82 — multi-probe LSH recall calibration vs brute-force ground truth
# ---------------------------------------------------------------------------
def _duck_lsh_bucket(col: str, nbits: int) -> str:
    """DuckDB expression for the hyperplane bucket of an embedding column
    — same md5-derived planes as similarity.hyperplane_bucket."""
    planes = sim.hyperplanes(_LSH_DIM, nbits)
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            f"list_sum([CAST({col}[i] AS DOUBLE) * ({arr}::DOUBLE[])[i] "
            f"FOR i IN generate_series(1, len({col}))])"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"

# ---------------------------------------------------------------------------
# q48 — deterministic k-means (Lloyd) coarse quantizer, oracle-replayed
# ---------------------------------------------------------------------------
_KMEANS_K = 8

_KMEANS_ITERS = 3

def _kmeans_ctes(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    dist = (
        "list_sum([(CAST(v.embedding[i] AS DOUBLE) - c.cent[i]) * "
        "(CAST(v.embedding[i] AS DOUBLE) - c.cent[i]) "
        "FOR i IN generate_series(1, len(v.embedding))])"
    )
    ctes = [
        f"""c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             CAST(embedding AS DOUBLE[]) AS cent
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM embeddings v, c{t - 1} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""m{t} AS (
      SELECT a.cid, i AS pos,
             {_fx_mean('CAST(v.embedding[i] AS DOUBLE)')} AS mv
      FROM a{t} a JOIN embeddings v USING (vec_id),
           UNNEST(generate_series(1, len(v.embedding))) AS t(i)
      GROUP BY a.cid, i
    )"""
        )
        ctes.append(
            f"""c{t} AS (
      SELECT p.cid, COALESCE(n.cent, p.cent) AS cent
      FROM c{t - 1} p
      LEFT JOIN (SELECT cid, list(mv ORDER BY pos) AS cent FROM m{t} GROUP BY cid) n
        USING (cid)
    )"""
        )
    return ",\n    ".join(ctes)

# ---------------------------------------------------------------------------
# q56 — near-dup GROUP assignment: min-label propagation over the
# Jaccard pair graph (keeper selection, the last step of dedup)
# ---------------------------------------------------------------------------
_LP_ITERS = 3

def _neardup_groups_sql(iters: int = _LP_ITERS) -> str:
    ctes = [
        f"""pairs AS (
      SELECT id_a, id_b FROM (
        WITH {_SHINGLES_CTE},
        sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
        dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
        f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
              WHERE dfreq.df_count <= {_MAX_DF}),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
          FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common) >= {_JACCARD_THRESHOLD}
      )
    )""",
        """edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b AS src, id_a AS dst FROM pairs
    )""",
        "l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""l{t} AS (
      SELECT l.node,
             LEAST(l.label, COALESCE(n.nbr_label, l.label)) AS label
      FROM l{t - 1} l
      LEFT JOIN (
        SELECT e.src, MIN(p.label) AS nbr_label
        FROM edges e JOIN l{t - 1} p ON p.node = e.dst
        GROUP BY e.src
      ) n ON n.src = l.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS doc_id, label AS group_id FROM l{iters}
    """
    )

from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql as _hash_bucket_duck  # noqa: E402

# ---------------------------------------------------------------------------
# q84 — PII/safety profile (regex counters + composite risk score)
# ---------------------------------------------------------------------------
# patterns restricted to syntax RE2 (DuckDB) and java.util.regex agree on
_PII_PATTERNS = {
    "n_emails": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "n_urls": r"https?://[^ ]+",
    "n_phones": r"\d{3}[-.]\d{3,4}[-.]\d{4}",
    "n_long_digit_runs": r"\d{9,}",
}

# q85 — per-source length-outlier filter (exact-percentile fences)
# ---------------------------------------------------------------------------
# fences at 1/32 and 31/32: exact binary fractions, so Spark `percentile`
# and DuckDB `quantile_cont` interpolate bit-identically (the q24 technique)
_LEN_P_LOW = 1 / 32

_LEN_P_HIGH = 31 / 32

# ---------------------------------------------------------------------------
# q86 — bloom-prefiltered incremental dedup (prune BEFORE the shuffle)
# ---------------------------------------------------------------------------
_BLOOM_M = 4096  # bit positions

_BLOOM_K = 3  # hashes per fingerprint

# q88 — composite quality gate (one scan, one broadcast, all filters)
# ---------------------------------------------------------------------------
_MIN_TOKENS = 5

# ---------------------------------------------------------------------------
# q59 — boilerplate span detection (cross-doc repeated n-grams)
# ---------------------------------------------------------------------------
_SPAN_N = 4

_SPANS_CTE = """
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
sp AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS span
  FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 4
)
"""

# ---------------------------------------------------------------------------
# q77 — power iteration: dominant eigenvector of X^T X, oracle-replayed
# ---------------------------------------------------------------------------
_PI_DIM = 64

_PI_ITERS = 3

def _power_iteration_ctes(
    dim: int = _PI_DIM,
    iters: int = _PI_ITERS,
    src: str | None = None,
    prefix: str = "",
) -> list[str]:
    """The shared power-iteration CTE chain: x (cast vectors, omitted
    when ``src`` names an existing (vec_id, x) CTE) and
    {prefix}v0..{prefix}v{iters} (the normalized state per iteration).
    ``prefix`` namespaces the chain so several runs (raw / centered /
    corrected spaces) can coexist in one query."""
    xs = src or f"{prefix}x"
    p = prefix
    dot = f"list_sum([x.x[j] * vv.v[j] FOR j IN generate_series(1, {dim})])"
    ctes = [
        f"{p}v0 AS (SELECT [1.0 / sqrt({dim}.0) FOR i IN generate_series(1, {dim})] AS v)",
    ]
    if src is None:
        ctes.append(
            f"{p}x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)"
        )
    for t in range(1, iters + 1):
        ctes.append(
            f"""{p}s{t} AS (
      SELECT i AS pos,
             CAST(SUM(CAST(x.x[i] * {dot} AS DECIMAL(28,12))) AS DOUBLE) AS s
      FROM {xs} x, {p}v{t - 1} vv, UNNEST(generate_series(1, {dim})) AS t(i)
      GROUP BY 1
    )"""
        )
        ctes.append(
            f"""{p}n{t} AS (SELECT sqrt(list_sum(list(s * s ORDER BY pos))) AS norm FROM {p}s{t})"""
        )
        ctes.append(
            f"""{p}v{t} AS (SELECT list(s / {p}n{t}.norm ORDER BY pos) AS v FROM {p}s{t}, {p}n{t} GROUP BY {p}n{t}.norm)"""
        )
    return ctes

_GUMBEL_SPAN = 16**7

# ---------------------------------------------------------------------------
# q127 — raking / iterative proportional fitting: per-(lang, source)
# sampling weights that hit BOTH the language and the source target
# marginals (multi-constraint mixture balancing — the 2D upgrade over
# q83/q103's single-margin mixes)
# ---------------------------------------------------------------------------
_RAKE_SCALE = 2**20

_RAKE_STEPS = ["lang", "source", "lang", "source"]  # 2 full IPF sweeps

def _raking_sql(table: str, idiv: str) -> str:
    """One template, two dialects: ``idiv`` is '//' for DuckDB and
    ' div ' for Spark SQL — every operation is integer floor division
    on scaled weights, so both engines replay the fit bit-identically.
    Weight magnitude is bounded by S * (margin ratio)^steps — int64-safe
    for any realistic skew (ratios are O(1) once targets are feasible).
    """
    s = _RAKE_SCALE
    margin_card = {"lang": "nl", "source": "ns"}
    ctes = [
        f"""cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    )""",
        """tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
      FROM cells
    )""",
        f"w0 AS (SELECT lang, source, n, CAST({s} AS BIGINT) AS w FROM cells)",
    ]
    for k, margin in enumerate(_RAKE_STEPS, start=1):
        nm = margin_card[margin]
        ctes += [
            f"""m{k} AS (
      SELECT {margin}, GREATEST((CAST(SUM(n * w) AS BIGINT) {idiv} {s}),
                                CAST(1 AS BIGINT)) AS md
      FROM w{k - 1} GROUP BY 1
    )""",
            f"""w{k} AS (
      SELECT p.lang, p.source, p.n,
             CAST((p.w * (((t.nt {idiv} t.{nm}) * {s}) {idiv} m.md)) {idiv} {s}
                  AS BIGINT) AS w
      FROM w{k - 1} p JOIN m{k} m ON m.{margin} = p.{margin} CROSS JOIN tot t
    )""",
        ]
    joined = ",\n    ".join(ctes)
    last = len(_RAKE_STEPS)
    return f"""
    WITH {joined}
    SELECT lang, source, CAST(n AS INT) AS n_docs, w AS weight_fx,
           CAST((n * w) {idiv} {s} AS BIGINT) AS expected_docs
    FROM w{last}
    """

_BM25_SCALE = 1 << 30  # fixed-point accumulator: FLOOR(term * 2^30)

# ---------------------------------------------------------------------------
# q152 — join-size estimation from Count-Min sketches (the AGMS/CMS
# inner-product bound): |A join B on k| is estimated as min over sketch
# rows of sum_c A[r][c]*B[r][c] — the optimizer-statistics trick that
# prices a join WITHOUT scanning it. md5-derived rows (q132 discipline)
# make the whole estimate cross-engine exact, and the inner product is
# a hard overestimate (cross terms are nonnegative), which ships as a
# hash-checked boolean.
# ---------------------------------------------------------------------------
_JSZ_DEPTH = 4

_JSZ_WIDTH = 256

# ---------------------------------------------------------------------------
# q170 — hash-sample quantile summary: the engine-PORTABLE distributed
# quantile estimator next to q27's engine-specific approx_percentile
# sketch — a deterministic md5 Bernoulli sample IS a mergeable summary
# (union of per-partition samples = sample of the union), and because
# both engines draw the identical sample, the estimates hash-verify
# EXACTLY, with the error against ground truth reported alongside
# ---------------------------------------------------------------------------
_HSQ_RATE = 50  # buckets of 1000 -> 5% sample

# ---------------------------------------------------------------------------
# q193 — Markov transition matrix over per-user event sequences + the
# chain's stationary distribution: the behavioral fingerprint (what
# follows what, and where does a random session spend its time) in the
# q126 exact fixed-point arithmetic so every power iteration replays
# bit-identically in the oracle CTEs
# ---------------------------------------------------------------------------
_MKV_SCALE = 2**30

# ---------------------------------------------------------------------------
# q214 — design-effect audit of the q127 raking weights: Kish effective
# sample size and weight variability — the check every weighted-
# mixture design needs BEFORE training on it (a raked mix that hits
# its marginals but has deff 3 is paying 3x the variance). One
# template, both engines, on top of the q127 chain
# ---------------------------------------------------------------------------
def _kish_sql(table: str, idiv: str) -> str:
    return f"""
    WITH r AS ({_raking_sql(table, idiv)}),
    s AS (
      SELECT CAST(SUM(CAST(n_docs AS BIGINT)) AS BIGINT) AS n_total,
             CAST(SUM(CAST(n_docs AS BIGINT) * weight_fx) AS BIGINT) AS sw,
             CAST(SUM(CAST(n_docs AS BIGINT) * weight_fx * weight_fx)
                  AS BIGINT) AS sw2
      FROM r
    )
    SELECT n_total, sw, sw2,
           ROUND((CAST(sw AS DOUBLE) * sw) / sw2, 4) AS n_eff,
           ROUND(n_total / ((CAST(sw AS DOUBLE) * sw) / sw2), 6) AS deff,
           ROUND(sqrt(CAST(n_total AS DOUBLE) * sw2 / (CAST(sw AS DOUBLE) * sw)
                      - 1e0), 6) AS cv_weights
    FROM s
    """

# ---------------------------------------------------------------------------
# q255 — absorbing-chain conversion analysis: from each event type,
# the probability of reaching 'purchase' within T steps and the
# expected number of steps conditional on arriving — q193's transition
# matrix treated as an absorbing Markov chain (purchase absorbs), the
# truncated Neumann recursion replayed per step in oracle CTEs with
# the same 2^30 fixed-point floor arithmetic
# ---------------------------------------------------------------------------
_ABS_STEPS = 8

# ---------------------------------------------------------------------------
# q269 — Bloom-filter false-positive calibration: build the md5-derived
# bloom filter q86's prefilter relies on (m bits, k=3 positions per
# key) over the "existing corpus" fingerprints, probe it with the
# truly-novel fingerprints, and compare the REALIZED false-positive
# rate against the textbook (1 - e^(-kn/m))^k — the q185/q152
# estimate-vs-truth audit family applied to the filter that gates
# incremental dedup. The whole filter (set-bit census), both rates,
# and the sizing verdict hash-verify.
# ---------------------------------------------------------------------------
_BLOOM_M = 4096

_BLOOM_K = 3

# ---------------------------------------------------------------------------
# q279 — V-optimal histogram of the daily event series (B=4 bins):
# the bin layout minimizing total within-bin variance — what q184's
# equi-depth rule ignores (equi-depth balances mass, V-optimal
# balances ERROR, the difference every query optimizer's selectivity
# estimate inherits). Segment cost is the exact integer
# SS*len... - floor((S^2)/len) form, so the argmin is a pure integer
# comparison; both engines search the identical (j1<j2<j3) cut space
# with the identical (cost, cuts) lexicographic tie-break. The day
# axis is bounded (a daily rollup), so exhaustive search is the
# honest plan; a DP drops in at B or N beyond dashboard scale.
# ---------------------------------------------------------------------------
_VOPT_B = 4
