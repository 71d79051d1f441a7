"""Statistics family: hypothesis tests, robust estimators, distribution fits and drift measures.

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
from frontmatter_mcp_spark.operators.holds import hold
from frontmatter_mcp_spark.workload.registry import pin, register
from frontmatter_mcp_spark.workload.dp_shared import (
    _LEN_P_HIGH,
    _LEN_P_LOW,
    _MIN_TOKENS,
    _MKV_SCALE,
    _PII_PATTERNS,
    _PI_DIM,
    _PI_ITERS,
    _fx_mean,
    _power_iteration_ctes,
)


@register(
    "q85_length_outliers",
    f"""
    WITH stats AS (
      SELECT source,
             quantile_cont(n_chars, {_LEN_P_LOW!r}) AS p_low,
             quantile_cont(n_chars, {_LEN_P_HIGH!r}) AS p_high
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars, s.p_low, s.p_high,
           CASE WHEN d.n_chars < s.p_low THEN 'too_short' ELSE 'too_long' END AS reason
    FROM documents d JOIN stats s ON d.source = s.source
    WHERE d.n_chars < s.p_low OR d.n_chars > s.p_high
    """,
    doc="pretraining length filter: per-source percentile fences (exact "
    "interpolated, cross-engine bit-identical at binary fractions) flag "
    "docs outside [p(1/32), p(31/32)] — stats aggregate once, broadcast "
    "back, narrow filter (no second shuffle of the corpus)",
)
def q85_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(_LEN_P_LOW)).alias("p_low"),
        F.percentile("n_chars", F.lit(_LEN_P_HIGH)).alias("p_high"),
    )
    return (
        d.join(F.broadcast(stats), "source")
        .filter((F.col("n_chars") < F.col("p_low")) | (F.col("n_chars") > F.col("p_high")))
        .select(
            "doc_id",
            "source",
            "n_chars",
            "p_low",
            "p_high",
            F.when(F.col("n_chars") < F.col("p_low"), F.lit("too_short"))
            .otherwise(F.lit("too_long"))
            .alias("reason"),
        )
    )

# ---------------------------------------------------------------------------
# q151 — chi-square independence test of corpus composition (lang x
# source): the statistical QA check that a multi-source corpus's
# language mix is (or is not) uniform across sources — expected cell
# counts, the chi2 statistic, and Cramer's V effect size
# ---------------------------------------------------------------------------
@register(
    "q151_composition_chi2",
    """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    rows_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
            FROM cells),
    terms AS (
      SELECT CAST(FLOOR(
               (CAST(cells.o AS DOUBLE)
                - CAST(rows_.r AS DOUBLE) * cols_.c / tot.t)
               * (CAST(cells.o AS DOUBLE)
                - CAST(rows_.r AS DOUBLE) * cols_.c / tot.t)
               / (CAST(rows_.r AS DOUBLE) * cols_.c / tot.t)
               * 1073741824e0) AS BIGINT) AS term_fx
      FROM cells JOIN rows_ USING (lang) JOIN cols_ USING (source)
      CROSS JOIN tot
    )
    SELECT round(CAST(SUM(term_fx) AS DOUBLE) / 1073741824e0, 4) AS chi2,
           CAST((tot.nl - 1) * (tot.ns - 1) AS INT) AS dof,
           round(sqrt(CAST(SUM(term_fx) AS DOUBLE) / 1073741824e0
                 / (tot.t * LEAST(tot.nl - 1, tot.ns - 1))), 6) AS cramers_v
    FROM terms CROSS JOIN tot
    GROUP BY tot.nl, tot.ns, tot.t
    """,
    doc="chi-square independence test of (lang x source) composition "
    "with Cramer's V effect size — the statistical QA check for a "
    "multi-source corpus's language balance. Cell/marginal tables are "
    "tiny aggregates of ONE corpus scan; per-cell terms floor into "
    "2^30 fixed point so the statistic sums exactly in any order",
)
def q151_composition_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # r10 ADR-0007 tail sweep: the contingency cells feed the row/col
    # marginals, the grand total and the term join — four cold branches
    # of one action; eager hold probed -37% (0.59->0.37 min-of-3)
    cells = hold(
        d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("o"))
    )
    rows_ = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    cols_ = cells.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("t"),
        F.countDistinct("lang").cast("long").alias("nl"),
        F.countDistinct("source").cast("long").alias("ns"),
    )
    terms = (
        cells.join(F.broadcast(rows_), "lang")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "nl", "ns", "t",
            "CAST(FLOOR((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / t)"
            " * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / t)"
            " / (CAST(r AS DOUBLE) * c / t) * 1073741824e0) AS BIGINT)"
            " AS term_fx",
        )
    )
    return terms.groupBy("nl", "ns", "t").agg(
        F.expr("round(CAST(SUM(term_fx) AS DOUBLE) / 1073741824e0, 4)").alias("chi2"),
        F.expr("CAST((nl - 1) * (ns - 1) AS INT)").alias("dof"),
        F.expr(
            "round(sqrt(CAST(SUM(term_fx) AS DOUBLE) / 1073741824e0"
            " / (t * LEAST(nl - 1, ns - 1))), 6)"
        ).alias("cramers_v"),
    ).select("chi2", "dof", "cramers_v")

# ---------------------------------------------------------------------------
# q155 — robust anomaly detection via MAD (median absolute deviation):
# the outlier-resistant counterpart of q89's trailing z-score — a mean/
# stddev monitor is dragged by the very spikes it should flag; median
# and MAD are not. Exact medians (Spark percentile == DuckDB
# quantile_cont at binary fractions, the q24 identity).
# ---------------------------------------------------------------------------
@register(
    "q155_mad_anomalies",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(CAST(n AS DOUBLE), 0.5) AS m
      FROM daily GROUP BY 1
    ),
    mad AS (
      SELECT daily.event_type,
             quantile_cont(ABS(CAST(n AS DOUBLE) - m), 0.5) AS md
      FROM daily JOIN med USING (event_type) GROUP BY 1
    ),
    scored AS (
      SELECT daily.event_type, n, m, md,
             CASE WHEN md > 0e0
                  THEN ABS(CAST(n AS DOUBLE) - m) / (1.4826e0 * md)
                  ELSE NULL END AS rz
      FROM daily JOIN med USING (event_type) JOIN mad USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           round(m, 6) AS median_daily,
           round(md, 6) AS mad,
           CAST(SUM(CASE WHEN rz > 3e0 THEN 1 ELSE 0 END) AS INT) AS n_anomalies,
           round(MAX(rz), 6) AS max_robust_z
    FROM scored GROUP BY event_type, m, md
    """,
    doc="robust anomaly detection on daily event counts: median + MAD "
    "per event type (exact interpolated medians — Spark percentile == "
    "DuckDB quantile_cont at binary fractions), days flagged when the "
    "MAD-normalized robust z (1.4826 consistency constant) exceeds 3. "
    "Unlike the q89 mean/stddev monitor, the baseline is not dragged by "
    "the spikes it measures. Two bounded-key aggregates + broadcast "
    "joins back to the tiny daily table",
)
def q155_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # r10 ADR-0007 tail sweep: daily feeds the median branch, the MAD
    # branch and the scored output — four cold consumers in one action;
    # eager hold probed -42% (0.73->0.42 min-of-3)
    daily = hold(
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count("*").cast("long").alias("n"))
    )
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("n").cast("double"), 0.5).alias("m")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(
                F.abs(F.col("n").cast("double") - F.col("m")), 0.5
            ).alias("md")
        )
    )
    scored = (
        daily.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .withColumn(
            "rz",
            F.expr(
                "CASE WHEN md > 0e0 THEN ABS(CAST(n AS DOUBLE) - m)"
                " / (1.4826e0 * md) ELSE NULL END"
            ),
        )
    )
    return scored.groupBy("event_type", "m", "md").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum((F.col("rz") > 3.0).cast("int")).cast("int").alias("n_anomalies"),
        F.round(F.max("rz"), 6).alias("max_robust_z"),
    ).select(
        "event_type",
        "n_days",
        F.round("m", 6).alias("median_daily"),
        F.round("md", 6).alias("mad"),
        F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        "max_robust_z",
    )

# ---------------------------------------------------------------------------
# q162 — empirical-Bayes shrinkage of per-source quality rates: a
# small source's observed pass-rate is noisy; shrinking it toward the
# corpus rate with a beta-binomial method-of-moments prior is the
# standard fix before ranking/gating sources on quality (the James-
# Stein lesson applied to curation dashboards). Rates are quantized to
# 2^30 fixed point BEFORE the cross-source moments, so every aggregate
# is an exact integer and the prior strength derives from identical
# double text.
# ---------------------------------------------------------------------------
_EB_FX = 1 << 30

def _eb_sql() -> str:
    from frontmatter_mcp_spark.workload.dp_shared import _MIN_TOKENS, _PII_PATTERNS

    pii = (
        f"len(regexp_extract_all(text, '{_PII_PATTERNS['n_emails']}')) * 5"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_long_digit_runs']}')) * 3"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_phones']}')) * 4"
    )
    return f"""
    WITH d AS (
      SELECT source,
             CASE WHEN ({pii}) = 0
                  AND len(list_filter(string_split_regex(trim(text), '\\s+'),
                      t -> t <> '')) >= {_MIN_TOKENS}
                  THEN 1 ELSE 0 END AS keep
      FROM documents
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(keep) AS BIGINT) AS k
      FROM d GROUP BY 1
    ),
    fx AS (
      SELECT source, n, k, (k * {_EB_FX}) // n AS rfx FROM s
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS h,
             CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(k) AS BIGINT) AS tk,
             CAST(SUM(rfx) AS BIGINT) AS sr,
             CAST(SUM(rfx * rfx // {_EB_FX}) AS BIGINT) AS sr2
      FROM fx
    ),
    prior AS (
      SELECT h, tn, tk,
             CAST(tk AS DOUBLE) / tn AS m,
             (CAST(sr2 AS DOUBLE) / h - (CAST(sr AS DOUBLE) / h)
              * (CAST(sr AS DOUBLE) / h) / {_EB_FX}) / {_EB_FX} AS v
      FROM mom
    ),
    strength AS (
      SELECT m,
             CASE WHEN v > 0e0 AND m * (1e0 - m) / v - 1e0 > 1e0
                  THEN m * (1e0 - m) / v - 1e0 ELSE 1e0 END AS big_m
      FROM prior
    )
    SELECT fx.source, fx.n, fx.k,
           round(CAST(fx.k AS DOUBLE) / fx.n, 6) AS raw_rate,
           round((fx.k + st.big_m * st.m) / (fx.n + st.big_m), 6)
             AS shrunk_rate,
           round(st.big_m, 6) AS prior_strength
    FROM fx CROSS JOIN strength st
    """


@register(
    "q162_eb_shrinkage",
    _eb_sql(),
    doc="empirical-Bayes shrinkage of per-source quality pass-rates "
    "(beta-binomial method-of-moments prior): small sources pull "
    "strongly toward the corpus rate, large sources barely move — the "
    "James-Stein correction a curation dashboard needs before ranking "
    "sources on noisy rates. Rates quantize to 2^30 fixed point before "
    "the cross-source moments (exact integer aggregates, no float "
    "accumulation order); the prior derives from identical double "
    "text. One corpus scan; everything else on the |sources| table",
)
def q162_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.workload.dp_shared import _MIN_TOKENS, _PII_PATTERNS

    t = F.col("text")
    risk = (
        F.regexp_count(t, F.lit(_PII_PATTERNS["n_emails"])) * 5
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_long_digit_runs"])) * 3
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_phones"])) * 4
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(t), r"\s+", -1), lambda x: x != F.lit(""))
    )
    keep = ((risk == 0) & (n_tokens >= _MIN_TOKENS)).cast("int")
    d = load_table(spark, sf_dir, "documents").select("source", keep.alias("keep"))
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"), F.sum("keep").cast("long").alias("k")
    )
    fx = pin(s.selectExpr("source", "n", "k", f"(k * {_EB_FX}) div n AS rfx"))
    mom = fx.agg(
        F.count("*").cast("long").alias("h"),
        F.sum("n").cast("long").alias("tn"),
        F.sum("k").cast("long").alias("tk"),
        F.sum("rfx").cast("long").alias("sr"),
        F.sum(F.expr(f"rfx * rfx div {_EB_FX}")).cast("long").alias("sr2"),
    )
    prior = mom.selectExpr(
        "h", "tn", "tk",
        "CAST(tk AS DOUBLE) / tn AS m",
        f"(CAST(sr2 AS DOUBLE) / h - (CAST(sr AS DOUBLE) / h)"
        f" * (CAST(sr AS DOUBLE) / h) / {_EB_FX}) / {_EB_FX} AS v",
    )
    strength = prior.selectExpr(
        "m",
        "CASE WHEN v > 0e0 AND m * (1e0 - m) / v - 1e0 > 1e0"
        " THEN m * (1e0 - m) / v - 1e0 ELSE 1e0 END AS big_m",
    )
    return fx.crossJoin(F.broadcast(strength)).selectExpr(
        "source", "n", "k",
        "round(CAST(k AS DOUBLE) / n, 6) AS raw_rate",
        "round((k + big_m * m) / (n + big_m), 6) AS shrunk_rate",
        "round(big_m, 6) AS prior_strength",
    )

# ---------------------------------------------------------------------------
# q173 — key-skew profiler: the diagnostic that DECIDES when q78's
# salted aggregation is worth its second shuffle — per event type, how
# concentrated is the per-user key distribution (top shares + Gini)
# ---------------------------------------------------------------------------
@register(
    "q173_skew_profile",
    """
    WITH uc AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, user_id, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt, user_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, user_id DESC) AS rd
      FROM uc
    ),
    prof AS (
      SELECT event_type,
             CAST(SUM(cnt) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(ra * cnt) AS BIGINT) AS weighted,
             CAST(SUM(CASE WHEN rd = 1 THEN cnt ELSE 0 END) AS BIGINT) AS top1,
             CAST(SUM(CASE WHEN rd <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS top10
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n_events, n_users,
           ROUND(CAST(top1 AS DOUBLE) / n_events, 6) AS top1_share,
           ROUND(CAST(top10 AS DOUBLE) / n_events, 6) AS top10_share,
           ROUND(2e0 * weighted / (CAST(n_users AS DOUBLE) * n_events)
                 - (n_users + 1e0) / n_users, 6) AS gini,
           CAST(top1 * n_users > 4 * n_events AS INT) AS skewed
    FROM prof ORDER BY event_type
    """,
    doc="key-skew profiler over the (event_type, user) key distribution: "
    "exact top-1/top-10 load shares and the Gini coefficient from the "
    "grouped-data formula 2*sum(rank*count)/(n*total) - (n+1)/n — rank "
    "and the weighted sum are exact BIGINTs under a total order (count, "
    "then key), so the statistic hash-matches cross-engine. `skewed` "
    "fires when the hottest key carries > 4x its uniform share — the "
    "trigger for q78's salting. One key aggregate, one per-type window "
    "pass (ascending and descending ranks share the exchange), "
    "type-sized output",
)
def q173_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("event_type", "user_id").agg(
        F.count("*").cast("long").alias("cnt")
    )
    wa = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    wd = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").desc()
    )
    ranked = uc.select(
        "event_type",
        "cnt",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    prof = ranked.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_users"),
        F.sum(F.col("ra") * F.col("cnt")).cast("long").alias("weighted"),
        F.sum(F.when(F.col("rd") == 1, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top1"),
        F.sum(F.when(F.col("rd") <= 10, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("top10"),
    )
    return prof.select(
        "event_type",
        "n_events",
        "n_users",
        F.round(F.col("top1").cast("double") / F.col("n_events"), 6).alias(
            "top1_share"
        ),
        F.round(F.col("top10").cast("double") / F.col("n_events"), 6).alias(
            "top10_share"
        ),
        F.round(
            2.0 * F.col("weighted") / (F.col("n_users").cast("double") * F.col("n_events"))
            - (F.col("n_users") + 1.0) / F.col("n_users"),
            6,
        ).alias("gini"),
        (F.col("top1") * F.col("n_users") > 4 * F.col("n_events"))
        .cast("int")
        .alias("skewed"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q181 — "all-but-the-top" embedding correction (Mu & Viswanath 2018),
# the APPLY stage for q180's audit: subtract the mean, project out the
# top principal direction of the centered cloud, and re-audit — the
# before/after table that justifies shipping the correction
# ---------------------------------------------------------------------------
def _abtt_sql(dim: int = _PI_DIM, iters: int = _PI_ITERS) -> str:
    def dot(vtab: str) -> str:
        return f"list_sum([x.x[j] * {vtab}.v[j] FOR j IN generate_series(1, {dim})])"

    ctes = _power_iteration_ctes(dim, iters)  # x, v{iters}: raw space
    ctes += [
        f"""cmu AS (
      SELECT list(mv ORDER BY pos) AS mu FROM (
        SELECT i AS pos, {_fx_mean('x.x[i]')} AS mv
        FROM x, UNNEST(generate_series(1, {dim})) AS t(i)
        GROUP BY i
      )
    )""",
        f"""x2 AS (
      SELECT x.vec_id, [x.x[i] - cmu.mu[i] FOR i IN generate_series(1, {dim})] AS x
      FROM x, cmu
    )""",
    ]
    ctes += _power_iteration_ctes(dim, iters, src="x2", prefix="c")
    ctes += [
        f"""proj AS (
      SELECT x.vec_id, x.x AS xv, {dot('vv')} AS d
      FROM x2 x, cv{iters} vv
    )""",
        f"""x3 AS (
      SELECT q.vec_id,
             [q.xv[i] - vv.v[i] * q.d FOR i IN generate_series(1, {dim})] AS x
      FROM proj q, cv{iters} vv
    )""",
    ]
    ctes += _power_iteration_ctes(dim, iters, src="x3", prefix="d")
    stages = [("raw", "x", f"v{iters}"), ("centered", "x2", f"cv{iters}"),
              ("corrected", "x3", f"dv{iters}")]
    rows = []
    for name, xs, vt in stages:
        ctes.append(
            f"""agg_{name} AS (
      SELECT CAST(SUM(CAST(x.x[i] * x.x[i] AS DECIMAL(28,12))) AS DOUBLE) AS trace
      FROM {xs} x, UNNEST(generate_series(1, {dim})) AS t(i)
    )"""
        )
        ctes.append(
            f"""ray_{name} AS (
      SELECT CAST(SUM(CAST(d * d AS DECIMAL(28,12))) AS DOUBLE) AS lam
      FROM (SELECT {dot('vv')} AS d FROM {xs} x, {vt} vv)
    )"""
        )
        ctes.append(
            f"""cn_{name} AS (
      SELECT sqrt(list_sum(list(mv * mv ORDER BY pos))) AS cn FROM (
        SELECT i AS pos, {_fx_mean('x.x[i]')} AS mv
        FROM {xs} x, UNNEST(generate_series(1, {dim})) AS t(i)
        GROUP BY i
      )
    )"""
        )
        rows.append(
            f"""SELECT '{name}' AS stage, ROUND(a.trace, 4) AS trace,
             ROUND(r.lam, 4) AS lambda1,
             ROUND(r.lam / a.trace, 6) AS top_dir_share,
             ROUND(c.cn, 6) AS centroid_norm
      FROM agg_{name} a, ray_{name} r, cn_{name} c"""
        )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(rows)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY stage
    """


@register(
    "q181_all_but_the_top",
    _abtt_sql(),
    doc="all-but-the-top correction applied and re-audited: the raw "
    "space, the mean-centered space, and the space with the centered "
    "cloud's top principal direction projected out, each reporting "
    "trace / lambda1 / top-direction share / centroid norm — the "
    "before/after evidence for the standard embedding postprocessing "
    "(Mu & Viswanath 2018). Three q77-style power-iteration chains "
    "(raw, centered, corrected — namespaced CTE prefixes), each "
    "bit-deterministic via decimal-exact row sums; the corrected "
    "vectors are a narrow projection (mean and direction are "
    "driver-literal 64-vectors on the Spark side, recomputed CTEs on "
    "the oracle side). Everything is aggregate passes — no pairwise "
    "work at any stage",
)
def q181_all_but_the_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from frontmatter_mcp_spark.functions.vector import fixed_point_mean
    from frontmatter_mcp_spark.operators.clustering import power_iteration

    e = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    xs = pin(e.select("vec_id", x.alias("x")))

    def means(df, col):
        rows = (
            df.select(F.posexplode(col).alias("pos", "xi"))
            .groupBy("pos")
            .agg(fixed_point_mean(F.col("xi")).alias("mv"))
            .orderBy("pos")
            .collect()
        )
        return [r.mv for r in rows]

    v_raw = power_iteration(xs, iters=_PI_ITERS, vec_col="x")
    mu = means(xs, "x")
    x2 = pin(
        xs.select(
            "vec_id", F.zip_with("x", vector.array_lit(mu), lambda a, b: a - b).alias("x")
        )
    )
    v_cent = power_iteration(x2, iters=_PI_ITERS, vec_col="x")
    dot_c = F.aggregate(
        F.zip_with("x", vector.array_lit(v_cent), lambda a, b: a * b),
        F.lit(0.0),
        lambda s, t: s + t,
    )
    x3 = pin(
        x2.select(
            "vec_id",
            F.zip_with(
                "x", vector.array_lit(v_cent), lambda a, b: a - b * dot_c
            ).alias("x"),
        )
    )
    v_corr = power_iteration(x3, iters=_PI_ITERS, vec_col="x")

    def stage_row(name, df, v):
        dot = F.aggregate(
            F.zip_with("x", vector.array_lit(v), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, t: s + t,
        )
        tr = df.select(F.explode("x").alias("xi")).agg(
            F.sum((F.col("xi") * F.col("xi")).cast("decimal(28,12)"))
            .cast("double")
            .alias("trace")
        )
        ray = df.select(dot.alias("d")).agg(
            F.sum((F.col("d") * F.col("d")).cast("decimal(28,12)"))
            .cast("double")
            .alias("lam")
        )
        cn = math.sqrt(sum(m * m for m in means(df, "x")))
        return tr.crossJoin(F.broadcast(ray)).select(
            F.lit(name).alias("stage"),
            F.round("trace", 4).alias("trace"),
            F.round("lam", 4).alias("lambda1"),
            F.round(F.col("lam") / F.col("trace"), 6).alias("top_dir_share"),
            F.round(F.lit(cn), 6).alias("centroid_norm"),
        )

    out = (
        stage_row("raw", xs, v_raw)
        .unionAll(stage_row("centered", x2, v_cent))
        .unionAll(stage_row("corrected", x3, v_corr))
    )
    return out.orderBy("stage")

# ---------------------------------------------------------------------------
# q203 — pairwise two-sample Kolmogorov-Smirnov tests between sources
# over the document-length distribution: the distribution-shift test
# that needs no binning choice (unlike q179's PSI buckets). The D
# statistic is computed as an exact INTEGER — max |c_a*n_b - c_b*n_a|
# over the shared value axis — so the test hash-verifies cross-engine;
# only the final normalization and the critical value touch doubles
# ---------------------------------------------------------------------------
@register(
    "q203_ks_source_shift",
    """
    WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    src AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM src GROUP BY 1),
    axis AS (
      SELECT t.source, t.n, a.v,
             CAST(COALESCE(SUM(s.c), 0) AS BIGINT) AS cv
      FROM tot t CROSS JOIN vals a
      LEFT JOIN src s ON s.source = t.source AND s.n_chars = a.v
      GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT source, n, v,
             CAST(SUM(cv) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cdf_c
      FROM axis
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.n AS n_a, b.n AS n_b,
             CAST(MAX(ABS(a.cdf_c * b.n - b.cdf_c * a.n)) AS BIGINT)
               AS d_scaled
      FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
      GROUP BY 1, 2, 3, 4
    )
    SELECT source_a, source_b, n_a, n_b, d_scaled,
           ROUND(CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6)
             AS d_stat,
           ROUND(1.358e0 * sqrt((CAST(n_a AS DOUBLE) + n_b)
                                / (CAST(n_a AS DOUBLE) * n_b)), 6) AS crit_05,
           CAST(CAST(d_scaled AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)
                > 1.358e0 * sqrt((CAST(n_a AS DOUBLE) + n_b)
                                 / (CAST(n_a AS DOUBLE) * n_b)) AS INT)
             AS reject_05
    FROM pairs ORDER BY source_a, source_b
    """,
    doc="two-sample KS test for every source pair over n_chars: per-"
    "source cumulative counts on the shared distinct-value axis (the "
    "domain is bounded — document lengths, not documents), then "
    "D = max|c_a*n_b - c_b*n_a| as an exact BIGINT cross-multiplication "
    "(no per-step division, so the max is hash-exact); d_stat, the "
    "alpha=0.05 critical value (1.358*sqrt((n_a+n_b)/(n_a*n_b)), IEEE "
    "sqrt), and the reject flag follow in one deterministic double "
    "chain. Corpus pays one (source, length) aggregate; the axis "
    "cross join, cumsums, and the pair join all run on the bounded "
    "value domain",
)
def q203_ks_source_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    vals = d.select(F.col("n_chars").alias("v")).distinct()
    src = d.groupBy("source", "n_chars").agg(F.count("*").cast("long").alias("c"))
    tot = src.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    # src is unique on (source, n_chars): the left join yields at most
    # one match per (source, v) — no re-aggregation needed
    axis = (
        tot.select(F.col("source").alias("s"), "n")
        .crossJoin(vals)
        .join(
            src.select(
                F.col("source").alias("s2"),
                F.col("n_chars").alias("v2"),
                "c",
            ),
            (F.col("s") == F.col("s2")) & (F.col("v") == F.col("v2")),
            "left",
        )
        .select(
            F.col("s").alias("source"),
            "n",
            "v",
            F.coalesce("c", F.lit(0)).cast("long").alias("cv"),
        )
    )
    cum = axis.select(
        "source",
        "n",
        "v",
        F.sum("cv")
        .over(W.partitionBy("source").orderBy("v").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cdf_c"),
    )
    a = cum.select(
        F.col("source").alias("source_a"),
        F.col("n").alias("n_a"),
        "v",
        F.col("cdf_c").alias("ca"),
    )
    b = cum.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("n_b"),
        "v",
        F.col("cdf_c").alias("cb"),
    )
    pairs = (
        a.join(b, "v")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            F.max(F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
            .cast("long")
            .alias("d_scaled")
        )
    )
    na_d = F.col("n_a").cast("double")
    d_stat = F.col("d_scaled").cast("double") / (na_d * F.col("n_b"))
    crit = 1.358 * F.sqrt((na_d + F.col("n_b")) / (na_d * F.col("n_b")))
    return pairs.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "d_scaled",
        F.round(d_stat, 6).alias("d_stat"),
        F.round(crit, 6).alias("crit_05"),
        (d_stat > crit).cast("int").alias("reject_05"),
    ).orderBy("source_a", "source_b")

# ---------------------------------------------------------------------------
# q209 — Kaplan-Meier survival curve for time-to-first-purchase: the
# censoring-aware "how long until users convert" curve naive
# conversion rates get wrong (users who simply haven't converted YET
# are censored at the horizon, not counted as failures). The product
# fold runs strictly in day order — exact integer risk sets and event
# counts, one divide+multiply per step, identical on both engines
# ---------------------------------------------------------------------------
@register(
    "q209_km_survival",
    """
    WITH RECURSIVE users AS (
      SELECT user_id, MIN(ts) AS entry FROM events GROUP BY 1
    ),
    purch AS (
      SELECT user_id, MIN(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    horizon AS (SELECT MAX(ts) AS mx FROM events),
    dur AS (
      SELECT u.user_id,
             CASE WHEN p.pts IS NOT NULL
                  THEN date_diff('day', CAST(u.entry AS DATE), CAST(p.pts AS DATE))
                  ELSE date_diff('day', CAST(u.entry AS DATE), CAST(mx AS DATE))
             END AS t,
             CASE WHEN p.pts IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM users u LEFT JOIN purch p USING (user_id) CROSS JOIN horizon
    ),
    daylev AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM dur GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(c) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
      FROM daylev
    ),
    series AS (
      SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS xs
      FROM risk WHERE d > 0
    ),
    km AS (
      SELECT xs, 0 AS i, 1e0 AS s FROM series
      UNION ALL
      SELECT xs, i + 1,
             s * (1e0 - CAST(xs[i+1].d AS DOUBLE) / xs[i+1].n)
      FROM km WHERE i < len(xs)
    )
    SELECT CAST(xs[i].t AS INT) AS t_days,
           xs[i].n AS n_risk, xs[i].d AS d_events,
           ROUND(s, 6) AS s_hat
    FROM km WHERE i >= 1
    ORDER BY t_days
    """,
    doc="Kaplan-Meier estimator over the event log: per user, entry = "
    "first event, failure = first purchase, censored at the corpus "
    "horizon; risk sets are reverse-cumulative integer counts, and "
    "S(t) multiplies (1 - d/n) strictly in day order (a sequential "
    "fold — exp(sum(log)) would trade exactness for parallelism and "
    "drag libm in). Only failure days enter the product (censoring "
    "days contribute factor 1, the textbook rule). Corpus work is two "
    "user-keyed aggregates; the fold runs over the bounded day axis. "
    "The oracle replays the product as a recursive CTE (q176 "
    "discipline); Spark folds with F.aggregate, emitting the whole "
    "curve from one accumulator array",
)
def q209_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(F.min("ts").alias("entry"))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    horizon = e.agg(F.max("ts").alias("mx"))
    dur = (
        users.join(purch, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("pts").isNotNull(),
                F.datediff(F.to_date("pts"), F.to_date("entry")),
            )
            .otherwise(F.datediff(F.to_date("mx"), F.to_date("entry")))
            .alias("t"),
            F.when(F.col("pts").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    daylev = dur.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"), F.count("*").cast("long").alias("c")
    )
    risk = daylev.select(
        "t",
        "d",
        F.sum("c")
        .over(W.orderBy("t").rowsBetween(0, W.unboundedFollowing))
        .cast("long")
        .alias("n"),
    ).filter(F.col("d") > 0)
    series = risk.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n"))).alias("xs")
    )
    out_type = "array<struct<t:int,d:bigint,n:bigint,s:double>>"
    init = F.struct(
        F.lit(1.0).alias("s"),
        F.lit(None).cast(out_type).alias("out"),
    )

    def step(a, x):
        s_new = a["s"] * (1.0 - x["d"].cast("double") / x["n"])
        row = F.struct(
            x["t"].cast("int").alias("t"),
            x["d"].alias("d"),
            x["n"].alias("n"),
            s_new.alias("s"),
        )
        return F.struct(
            s_new.alias("s"),
            F.when(a["out"].isNull(), F.array(row))
            .otherwise(F.concat(a["out"], F.array(row)))
            .alias("out"),
        )

    folded = series.select(F.aggregate("xs", init, step).alias("r"))
    curve = folded.select(F.explode(F.col("r")["out"]).alias("p"))
    return curve.select(
        F.col("p")["t"].alias("t_days"),
        F.col("p")["n"].alias("n_risk"),
        F.col("p")["d"].alias("d_events"),
        F.round(F.col("p")["s"], 6).alias("s_hat"),
    ).orderBy("t_days")

# ---------------------------------------------------------------------------
# q217 — Benford first-digit audit of order totals: the classic
# anomaly/fraud screen for transaction amounts. Expected proportions
# log10(1+1/d) ship as PRE-COMPUTED literals (no libm call in either
# engine), observed counts are exact integers, and the chi-square
# statistic is one deterministic double chain
# ---------------------------------------------------------------------------
_BENFORD_P = [
    0.301029995664, 0.176091259056, 0.124938736608, 0.096910013008,
    0.079181246048, 0.066946789631, 0.057991946978, 0.051152522447,
    0.045757490561,
]

def _benford_sql() -> str:
    expected = " UNION ALL ".join(
        f"SELECT {d} AS digit, {p!r} AS p_expected"
        for d, p in enumerate(_BENFORD_P, start=1)
    )
    return f"""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM obs),
    exp AS ({expected})
    SELECT e.digit, COALESCE(o.n, CAST(0 AS BIGINT)) AS n_observed,
           ROUND(CAST(COALESCE(o.n, 0) AS DOUBLE) / t.nt, 6) AS p_observed,
           ROUND(e.p_expected, 6) AS p_expected,
           ROUND((CAST(COALESCE(o.n, 0) AS DOUBLE) - t.nt * e.p_expected)
                 * (CAST(COALESCE(o.n, 0) AS DOUBLE) - t.nt * e.p_expected)
                 / (t.nt * e.p_expected), 6) AS chi2_term
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot t
    ORDER BY e.digit
    """


@register(
    "q217_benford_audit",
    _benford_sql(),
    doc="Benford's-law conformance of o_totalprice first digits: the "
    "transaction-amount fraud screen. The nine expected proportions "
    "log10(1+1/d) are pre-computed 12-decimal literals (identical "
    "bytes in both plans — the only way to keep log10 out of the "
    "determinism surface), the first digit comes from integer floor + "
    "string head (no float log to bucket with), and each digit row "
    "carries its chi-square contribution. One scan, map-side-combined "
    "9-bucket counts, 9 rows out — the full-statistic sum is one more "
    "trivial aggregate a caller adds",
)
def q217_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    obs = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = obs.agg(F.sum("n").cast("long").alias("nt"))
    exp = spark.createDataFrame(
        [(d, p) for d, p in enumerate(_BENFORD_P, start=1)],
        "digit int, p_expected double",
    )
    j = (
        exp.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0).cast("long")).alias("n_observed"),
            "p_expected",
            "nt",
        )
    )
    dev = F.col("n_observed").cast("double") - F.col("nt") * F.col("p_expected")
    return j.select(
        "digit",
        "n_observed",
        F.round(F.col("n_observed").cast("double") / F.col("nt"), 6).alias(
            "p_observed"
        ),
        F.round("p_expected", 6).alias("p_expected"),
        F.round(dev * dev / (F.col("nt") * F.col("p_expected")), 6).alias(
            "chi2_term"
        ),
    ).orderBy("digit")

# ---------------------------------------------------------------------------
# q231 — Hill tail-index estimator: how heavy is each source's
# document-length tail (alpha ~ 1/H) — the diagnostic that says
# whether truncation budgets and packing bins (q211) face a power law
# or an exponential tail. Order statistics under a total order; log
# ratios quantized to DECIMAL for exact summation (the q196 ln class)
# ---------------------------------------------------------------------------
_HILL_K = 100


@register(
    "q231_hill_tail_index",
    f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM documents
    ),
    kth AS (
      SELECT source, n, CAST(n_chars AS DOUBLE) AS xk
      FROM ranked WHERE rn = {_HILL_K} + 1
    ),
    terms AS (
      SELECT r.source, r.n,
             CAST(ln(CAST(r.n_chars AS DOUBLE)) - ln(k.xk)
                  AS DECIMAL(28,12)) AS t
      FROM ranked r JOIN kth k ON k.source = r.source
      WHERE r.rn <= {_HILL_K}
    )
    SELECT source, MAX(n) AS n_docs,
           CAST(COUNT(*) AS INT) AS k,
           ROUND(CAST(SUM(t) AS DOUBLE) / COUNT(*), 6) AS hill_h,
           ROUND(COUNT(*) / CAST(SUM(t) AS DOUBLE), 6) AS tail_alpha,
           CAST(COUNT(*) / CAST(SUM(t) AS DOUBLE) < 2e0 AS INT)
             AS infinite_variance
    FROM terms GROUP BY source, n ORDER BY source
    """,
    doc=f"Hill estimator over the top-{_HILL_K} order statistics of "
    "n_chars per source: H = mean(ln(x_(i)/x_(k+1))), tail index "
    "alpha = 1/H, and the alpha<2 infinite-variance flag (when true, "
    "mean-based capacity planning on this source is meaningless and "
    "q85/q190's percentile fences are the only honest gates). Log "
    "ratios quantize to DECIMAL(28,12) before the exact sum. One "
    "per-source rank window; the estimator touches k+1 rows per "
    "source regardless of corpus size",
)
def q231_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("source")).cast("long").alias("n"),
    )
    kth = ranked.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("source").alias("s2"), F.col("n_chars").cast("double").alias("xk")
    )
    terms = (
        ranked.filter(F.col("rn") <= _HILL_K)
        .join(F.broadcast(kth), F.col("source") == F.col("s2"))
        .select(
            "source",
            "n",
            (
                F.log(F.col("n_chars").cast("double")) - F.log(F.col("xk"))
            )
            .cast("decimal(28,12)")
            .alias("t"),
        )
    )
    return (
        terms.groupBy("source", "n")
        .agg(
            F.count("*").cast("int").alias("k"),
            F.sum("t").cast("double").alias("st"),
        )
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "k",
            F.round(F.col("st") / F.col("k"), 6).alias("hill_h"),
            F.round(F.col("k") / F.col("st"), 6).alias("tail_alpha"),
            (F.col("k") / F.col("st") < 2.0).cast("int").alias("infinite_variance"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q232 — quantile normalization across sources: each document's length
# mapped onto the GLOBAL length distribution at its within-source rank
# (the batch-effect removal microarray pipelines standardized, applied
# to corpus features) — after it, every source has the same marginal
# distribution, so downstream per-length gates can't favor a source.
# Pure integer rank arithmetic: rank, ceil-map, order-statistic join
# ---------------------------------------------------------------------------
@register(
    "q232_quantile_normalize",
    """
    WITH s AS (
      SELECT doc_id, source, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS rs,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
      FROM documents
    ),
    g AS (
      SELECT n_chars AS gval,
             CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rg,
             CAST(COUNT(*) OVER () AS BIGINT) AS ng
      FROM documents
    )
    SELECT s.doc_id, s.source, s.n_chars,
           CAST(s.rs AS BIGINT) AS rank_in_source,
           g.gval AS norm_chars
    FROM s JOIN g ON g.rg = (s.rs * (SELECT MAX(ng) FROM g) + s.ns - 1) // s.ns
    """,
    doc="quantile normalization of n_chars across sources: within-"
    "source rank rs of ns maps to the global order statistic at "
    "ceil(rs*N/ns) — exact integer arithmetic end to end, no "
    "interpolation, deterministic under the (value, doc_id) total "
    "orders. The normalized column preserves each source's internal "
    "ordering while forcing identical marginals — the fairness "
    "precondition for any cross-source length gate. Two rank windows "
    "+ one equi-join on the computed rank; at 100 TB both ranks come "
    "from the q83 two-phase machinery and the join stays a rank-key "
    "shuffle",
)
def q232_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("rs"),
        F.count("*").over(W.partitionBy("source")).cast("long").alias("ns"),
    )
    # The global order statistic was a corpus-wide single-partition
    # window; the two-phase rank (n_chars interpolation buckets) keeps
    # it an exact integer row_number with a parallel sort. The
    # per-source ranks stay keyed windows (|sources| partitions).
    from frontmatter_mcp_spark.operators.total_order import (
        with_global_row_number,
    )

    g = with_global_row_number(
        d.select(F.col("n_chars").alias("gval"), "doc_id"),
        [("gval", True), ("doc_id", True)],
        out="rg",
    ).select("gval", "rg")
    ng = d.agg(F.count("*").cast("long").alias("ng"))
    target = F.expr("(rs * ng + ns - 1) div ns")
    return (
        s.crossJoin(F.broadcast(ng))
        .withColumn("tg", target)
        .join(g, F.col("tg") == F.col("rg"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("rs").alias("rank_in_source"),
            F.col("gval").alias("norm_chars"),
        )
    )

# ---------------------------------------------------------------------------
# q247 — anomaly root-cause contributions: for each day the TOTAL
# event volume breaks its MAD fence, which event types carried the
# deviation and in what shares — the first question an on-call asks
# after the q155/q242 page fires. All integer: scaled deviations per
# type against that type's own daily mean
# ---------------------------------------------------------------------------
@register(
    "q247_anomaly_contributions",
    """
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT day, CAST(SUM(n) AS BIGINT) AS nt FROM daily GROUP BY 1
    ),
    base AS (
      SELECT CAST(SUM(nt) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS k
      FROM tot
    ),
    dev AS (
      SELECT t.day, t.nt, t.nt * b.k - b.s AS d_scaled, b.k
      FROM tot t CROSS JOIN base b
    ),
    mad AS (SELECT CAST(median(ABS(d_scaled)) AS DOUBLE) AS m FROM dev),
    anom AS (
      SELECT d.day, d.nt, d.d_scaled, d.k
      FROM dev d CROSS JOIN mad
      WHERE mad.m > 0 AND CAST(ABS(d.d_scaled) AS DOUBLE) / mad.m > 5e0
    ),
    tbase AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM daily GROUP BY 1
    )
    SELECT strftime(a.day, '%Y-%m-%d') AS day, a.nt AS total_events,
           d.event_type, d.n,
           ROUND(CAST(d.n * t.k - t.s AS DOUBLE) / t.k, 4) AS type_deviation,
           ROUND(CAST((d.n * t.k - t.s) AS DOUBLE) * a.k
                 / (t.k * CAST(a.d_scaled AS DOUBLE)), 6) AS contribution
    FROM anom a
    JOIN daily d ON d.day = a.day
    JOIN tbase t ON t.event_type = d.event_type
    ORDER BY day, d.event_type
    """,
    doc="root-cause table for total-volume anomalies: days whose total "
    "deviation (scaled integer n*k - s, no float mean) exceeds 5 MADs, "
    "then each type's own-baseline deviation and its SHARE of the "
    "day's total deviation (shares sum to ~1 when type day-coverage "
    "is complete). Two bounded aggregates + joins on the day axis — "
    "the decomposition every incident review needs next to the alarm",
)
def q247_anomaly_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # r10 ADR-0007 tail sweep: daily fans out to the day-total branch
    # (itself feeding base/mad/anom broadcasts), the per-type baseline
    # and the output join — six cold consumers in one action; eager
    # hold probed -31% (0.68->0.46 min-of-3)
    daily = hold(
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type").agg(
            F.count("*").cast("long").alias("n")
        )
    )
    tot = daily.groupBy("day").agg(F.sum("n").cast("long").alias("nt"))
    base = tot.agg(
        F.sum("nt").cast("long").alias("s"), F.count("*").cast("long").alias("k")
    )
    dev = tot.crossJoin(F.broadcast(base)).select(
        "day", "nt", (F.col("nt") * F.col("k") - F.col("s")).alias("d_scaled"), "k"
    )
    mad = dev.agg(F.median(F.abs("d_scaled")).cast("double").alias("m"))
    anom = (
        dev.crossJoin(F.broadcast(mad))
        .filter(
            (F.col("m") > 0)
            & (F.abs("d_scaled").cast("double") / F.col("m") > 5.0)
        )
        .select("day", "nt", "d_scaled", "k")
    )
    tbase = daily.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("ts_"), F.count("*").cast("long").alias("tk")
    )
    return (
        anom.join(daily, "day")
        .join(F.broadcast(tbase), "event_type")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("nt").alias("total_events"),
            "event_type",
            "n",
            F.round(
                (F.col("n") * F.col("tk") - F.col("ts_")).cast("double")
                / F.col("tk"),
                4,
            ).alias("type_deviation"),
            F.round(
                (F.col("n") * F.col("tk") - F.col("ts_")).cast("double")
                * F.col("k")
                / (F.col("tk") * F.col("d_scaled").cast("double")),
                6,
            ).alias("contribution"),
        )
        .orderBy("day", "event_type")
    )

# ---------------------------------------------------------------------------
# q248 — lead-lag cross-correlation: does one event type's daily
# volume PREDICT another's k days later (click leads purchase?) —
# the cross-correlogram at lags -3..3 that q200's lag-0 matrix and
# q216's self-ACF cannot see. Same exact-integer scaled-deviation
# machinery on the shared gap-filled day axis
# ---------------------------------------------------------------------------
_XCORR_LAGS = 3


@register(
    "q248_lead_lag_xcorr",
    f"""
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    axis AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM daily),
    filled AS (
      SELECT t.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY a.day)
                  AS BIGINT) AS i
      FROM types t CROSS JOIN axis a
      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = a.day
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM filled GROUP BY 1
    ),
    dev AS (
      SELECT f.event_type, f.i, f.n * t.nd - t.s AS d
      FROM filled f JOIN tot t USING (event_type)
    ),
    den AS (
      SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS ss FROM dev GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(-{_XCORR_LAGS}, {_XCORR_LAGS})) AS lag),
    num AS (
      SELECT a.event_type AS lead_type, b.event_type AS lag_type, l.lag,
             CAST(SUM(a.d * b.d) AS BIGINT) AS num
      FROM dev a
      JOIN lags l ON TRUE
      JOIN dev b ON b.i = a.i + l.lag AND b.event_type <> a.event_type
      GROUP BY 1, 2, 3
    )
    SELECT n.lead_type, n.lag_type, CAST(n.lag AS INT) AS lag,
           ROUND(CAST(n.num AS DOUBLE)
                 / (sqrt(CAST(da.ss AS DOUBLE)) * sqrt(CAST(db.ss AS DOUBLE))),
                 6) AS xcorr
    FROM num n
    JOIN den da ON da.event_type = n.lead_type
    JOIN den db ON db.event_type = n.lag_type
    WHERE n.lead_type < n.lag_type
    ORDER BY n.lead_type, n.lag_type, n.lag
    """,
    doc="cross-correlogram between every event-type pair at lags -3..3 "
    "days: scaled-integer deviations on the shared gap-filled axis "
    "(n*N - S, exact), lagged cross-products as BIGINT sums via the "
    "bounded day-index join, normalized by each series' own sum of "
    "squares (IEEE sqrt). A peak at lag k>0 means the first type "
    "LEADS the second by k days — the causality-screening view "
    "marketing/capacity teams act on. All work after the day "
    "aggregate is |types|^2 x |days| x 7 bounded",
)
def q248_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    axis = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = daily.select("event_type").distinct()
    filled = (
        types.crossJoin(axis)
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .withColumn(
            "i",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("day"))
            .cast("long"),
        )
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("s"), F.count("*").cast("long").alias("nd")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -16% (1.08->0.91)
    dev = hold(
        filled.join(tot, "event_type").select(
            "event_type", "i", (F.col("n") * F.col("nd") - F.col("s")).alias("d")
        )
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss")
    )
    lags = spark.range(-_XCORR_LAGS, _XCORR_LAGS + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = dev.select(F.col("event_type").alias("lead_type"), "i", F.col("d").alias("da"))
    b = dev.select(
        F.col("event_type").alias("lag_type"),
        F.col("i").alias("i2"),
        F.col("d").alias("db"),
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("i2") == F.col("i") + F.col("lag"))
            & (F.col("lag_type") != F.col("lead_type")),
        )
        .groupBy("lead_type", "lag_type", "lag")
        .agg(F.sum(F.col("da") * F.col("db")).cast("long").alias("num"))
        .filter(F.col("lead_type") < F.col("lag_type"))
    )
    da = den.select(F.col("event_type").alias("lead_type"), F.col("ss").alias("ssa"))
    db2 = den.select(F.col("event_type").alias("lag_type"), F.col("ss").alias("ssb"))
    return (
        num.join(F.broadcast(da), "lead_type")
        .join(F.broadcast(db2), "lag_type")
        .select(
            "lead_type",
            "lag_type",
            F.col("lag").cast("int").alias("lag"),
            F.round(
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("ssa").cast("double"))
                    * F.sqrt(F.col("ssb").cast("double"))
                ),
                6,
            ).alias("xcorr"),
        )
        .orderBy("lead_type", "lag_type", "lag")
    )

# ---------------------------------------------------------------------------
# q251 — robust means: 10%-trimmed and 10%-winsorized document-length
# means per source beside the raw mean — integer-rank trimming (no
# interpolation anywhere), decimal-exact sums, the robust-location
# family's complement to q155/q242's robust-dispersion MAD
# ---------------------------------------------------------------------------
@register(
    "q251_robust_means",
    """
    WITH r AS (
      SELECT source, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM documents
    ),
    marked AS (
      SELECT source, n_chars, n,
             rn > n // 10 AND rn <= n - n // 10 AS kept,
             CASE WHEN rn <= n // 10 THEN 'lo'
                  WHEN rn > n - n // 10 THEN 'hi' END AS clipped
      FROM r
    ),
    fences AS (
      SELECT source,
             MIN(CASE WHEN kept THEN n_chars END) AS lo_v,
             MAX(CASE WHEN kept THEN n_chars END) AS hi_v
      FROM marked GROUP BY 1
    )
    SELECT m.source, MAX(m.n) AS n_docs,
           ROUND(CAST(SUM(CAST(m.n_chars AS DECIMAL(28,6))) AS DOUBLE)
                 / MAX(m.n), 6) AS raw_mean,
           ROUND(CAST(SUM(CASE WHEN m.kept
                               THEN CAST(m.n_chars AS DECIMAL(28,6))
                               ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 / SUM(CASE WHEN m.kept THEN 1 ELSE 0 END), 6) AS trimmed_mean,
           ROUND(CAST(SUM(CASE WHEN m.kept THEN CAST(m.n_chars AS DECIMAL(28,6))
                               WHEN m.clipped = 'lo'
                                 THEN CAST(f.lo_v AS DECIMAL(28,6))
                               ELSE CAST(f.hi_v AS DECIMAL(28,6)) END)
                      AS DOUBLE) / MAX(m.n), 6) AS winsorized_mean,
           CAST(SUM(CASE WHEN m.clipped IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped
    FROM marked m JOIN fences f ON f.source = m.source
    GROUP BY m.source ORDER BY m.source
    """,
    doc="robust location per source: the raw mean, the 10%-trimmed "
    "mean (drop the bottom/top n//10 by integer rank under a (value, "
    "doc_id) total order — no quantile interpolation to disagree on), "
    "and the winsorized mean (clipped tails replaced by the surviving "
    "extremes). All sums DECIMAL-exact; a raw mean far from its "
    "trimmed twin is the numeric symptom of the heavy tail q231 "
    "measures. One rank window + one aggregate per source",
)
def q251_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("long")
        .alias("rn"),
        F.count("*").over(W.partitionBy("source")).cast("long").alias("n"),
    )
    k = F.expr("n div 10")
    marked = r.select(
        "source",
        "n_chars",
        "n",
        ((F.col("rn") > k) & (F.col("rn") <= F.col("n") - k)).alias("kept"),
        F.when(F.col("rn") <= k, "lo")
        .when(F.col("rn") > F.col("n") - k, "hi")
        .alias("clipped"),
    )
    fences = marked.groupBy(F.col("source").alias("s2")).agg(
        F.min(F.when(F.col("kept"), F.col("n_chars"))).alias("lo_v"),
        F.max(F.when(F.col("kept"), F.col("n_chars"))).alias("hi_v"),
    )
    dec = lambda c: c.cast("decimal(28,6)")  # noqa: E731
    z = F.lit(0).cast("decimal(28,6)")
    return (
        marked.join(F.broadcast(fences), F.col("source") == F.col("s2"))
        .groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.round(
                F.sum(dec(F.col("n_chars"))).cast("double") / F.max("n"), 6
            ).alias("raw_mean"),
            F.round(
                F.sum(
                    F.when(F.col("kept"), dec(F.col("n_chars"))).otherwise(z)
                ).cast("double")
                / F.sum(F.col("kept").cast("int")),
                6,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(
                    F.when(F.col("kept"), dec(F.col("n_chars")))
                    .when(F.col("clipped") == "lo", dec(F.col("lo_v")))
                    .otherwise(dec(F.col("hi_v")))
                ).cast("double")
                / F.max("n"),
                6,
            ).alias("winsorized_mean"),
            F.sum(F.col("clipped").isNotNull().cast("int"))
            .cast("long")
            .alias("n_clipped"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q277 — Jensen-Shannon divergence matrix between source unigram
# distributions: the symmetric, bounded (0..ln2) "how alike are these
# corpora" number that q179's PSI (binned, reference-vs-batch) and
# q205's cross-entropy (asymmetric) don't give — the input a mixture
# designer clusters sources by before setting q103/q106 weights.
# Zero-probability terms contribute zero to their own side's sum, so
# the full outer vocabulary union is handled by a conditional term.
# ---------------------------------------------------------------------------
@register(
    "q277_source_jsd_matrix",
    r"""
    WITH words AS (
      SELECT source, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS term
      FROM documents
    ),
    v AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
          FROM words GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM v GROUP BY 1),
    srcs AS (SELECT DISTINCT source FROM v),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    terms AS (
      SELECT p.src_a, p.src_b, v.term,
             CAST(SUM(CASE WHEN v.source = p.src_a THEN v.c ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN v.source = p.src_b THEN v.c ELSE 0 END)
                  AS BIGINT) AS cb
      FROM pairs p JOIN v ON v.source IN (p.src_a, p.src_b)
      GROUP BY 1, 2, 3
    ),
    contrib AS (
      SELECT t.src_a, t.src_b,
             CAST(CASE WHEN t.ca > 0 THEN
               0.5e0 * (CAST(t.ca AS DOUBLE) / na.n)
               * ln((CAST(t.ca AS DOUBLE) / na.n)
                    / ((CAST(t.ca AS DOUBLE) / na.n
                        + CAST(t.cb AS DOUBLE) / nb.n) / 2e0))
               ELSE 0e0 END AS DECIMAL(28,12)) AS ja,
             CAST(CASE WHEN t.cb > 0 THEN
               0.5e0 * (CAST(t.cb AS DOUBLE) / nb.n)
               * ln((CAST(t.cb AS DOUBLE) / nb.n)
                    / ((CAST(t.ca AS DOUBLE) / na.n
                        + CAST(t.cb AS DOUBLE) / nb.n) / 2e0))
               ELSE 0e0 END AS DECIMAL(28,12)) AS jb
      FROM terms t
      JOIN tot na ON na.source = t.src_a
      JOIN tot nb ON nb.source = t.src_b
    )
    SELECT src_a, src_b,
           ROUND(CAST(SUM(ja) + SUM(jb) AS DOUBLE), 6) AS jsd_nats,
           ROUND(CAST(SUM(ja) + SUM(jb) AS DOUBLE) / ln(2e0), 6) AS jsd_bits
    FROM contrib GROUP BY 1, 2
    ORDER BY src_a, src_b
    """,
    doc="pairwise Jensen-Shannon divergence between source unigram "
    "distributions: JSD = 0.5*KL(P||M) + 0.5*KL(Q||M) with M the "
    "average — symmetric and bounded by ln 2, reported in nats and "
    "bits. Per-term contributions are DECIMAL-quantized before the "
    "order-free sum; zero-count terms contribute zero on their side "
    "(the full-vocabulary union via conditional terms, no outer "
    "join). One vocab aggregate; the pair work is |sources|^2 x "
    "|vocab| rows",
)
def q277_source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    v = hold(
        d.select("source", F.explode(w).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = v.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    srcs = v.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("src_a")).join(
        srcs.select(F.col("source").alias("src_b")),
        F.col("src_a") < F.col("src_b"),
    )
    terms = (
        F.broadcast(pairs)
        .join(
            v,
            (v["source"] == F.col("src_a")) | (v["source"] == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "term")
        .agg(
            F.sum(F.when(F.col("source") == F.col("src_a"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("source") == F.col("src_b"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("cb"),
        )
    )
    na = tot.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    nb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    j = terms.join(F.broadcast(na), "src_a").join(F.broadcast(nb), "src_b")
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    m = (pa + pb) / 2.0
    ja = F.when(F.col("ca") > 0, 0.5 * pa * F.log(pa / m)).otherwise(
        F.lit(0.0)
    ).cast("decimal(28,12)")
    jb = F.when(F.col("cb") > 0, 0.5 * pb * F.log(pb / m)).otherwise(
        F.lit(0.0)
    ).cast("decimal(28,12)")
    return (
        j.select("src_a", "src_b", ja.alias("ja"), jb.alias("jb"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round((F.sum("ja") + F.sum("jb")).cast("double"), 6).alias(
                "jsd_nats"
            ),
            F.round(
                (F.sum("ja") + F.sum("jb")).cast("double") / F.log(F.lit(2.0)),
                6,
            ).alias("jsd_bits"),
        )
        .orderBy("src_a", "src_b")
    )

# ---------------------------------------------------------------------------
# q296 — Markov entropy rate of the behavior stream: H = sum_i pi_i *
# H_i with H_i the conditional entropy of state i's transition row
# and pi the stationary distribution (q193's fixed-point power
# iteration, replayed as CTEs) — the bits-per-event predictability
# number: low = rigid funnels, high = anything-follows-anything.
# Transition/stationary masses stay in 2^30 fixed point; ln enters
# once per term, DECIMAL-quantized (q94 discipline).
# ---------------------------------------------------------------------------
_ME_ITERS = 6

def _markov_entropy_sql(iters: int = _ME_ITERS, s: int = _MKV_SCALE) -> str:
    ctes = [
        """pairs AS (
      SELECT user_id, event_type AS dst,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM events
    )""",
        """trans AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs WHERE src IS NOT NULL GROUP BY 1, 2
    )""",
        "rowtot AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM trans GROUP BY 1)",
        f"""tfx AS MATERIALIZED (
      SELECT t.src, t.dst, (t.cnt * {s}) // r.tot AS p_fx
      FROM trans t JOIN rowtot r USING (src)
    )""",
        "types AS MATERIALIZED (SELECT DISTINCT event_type FROM events)",
        f"""pi0 AS (
      SELECT event_type,
             CAST({s} // (SELECT COUNT(*) FROM types) AS BIGINT) AS w
      FROM types
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pi{t} AS (
      SELECT ty.event_type,
             COALESCE(CAST(SUM((p.w * tf.p_fx) // {s}) AS BIGINT), 0) AS w
      FROM types ty
      LEFT JOIN tfx tf ON tf.dst = ty.event_type
      LEFT JOIN pi{t - 1} p ON p.event_type = tf.src
      GROUP BY ty.event_type
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    cond AS MATERIALIZED (
      SELECT src,
             CAST(SUM(CAST(CASE WHEN p_fx > 0 THEN
               -(CAST(p_fx AS DOUBLE) / {s}) * ln(CAST(p_fx AS DOUBLE) / {s})
               ELSE 0e0 END AS DECIMAL(28,12))) AS DOUBLE) AS h
      FROM tfx GROUP BY 1
    ),
    rate AS (
      SELECT CAST(SUM(CAST((CAST(p.w AS DOUBLE) / {s}) * c.h
                           AS DECIMAL(28,12))) AS DOUBLE) AS hr
      FROM cond c JOIN pi{iters} p ON p.event_type = c.src
    )
    SELECT c.src AS event_type, p.w AS stationary_fx,
           ROUND(CAST(p.w AS DOUBLE) / {s}, 6) AS stationary_p,
           ROUND(c.h, 6) AS conditional_entropy,
           ROUND(r.hr, 6) AS entropy_rate
    FROM cond c
    JOIN pi{iters} p ON p.event_type = c.src
    CROSS JOIN rate r
    ORDER BY event_type
    """


@register(
    "q296_markov_entropy_rate",
    _markov_entropy_sql(),
    doc="behavior-stream predictability: per-state conditional entropy "
    "of the transition row (DECIMAL-quantized -p ln p terms over the "
    "2^30 fixed-point probabilities) and the chain's entropy rate "
    "sum_i pi_i H_i under the 6-step power-iteration stationary "
    "distribution (q193's exact floor arithmetic, every iteration an "
    "oracle CTE). Per-state rows carry the corpus-level rate so one "
    "table answers both 'which state is chaotic' and 'how predictable "
    "is the stream'. One window pass + |types|^2 algebra",
)
def q296_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _MKV_SCALE
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = pairs.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    rowtot = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("tot"))
    tfx = hold(
        trans.join(rowtot, "src").select(
            "src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx")
        )
    )
    types = e.select("event_type").distinct()
    ntypes = types.count()
    pi = types.select(
        "event_type", F.lit(s // ntypes).cast("long").alias("w")
    )
    for _ in range(_ME_ITERS):
        pi = (
            types.join(
                tfx.withColumnRenamed("dst", "event_type"), "event_type", "left"
            )
            .join(
                F.broadcast(
                    pi.select(F.col("event_type").alias("src2"), F.col("w").alias("pw"))
                ),
                F.col("src") == F.col("src2"),
                "left",
            )
            .groupBy("event_type")
            .agg(
                F.coalesce(
                    F.sum(F.expr(f"(pw * p_fx) div {s}")).cast("long"), F.lit(0)
                ).alias("w")
            )
        )
    p = F.col("p_fx").cast("double") / s
    cond = hold(
        tfx.groupBy("src").agg(
            F.sum(
                F.when(F.col("p_fx") > 0, -p * F.log(p))
                .otherwise(F.lit(0.0))
                .cast("decimal(28,12)")
            )
            .cast("double")
            .alias("h")
        )
    )
    rate = cond.join(
        F.broadcast(pi.select(F.col("event_type").alias("src"), "w")), "src"
    ).agg(
        F.sum(((F.col("w").cast("double") / s) * F.col("h")).cast("decimal(28,12)"))
        .cast("double")
        .alias("hr")
    )
    return (
        cond.join(
            F.broadcast(pi.select(F.col("event_type").alias("src"), "w")), "src"
        )
        .crossJoin(F.broadcast(rate))
        .select(
            F.col("src").alias("event_type"),
            F.col("w").alias("stationary_fx"),
            F.round(F.col("w").cast("double") / s, 6).alias("stationary_p"),
            F.round("h", 6).alias("conditional_entropy"),
            F.round("hr", 6).alias("entropy_rate"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q320 — Kruskal-Wallis rank test: do the sources draw document
# lengths from the same distribution? q298's doubled-midrank
# discipline (2*midrank = 2*cnt_less + cnt_eq + 1, an exact BIGINT
# per value) makes every rank sum exact; the between-group term uses
# q294's floor(Sg^2/ng) convention (one floor per group, identical
# both engines), ties corrected by the exact integer (N^3-N) -
# sum(t^3-t) factor. Doubles only in the final H chain.
# ---------------------------------------------------------------------------
@register(
    "q320_kruskal_wallis",
    """
    WITH vals AS (
      SELECT source, n_chars AS v FROM documents
    ),
    vstats AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt_eq FROM vals GROUP BY 1
    ),
    vrank AS (
      SELECT v, cnt_eq,
             CAST(COALESCE(SUM(cnt_eq) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_less
      FROM vstats
    ),
    g AS (
      SELECT s.source,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(2 * r.cnt_less + r.cnt_eq + 1) AS BIGINT) AS dr_sum
      FROM vals s JOIN vrank r ON r.v = s.v
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM((dr_sum * dr_sum) // n_g) AS BIGINT) AS ssq
      FROM g
    ),
    tie AS (
      SELECT CAST(COALESCE(SUM(cnt_eq * cnt_eq * cnt_eq - cnt_eq), 0)
                  AS BIGINT) AS tie_term
      FROM vstats WHERE cnt_eq > 1
    ),
    h AS (
      SELECT t.n, t.ssq, ti.tie_term,
             3e0 * t.ssq / (CAST(t.n AS DOUBLE) * (t.n + 1))
               - 3e0 * (t.n + 1) AS h_raw
      FROM tot t CROSS JOIN tie ti
    )
    SELECT g.source, g.n_g, g.dr_sum,
           ROUND(CAST(g.dr_sum AS DOUBLE) / (2 * g.n_g), 6) AS mean_rank,
           CAST(h.n AS BIGINT) AS n_total,
           ROUND(h.h_raw, 6) AS h_stat,
           ROUND(h.h_raw * (CAST(h.n AS DOUBLE) * h.n * h.n - h.n)
                 / (CAST(h.n AS DOUBLE) * h.n * h.n - h.n - h.tie_term), 6)
             AS h_tie_corrected
    FROM g CROSS JOIN h
    ORDER BY g.source
    """,
    doc="Kruskal-Wallis test of document length across sources: "
    "doubled midranks (2*cnt_less + cnt_eq + 1 per distinct value — "
    "q298's exact-integer rank discipline) give exact BIGINT rank "
    "sums per source; H = 3*sum(floor(DR_g^2/n_g))/(N(N+1)) - 3(N+1) "
    "with q294's one-floor-per-group convention, then the exact "
    "integer tie factor (N^3-N)/((N^3-N) - sum(t^3-t)). Each source "
    "row carries its exact rank sum and mean rank beside the global "
    "H — the omnibus upgrade of q203's pairwise KS matrix (one test, "
    "no multiplicity). One value-histogram window + one group "
    "aggregate; the rank join is value-histogram-sized",
)
def q320_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    vals = d.select("source", F.col("n_chars").alias("v"))
    vstats = vals.groupBy("v").agg(F.count("*").cast("long").alias("cnt_eq"))
    vrank = vstats.select(
        "v",
        "cnt_eq",
        F.coalesce(
            F.sum("cnt_eq").over(
                W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cnt_less"),
    )
    g = (
        vals.join(F.broadcast(vrank), "v")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum(2 * F.col("cnt_less") + F.col("cnt_eq") + 1)
            .cast("long")
            .alias("dr_sum"),
        )
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.expr("(dr_sum * dr_sum) div n_g")).cast("long").alias("ssq"),
    )
    tie = vstats.filter(F.col("cnt_eq") > 1).agg(
        F.coalesce(
            F.sum(
                F.col("cnt_eq") * F.col("cnt_eq") * F.col("cnt_eq")
                - F.col("cnt_eq")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie_term")
    )
    h = tot.crossJoin(F.broadcast(tie)).select(
        "n",
        "ssq",
        "tie_term",
        (
            3.0 * F.col("ssq") / (F.col("n").cast("double") * (F.col("n") + 1))
            - 3.0 * (F.col("n") + 1)
        ).alias("h_raw"),
    )
    n3 = F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    return (
        g.crossJoin(F.broadcast(h))
        .select(
            "source",
            "n_g",
            "dr_sum",
            F.round(
                F.col("dr_sum").cast("double") / (2 * F.col("n_g")), 6
            ).alias("mean_rank"),
            F.col("n").cast("long").alias("n_total"),
            F.round("h_raw", 6).alias("h_stat"),
            F.round(
                F.col("h_raw") * n3 / (n3 - F.col("tie_term")), 6
            ).alias("h_tie_corrected"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q321 — permutation test + Benjamini-Hochberg FDR: "which sources'
# mean document length deviates from the corpus?" answered with
# EXACT-rational p-values — the null distribution is B=32
# md5-derandomized relabelings (q156's replicate-explosion
# discipline), the test statistic |mean_g - mean| compares across
# groups as the cross-multiplied integer |SX_g*N - SX*n_g| / (n_g*N),
# every null-vs-observed comparison is an integer cross-
# multiplication, and p = (1+r)/(D+1) is a rational with a common
# denominator — so the BH step-up rule (1+r)*10*m <= k*(D+1) at
# alpha=0.1 is pure integer arithmetic. Multiple-testing control
# with NOTHING floating in the decision path.
# ---------------------------------------------------------------------------
_PERM_B = 32  # null replicates

_PERM_G = 20  # pseudo-groups per replicate

def _perm_bh_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    pg = hash_bucket_sql(
        "(CAST(doc_id AS VARCHAR) || '|' || CAST(b AS VARCHAR))", _PERM_G
    )
    return f"""
    WITH tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_chars) AS BIGINT) AS sx
      FROM documents
    ),
    obs AS (
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(d.n_chars) AS BIGINT) AS sx_g,
             ABS(CAST(SUM(d.n_chars) AS BIGINT) * MAX(t.n)
                 - MAX(t.sx) * CAST(COUNT(*) AS BIGINT)) AS num,
             CAST(COUNT(*) AS BIGINT) * MAX(t.n) AS den
      FROM documents d CROSS JOIN tot t
      GROUP BY 1
    ),
    nulls AS (
      SELECT b, pg, ABS(sxg * n - sx * ng) AS num, ng * n AS den
      FROM (
        SELECT x.b, {pg} AS pg,
               CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(d.n_chars) AS BIGINT) AS sxg,
               MAX(t.n) AS n, MAX(t.sx) AS sx
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, {_PERM_B - 1})) AS b) x
        CROSS JOIN tot t
        GROUP BY 1, 2
      )
    ),
    dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM nulls),
    r AS (
      SELECT o.source, o.n_g, o.num, o.den,
             CAST(COALESCE(SUM(CASE WHEN nu.num * o.den >= o.num * nu.den
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS r
      FROM obs o LEFT JOIN nulls nu ON TRUE
      GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT r.*, dd.d,
             CAST(ROW_NUMBER() OVER (ORDER BY r.r, r.source) AS BIGINT) AS k,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM r CROSS JOIN dd
    ),
    kmax AS (
      SELECT COALESCE(MAX(CASE WHEN (1 + r) * 10 * m <= k * (d + 1)
                               THEN k END), 0) AS kx
      FROM ranked
    )
    SELECT ra.source, ra.n_g,
           ROUND(CAST(ra.num AS DOUBLE) / ra.den, 6) AS abs_mean_diff,
           ra.r AS n_null_geq, CAST(ra.d AS BIGINT) AS n_null,
           ROUND(CAST(1 + ra.r AS DOUBLE) / (ra.d + 1), 6) AS p_value,
           CAST(ra.k AS INT) AS p_rank,
           CAST(ra.k <= km.kx AS INT) AS bh_reject
    FROM ranked ra CROSS JOIN kmax km
    ORDER BY ra.source
    """


@register(
    "q321_permutation_bh_fdr",
    _perm_bh_sql(),
    doc="per-source mean-length deviation under a derandomized "
    "permutation test with Benjamini-Hochberg FDR control at "
    "alpha=0.1: the null is B=32 md5-relabelings into 20 pseudo-"
    "groups (one exploded corpus pass, q156's replicate discipline), "
    "the statistic |mean_g - mean| lives as the cross-multiplied "
    "integer pair (|SX_g*N - SX*n_g|, n_g*N) so null>=obs comparisons "
    "are exact, p = (1+r)/(D+1) shares the denominator D+1, and the "
    "BH step-up (1+r)*10*m <= k*(D+1) is pure integer arithmetic — "
    "the whole multiple-testing decision path is float-free (doubles "
    "appear only in display columns). The q311/q203 shape tests say "
    "WHICH distributions differ; this controls how many of those "
    "discoveries are expected to be false. Cross-mult magnitudes are "
    "BIGINT-safe through sf1; beyond that the pair lifts to "
    "DECIMAL(38,0)",
)
def q321_permutation_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    tot = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sx"),
    )
    obs = (
        d.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("n_chars").cast("long").alias("sx_g"),
            F.abs(
                F.sum("n_chars").cast("long") * F.max("n")
                - F.max("sx") * F.count("*").cast("long")
            ).alias("num"),
            (F.count("*").cast("long") * F.max("n")).alias("den"),
        )
    )
    nulls = (
        d.select(
            "doc_id",
            "n_chars",
            F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        )
        .withColumn(
            "pg",
            hash_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.col("b").cast("string"),
                ),
                _PERM_G,
            ),
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("b", "pg")
        .agg(
            F.count("*").cast("long").alias("ng"),
            F.sum("n_chars").cast("long").alias("sxg"),
            F.max("n").alias("n"),
            F.max("sx").alias("sx"),
        )
        .select(
            "b",
            "pg",
            F.abs(F.col("sxg") * F.col("n") - F.col("sx") * F.col("ng")).alias(
                "nnum"
            ),
            (F.col("ng") * F.col("n")).alias("nden"),
        )
    )
    nulls = hold(nulls)
    dd = nulls.agg(F.count("*").cast("long").alias("d"))
    r = (
        obs.join(
            F.broadcast(nulls.select("nnum", "nden")), F.lit(True), "left"
        )
        .groupBy("source", "n_g", "num", "den")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("nnum") * F.col("den")
                        >= F.col("num") * F.col("nden"),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("r")
        )
    )
    ranked = r.crossJoin(F.broadcast(dd)).select(
        "*",
        F.row_number().over(W.orderBy("r", "source")).cast("long").alias("k"),
        F.count("*").over(W.partitionBy()).cast("long").alias("m"),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    (1 + F.col("r")) * 10 * F.col("m")
                    <= F.col("k") * (F.col("d") + 1),
                    F.col("k"),
                )
            ),
            F.lit(0),
        ).alias("kx")
    )
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .select(
            "source",
            "n_g",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias(
                "abs_mean_diff"
            ),
            F.col("r").alias("n_null_geq"),
            F.col("d").cast("long").alias("n_null"),
            F.round(
                (1 + F.col("r")).cast("double") / (F.col("d") + 1), 6
            ).alias("p_value"),
            F.col("k").cast("int").alias("p_rank"),
            (F.col("k") <= F.col("kx")).cast("int").alias("bh_reject"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q342 — Friedman test: do the event types keep the same volume
# RANKING day after day? Blocks = days on the shared gap-filled axis,
# treatments = the k types, within-day doubled midranks (q320's
# exact-integer rank discipline applied per block), the classic
# Q = (3*sum DR_j^2 - 3 n^2 k (k+1)^2) / (n k (k+1)) with the exact
# integer tie factor. The repeated-measures complement of q320 (which
# ignores the day blocking) and q158 (which compares means, not
# ranks).
# ---------------------------------------------------------------------------
@register(
    "q342_friedman_test",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    days AS (
      SELECT unnest(generate_series(MIN(day), MAX(day), INTERVAL '1 day'))
        AS day FROM daily
    ),
    types AS (SELECT DISTINCT event_type FROM daily),
    filled AS (
      SELECT t.event_type, d.day, COALESCE(x.n, CAST(0 AS BIGINT)) AS n
      FROM days d CROSS JOIN types t
      LEFT JOIN daily x ON x.event_type = t.event_type AND x.day = d.day
    ),
    vstats AS (
      SELECT day, n, CAST(COUNT(*) AS BIGINT) AS cnt_eq
      FROM filled GROUP BY 1, 2
    ),
    vrank AS (
      SELECT day, n, cnt_eq,
             CAST(COALESCE(SUM(cnt_eq) OVER (PARTITION BY day ORDER BY n
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cnt_less
      FROM vstats
    ),
    r AS (
      SELECT f.event_type, f.day,
             2 * v.cnt_less + v.cnt_eq + 1 AS dr
      FROM filled f JOIN vrank v ON v.day = f.day AND v.n = f.n
    ),
    rj AS (
      SELECT event_type, CAST(SUM(dr) AS BIGINT) AS dr_sum,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM r GROUP BY 1
    ),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM types),
    tie AS (
      SELECT CAST(COALESCE(SUM(cnt_eq * cnt_eq * cnt_eq - cnt_eq), 0)
                  AS BIGINT) AS tie_term
      FROM vstats WHERE cnt_eq > 1
    ),
    q AS (
      SELECT MAX(rj.n_days) AS n, kk.k, tie.tie_term,
             CAST(SUM(rj.dr_sum * rj.dr_sum) AS BIGINT) AS ssq
      FROM rj CROSS JOIN kk CROSS JOIN tie
      GROUP BY kk.k, tie.tie_term
    ),
    stat AS (
      SELECT n, k, tie_term,
             (3e0 * ssq - 3e0 * n * n * k * (k + 1) * (k + 1))
               / (CAST(n AS DOUBLE) * k * (k + 1)) AS q_raw
      FROM q
    )
    SELECT rj.event_type, rj.n_days, rj.dr_sum,
           ROUND(CAST(rj.dr_sum AS DOUBLE) / (2 * rj.n_days), 6)
             AS mean_rank,
           ROUND(s.q_raw, 6) AS q_friedman,
           ROUND(s.q_raw / (1e0 - CAST(s.tie_term AS DOUBLE)
                 / (CAST(s.n AS DOUBLE) * s.k * (s.k * s.k - 1))), 6)
             AS q_tie_corrected,
           CAST(s.k - 1 AS INT) AS df
    FROM rj CROSS JOIN stat s
    ORDER BY rj.event_type
    """,
    doc="Friedman repeated-measures rank test: within each day (the "
    "block) the k event types get doubled midranks (2*less + eq + 1, "
    "exact integers — q320's discipline per block), per-type rank "
    "sums are exact BIGINTs, Q = (3*sum DR_j^2 - 3n^2k(k+1)^2) / "
    "(nk(k+1)) with the exact integer tie factor 1 - sum(t^3-t)/"
    "(nk(k^2-1)). Answers 'is the type ORDERING stable across days' "
    "— the blocked complement of q320's unblocked Kruskal-Wallis. "
    "One day aggregate + per-day rank windows, all O(days x k)",
)
def q342_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    days = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = daily.select("event_type").distinct()
    filled = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
    )
    filled = pin(filled)
    vstats = filled.groupBy("day", "n").agg(
        F.count("*").cast("long").alias("cnt_eq")
    )
    vrank = vstats.select(
        "day",
        "n",
        "cnt_eq",
        F.coalesce(
            F.sum("cnt_eq").over(
                W.partitionBy("day")
                .orderBy("n")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("cnt_less"),
    )
    r = filled.join(F.broadcast(vrank), ["day", "n"]).select(
        "event_type",
        "day",
        (2 * F.col("cnt_less") + F.col("cnt_eq") + 1).alias("dr"),
    )
    rj = r.groupBy("event_type").agg(
        F.sum("dr").cast("long").alias("dr_sum"),
        F.count("*").cast("long").alias("n_days"),
    )
    kk = types.agg(F.count("*").cast("long").alias("k"))
    tie = vstats.filter(F.col("cnt_eq") > 1).agg(
        F.coalesce(
            F.sum(
                F.col("cnt_eq") * F.col("cnt_eq") * F.col("cnt_eq")
                - F.col("cnt_eq")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie_term")
    )
    q = (
        rj.crossJoin(F.broadcast(kk))
        .crossJoin(F.broadcast(tie))
        .groupBy("k", "tie_term")
        .agg(
            F.max("n_days").alias("n"),
            F.sum(F.col("dr_sum") * F.col("dr_sum")).cast("long").alias("ssq"),
        )
    )
    q_raw = (
        3.0 * F.col("ssq")
        - 3.0 * F.col("n") * F.col("n") * F.col("k") * (F.col("k") + 1)
        * (F.col("k") + 1)
    ) / (F.col("n").cast("double") * F.col("k") * (F.col("k") + 1))
    stat = q.select("n", "k", "tie_term", q_raw.alias("q_raw"))
    corr = F.col("q_raw") / (
        F.lit(1.0)
        - F.col("tie_term").cast("double")
        / (
            F.col("n").cast("double")
            * F.col("k")
            * (F.col("k") * F.col("k") - 1)
        )
    )
    return (
        rj.crossJoin(F.broadcast(stat))
        .select(
            "event_type",
            "n_days",
            "dr_sum",
            F.round(
                F.col("dr_sum").cast("double") / (2 * F.col("n_days")), 6
            ).alias("mean_rank"),
            F.round("q_raw", 6).alias("q_friedman"),
            F.round(corr, 6).alias("q_tie_corrected"),
            (F.col("k") - 1).cast("int").alias("df"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q352 — QQ table between two sources' length distributions: matched
# exact order statistics at 5%-step quantile levels (rank =
# ceil(n*p/100) under the (value, doc_id) total order — q341's rank
# rule) — the numeric quantile-quantile plot that says WHERE two
# distributions diverge, where q203's KS gives one max-gap number.
# ---------------------------------------------------------------------------
_QQ_A, _QQ_B = "src0", "src1"

def _qq_sql() -> str:
    levels = ", ".join(str(p) for p in range(5, 100, 5))
    return f"""
    WITH va AS (
      SELECT n_chars AS v,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents WHERE source = '{_QQ_A}'
    ),
    vb AS (
      SELECT n_chars AS v,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents WHERE source = '{_QQ_B}'
    ),
    ps AS (SELECT unnest([{levels}]) AS p),
    qa AS (
      SELECT ps.p, va.v AS q_a
      FROM ps JOIN va ON va.rn = GREATEST(1, (va.n * ps.p + 99) // 100)
    ),
    qb AS (
      SELECT ps.p, vb.v AS q_b
      FROM ps JOIN vb ON vb.rn = GREATEST(1, (vb.n * ps.p + 99) // 100)
    )
    SELECT qa.p AS pct, '{_QQ_A}' AS source_a, '{_QQ_B}' AS source_b,
           CAST(qa.q_a AS BIGINT) AS q_a, CAST(qb.q_b AS BIGINT) AS q_b,
           CAST(qb.q_b - qa.q_a AS BIGINT) AS diff
    FROM qa JOIN qb ON qb.p = qa.p
    ORDER BY pct
    """


@register(
    "q352_qq_table",
    _qq_sql(),
    doc="quantile-quantile table between src0 and src1 document "
    "lengths: exact order statistics at 5..95% levels (rank = "
    "ceil(n*p/100) under the (value, doc_id) total order), paired "
    "with their integer differences — the per-level view of the "
    "divergence q203's KS statistic compresses into one number, and "
    "the table a quantile-normalization step (q232) is calibrated "
    "from. Two per-source windows on a bounded group + a 19-row join",
)
def q352_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")

    def ranked(src):
        return d.filter(F.col("source") == src).select(
            F.col("n_chars").alias("v"),
            F.row_number().over(W.orderBy("n_chars", "doc_id")).alias("rn"),
            F.count("*").over(W.partitionBy()).alias("n"),
        )

    ps = d.sparkSession.createDataFrame(
        [(p,) for p in range(5, 100, 5)], "p int"
    )
    idx = F.greatest(F.lit(1), F.expr("(n * p + 99) div 100"))
    qa = (
        ranked(_QQ_A)
        .crossJoin(F.broadcast(ps))
        .filter(F.col("rn") == idx)
        .select("p", F.col("v").alias("q_a"))
    )
    qb = (
        ranked(_QQ_B)
        .crossJoin(F.broadcast(ps))
        .filter(F.col("rn") == idx)
        .select("p", F.col("v").alias("q_b"))
    )
    return (
        qa.join(qb, "p")
        .select(
            F.col("p").alias("pct"),
            F.lit(_QQ_A).alias("source_a"),
            F.lit(_QQ_B).alias("source_b"),
            F.col("q_a").cast("long").alias("q_a"),
            F.col("q_b").cast("long").alias("q_b"),
            (F.col("q_b") - F.col("q_a")).cast("long").alias("diff"),
        )
        .orderBy("pct")
    )

# ---------------------------------------------------------------------------
# q357 — overdispersion index of daily counts: is event volume
# Poisson (dispersion ~ 1) or clumped (>> 1 — invalidating the
# Poisson assumptions q156's bootstrap draws and q215's burstiness
# contextualizes)? The dispersion test statistic sum (x - mean)^2 /
# mean = (n*SS - S^2)/S is an exact rational of BIGINT moments on
# the gap-filled axis; D = chi2/(n-1); the flag compares against the
# normal approximation of the chi2(n-1) upper tail — one double
# chain.
# ---------------------------------------------------------------------------
@register(
    "q357_overdispersion",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS ss
      FROM filled GROUP BY 1
    )
    SELECT event_type, CAST(nd AS INT) AS n_days,
           ROUND(CAST(s AS DOUBLE) / nd, 6) AS mean_daily,
           ROUND((CAST(nd AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                 / CAST(s AS DOUBLE), 6) AS chi2_stat,
           ROUND((CAST(nd AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                 / CAST(s AS DOUBLE) / (nd - 1), 6) AS dispersion_index,
           CAST((CAST(nd AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                / CAST(s AS DOUBLE)
                > (nd - 1) + 3e0 * sqrt(2e0 * (nd - 1)) AS INT)
             AS overdispersed
    FROM m
    ORDER BY event_type
    """,
    doc="Poisson overdispersion check per event type: the dispersion "
    "test statistic sum (x - mean)^2 / mean = (n*SS - S^2)/S as an "
    "exact rational of BIGINT moments over the gap-filled daily axis, "
    "the dispersion index D = chi2/(n-1) (Poisson ~ 1, clumped >> 1), "
    "and a 3-sigma flag against the chi2(n-1) normal tail — the "
    "model-assumption gate for anything treating daily counts as "
    "Poisson (q156 bootstrap, rate CIs). One day rollup + one moment "
    "aggregate",
)
def q357_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    m = filled.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    chi2 = (
        F.col("nd").cast("double") * F.col("ss")
        - F.col("s").cast("double") * F.col("s")
    ) / F.col("s").cast("double")
    return m.select(
        "event_type",
        F.col("nd").cast("int").alias("n_days"),
        F.round(F.col("s").cast("double") / F.col("nd"), 6).alias("mean_daily"),
        F.round(chi2, 6).alias("chi2_stat"),
        F.round(chi2 / (F.col("nd") - 1), 6).alias("dispersion_index"),
        (
            chi2
            > (F.col("nd") - 1) + 3.0 * F.sqrt(2.0 * (F.col("nd") - 1))
        )
        .cast("int")
        .alias("overdispersed"),
    ).orderBy("event_type")

# ---------------------------------------------------------------------------
# q359 — Dalenius-Hodges optimal stratification (cum-sqrt-f rule):
# the missing half of q161 — Neyman allocation assumed strata; this
# CHOOSES them, cutting the n_chars histogram where the cumulative
# sqrt-frequency crosses equal quarters (sqrt is IEEE-exact; the
# 2^20-floored values make the cumulative and its quarter thresholds
# exact integers). Each resulting stratum reports exact moments and
# the Neyman objective term N_h * S_h, with the equal-width layout's
# objective beside it — the design-variance win the rule buys.
# ---------------------------------------------------------------------------
_DH_BINS = 20

_DH_STRATA = 4

_DH_FX = 1 << 20


@register(
    "q359_dalenius_hodges",
    f"""
    WITH mm AS (
      SELECT CAST(MIN(n_chars) AS BIGINT) AS lo,
             CAST(MAX(n_chars) AS BIGINT) AS hi
      FROM documents
    ),
    d AS (
      SELECT CAST(((d.n_chars - m.lo) * {_DH_BINS}) // (m.hi - m.lo + 1)
                  AS INT) AS bin,
             d.n_chars AS v
      FROM documents d CROSS JOIN mm m
    ),
    f AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
    ),
    sq AS (
      SELECT bin, n,
             CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * {_DH_FX}) AS BIGINT)
               AS sq_fx
      FROM f
    ),
    c AS (
      SELECT bin, n, sq_fx,
             CAST(SUM(sq_fx) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(sq_fx) OVER () AS BIGINT) AS tot
      FROM sq
    ),
    assign AS (
      SELECT bin, n,
             CAST(LEAST({_DH_STRATA} - 1,
               ((cum - 1) * {_DH_STRATA}) // tot) AS INT) AS stratum
      FROM c
    ),
    sd AS (
      SELECT a.stratum, d.v
      FROM d JOIN assign a ON a.bin = d.bin
    ),
    stats AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS ss
      FROM sd GROUP BY 1
    ),
    obj AS (
      SELECT stratum, n, s, ss,
             CAST(n AS DOUBLE)
               * sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                      / (CAST(n AS DOUBLE) * n)) AS nh_sh
      FROM stats
    ),
    ew AS (
      SELECT CAST(SUM(t_fx) AS BIGINT) AS ew_fx FROM (
        SELECT CAST(FLOOR(CAST(n AS DOUBLE)
                 * sqrt((CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                        / (CAST(n AS DOUBLE) * n)) * {_DH_FX}) AS BIGINT)
                 AS t_fx
        FROM (
          SELECT CAST((g.bin * {_DH_STRATA}) // {_DH_BINS} AS INT) AS es,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(g.v) AS BIGINT) AS s,
                 CAST(SUM(g.v * g.v) AS BIGINT) AS ss
          FROM d g GROUP BY 1
        ) WHERE n > 1
      )
    ),
    dhobj AS (
      SELECT CAST(SUM(CAST(FLOOR(nh_sh * {_DH_FX}) AS BIGINT)) AS BIGINT)
        AS dh_fx
      FROM obj
    )
    SELECT o.stratum, o.n AS n_docs,
           ROUND(CAST(o.s AS DOUBLE) / o.n, 6) AS mean_chars,
           ROUND(o.nh_sh, 4) AS neyman_term,
           ROUND(CAST(dh.dh_fx AS DOUBLE) / {_DH_FX}, 4) AS dh_objective,
           ROUND(CAST(e.ew_fx AS DOUBLE) / {_DH_FX}, 4)
             AS equalwidth_objective,
           ROUND(1e0 - CAST(dh.dh_fx AS DOUBLE) / e.ew_fx, 6)
             AS variance_reduction
    FROM obj o CROSS JOIN dhobj dh CROSS JOIN ew e
    ORDER BY o.stratum
    """,
    doc="Dalenius-Hodges cum-sqrt-f stratification of document length: "
    "20 equal-width histogram bins, cut into 4 strata where the "
    "cumulative 2^20-floored sqrt-frequency crosses equal quarters "
    "(integer thresholds — the classic survey-design rule), each "
    "stratum reporting exact moments and its Neyman objective term "
    "N_h*S_h, with the equal-width layout's objective and the "
    "variance reduction the rule buys. Completes q161: Neyman "
    "allocates samples GIVEN strata, DH chooses the strata Neyman "
    "deserves. One histogram aggregate + bounded bin windows",
)
def q359_dalenius_hodges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    doc = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    mm_ = doc.agg(
        F.min("n_chars").cast("long").alias("lo"),
        F.max("n_chars").cast("long").alias("hi"),
    )
    # r10 ADR-0007 tail sweep: the binned table fans out cold in one
    # action; eager hold probed -11%/-8% in two independent min-of-4
    # sessions (1.02->0.91, 1.05->0.97)
    d = hold(
        doc.crossJoin(F.broadcast(mm_)).select(
            F.expr(
                f"cast(((n_chars - lo) * {_DH_BINS}) div (hi - lo + 1) as int)"
            ).alias("bin"),
            F.col("n_chars").alias("v"),
        )
    )
    f = d.groupBy("bin").agg(F.count("*").cast("long").alias("n"))
    sq = f.select(
        "bin",
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * _DH_FX)
        .cast("long")
        .alias("sq_fx"),
    )
    wo = W.orderBy("bin")
    c = sq.select(
        "bin",
        "n",
        F.sum("sq_fx")
        .over(wo.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
        F.sum("sq_fx").over(W.partitionBy()).cast("long").alias("tot"),
    )
    assign = c.select(
        "bin",
        F.least(
            F.lit(_DH_STRATA - 1),
            F.expr(f"((cum - 1) * {_DH_STRATA}) div tot"),
        )
        .cast("int")
        .alias("stratum"),
    )
    sd = d.join(F.broadcast(assign), "bin")
    stats = sd.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    nh_sh = F.col("n").cast("double") * F.sqrt(
        (
            F.col("n").cast("double") * F.col("ss")
            - F.col("s").cast("double") * F.col("s")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    # (same probe covered this pin: the monkeypatch converted both)
    obj = hold(stats.select("stratum", "n", "s", "ss", nh_sh.alias("nh_sh")))
    ewstats = (
        d.select(
            F.expr(f"cast((bin * {_DH_STRATA}) div {_DH_BINS} as int)").alias(
                "es"
            ),
            "v",
        )
        .groupBy("es")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
        )
        .filter(F.col("n") > 1)
    )
    ew = ewstats.select(
        F.floor(nh_sh * _DH_FX).cast("long").alias("t_fx")
    ).agg(F.sum("t_fx").cast("long").alias("ew_fx"))
    dhobj = obj.select(
        F.floor(F.col("nh_sh") * _DH_FX).cast("long").alias("t_fx")
    ).agg(F.sum("t_fx").cast("long").alias("dh_fx"))
    return (
        obj.crossJoin(F.broadcast(dhobj))
        .crossJoin(F.broadcast(ew))
        .select(
            "stratum",
            F.col("n").alias("n_docs"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
                "mean_chars"
            ),
            F.round("nh_sh", 4).alias("neyman_term"),
            F.round(F.col("dh_fx").cast("double") / _DH_FX, 4).alias(
                "dh_objective"
            ),
            F.round(F.col("ew_fx").cast("double") / _DH_FX, 4).alias(
                "equalwidth_objective"
            ),
            F.round(
                F.lit(1.0) - F.col("dh_fx").cast("double") / F.col("ew_fx"), 6
            ).alias("variance_reduction"),
        )
        .orderBy("stratum")
    )

# ---------------------------------------------------------------------------
# q368 — one-way ANOVA F across event types: do the types differ in
# mean daily volume? The parametric companion of q320's rank-based
# Kruskal-Wallis and the cross-type sibling of q294's within-type
# dow eta^2 — between-group SS via the exact integer floor(Sg^2/ng)
# convention, within-group SS by subtraction from exact total
# moments, F and both dfs in one double chain.
# ---------------------------------------------------------------------------
@register(
    "q368_oneway_anova",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
      FROM spans
    ),
    filled AS (
      SELECT a.event_type, COALESCE(d.y, CAST(0 AS BIGINT)) AS y
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(y) AS BIGINT) AS sg,
             CAST(SUM(y * y) AS BIGINT) AS ssg
      FROM filled GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
             CAST(SUM(ssg) AS BIGINT) AS ss,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM((sg * sg) // ng) AS BIGINT) AS sq_over_n
      FROM g
    ),
    f AS (
      SELECT n, k,
             CAST(sq_over_n AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS ssb,
             CAST(ss AS DOUBLE) - sq_over_n AS ssw
      FROM t
    )
    SELECT g.event_type, g.ng AS n_days,
           ROUND(CAST(g.sg AS DOUBLE) / g.ng, 6) AS group_mean,
           ROUND(f.ssb, 4) AS ss_between,
           ROUND(f.ssw, 4) AS ss_within,
           ROUND((f.ssb / (f.k - 1)) / (f.ssw / (f.n - f.k)), 6) AS f_stat,
           CAST(f.k - 1 AS INT) AS df1, CAST(f.n - f.k AS INT) AS df2
    FROM g CROSS JOIN f
    ORDER BY g.event_type
    """,
    doc="one-way ANOVA across event types on gap-filled daily volumes: "
    "between-group SS from the exact integer sum of floor(Sg^2/ng) "
    "(the q294 one-floor-per-group convention) minus S^2/N, "
    "within-group SS by subtraction from exact BIGINT total moments, "
    "F = (SSB/(k-1))/(SSW/(N-k)) with both dfs reported — the "
    "parametric mean-difference test beside q320's rank-based "
    "Kruskal-Wallis (run both: agreement is robustness, disagreement "
    "flags outlier-driven means). One day rollup + two bounded "
    "aggregates",
)
def q368_oneway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    axis = spans.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    filled = axis.join(daily, ["event_type", "day"], "left").select(
        "event_type", F.coalesce("y", F.lit(0).cast("long")).alias("y")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -15% (0.58->0.49)
    g = hold(
        filled.groupBy("event_type").agg(
            F.count("*").cast("long").alias("ng"),
            F.sum("y").cast("long").alias("sg"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("ssg"),
        )
    )
    t = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("ssg").cast("long").alias("ss"),
        F.count("*").cast("long").alias("k"),
        F.sum(F.expr("(sg * sg) div ng")).cast("long").alias("sq_over_n"),
    )
    f = t.select(
        "n",
        "k",
        (
            F.col("sq_over_n").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("ssb"),
        (F.col("ss").cast("double") - F.col("sq_over_n")).alias("ssw"),
    )
    return (
        g.crossJoin(F.broadcast(f))
        .select(
            "event_type",
            F.col("ng").alias("n_days"),
            F.round(F.col("sg").cast("double") / F.col("ng"), 6).alias(
                "group_mean"
            ),
            F.round("ssb", 4).alias("ss_between"),
            F.round("ssw", 4).alias("ss_within"),
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / (F.col("ssw") / (F.col("n") - F.col("k"))),
                6,
            ).alias("f_stat"),
            (F.col("k") - 1).cast("int").alias("df1"),
            (F.col("n") - F.col("k")).cast("int").alias("df2"),
        )
        .orderBy("event_type")
    )
