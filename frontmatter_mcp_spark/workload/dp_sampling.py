"""Sampling family: hash splits, mixtures, DSIR, weighted/stratified sampling, privacy-preserving releases and audits.

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
    _GUMBEL_SPAN,
    _HSQ_RATE,
    _LEN_P_HIGH,
    _LEN_P_LOW,
    _MIN_TOKENS,
    _PII_PATTERNS,
    _SPANS_CTE,
    _SPAN_N,
    _hash_bucket_duck,
    _kish_sql,
    _raking_sql,
)

# ---------------------------------------------------------------------------
# q57 — deterministic hash split + stratified sampling (training-mix ops)
# ---------------------------------------------------------------------------
_SAMPLE_RATES = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 0.8, "zh": 1.0}

def _split_sample_sql() -> str:
    b = _hash_bucket_duck("doc_id")
    keep = " ".join(
        f"WHEN lang = '{name}' THEN {b} < {int(rate * 1000)}"
        for name, rate in sorted(_SAMPLE_RATES.items())
    )
    return f"""
    SELECT doc_id, lang,
           {b} AS bucket,
           CASE WHEN {b} < 800 THEN 'train'
                WHEN {b} < 900 THEN 'val'
                ELSE 'test' END AS split,
           CASE {keep} ELSE FALSE END AS kept
    FROM documents
    """


@register(
    "q57_hash_split_sample",
    _split_sample_sql(),
    doc="stable train/val/test split + per-language stratified sampling by "
    "content hash (rerun/backfill/repartition-invariant, unlike df.sample)",
)
def q57_hash_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as sp

    d = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id")
    return d.select(
        "doc_id",
        "lang",
        sp.hash_bucket(key).alias("bucket"),
        sp.assign_split(key).alias("split"),
        sp.stratified_keep(key, F.col("lang"), _SAMPLE_RATES).alias("kept"),
    )

# ---------------------------------------------------------------------------
# q83 — quota-capped mixture construction (absolute per-source targets)
# ---------------------------------------------------------------------------
_MIX_QUOTAS = {
    **{f"src{i}": 15 for i in range(5)},
    **{f"src{i}": 8 for i in range(5, 10)},
}

_MIX_DEFAULT_QUOTA = 3

def _mixture_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{name}' THEN {n}" for name, n in sorted(_MIX_QUOTAS.items())
    )
    return f"""
    SELECT doc_id, source, mix_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INT) AS mix_rank
      FROM documents
    )
    WHERE mix_rank <= (CASE {cases} ELSE {_MIX_DEFAULT_QUOTA} END)
    """


@register(
    "q83_mixture_quota",
    _mixture_sql(),
    doc="training-mix construction with absolute per-source quotas: "
    "deterministic md5-ordered rank per stratum, kept iff rank <= quota "
    "(rerun/backfill-invariant; mix_rank retained so a tighter quota "
    "needs no resample)",
)
def q83_mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as sp

    d = load_table(spark, sf_dir, "documents")
    return sp.quota_sample(
        d.select("doc_id", "source"), "doc_id", "source",
        _MIX_QUOTAS, default_quota=_MIX_DEFAULT_QUOTA,
    )

# ---------------------------------------------------------------------------
# q95 — training-set manifest: the full cleaning pipeline as ONE plan
# (quality gate + exact-dup keeper rule + split + decontamination)
# ---------------------------------------------------------------------------
def _training_manifest_sql() -> str:
    pii = (
        f"len(regexp_extract_all(text, '{_PII_PATTERNS['n_emails']}')) * 5"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_long_digit_runs']}')) * 3"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_phones']}')) * 4"
    )
    b = _hash_bucket_duck("doc_id")
    return f"""
    WITH stats AS (
      SELECT source,
             quantile_cont(n_chars, {_LEN_P_LOW!r}) AS p_low,
             quantile_cont(n_chars, {_LEN_P_HIGH!r}) AS p_high
      FROM documents GROUP BY source
    ),
    keepers AS (
      SELECT md5(text) AS fp, MIN(doc_id) AS keeper_id
      FROM documents GROUP BY 1
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN {b} < 800 THEN 'train'
                  WHEN {b} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    {_SPANS_CTE},
    test_spans AS (
      SELECT DISTINCT span FROM sp JOIN splits USING (doc_id)
      WHERE split = 'test'
    ),
    contaminated AS (
      SELECT DISTINCT sp.doc_id
      FROM sp JOIN splits USING (doc_id) JOIN test_spans USING (span)
      WHERE split = 'train'
    ),
    verdicts AS (
      SELECT d.doc_id, d.source, splits.split,
             list_filter(
               [
                 CASE WHEN ({pii}) > 0 THEN 'pii_risk' END,
                 CASE WHEN len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                               t -> t <> '')) < {_MIN_TOKENS} THEN 'tiny_doc' END,
                 CASE WHEN d.n_chars < s.p_low THEN 'too_short'
                      WHEN d.n_chars > s.p_high THEN 'too_long' END,
                 CASE WHEN d.doc_id <> k.keeper_id THEN 'exact_dup' END,
                 CASE WHEN c.doc_id IS NOT NULL THEN 'contaminated' END
               ], r -> r IS NOT NULL) AS reasons
      FROM documents d
      JOIN stats s ON s.source = d.source
      JOIN keepers k ON k.fp = md5(d.text)
      JOIN splits ON splits.doc_id = d.doc_id
      LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, source, split,
           len(reasons) = 0 AS included,
           coalesce(array_to_string(list_sort(reasons), ','), '') AS reasons
    FROM verdicts
    """


@register(
    "q95_training_manifest",
    _training_manifest_sql(),
    doc="the full pre-training cleaning pipeline composed as ONE "
    "declarative plan — quality gate (q88: PII + per-source length "
    "fences + tiny docs), exact-dup keeper rule (q30), hash-bucket "
    "split (q57), and train-vs-test span decontamination (q60) — "
    "emitting the final per-doc manifest (split, included, audit "
    "reasons). Catalyst sees one DAG: three aggregates over the corpus "
    "scan (broadcast stats, fingerprint keepers, span sets) feed one "
    "manifest join; at 100 TB the expensive exchanges are the "
    "fingerprint groupBy and the span-key join, both O(corpus), both "
    "map-side-combined — composition adds NO new shuffle class over "
    "running the stages separately",
)
def q95_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    t = F.col("text")

    stats = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(_LEN_P_LOW)).alias("p_low"),
        F.percentile("n_chars", F.lit(_LEN_P_HIGH)).alias("p_high"),
    )
    keepers = d.groupBy(F.md5(t).alias("fp")).agg(F.min("doc_id").alias("keeper_id"))

    splits = d.select("doc_id", smp.assign_split(F.col("doc_id")).alias("split"))
    spans = d.select(
        "doc_id", F.explode(dd.word_shingles(t, _SPAN_N)).alias("span")
    ).join(splits, "doc_id")
    test_spans = spans.filter(F.col("split") == "test").select("span").distinct()
    contaminated = (
        spans.filter(F.col("split") == "train")
        .join(test_spans, "span")
        .select("doc_id")
        .distinct()
        .withColumn("__contam", F.lit(1))
    )

    risk = (
        F.regexp_count(t, F.lit(_PII_PATTERNS["n_emails"])) * 5
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_long_digit_runs"])) * 3
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_phones"])) * 4
    )
    n_tokens = F.size(F.filter(F.split(F.trim(t), r"\s+", -1), lambda x: x != F.lit("")))
    reasons = F.array_sort(
        F.filter(
            F.array(
                F.when(risk > 0, F.lit("pii_risk")),
                F.when(n_tokens < _MIN_TOKENS, F.lit("tiny_doc")),
                F.when(F.col("n_chars") < F.col("p_low"), F.lit("too_short")).when(
                    F.col("n_chars") > F.col("p_high"), F.lit("too_long")
                ),
                F.when(F.col("doc_id") != F.col("keeper_id"), F.lit("exact_dup")),
                F.when(F.col("__contam").isNotNull(), F.lit("contaminated")),
            ),
            lambda r: r.isNotNull(),
        )
    )
    return (
        d.join(F.broadcast(stats), "source")
        .withColumn("fp", F.md5(t))
        .join(keepers, "fp")
        .join(splits, "doc_id")
        .join(contaminated, "doc_id", "left")
        .select("doc_id", "source", "split", reasons.alias("reasons"))
        .select(
            "doc_id",
            "source",
            "split",
            (F.size("reasons") == 0).alias("included"),
            F.array_join("reasons", ",").alias("reasons"),
        )
    )

# ---------------------------------------------------------------------------
# q97 — DSIR importance weights (hashed n-gram target-vs-raw log-ratios)
# ---------------------------------------------------------------------------
_DSIR_BUCKETS = 1024

def _dsir_ctes(buckets: int = _DSIR_BUCKETS) -> str:
    b = _hash_bucket_duck("f", buckets)
    return f"""toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    feats0 AS (
      SELECT doc_id, lang, unnest(w) AS f FROM toks
      UNION ALL
      SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS f
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    feats AS (SELECT doc_id, lang = 'en' AS is_t, {b} AS b FROM feats0),
    stats AS (
      SELECT b, COUNT(*) AS r, COUNT(*) FILTER (is_t) AS t
      FROM feats GROUP BY 1
    ),
    tot AS (SELECT SUM(r) AS r_total, SUM(t) AS t_total FROM stats),
    ratio AS (
      SELECT b,
             ln(t + 1) - ln(CAST(t_total + {buckets} AS DOUBLE))
             - ln(r + 1) + ln(CAST(r_total + {buckets} AS DOUBLE)) AS logratio
      FROM stats CROSS JOIN tot
    ),
    dtf AS (SELECT doc_id, b, COUNT(*) AS tf FROM feats GROUP BY 1, 2),
    terms AS (
      SELECT doc_id, tf, CAST(logratio * tf AS DECIMAL(28,12)) AS w_term
      FROM dtf JOIN ratio USING (b)
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(tf) AS INT) AS n_features,
             ROUND(CAST(SUM(w_term) AS DOUBLE), 6) AS dsir_weight
      FROM terms GROUP BY 1
    )"""

def _dsir_sql(buckets: int = _DSIR_BUCKETS) -> str:
    return f"""
    WITH {_dsir_ctes(buckets)}
    SELECT d.doc_id, COALESCE(agg.n_features, 0) AS n_features, agg.dsir_weight
    FROM documents d LEFT JOIN agg USING (doc_id)
    """


@register(
    "q97_dsir_weights",
    _dsir_sql(),
    doc="DSIR data selection (Xie et al. 2023): per-doc importance "
    "weight = sum over hashed unigram+bigram feature occurrences of the "
    "smoothed target-vs-raw bucket log-ratio (target = lang='en'). The "
    "importance-resampling stage that biases a 100 TB training mix "
    "toward a curated target distribution. One feature explode, two "
    "map-side-combined aggregates, a B-row broadcast ratio table, a "
    "one-row broadcast for the totals — no shuffle wider than the "
    "(doc, bucket) tf rows",
)
def q97_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # the (doc, bucket) tf aggregate feeds both the bucket-stats branch
    # and the per-doc weight join with DIFFERENT projections (defeats
    # exchange canonicalization) — pin it so the corpus explodes once
    dtf = hold(
        tx.dsir_doc_bucket_tf(
            d, "doc_id", "text", target=F.col("lang") == "en", buckets=_DSIR_BUCKETS
        )
    )
    return tx.dsir_weights_from_tf(d, dtf, "doc_id", buckets=_DSIR_BUCKETS)

# ---------------------------------------------------------------------------
# q100 — DSIR importance RESAMPLING: Gumbel-top-k selection over q97 weights
# ---------------------------------------------------------------------------
_DSIR_TOPK = 100

def _dsir_resample_sql() -> str:
    h7 = _hash_bucket_duck("doc_id", _GUMBEL_SPAN)
    return f"""
    WITH {_dsir_ctes()},
    scored AS (
      SELECT doc_id, dsir_weight,
             ROUND(dsir_weight
                   + (-ln(-ln(({h7} + 0.5) / {float(_GUMBEL_SPAN)!r}))),
                   6) AS gumbel_score
      FROM agg WHERE n_features > 0
    )
    SELECT doc_id, dsir_weight, gumbel_score
    FROM scored ORDER BY gumbel_score DESC, doc_id LIMIT {_DSIR_TOPK}
    """


@register(
    "q100_dsir_resample",
    _dsir_resample_sql(),
    doc="the selection half of DSIR: sample top_k docs without "
    "replacement with probability proportional to exp(importance "
    "weight) via Gumbel-top-k — the noise is derandomized from the md5 "
    "of the doc id, so reruns and the oracle agree exactly. Adds one "
    "narrow map + a TakeOrderedAndProject over the q97 weight plan",
)
def q100_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    dtf = pin(
        tx.dsir_doc_bucket_tf(
            d, "doc_id", "text", target=F.col("lang") == "en", buckets=_DSIR_BUCKETS
        )
    )
    return tx.dsir_resample(
        d, dtf, "doc_id", top_k=_DSIR_TOPK, buckets=_DSIR_BUCKETS
    )

# ---------------------------------------------------------------------------
# q103 — temperature-flattened source mixture (mT5-style, alpha = 0.5)
# ---------------------------------------------------------------------------
_TEMP_TARGET = 200

_TEMP_BUCKETS = 1000

def _temp_mixture_sql() -> str:
    b = _hash_bucket_duck("d.doc_id", _TEMP_BUCKETS)
    qs = "CAST(sqrtp AS DOUBLE) / CAST(dn AS DOUBLE)"
    return f"""
    WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    sq AS (
      SELECT source, n_docs,
             CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1073741824.0)
                  AS DECIMAL(38,0)) AS sqrtp
      FROM counts
    ),
    denom AS (SELECT SUM(sqrtp) AS dn FROM sq),
    rates AS (
      SELECT source, n_docs, {qs} AS q_share,
             CAST(FLOOR({_TEMP_BUCKETS} * LEAST(1.0,
                    {float(_TEMP_TARGET)!r} * ({qs}) / CAST(n_docs AS DOUBLE)))
                  AS INT) AS keep_bucket
      FROM sq CROSS JOIN denom
    ),
    kept AS (
      SELECT d.source,
             SUM(CASE WHEN {b} < r.keep_bucket THEN 1 ELSE 0 END) AS n_kept
      FROM documents d JOIN rates r USING (source) GROUP BY 1
    )
    SELECT r.source, CAST(r.n_docs AS INT) AS n_docs,
           ROUND(r.q_share, 6) AS q_share, r.keep_bucket,
           CAST(k.n_kept AS INT) AS n_kept
    FROM rates r JOIN kept k USING (source)
    """


@register(
    "q103_temperature_mixture",
    _temp_mixture_sql(),
    doc="temperature-flattened training mix (mT5/XLM-R, alpha=0.5): "
    "stratum share q = sqrt(n)/sum(sqrt(n)) downsamples dominant "
    "sources and upweights rare ones; each source keeps its first "
    "floor(B * min(1, T*q/n)) hash buckets. alpha is FIXED at 0.5 "
    "because IEEE sqrt is correctly rounded (bit-portable) where "
    "general pow is not. One histogram aggregate + broadcast rate "
    "table + narrow hash keep — the corpus never shuffles",
)
def q103_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return smp.sqrt_temperature_mixture(
        d, "doc_id", "source", target_total=_TEMP_TARGET, buckets=_TEMP_BUCKETS
    )

# ---------------------------------------------------------------------------
# q106 — token-budget mixture: per-source quota in TOKENS (q83's rank
# discipline with running sums)
# ---------------------------------------------------------------------------
_TOKEN_BUDGET = 2000


@register(
    "q106_token_budget_mixture",
    f"""
    WITH base AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
             CAST(SUM(n_tokens) OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM base
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           cum_tokens <= {_TOKEN_BUDGET} AS kept
    FROM c
    """,
    doc="token-budget mixture: each source keeps its first docs (md5 "
    "order) whose running TOKEN total fits the budget — training mixes "
    "are budgeted in tokens, not documents. Two-phase running sums "
    "(per-(source, md5-prefix) window + broadcast prefix offsets) "
    "reconstruct the exact global cumsum with no single-task stratum "
    "sort; the oracle's one straight window is byte-identical",
)
def q106_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    base = d.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    )
    return smp.token_budget_mixture(
        base, "doc_id", "source", "n_tokens", budget=_TOKEN_BUDGET
    )

# ---------------------------------------------------------------------------
# q110 — training-shard manifest: deterministic global shuffle into
# fixed-capacity shards (the export stage of the cleaning pipeline)
# ---------------------------------------------------------------------------
_SHARD_SIZE = 64


@register(
    "q110_shard_manifest",
    f"""
    WITH base AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS ok,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS n_toks,
             octet_length(encode(text)) AS n_byt
      FROM documents
    ),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY ok, doc_id) AS rn FROM base),
    s AS (SELECT *, CAST(FLOOR((rn - 1) / {_SHARD_SIZE}.0) AS INT) AS shard_id
          FROM r)
    SELECT shard_id, CAST(COUNT(*) AS INT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(n_byt) AS BIGINT) AS n_bytes,
           MIN(ok) AS first_key, MAX(ok) AS last_key,
           md5(string_agg(ok, '' ORDER BY ok, doc_id)) AS checksum
    FROM s GROUP BY shard_id
    """,
    doc="training-shard manifest: documents deterministically shuffled "
    "(md5 order) into fixed-capacity shards with per-shard doc/token/"
    "byte totals, key ranges, and an order-sensitive member checksum — "
    "the export stage a trainer streams. Global position via the "
    "two-phase rank (local row_number within a 2-hex md5 prefix + "
    "broadcast prefix-count offsets), so no task ever sorts the corpus; "
    "the checksum concatenation is bounded by the shard capacity. The "
    "oracle's single ROW_NUMBER window is byte-identical",
)
def q110_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    base = d.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n_toks"),
        F.octet_length("text").alias("n_byt"),
    )
    return smp.shard_manifest(
        base, "doc_id", "n_toks", "n_byt", shard_size=_SHARD_SIZE
    )


@register(
    "q127_raking_mixture",
    _raking_sql("documents", "//"),
    doc="multi-constraint mixture balancing by raking (iterative "
    "proportional fitting): per-(lang, source) sampling weights fitted "
    "so the weighted corpus hits the language AND source target "
    "marginals simultaneously (equal-share targets here) — two full "
    "IPF sweeps in exact scaled-integer floor division, replayed "
    "identically by both engines from one SQL template. The corpus is "
    "touched ONCE (the cell-count aggregate); every later step runs on "
    "the |langs| x |sources| cell table",
)
def q127_raking_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_q127")
    return spark.sql(_raking_sql("documents_q127", " div "))

# ---------------------------------------------------------------------------
# q156 — deterministic Poisson bootstrap: a confidence interval for a
# corpus metric (mean tokens/doc) without resampling shuffles — each of
# B replicates weights every row by a Poisson(1) draw derandomized from
# md5(doc, replicate), the distributed-bootstrap standard (a true
# resample would need a corpus-sized shuffle per replicate; Poisson
# weights need one pass). The Poisson inverse-CDF thresholds are
# PRECOMPUTED integer literals (2^20 fixed point), so the draw is pure
# integer comparison — engine-exact.
# ---------------------------------------------------------------------------
_BOOT_B = 32

_BOOT_FX = 1 << 20

# cumulative Poisson(1) CDF * 2^20, floored (k = 0..7; residual mass
# beyond 7 is < 1e-4 and maps to weight 8)
_BOOT_CDF_FX = [385749, 771499, 964373, 1028665, 1044738, 1047952, 1048488, 1048565]

def _boot_weight(u: str) -> str:
    """Poisson(1) draw from a 20-bit uniform: integer threshold chain."""
    clauses = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_CDF_FX)
    )
    return f"CASE {clauses} ELSE {len(_BOOT_CDF_FX)} END"

def _bootstrap_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    u = hash_bucket_sql(
        "CAST(doc_id AS VARCHAR) || '|' || CAST(b AS VARCHAR)", _BOOT_FX
    )
    w = _boot_weight(f"({u})")
    return f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ),
    reps AS (
      SELECT b, CAST(SUM({w} * nt) AS BIGINT) AS s,
             CAST(SUM({w}) AS BIGINT) AS n
      FROM toks CROSS JOIN UNNEST(generate_series(0, {_BOOT_B - 1})) AS g(b)
      GROUP BY 1
    ),
    means AS (
      SELECT b, CAST(s AS DOUBLE) / n AS m FROM reps WHERE n > 0
    ),
    pt AS (
      SELECT CAST(SUM(nt) AS DOUBLE) / COUNT(*) AS point_mean FROM toks
    )
    SELECT round(pt.point_mean, 6) AS point_mean,
           CAST(COUNT(*) AS INT) AS n_replicates,
           round(quantile_cont(m, 0.25), 6) AS boot_p25,
           round(quantile_cont(m, 0.5), 6) AS boot_median,
           round(quantile_cont(m, 0.75), 6) AS boot_p75,
           round(MIN(m), 6) AS boot_min, round(MAX(m), 6) AS boot_max
    FROM means CROSS JOIN pt
    GROUP BY pt.point_mean
    """


@register(
    "q156_bootstrap_ci",
    _bootstrap_sql(),
    doc="deterministic Poisson bootstrap for a corpus metric (mean "
    "tokens/doc): B=32 replicates weight each row by a Poisson(1) draw "
    "derandomized from md5(doc, replicate) — the distributed-bootstrap "
    "standard (one pass; a true resample would shuffle the corpus per "
    "replicate). Inverse-CDF thresholds are precomputed integer "
    "literals, so draws are pure integer comparisons; replicate sums "
    "are exact BIGINTs; the spread quartiles use the q24 percentile "
    "identity. The error bars a data-quality dashboard should show "
    "next to every corpus statistic",
)
def q156_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    nt = F.size(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                 lambda t: t != "")
    ).cast("long")
    toks = pin(d.select("doc_id", nt.alias("nt")))
    reps_in = toks.crossJoin(
        F.broadcast(
            d.sparkSession.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
        )
    )
    u = hash_bucket(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("b").cast("string")),
        _BOOT_FX,
    )
    w = F.expr(_boot_weight("u"))
    reps = (
        reps_in.withColumn("u", u)
        .withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("nt")).cast("long").alias("s"),
            F.sum("w").cast("long").alias("n"),
        )
        .filter(F.col("n") > 0)
        .select("b", (F.col("s").cast("double") / F.col("n")).alias("m"))
    )
    pt = toks.agg(
        (F.sum("nt").cast("double") / F.count("*")).alias("point_mean")
    )
    return reps.crossJoin(F.broadcast(pt)).groupBy("point_mean").agg(
        F.count("*").cast("int").alias("n_replicates"),
        F.round(F.percentile("m", 0.25), 6).alias("boot_p25"),
        F.round(F.percentile("m", 0.5), 6).alias("boot_median"),
        F.round(F.percentile("m", 0.75), 6).alias("boot_p75"),
        F.round(F.min("m"), 6).alias("boot_min"),
        F.round(F.max("m"), 6).alias("boot_max"),
    ).select(
        F.round("point_mean", 6).alias("point_mean"),
        "n_replicates", "boot_p25", "boot_median", "boot_p75",
        "boot_min", "boot_max",
    )

# ---------------------------------------------------------------------------
# q161 — Neyman-allocation stratified sampling: the survey-grade
# upgrade over proportional quotas (q83/q103) — each stratum's sample
# share is proportional to N_h * S_h, so high-variance strata get more
# budget (minimum-variance estimator for a fixed budget). Integer-exact
# moments, Hamilton largest-remainder rounding so the quotas sum to the
# budget EXACTLY, md5-order selection.
# ---------------------------------------------------------------------------
_NEYMAN_BUDGET = 200

def _neyman_sd(n: str, s1: str, s2: str) -> str:
    """Sample stddev from integer moments — identical text both
    engines: sqrt((sum_sq - sum^2/n) / (n - 1)); degenerate strata
    (n = 1) contribute zero weight."""
    return (
        f"CASE WHEN {n} > 1 THEN sqrt((CAST({s2} AS DOUBLE)"
        f" - CAST({s1} AS DOUBLE) * {s1} / {n}) / ({n} - 1)) ELSE 0e0 END"
    )

def _neyman_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b = _NEYMAN_BUDGET
    sd = _neyman_sd("n_h", "s1", "s2")
    return f"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ),
    st AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(nt) AS BIGINT) AS s1,
             CAST(SUM(nt * nt) AS BIGINT) AS s2
      FROM toks GROUP BY 1
    ),
    w AS (
      SELECT source, n_h, s1, s2, ({sd}) AS sd_h,
             n_h * ({sd}) AS wgt,
             SUM(n_h * ({sd})) OVER () AS tot_w
      FROM st
    ),
    quota AS (
      SELECT source, n_h, s1, sd_h,
             {b} * wgt / tot_w AS q,
             CAST(FLOOR({b} * wgt / tot_w) AS BIGINT) AS fl,
             {b} * wgt / tot_w - FLOOR({b} * wgt / tot_w) AS rem
      FROM w
    ),
    alloc AS (
      SELECT source, n_h, s1, sd_h,
             fl + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       <= {b} - (SELECT SUM(fl) FROM quota)
                  THEN 1 ELSE 0 END AS n_alloc
      FROM quota
    ),
    ranked AS (
      SELECT t.source, t.nt,
             ROW_NUMBER() OVER (PARTITION BY t.source
                                ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id)
               AS rnk
      FROM toks t
    ),
    sample_ AS (
      SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(r.nt) AS BIGINT) AS s_nt
      FROM ranked r JOIN alloc a ON a.source = r.source AND r.rnk <= a.n_alloc
      GROUP BY 1
    )
    SELECT a.source, a.n_h, round(CAST(a.s1 AS DOUBLE) / a.n_h, 6) AS mean_h,
           round(a.sd_h, 6) AS sd_h, CAST(a.n_alloc AS INT) AS n_alloc,
           s.n_sampled,
           round(CAST(s.s_nt AS DOUBLE) / s.n_sampled, 6) AS sample_mean
    FROM alloc a JOIN sample_ s ON s.source = a.source
    """


@register(
    "q161_neyman_allocation",
    _neyman_sql(),
    doc="Neyman-allocation stratified sampling: per-source budget shares "
    "proportional to N_h * S_h (the minimum-variance allocation for a "
    "fixed budget — high-variance strata earn more samples than "
    "proportional quotas give them), with stddev from integer-exact "
    "moments, Hamilton largest-remainder rounding so quotas sum to the "
    "budget exactly, and md5-order deterministic selection. One corpus "
    "scan for moments + one for selection (both pinned); everything "
    "between runs on the |sources|-row table",
)
def q161_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    b = _NEYMAN_BUDGET
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    nt = F.size(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                 lambda t: t != "")
    ).cast("long")
    toks = hold(d.select("doc_id", "source", nt.alias("nt")))
    st = toks.groupBy("source").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("nt").cast("long").alias("s1"),
        F.sum(F.col("nt") * F.col("nt")).cast("long").alias("s2"),
    )
    sd = _neyman_sd("n_h", "s1", "s2")
    w = st.selectExpr(
        "source", "n_h", "s1", "s2", f"({sd}) AS sd_h", f"n_h * ({sd}) AS wgt"
    ).withColumn("tot_w", F.sum("wgt").over(W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)))
    quota = w.selectExpr(
        "source", "n_h", "s1", "sd_h",
        f"CAST(FLOOR({b} * wgt / tot_w) AS BIGINT) AS fl",
        f"{b} * wgt / tot_w - FLOOR({b} * wgt / tot_w) AS rem",
    )
    tot_fl = quota.agg(F.sum("fl").alias("tf"))
    rnk = W.orderBy(F.col("rem").desc(), "source")
    alloc = hold(
        quota.crossJoin(F.broadcast(tot_fl))
        .withColumn("rr", F.row_number().over(rnk))
        .selectExpr(
            "source", "n_h", "s1", "sd_h",
            f"fl + CASE WHEN rr <= {b} - tf THEN 1 ELSE 0 END AS n_alloc",
        )
    )
    sel_rnk = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = toks.withColumn("rnk", F.row_number().over(sel_rnk))
    sample_ = (
        ranked.join(F.broadcast(alloc.select("source", "n_alloc")), "source")
        .filter(F.col("rnk") <= F.col("n_alloc"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("nt").cast("long").alias("s_nt"),
        )
    )
    return alloc.join(sample_, "source").selectExpr(
        "source", "n_h",
        "round(CAST(s1 AS DOUBLE) / n_h, 6) AS mean_h",
        "round(sd_h, 6) AS sd_h",
        "CAST(n_alloc AS INT) AS n_alloc",
        "n_sampled",
        "round(CAST(s_nt AS DOUBLE) / n_sampled, 6) AS sample_mean",
    )

# ---------------------------------------------------------------------------
# q171 — curriculum schedule: the training-loader's data ORDER as a
# first-class artifact — stages by ascending LM difficulty (easy-first
# curriculum), deterministic hash shuffle within each stage
# ---------------------------------------------------------------------------
@register(
    "q171_curriculum_schedule",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT doc_id, unnest(w) AS term FROM toks),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    vocab AS (SELECT term, SUM(tf) AS c FROM tf GROUP BY 1),
    tot AS (SELECT SUM(c) AS n_total FROM vocab),
    terms AS (
      SELECT doc_id, tf,
             CAST((ln(CAST(n_total AS DOUBLE)) - ln(CAST(c AS DOUBLE))) * tf
                  AS DECIMAL(28,12)) AS nll_term
      FROM tf JOIN vocab USING (term) CROSS JOIN tot
    ),
    agg AS (
      SELECT doc_id, CAST(SUM(nll_term) AS DOUBLE) / SUM(tf) AS nll_mean
      FROM terms GROUP BY 1
    ),
    staged AS (
      SELECT doc_id, nll_mean,
             NTILE(3) OVER (ORDER BY nll_mean, doc_id) AS stage
      FROM agg
    )
    SELECT doc_id, CAST(stage AS INT) AS stage,
           ROUND(nll_mean, 6) AS difficulty,
           CAST(ROW_NUMBER() OVER (
             ORDER BY stage, md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
             AS sched_order
    FROM staged
    """,
    doc="easy-first curriculum schedule: documents staged into "
    "difficulty tertiles by q94's unigram-LM score (decimal-exact, so "
    "the tertile cut is deterministic), then hash-shuffled WITHIN each "
    "stage (md5 of doc_id — the deterministic shuffle every epoch-"
    "reproducible loader uses) into one global training order. The "
    "result is the loader manifest: (doc, stage, difficulty, position). "
    "One term shuffle for the LM, one rank for the schedule; at 100 TB "
    "the global row_number becomes a per-range offset sum (the q83 "
    "two-phase rank), same plan otherwise",
)
def q171_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.total_order import (
        hex_prefix_bucket,
        ntile_from_rn,
        with_global_row_number,
    )

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # Both the tertile cut and the schedule position were corpus-wide
    # single-partition windows. Pin the per-doc difficulty table once
    # (the unigram-LM term shuffle runs once), then: stage from the
    # two-phase global rank + exact NTILE formula; sched_order from a
    # second two-phase rank whose explicit monotone bucket composes the
    # stage with the shuffle key's 2-hex md5 prefix.
    nll = hold(
        tx.unigram_nll(d, "doc_id", "text").filter(F.col("nll_mean").isNotNull())
    )
    staged = (
        with_global_row_number(
            nll,
            [("nll_mean", True), ("doc_id", True)],
            out="__rn",
            total_out="__n",
        )
        .withColumn("stage", ntile_from_rn(F.col("__rn"), F.col("__n"), 3))
        .drop("__rn", "__n")
        .withColumn("__sk", F.md5(F.col("doc_id").cast("string")))
    )
    sched = with_global_row_number(
        staged,
        [("stage", True), ("__sk", True), ("doc_id", True)],
        out="sched_order",
        bucket=(F.col("stage").cast("long") - 1) * 256
        + hex_prefix_bucket(F.col("__sk")),
    )
    return sched.select(
        "doc_id",
        F.col("stage").cast("int").alias("stage"),
        F.round("nll_mean", 6).alias("difficulty"),
        "sched_order",
    )

# ---------------------------------------------------------------------------
# q190 — sample-estimated percentile fences: q85's length gate driven by
# q170's deterministic 5% md5 sample instead of a full-data percentile
# pass, with exact-fence agreement accounting — the production shape at
# 100 TB (fence estimation touches 5% of rows; the corpus pays one
# narrow gating scan against a broadcast fence table)
# ---------------------------------------------------------------------------
def _q190_sql() -> str:
    b = _hash_bucket_duck("doc_id", 1000)
    return f"""
    WITH stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) FILTER (WHERE {b} < {_HSQ_RATE}) AS BIGINT)
               AS n_sample,
             quantile_cont(n_chars, {_LEN_P_LOW!r})
               FILTER (WHERE {b} < {_HSQ_RATE}) AS s_low,
             quantile_cont(n_chars, {_LEN_P_HIGH!r})
               FILTER (WHERE {b} < {_HSQ_RATE}) AS s_high,
             quantile_cont(n_chars, {_LEN_P_LOW!r}) AS e_low,
             quantile_cont(n_chars, {_LEN_P_HIGH!r}) AS e_high
      FROM documents GROUP BY source
    ),
    gated AS (
      SELECT d.source,
             COALESCE(d.n_chars < s.s_low OR d.n_chars > s.s_high, FALSE)
               AS flag_s,
             (d.n_chars < s.e_low OR d.n_chars > s.e_high) AS flag_e
      FROM documents d JOIN stats s USING (source)
    ),
    counts AS (
      SELECT source,
             CAST(SUM(CASE WHEN flag_s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flag_sample,
             CAST(SUM(CASE WHEN flag_e THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flag_exact,
             CAST(SUM(CASE WHEN flag_s AND NOT flag_e THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_only_sample,
             CAST(SUM(CASE WHEN flag_e AND NOT flag_s THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_only_exact
      FROM gated GROUP BY source
    )
    SELECT s.source, s.n_total, s.n_sample,
           CAST(FLOOR(s.s_low * 32e0) AS BIGINT) AS sample_low_fx32,
           CAST(FLOOR(s.s_high * 32e0) AS BIGINT) AS sample_high_fx32,
           CAST(FLOOR(s.e_low * 32e0) AS BIGINT) AS exact_low_fx32,
           CAST(FLOOR(s.e_high * 32e0) AS BIGINT) AS exact_high_fx32,
           c.n_flag_sample, c.n_flag_exact, c.n_only_sample, c.n_only_exact
    FROM stats s JOIN counts c USING (source)
    ORDER BY s.source
    """


@register(
    "q190_sample_fence_gate",
    _q190_sql(),
    doc="sample-estimated outlier fences: per-source length fences at "
    "the q85 binary-fraction percentiles, estimated from q170's "
    "deterministic 5% md5-bucket sample, applied to the WHOLE corpus, "
    "with per-source agreement accounting vs the exact fences "
    "(only-sample / only-exact disagreement counts quantify what the "
    "cheap estimate costs). Both engines draw the identical sample and "
    "interpolate at exact binary fractions over integers, so fences and "
    "counts hash-match. Plan: one stats aggregate (sample + exact "
    "percentiles share the scan), fences broadcast back, one "
    "map-side-combined gating aggregate. At 100 TB the exact columns "
    "drop and fence estimation reads 5% of the data",
)
def q190_sample_fence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    in_sample = hash_bucket(F.col("doc_id"), 1000) < _HSQ_RATE
    sampled = F.when(in_sample, F.col("n_chars"))
    stats = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum(in_sample.cast("long")).cast("long").alias("n_sample"),
        F.percentile(sampled, F.lit(_LEN_P_LOW)).alias("s_low"),
        F.percentile(sampled, F.lit(_LEN_P_HIGH)).alias("s_high"),
        F.percentile("n_chars", F.lit(_LEN_P_LOW)).alias("e_low"),
        F.percentile("n_chars", F.lit(_LEN_P_HIGH)).alias("e_high"),
    )
    # a source with zero sampled rows has NULL sample fences -> no fence
    flag_s = F.coalesce(
        (F.col("n_chars") < F.col("s_low")) | (F.col("n_chars") > F.col("s_high")),
        F.lit(False),
    )
    flag_e = (F.col("n_chars") < F.col("e_low")) | (F.col("n_chars") > F.col("e_high"))
    counts = (
        d.join(F.broadcast(stats.select("source", "s_low", "s_high", "e_low", "e_high")), "source")
        .groupBy("source")
        .agg(
            F.sum(flag_s.cast("long")).cast("long").alias("n_flag_sample"),
            F.sum(flag_e.cast("long")).cast("long").alias("n_flag_exact"),
            F.sum((flag_s & ~flag_e).cast("long")).cast("long").alias("n_only_sample"),
            F.sum((flag_e & ~flag_s).cast("long")).cast("long").alias("n_only_exact"),
        )
    )
    return (
        stats.join(counts, "source")
        .select(
            "source",
            "n_total",
            "n_sample",
            # 32nds fixed-point: fences interpolate integers at 1/32
            # binary fractions, so x*32 is an exact dyadic integer; the
            # ROUND(x, 4) form hit exact .5 boundaries (1/32*1e4=312.5)
            # at sf0.01 (r11 boundary audit)
            F.floor(F.col("s_low") * 32.0).cast("long").alias("sample_low_fx32"),
            F.floor(F.col("s_high") * 32.0).cast("long").alias("sample_high_fx32"),
            F.floor(F.col("e_low") * 32.0).cast("long").alias("exact_low_fx32"),
            F.floor(F.col("e_high") * 32.0).cast("long").alias("exact_high_fx32"),
            "n_flag_sample",
            "n_flag_exact",
            "n_only_sample",
            "n_only_exact",
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q202 — differentially-private release of the (lang, source) census:
# epsilon=1 Laplace noise DERANDOMIZED from the cell key's md5 (the
# q125/q131 derandomization discipline applied to the privacy layer) —
# reruns release identical noise, and the oracle replays the exact
# inverse-CDF draw so the noisy release itself hash-verifies
# ---------------------------------------------------------------------------
_DP_HEX_DIGITS = 12  # 48 bits of uniform

def _dp_uniform_sql(key: str) -> str:
    expr = "CAST(0 AS BIGINT)"
    for i in range(1, _DP_HEX_DIGITS + 1):
        expr = (
            f"({expr}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5({key}), {i}, 1)) - 1)"
        )
    return f"(CAST(({expr}) AS DOUBLE) + 0.5e0) / {float(16 ** _DP_HEX_DIGITS)!r}"


@register(
    "q202_dp_release",
    f"""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    drawn AS (
      SELECT lang, source, n,
             {_dp_uniform_sql("'dp|' || lang || '|' || source")} AS u
      FROM cells
    ),
    noised AS (
      SELECT lang, source, n,
             ROUND(CASE WHEN u < 0.5e0 THEN ln(2e0 * u)
                        ELSE -ln(2e0 * (1e0 - u)) END, 6) AS noise
      FROM drawn
    )
    SELECT lang, source, n AS true_n,
           GREATEST(CAST(FLOOR(n + noise + 0.5e0) AS BIGINT),
                    CAST(0 AS BIGINT)) AS released_n,
           ABS(GREATEST(CAST(FLOOR(n + noise + 0.5e0) AS BIGINT),
                        CAST(0 AS BIGINT)) - n) AS abs_err
    FROM noised ORDER BY lang, source
    """,
    doc="epsilon=1 differentially-private census release over the "
    "(lang, source) cells: Laplace noise via the inverse CDF on a "
    "48-bit uniform derived from md5 of the cell key — deterministic, "
    "so backfills release the same table and the driver can hash-check "
    "the privacy layer itself (the true_n audit column is the part a "
    "real release drops; the per-cell draw is what a production system "
    "seeds from a private key instead). Noise quantizes to 6 decimals "
    "before the floor(x+0.5) integer rounding (half-up on both "
    "engines, unlike bare round()). One aggregate, then narrow codegen",
)
def q202_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    h = F.md5(F.concat(F.lit("dp|"), F.col("lang"), F.lit("|"), F.col("source")))
    u = (
        F.conv(F.substring(h, 1, _DP_HEX_DIGITS), 16, 10).cast("double")
        + 0.5
    ) / float(16 ** _DP_HEX_DIGITS)
    noise = F.round(
        F.when(u < 0.5, F.log(2.0 * u)).otherwise(-F.log(2.0 * (1.0 - u))), 6
    )
    released = F.greatest(
        F.floor(F.col("n") + noise + 0.5).cast("long"), F.lit(0).cast("long")
    )
    return cells.select(
        "lang",
        "source",
        F.col("n").alias("true_n"),
        released.alias("released_n"),
        F.abs(released - F.col("n")).alias("abs_err"),
    ).orderBy("lang", "source")

# ---------------------------------------------------------------------------
# q213 — right-to-be-forgotten impact audit: a deterministic 1% subject
# cohort (the q57 hash split as the deletion queue) traced through
# every table that references the user key — row counts, distinct
# subjects touched, and revenue at stake per table, BEFORE any delete
# runs. The cascade plan every GDPR workflow reviews first
# ---------------------------------------------------------------------------
def _gdpr_sql() -> str:
    b = _hash_bucket_duck("user_id", 100)
    bc = _hash_bucket_duck("o_custkey", 100)
    return f"""
    WITH subjects AS (
      SELECT DISTINCT user_id FROM events WHERE {b} = 0
    ),
    ev AS (
      SELECT 'events' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_subjects,
             CAST(SUM(CASE WHEN e.event_type = 'purchase'
                           THEN CAST(e.value AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END)
                  AS DOUBLE) AS revenue_at_stake
      FROM events e JOIN subjects s ON s.user_id = e.user_id
    ),
    od AS (
      SELECT 'orders' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_subjects,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue_at_stake
      FROM orders o WHERE {bc} = 0
    ),
    li AS (
      SELECT 'lineitem' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_subjects,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue_at_stake
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE {bc} = 0
    )
    SELECT table_name, n_rows, n_subjects, ROUND(revenue_at_stake, 4)
             AS revenue_at_stake
    FROM (SELECT * FROM ev UNION ALL SELECT * FROM od
          UNION ALL SELECT * FROM li)
    ORDER BY table_name
    """


@register(
    "q213_gdpr_impact",
    _gdpr_sql(),
    doc="deletion-impact audit for a deterministic 1% md5 subject "
    "cohort: per referencing table (events directly; orders and its "
    "lineitem cascade via the same bucket rule on o_custkey — the "
    "shared customer-key domain), the rows that would be tombstoned, "
    "distinct subjects involved, and decimal-exact revenue at stake. "
    "The subject predicate is a pure hash of the key, so it pushes "
    "into each scan (no subject-list shuffle for the orders side; "
    "events joins the distinct-subject broadcast). At 100 TB this is "
    "three independent scans + one orderkey join — the audit costs "
    "what the tables cost to read, nothing more",
)
def q213_gdpr_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    subjects = e.filter(hash_bucket(F.col("user_id"), 100) == 0).select(
        "user_id"
    ).distinct()
    zero6 = F.lit(0).cast("decimal(18,6)")
    ev = e.join(F.broadcast(subjects), "user_id").agg(
        F.lit("events").alias("table_name"),
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_subjects"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(zero6)
        )
        .cast("double")
        .alias("revenue_at_stake"),
    )
    omask = hash_bucket(F.col("o_custkey"), 100) == 0
    od = o.filter(omask).agg(
        F.lit("orders").alias("table_name"),
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_subjects"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue_at_stake"),
    )
    lj = li.join(
        o.filter(omask).select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).agg(
        F.lit("lineitem").alias("table_name"),
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_subjects"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue_at_stake"),
    )
    return (
        ev.unionAll(od)
        .unionAll(lj)
        .select(
            "table_name",
            "n_rows",
            "n_subjects",
            F.round("revenue_at_stake", 4).alias("revenue_at_stake"),
        )
        .orderBy("table_name")
    )


@register(
    "q214_kish_design_effect",
    _kish_sql("documents", "//"),
    doc="Kish effective sample size for the raked mixture: n_eff = "
    "(sum w)^2 / sum w^2 over per-document weights (cells expand by "
    "their exact integer counts — sums stay BIGINT; only the final "
    "ratio and the weight coefficient of variation touch doubles, "
    "with magnitudes safely under 2^53), design effect n/n_eff, and "
    "cv = sqrt(n*sw2/sw^2 - 1). Shares q127's one-corpus-scan IPF "
    "chain via the same two-dialect SQL template; everything after "
    "the cell aggregate is cell-table-sized",
)
def q214_kish_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q214"
    )
    return spark.sql(_kish_sql("documents_q214", " div "))

# ---------------------------------------------------------------------------
# q228 — epoch-shuffle decorrelation audit: are two epochs' training
# orders actually independent? Spearman rank correlation between the
# epoch-1 and epoch-2 md5 shuffle orders — EXACT integers end to end
# (rho = 1 - 6*sum(d^2)/(n(n^2-1))), so the audit hash-verifies and a
# broken shuffle (correlated epochs) is a hard test failure, not a
# judgement call
# ---------------------------------------------------------------------------
@register(
    "q228_epoch_shuffle_audit",
    """
    WITH r AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e1|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r1,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e2|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r2
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sd2,
             CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fixed
      FROM r
    )
    SELECT n, sd2, n_fixed,
           ROUND(1e0 - 6e0 * sd2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                 * n - 1e0)), 6) AS spearman_rho,
           CAST(ABS(1e0 - 6e0 * sd2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                 * n - 1e0))) < 3e0 / sqrt(CAST(n AS DOUBLE)) AS INT)
             AS decorrelated
    FROM agg
    """,
    doc="epoch-to-epoch shuffle quality: documents ranked under two "
    "independent md5 epoch keys (the q171 loader's reshuffle), "
    "Spearman rho between the orders from the exact closed form over "
    "BIGINT rank differences (ties impossible — md5 then doc_id "
    "total order), plus fixed-point count and a 3/sqrt(n) "
    "decorrelation verdict. A shuffle bug that reuses epoch seeds "
    "(rho = 1) or block-rotates (high rho) fails loudly. At 100 TB "
    "the global ranks come from the q83 two-phase machinery; the "
    "audit itself is one map-side-combined aggregate",
)
def q228_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.total_order import (
        hex_prefix_bucket,
        with_global_row_number,
    )

    d = load_table(spark, sf_dir, "documents")
    key = lambda e: F.md5(  # noqa: E731
        F.concat(F.lit(e + "|"), F.col("doc_id").cast("string"))
    )

    # Each epoch rank was a corpus-wide single-partition window. Both
    # epochs rank in ONE two-phase pass: unpivot each document into
    # (epoch, md5 key) rows, bucket by epoch block * 256 + the key's
    # 2-hex prefix (monotone along the (epoch, key) order), rank, and
    # recover the per-epoch rank as rn - (epoch-1)*N (each block holds
    # every document), pivoting r1/r2 back in one doc-keyed aggregate.
    stacked = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("e"), key("e1").alias("ok")),
                F.struct(F.lit(2).alias("e"), key("e2").alias("ok")),
            )
        ).alias("__s"),
    ).select("doc_id", F.col("__s.e").alias("__e"), F.col("__s.ok").alias("__ok"))
    ranked = with_global_row_number(
        stacked,
        [("__e", True), ("__ok", True), ("doc_id", True)],
        out="__rn",
        bucket=(F.col("__e").cast("long") - 1) * 256
        + hex_prefix_bucket(F.col("__ok")),
        total_out="__tot2",
    )
    n_docs = (F.col("__tot2") / 2).cast("long")
    erank = F.col("__rn") - (F.col("__e").cast("long") - 1) * n_docs
    r = ranked.groupBy("doc_id").agg(
        F.max(F.when(F.col("__e") == 1, erank)).alias("r1"),
        F.max(F.when(F.col("__e") == 2, erank)).alias("r2"),
    )
    agg = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
        .cast("long")
        .alias("sd2"),
        F.sum((F.col("r1") == F.col("r2")).cast("int"))
        .cast("long")
        .alias("n_fixed"),
    )
    nd = F.col("n").cast("double")
    rho = 1.0 - 6.0 * F.col("sd2") / (nd * (nd * F.col("n") - 1.0))
    return agg.select(
        "n",
        "sd2",
        "n_fixed",
        F.round(rho, 6).alias("spearman_rho"),
        (F.abs(rho) < 3.0 / F.sqrt(nd)).cast("int").alias("decorrelated"),
    )

# ---------------------------------------------------------------------------
# q233 — water-filling budget allocation: DERIVE the per-source token
# quotas for a target budget (here half the corpus) such that no
# source exceeds the common level L while small sources keep
# everything — the max-min-fair solver whose OUTPUT is what q83/q106
# consume as given. Exact integer arithmetic: the split point, level,
# and remainder distribution are all rank/floor-div rules
# ---------------------------------------------------------------------------
@register(
    "q233_water_filling",
    r"""
    WITH cap AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x <> ''))) AS BIGINT) AS c
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total, CAST(SUM(c) // 2 AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cap
    ),
    ranked AS (
      SELECT source, c,
             CAST(ROW_NUMBER() OVER (ORDER BY c, source) AS BIGINT) AS rn,
             CAST(SUM(c) OVER (ORDER BY c, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS prefix
      FROM cap
    ),
    cand AS (
      SELECT r.source, r.c, r.rn, r.prefix - r.c AS pre, t.t, t.n,
             (t.t - (r.prefix - r.c)) // (t.n - r.rn + 1) AS lvl
      FROM ranked r CROSS JOIN tot t
    ),
    split AS (
      SELECT MIN(rn) AS srn FROM cand WHERE c > lvl
    ),
    params AS (
      SELECT c.pre AS pre_s, c.n - c.rn + 1 AS k, c.lvl AS lv,
             (c.t - c.pre) % (c.n - c.rn + 1) AS r, c.rn AS srn
      FROM cand c JOIN split s ON c.rn = s.srn
    )
    SELECT c.source, c.c AS capacity,
           CAST(CASE WHEN p.srn IS NULL OR c.rn < p.srn THEN c.c
                     ELSE p.lv + CASE WHEN c.rn > c.n - p.r THEN 1 ELSE 0 END
                END AS BIGINT) AS allocated,
           CAST(CASE WHEN p.srn IS NULL OR c.rn < p.srn
                     THEN 0 ELSE 1 END AS INT) AS capped,
           t.t AS budget
    FROM cand c LEFT JOIN params p ON TRUE CROSS JOIN tot t
    ORDER BY c.source
    """,
    doc="max-min fair (water-filling) allocation of a token budget "
    "(half the corpus) across sources: sources sorted by capacity, "
    "the split point is the first source whose capacity exceeds the "
    "feasible common level (T - prefix)//(remaining), smaller sources "
    "keep everything, capped sources get the level with the integer "
    "remainder distributed to the largest ranks — allocations sum to "
    "EXACTLY the budget whenever any source is capped (tested). One "
    "corpus scan for capacities; everything else runs on the "
    "|sources|-sized table. The solver q83/q106's quota inputs "
    "actually come from",
)
def q233_water_filling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    cap = d.groupBy("source").agg(
        F.sum(F.size(tx.tokens(F.col("text")))).cast("long").alias("c")
    )
    tot = cap.agg(
        F.sum("c").cast("long").alias("total"),
        F.expr("sum(c) div 2").cast("long").alias("t"),
        F.count("*").cast("long").alias("n"),
    )
    ranked = cap.select(
        "source",
        "c",
        F.row_number().over(W.orderBy("c", "source")).cast("long").alias("rn"),
        F.sum("c")
        .over(W.orderBy("c", "source").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("prefix"),
    )
    cand = ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        "c",
        "rn",
        (F.col("prefix") - F.col("c")).alias("pre"),
        "t",
        "n",
        F.expr("(t - (prefix - c)) div (n - rn + 1)").alias("lvl"),
    )
    split = cand.filter(F.col("c") > F.col("lvl")).agg(
        F.min("rn").alias("srn")
    )
    params = (
        cand.join(F.broadcast(split), cand["rn"] == split["srn"])
        .select(
            F.col("pre").alias("pre_s"),
            (F.col("n") - F.col("rn") + 1).alias("k"),
            F.col("lvl").alias("lv"),
            F.expr("(t - pre) % (n - rn + 1)").alias("r"),
            F.col("srn"),
        )
    )
    alloc = F.when(
        F.col("srn").isNull() | (F.col("rn") < F.col("srn")), F.col("c")
    ).otherwise(
        F.col("lv")
        + F.when(F.col("rn") > F.col("n") - F.col("r"), 1).otherwise(0)
    )
    return (
        cand.join(F.broadcast(params), F.lit(True), "left")
        .select(
            "source",
            F.col("c").alias("capacity"),
            alloc.cast("long").alias("allocated"),
            F.when(
                F.col("srn").isNull() | (F.col("rn") < F.col("srn")), 0
            )
            .otherwise(1)
            .cast("int")
            .alias("capped"),
            F.col("t").alias("budget"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q237 — experiment sample-size planner: from each source cohort's
# observed conversion rate, the per-arm n needed to detect a 10% and
# a 20% relative lift at alpha=0.05 / power=0.8 — the power analysis
# that runs BEFORE q204's readout. z-constants ship as literals;
# everything else is one deterministic double chain over exact counts
# ---------------------------------------------------------------------------
_Z_ALPHA = 1.959963984540054  # Phi^-1(0.975), precomputed literal

_Z_BETA = 0.8416212335729143  # Phi^-1(0.80), precomputed literal

def _samplesize_sql() -> str:
    z = f"({_Z_ALPHA!r} + {_Z_BETA!r})"
    terms = []
    for lift, tag in ((0.1, "10"), (0.2, "20")):
        delta = f"(p * {lift!r})"
        terms.append(
            f"CAST(CEIL({z} * {z} * 2e0 * p * (1e0 - p) / ({delta} * {delta}))"
            f" AS BIGINT) AS n_per_arm_lift{tag}"
        )
    return f"""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    r AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS BIGINT) AS n_conv,
             CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS p
      FROM u
    )
    SELECT n_users, n_conv, ROUND(p, 6) AS base_rate,
           {", ".join(terms)},
           CAST(CAST(CEIL({z} * {z} * 2e0 * p * (1e0 - p)
                / ((p * 0.1e0) * (p * 0.1e0))) AS BIGINT)
                <= n_users // 2 AS INT) AS powered_for_10pct
    FROM r
    """


@register(
    "q237_sample_size_planner",
    _samplesize_sql(),
    doc="two-proportion power analysis over the observed user "
    "conversion rate: n per arm = (z_a + z_b)^2 * 2p(1-p) / delta^2 "
    "for 10% and 20% relative lifts at alpha=.05/power=.8, plus the "
    "verdict of whether the CURRENT population could power the 10% "
    "test. The normal quantiles are precomputed literals (identical "
    "bytes both plans — no inverse-CDF in either engine); counts are "
    "exact and the formula one shared double chain. One user "
    "collapse, one-row output — the question to answer before "
    "running q204 at all",
)
def q237_sample_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    r = u.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
        (F.sum("conv").cast("double") / F.count("*")).alias("p"),
    )
    z2 = (_Z_ALPHA + _Z_BETA) * (_Z_ALPHA + _Z_BETA)
    p = F.col("p")

    def n_arm(lift: float):
        delta = p * lift
        return F.ceil(F.lit(z2) * 2.0 * p * (1.0 - p) / (delta * delta)).cast(
            "long"
        )

    return r.select(
        "n_users",
        "n_conv",
        F.round(p, 6).alias("base_rate"),
        n_arm(0.1).alias("n_per_arm_lift10"),
        n_arm(0.2).alias("n_per_arm_lift20"),
        (n_arm(0.1) <= F.expr("n_users div 2")).cast("int").alias(
            "powered_for_10pct"
        ),
    )

# ---------------------------------------------------------------------------
# q282 — sample-size adequacy audit (Wilson intervals): per source,
# the observed quality-pass rate, its Wilson 95% CI half-width at the
# current n, and the n required to measure the rate to +/-2% — the
# pre-registration check that q157/q273's tests and q150's data card
# quietly assume but never verify. Everything is sqrt/divide chains
# (no exp, no pow); the pass rule is q275's integer fixed-point cut.
# ---------------------------------------------------------------------------
@register(
    "q282_sample_adequacy",
    r"""
    WITH m AS (
      SELECT source,
             CASE WHEN (CAST(len(list_distinct(list_filter(
                        string_split_regex(trim(lower(text)), '\s+'),
                        x -> x <> ''))) AS BIGINT) << 30)
                       // len(list_filter(
                          string_split_regex(trim(lower(text)), '\s+'),
                          x -> x <> '')) >= 633318697
                  THEN 1 ELSE 0 END AS pass
      FROM documents
      WHERE len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                x -> x <> '')) > 0
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pass) AS BIGINT) AS n_pass
      FROM m GROUP BY 1
    )
    SELECT source, n, n_pass,
           ROUND(CAST(n_pass AS DOUBLE) / n, 6) AS pass_rate,
           ROUND(1.96e0 * sqrt((CAST(n_pass AS DOUBLE) / n)
                               * (1e0 - CAST(n_pass AS DOUBLE) / n) / n
                               + 1.96e0 * 1.96e0 / (4e0 * n * n))
                 / (1e0 + 1.96e0 * 1.96e0 / n), 6) AS wilson_halfwidth,
           CAST(CEIL(1.96e0 * 1.96e0 * (CAST(n_pass AS DOUBLE) / n)
                     * (1e0 - CAST(n_pass AS DOUBLE) / n)
                     / (0.02e0 * 0.02e0)) AS BIGINT) AS n_required_2pct,
           CAST(1.96e0 * sqrt((CAST(n_pass AS DOUBLE) / n)
                              * (1e0 - CAST(n_pass AS DOUBLE) / n) / n
                              + 1.96e0 * 1.96e0 / (4e0 * n * n))
                / (1e0 + 1.96e0 * 1.96e0 / n) <= 0.02e0 AS INT) AS adequate
    FROM agg ORDER BY source
    """,
    doc="per-source measurement adequacy: observed pass rate of the "
    "q275 lexical-diversity gate, its Wilson 95% half-width at the "
    "current sample, the n needed for a +/-2% readout at that rate, "
    "and the adequate verdict — the audit that says which per-source "
    "numbers on the q150 data card are real and which are noise. "
    "sqrt/divide only (both correctly rounded IEEE); the verdict "
    "compares the unrounded half-width on both engines identically. "
    "One scan + one aggregate",
)
def q282_sample_adequacy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    m = d.select(
        "source", F.size(w).alias("n_tok"), F.size(F.array_distinct(w)).alias("n_dis")
    ).filter(F.col("n_tok") > 0)
    agg = m.select(
        "source",
        (
            F.expr("(cast(n_dis as bigint) * 1073741824) div n_tok")
            >= F.lit(633318697)
        )
        .cast("int")
        .alias("pass"),
    ).groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pass").cast("long").alias("n_pass"),
    )
    p = F.col("n_pass").cast("double") / F.col("n")
    z = 1.96
    hw = (
        z
        * F.sqrt(p * (1.0 - p) / F.col("n") + z * z / (4.0 * F.col("n") * F.col("n")))
        / (1.0 + z * z / F.col("n"))
    )
    return agg.select(
        "source",
        "n",
        "n_pass",
        F.round(p, 6).alias("pass_rate"),
        F.round(hw, 6).alias("wilson_halfwidth"),
        F.ceil(z * z * p * (1.0 - p) / (0.02 * 0.02))
        .cast("long")
        .alias("n_required_2pct"),
        (hw <= 0.02).cast("int").alias("adequate"),
    ).orderBy("source")

# ---------------------------------------------------------------------------
# q290 — jackknife source influence: for each source, how much the
# CORPUS-LEVEL quality metrics move when that source is left out —
# the governance number that turns "source X looks odd" into "source
# X moves the corpus mean token count by -4.2%". Leave-one-out means
# come free from global and per-source integer sums (no second pass),
# which is exactly why the jackknife is the right tool at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "q290_source_jackknife",
    r"""
    WITH m AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tok,
             CAST(n_chars AS BIGINT) AS nc
      FROM documents
    ),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_tok) AS BIGINT) AS st,
             CAST(SUM(nc) AS BIGINT) AS sc
      FROM m GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(st) AS BIGINT) AS st_all,
             CAST(SUM(sc) AS BIGINT) AS sc_all
      FROM per
    )
    SELECT p.source, p.n AS n_docs,
           ROUND(CAST(t.st_all AS DOUBLE) / t.n_all, 6) AS mean_tokens_all,
           ROUND(CAST(t.st_all - p.st AS DOUBLE) / (t.n_all - p.n), 6)
             AS mean_tokens_loo,
           ROUND(CAST(t.st_all - p.st AS DOUBLE) / (t.n_all - p.n)
                 - CAST(t.st_all AS DOUBLE) / t.n_all, 6)
             AS token_influence,
           ROUND(CAST(t.sc_all - p.sc AS DOUBLE) / (t.n_all - p.n)
                 - CAST(t.sc_all AS DOUBLE) / t.n_all, 6)
             AS chars_influence,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ABS((CAST(t.st_all - p.st AS DOUBLE) / (t.n_all - p.n))
                          - CAST(t.st_all AS DOUBLE) / t.n_all) DESC,
                      p.source) AS INT) AS influence_rank
    FROM per p CROSS JOIN tot t
    ORDER BY influence_rank
    """,
    doc="leave-one-source-out influence on corpus means: per source, "
    "the corpus mean tokens/doc with and without it and the deltas "
    "(token and char axes), ranked by absolute influence — computed "
    "entirely from per-source integer sums subtracted from global "
    "sums, so the whole jackknife costs ONE aggregate regardless of "
    "source count. The number that justifies dropping or capping a "
    "source in the q83/q103 mixture",
)
def q290_source_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    per = (
        d.select("source", F.size(w).cast("long").alias("n_tok"), F.col("n_chars"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_tok").cast("long").alias("st"),
            F.sum("n_chars").cast("long").alias("sc"),
        )
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("st").cast("long").alias("st_all"),
        F.sum("sc").cast("long").alias("sc_all"),
    )
    j = per.crossJoin(F.broadcast(tot))
    mean_all = F.col("st_all").cast("double") / F.col("n_all")
    mean_loo = (F.col("st_all") - F.col("st")).cast("double") / (
        F.col("n_all") - F.col("n")
    )
    chars_loo = (F.col("sc_all") - F.col("sc")).cast("double") / (
        F.col("n_all") - F.col("n")
    )
    chars_all = F.col("sc_all").cast("double") / F.col("n_all")
    return j.select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(mean_all, 6).alias("mean_tokens_all"),
        F.round(mean_loo, 6).alias("mean_tokens_loo"),
        F.round(mean_loo - mean_all, 6).alias("token_influence"),
        F.round(chars_loo - chars_all, 6).alias("chars_influence"),
        F.row_number()
        .over(W.orderBy(F.abs(mean_loo - mean_all).desc(), "source"))
        .cast("int")
        .alias("influence_rank"),
    ).orderBy("influence_rank")

# ---------------------------------------------------------------------------
# q306 — sampling-scheme bias audit: the same 10% sampling rate drawn
# three ways — md5 hash buckets (the house scheme), systematic
# doc_id % 10, and a doc_id range prefix — each scored against the
# exact corpus mean of n_chars. Hash sampling should sit closest;
# systematic inherits any id-correlated drift and the prefix inherits
# ingestion order — the audit that justifies the md5 discipline every
# sampled query here (q170/q272) leans on. Exact integer sums, one
# double division per row.
# ---------------------------------------------------------------------------
def _sampling_bias_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id", 1000)
    return f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS v, {b} AS hb,
             (SELECT MAX(doc_id) FROM documents) AS mx
      FROM documents
    ),
    truth AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
      FROM base
    ),
    schemes AS (
      SELECT 'md5_bucket' AS scheme, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s
      FROM base WHERE hb < 100
      UNION ALL
      SELECT 'systematic_mod10', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(v) AS BIGINT)
      FROM base WHERE doc_id % 10 = 0
      UNION ALL
      SELECT 'id_prefix', CAST(COUNT(*) AS BIGINT), CAST(SUM(v) AS BIGINT)
      FROM base WHERE doc_id * 10 <= mx
    )
    SELECT sc.scheme, sc.n AS n_sampled,
           ROUND(CAST(sc.s AS DOUBLE) / sc.n, 6) AS sample_mean,
           ROUND(CAST(t.s AS DOUBLE) / t.n, 6) AS true_mean,
           ROUND(CAST(sc.s AS DOUBLE) / sc.n
                 - CAST(t.s AS DOUBLE) / t.n, 6) AS bias,
           ROUND(ABS(CAST(sc.s AS DOUBLE) / sc.n
                     - CAST(t.s AS DOUBLE) / t.n)
                 / (CAST(t.s AS DOUBLE) / t.n), 6) AS abs_rel_err
    FROM schemes sc CROSS JOIN truth t
    ORDER BY sc.scheme
    """


@register(
    "q306_sampling_bias_audit",
    _sampling_bias_sql(),
    doc="three 10% sampling schemes scored against the exact corpus "
    "mean: md5 hash buckets vs systematic doc_id % 10 vs an id-prefix "
    "slice — bias and absolute relative error per scheme, the "
    "methodological receipt behind the md5-sample discipline that "
    "q170's quantiles and q272's Self-BLEU stand on (prefix sampling "
    "inherits ingestion order, systematic inherits any id-periodic "
    "structure; hash sampling inherits nothing). One scan, four "
    "aggregates, exact integer sums",
)
def q306_sampling_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    mx = d.agg(F.max("doc_id").alias("mx")).collect()[0].mx
    base = pin(
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("v"),
            hash_bucket(F.col("doc_id"), 1000).alias("hb"),
        )
    )
    truth = base.agg(
        F.count("*").cast("long").alias("tn"),
        F.sum("v").cast("long").alias("ts"),
    )

    def scheme(name, cond):
        return base.filter(cond).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        ).select(F.lit(name).alias("scheme"), "n", "s")

    schemes = (
        scheme("md5_bucket", F.col("hb") < 100)
        .unionAll(scheme("systematic_mod10", F.col("doc_id") % 10 == 0))
        .unionAll(scheme("id_prefix", F.col("doc_id") * 10 <= mx))
    )
    sm = F.col("s").cast("double") / F.col("n")
    tm = F.col("ts").cast("double") / F.col("tn")
    return (
        schemes.crossJoin(F.broadcast(truth))
        .select(
            "scheme",
            F.col("n").alias("n_sampled"),
            F.round(sm, 6).alias("sample_mean"),
            F.round(tm, 6).alias("true_mean"),
            F.round(sm - tm, 6).alias("bias"),
            F.round(F.abs(sm - tm) / tm, 6).alias("abs_rel_err"),
        )
        .orderBy("scheme")
    )

# ---------------------------------------------------------------------------
# q322 — k-anonymity / l-diversity audit: the re-identification-risk
# numbers a privacy review asks for before a table ships — group
# sizes over the quasi-identifier tuple (nation, segment, balance
# band), the share of individuals hiding in crowds of >= k for the
# standard k ladder, and l-diversity of a sensitive attribute (order
# priority) within each QI group (a group where everyone shares one
# priority leaks it even at k-anonymous sizes). Percent thresholds
# stay integer cross-multiplications; the balance band is an IEEE
# floor (q202's quantize-then-floor discipline).
# ---------------------------------------------------------------------------
@register(
    "q322_k_anonymity_audit",
    """
    WITH qi AS (
      SELECT c_custkey,
             c_nationkey AS nation, c_mktsegment AS segment,
             CAST(FLOOR(c_acctbal / 1000e0) AS INT) AS bal_band
      FROM customer
    ),
    sens AS (
      SELECT q.nation, q.segment, q.bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_orders,
             CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l_div
      FROM qi q LEFT JOIN orders o ON o.o_custkey = q.c_custkey
      GROUP BY 1, 2, 3
    ),
    g AS (
      SELECT q.nation, q.segment, q.bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_size,
             MAX(s.l_div) AS l_div
      FROM qi q
      JOIN sens s ON s.nation = q.nation AND s.segment = q.segment
                 AND s.bal_band = q.bal_band
      GROUP BY 1, 2, 3
    ),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT ks.k AS k_threshold,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(g.grp_size) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN g.grp_size < ks.k THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(SUM(CASE WHEN g.grp_size < ks.k THEN g.grp_size ELSE 0 END)
                AS BIGINT) AS customers_at_risk,
           ROUND(CAST(SUM(CASE WHEN g.grp_size >= ks.k THEN g.grp_size
                               ELSE 0 END) AS DOUBLE)
                 / SUM(g.grp_size), 6) AS frac_anonymous,
           CAST(MIN(g.grp_size) AS BIGINT) AS min_group_size,
           CAST(MIN(g.l_div) AS BIGINT) AS min_l_diversity,
           ROUND(CAST(SUM(CASE WHEN g.l_div >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS frac_groups_l2
    FROM g CROSS JOIN ks
    GROUP BY ks.k
    ORDER BY ks.k
    """,
    doc="k-anonymity / l-diversity audit of the customer table: "
    "quasi-identifier = (nation, market segment, account-balance "
    "1000-band via IEEE floor), reporting for k in (2,5,10) the group "
    "census, how many individuals sit in groups below k "
    "(re-identifiable), the anonymous fraction, and the l-diversity "
    "of order priority within QI groups (min and the share of groups "
    "with >= 2 distinct values — a k-anonymous group with one shared "
    "sensitive value still leaks it). The governance companion to "
    "q202's DP release and q213's deletion audit: this measures the "
    "risk those mechanisms spend budget to remove. One QI aggregate + "
    "one sensitive-join aggregate, both partial-agg friendly",
)
def q322_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    qi = c.select(
        "c_custkey",
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("int").alias("bal_band"),
    )
    sens = (
        qi.join(o, qi["c_custkey"] == o["o_custkey"], "left")
        .groupBy("nation", "segment", "bal_band")
        .agg(F.countDistinct("o_orderpriority").cast("long").alias("l_div"))
    )
    g = (
        qi.groupBy("nation", "segment", "bal_band")
        .agg(F.count("*").cast("long").alias("grp_size"))
        .join(sens, ["nation", "segment", "bal_band"])
    )
    ks = load_table(spark, sf_dir, "region").sparkSession.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    )
    return (
        g.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("grp_size").cast("long").alias("n_customers"),
            F.sum((F.col("grp_size") < F.col("k")).cast("long"))
            .cast("long")
            .alias("groups_below_k"),
            F.sum(
                F.when(F.col("grp_size") < F.col("k"), F.col("grp_size"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("customers_at_risk"),
            F.round(
                F.sum(
                    F.when(
                        F.col("grp_size") >= F.col("k"), F.col("grp_size")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("grp_size"),
                6,
            ).alias("frac_anonymous"),
            F.min("grp_size").cast("long").alias("min_group_size"),
            F.min("l_div").cast("long").alias("min_l_diversity"),
            F.round(
                F.sum((F.col("l_div") >= 2).cast("long")).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_groups_l2"),
        )
        .select(
            F.col("k").alias("k_threshold"),
            "n_groups",
            "n_customers",
            "groups_below_k",
            "customers_at_risk",
            "frac_anonymous",
            "min_group_size",
            "min_l_diversity",
            "frac_groups_l2",
        )
        .orderBy("k_threshold")
    )

# ---------------------------------------------------------------------------
# q348 — offline bandit policy replay (Li et al.'s unbiased replay
# estimator): score candidate arm-selection policies on LOGGED events
# without deploying them — a policy's value is the mean reward over
# exactly those logged events whose arm matches the policy's choice
# for that (user, day) context. Two deterministic policies: md5-
# uniform exploration and yesterday's-winner greedy (argmax of the
# previous day's global counts under a (count desc, type) total
# order). Rewards sum DECIMAL-exact; the md5 arm draw is the q131/
# q156 derandomization discipline.
# ---------------------------------------------------------------------------
def _bandit_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    arm = hash_bucket_sql(
        "(CAST(user_id AS VARCHAR) || '|' || strftime(day, '%Y-%m-%d'))", 1000
    )
    return f"""
    WITH ev AS (
      SELECT user_id, event_type, value,
             time_bucket(INTERVAL '1 day', ts) AS day
      FROM events
    ),
    arms AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS BIGINT)
               AS arm_idx,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM (SELECT DISTINCT event_type FROM ev)
    ),
    ctx AS (
      SELECT DISTINCT user_id, day FROM ev
    ),
    pol_a AS (
      SELECT c.user_id, c.day, a.event_type AS chosen
      FROM ctx c CROSS JOIN (SELECT user_id, day, {arm} AS h FROM ctx) x
      JOIN arms a ON a.arm_idx = x.h % a.k
      WHERE x.user_id = c.user_id AND x.day = c.day
    ),
    daily AS (
      SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY 1, 2
    ),
    winner AS (
      SELECT day, event_type AS chosen FROM (
        SELECT day, event_type,
               ROW_NUMBER() OVER (PARTITION BY day
                                  ORDER BY n DESC, event_type) AS rn
        FROM daily
      ) WHERE rn = 1
    ),
    pol_b AS (
      SELECT c.user_id, c.day, w.chosen
      FROM ctx c JOIN winner w ON w.day = c.day - INTERVAL '1 day'
    ),
    rep AS (
      SELECT 'md5_uniform' AS policy, e.user_id, e.day, e.event_type,
             e.value, p.chosen
      FROM ev e JOIN pol_a p ON p.user_id = e.user_id AND p.day = e.day
      UNION ALL
      SELECT 'yesterday_winner', e.user_id, e.day, e.event_type,
             e.value, p.chosen
      FROM ev e JOIN pol_b p ON p.user_id = e.user_id AND p.day = e.day
    )
    SELECT policy,
           CAST(COUNT(*) AS BIGINT) AS n_logged,
           CAST(SUM(CASE WHEN event_type = chosen THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN event_type = chosen
                 THEN CAST(value AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / SUM(CASE WHEN event_type = chosen THEN 1 ELSE 0 END)
             AS mean_reward,
           ROUND(CAST(SUM(CASE WHEN event_type = chosen THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS match_rate
    FROM rep GROUP BY 1
    ORDER BY 1
    """


@register(
    "q348_bandit_replay",
    _bandit_sql(),
    doc="offline bandit policy evaluation by replay: each policy's "
    "value is the mean logged reward over events whose arm (event "
    "type) equals the policy's deterministic choice for that (user, "
    "day) context — md5-uniform exploration vs yesterday's-winner "
    "greedy (prev-day argmax under (count desc, type)). The estimator "
    "that lets a recommendation team score policies on logs alone "
    "(unbiased when logging is uniform — stated caveat, the fixture "
    "approximates it); reward sums DECIMAL-exact, arm draws md5-"
    "derandomized. One events scan + two bounded context joins",
)
def q348_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    ev_ = hold(
        e.select(
            "user_id",
            "event_type",
            "value",
            F.date_trunc("day", "ts").alias("day"),
        )
    )
    arms = (
        ev_.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.row_number().over(W.orderBy("event_type")) - 1)
            .cast("long")
            .alias("arm_idx"),
        )
    )
    karms = arms.groupBy().agg(F.count("*").cast("long").alias("k"))
    arms = arms.crossJoin(F.broadcast(karms))
    ctx = ev_.select("user_id", "day").distinct()
    h = hash_bucket(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("|"),
            F.date_format("day", "yyyy-MM-dd"),
        ),
        1000,
    )
    pol_a = ctx.withColumn("h", h.cast("long")).join(
        F.broadcast(arms), F.col("arm_idx") == F.col("h") % F.col("k")
    ).select("user_id", "day", F.col("event_type").alias("chosen"))
    daily = ev_.groupBy("day", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    winner = (
        daily.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            (F.col("day") + F.expr("interval 1 day")).alias("day"),
            F.col("event_type").alias("chosen"),
        )
    )
    pol_b = ctx.join(F.broadcast(winner), "day").select(
        "user_id", "day", "chosen"
    )
    rep = None
    for name, pol in (("md5_uniform", pol_a), ("yesterday_winner", pol_b)):
        r = ev_.join(pol, ["user_id", "day"]).select(
            F.lit(name).alias("policy"), "event_type", "value", "chosen"
        )
        rep = r if rep is None else rep.unionByName(r)
    matched = (F.col("event_type") == F.col("chosen")).cast("int")
    return (
        rep.groupBy("policy")
        .agg(
            F.count("*").cast("long").alias("n_logged"),
            F.sum(matched).cast("long").alias("n_matched"),
            (
                F.sum(
                    F.when(
                        F.col("event_type") == F.col("chosen"),
                        F.col("value").cast("decimal(18,6)"),
                    ).otherwise(F.lit(0).cast("decimal(18,6)"))
                ).cast("double")
                / F.sum(matched)
            ).alias("mean_reward"),
            F.round(
                F.sum(matched).cast("double") / F.count("*"), 6
            ).alias("match_rate"),
        )
        .orderBy("policy")
    )

# ---------------------------------------------------------------------------
# q351 — stratified ATE (observational effect estimate): does signing
# up change purchase value? Treatment = user has a signup event,
# outcome = the user's total purchase value, confounding controlled
# by stratifying on activity quartiles (NTILE under the (count, user)
# total order — the q198 discipline) and weighting within-stratum
# treated-vs-control differences by stratum size. Completes the
# causal toolkit: q284 needs a time boundary (DiD), q268 a path model
# (Markov attribution); stratification needs only an overlap
# assumption, checked by the per-stratum counts it outputs.
# ---------------------------------------------------------------------------
_ATE_FX = 1 << 30


@register(
    "q351_stratified_ate",
    f"""
    WITH u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  AS INT) AS treated,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT user_id, treated, y,
             CAST(NTILE(4) OVER (ORDER BY n_events, user_id) AS INT)
               AS stratum
      FROM u
    ),
    g AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(SUM(1 - treated) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN treated = 1
                   THEN CAST(y AS DECIMAL(28,6)) END) AS DOUBLE) AS sy_t,
             CAST(SUM(CASE WHEN treated = 0
                   THEN CAST(y AS DECIMAL(28,6)) END) AS DOUBLE) AS sy_c
      FROM s GROUP BY 1
    ),
    d AS (
      SELECT stratum, n, n_t, n_c,
             CASE WHEN n_t > 0 AND n_c > 0
                  THEN sy_t / n_t - sy_c / n_c END AS diff
      FROM g
    ),
    ate AS (
      SELECT CAST(SUM(CASE WHEN diff IS NOT NULL
                   THEN CAST(FLOOR(diff * n * {_ATE_FX}) AS BIGINT) END)
                  AS BIGINT) AS num_fx,
             CAST(SUM(CASE WHEN diff IS NOT NULL THEN n END) AS BIGINT)
               AS n_used
      FROM d
    )
    SELECT d.stratum, d.n AS n_users, d.n_t AS n_treated,
           d.n_c AS n_control,
           ROUND(d.diff, 6) AS stratum_diff,
           ROUND(CAST(a.num_fx AS DOUBLE) / a.n_used / {_ATE_FX}, 6)
             AS stratified_ate
    FROM d CROSS JOIN ate a
    ORDER BY d.stratum
    """,
    doc="stratified average treatment effect of signup on purchase "
    "value: per activity quartile (NTILE under the (n_events, user) "
    "total order), the treated-minus-control mean-outcome difference "
    "(outcome sums DECIMAL-exact, one division per arm), weighted by "
    "stratum size into the ATE with 2^30-floored stratum terms so the "
    "weighted sum is an exact BIGINT. Strata without overlap (no "
    "treated or no control) show NULL and drop from the estimate — "
    "the overlap diagnostic is the output itself. One user aggregate "
    "+ one 4-row rollup",
)
def q351_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max((F.col("event_type") == "signup").cast("int"))
        .cast("int")
        .alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("y"),
    )
    s = u.select(
        "treated",
        "y",
        F.ntile(4).over(W.orderBy("n_events", "user_id")).cast("int").alias(
            "stratum"
        ),
    )
    g = s.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(
            F.when(F.col("treated") == 1, F.col("y").cast("decimal(28,6)"))
        )
        .cast("double")
        .alias("sy_t"),
        F.sum(
            F.when(F.col("treated") == 0, F.col("y").cast("decimal(28,6)"))
        )
        .cast("double")
        .alias("sy_c"),
    )
    diff = F.when(
        (F.col("n_t") > 0) & (F.col("n_c") > 0),
        F.col("sy_t") / F.col("n_t") - F.col("sy_c") / F.col("n_c"),
    )
    d = pin(g.select("stratum", "n", "n_t", "n_c", diff.alias("diff")))
    ate = d.agg(
        F.sum(
            F.when(
                F.col("diff").isNotNull(),
                F.floor(F.col("diff") * F.col("n") * _ATE_FX).cast("long"),
            )
        )
        .cast("long")
        .alias("num_fx"),
        F.sum(F.when(F.col("diff").isNotNull(), F.col("n")))
        .cast("long")
        .alias("n_used"),
    )
    return (
        d.crossJoin(F.broadcast(ate))
        .select(
            "stratum",
            F.col("n").alias("n_users"),
            F.col("n_t").alias("n_treated"),
            F.col("n_c").alias("n_control"),
            F.round("diff", 6).alias("stratum_diff"),
            F.round(
                F.col("num_fx").cast("double") / F.col("n_used") / _ATE_FX, 6
            ).alias("stratified_ate"),
        )
        .orderBy("stratum")
    )

# ---------------------------------------------------------------------------
# q366 — inclusion-probability audit of the Efraimidis-Spirakis
# sampler: q131 DRAWS weighted samples; nothing yet verified that the
# machinery's inclusion rates track the weights. B=32 derandomized
# replicate draws (md5(doc|b) uniforms — q156's replicate discipline)
# of m=50 docs weighted by token count, empirical inclusion per
# weight decile vs the first-order target min(1, m*w/W) — the audit
# that catches a broken key formula (e.g. a max-instead-of-min, or a
# weight inversion) as a decile-level rate distortion. Empirical
# rates are exact integer ratios; targets 2^20-floored means.
# ---------------------------------------------------------------------------
_INC_B = 32

_INC_M = 50

_INC_FX = 1 << 20

def _inclusion_audit_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    span = _GUMBEL_SPAN
    u = (
        f"(({hash_bucket_sql('(CAST(doc_id AS VARCHAR) || chr(124) || CAST(b AS VARCHAR))', span)}"
        f" + 0.5) / {float(span)!r})"
    )
    return f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)),
               '\\s+'), x -> x <> '')) AS BIGINT) AS w
      FROM documents
    ),
    wpos AS (SELECT doc_id, w FROM w WHERE w > 0),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt,
                   CAST(COUNT(*) AS BIGINT) AS nd FROM wpos),
    keyed AS (
      SELECT x.b, d.doc_id, d.w,
             ROUND(ln({u}) / d.w, 6) AS k
      FROM wpos d
      CROSS JOIN (SELECT unnest(generate_series(0, {_INC_B - 1})) AS b) x
    ),
    sel AS (
      SELECT b, doc_id FROM (
        SELECT b, doc_id,
               ROW_NUMBER() OVER (PARTITION BY b ORDER BY k DESC, doc_id)
                 AS rn
        FROM keyed
      ) WHERE rn <= {_INC_M}
    ),
    inc AS (
      SELECT d.doc_id, d.w,
             CAST(COALESCE(s.n, 0) AS BIGINT) AS n_sel
      FROM wpos d
      LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                 FROM sel GROUP BY 1) s ON s.doc_id = d.doc_id
    ),
    dec AS (
      SELECT doc_id, w, n_sel,
             CAST(NTILE(10) OVER (ORDER BY w, doc_id) AS INT) AS decile
      FROM inc
    )
    SELECT d.decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(d.w) AS DOUBLE) / COUNT(*), 6) AS mean_w,
           CAST(SUM(d.n_sel) AS BIGINT) AS n_selected,
           ROUND(CAST(SUM(d.n_sel) AS DOUBLE) / (COUNT(*) * {_INC_B}), 6)
             AS empirical_rate,
           ROUND(CAST(SUM(CAST(FLOOR(LEAST(1e0,
                 {_INC_M}e0 * d.w / t.wt) * {_INC_FX}) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / {_INC_FX}, 6) AS target_rate,
           ROUND(CAST(SUM(d.n_sel) AS DOUBLE) / (COUNT(*) * {_INC_B})
                 / (CAST(SUM(CAST(FLOOR(LEAST(1e0,
                    {_INC_M}e0 * d.w / t.wt) * {_INC_FX}) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / {_INC_FX}), 6) AS rate_ratio
    FROM dec d CROSS JOIN tot t
    GROUP BY d.decile, t.wt
    ORDER BY d.decile
    """


@register(
    "q366_inclusion_audit",
    _inclusion_audit_sql(),
    doc="inclusion-probability audit of the q131 Efraimidis-Spirakis "
    "weighted sampler: 32 derandomized replicate draws (md5(doc|b) "
    "uniforms, key = ln(u)/w, top-50 under the (key desc, doc) total "
    "order), empirical inclusion per token-count decile against the "
    "first-order target min(1, m*w/W) — a weight inversion or key "
    "mistake shows up as a decile-level rate distortion this table "
    "makes visible. Empirical rates exact integer ratios, targets "
    "2^20-floored means, everything derandomized so the audit itself "
    "hash-verifies. One corpus explode for weights + one 32x keyed "
    "pass (bounded: doc-count x B rows, m-bounded state per "
    "replicate)",
)
def q366_inclusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    span = _GUMBEL_SPAN
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    w = d.select("doc_id", F.size(wcol).cast("long").alias("w")).filter(
        F.col("w") > 0
    )
    w = pin(w)
    tot = w.agg(
        F.sum("w").cast("long").alias("wt"),
        F.count("*").cast("long").alias("nd"),
    )
    u = (
        hash_bucket(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("|"),
                F.col("b").cast("string"),
            ),
            span,
        ).cast("double")
        + 0.5
    ) / float(span)
    keyed = w.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.lit(_INC_B - 1))).alias("b"),
    ).select("b", "doc_id", "w", F.round(F.log(u) / F.col("w"), 6).alias("k"))
    sel = (
        keyed.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("b").orderBy(F.col("k").desc(), "doc_id")
            ),
        )
        .filter(F.col("rn") <= _INC_M)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    inc = w.join(sel, "doc_id", "left").select(
        "doc_id", "w", F.coalesce("n", F.lit(0)).cast("long").alias("n_sel")
    )
    # The audit decile was NTILE(10) over every document in one task;
    # pin the per-doc inclusion table once (the 32-replicate explode
    # runs once) and cut deciles from the two-phase global rank + the
    # exact NTILE formula over tot's document count.
    from frontmatter_mcp_spark.operators.total_order import (
        ntile_from_rn,
        with_global_row_number,
    )

    inc = hold(inc)
    dec = (
        with_global_row_number(inc, [("w", True), ("doc_id", True)], out="__rn")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "n_sel",
            "wt",
            ntile_from_rn(F.col("__rn"), F.col("nd"), 10).alias("decile"),
        )
    )
    target_fx = F.floor(
        F.least(
            F.lit(1.0), F.lit(float(_INC_M)) * F.col("w") / F.col("wt")
        )
        * _INC_FX
    ).cast("long")
    g = (
        dec.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.sum("w").cast("double") / F.count("*"), 6).alias(
                "mean_w"
            ),
            F.sum("n_sel").cast("long").alias("n_selected"),
            F.sum(target_fx).cast("long").alias("tgt_fx"),
        )
    )
    emp = F.col("n_selected").cast("double") / (F.col("n_docs") * _INC_B)
    tgt = F.col("tgt_fx").cast("double") / F.col("n_docs") / _INC_FX
    return g.select(
        "decile",
        "n_docs",
        "mean_w",
        "n_selected",
        F.round(emp, 6).alias("empirical_rate"),
        F.round(tgt, 6).alias("target_rate"),
        F.round(emp / tgt, 6).alias("rate_ratio"),
    ).orderBy("decile")
