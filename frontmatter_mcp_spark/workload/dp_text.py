"""Text-analysis family: profiles, quality heuristics, language ID, PII, lexical statistics, n-gram language models.

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
    _MAX_DF,
    _MIN_TOKENS,
    _PII_PATTERNS,
    _SHINGLES_CTE,
)

# ---------------------------------------------------------------------------
# q35 — text profile: token stats, language ID, quality, fingerprint
# ---------------------------------------------------------------------------
def _text_profile_sql() -> str:
    langs = sorted(tx.LANG_STOPWORDS)  # de, en, es, fr
    score_exprs = ", ".join(
        "len(list_filter(ltoks, t -> list_contains({lst}, t))) AS s_{lang}".format(
            lst="[" + ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS[lang]) + "]",
            lang=lang,
        )
        for lang in langs
    )
    # ties pick the lexicographically largest language (matches Spark's
    # array_max over (score, lang) structs)
    ordered = sorted(langs, reverse=True)
    lang_case = (
        "CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und' "
        + " ".join(
            f"WHEN s_{lang} = greatest(s_de, s_en, s_es, s_fr) THEN '{lang}'"
            for lang in ordered
        )
        + " END"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS ltoks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, text, toks, ltoks,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) * 1.0 / length(text) AS alpha_raw,
             {score_exprs}
      FROM base
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           CAST(n_distinct AS INT) AS n_distinct_tokens,
           CAST(length(text) AS INT) AS n_chars_actual,
           round(list_sum(list_transform(toks, t -> length(t))) * 1.0 / n_tokens, 6) AS avg_token_len,
           round(alpha_raw, 6) AS alpha_ratio,
           {lang_case} AS lang_pred,
           round((CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0
                       WHEN n_tokens > 1000 THEN 0.5
                       ELSE n_tokens / 10.0 END
                  + alpha_raw
                  + n_distinct * 1.0 / n_tokens) / 3.0, 6) AS quality,
           md5(array_to_string(list_sort(list_distinct(ltoks)), ' ')) AS bow_fp
    FROM scored
    """


@register(
    "q35_text_profile",
    _text_profile_sql(),
    doc="per-doc text profile: token stats + lang-ID heuristic + quality score "
    "+ bag-of-words fingerprint, all codegen'd column expressions",
)
def q35_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return tx.text_profile(d, "doc_id", "text")

# ---------------------------------------------------------------------------
# q40 — BPE-ish token counting + rolling-hash fingerprint
# ---------------------------------------------------------------------------
_HEXVAL_DUCK = "(strpos('0123456789abcdef', substr(md5(t), {i}, 1)) - 1)"

def _tokenstats_sql() -> str:
    tokval = " + ".join(
        f"{_HEXVAL_DUCK.format(i=i)} * {16 ** (8 - i)}" for i in range(1, 9)
    )
    pattern_sql = tk.BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{pattern_sql}')) AS INT) AS bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS INT) AS est_tokens,
           CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS INT) AS ws_tokens,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''),
                              t -> CAST({tokval} AS BIGINT))),
             (acc, v) -> (acc * {tk.BASE} + v) % {tk.MOD}) AS rolling_fp
    FROM documents
    """


@register(
    "q40_token_stats",
    _tokenstats_sql(),
    doc="BPE-ish regex token count + chars/4 estimate + whitespace count "
    "+ order-sensitive polynomial rolling hash (all JVM expressions)",
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    t = F.col("text")
    return d.select(
        "doc_id",
        tk.bpe_ish_token_count(t).cast("int").alias("bpe_tokens"),
        tk.char_estimate_token_count(t).alias("est_tokens"),
        tx.token_count(t).cast("int").alias("ws_tokens"),
        tk.rolling_hash(t).alias("rolling_fp"),
    )

def _safety_sql() -> str:
    counters = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS {name}"
        for name, pat in _PII_PATTERNS.items()
    )
    return f"""
    SELECT doc_id,
           {counters},
           CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digit_chars,
           CAST(len(regexp_extract_all(text, '[A-Z]')) AS INT) AS n_upper_chars,
           CAST(len(text) - len(replace(text, ' ', '')) AS INT) AS n_spaces,
           CAST((len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) * 5
             + len(regexp_extract_all(text, '\\d{{9,}}')) * 3
             + len(regexp_extract_all(text, '\\d{{3}}[-.]\\d{{3,4}}[-.]\\d{{4}}')) * 4) AS INT)
             AS risk_score
    FROM documents
    """


@register(
    "q84_safety_profile",
    _safety_sql(),
    doc="per-doc PII/safety counters (emails, urls, phone-shaped, long digit "
    "runs, digit/upper char counts) + weighted risk score — all "
    "RE2-and-Java-portable regex, pure narrow codegen map",
)
def q84_safety_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")

    def cnt(pat: str) -> Column:
        return F.regexp_count(t, F.lit(pat)).cast("int")

    return d.select(
        "doc_id",
        *[cnt(pat).alias(name) for name, pat in _PII_PATTERNS.items()],
        cnt(r"[0-9]").alias("n_digit_chars"),
        cnt(r"[A-Z]").alias("n_upper_chars"),
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))).cast("int").alias("n_spaces"),
        (
            cnt(_PII_PATTERNS["n_emails"]) * 5
            + cnt(_PII_PATTERNS["n_long_digit_runs"]) * 3
            + cnt(_PII_PATTERNS["n_phones"]) * 4
        ).cast("int").alias("risk_score"),
    )

def _quality_gate_sql() -> str:
    pii = (
        f"len(regexp_extract_all(text, '{_PII_PATTERNS['n_emails']}')) * 5"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_long_digit_runs']}')) * 3"
        f" + len(regexp_extract_all(text, '{_PII_PATTERNS['n_phones']}')) * 4"
    )
    return f"""
    WITH stats AS (
      SELECT source,
             quantile_cont(n_chars, {_LEN_P_LOW!r}) AS p_low,
             quantile_cont(n_chars, {_LEN_P_HIGH!r}) AS p_high
      FROM documents GROUP BY source
    ),
    flagged AS (
      SELECT d.doc_id,
             list_filter([
               CASE WHEN ({pii}) > 0 THEN 'pii_risk' ELSE NULL END,
               CASE WHEN len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                             t -> t <> '')) < {_MIN_TOKENS} THEN 'tiny_doc' ELSE NULL END,
               CASE WHEN d.n_chars < s.p_low THEN 'too_short'
                    WHEN d.n_chars > s.p_high THEN 'too_long' ELSE NULL END
             ], r -> r IS NOT NULL) AS reasons
      FROM documents d JOIN stats s ON d.source = s.source
    )
    SELECT doc_id, len(reasons) = 0 AS keep,
           coalesce(array_to_string(list_sort(reasons), ','), '') AS reasons
    FROM flagged
    """


@register(
    "q88_quality_gate",
    _quality_gate_sql(),
    doc="composite keep/drop gate: PII risk + per-source length fences + "
    "tiny-doc filter composed over ONE corpus scan and one broadcast stats "
    "join — the filter-pipeline shape a production cleaning stage uses "
    "(per-doc reasons retained for audit)",
)
def q88_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.percentile("n_chars", F.lit(_LEN_P_LOW)).alias("p_low"),
        F.percentile("n_chars", F.lit(_LEN_P_HIGH)).alias("p_high"),
    )
    t = F.col("text")
    risk = (
        F.regexp_count(t, F.lit(_PII_PATTERNS["n_emails"])) * 5
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_long_digit_runs"])) * 3
        + F.regexp_count(t, F.lit(_PII_PATTERNS["n_phones"])) * 4
    )
    n_tokens = F.size(
        F.filter(F.split(F.trim(t), r"\s+", -1), lambda x: x != F.lit(""))
    )
    reasons = F.array_sort(
        F.filter(
            F.array(
                F.when(risk > 0, F.lit("pii_risk")),
                F.when(n_tokens < _MIN_TOKENS, F.lit("tiny_doc")),
                F.when(F.col("n_chars") < F.col("p_low"), F.lit("too_short")).when(
                    F.col("n_chars") > F.col("p_high"), F.lit("too_long")
                ),
            ),
            lambda r: r.isNotNull(),
        )
    )
    return (
        d.join(F.broadcast(stats), "source")
        .select("doc_id", reasons.alias("reasons"))
        # comma-join the audit reasons so the driver canonicalizer can hash
        # them (arrays are unhashable in its pandas sort); '' == clean doc
        .select(
            "doc_id",
            (F.size("reasons") == 0).alias("keep"),
            F.array_join("reasons", ",").alias("reasons"),
        )
    )

# ---------------------------------------------------------------------------
# q94 — unigram LM quality score (CCNet-style perplexity proxy)
# ---------------------------------------------------------------------------
@register(
    "q94_unigram_lm_score",
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
      SELECT doc_id, CAST(SUM(tf) AS INT) AS n_tokens,
             ROUND(CAST(SUM(nll_term) AS DOUBLE) / SUM(tf), 6) AS nll_mean
      FROM terms GROUP BY 1
    )
    SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens, agg.nll_mean
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="CCNet-style unigram LM quality proxy: per-doc mean token "
    "-ln(c(t)/N) under the corpus's own unigram distribution — the LM "
    "filter stage of a pre-training pipeline (threshold both tails). "
    "Map-side term counts, one vocab shuffle on the term key, N as a "
    "one-row broadcast; DECIMAL-exact per-term sums keep the double "
    "aggregate order-independent (hash-verified vs DuckDB)",
)
def q94_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return tx.unigram_nll(d, "doc_id", "text")

# ---------------------------------------------------------------------------
# q62 — text normalization pass (lowercase, collapse, stopword strip)
# ---------------------------------------------------------------------------
@register(
    "q62_normalize_text",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    k AS (
      SELECT doc_id, w, list_filter(w, x -> x NOT IN ('a', 'the')) AS kept
      FROM toks
    )
    SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, CAST(len(kept) AS INT) AS n_kept,
           md5(array_to_string(kept, ' ')) AS norm_fp
    FROM k
    """,
    doc="canonical cleaning pass: lowercase + whitespace collapse + "
    "stopword strip, fingerprinted; a narrow whole-stage-codegen map",
)
def q62_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(tx.tokens(tx.normalize_text(F.col("text")))).alias("n_kept"),
        F.md5(tx.normalize_text(F.col("text"))).alias("norm_fp"),
    )

# ---------------------------------------------------------------------------
# q98 — BPE-style merge candidates: top adjacent pairs by PMI
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 5

_PMI_TOP_K = 50


@register(
    "q98_pmi_merge_candidates",
    f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT unnest(w) AS t FROM toks),
    uni AS (SELECT t, COUNT(*) AS c FROM words GROUP BY 1),
    tot AS (SELECT SUM(c) AS n_total FROM uni),
    big AS (
      SELECT w[i] AS a, w[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    bc AS (
      SELECT a AS term_a, b AS term_b, COUNT(*) AS c_ab
      FROM big GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_COUNT}
    )
    SELECT term_a, term_b, CAST(c_ab AS INT) AS c_ab,
           CAST(ua.c AS INT) AS c_a, CAST(ub.c AS INT) AS c_b,
           ROUND(ln(c_ab) + ln(CAST(n_total AS DOUBLE)) - ln(ua.c) - ln(ub.c),
                 6) AS pmi
    FROM bc JOIN uni ua ON ua.t = term_a JOIN uni ub ON ub.t = term_b
    CROSS JOIN tot
    ORDER BY pmi DESC, term_a, term_b LIMIT {_PMI_TOP_K}
    """,
    doc="vocabulary-induction merge scoring (one BPE/WordPiece step at "
    "word granularity): top adjacent pairs by PMI with a min-count "
    "floor applied BEFORE the unigram joins — two map-side-combined "
    "explode aggregates, candidate-sized joins, one-row broadcast N, "
    "TakeOrderedAndProject top-k",
)
def q98_pmi_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # the unigram vocab has three consumers (two joins + totals) with
    # different projections — pin it so the token explode runs once
    uni = pin(tx.unigram_counts(d, "text"))
    return tx.bigram_merge_candidates(
        d, "text", min_count=_PMI_MIN_COUNT, top_k=_PMI_TOP_K, uni=uni
    )

# ---------------------------------------------------------------------------
# q105 — interpolated bigram LM quality score (the CCNet upgrade over q94)
# ---------------------------------------------------------------------------
@register(
    "q105_bigram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    uni AS (SELECT doc_id, unnest(w) AS t FROM toks),
    c1 AS (SELECT t, COUNT(*) AS c1 FROM uni GROUP BY 1),
    tot AS (SELECT SUM(c1) AS n_total FROM c1),
    prs AS (
      SELECT doc_id, w[i] AS a, w[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS s(i)
      WHERE len(w) >= 2
    ),
    ptf AS (SELECT doc_id, a, b, COUNT(*) AS tf FROM prs GROUP BY 1, 2, 3),
    c2 AS (SELECT a, b, SUM(tf) AS c2 FROM ptf GROUP BY 1, 2),
    bigterms AS (
      SELECT ptf.doc_id, ptf.tf,
             CAST((-ln(0.5 * (CAST(c2.c2 AS DOUBLE) / ca.c1)
                       + 0.5 * (CAST(cb.c1 AS DOUBLE) / n_total))) * ptf.tf
                  AS DECIMAL(28,12)) AS nll
      FROM ptf JOIN c2 ON c2.a = ptf.a AND c2.b = ptf.b
           JOIN c1 ca ON ca.t = ptf.a
           JOIN c1 cb ON cb.t = ptf.b
           CROSS JOIN tot
    ),
    firsts AS (
      SELECT toks.doc_id, 1 AS tf,
             CAST(-ln(CAST(c1.c1 AS DOUBLE) / n_total) AS DECIMAL(28,12)) AS nll
      FROM toks JOIN c1 ON c1.t = w[1] CROSS JOIN tot
      WHERE len(w) >= 1
    ),
    allterms AS (SELECT * FROM bigterms UNION ALL SELECT * FROM firsts),
    agg AS (
      SELECT doc_id, CAST(SUM(tf) AS INT) AS n_tokens,
             ROUND(CAST(SUM(nll) AS DOUBLE) / SUM(tf), 6) AS nll_mean
      FROM allterms GROUP BY 1
    )
    SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens, agg.nll_mean
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="interpolated bigram LM quality score (the CCNet filter stage a "
    "step up from q94's unigram): token i>=2 scored by "
    "-ln(0.5*p(w|prev) + 0.5*p(w)) under the corpus's own counts, the "
    "first token by its unigram — repeated PHRASES now score low, "
    "which a unigram model cannot see. Per-doc pair tf collapses "
    "map-side before the three count joins; N is a one-row broadcast; "
    "DECIMAL-quantized terms keep the sums order-independent",
)
def q105_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # the unigram vocab has four consumers (two pair joins, first-token
    # join, totals) with differing projections — pin it (the q98 lesson)
    uni = pin(tx.unigram_counts(d, "text"))
    return tx.bigram_nll(d, "doc_id", "text", uni=uni)

# ---------------------------------------------------------------------------
# q115 — PII redaction REWRITE: scrub matches, keep the documents
# (q84 detects and scores; this produces the redacted corpus)
# ---------------------------------------------------------------------------
# Application order matters where patterns overlap (a phone number also
# contains digit runs): emails, then urls, then phones, then bare digit
# runs — each later pattern sees the earlier replacements' output.
_REDACTIONS = [
    ("n_emails", "<EMAIL>"),
    ("n_urls", "<URL>"),
    ("n_phones", "<PHONE>"),
    ("n_long_digit_runs", "<NUM>"),
]

# The synthetic corpus carries no PII, so a deterministic contact line is
# APPENDED to every 7th document before redaction — the regex-replace
# semantics (including the overlap order) are then exercised on real
# matches and verified by the full-text hash, while the untouched 6/7
# prove the no-match path rewrites nothing.
_PII_SUFFIX = (
    "' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com or call 555-123-4567 "
    "ref 9876543210 see https://ex.example/p'"
)

def _redaction_sql() -> str:
    aug = f"CASE WHEN doc_id % 7 = 0 THEN text || {_PII_SUFFIX} ELSE text END"
    counters = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '{_PII_PATTERNS[name]}')) AS INT) AS {name}"
        for name, _tok in _REDACTIONS
    )
    red = "t"
    for name, tok in _REDACTIONS:
        red = f"regexp_replace({red}, '{_PII_PATTERNS[name]}', '{tok}', 'g')"
    return f"""
    SELECT doc_id,
           {counters},
           md5({red}) AS redacted_fp,
           length({red}) AS redacted_len
    FROM (SELECT doc_id, {aug} AS t FROM documents)
    """


@register(
    "q115_pii_redaction",
    _redaction_sql(),
    doc="PII redaction rewrite: the scrubbing stage — every email/URL/"
    "phone/long-digit-run match replaced by a typed token, per-doc match "
    "counters kept for audit, applied in a fixed order so overlapping "
    "patterns resolve identically on any engine (the full redacted text "
    "hash-matches the oracle). A narrow, zero-shuffle codegen "
    "projection: regex rewrite at 100 TB costs one corpus scan",
)
def q115_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    suffix = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit(
            "@mail.example.com or call 555-123-4567 ref 9876543210 "
            "see https://ex.example/p"
        ),
    )
    t = F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), suffix)).otherwise(
        F.col("text")
    )
    counters = [
        F.regexp_count(t, F.lit(_PII_PATTERNS[name])).cast("int").alias(name)
        for name, _tok in _REDACTIONS
    ]
    red = t
    for name, tok in _REDACTIONS:
        red = F.regexp_replace(red, _PII_PATTERNS[name], tok)
    return d.select(
        "doc_id",
        *counters,
        F.md5(red).alias("redacted_fp"),
        F.length(red).cast("long").alias("redacted_len"),
    )

# ---------------------------------------------------------------------------
# q146 — skip-gram training-pair generation (word2vec/embedding training
# front-end): window +-2 (center, context) pairs under Mikolov
# frequency subsampling, plus k=2 negatives per pair drawn from the
# unigram^0.75 noise distribution by deterministic inverse-CDF lookup.
# pow() is NOT correctly rounded cross-engine; p^0.75 is computed as
# sqrt(p * sqrt(p)) — two IEEE-exact sqrts and a multiply.
# ---------------------------------------------------------------------------
_SG_SUBSAMPLE = "0.001e0"  # Mikolov t

_SG_FX = 1 << 20

_SG_WINDOW = 2

_SG_NEGATIVES = 2

def _sg_keep_threshold(cnt: str, total: str) -> str:
    """shared double text: floor(P_keep * 2^20) with
    P_keep = min(1, (sqrt(f/t) + 1) * t / f), f = cnt/total."""
    f = f"(CAST({cnt} AS DOUBLE) / {total})"
    p = f"LEAST(1.0e0, (sqrt({f} / {_SG_SUBSAMPLE}) + 1e0) * {_SG_SUBSAMPLE} / {f})"
    return f"CAST(FLOOR({p} * {_SG_FX}) AS BIGINT)"

def _sg_noise_weight(cnt: str, total: str) -> str:
    f = f"(CAST({cnt} AS DOUBLE) / {total})"
    return f"sqrt({f} * sqrt({f}))"

def _skipgram_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    keep_key = hash_bucket_sql(
        "CAST(doc_id AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || t", _SG_FX
    )
    neg_key = hash_bucket_sql(
        "CAST(doc_id AS VARCHAR) || '|' || CAST(pa AS VARCHAR) || '|' || "
        "CAST(pb AS VARCHAR) || '|' || CAST(j AS VARCHAR)",
        _SG_FX,
    )
    thr = _sg_keep_threshold("fr.cnt", "tt.total")
    w = _sg_noise_weight("cnt", "tt.total")
    offs = ", ".join(
        str(o) for o in range(-_SG_WINDOW, _SG_WINDOW + 1) if o != 0
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS p, w[i] AS t
      FROM toks, UNNEST(generate_series(1, len(w))) AS g(i)
    ),
    fr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM pos),
    kept AS (
      SELECT pos.doc_id, pos.p, pos.t
      FROM pos JOIN fr USING (t) CROSS JOIN tt
      WHERE {keep_key} < {thr}
    ),
    pairs AS (
      SELECT a.doc_id, a.p AS pa, b.p AS pb, a.t AS center, b.t AS context
      FROM kept a
      CROSS JOIN UNNEST([{offs}]) AS o(off)
      JOIN kept b ON b.doc_id = a.doc_id AND b.p = a.p + o.off
    ),
    noise AS (
      -- integer fixed-point CDF: per-token weights floor into 2^24,
      -- cumulative sums and the total are then EXACT integers, so the
      -- [lo, hi) boundaries are pure integer division — no dependence
      -- on float accumulation order, and the last hi is exactly 2^20
      SELECT t, lo, hi FROM (
        SELECT t,
               (COALESCE(SUM(wfx) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  CAST(0 AS BIGINT)) * {_SG_FX})
                 // (SUM(wfx) OVER ()) AS lo,
               (SUM(wfx) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * {_SG_FX}) // (SUM(wfx) OVER ()) AS hi
        FROM (SELECT t, CAST(FLOOR(({w}) * 16777216e0) AS BIGINT) AS wfx
              FROM fr CROSS JOIN tt)
      )
    ),
    negs AS (
      SELECT p.center, p.context, n.t AS negative
      FROM pairs p
      CROSS JOIN UNNEST(generate_series(1, {_SG_NEGATIVES})) AS gj(j)
      JOIN noise n ON {neg_key} >= n.lo AND {neg_key} < n.hi
    )
    SELECT center, context, negative, CAST(COUNT(*) AS BIGINT) AS n
    FROM negs GROUP BY 1, 2, 3
    """


@register(
    "q146_skipgram_pairs",
    _skipgram_sql(),
    doc="skip-gram training-pair generation: window +-2 (center, "
    "context) pairs via offset equi-joins on (doc, position) — never a "
    "range self-join — under Mikolov frequency subsampling (the keep "
    "decision is md5(doc,pos,token) vs a per-token threshold, so the "
    "sampled stream is reproducible), plus 2 negatives per pair drawn "
    "from unigram^0.75 by inverse-CDF against a vocabulary-sized "
    "broadcast boundary table; p^0.75 = sqrt(p*sqrt(p)) because pow() "
    "is not correctly rounded cross-engine but sqrt is. Output "
    "aggregated to (center, context, negative) counts — the word2vec/"
    "contrastive-embedding data front-end",
)
def q146_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks_arr = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    pos = d.select(
        "doc_id", F.posexplode(toks_arr).alias("p0", "t")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "t")
    pos = hold(pos)
    fr = pos.groupBy("t").agg(F.count("*").cast("long").alias("cnt"))
    tt = pos.agg(F.count("*").cast("long").alias("total"))
    thr = F.expr(_sg_keep_threshold("cnt", "total"))
    keep_key = hash_bucket(
        F.concat_ws(
            "|", F.col("doc_id").cast("string"), F.col("p").cast("string"), F.col("t")
        ),
        _SG_FX,
    )
    kept = hold(
        pos.join(F.broadcast(fr), "t")
        .crossJoin(F.broadcast(tt))
        .filter(keep_key.cast("long") < thr)
        .select("doc_id", "p", "t")
    )
    offs = [o for o in range(-_SG_WINDOW, _SG_WINDOW + 1) if o != 0]
    a = kept.select(
        "doc_id", F.col("p").alias("pa"), F.col("t").alias("center"),
        F.explode(F.array(*[F.lit(o) for o in offs])).alias("off"),
    ).withColumn("pb", F.col("pa") + F.col("off"))
    b = kept.select(
        "doc_id", F.col("p").alias("pb"), F.col("t").alias("context")
    )
    pairs = a.join(b, ["doc_id", "pb"]).select(
        "doc_id", "pa", "pb", "center", "context"
    )
    wfx = F.expr(
        f"CAST(FLOOR(({_sg_noise_weight('cnt', 'total')}) * 16777216e0) AS BIGINT)"
    )
    # integer fixed-point CDF (see the oracle comment): exact integer
    # cumulative sums make the boundaries accumulation-order-free
    base = fr.crossJoin(F.broadcast(tt)).select("t", wfx.alias("wfx"))
    tw = base.agg(F.sum("wfx").cast("long").alias("twfx"))
    noise = (
        base.crossJoin(F.broadcast(tw))
        .select(
            "t",
            F.expr(
                f"(COALESCE(SUM(wfx) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED"
                f" PRECEDING AND 1 PRECEDING), CAST(0 AS BIGINT))"
                f" * {_SG_FX}) div twfx"
            ).alias("lo"),
            F.expr(
                f"(SUM(wfx) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING"
                f" AND CURRENT ROW) * {_SG_FX}) div twfx"
            ).alias("hi"),
        )
    )
    exp = pairs.select(
        "*", F.explode(F.array(*[F.lit(j) for j in range(1, _SG_NEGATIVES + 1)])).alias("j")
    )
    neg_key = hash_bucket(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("pa").cast("string"),
            F.col("pb").cast("string"),
            F.col("j").cast("string"),
        ),
        _SG_FX,
    ).cast("long")
    negs = exp.withColumn("u", neg_key).join(
        F.broadcast(noise),
        (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
    )
    return negs.groupBy(
        "center", "context", F.col("t").alias("negative")
    ).agg(F.count("*").cast("long").alias("n"))

# ---------------------------------------------------------------------------
# q150 — corpus data card: the one-row summary a dataset release ships
# with (composition, volume, duplication, token budget) — every number
# already defined by an upstream operator family, composed into one
# declarative plan
# ---------------------------------------------------------------------------
@register(
    "q150_datacard",
    """
    WITH toks AS (
      SELECT doc_id, source, lang,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                 x -> x <> '')) AS n_tok,
             md5(text) AS fp
      FROM documents
    ),
    fps AS (SELECT fp, COUNT(*) AS c FROM toks GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT source) AS INT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS INT) AS n_langs,
           CAST((SELECT COUNT(*) FROM fps) AS BIGINT) AS n_unique_contents,
           CAST((SELECT SUM(c - 1) FROM fps) AS BIGINT) AS n_exact_dup_docs,
           round(CAST((SELECT SUM(c - 1) FROM fps) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate,
           CAST(MIN(n_tok) AS INT) AS min_tokens,
           CAST(MAX(n_tok) AS INT) AS max_tokens,
           round(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS mean_tokens
    FROM toks
    """,
    doc="corpus data card: the one-row release summary — volume (docs, "
    "tokens), composition (sources, languages), exact duplication rate "
    "(md5 fingerprint groups), and token-length spread. One scan plus a "
    "16-byte-key fingerprint aggregate; every derived ratio an identical "
    "double expression rounded to 6",
)
def q150_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    n_tok = F.size(
        F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                 lambda t: t != "")
    )
    toks = pin(
        d.select(
            "doc_id", "source", "lang", n_tok.alias("n_tok"),
            F.md5("text").alias("fp"),
        )
    )
    fps = toks.groupBy("fp").agg(F.count("*").alias("c"))
    fstats = fps.agg(
        F.count("*").cast("long").alias("n_unique_contents"),
        F.sum(F.col("c") - 1).cast("long").alias("n_exact_dup_docs"),
    )
    base = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.countDistinct("source").cast("int").alias("n_sources"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.min("n_tok").cast("int").alias("min_tokens"),
        F.max("n_tok").cast("int").alias("max_tokens"),
    )
    return base.crossJoin(F.broadcast(fstats)).selectExpr(
        "n_docs", "n_tokens", "n_sources", "n_langs",
        "n_unique_contents", "n_exact_dup_docs",
        "round(CAST(n_exact_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate",
        "min_tokens", "max_tokens",
        "round(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_tokens",
    )

# ---------------------------------------------------------------------------
# q153 — corpus snapshot diff: the dataset-release changelog between two
# snapshots (added / removed / modified / unchanged documents with token
# deltas) — a full outer join on the doc key comparing content
# fingerprints. Snapshots are derived from the ingest-batch column
# (q70's fixture shape); the "new" snapshot also carries a
# deterministic revision to a doc subset so the modified class is
# non-empty (the q115 synthetic-injection precedent).
# ---------------------------------------------------------------------------
def _corpus_diff_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id", 10)
    return f"""
    WITH base AS (
      SELECT doc_id, text, {b} AS batch,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                 x -> x <> '')) AS nt
      FROM documents
    ),
    old AS (SELECT doc_id, md5(text) AS fp, nt FROM base WHERE batch <= 7),
    new_ AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END) AS fp,
             nt + CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS nt
      FROM base WHERE batch >= 2
    ),
    j AS (
      SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.fp <> n.fp THEN 'modified'
                  ELSE 'unchanged' END AS change,
             COALESCE(o.nt, 0) AS nt_old, COALESCE(n.nt, 0) AS nt_new
      FROM old o FULL OUTER JOIN new_ n ON n.doc_id = o.doc_id
    )
    SELECT change, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt_old) AS BIGINT) AS n_tokens_old,
           CAST(SUM(nt_new) AS BIGINT) AS n_tokens_new,
           CAST(SUM(nt_new) - SUM(nt_old) AS BIGINT) AS token_delta
    FROM j GROUP BY 1
    """


@register(
    "q153_corpus_diff",
    _corpus_diff_sql(),
    doc="corpus snapshot diff (the dataset-release changelog): full "
    "outer join of two ingest-batch-derived snapshots on the doc key, "
    "classifying added/removed/modified/unchanged by content "
    "fingerprint with per-class token deltas; a deterministic revision "
    "of doc_id%13 docs keeps the modified class non-empty. One "
    "doc-key join of fingerprint-sized rows — at scale both snapshot "
    "scans prune to their batch partitions",
)
def q153_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", hash_bucket(F.col("doc_id"), 10).alias("batch"),
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+", -1),
                     lambda t: t != "")
        ).alias("nt"),
    )
    old = base.filter(F.col("batch") <= 7).select(
        "doc_id", F.md5("text").alias("fp"), "nt"
    )
    rev = F.col("doc_id") % 13 == 0
    new = base.filter(F.col("batch") >= 2).select(
        "doc_id",
        F.md5(
            F.when(rev, F.concat(F.col("text"), F.lit(" rev2"))).otherwise(
                F.col("text")
            )
        ).alias("fp"),
        (F.col("nt") + F.when(rev, 1).otherwise(0)).alias("nt"),
    )
    o = old.select(
        F.col("doc_id").alias("o_id"), F.col("fp").alias("o_fp"),
        F.col("nt").alias("nt_old"),
    )
    n = new.select(
        F.col("doc_id").alias("n_id"), F.col("fp").alias("n_fp"),
        F.col("nt").alias("nt_new"),
    )
    j = o.join(n, o.o_id == n.n_id, "full_outer").select(
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(F.col("o_fp") != F.col("n_fp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
        F.coalesce("nt_old", F.lit(0)).alias("nt_old"),
        F.coalesce("nt_new", F.lit(0)).alias("nt_new"),
    )
    return j.groupBy("change").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nt_old").cast("long").alias("n_tokens_old"),
        F.sum("nt_new").cast("long").alias("n_tokens_new"),
        (F.sum("nt_new") - F.sum("nt_old")).cast("long").alias("token_delta"),
    )

# ---------------------------------------------------------------------------
# q167 — CCNet perplexity-bucket composition: q94 scores documents, this
# runs CCNet's actual downstream decision — split each language's corpus
# into head/middle/tail perplexity tertiles and report the composition
# ---------------------------------------------------------------------------
@register(
    "q167_perplexity_buckets",
    """
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT doc_id, lang, unnest(w) AS term FROM toks),
    tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf FROM words GROUP BY 1, 2, 3),
    vocab AS (SELECT lang, term, SUM(tf) AS c FROM tf GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(c) AS n_total FROM vocab GROUP BY 1),
    terms AS (
      SELECT doc_id, tf.lang, tf.tf,
             CAST((ln(CAST(n_total AS DOUBLE)) - ln(CAST(c AS DOUBLE))) * tf.tf
                  AS DECIMAL(28,12)) AS nll_term
      FROM tf JOIN vocab ON vocab.lang = tf.lang AND vocab.term = tf.term
      JOIN tot ON tot.lang = tf.lang
    ),
    agg AS (
      SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             CAST(SUM(nll_term) AS DOUBLE) / SUM(tf) AS nll_mean
      FROM terms GROUP BY 1, 2
    ),
    bucketed AS (
      SELECT lang, n_tokens, nll_mean,
             NTILE(3) OVER (PARTITION BY lang ORDER BY nll_mean, doc_id) AS b
      FROM agg
    )
    SELECT lang,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(nll_mean AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_nll,
           ROUND(MIN(nll_mean), 6) AS min_nll,
           ROUND(MAX(nll_mean), 6) AS max_nll
    FROM bucketed GROUP BY lang, b
    ORDER BY lang, bucket
    """,
    doc="CCNet's head/middle/tail decision: per-LANGUAGE unigram LM "
    "(q94 scores against one global LM; CCNet trains per language), "
    "documents ranked by mean token NLL within their language and cut "
    "into tertiles by NTILE — doc_id tiebreak makes the cut "
    "deterministic, decimal-exact NLL sums make the ranking key "
    "bit-identical cross-engine. One term-key shuffle for the LM, one "
    "per-language sort for the tertile cut (at 100 TB: approx "
    "percentile cuts replace NTILE, same plan shape otherwise), "
    "composition report is a map-side-combined aggregate",
)
def q167_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    tf = (
        d.select("doc_id", "lang", F.explode(toks).alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("tf"))
    )
    tf = pin(tf)
    vocab = tf.groupBy("lang", "term").agg(F.sum("tf").alias("c"))
    tot = vocab.groupBy("lang").agg(F.sum("c").alias("n_total"))
    terms = tf.join(vocab, ["lang", "term"]).join(F.broadcast(tot), "lang").select(
        "doc_id",
        "lang",
        "tf",
        (
            (F.log(F.col("n_total").cast("double")) - F.log(F.col("c").cast("double")))
            * F.col("tf")
        )
        .cast("decimal(28,12)")
        .alias("nll_term"),
    )
    agg = terms.groupBy("doc_id", "lang").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        (F.sum("nll_term").cast("double") / F.sum("tf")).alias("nll_mean"),
    )
    win = Window.partitionBy("lang").orderBy("nll_mean", "doc_id")
    bucketed = agg.withColumn("b", F.ntile(3).over(win))
    return (
        bucketed.groupBy("lang", "b")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("nll_mean").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_nll"),
            F.round(F.min("nll_mean"), 6).alias("min_nll"),
            F.round(F.max("nll_mean"), 6).alias("max_nll"),
        )
        .select(
            "lang",
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "n_tokens",
            "mean_nll",
            "min_nll",
            "max_nll",
        )
        .orderBy("lang", "bucket")
    )

# ---------------------------------------------------------------------------
# q189 — ingestion parse-quality accounting: the dead-letter report for
# the semi-structured props column (q14 consumes the parseable rows;
# this counts what the TRY_CAST path silently dropped, per event type)
# ---------------------------------------------------------------------------
@register(
    "q189_parse_quality",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN props IS NULL OR json_valid(props) = false
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_json,
           CAST(SUM(CASE WHEN json_valid(props)
                          AND json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
           CAST(SUM(CASE WHEN json_valid(props)
                          AND json_extract_string(props, '$.k') IS NOT NULL
                          AND TRY_CAST(json_extract_string(props, '$.k') AS INT)
                              IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable_k,
           CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
                              IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           ROUND(CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                                             AS INT) IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS ok_rate
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="semi-structured parse-quality accounting per event type: rows "
    "whose props are invalid JSON, valid JSON missing the key, present "
    "but uncastable, and cleanly consumable — the dead-letter-queue "
    "report every ingestion pipeline keeps next to the happy path "
    "(q14). One scan, map-side-combined counters, JSON probing stays "
    "in JVM codegen (get_json_object / try_cast, no Python)",
)
def q189_parse_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    valid = F.expr("get_json_object(props, '$') IS NOT NULL")
    k_str = F.expr("get_json_object(props, '$.k')")
    k_int = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("props").isNull() | ~valid, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_invalid_json"),
            F.sum(F.when(valid & k_str.isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_k"),
            F.sum(
                F.when(valid & k_str.isNotNull() & k_int.isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_uncastable_k"),
            F.sum(F.when(k_int.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_ok"),
        )
        .withColumn(
            "ok_rate",
            F.round(F.col("n_ok").cast("double") / F.col("n_rows"), 6),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q195 — readability scoring: Flesch reading-ease + Flesch-Kincaid grade
# from three integer counters (sentence terminators, words, vowel-group
# syllable proxy). The classic text-quality signal set next to q35's
# structural profile — all counting stays in JVM codegen, and the final
# formulas are single identically-written double expressions over exact
# integer ratios, so they evaluate bit-identically cross-engine
# ---------------------------------------------------------------------------
@register(
    "q195_readability",
    r"""
    WITH c AS (
      SELECT doc_id, source,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t <> '')) AS n_words,
             len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id, source,
           CAST(n_sentences AS INT) AS n_sentences,
           CAST(n_words AS INT) AS n_words,
           CAST(n_syllables AS INT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             CAST(FLOOR((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                  * 10000e0) AS BIGINT)
           END AS flesch_ease_fx,
           CASE WHEN n_words > 0 THEN
             CAST(FLOOR((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                   + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59)
                  * 10000e0) AS BIGINT)
           END AS fk_grade_fx
    FROM c
    """,
    doc="readability profile per document: sentence count (terminator "
    "runs, floored at 1), word count (the corpus-standard whitespace "
    "tokenizer), and the vowel-group syllable proxy feed the Flesch "
    "reading-ease and Flesch-Kincaid grade formulas — written as ONE "
    "identical double expression on both engines over exact integer "
    "ratios (int/int division and a fixed multiply-add chain are "
    "IEEE-deterministic; no libm calls). Narrow zero-shuffle "
    "projection, regex counters in codegen — the cheap filter stage "
    "that runs before any model-based quality score",
)
def q195_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    t = F.col("text")
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    n_words = F.size(
        F.filter(F.split(F.trim(t), r"\s+", -1), lambda x: x != F.lit(""))
    )
    n_syl = F.regexp_count(t, F.lit("[aeiouyAEIOUY]+"))
    c = d.select(
        "doc_id",
        "source",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syl.alias("n_syllables"),
    )
    wd = F.col("n_words").cast("double")
    # 1e-4 floor fixed-point: the ROUND form had 4 exact-half and 5
    # near-half (<=2 ulp) inputs at sf0.01 (r11 boundary audit) — the
    # ratio-of-small-integers formulas land on representable halves
    ease = F.floor(
        (
            206.835
            - 1.015 * (wd / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words"))
        )
        * 10000.0
    ).cast("long")
    grade = F.floor(
        (
            0.39 * (wd / F.col("n_sentences"))
            + 11.8 * (F.col("n_syllables").cast("double") / F.col("n_words"))
            - 15.59
        )
        * 10000.0
    ).cast("long")
    return c.select(
        "doc_id",
        "source",
        F.col("n_sentences").cast("int").alias("n_sentences"),
        F.col("n_words").cast("int").alias("n_words"),
        F.col("n_syllables").cast("int").alias("n_syllables"),
        F.when(F.col("n_words") > 0, ease).alias("flesch_ease_fx"),
        F.when(F.col("n_words") > 0, grade).alias("fk_grade_fx"),
    )

# ---------------------------------------------------------------------------
# q196 — Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over each
# source's top-200 vocabulary — the classic corpus-health diagnostic
# (natural text sits near slope -1; templated/synthetic corpora flatten
# or steepen). Each log term is quantized to DECIMAL(28,12) before
# summation (the q94/q171 discipline: exact order-independent sums; the
# only cross-engine exposure is the documented sub-quantum 1-ulp libm
# class), and the closed-form OLS runs on the exact sums
# ---------------------------------------------------------------------------
_ZIPF_TOP = 200


@register(
    "q196_zipf_fit",
    rf"""
    WITH toks AS (
      SELECT source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT source, unnest(w) AS term FROM toks),
    vocab AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM words GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, term) AS r
      FROM vocab
    ),
    t AS (
      SELECT source,
             CAST(ln(CAST(r AS DOUBLE)) AS DECIMAL(28,12)) AS x,
             CAST(ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12)) AS y,
             CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                  AS DECIMAL(28,12)) AS xy,
             CAST(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))
                  AS DECIMAL(28,12)) AS xx,
             CAST(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                  AS DECIMAL(28,12)) AS yy
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx,
             CAST(SUM(yy) AS DOUBLE) AS syy
      FROM t GROUP BY 1
    )
    SELECT source, CAST(n AS INT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM agg ORDER BY source
    """,
    doc="Zipf's-law fit per source: vocabulary ranked under a (count "
    "desc, term) total order, the top-200 (rank, count) points fitted "
    "by closed-form OLS in log-log space. Log terms quantize to "
    "DECIMAL(28,12) so the sums are exact and order-independent; the "
    "final slope/intercept/r2 are identical double expression chains "
    "on both engines. One token shuffle + one vocab aggregate; the "
    "regression itself touches 200 rows per source regardless of "
    "corpus size",
)
def q196_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    words = d.select("source", F.explode(toks).alias("term"))
    vocab = words.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    ranked = vocab.select(
        "source",
        "c",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.col("c").desc(), "term"))
        .alias("r"),
    ).filter(F.col("r") <= _ZIPF_TOP)
    lnr = F.log(F.col("r").cast("double"))
    lnc = F.log(F.col("c").cast("double"))
    t = ranked.select(
        "source",
        lnr.cast("decimal(28,12)").alias("x"),
        lnc.cast("decimal(28,12)").alias("y"),
        (lnr * lnc).cast("decimal(28,12)").alias("xy"),
        (lnr * lnr).cast("decimal(28,12)").alias("xx"),
        (lnc * lnc).cast("decimal(28,12)").alias("yy"),
    )
    agg = t.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("yy").cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "source",
        n.cast("int").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("source")

# ---------------------------------------------------------------------------
# q205 — cross-entropy domain-similarity matrix (the Moore-Lewis /
# CCNet data-selection signal at corpus granularity): every source's
# token distribution scored under every source's add-1-smoothed
# unigram LM. The diagonal is each domain's own entropy; an off-
# diagonal cell minus its column diagonal is the Moore-Lewis score of
# "data from r under target s"
# ---------------------------------------------------------------------------
@register(
    "q205_crossentropy_matrix",
    r"""
    WITH toks AS (
      SELECT source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT source, unnest(w) AS term FROM toks),
    tf AS (
      SELECT source AS r, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words GROUP BY 1, 2
    ),
    ns AS (SELECT r AS s, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
    vv AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tf),
    grid AS (
      SELECT ns.s, t.term, ns.n, vv.v,
             COALESCE(c.tf, CAST(0 AS BIGINT)) AS c0
      FROM (SELECT DISTINCT term FROM tf) t
      CROSS JOIN ns CROSS JOIN vv
      LEFT JOIN tf c ON c.r = ns.s AND c.term = t.term
    ),
    lp AS (
      SELECT s, term,
             ln(CAST(n + v AS DOUBLE)) - ln(CAST(c0 + 1 AS DOUBLE)) AS nll
      FROM grid
    ),
    cells AS (
      SELECT lp.s AS model_source, tf.r AS data_source,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(lp.nll * tf.tf AS DECIMAL(28,12))) AS DOUBLE)
               / SUM(tf.tf) AS nll_raw
      FROM tf JOIN lp ON lp.term = tf.term
      GROUP BY 1, 2
    ),
    out AS (
      SELECT model_source, data_source, n_tokens,
             ROUND(nll_raw, 6) AS mean_nll,
             ROUND(nll_raw, 6)
               - MAX(CASE WHEN model_source = data_source
                          THEN ROUND(nll_raw, 6) END)
                 OVER (PARTITION BY data_source) AS ml_raw
      FROM cells
    )
    SELECT model_source, data_source, n_tokens, mean_nll,
           ROUND(ml_raw, 6) AS moore_lewis
    FROM out ORDER BY model_source, data_source
    """,
    doc="Moore-Lewis cross-entropy matrix: per (model source s, data "
    "source r), the mean token NLL of r's text under s's add-1-"
    "smoothed unigram LM — the data-selection signal for 'which "
    "domains resemble my target'. moore_lewis = cell minus the data "
    "source's own-entropy diagonal (negative = r looks MORE like s "
    "than like itself). Per-term NLLs quantize to DECIMAL(28,12) "
    "before the exact sum (the q94/q171 ln discipline). One token "
    "explode + one (source, term) aggregate; the smoothing grid and "
    "the scoring join run on |vocab| x |sources| — at 100 TB the "
    "vocab gets the df-cap and an OOV bucket, same plan otherwise",
)
def q205_crossentropy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    words = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    # tf feeds three consumers (totals, the smoothing grid's left side,
    # and the scoring join) with different projections — pin it
    tf = hold(
        words.groupBy(F.col("source").alias("r"), "term").agg(
            F.count("*").cast("long").alias("tf")
        )
    )
    ns = tf.groupBy(F.col("r").alias("s")).agg(F.sum("tf").cast("long").alias("n"))
    vv = tf.agg(F.countDistinct("term").cast("long").alias("v"))
    terms = tf.select("term").distinct()
    grid = (
        terms.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(vv))
        .join(
            tf.select(F.col("r").alias("s2"), F.col("term").alias("t2"), "tf"),
            (F.col("s") == F.col("s2")) & (F.col("term") == F.col("t2")),
            "left",
        )
        .select(
            "s",
            "term",
            "n",
            "v",
            F.coalesce("tf", F.lit(0).cast("long")).alias("c0"),
        )
    )
    lp = grid.select(
        "s",
        "term",
        (
            F.log((F.col("n") + F.col("v")).cast("double"))
            - F.log((F.col("c0") + 1).cast("double"))
        ).alias("nll"),
    )
    cells = (
        tf.join(lp, "term")
        .groupBy(
            F.col("s").alias("model_source"), F.col("r").alias("data_source")
        )
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum((F.col("nll") * F.col("tf")).cast("decimal(28,12)")).cast(
                    "double"
                )
                / F.sum("tf")
            ).alias("nll_raw"),
        )
    )
    diag = F.max(
        F.when(
            F.col("model_source") == F.col("data_source"),
            F.round(F.col("nll_raw"), 6),
        )
    ).over(W.partitionBy("data_source"))
    return (
        cells.select(
            "model_source",
            "data_source",
            "n_tokens",
            F.round("nll_raw", 6).alias("mean_nll"),
            (F.round(F.col("nll_raw"), 6) - diag).alias("ml_raw"),
        )
        .select(
            "model_source",
            "data_source",
            "n_tokens",
            "mean_nll",
            F.round("ml_raw", 6).alias("moore_lewis"),
        )
        .orderBy("model_source", "data_source")
    )

# ---------------------------------------------------------------------------
# q249 — lexical richness profile: type-token ratio, hapax fraction,
# and Simpson's vocabulary concentration per source — the vocabulary-
# health panel beside q118's growth curve and q196's Zipf slope, in
# pure integer/rational arithmetic (no ln anywhere)
# ---------------------------------------------------------------------------
@register(
    "q249_lexical_richness",
    r"""
    WITH toks AS (
      SELECT source,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT source, unnest(w) AS term FROM toks),
    vocab AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM words GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
           ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_frac,
           ROUND(CAST(SUM(c * (c - 1)) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * (SUM(c) - 1)), 6) AS simpson_d
    FROM vocab GROUP BY source ORDER BY source
    """,
    doc="vocabulary-health panel per source: type-token ratio, hapax "
    "legomena fraction (the one-off words that dominate natural text "
    "and vanish in templated corpora), and Simpson's D (the exact "
    "repeat-draw collision probability sum c(c-1)/N(N-1) — integer "
    "numerators, one division). No ln, so every column is a pure "
    "integer ratio rounded for display. One token explode + one "
    "vocab aggregate (the q58/q196 exchange class); a source whose "
    "hapax_frac collapses relative to its peers is template spam "
    "before any dedup confirms it",
)
def q249_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    words = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    vocab = words.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    return (
        vocab.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n_hapax"),
            F.round(F.count("*").cast("double") / F.sum("c"), 6).alias(
                "type_token_ratio"
            ),
            F.round(
                F.sum((F.col("c") == 1).cast("int")).cast("double") / F.count("*"),
                6,
            ).alias("hapax_frac"),
            F.round(
                F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
                / (F.sum("c").cast("double") * (F.sum("c") - 1)),
                6,
            ).alias("simpson_d"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q263 — per-document token-entropy quality signal: the Shannon
# entropy of a document's own token distribution, the "word soup vs
# template loop" separator — q61 counts literal repetition and q94
# scores against the CORPUS LM; entropy is the self-contained third
# axis (a doc of 50 distinct tokens used once each maxes it; a doc
# repeating one phrase collapses it regardless of which phrase).
# H = ln(n) - (sum c*ln c)/n with DECIMAL-quantized terms (the q94
# ln discipline: term sums exact/order-free, final rounded to 6).
# ---------------------------------------------------------------------------
@register(
    "q263_token_entropy",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(w) AS t FROM toks)
      GROUP BY 1, 2
    ),
    h AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12)))
                  AS DOUBLE) AS clnc
      FROM tf GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_distinct,
           ROUND(ln(CAST(n_tokens AS DOUBLE)) - clnc / n_tokens, 6) + 0e0
             AS entropy,
           CASE WHEN n_distinct = 1 THEN 0e0
                ELSE ROUND((ln(CAST(n_tokens AS DOUBLE)) - clnc / n_tokens)
                           / ln(CAST(n_distinct AS DOUBLE)), 6) END
             AS norm_entropy
    FROM h
    ORDER BY doc_id
    """,
    doc="per-document Shannon token entropy: H = ln(n) - (sum of "
    "c*ln(c))/n over the doc's own term frequencies, plus the "
    "0-1-normalized H/ln(distinct) templatedness score (1 = every "
    "distinct token equally used, ->0 = one token dominates; the "
    "single-distinct-token doc pins to 0 by convention). Complements "
    "q61 (literal repetition) and q94 (corpus-LM surprisal) as the "
    "self-contained quality axis. c*ln(c) terms are DECIMAL-quantized "
    "so the per-doc sum is order-independent; the final value rounds "
    "to 6 (ln's 1-ulp cross-engine wobble, q94 discipline). One token "
    "explode + one (doc, term) aggregate + one doc aggregate — all "
    "partial-aggregated, no joins",
)
def q263_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    tf = (
        d.select("doc_id", F.explode(w).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    h = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(
            (F.col("c") * F.log(F.col("c").cast("double"))).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("clnc"),
    )
    ent = F.log(F.col("n_tokens").cast("double")) - F.col("clnc") / F.col(
        "n_tokens"
    )
    return h.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.round(ent, 6) + F.lit(0.0)).alias("entropy"),
        F.when(F.col("n_distinct") == 1, F.lit(0.0))
        .otherwise(
            F.round(ent / F.log(F.col("n_distinct").cast("double")), 6)
        )
        .alias("norm_entropy"),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# q272 — Self-BLEU corpus diversity (Zhu et al., the Texygen metric):
# each sampled document scored as a "hypothesis" against every OTHER
# sampled document as references — high Self-BLEU means the corpus
# says the same things the same way (mode collapse in synthetic data,
# template farms in crawls). Runs on the deterministic 5% md5 sample
# (q170 discipline — sampling IS the 100 TB plan), with the exclude-
# self reference max done by (max1, count-at-max, max2) statistics so
# no per-pair join ever forms. No brevity penalty (it needs exp; the
# clipped-precision core is the diversity signal), stated honestly.
# ---------------------------------------------------------------------------
_SB_SAMPLE = 50  # of 1000 md5 buckets -> 5%

def _selfbleu_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b = hash_bucket_sql("doc_id", 1000)
    return f"""
    WITH sample AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents WHERE {b} < {_SB_SAMPLE}
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, 1 AS n, unnest(w) AS g FROM sample
      UNION ALL
      SELECT doc_id, 2 AS n, w[i] || ' ' || w[i+1] AS g
      FROM sample, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2, 3
    ),
    stats AS MATERIALIZED (
      SELECT n, g, MAX(c) AS max1,
             CAST(COUNT(*) FILTER (WHERE c = mx) AS BIGINT) AS n_at_max,
             MAX(c) FILTER (WHERE c < mx) AS max2
      FROM (SELECT n, g, c, MAX(c) OVER (PARTITION BY n, g) AS mx FROM tf)
      GROUP BY n, g
    ),
    clipped AS (
      SELECT t.doc_id, t.n,
             CAST(SUM(LEAST(t.c,
               CASE WHEN t.c = s.max1 AND s.n_at_max = 1
                    THEN COALESCE(s.max2, 0) ELSE s.max1 END)) AS BIGINT)
               AS match_c,
             CAST(SUM(t.c) AS BIGINT) AS tot_c
      FROM tf t JOIN stats s ON s.n = t.n AND s.g = t.g
      GROUP BY 1, 2
    ),
    piv AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 1 THEN match_c END) AS m1,
             MAX(CASE WHEN n = 1 THEN tot_c END) AS t1,
             MAX(CASE WHEN n = 2 THEN match_c END) AS m2,
             MAX(CASE WHEN n = 2 THEN tot_c END) AS t2
      FROM clipped GROUP BY 1
    )
    SELECT doc_id, t1 AS n_tokens,
           ROUND(CAST(m1 AS DOUBLE) / t1, 6) AS p1,
           ROUND(CAST(COALESCE(m2, 0) AS DOUBLE) / COALESCE(t2, 1), 6) AS p2,
           ROUND(sqrt((CAST(m1 AS DOUBLE) / t1)
                      * (CAST(COALESCE(m2, 0) AS DOUBLE) / COALESCE(t2, 1))), 6)
             AS self_bleu2
    FROM piv
    ORDER BY doc_id
    """


@register(
    "q272_self_bleu_diversity",
    _selfbleu_sql(),
    doc="Self-BLEU-2 over the deterministic 5% sample: per sampled doc "
    "the clipped unigram/bigram precisions against all other sampled "
    "docs and their geometric mean (sqrt is correctly rounded IEEE — "
    "the one BLEU aggregation that needs no exp). Exclude-self clip "
    "via per-gram (max1, count-at-max, max2): if the hypothesis "
    "itself holds the unique max, the reference ceiling is max2 — so "
    "the metric needs one gram aggregate, never a doc x doc join. "
    "High values = corpus redundancy/mode collapse; the generated-"
    "data QC gate. Integer clipped sums, ratios rounded to 6",
)
def q272_self_bleu_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    sample = d.filter(hash_bucket(F.col("doc_id"), 1000) < _SB_SAMPLE).select(
        "doc_id", wcol.alias("w")
    )
    uni = sample.select("doc_id", F.lit(1).alias("n"), F.explode("w").alias("g"))
    bi = sample.filter(F.size("w") >= 2).select(
        "doc_id",
        F.lit(2).alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat(
                    F.element_at(F.col("w"), i.cast("int")),
                    F.lit(" "),
                    F.element_at(F.col("w"), (i + 1).cast("int")),
                ),
            )
        ).alias("g"),
    )
    tf = pin(
        uni.union(bi)
        .groupBy("doc_id", "n", "g")
        .agg(F.count("*").cast("long").alias("c"))
    )
    mw = W.partitionBy("n", "g")
    stats = (
        tf.withColumn("mx", F.max("c").over(mw))
        .groupBy("n", "g")
        .agg(
            F.max("c").alias("max1"),
            F.sum(F.when(F.col("c") == F.col("mx"), 1).otherwise(0))
            .cast("long")
            .alias("n_at_max"),
            F.max(F.when(F.col("c") < F.col("mx"), F.col("c"))).alias("max2"),
        )
    )
    ceiling = F.when(
        (F.col("c") == F.col("max1")) & (F.col("n_at_max") == 1),
        F.coalesce(F.col("max2"), F.lit(0)),
    ).otherwise(F.col("max1"))
    clipped = (
        tf.join(stats, ["n", "g"])
        .groupBy("doc_id", "n")
        .agg(
            F.sum(F.least(F.col("c"), ceiling)).cast("long").alias("match_c"),
            F.sum("c").cast("long").alias("tot_c"),
        )
    )
    piv = clipped.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 1, F.col("match_c"))).alias("m1"),
        F.max(F.when(F.col("n") == 1, F.col("tot_c"))).alias("t1"),
        F.max(F.when(F.col("n") == 2, F.col("match_c"))).alias("m2"),
        F.max(F.when(F.col("n") == 2, F.col("tot_c"))).alias("t2"),
    )
    p1 = F.col("m1").cast("double") / F.col("t1")
    p2 = F.coalesce(F.col("m2"), F.lit(0)).cast("double") / F.coalesce(
        F.col("t2"), F.lit(1)
    )
    return piv.select(
        "doc_id",
        F.col("t1").alias("n_tokens"),
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        F.round(F.sqrt(p1 * p2), 6).alias("self_bleu2"),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# q275 — inter-rater agreement (Cohen's kappa) between two quality
# raters: the length-window heuristic (q88's family) and a lexical-
# diversity rater (q263's family, in 2^30 fixed point so the cut is
# an integer compare). Kappa corrects raw agreement for chance — the
# number that says whether two cheap gates are redundant or
# complementary BEFORE anyone stacks them into a pipeline. The whole
# 2x2 table is exact integers; kappa is one double division.
# ---------------------------------------------------------------------------
@register(
    "q275_rater_kappa",
    r"""
    WITH m AS (
      SELECT doc_id, n_chars,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS n_tok,
             len(list_distinct(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> ''))) AS n_dis
      FROM documents
    ),
    stats AS (
      SELECT CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
             CAST(COUNT(*) AS BIGINT) AS n FROM m
    ),
    rated AS (
      SELECT doc_id,
             CASE WHEN m.n_chars * s.n * 2 >= s.tot_chars
                   AND m.n_chars * s.n <= s.tot_chars * 2
                  THEN 1 ELSE 0 END AS rater_len,
             CASE WHEN (CAST(m.n_dis AS BIGINT) << 30) // m.n_tok
                       >= 633318697
                  THEN 1 ELSE 0 END AS rater_div
      FROM m CROSS JOIN stats s
      WHERE m.n_tok > 0
    ),
    tab AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rater_len) AS BIGINT) AS a_pass,
             CAST(SUM(rater_div) AS BIGINT) AS b_pass,
             CAST(SUM(rater_len * rater_div) AS BIGINT) AS both_pass,
             CAST(SUM((1 - rater_len) * (1 - rater_div)) AS BIGINT)
               AS both_fail
      FROM rated
    )
    SELECT n, a_pass, b_pass, both_pass, both_fail,
           ROUND(CAST(both_pass + both_fail AS DOUBLE) / n, 6) AS po,
           ROUND((CAST(a_pass AS DOUBLE) * b_pass
                  + CAST(n - a_pass AS DOUBLE) * (n - b_pass))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           ROUND((CAST(both_pass + both_fail AS DOUBLE) / n
                  - (CAST(a_pass AS DOUBLE) * b_pass
                     + CAST(n - a_pass AS DOUBLE) * (n - b_pass))
                    / (CAST(n AS DOUBLE) * n))
                 / (1e0 - (CAST(a_pass AS DOUBLE) * b_pass
                           + CAST(n - a_pass AS DOUBLE) * (n - b_pass))
                          / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM tab
    """,
    doc="Cohen's kappa between the length-window rater (n_chars within "
    "[mean/2, 2*mean], exact cross-multiplied integers — no division) "
    "and the lexical-diversity rater (distinct/total tokens >= ~0.59 "
    "as a 2^30 fixed-point compare): observed agreement po, chance "
    "agreement pe from the marginals, kappa = (po-pe)/(1-pe). Near-1 "
    "kappa means the second gate adds nothing; near-0 means they "
    "screen different failures. 2x2 table exact; one corpus scan + "
    "a one-row broadcast of the mean",
)
def q275_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(w).alias("n_tok"),
        F.size(F.array_distinct(w)).alias("n_dis"),
    )
    stats = m.agg(
        F.sum("n_chars").cast("long").alias("tot_chars"),
        F.count("*").cast("long").alias("n"),
    )
    rated = (
        m.filter(F.col("n_tok") > 0)
        .crossJoin(F.broadcast(stats))
        .select(
            (
                (F.col("n_chars") * F.col("n") * 2 >= F.col("tot_chars"))
                & (F.col("n_chars") * F.col("n") <= F.col("tot_chars") * 2)
            )
            .cast("int")
            .alias("rater_len"),
            (
                F.expr("(cast(n_dis as bigint) * 1073741824) div n_tok")
                >= F.lit(633318697)
            )
            .cast("int")
            .alias("rater_div"),
        )
    )
    tab = rated.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rater_len").cast("long").alias("a_pass"),
        F.sum("rater_div").cast("long").alias("b_pass"),
        F.sum(F.col("rater_len") * F.col("rater_div"))
        .cast("long")
        .alias("both_pass"),
        F.sum((1 - F.col("rater_len")) * (1 - F.col("rater_div")))
        .cast("long")
        .alias("both_fail"),
    )
    po = (F.col("both_pass") + F.col("both_fail")).cast("double") / F.col("n")
    pe = (
        F.col("a_pass").cast("double") * F.col("b_pass")
        + (F.col("n") - F.col("a_pass")).cast("double")
        * (F.col("n") - F.col("b_pass"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return tab.select(
        "n",
        "a_pass",
        "b_pass",
        "both_pass",
        "both_fail",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )

# ---------------------------------------------------------------------------
# q289 — the Gopher rule panel (Rae et al. 2021, Table A1): every
# applicable Gopher quality rule as its own hash-checked pass flag
# plus the conjunctive verdict — the named filter set people actually
# cite, assembled in one narrow scan. Line-based rules (bullet/
# ellipsis line fractions) need newline structure the synthetic
# corpus lacks and are excluded BY NAME in the contract. All ratios
# are exact integer cross-multiplications — no divisions anywhere.
# ---------------------------------------------------------------------------
@register(
    "q289_gopher_panel",
    r"""
    WITH m AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
               AS sum_wlen,
             CAST(len(list_filter(w, x -> regexp_matches(x, '^[a-z]+$')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_filter(w,
                  x -> x IN ('the', 'be', 'to', 'of', 'and', 'that', 'have',
                             'with'))) AS BIGINT) AS n_stop,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               AS n_hash,
             CAST((length(text)
                   - length(replace(text, '...', ''))) // 3 AS BIGINT)
               AS n_ellipsis,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM m JOIN documents USING (doc_id)
    ),
    flags AS (
      SELECT doc_id, n_words,
             CAST(n_words >= 50 AND n_words <= 100000 AS INT) AS word_count_ok,
             CAST(sum_wlen >= 3 * n_words AND sum_wlen <= 10 * n_words AS INT)
               AS mean_word_len_ok,
             CAST(n_hash * 10 <= n_words AND n_ellipsis * 10 <= n_words AS INT)
               AS symbol_ratio_ok,
             CAST(n_alpha * 10 >= n_words * 8 AS INT) AS alpha_fraction_ok,
             CAST(n_stop >= 2 AS INT) AS stopword_ok
      FROM f
    )
    SELECT doc_id, n_words, word_count_ok, mean_word_len_ok, symbol_ratio_ok,
           alpha_fraction_ok, stopword_ok,
           CAST(word_count_ok * mean_word_len_ok * symbol_ratio_ok
                * alpha_fraction_ok * stopword_ok AS INT) AS gopher_pass
    FROM flags
    ORDER BY doc_id
    """,
    doc="the Gopher quality rules as a per-document panel: word count "
    "in [50, 100k], mean word length in [3, 10] (as the exact "
    "cross-multiplication 3n <= sum_len <= 10n), hash and ellipsis "
    "symbol ratios <= 0.1, >= 80% purely-alphabetic words, >= 2 of "
    "the paper's required stopwords — each rule its own flag, the "
    "verdict their product. Line-fraction rules (bullets/ellipsis "
    "line starts) are excluded by name: the synthetic corpus has no "
    "newline structure to judge. No divisions — every ratio is an "
    "integer comparison. One narrow scan",
)
def q289_gopher_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    stop = ["the", "be", "to", "of", "and", "that", "have", "with"]
    f = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("sum_wlen"),
        F.size(F.filter(w, lambda x: x.rlike("^[a-z]+$"))).cast("long").alias(
            "n_alpha"
        ),
        F.size(F.filter(w, lambda x: x.isin(stop))).cast("long").alias("n_stop"),
        (F.length("text") - F.length(F.replace("text", F.lit("#"), F.lit(""))))
        .cast("long")
        .alias("n_hash"),
        F.expr(
            "cast((length(text) - length(replace(text, '...', ''))) div 3"
            " as bigint)"
        ).alias("n_ellipsis"),
    )
    word_count_ok = ((F.col("n_words") >= 50) & (F.col("n_words") <= 100000)).cast("int")
    mwl_ok = (
        (F.col("sum_wlen") >= 3 * F.col("n_words"))
        & (F.col("sum_wlen") <= 10 * F.col("n_words"))
    ).cast("int")
    sym_ok = (
        (F.col("n_hash") * 10 <= F.col("n_words"))
        & (F.col("n_ellipsis") * 10 <= F.col("n_words"))
    ).cast("int")
    alpha_ok = (F.col("n_alpha") * 10 >= F.col("n_words") * 8).cast("int")
    stop_ok = (F.col("n_stop") >= 2).cast("int")
    return f.select(
        "doc_id",
        "n_words",
        word_count_ok.alias("word_count_ok"),
        mwl_ok.alias("mean_word_len_ok"),
        sym_ok.alias("symbol_ratio_ok"),
        alpha_ok.alias("alpha_fraction_ok"),
        stop_ok.alias("stopword_ok"),
        (word_count_ok * mwl_ok * sym_ok * alpha_ok * stop_ok)
        .cast("int")
        .alias("gopher_pass"),
    ).orderBy("doc_id")

# ---------------------------------------------------------------------------
# q299 — annotation-batch builder: a deterministic, stratified sample
# of near-dup candidate pairs for HUMAN labeling — two pairs per
# similarity decile chosen by md5 order, so every labeling round
# regenerates the identical batch (the reproducibility property
# labeling pipelines lose first), with strata that force coverage of
# the decision boundary instead of the easy extremes.
# ---------------------------------------------------------------------------
_ANNOT_PER_STRATUM = 2

def _annot_sql() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT id_a, id_b,
             FLOOR((n_common * 1.0
                    / (sa.set_size + sb.set_size - n_common))
                   * 1000000e0) / 1000000e0 AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ),
    strat AS (
      SELECT id_a, id_b, j,
             CAST(LEAST(9, FLOOR(j * 10)) AS INT) AS stratum,
             md5(CAST(id_a AS VARCHAR) || ':' || CAST(id_b AS VARCHAR))
               AS pick_key
      FROM jac
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY stratum
                                   ORDER BY pick_key, id_a, id_b) AS rn
      FROM strat
    )
    SELECT stratum, CAST(rn AS INT) AS slot, id_a, id_b, j AS jaccard
    FROM ranked WHERE rn <= {_ANNOT_PER_STRATUM}
    ORDER BY stratum, slot
    """


@register(
    "q299_annotation_batch",
    _annot_sql(),
    doc="stratified labeling batch over the exact-Jaccard pair space: "
    "two pairs per similarity decile, picked by md5(id_a:id_b) order "
    "— deterministic (reruns regenerate byte-identical batches), "
    "boundary-covering (every decile contributes, not just the "
    "near-0 mass), and total-ordered under ties. The pair scan is "
    "q33's df-capped machinery; selection is one bounded window. The "
    "labeled output is what trains/validates q111-style filters and "
    "calibrates q91's thresholds",
)
def q299_annotation_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    jac = dd.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.0, max_df=_MAX_DF
    ).select("id_a", "id_b", F.col("jaccard").alias("j"))
    strat = jac.select(
        "id_a",
        "id_b",
        "j",
        F.least(F.lit(9), F.floor(F.col("j") * 10)).cast("int").alias("stratum"),
        F.md5(
            F.concat(
                F.col("id_a").cast("string"),
                F.lit(":"),
                F.col("id_b").cast("string"),
            )
        ).alias("pick_key"),
    )
    ranked = strat.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("stratum").orderBy("pick_key", "id_a", "id_b")
        ),
    )
    return (
        ranked.filter(F.col("rn") <= _ANNOT_PER_STRATUM)
        .select(
            "stratum",
            F.col("rn").cast("int").alias("slot"),
            "id_a",
            "id_b",
            F.col("j").alias("jaccard"),
        )
        .orderBy("stratum", "slot")
    )

# ---------------------------------------------------------------------------
# q300 — corpus scorecard: the round-300 composition row — this
# session's new audit signals (template families, token entropy,
# Gopher pass rate) beside the classic identity counts, every number
# from a certified sibling query's exact arithmetic, assembled in one
# plan the way q150's data card and q250's readiness gate compose
# their generations' signals.
# ---------------------------------------------------------------------------
@register(
    "q300_corpus_scorecard",
    r"""
    WITH base AS (
      SELECT doc_id, text, md5(text) AS fp,
             md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS nfp,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    ident AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_content,
             CAST(COUNT(DISTINCT nfp) AS BIGINT) AS distinct_templates
      FROM base
    ),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(w) AS t FROM base)
      GROUP BY 1, 2
    ),
    ent AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_dis,
             CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12)))
                  AS DOUBLE) AS clnc
      FROM tf GROUP BY 1
    ),
    ment AS (
      SELECT CAST(SUM(CAST(CASE WHEN n_dis = 1 THEN 0e0
               ELSE (ln(CAST(n_tok AS DOUBLE)) - clnc / n_tok)
                    / ln(CAST(n_dis AS DOUBLE)) END AS DECIMAL(28,12)))
               AS DOUBLE) AS s_ent,
             CAST(COUNT(*) AS BIGINT) AS n_ent
      FROM ent
    ),
    gopher AS (
      SELECT CAST(SUM(CASE WHEN len(w) >= 50 AND len(w) <= 100000
                            AND list_sum(list_transform(w, x -> length(x)))
                                BETWEEN 3 * len(w) AND 10 * len(w)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base
    )
    SELECT i.n_docs, i.distinct_content,
           ROUND(1e0 - CAST(i.distinct_content AS DOUBLE) / i.n_docs, 6)
             AS exact_dup_rate,
           CAST(i.distinct_content - i.distinct_templates AS BIGINT)
             AS template_collapse,
           ROUND(CAST(g.n_pass AS DOUBLE) / g.n, 6) AS gopher_core_rate,
           ROUND(m.s_ent / m.n_ent, 6) AS mean_norm_entropy
    FROM ident i CROSS JOIN ment m CROSS JOIN gopher g
    """,
    doc="one-row corpus scorecard composing this round's audit "
    "signals: exact identity counts (docs, distinct content, dup "
    "rate), the TEMPLATE COLLAPSE (distinct raw contents minus "
    "distinct digit-normalized templates — how much of the 'unique' "
    "corpus is numeric stamping, q281's signal as a scalar), the "
    "core Gopher length/word-length pass rate, and the corpus mean "
    "normalized token entropy (q263's signal, DECIMAL-quantized "
    "sum). One scan feeding four aggregates — the health row a "
    "nightly pipeline alerts on",
)
def q300_corpus_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    base = pin(
        d.select(
            "doc_id",
            F.md5("text").alias("fp"),
            F.md5(F.regexp_replace("text", "[0-9]+", "#")).alias("nfp"),
            w.alias("w"),
        )
    )
    ident = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("fp").cast("long").alias("distinct_content"),
        F.count_distinct("nfp").cast("long").alias("distinct_templates"),
    )
    tf = (
        base.select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ent = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.count("*").cast("long").alias("n_dis"),
        F.sum(
            (F.col("c") * F.log(F.col("c").cast("double"))).cast("decimal(28,12)")
        )
        .cast("double")
        .alias("clnc"),
    )
    norm = F.when(F.col("n_dis") == 1, F.lit(0.0)).otherwise(
        (F.log(F.col("n_tok").cast("double")) - F.col("clnc") / F.col("n_tok"))
        / F.log(F.col("n_dis").cast("double"))
    )
    ment = ent.agg(
        F.sum(norm.cast("decimal(28,12)")).cast("double").alias("s_ent"),
        F.count("*").cast("long").alias("n_ent"),
    )
    sum_wlen = F.aggregate(
        F.transform(F.col("w"), lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    gopher = base.agg(
        F.sum(
            F.when(
                (F.size("w") >= 50)
                & (F.size("w") <= 100000)
                & (sum_wlen >= 3 * F.size("w"))
                & (sum_wlen <= 10 * F.size("w")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_pass"),
        F.count("*").cast("long").alias("n"),
    )
    return (
        ident.crossJoin(F.broadcast(ment))
        .crossJoin(F.broadcast(gopher))
        .select(
            "n_docs",
            "distinct_content",
            F.round(
                1.0 - F.col("distinct_content").cast("double") / F.col("n_docs"),
                6,
            ).alias("exact_dup_rate"),
            (F.col("distinct_content") - F.col("distinct_templates"))
            .cast("long")
            .alias("template_collapse"),
            F.round(F.col("n_pass").cast("double") / F.col("n"), 6).alias(
                "gopher_core_rate"
            ),
            F.round(F.col("s_ent") / F.col("n_ent"), 6).alias(
                "mean_norm_entropy"
            ),
        )
    )

# ---------------------------------------------------------------------------
# q311 — word-length shape anomaly: chi-square distance between each
# source's word-LENGTH histogram and the corpus's — the cheap
# "mojibake / structured garbage / wrong-parser" detector (broken
# decoding shifts length mass long before any LM notices). 2^30
# fixed-point expected counts (q151's chi2 discipline), lengths
# clamped into a 1..15+ histogram so the statistic is dimension-fixed.
# ---------------------------------------------------------------------------
@register(
    "q311_wordlen_shape_anomaly",
    r"""
    WITH words AS (
      SELECT source, LEAST(15, length(unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')))) AS wl
      FROM documents
    ),
    obs AS (SELECT source, wl, CAST(COUNT(*) AS BIGINT) AS o
            FROM words GROUP BY 1, 2),
    stot AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n FROM obs GROUP BY 1),
    corp AS (SELECT wl, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM corp),
    grid AS (
      SELECT s.source, w.wl, s.n, w.c, t.n_all,
             COALESCE(o.o, 0) AS o
      FROM stot s
      CROSS JOIN corp w
      CROSS JOIN ctot t
      LEFT JOIN obs o ON o.source = s.source AND o.wl = w.wl
    ),
    terms AS (
      SELECT source,
             CAST(SUM(CAST(CASE WHEN c > 0 THEN
               ((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * c / n_all)
                * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * c / n_all))
               / (CAST(n AS DOUBLE) * c / n_all)
               ELSE 0e0 END AS DECIMAL(28,12))) AS DOUBLE) AS chi2
      FROM grid GROUP BY 1
    )
    SELECT t.source, s.n AS n_words,
           ROUND(t.chi2, 6) AS chi2,
           ROUND(t.chi2 / s.n, 9) AS chi2_per_word,
           CAST(t.chi2 / s.n > 0.001e0 AS INT) AS shape_anomaly
    FROM terms t JOIN stot s USING (source)
    ORDER BY t.source
    """,
    doc="per-source word-length histogram vs the corpus shape: "
    "chi-square with expected counts n_source * corpus_share (lengths "
    "clamped at 15 so the histogram is dimension-fixed), normalized "
    "per word and flagged at 0.001 — the decoding/parser-failure "
    "smoke alarm that fires on length-mass shifts. Per-cell terms "
    "are DECIMAL-quantized before the sum (order-independent, the "
    "q94 discipline). One explode + two aggregates",
)
def q311_wordlen_shape_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    words = d.select(
        "source",
        F.explode(F.transform(w, lambda x: F.least(F.lit(15), F.length(x)))).alias(
            "wl"
        ),
    )
    obs = words.groupBy("source", "wl").agg(F.count("*").cast("long").alias("o"))
    stot = obs.groupBy("source").agg(F.sum("o").cast("long").alias("n"))
    corp = obs.groupBy("wl").agg(F.sum("o").cast("long").alias("c"))
    ctot = corp.agg(F.sum("c").cast("long").alias("n_all"))
    grid = (
        stot.crossJoin(F.broadcast(corp))
        .crossJoin(F.broadcast(ctot))
        .join(obs, ["source", "wl"], "left")
        .select(
            "source",
            "wl",
            "n",
            "c",
            "n_all",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    e = F.col("n").cast("double") * F.col("c") / F.col("n_all")
    term = F.when(
        F.col("c") > 0,
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
    ).otherwise(F.lit(0.0))
    terms = grid.groupBy("source").agg(
        F.sum(term.cast("decimal(28,12)")).cast("double").alias("chi2")
    )
    return (
        terms.join(stot, "source")
        .select(
            "source",
            F.col("n").alias("n_words"),
            F.round("chi2", 6).alias("chi2"),
            F.round(F.col("chi2") / F.col("n"), 9).alias("chi2_per_word"),
            (F.col("chi2") / F.col("n") > 0.001).cast("int").alias(
                "shape_anomaly"
            ),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q326 — RAKE keyword extraction (Rose et al.): candidate phrases are
# maximal stopword-free token runs; each word scores degree/frequency
# (degree = sum of lengths of phrases it appears in), a phrase scores
# the sum of its words' scores — the classic unsupervised keyword
# extractor beside q58's TF-IDF (RAKE rewards multi-word collocations
# TF-IDF fragments). Word scores are floored into 2^20 fixed point so
# phrase sums are exact BIGINTs; top-20 under (score desc, phrase).
# ---------------------------------------------------------------------------
_RAKE_FX = 1 << 20

_RAKE_STOP = (
    "the a an and or of to in on for with is are was were be as at by it "
    "this that from its has have not but"
).split()

_RAKE_TOPN = 20

def _rake_stop_sql() -> str:
    return ", ".join(f"'{w}'" for w in _RAKE_STOP)


@register(
    "q326_rake_keywords",
    rf"""
    WITH toks AS (
      SELECT doc_id, i AS pos, w[i] AS t,
             CASE WHEN w[i] IN ({_rake_stop_sql()}) THEN 1 ELSE 0 END AS stop
      FROM (SELECT doc_id, list_filter(
              string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w))) AS g(i)
    ),
    runs AS (
      SELECT doc_id, pos, t, stop,
             SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM toks
    ),
    cand AS (SELECT doc_id, run, pos, t FROM runs WHERE stop = 0),
    phr AS (
      SELECT doc_id, run,
             string_agg(t, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM cand GROUP BY 1, 2
    ),
    wstats AS (
      SELECT c.t,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS deg
      FROM cand c JOIN phr p ON p.doc_id = c.doc_id AND p.run = c.run
      GROUP BY 1
    ),
    wscore AS (
      SELECT t, (deg * {_RAKE_FX}) // freq AS score_fx FROM wstats
    ),
    pscore AS (
      SELECT p.phrase, p.plen,
             CAST(SUM(ws.score_fx) AS BIGINT) AS score_fx,
             p.doc_id, p.run
      FROM phr p
      JOIN cand c ON c.doc_id = p.doc_id AND c.run = p.run
      JOIN wscore ws ON ws.t = c.t
      GROUP BY 1, 2, 4, 5
    ),
    agg AS (
      SELECT phrase, CAST(MAX(plen) AS INT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(MAX(score_fx) AS BIGINT) AS score_fx
      FROM pscore GROUP BY 1
    )
    SELECT phrase, n_words, n_occurrences,
           ROUND(CAST(score_fx AS DOUBLE) / {_RAKE_FX}, 6) AS rake_score,
           CAST(ROW_NUMBER() OVER (ORDER BY score_fx DESC, phrase) AS INT)
             AS rnk
    FROM agg
    ORDER BY rnk
    LIMIT {_RAKE_TOPN}
    """,
    doc="RAKE keyword extraction: maximal stopword-free runs are the "
    "candidate phrases, word score = degree/frequency (degree sums "
    "the lengths of every phrase containing the word), phrase score "
    "sums its words' scores — Rose et al.'s collocation-rewarding "
    "complement to q58's TF-IDF keywords. Word scores floored into "
    "2^20 fixed point so phrase sums are exact BIGINTs; identical "
    "phrases score identically (MAX is a no-op disambiguator), "
    "top-20 under the (score desc, phrase) total order. One token "
    "explode + run windows + two bounded joins on the candidate set",
)
def q326_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select(
        "doc_id", F.posexplode(wcol).alias("pos0", "t")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "t",
        F.col("t").isin(_RAKE_STOP).cast("int").alias("stop"),
    )
    runs = toks.withColumn(
        "run",
        F.sum("stop").over(
            W.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    cand = pin(
        runs.filter(F.col("stop") == 0).select("doc_id", "run", "pos", "t")
    )
    phr = cand.groupBy("doc_id", "run").agg(
        F.concat_ws(
            " ", F.transform(F.sort_array(F.collect_list(F.struct("pos", "t"))), lambda s: s["t"])
        ).alias("phrase"),
        F.count("*").cast("long").alias("plen"),
    )
    phr = pin(phr)
    wstats = (
        cand.join(phr.select("doc_id", "run", "plen"), ["doc_id", "run"])
        .groupBy("t")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    wscore = wstats.select(
        "t", F.expr(f"(deg * {_RAKE_FX}) div freq").alias("score_fx")
    )
    pscore = (
        phr.join(cand, ["doc_id", "run"])
        .join(F.broadcast(wscore), "t")
        .groupBy("phrase", "plen", "doc_id", "run")
        .agg(F.sum("score_fx").cast("long").alias("score_fx"))
    )
    agg = pscore.groupBy("phrase").agg(
        F.max("plen").cast("int").alias("n_words"),
        F.count("*").cast("long").alias("n_occurrences"),
        F.max("score_fx").cast("long").alias("score_fx"),
    )
    return (
        agg.select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(F.col("score_fx").cast("double") / _RAKE_FX, 6).alias(
                "rake_score"
            ),
            F.row_number()
            .over(W.orderBy(F.col("score_fx").desc(), "phrase"))
            .cast("int")
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= _RAKE_TOPN)
        .orderBy("rnk")
    )

# ---------------------------------------------------------------------------
# q363 — language-ID confusion matrix: the q149 evaluation discipline
# applied to the q35 lang-id heuristic — predicted (stopword-voting,
# und on no hits) vs the labeled lang column, as the full confusion
# matrix with per-class totals, per-class recall/precision, and the
# overall accuracy. The fixture's 'zh' rows are the designed failure
# mode (no zh stopword seed exists), so the matrix shows exactly
# where the heuristic needs the fastText upgrade its docstring names.
# ---------------------------------------------------------------------------
def _langid_confusion_sql() -> str:
    langs = sorted(tx.LANG_STOPWORDS)
    score_exprs = ", ".join(
        "len(list_filter(ltoks, t -> list_contains({lst}, t))) AS s_{lang}".format(
            lst="[" + ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS[lang]) + "]",
            lang=lang,
        )
        for lang in langs
    )
    ordered = sorted(langs, reverse=True)
    gmax = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    lang_case = (
        f"CASE WHEN {gmax} <= 0 THEN 'und' "
        + " ".join(
            f"WHEN s_{lg} = {gmax} THEN '{lg}'" for lg in ordered
        )
        + " END"
    )
    return f"""
    WITH base AS (
      SELECT lang AS actual,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t <> '') AS ltoks
      FROM documents
    ),
    scored AS (SELECT actual, {score_exprs} FROM base),
    pred AS (SELECT actual, {lang_case} AS predicted FROM scored),
    cm AS (
      SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    at AS (SELECT actual, CAST(SUM(n) AS BIGINT) AS actual_total
           FROM cm GROUP BY 1),
    pt AS (SELECT predicted, CAST(SUM(n) AS BIGINT) AS predicted_total
           FROM cm GROUP BY 1),
    acc AS (
      SELECT CAST(SUM(CASE WHEN actual = predicted THEN n ELSE 0 END)
                  AS BIGINT) AS n_correct,
             CAST(SUM(n) AS BIGINT) AS n_all
      FROM cm
    )
    SELECT cm.actual, cm.predicted, cm.n,
           at.actual_total, pt.predicted_total,
           ROUND(CASE WHEN cm.actual = cm.predicted
                 THEN CAST(cm.n AS DOUBLE) / at.actual_total END, 6)
             AS class_recall,
           ROUND(CASE WHEN cm.actual = cm.predicted
                 THEN CAST(cm.n AS DOUBLE) / pt.predicted_total END, 6)
             AS class_precision,
           ROUND(CAST(a.n_correct AS DOUBLE) / a.n_all, 6) AS accuracy
    FROM cm
    JOIN at USING (actual)
    JOIN pt USING (predicted)
    CROSS JOIN acc a
    ORDER BY cm.actual, cm.predicted
    """


@register(
    "q363_langid_confusion",
    _langid_confusion_sql(),
    doc="language-ID evaluation: the q35 stopword-voting heuristic's "
    "full confusion matrix against the labeled lang column — per "
    "(actual, predicted) cell counts, class recall/precision on the "
    "diagonal, overall accuracy. The fixture's zh rows are the "
    "designed blind spot (no zh stopword seed): they land in "
    "'und'/misfires and quantify exactly the gap a fastText swap-in "
    "closes — the q149-style honest eval every classifier operator "
    "here carries (q111 -> q149, q193 -> q358, lang_id -> this). "
    "One narrow codegen pass + bounded matrix joins",
)
def q363_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    pred = d.select(
        F.col("lang").alias("actual"),
        tx.lang_id(F.col("text")).alias("predicted"),
    )
    # r10 ADR-0007 tail sweep: the confusion matrix feeds row/col
    # marginals, the accuracy aggregate and the output join — four cold
    # consumers in one action (each re-ran the lang_id scan); eager
    # hold probed -10% (0.65->0.59 min-of-3) and ends the query's
    # recurring sub-second vs-best jitter
    cm = hold(
        pred.groupBy("actual", "predicted").agg(
            F.count("*").cast("long").alias("n")
        )
    )
    at = cm.groupBy("actual").agg(
        F.sum("n").cast("long").alias("actual_total")
    )
    pt = cm.groupBy("predicted").agg(
        F.sum("n").cast("long").alias("predicted_total")
    )
    acc = cm.agg(
        F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.sum("n").cast("long").alias("n_all"),
    )
    diag = F.col("actual") == F.col("predicted")
    return (
        cm.join(F.broadcast(at), "actual")
        .join(F.broadcast(pt), "predicted")
        .crossJoin(F.broadcast(acc))
        .select(
            "actual",
            "predicted",
            "n",
            "actual_total",
            "predicted_total",
            F.round(
                F.when(diag, F.col("n").cast("double") / F.col("actual_total")),
                6,
            ).alias("class_recall"),
            F.round(
                F.when(
                    diag, F.col("n").cast("double") / F.col("predicted_total")
                ),
                6,
            ).alias("class_precision"),
            F.round(
                F.col("n_correct").cast("double") / F.col("n_all"), 6
            ).alias("accuracy"),
        )
        .orderBy("actual", "predicted")
    )
