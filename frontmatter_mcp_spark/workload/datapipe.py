"""Training-data pipeline workload: dedup, text analysis, similarity.

Every query wraps an operator from frontmatter_mcp_spark.operators and
carries a DuckDB oracle that recomputes the same math in SQL. Hash
functions are md5-keyed (portable across engines); floating-point paths
are either order-independent (decimal-exact) or verified bit-identical
sequential folds (see operators.similarity docstring).
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


def _minhash_sig_sql() -> str:
    return f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles,
           {_sig_exprs()}
    FROM sh GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# q30 — exact dedup: content-hash groups
# ---------------------------------------------------------------------------
@register(
    "q30_dedup_exact",
    """
    SELECT md5(text) AS content_fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
    FROM documents GROUP BY 1
    """,
    doc="exact dedup: md5 groupBy (one shuffle on a 16-byte key)",
)
def q30_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(d, "doc_id", "text").withColumnRenamed(
        "keeper_doc_id", "keeper_id"
    )


# ---------------------------------------------------------------------------
# q31 — minhash signatures (engine-portable keyed-md5 minhash)
# ---------------------------------------------------------------------------
@register(
    "q31_minhash_signatures",
    _minhash_sig_sql(),
    doc="MinHash signatures: k keyed-md5 min-hashes over word-3gram shingles",
)
def q31_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.minhash_signatures(d, "doc_id", "text", num_hashes=_NUM_HASHES)


# ---------------------------------------------------------------------------
# q32 — LSH candidate pairs (band-bucket collision join)
# ---------------------------------------------------------------------------
def _lsh_pairs_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


@register(
    "q32_lsh_candidates",
    _lsh_pairs_sql(),
    doc="MinHash-LSH: near-dup candidate pairs via band-bucket collisions "
    "(shuffle is O(corpus) on the bucket key, never all-pairs)",
)
def q32_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.lsh_candidate_pairs(d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS)


# ---------------------------------------------------------------------------
# q33 — exact n-gram Jaccard near-dup pairs (verification pass)
# ---------------------------------------------------------------------------
_JACCARD_THRESHOLD = 0.4
_MAX_DF = 50


@register(
    "q33_ngram_jaccard_pairs",
    f"""
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
    SELECT id_a, id_b, n_common,
           round(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common) >= {_JACCARD_THRESHOLD}
    """,
    doc="exact n-gram Jaccard pairs >= 0.4 (df-capped shingle self-join)",
)
def q33_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
    )


# ---------------------------------------------------------------------------
# q87 — exact n-gram containment pairs (partial-copy detector)
# ---------------------------------------------------------------------------
_CONTAINMENT_THRESHOLD = 0.5


@register(
    "q87_containment_pairs",
    f"""
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
    SELECT id_a, id_b, n_common,
           round(n_common * 1.0 / least(sa.set_size, sb.set_size), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_common * 1.0 / least(sa.set_size, sb.set_size) >= {_CONTAINMENT_THRESHOLD}
    """,
    doc="partial-copy detector: |A∩B| / min(|A|,|B|) >= 0.5 — catches a "
    "paragraph quoted inside a longer doc, which Jaccard scores near zero; "
    "same df-capped single-shuffle shingle pipeline as q33",
)
def q87_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.ngram_containment_pairs(
        d, "doc_id", "text", threshold=_CONTAINMENT_THRESHOLD, max_df=_MAX_DF
    )


# ---------------------------------------------------------------------------
# q34 — SimHash signatures
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 32


def _simhash_sql() -> str:
    # bit j = hex digit j of one md5 per token (matches dedup.simhash)
    bit_cases = ", ".join(
        f"""CASE WHEN list_sum(list_transform(toks, t ->
             CASE WHEN substr(md5(t), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END)) > 0
           THEN '1' ELSE '0' END"""
        for j in range(_SIMHASH_BITS)
    )
    return f"""
    SELECT doc_id, concat({bit_cases}) AS simhash
    FROM (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
          FROM documents)
    """


@register(
    "q34_simhash",
    _simhash_sql(),
    doc="SimHash: 32-bit per-doc signature from keyed-md5 bit votes (narrow map)",
)
def q34_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.simhash(d, "doc_id", "text", bits=_SIMHASH_BITS)


# ---------------------------------------------------------------------------
# q96 — SimHash banding candidates + Hamming verify (q34's blocking step)
# ---------------------------------------------------------------------------
_SIMHASH_BANDS = 4
_SIMHASH_MAX_HAMMING = 3
_SIMHASH_MAX_BUCKET = 40


def _simhash_pairs_sql() -> str:
    rpb = _SIMHASH_BITS // _SIMHASH_BANDS
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, substr(simhash, {b * rpb + 1}, {rpb}) AS slice"
        " FROM sigs"
        for b in range(_SIMHASH_BANDS)
    )
    hamming = " + ".join(
        f"CASE WHEN substr(sa.simhash, {j + 1}, 1) <> substr(sb.simhash, {j + 1}, 1)"
        " THEN 1 ELSE 0 END"
        for j in range(_SIMHASH_BITS)
    )
    return f"""
    WITH sigs AS ({_simhash_sql()}),
    banded_all AS ({band_rows}),
    small AS (
      SELECT band, slice FROM banded_all GROUP BY 1, 2
      HAVING COUNT(*) <= {_SIMHASH_MAX_BUCKET}
    ),
    banded AS (SELECT banded_all.* FROM banded_all JOIN small USING (band, slice)),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.slice = y.slice AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, CAST(({hamming}) AS INT) AS hamming
    FROM cand
    JOIN sigs sa ON sa.doc_id = id_a
    JOIN sigs sb ON sb.doc_id = id_b
    WHERE ({hamming}) <= {_SIMHASH_MAX_HAMMING}
    """


@register(
    "q96_simhash_candidates",
    _simhash_pairs_sql(),
    doc="SimHash banding candidates + full-width Hamming verify — the "
    "blocking step q34's signatures feed (SimHash's analogue of q32's "
    "MinHash-LSH banding). Pigeonhole-complete among surviving buckets "
    "(4 bands, max Hamming 3: a qualifying pair must share an exact "
    "8-bit slice); oversized band buckets are dropped pre-join (the "
    "df-cap discipline — identical-signature mega-clusters are q30's "
    "job), bounding candidates to O(buckets x cap^2)",
)
def q96_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.simhash_candidate_pairs(
        d,
        "doc_id",
        "text",
        bits=_SIMHASH_BITS,
        bands=_SIMHASH_BANDS,
        max_hamming=_SIMHASH_MAX_HAMMING,
        max_bucket=_SIMHASH_MAX_BUCKET,
        persist_fn=pin,
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
# q36 — brute-force cosine top-k (exact ANN baseline)
# ---------------------------------------------------------------------------
@register(
    "q36_ann_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id >= 5),
         pairs AS (
           SELECT qid, cid, {_duck_cos('qvec', 'cvec')} AS sim FROM q, c
         ),
         ranked AS (
           SELECT qid, cid, sim,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
           FROM pairs
         )
    SELECT qid, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """,
    doc="exact cosine top-10 for 5 query vectors: broadcast queries, scan once, rank",
)
def q36_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    out = sim.cosine_topk(q, c, k=10, query_vec="qvec", cand_vec="cvec")
    return out.withColumn("rank", F.col("rank").cast("int"))


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


def _centroid_cte() -> str:
    return f"""
    cents AS (
      SELECT label, list(mean_v ORDER BY pos) AS centroid
      FROM (
        SELECT label, i AS pos,
               {_fx_mean('CAST(embedding[i] AS DOUBLE)')} AS mean_v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i
      ) GROUP BY label
    )
    """


@register(
    "q37_ann_ivf",
    f"""
    WITH {_centroid_cte()},
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT qid, qvec, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY {_duck_cos('qvec', 'centroid')} DESC, label ASC) AS cell_rank
      FROM q, cents
    ),
    probed AS (SELECT qid, qvec, label FROM probe WHERE cell_rank <= 2),
    pairs AS (
      SELECT p.qid, e.vec_id AS cid, {_duck_cos('p.qvec', 'e.embedding')} AS sim
      FROM probed p JOIN embeddings e ON e.label = p.label
    ),
    ranked AS (
      SELECT qid, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
      FROM pairs
    )
    SELECT qid, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """,
    doc="IVF-style ANN: rank coarse cells per query, probe top-2, exact cosine inside",
)
def q37_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = sim.ivf_topk(q, e, k=10, nprobe=2)
    return out.withColumnRenamed("vec_id", "cid").withColumn(
        "rank", F.col("rank").cast("int")
    )


# ---------------------------------------------------------------------------
# q38 — embedding near-dup pairs within blocks
# ---------------------------------------------------------------------------
_COS_THRESHOLD = 0.3


@register(
    "q38_embedding_neardup",
    f"""
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           {_duck_cos('a.embedding', 'b.embedding')} AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_duck_cos('a.embedding', 'b.embedding')} >= {_COS_THRESHOLD}
    """,
    doc="embedding-cosine near-dup pairs, blocked by label (IVF cell at scale)",
)
def q38_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.neardup_pairs_by_cosine(e, threshold=_COS_THRESHOLD)


# ---------------------------------------------------------------------------
# q39 — label centroids (the IVF coarse quantizer itself, exact math)
# ---------------------------------------------------------------------------
@register(
    "q39_label_centroids",
    f"""
    SELECT label, CAST(i AS INT) AS dim,
           {_fx_mean('CAST(embedding[i] AS DOUBLE)')} AS mean_v,
           COUNT(*) AS n_vectors
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
    doc="per-label centroid components via fixed-point means (order-independent, "
    "map-side combined — no per-group array at any scale)",
)
def q39_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    return dims.groupBy("label", (F.col("pos") + 1).cast("int").alias("dim")).agg(
        vector.fixed_point_mean(F.col("v")).alias("mean_v"),
        F.count("*").alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# q81 — IVF probe over a label-PARTITIONED store (the 100 TB layout)
# ---------------------------------------------------------------------------
def _partitioned_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings re-materialized partitioned by the coarse cell id
    (label) — the layout a production IVF index uses so a cell probe is
    a partition-pruned read. Written once per scale factor into a temp
    store and reused; the data is identical to the source table."""
    import tempfile
    from pathlib import Path

    out = (
        Path(tempfile.gettempdir())
        / f"spark_graft_ivf_store_{Path(sf_dir).name}"
        / "emb_by_label"
    )
    if not (out / "_SUCCESS").exists():
        # repartition by the partition key first: one task owns each
        # cell, so the store is one file per cell instead of
        # (input-partitions x cells) fragments — at scale, compacted
        # cells are what makes the pruned probe read fast
        load_table(spark, sf_dir, "embeddings").repartition("label").write.mode(
            "overwrite"
        ).partitionBy("label").parquet(str(out))
    return spark.read.parquet(str(out))


@register(
    "q81_ivf_partitioned",
    f"""
    WITH {_centroid_cte()},
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT qid, qvec, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY {_duck_cos('qvec', 'centroid')} DESC, label ASC) AS cell_rank
      FROM q, cents
    ),
    probed AS (SELECT qid, qvec, label FROM probe WHERE cell_rank <= 2),
    pairs AS (
      SELECT p.qid, e.vec_id AS cid, {_duck_cos('p.qvec', 'e.embedding')} AS sim
      FROM probed p JOIN embeddings e ON e.label = p.label
    ),
    ranked AS (
      SELECT qid, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
      FROM pairs
    )
    SELECT qid, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """,
    doc="IVF probe against a label-partitioned parquet store: the broadcast "
    "probe set dynamic-partition-prunes the candidate scan (plan-gated), so "
    "only the probed cells' files are read — same results as q37",
)
def q81_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _partitioned_embeddings(spark, sf_dir)
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = sim.ivf_topk(q, store, k=10, nprobe=2)
    return out.withColumnRenamed("vec_id", "cid").withColumn(
        "rank", F.col("rank").cast("int")
    )


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


# ---------------------------------------------------------------------------
# q41 — sliding-window fingerprints: shift-resistant overlap pairs
# ---------------------------------------------------------------------------
@register(
    "q41_window_fingerprint_pairs",
    """
    WITH fps AS (
      SELECT DISTINCT doc_id, substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                                      w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                                      w[i+6] || ' ' || w[i+7]), 1, 16) AS fp
      FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_windows
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    doc="shift-resistant near-dup: docs sharing verbatim 8-token runs "
    "(rolling window fingerprints joined on the hash key)",
)
def q41_window_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        "doc_id", F.explode(tk.window_fingerprints(F.col("text"), window=8)).alias("fp")
    )
    a = fps.withColumnRenamed("doc_id", "id_a")
    b = fps.withColumnRenamed("doc_id", "id_b")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_windows"))
    )


# ---------------------------------------------------------------------------
# q42 — multimodal feature extraction (binary plumbing, stubbed decode)
# ---------------------------------------------------------------------------
def _mm_sql() -> str:
    # the deterministic fake decode, re-expressed in SQL over md5(text)
    b0 = "(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1"
    b1 = "(strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1"
    b2 = "(strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) * 16 + strpos('0123456789abcdef', substr(md5(text), 6, 1)) - 1"
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             text
      FROM documents
    )
    SELECT media_id, media_type,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS checksum,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(160 + (({b0}) % 12) * 160 AS INT) END AS width,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(120 + (({b1}) % 12) * 120 AS INT) END AS height,
           CASE WHEN media_type = 'audio'
                THEN octet_length(encode(text)) / 16000.0 END AS duration_s,
           CASE WHEN media_type = 'video'
                THEN CAST(1 + ({b2}) % 240 AS INT) END AS n_frames,
           CASE WHEN media_type = 'video'
                THEN array_to_string(
                    [CAST(x AS INT) FOR x IN generate_series(0, ({b2}) % 240) IF x % 30 = 0], ',')
                END AS sampled_frames
    FROM m
    """


@register(
    "q42_multimodal_features",
    _mm_sql(),
    doc="multimodal plumbing: binary payload column -> mapInPandas decode/probe "
    "stage (deterministic stub decode) -> typed feature columns incl. "
    "frame-sample arrays",
)
def q42_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = mm.synthesize_media(d, "doc_id", "text", "source")
    # The operator returns a real array<int> frame-sample column; the driver's
    # canonicalizer can only hash scalars, so the workload projection joins it
    # into a deterministic comma-separated string (same on the DuckDB side).
    feats = mm.extract_features(media)
    return feats.withColumn(
        "sampled_frames",
        F.array_join(F.transform("sampled_frames", lambda x: x.cast("string")), ","),
    )


# ---------------------------------------------------------------------------
# q43 — random-hyperplane LSH ANN (bucketed similarity search)
# ---------------------------------------------------------------------------
_LSH_NBITS = 4
_LSH_DIM = 64


def _lsh_sql() -> str:
    planes = sim.hyperplanes(_LSH_DIM, _LSH_NBITS)
    bits = []
    for plane in planes:
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            f"list_sum([CAST(e[i] AS DOUBLE) * ({arr}::DOUBLE[])[i] "
            f"FOR i IN generate_series(1, len(e))])"
        )
        bits.append(f"CASE WHEN {dot} > 0 THEN '1' ELSE '0' END")
    bucket = "concat(" + ", ".join(bits) + ")"
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, {bucket.replace('e[i]', 'embedding[i]').replace('len(e)', 'len(embedding)')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qvec, bucket FROM b WHERE vec_id < 5),
    c AS (SELECT vec_id AS cid, embedding AS cvec, bucket FROM b WHERE vec_id >= 5),
    pairs AS (
      SELECT q.qid, q.bucket, c.cid, {_duck_cos('q.qvec', 'c.cvec')} AS sim
      FROM q JOIN c ON q.bucket = c.bucket
    ),
    ranked AS (
      SELECT qid, bucket, cid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
      FROM pairs
    )
    SELECT qid, bucket, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """


@register(
    "q43_ann_lsh",
    _lsh_sql(),
    doc="random-hyperplane LSH ANN: deterministic md5-derived planes, "
    "bucket join instead of full scan (bucket-pruned at scale)",
)
def q43_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    out = sim.lsh_topk(q, c, dim=_LSH_DIM, nbits=_LSH_NBITS, k=10)
    return out.withColumn("rank", F.col("rank").cast("int"))


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


def _duck_probe_list(bucket: str, nbits: int, radius: int) -> str:
    """DuckDB list of the bucket plus every Hamming-distance<=radius
    flip — mirrors similarity.probe_buckets (same combination order)."""
    from itertools import combinations

    def flipped(positions: tuple[int, ...]) -> str:
        chars = []
        for j in range(1, nbits + 1):
            ch = f"substr({bucket}, {j}, 1)"
            if (j - 1) in positions:
                ch = f"(CASE WHEN {ch} = '1' THEN '0' ELSE '1' END)"
            chars.append(ch)
        return " || ".join(chars)

    variants = [bucket]
    for r in range(1, radius + 1):
        variants.extend(flipped(c) for c in combinations(range(nbits), r))
    return "list_value(" + ", ".join(variants) + ")"


# the calibration matrix: bucket width x probe radius. Wider codes make
# emptier buckets (cheaper probes, worse single-probe recall) which
# larger radii claw back — the measurement that picks the operating
# point before a 100 TB rollout.
_LSH_RECALL_CONFIGS = [
    ("nbits4_r0", 4, 0),
    ("nbits4_r1", 4, 1),
    ("nbits6_r1", 6, 1),
    ("nbits6_r2", 6, 2),
]


def _lsh_recall_sql() -> str:
    blocks = []
    selects = []
    for tag, nbits, radius in _LSH_RECALL_CONFIGS:
        blocks.append(
            f"""b_{tag} AS (
      SELECT vec_id, embedding, {_duck_lsh_bucket('embedding', nbits)} AS bucket
      FROM embeddings
    ),
    probes_{tag} AS (
      SELECT qid, qvec, probe
      FROM (SELECT vec_id AS qid, embedding AS qvec, bucket
            FROM b_{tag} WHERE vec_id < 5) q,
           UNNEST({_duck_probe_list('bucket', nbits, radius)}) AS t(probe)
    ),
    got_{tag} AS (
      SELECT qid, cid FROM (
        SELECT p.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.qid
                                  ORDER BY {_duck_cos('p.qvec', 'c.cvec')} DESC, c.cid ASC) AS rank
        FROM probes_{tag} p
        JOIN (SELECT vec_id AS cid, embedding AS cvec, bucket
              FROM b_{tag} WHERE vec_id >= 5) c
          ON p.probe = c.bucket
      ) WHERE rank <= 10
    ),
    hits_{tag} AS (
      SELECT t.qid, COUNT(*) AS n FROM truth t JOIN got_{tag} g
        ON t.qid = g.qid AND t.cid = g.cid GROUP BY t.qid
    )"""
        )
        selects.append(
            f"""SELECT '{tag}' AS method, q.qid,
           CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
           COALESCE(h.n, 0) / 10.0 AS recall_at_10
    FROM (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 5) q
    LEFT JOIN hits_{tag} h ON q.qid = h.qid"""
        )
    return (
        """
    WITH q0 AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    c0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id >= 5),
    truth AS (
      SELECT qid, cid FROM (
        SELECT q0.qid, c0.cid,
               ROW_NUMBER() OVER (PARTITION BY q0.qid
                                  ORDER BY """
        + _duck_cos("q0.qvec", "c0.cvec")
        + """ DESC, c0.cid ASC) AS rank
        FROM q0, c0
      ) WHERE rank <= 10
    ),
    """
        + ",\n    ".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@register(
    "q82_lsh_recall",
    _lsh_recall_sql(),
    doc="ANN recall calibration matrix: (bucket width x Hamming probe "
    "radius) scored against brute-force ground truth per query — wider "
    "codes make emptier buckets, larger radii claw recall back; the "
    "measurement that picks the (nbits, probe_radius) operating point "
    "before a 100 TB rollout",
)
def q82_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    # the brute-force ground truth feeds all four config branches — the
    # unioned plan would recompute the 5 x corpus cosine ranking once
    # per branch (the q91 lesson); the pinned table is |queries| x k rows
    truth = pin(sim.cosine_topk(q, c, k=10).select("qid", "cid"))
    qids = q.select("qid")
    outs = []
    for method, nbits, radius in _LSH_RECALL_CONFIGS:
        got = sim.lsh_topk(
            q, c, dim=_LSH_DIM, nbits=nbits, k=10, probe_radius=radius
        ).select("qid", "cid")
        hits = truth.join(got, ["qid", "cid"]).groupBy("qid").agg(
            F.count("*").alias("n")
        )
        outs.append(
            qids.join(hits, "qid", "left").select(
                F.lit(method).alias("method"),
                "qid",
                F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_hits"),
                (F.coalesce(F.col("n"), F.lit(0)) / F.lit(10.0)).alias("recall_at_10"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# q44 — embed() UDF verified bit-for-bit by a SQL oracle
# ---------------------------------------------------------------------------
def _embed_sql(dim: int = 64) -> str:
    hexv = "(strpos('0123456789abcdef', substr(md5(t || '|{c}'), {p}, 1)) - 1)"
    exprs = []
    for i in range(dim):
        c, j = i // 16, i % 16
        b = (
            hexv.format(c=c, p=2 * j + 1)
            + " * 16 + "
            + hexv.format(c=c, p=2 * j + 2)
        )
        exprs.append(f"list_sum([({b}) / 255.0 - 0.5 FOR t IN toks])")
    raw = "[" + ",\n             ".join(exprs) + "]"
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    raw AS (SELECT doc_id, {raw} AS r FROM base),
    n AS (SELECT doc_id, r, sqrt(list_sum([x * x FOR x IN r])) AS norm FROM raw)
    SELECT doc_id, CAST(i AS INT) AS dim,
           -- REAL round-trip: the pandas UDF returns array<float> (f32),
           -- so the oracle must apply the same float32 rounding
           CAST(CAST(CASE WHEN norm > 0 THEN r[i] / norm ELSE r[i] END AS REAL) AS DOUBLE) AS val
    FROM n, UNNEST(generate_series(1, {dim})) AS t(i)
    """


@register(
    "q44_embed_vectors",
    _embed_sql(),
    doc="the embed() pandas UDF itself, bit-for-bit verified: the hash "
    "embedder's chunk-keyed md5 construction recomputed in pure SQL",
)
def q44_embed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.semantic.model import EmbeddingModel
    from frontmatter_mcp_spark.semantic.query import register_embed_udf

    register_embed_udf(spark, EmbeddingModel(dim=64))
    d = load_table(spark, sf_dir, "documents")
    vec = d.select("doc_id", F.expr("embed(text)").alias("v"))
    return vec.select(
        "doc_id",
        F.posexplode(F.col("v").cast("array<double>")).alias("pos", "val"),
    ).select("doc_id", (F.col("pos") + 1).cast("int").alias("dim"), "val")


# ---------------------------------------------------------------------------
# q45 — end-to-end semantic search: embed a query string, rank documents
# by cosine against embed(text) (the reference's headline README flow,
# oracle-checked all the way through the UDF)
# ---------------------------------------------------------------------------
_SEARCH_QUERY = "spark join order batch window"


def _semantic_search_sql(dim: int = 64, k: int = 20) -> str:
    # per-doc embed vector CTE identical to q44's oracle, plus one for the
    # literal query string, then a double-precision cosine fold over the
    # float32-rounded components
    hexv = "(strpos('0123456789abcdef', substr(md5(t || '|{c}'), {p}, 1)) - 1)"
    exprs = []
    for i in range(dim):
        c, j = i // 16, i % 16
        b = hexv.format(c=c, p=2 * j + 1) + " * 16 + " + hexv.format(c=c, p=2 * j + 2)
        exprs.append(f"CAST(list_sum([({b}) / 255.0 - 0.5 FOR t IN toks]) AS DOUBLE)")
    raw = "[" + ", ".join(exprs) + "]"
    dot = "list_sum([CAST(a.v[i] AS DOUBLE) * b.v[i] FOR i IN generate_series(1, len(a.v))])"
    na = "sqrt(list_sum([CAST(a.v[i] AS DOUBLE) * a.v[i] FOR i IN generate_series(1, len(a.v))]))"
    nb = "sqrt(list_sum([CAST(b.v[i] AS DOUBLE) * b.v[i] FOR i IN generate_series(1, len(b.v))]))"
    return f"""
    WITH src AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
      UNION ALL
      SELECT -1 AS doc_id,
             list_filter(string_split_regex(lower('{_SEARCH_QUERY}'), '\\s+'), t -> t <> '') AS toks
    ),
    raw AS (SELECT doc_id, {raw} AS r FROM src),
    n AS (SELECT doc_id, sqrt(list_sum([x * x FOR x IN r])) AS norm, r FROM raw),
    vecs AS (
      SELECT doc_id,
             [CAST(CASE WHEN norm > 0 THEN x / norm ELSE x END AS REAL) FOR x IN r] AS v
      FROM n
    ),
    scored AS (
      SELECT a.doc_id, {dot} / ({na} * {nb}) AS score
      FROM vecs a, vecs b
      WHERE a.doc_id >= 0 AND b.doc_id = -1
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT {k}
    """


@register(
    "q45_semantic_search",
    _semantic_search_sql(),
    doc="semantic search end-to-end: embed(query) vs embed(text) cosine top-k "
    "(the reference README flow), oracle-checked through the UDF",
)
def q45_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.functions.vector import cosine_similarity
    from frontmatter_mcp_spark.semantic.model import EmbeddingModel
    from frontmatter_mcp_spark.semantic.query import register_embed_udf

    register_embed_udf(spark, EmbeddingModel(dim=64))
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.expr("embed(text)").alias("v"))
    qv = spark.sql(f"SELECT embed('{_SEARCH_QUERY}') AS qv")
    scored = docs.crossJoin(F.broadcast(qv)).select(
        "doc_id", cosine_similarity(F.col("v"), F.col("qv")).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


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


def _kmeans_sql(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    return (
        "WITH "
        + _kmeans_ctes(k, iters)
        + f"""
    SELECT vec_id, CAST(cid AS INT) AS cluster FROM a{iters}
    """
    )


@register(
    "q48_kmeans_clusters",
    _kmeans_sql(),
    doc="Lloyd's k-means coarse quantizer (k=8, 3 iterations), every "
    "iteration bit-deterministic and replayed by the SQL oracle",
)
def q48_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS)


# ---------------------------------------------------------------------------
# q49 — IVF ANN over k-means cells end-to-end: quantize, probe, rank
# ---------------------------------------------------------------------------
@register(
    "q49_ann_ivf_kmeans",
    f"""
    WITH {_kmeans_ctes()},
    fincent AS (SELECT cid, cent FROM c{_KMEANS_ITERS}),
    assigned AS (
      SELECT e.vec_id, e.embedding, a.cid
      FROM embeddings e JOIN a{_KMEANS_ITERS} a USING (vec_id)
    ),
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    probe AS (
      SELECT qid, qvec, cid,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY {_duck_cos('qvec', 'cent')} DESC, cid ASC) AS cell_rank
      FROM q, fincent
    ),
    probed AS (SELECT qid, qvec, cid FROM probe WHERE cell_rank <= 2),
    pairs AS (
      SELECT p.qid, c.vec_id AS cand_id, {_duck_cos('p.qvec', 'c.embedding')} AS sim
      FROM probed p JOIN assigned c ON c.cid = p.cid
    ),
    ranked AS (
      SELECT qid, cand_id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cand_id ASC) AS rank
      FROM pairs
    )
    SELECT qid, cand_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """,
    doc="the full IVF pipeline: k-means quantizer (q48) -> cell-pruned probe "
    "(nprobe=2) -> exact cosine ranking; at scale the table is bucketed by "
    "the cell id so the probe is a partition-pruned read",
)
def q49_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    clustered = e.join(
        kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS), "vec_id"
    ).select("vec_id", "embedding", "cluster")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = sim.ivf_topk(q, clustered, k=10, nprobe=2, label_col="cluster")
    return out.select(
        "qid",
        F.col("vec_id").alias("cand_id"),
        "sim",
        F.col("rank").cast("int").alias("rank"),
    )


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


@register(
    "q56_neardup_groups",
    _neardup_groups_sql(),
    doc="near-dup group ids via min-label propagation over the Jaccard "
    "pair graph (fixed iterations, oracle-replayed) - keeper selection",
)
def q56_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # pin the edge list: the propagation rounds nest it O(2^iters) times
    # into the final plan (see neardup_groups) — measured ~1.5x on the
    # full query at sf0.1 (5.5s -> 3.7s controlled; dedup.py records the
    # same number)
    return dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )


# ---------------------------------------------------------------------------
# q57 — deterministic hash split + stratified sampling (training-mix ops)
# ---------------------------------------------------------------------------
_SAMPLE_RATES = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 0.8, "zh": 1.0}


from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql as _hash_bucket_duck  # noqa: E402


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
# q84 — PII/safety profile (regex counters + composite risk score)
# ---------------------------------------------------------------------------
# patterns restricted to syntax RE2 (DuckDB) and java.util.regex agree on
_PII_PATTERNS = {
    "n_emails": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "n_urls": r"https?://[^ ]+",
    "n_phones": r"\d{3}[-.]\d{3,4}[-.]\d{4}",
    "n_long_digit_runs": r"\d{9,}",
}


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


# q85 — per-source length-outlier filter (exact-percentile fences)
# ---------------------------------------------------------------------------
# fences at 1/32 and 31/32: exact binary fractions, so Spark `percentile`
# and DuckDB `quantile_cont` interpolate bit-identically (the q24 technique)
_LEN_P_LOW = 1 / 32
_LEN_P_HIGH = 31 / 32


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
# q86 — bloom-prefiltered incremental dedup (prune BEFORE the shuffle)
# ---------------------------------------------------------------------------
_BLOOM_M = 4096  # bit positions
_BLOOM_K = 3  # hashes per fingerprint


def _bloom_positions(fp: Column) -> Column:
    """k bit positions from non-overlapping 8-hex-digit slices of the md5
    fingerprint — engine-portable (no internal hash functions)."""
    return F.array(
        *[
            (F.conv(F.substring(fp, 1 + 8 * i, 8), 16, 10).cast("long") % _BLOOM_M).cast(
                "int"
            )
            for i in range(_BLOOM_K)
        ]
    )


@register(
    "q86_bloom_prefilter_dedup",
    f"""
    WITH tagged AS (
      SELECT doc_id, md5(text) AS fp, {{b}} AS batch
      FROM documents
    )
    SELECT DISTINCT i.doc_id
    FROM tagged i JOIN tagged e ON i.fp = e.fp
    WHERE i.batch = 'incoming' AND e.batch = 'existing'
    """.format(b=tables.ingest_batch_sql("doc_id")),
    doc="incremental exact dedup with a bloom prefilter: the existing "
    "batch's fingerprints build a compact bit-position set (bounded "
    "collect_set <= M, broadcast as one row); incoming docs failing ANY "
    "of the k membership bits never reach the join shuffle. The exact "
    "fingerprint join then removes bloom false positives, so the result "
    "is identical to the plain exact join (the oracle) — at 100 TB the "
    "bloom turns a full-corpus shuffle into a shuffle of candidate hits. "
    "The corpus/batch split comes from the loader's ingest_batch column "
    "(tables.load_documents_batched), not a per-query filter",
)
def q86_bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(tables.load_documents_batched(spark, sf_dir), "doc_id")
    tagged = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.col("ingest_batch").alias("batch"),
    )
    existing = tagged.filter(F.col("batch") == "existing")
    incoming = tagged.filter(F.col("batch") == "incoming")
    bloom = (
        existing.select(F.explode(_bloom_positions(F.col("fp"))).alias("p"))
        .agg(F.collect_set("p").alias("bits"))
    )
    prefiltered = incoming.crossJoin(F.broadcast(bloom)).filter(
        F.forall(
            _bloom_positions(F.col("fp")), lambda p: F.array_contains(F.col("bits"), p)
        )
    )
    return (
        prefiltered.join(existing.select("fp"), "fp", "left_semi")
        .select("doc_id")
        .distinct()
    )


# q88 — composite quality gate (one scan, one broadcast, all filters)
# ---------------------------------------------------------------------------
_MIN_TOKENS = 5


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
# q58 — TF-IDF keyword extraction (top-3 terms per document)
# ---------------------------------------------------------------------------
@register(
    "q58_tfidf_keywords",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * ln(n.n_docs * 1.0 / dfreq.df) AS score
      FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
      SELECT doc_id, term, tf, df, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS INT) AS tf, CAST(df AS INT) AS df,
           round(score, 6) AS score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="TF-IDF keyword extraction: tf and df aggregate map-side, ranking "
    "windows over tiny per-doc term lists",
)
def q58_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return tx.tfidf_top_terms(d, "doc_id", "text", top_k=3)


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


@register(
    "q59_boilerplate_spans",
    f"""
    WITH {_SPANS_CTE}
    SELECT span, CAST(COUNT(*) AS INT) AS n_docs, MIN(doc_id) AS first_doc_id
    FROM sp GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    doc="boilerplate detection: word 4-gram spans repeated across >= 2 "
    "docs (headers/footers/templates a cleaning pass strips); shuffle "
    "carries one row per distinct (span, doc)",
)
def q59_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.boilerplate_spans(d, "doc_id", "text", span_n=_SPAN_N, min_docs=2)


# ---------------------------------------------------------------------------
# q60 — train/test decontamination scan (benchmark-leakage n-gram overlap)
# ---------------------------------------------------------------------------
@register(
    "q60_decontamination",
    f"""
    WITH {_SPANS_CTE},
    splits AS (
      SELECT doc_id,
             CASE WHEN {_hash_bucket_duck('doc_id')} < 800 THEN 'train'
                  WHEN {_hash_bucket_duck('doc_id')} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    test_spans AS (
      SELECT DISTINCT span FROM sp JOIN splits USING (doc_id) WHERE split = 'test'
    )
    SELECT sp.doc_id, CAST(COUNT(*) AS INT) AS n_shared_spans
    FROM sp JOIN splits USING (doc_id) JOIN test_spans USING (span)
    WHERE split = 'train'
    GROUP BY 1
    """,
    doc="decontamination: train docs sharing any word 4-gram with the "
    "held-out test split (hash-bucket split, q57's rule); one shuffle on "
    "the span key, never broadcast (test spans are corpus-sized)",
)
def q60_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import sampling as smp

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id").withColumn(
        "split", smp.assign_split(F.col("doc_id"))
    )
    return dd.decontaminate(d, "doc_id", "text", "split", span_n=_SPAN_N)


# ---------------------------------------------------------------------------
# q93 — duplicate-span REMOVAL: scrub repeated spans, keep the documents
# (the rewrite counterpart of q59's detection — ExactSubstr-style dedup)
# ---------------------------------------------------------------------------
@register(
    "q93_duplicate_span_removal",
    f"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS token
            FROM toks, UNNEST(generate_series(1, len(w))) AS t(i)),
    sp AS (SELECT doc_id, i - 1 AS start,
                  w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS span
           FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
           WHERE len(w) >= 4),
    dup AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM sp)
            GROUP BY span HAVING COUNT(*) >= 2),
    cov AS (SELECT DISTINCT sp.doc_id, start + j AS pos
            FROM sp JOIN dup USING (span),
                 UNNEST(generate_series(0, {_SPAN_N - 1})) AS u(j)),
    kept AS (SELECT t.doc_id, t.pos, t.token FROM tok t
             LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
             WHERE c.pos IS NULL),
    reb AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens_kept,
                   string_agg(token, ' ' ORDER BY pos) AS cleaned_text
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(string_split_regex(trim(d.text), '\\s+')) AS INT) AS n_tokens,
           COALESCE(reb.n_tokens_kept, 0) AS n_tokens_kept,
           COALESCE(reb.cleaned_text, '') AS cleaned_text
    FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
    """,
    doc="ExactSubstr-style duplicate-span removal (Lee et al. 2022, the "
    "scrub variant of q59): token positions covered by a word 4-gram "
    "span occurring in >= 2 distinct docs are dropped and every doc is "
    "rebuilt from its surviving tokens in order — integer/string math "
    "only, so the rewrite is hash-verified cross-engine. One "
    "groupBy(span) with map-side partials + one span-key join + one "
    "per-doc rebuild with an array_sort (no window exchange)",
)
def q93_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.remove_duplicate_spans(d, "doc_id", "text", span_n=_SPAN_N, min_docs=2)


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
# q61 — Gopher-style repetition / quality signals per document
# ---------------------------------------------------------------------------
@register(
    "q61_repetition_profile",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT doc_id, unnest(w) AS wd FROM toks),
    wc AS (SELECT doc_id, wd, COUNT(*) AS c FROM words GROUP BY 1, 2),
    ws AS (
      SELECT doc_id, CAST(SUM(c) AS INT) AS n_words,
             CAST(COUNT(*) AS INT) AS n_distinct_words,
             CAST(MAX(c) AS INT) AS top_word_count
      FROM wc GROUP BY 1
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    bs AS (
      SELECT doc_id, CAST(SUM(c) AS INT) AS n_bigrams,
             CAST(MAX(c) AS INT) AS top_bigram_count
      FROM bc GROUP BY 1
    )
    SELECT ws.doc_id, n_words, n_distinct_words,
           round(CAST(n_distinct_words AS DOUBLE) / n_words, 6) AS distinct_ratio,
           round(CAST(top_word_count AS DOUBLE) / n_words, 6) AS top_word_frac,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           round(CAST(top_bigram_count AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
    FROM ws LEFT JOIN bs USING (doc_id)
    """,
    doc="Gopher-style repetition signals: top-word / top-bigram token "
    "fractions + lexical diversity per doc (integer counts, single "
    "divisions - engine-portable)",
)
def q61_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return tx.repetition_profile(d, "doc_id", "text")


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
# q63 — vocabulary build with cumulative coverage (tokenizer prep)
# ---------------------------------------------------------------------------
@register(
    "q63_vocab_coverage",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    words AS (SELECT unnest(w) AS term FROM toks),
    counts AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM counts)
    SELECT term, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS INT) AS rank,
           CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cnt,
           round(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) / (SELECT total FROM tot), 6) AS coverage
    FROM counts
    """,
    doc="vocabulary building: global term frequencies with cumulative "
    "corpus coverage (how big a vocab covers X% of tokens). The window "
    "is over the AGGREGATED vocab (small), not the corpus",
)
def q63_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(tx.tokens(F.lower(F.col("text")))).alias("term"))
    counts = words.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    # single-partition window: safe because it runs over the aggregated
    # vocabulary (|vocab| rows), not the token stream
    w = W.orderBy(F.desc("cnt"), F.asc("term")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "term",
            "cnt",
            F.row_number().over(w).cast("int").alias("rank"),
            F.sum("cnt").over(w).alias("cum_cnt"),
            F.round(
                F.sum("cnt").over(w).cast("double") / F.col("total"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# q64 — int8 embedding quantization (index compression)
# ---------------------------------------------------------------------------
@register(
    "q64_embedding_quantize",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    d AS (
      SELECT i AS pos, MIN(x[i]) AS dmin, MAX(x[i]) AS dmax
      FROM v, UNNEST(generate_series(1, len(x))) AS t(i)
      GROUP BY 1
    ),
    c AS (
      SELECT v.vec_id, d.pos, x[d.pos] AS xv, d.dmin, d.dmax,
             CAST(GREATEST(LEAST(
               CASE WHEN d.dmax - d.dmin > 0
                    THEN floor((x[d.pos] - d.dmin) * 255.0 / (d.dmax - d.dmin))
                    ELSE 0 END, 255), 0) AS INT) AS code
      FROM v, UNNEST(generate_series(1, len(x))) AS t(i)
      JOIN d ON d.pos = i
    ),
    e AS (
      SELECT vec_id, pos, code,
             (xv - (CAST(code AS DOUBLE) * (dmax - dmin) / 255.0 + dmin))
             * (xv - (CAST(code AS DOUBLE) * (dmax - dmin) / 255.0 + dmin)) AS err
      FROM c
    )
    SELECT vec_id, CAST(COUNT(*) AS INT) AS n_dims,
           md5(array_to_string(list(CAST(code AS VARCHAR) ORDER BY pos), ',')) AS codes_fp,
           round(list_sum(list_sort(list(err))), 12) AS recon_err
    FROM e GROUP BY vec_id
    """,
    doc="per-dimension int8 scalar quantization of the embedding table "
    "(4x index shrink before ANN serving); dim stats ride into a "
    "shuffle-free encode map as literals, like the k-means assignment",
)
def q64_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import quantize as qz

    e = load_table(spark, sf_dir, "embeddings")
    return qz.int8_quantize(e, "vec_id", "embedding")


# ---------------------------------------------------------------------------
# q70 — incremental ingestion dedup: new batch vs existing corpus
# ---------------------------------------------------------------------------
@register(
    "q70_incremental_dedup",
    f"""
    WITH tagged AS (
      SELECT doc_id, text, {tables.ingest_batch_sql('doc_id')} AS batch
      FROM documents
    ),
    exact_hit AS (
      SELECT DISTINCT i.doc_id
      FROM tagged i JOIN tagged e
        ON e.batch = 'existing' AND i.batch = 'incoming'
       AND md5(e.text) = md5(i.text)
    ),
    toks AS (SELECT doc_id, batch, string_split_regex(trim(text), '\\s+') AS w FROM tagged),
    sh AS (
      SELECT DISTINCT doc_id, batch, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
      WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT i.doc_id, i_sz.set_size AS size_i, e_sz.set_size AS size_e, COUNT(*) AS n_common
      FROM sh i
      JOIN sh e ON e.shingle = i.shingle AND e.batch = 'existing' AND i.batch = 'incoming'
      JOIN sizes i_sz ON i_sz.doc_id = i.doc_id
      JOIN sizes e_sz ON e_sz.doc_id = e.doc_id
      GROUP BY 1, 2, 3
    ),
    near_hit AS (
      SELECT DISTINCT doc_id FROM inter
      WHERE n_common * 1.0 / (size_i + size_e - n_common) >= 0.6
    )
    SELECT t.doc_id,
           CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nh.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS verdict
    FROM tagged t
    LEFT JOIN exact_hit ex ON ex.doc_id = t.doc_id
    LEFT JOIN near_hit nh ON nh.doc_id = t.doc_id
    WHERE t.batch = 'incoming'
    """,
    doc="incremental ingestion: each incoming-batch doc gets a verdict "
    "against the existing corpus - exact_dup (content hash), near_dup "
    "(3-gram Jaccard >= 0.6 against any existing doc), or new. The "
    "existing side is never rescanned per doc: one hash join + one "
    "shingle join, both on corpus-sized keys. The corpus/batch split "
    "comes from the loader's ingest_batch column "
    "(tables.load_documents_batched), not a per-query filter",
)
def q70_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(tables.load_documents_batched(spark, sf_dir), "doc_id")
    tagged = d.withColumn("batch", F.col("ingest_batch"))
    incoming = tagged.filter(F.col("batch") == "incoming")
    existing = tagged.filter(F.col("batch") == "existing")
    exact_hit = (
        incoming.alias("i")
        .join(
            existing.alias("e"),
            F.md5(F.col("e.text")) == F.md5(F.col("i.text")),
            "left_semi",
        )
        .select(F.col("doc_id"))
        .distinct()
    )
    sh = tagged.select(
        F.col("doc_id"),
        "batch",
        F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    i_sh = sh.filter(F.col("batch") == "incoming").select(
        F.col("doc_id").alias("i_id"), "shingle"
    )
    e_sh = sh.filter(F.col("batch") == "existing").select(
        F.col("doc_id").alias("e_id"), "shingle"
    )
    inter = (
        i_sh.join(e_sh, "shingle")
        .join(sizes.select(F.col("doc_id").alias("i_id"), F.col("set_size").alias("size_i")), "i_id")
        .join(sizes.select(F.col("doc_id").alias("e_id"), F.col("set_size").alias("size_e")), "e_id")
        .groupBy("i_id", "size_i", "size_e")
        .agg(F.count("*").alias("n_common"))
    )
    near_hit = (
        inter.filter(
            F.col("n_common")
            / (F.col("size_i") + F.col("size_e") - F.col("n_common"))
            >= 0.6
        )
        .select(F.col("i_id").alias("doc_id"))
        .distinct()
    )
    return (
        incoming.select("doc_id")
        .join(exact_hit.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near_hit.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact").isNotNull(), "exact_dup")
            .when(F.col("is_near").isNotNull(), "near_dup")
            .otherwise("new")
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# q71 — dedup report: duplicate-cluster size histogram + ratios
# ---------------------------------------------------------------------------
@register(
    "q71_dedup_report",
    """
    WITH groups AS (
      SELECT md5(text) AS fp, COUNT(*) AS n_docs FROM documents GROUP BY 1
    )
    SELECT n_docs AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(n_docs * COUNT(*) AS BIGINT) AS n_documents,
           CAST(CAST((n_docs - 1) * COUNT(*) AS BIGINT) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS removable_frac
    FROM groups GROUP BY n_docs
    """,
    doc="dedup reporting: histogram of exact-duplicate cluster sizes and "
    "the removable fraction per size - the summary a pipeline operator "
    "reads before deciding thresholds",
)
def q71_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no ensure_parallelism: two cheap aggregates whose own shuffle
    # already spreads the work — the pre-spread repartition cost 3x more
    # than it won here (measured vs BENCH_r01)
    d = load_table(spark, sf_dir, "documents")
    total = d.agg(F.count("*").alias("n_total"))
    groups = d.groupBy(F.md5("text").alias("fp")).agg(F.count("*").alias("n_docs"))
    return (
        groups.groupBy(F.col("n_docs").alias("cluster_size"))
        .agg(F.count("*").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_documents"),
            (
                ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("bigint").cast("double")
                / F.col("n_total")
            ).alias("removable_frac"),
        )
    )


# ---------------------------------------------------------------------------
# q75 — MinHash estimator calibration: estimated vs exact Jaccard per
# LSH candidate pair
# ---------------------------------------------------------------------------
def _minhash_calibration_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.sig_{h} = b.sig_{h} THEN 1 ELSE 0 END" for h in range(_NUM_HASHES)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b, ({agree}) * 1.0 / {_NUM_HASHES} AS est_jaccard
      FROM cand c JOIN sigs a ON a.doc_id = c.id_a JOIN sigs b ON b.doc_id = c.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT e.id_a, e.id_b,
           round(e.est_jaccard, 6) AS est_jaccard,
           round(COALESCE(i.n_common, 0) * 1.0
                 / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0)), 6) AS exact_jaccard,
           round(abs(e.est_jaccard
                 - COALESCE(i.n_common, 0) * 1.0
                   / (sa.set_size + sb.set_size - COALESCE(i.n_common, 0))), 6) AS abs_err
    FROM est e
    LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
    JOIN sizes sa ON sa.doc_id = e.id_a
    JOIN sizes sb ON sb.doc_id = e.id_b
    """


@register(
    "q75_minhash_calibration",
    _minhash_calibration_sql(),
    doc="estimator calibration: per LSH candidate pair, the MinHash "
    "Jaccard estimate (signature agreement fraction) next to the exact "
    "Jaccard computed only for those pairs - the exact pass is "
    "candidate-restricted, never an uncapped all-pairs self-join",
)
def q75_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE shingle subplan and ONE signature aggregation feed every stage:
    # the signatures are consumed by the estimate join (twice), the
    # candidate generation, and the set sizes (n_shingles IS the set size,
    # so the separate size aggregation is gone). The signature table is
    # doc-count-sized (8 x 16-char sigs per doc — KBs per million docs),
    # so it is pinned: column pruning gives each consumer a different
    # aggregate schema, which defeats exchange reuse, and without the
    # cache the whole shingle->md5->aggregate pipeline would run once per
    # consumer (the round-1 formulation measured ~3x the work). pin()
    # releases the blocks at the next query invocation (registry.py).
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        F.col("doc_id"), F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sigs = pin(dd.minhash_signatures_from_shingles(sh, "doc_id", "shingle", _NUM_HASHES))
    cand = dd.candidate_pairs_from_signatures(sigs, "doc_id", _NUM_HASHES, _BANDS)
    a = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("n_shingles").alias("size_a"),
        *[F.col(f"sig_{h}").alias(f"a_sig_{h}") for h in range(_NUM_HASHES)],
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("n_shingles").alias("size_b"),
        *[F.col(f"sig_{h}").alias(f"b_sig_{h}") for h in range(_NUM_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a_sig_{h}") == F.col(f"b_sig_{h}"), 1).otherwise(0)
        for h in range(_NUM_HASHES)
    )
    est = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        "size_a",
        "size_b",
        (agree * F.lit(1.0) / _NUM_HASHES).alias("est_jaccard"),
    )
    inter = (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a"
        )
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = nc * F.lit(1.0) / (F.col("size_a") + F.col("size_b") - nc)
    return (
        est.join(inter, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# q76 — quantizer quality: per-cluster inertia of the k-means assignment
# ---------------------------------------------------------------------------
@register(
    "q76_kmeans_inertia",
    f"""
    WITH {_kmeans_ctes()},
    dist AS (
      SELECT a.cid AS cluster,
             {'list_sum([(CAST(v.embedding[i] AS DOUBLE) - c.cent[i]) * '
              '(CAST(v.embedding[i] AS DOUBLE) - c.cent[i]) '
              'FOR i IN generate_series(1, len(v.embedding))])'} AS d2
      FROM a{_KMEANS_ITERS} a
      JOIN embeddings v USING (vec_id)
      JOIN c{_KMEANS_ITERS - 1} c ON c.cid = a.cid
    )
    SELECT CAST(cluster AS INT) AS cluster,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST(d2 AS DECIMAL(28,12))) AS DOUBLE) AS inertia
    FROM dist GROUP BY 1
    """,
    doc="cluster quality report: per-cluster inertia (sum of squared "
    "distance to the assigned centroid). The per-vector distance is the "
    "same sequential fold as the assignment; the sum is decimal-exact "
    "so it is order/partitioning independent at any scale",
)
def q76_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_assign(
        e, k=_KMEANS_K, iters=_KMEANS_ITERS, return_centroids=True
    )
    cents_lit = F.array(*[F.lit(c) for c in cents])
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.element_at(cents_lit, F.col("cluster") + 1),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.join(assigned, "vec_id")
        .select(F.col("cluster"), d2.alias("d2"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum(F.col("d2").cast("decimal(28,12)")).cast("double").alias("inertia"),
        )
    )


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


def _power_iteration_sql(dim: int = _PI_DIM, iters: int = _PI_ITERS) -> str:
    return (
        "WITH "
        + ",\n    ".join(_power_iteration_ctes(dim, iters))
        + f"""
    SELECT CAST(i AS INT) AS pos, v[i] AS component
    FROM v{iters}, UNNEST(generate_series(1, {dim})) AS t(i)
    """
    )


@register(
    "q77_power_iteration",
    _power_iteration_sql(),
    doc="power iteration for the dominant eigenvector of X^T X (top "
    "principal direction): driver-held state vector, one decimal-exact "
    "aggregate job per iteration, replayed bit-for-bit by the SQL "
    "oracle - the iterative-ML pattern next to Lloyd's k-means",
)
def q77_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import power_iteration

    e = load_table(spark, sf_dir, "embeddings")
    v = power_iteration(e, iters=_PI_ITERS)
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(v)], "pos int, component double"
    )


# ---------------------------------------------------------------------------
# q79 — document chunking: overlapping token windows (RAG/packing prep)
# ---------------------------------------------------------------------------
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24
_CHUNK_MIN = 8


@register(
    "q79_doc_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
             w[s : s + {_CHUNK_SIZE - 1}] AS chunk
      FROM toks, UNNEST(generate_series(1, len(w), {_CHUNK_STRIDE})) AS t(s)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM chunks WHERE len(chunk) >= {_CHUNK_MIN}
    """,
    doc=f"document chunking for retrieval/packing: overlapping windows of "
    f"{_CHUNK_SIZE} tokens at stride {_CHUNK_STRIDE} (tail chunks under "
    f"{_CHUNK_MIN} tokens dropped); a narrow transform+explode, no shuffle",
)
def q79_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(_CHUNK_STRIDE)),
        lambda s: F.slice(toks, s, _CHUNK_SIZE),
    )
    return (
        d.select(F.col("doc_id"), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .filter(F.size("chunk") >= _CHUNK_MIN)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_fp"),
        )
    )


# ---------------------------------------------------------------------------
# q80 — sequence packing: cumulative-sum bin assignment
# ---------------------------------------------------------------------------
_PACK_CAPACITY = 2048


@register(
    "q80_sequence_packing",
    f"""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_tokens) / {_PACK_CAPACITY}.0) AS INT) AS bin
      FROM toks
    )
    SELECT bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed GROUP BY 1
    """,
    doc=f"sequence packing: docs assigned to {_PACK_CAPACITY}-token training "
    "bins by exclusive cumulative sum in doc_id order. The global window "
    "is the deterministic spec; at 100 TB the same rule runs per "
    "partition range (sortWithinPartitions + per-range offsets)",
)
def q80_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(tx.tokens(F.col("text"))).alias("n_tokens")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(_PACK_CAPACITY)
        )
        .cast("int")
        .alias("bin"),
    )
    return packed.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# q90 — SemDeDup-style semantic dedup: k-means blocking + cosine pruning
# ---------------------------------------------------------------------------
_SEMDEDUP_THRESHOLD = 0.3


@register(
    "q90_semantic_dedup",
    f"""
    WITH {_kmeans_ctes()},
    assign AS (SELECT vec_id, CAST(cid AS INT) AS cluster FROM a{_KMEANS_ITERS}),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM assign x
      JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      JOIN embeddings a ON a.vec_id = x.vec_id
      JOIN embeddings b ON b.vec_id = y.vec_id
      WHERE {_duck_cos('a.embedding', 'b.embedding')} >= {_SEMDEDUP_THRESHOLD}
    )
    SELECT s.vec_id, s.cluster,
           s.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
    FROM assign s
    """,
    doc="SemDeDup-style semantic dedup (cluster-then-prune): k-means "
    "clusters block the cosine comparison, then any vector with a "
    "smaller-id cluster-mate above the similarity threshold is pruned "
    "(the transitive-prune variant — deterministic and engine-portable, "
    "unlike greedy keeper chains). At 100 TB, k scales with the corpus "
    "so cluster blocks stay bounded; the pair join is within-block only, "
    "never all-pairs — the same blocking discipline as q38, with the "
    "blocking learned by q48's quantizer instead of given",
)
def q90_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS)
    # clustered feeds BOTH the blocked pair join and the final label
    # join-back; column pruning gives the two consumers different subplans,
    # so without the pin the scan+assignment runs twice (the exact shape
    # q91 fixed — measured ~1.8x before the persist). Doc-count-sized.
    clustered = pin(e.select("vec_id", "embedding").join(assign, "vec_id"))
    pairs = sim.neardup_pairs_by_cosine(
        clustered, threshold=_SEMDEDUP_THRESHOLD, block_col="cluster"
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        clustered.select("vec_id", "cluster")
        .join(dropped.withColumn("__d", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cluster", F.col("__d").isNull().alias("kept"))
    )


# ---------------------------------------------------------------------------
# q91 — MinHash-LSH banding sweep: (bands x rows) scored vs exact Jaccard
# ---------------------------------------------------------------------------
# more bands = lower collision bar per band (higher recall, more false
# candidates); fewer bands = stricter (cheaper verify pass, misses
# borderline pairs). The S-curve operating point, measured — the banding
# complement of q82's (nbits x radius) matrix for hyperplane LSH.
_BAND_SWEEP = [("bands2_rows4", 2), ("bands4_rows2", 4), ("bands8_rows1", 8)]


def _banding_sweep_sql() -> str:
    blocks, selects = [], []
    for tag, bands in _BAND_SWEEP:
        rows = _NUM_HASHES // bands
        band_rows = " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
                b=b,
                parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
            )
            for b in range(bands)
        )
        blocks.append(
            f"""bb_{tag} AS ({band_rows}),
    cand_{tag} AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb_{tag} a JOIN bb_{tag} b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""
        )
        selects.append(
            f"""SELECT '{tag}' AS method,
           CAST((SELECT COUNT(*) FROM cand_{tag}) AS INT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS INT) AS n_truth,
           CAST((SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
                 ON t.id_a = c.id_a AND t.id_b = c.id_b) AS INT) AS n_caught,
           (SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
            ON t.id_a = c.id_a AND t.id_b = c.id_b) * CAST(1.0 AS DOUBLE)
             / nullif((SELECT COUNT(*) FROM truth), 0) AS recall,
           (SELECT COUNT(*) FROM truth t JOIN cand_{tag} c
            ON t.id_a = c.id_a AND t.id_b = c.id_b) * CAST(1.0 AS DOUBLE)
             / nullif((SELECT COUNT(*) FROM cand_{tag}), 0) AS precision"""
        )
    return (
        f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    """
        + ",\n    ".join(blocks)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
    )


@register(
    "q91_banding_sweep",
    _banding_sweep_sql(),
    doc="MinHash-LSH banding sweep: candidate recall/precision per "
    "(bands x rows) config vs the exact df-capped Jaccard ground truth "
    "— ONE signature subplan feeds every config (ReuseExchange), the "
    "S-curve measurement that picks the banding before a 100 TB dedup",
)
def q91_banding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both shared inputs are pinned (the q75 lesson): the banding
    # branches project different sig columns, which defeats exchange
    # canonicalization, so without the cache the shingle->md5->aggregate
    # pipeline runs once per band branch and the expensive df-capped
    # Jaccard self-join once per config (measured ~2x total). Both
    # tables are tiny: doc-count-sized sigs, pair-count-sized truth.
    # pin() releases them at the next query invocation (registry.py).
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sigs = pin(dd.minhash_signatures(d, "doc_id", "text", num_hashes=_NUM_HASHES))
    truth = pin(
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
        ).select("id_a", "id_b")
    )
    outs = []
    for method, bands in _BAND_SWEEP:
        cand = dd.candidate_pairs_from_signatures(sigs, "doc_id", _NUM_HASHES, bands)
        caught = truth.join(cand, ["id_a", "id_b"])
        outs.append(
            cand.agg(F.count("*").cast("int").alias("n_candidates"))
            .crossJoin(truth.agg(F.count("*").cast("int").alias("n_truth")))
            .crossJoin(caught.agg(F.count("*").cast("int").alias("n_caught")))
            .select(
                F.lit(method).alias("method"),
                "n_candidates",
                "n_truth",
                "n_caught",
                F.expr("CAST(n_caught AS DOUBLE) / nullif(n_truth, 0)").alias("recall"),
                F.expr(
                    "CAST(n_caught AS DOUBLE) / nullif(n_candidates, 0)"
                ).alias("precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


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
    dtf = pin(
        tx.dsir_doc_bucket_tf(
            d, "doc_id", "text", target=F.col("lang") == "en", buckets=_DSIR_BUCKETS
        )
    )
    return tx.dsir_weights_from_tf(d, dtf, "doc_id", buckets=_DSIR_BUCKETS)


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
# q99 — product quantization: per-subspace codebooks + ADC top-k
# ---------------------------------------------------------------------------
_PQ_M = 4
_PQ_SUB = 16  # dim 64 / 4 subspaces
_PQ_K = 8
_PQ_ITERS = 2
_PQ_TOPK = 10


def _pq_subspace_ctes(
    s: int,
    k: int = _PQ_K,
    iters: int = _PQ_ITERS,
    src: str = "embeddings",
    col: str = "embedding",
) -> list[str]:
    lo = s * _PQ_SUB + 1
    hi = (s + 1) * _PQ_SUB
    el = f"CAST(v.{col}[{lo} + i - 1] AS DOUBLE)"
    dist = (
        f"list_sum([({el} - c.cent[i]) * ({el} - c.cent[i]) "
        f"FOR i IN generate_series(1, len(c.cent))])"
    )
    ctes = [
        f"""c0_s{s} AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             CAST({col}[{lo}:{hi}] AS DOUBLE[]) AS cent
      FROM (SELECT vec_id, {col} FROM {src} ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t}_s{s} AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM {src} v, c{t - 1}_s{s} c
      ) WHERE rn = 1
    )"""
        )
        if t == iters:
            break  # the final assignment needs no centroid update
        ctes.append(
            f"""m{t}_s{s} AS (
      SELECT a.cid, i AS pos,
             {_fx_mean(f'CAST(v.{col}[{lo} + i - 1] AS DOUBLE)')} AS mv
      FROM a{t}_s{s} a JOIN {src} v USING (vec_id),
           UNNEST(generate_series(1, {_PQ_SUB})) AS t(i)
      GROUP BY a.cid, i
    )"""
        )
        ctes.append(
            f"""c{t}_s{s} AS (
      SELECT p.cid, COALESCE(n.cent, p.cent) AS cent
      FROM c{t - 1}_s{s} p
      LEFT JOIN (SELECT cid, list(mv ORDER BY pos) AS cent
                 FROM m{t}_s{s} GROUP BY cid) n
        USING (cid)
    )"""
        )
    return ctes


def _pq_core_ctes() -> str:
    """Everything from codebook training through the ADC ranking, as a
    WITH-body fragment shared by the q99 and q101 oracles."""
    ctes: list[str] = []
    for s in range(_PQ_M):
        ctes.extend(_pq_subspace_ctes(s))
    enc_joins = " ".join(
        f"JOIN a{_PQ_ITERS}_s{s} e{s} USING (vec_id)" for s in range(1, _PQ_M)
    )
    enc = (
        "enc AS (SELECT e0.vec_id, "
        + ", ".join(f"e{s}.cid AS code{s}" for s in range(_PQ_M))
        + f" FROM a{_PQ_ITERS}_s0 e0 {enc_joins})"
    )
    dterms = []
    cb_joins = []
    for s in range(_PQ_M):
        lo = s * _PQ_SUB + 1
        ql = f"CAST(q.qvec[{lo} + i - 1] AS DOUBLE)"
        # final codebook: the centroids assignment a{iters} ranked against
        cb = f"c{_PQ_ITERS - 1}_s{s}"
        cb_joins.append(f"JOIN {cb} cb{s} ON cb{s}.cid = enc.code{s}")
        dterms.append(
            f"list_sum([({ql} - cb{s}.cent[i]) * ({ql} - cb{s}.cent[i]) "
            f"FOR i IN generate_series(1, {_PQ_SUB})])"
        )
    approx = dterms[0]
    for d in dterms[1:]:
        approx = f"({approx} + {d})"
    return (
        ",\n    ".join(ctes)
        + ",\n    "
        + enc
        + f""",
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.qid, enc.vec_id AS cand_id, {approx} AS approx_dist
      FROM q CROSS JOIN enc {' '.join(cb_joins)}
    ),
    ranked AS (
      SELECT qid, cand_id, approx_dist,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY approx_dist ASC, cand_id ASC) AS rank
      FROM pairs
    )"""
    )


def _pq_adc_sql() -> str:
    return f"""
    WITH {_pq_core_ctes()}
    SELECT qid, cand_id, approx_dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_PQ_TOPK}
    """


@register(
    "q99_pq_adc_topk",
    _pq_adc_sql(),
    doc="product quantization ANN (Jegou et al. 2011): M=4 per-subspace "
    "K=8 codebooks (deterministic Lloyd's, every iteration replayed by "
    "the oracle), vectors stored as 4 int codes (64x compression of the "
    "scan), queries answered by an ADC table — M x K distances per "
    "query computed in a narrow map, then every candidate is M array "
    "lookups. Encode and ADC are zero-shuffle codegen maps; the ranking "
    "is the only exchange",
)
def q99_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators import quantize as pq

    e = load_table(spark, sf_dir, "embeddings")
    books = pq.pq_train_codebooks(
        e, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS
    )
    encoded = pq.pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = pq.pq_adc_topk(q, encoded, books, top_k=_PQ_TOPK)
    return out.select(
        "qid", F.col("vec_id").alias("cand_id"), "approx_dist", "rank"
    )


# ---------------------------------------------------------------------------
# q100 — DSIR importance RESAMPLING: Gumbel-top-k selection over q97 weights
# ---------------------------------------------------------------------------
_DSIR_TOPK = 100
_GUMBEL_SPAN = 16**7


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
# q101 — PQ recall@k vs the exact L2 top-k (approximation quality, the
# measurement that picks M/K before trusting PQ at 100 TB — q82's pattern)
# ---------------------------------------------------------------------------
def _pq_recall_sql() -> str:
    qe = "CAST(q.qvec[i] AS DOUBLE)"
    ve = "CAST(v.embedding[i] AS DOUBLE)"
    exact_d = (
        f"list_sum([({qe} - {ve}) * ({qe} - {ve}) "
        f"FOR i IN generate_series(1, len(q.qvec))])"
    )
    return f"""
    WITH {_pq_core_ctes()},
    pq AS (SELECT qid, cand_id FROM ranked WHERE rank <= {_PQ_TOPK}),
    ex_pairs AS (
      SELECT q.qid, v.vec_id AS cand_id, {exact_d} AS d
      FROM q CROSS JOIN embeddings v
    ),
    ex AS (
      SELECT qid, cand_id FROM (
        SELECT qid, cand_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY d ASC, cand_id ASC) AS rn
        FROM ex_pairs
      ) WHERE rn <= {_PQ_TOPK}
    )
    SELECT ex.qid AS qid, CAST(COUNT(*) AS INT) AS n_exact,
           CAST(COUNT(pq.qid) AS INT) AS n_overlap,
           COUNT(pq.qid) * 1.0 / COUNT(*) AS recall
    FROM ex LEFT JOIN pq ON pq.qid = ex.qid AND pq.cand_id = ex.cand_id
    GROUP BY ex.qid
    """


@register(
    "q101_pq_recall",
    _pq_recall_sql(),
    doc="PQ approximation quality: recall@10 of the ADC ranking against "
    "the exact L2 top-10 per query — the calibration run that picks "
    "M/K before trusting the compressed index at scale. The exact side "
    "is the same query-broadcast brute force as q36; the overlap join "
    "touches 2 x topk rows per query",
)
def q101_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators import quantize as pq

    e = load_table(spark, sf_dir, "embeddings")
    books = pq.pq_train_codebooks(e, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    encoded = pq.pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pq_top = pq.pq_adc_topk(q, encoded, books, top_k=_PQ_TOPK).select(
        "qid", "vec_id", F.lit(1).alias("_hit")
    )

    qv = F.col("qvec").cast("array<double>")
    cv = F.col("embedding").cast("array<double>")
    dist = F.aggregate(
        F.zip_with(qv, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = W.partitionBy("qid").orderBy(F.asc("d"), F.asc("vec_id"))
    ex = (
        F.broadcast(q)
        .crossJoin(e)
        .select("qid", "vec_id", dist.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("qid", "vec_id")
    )
    return (
        ex.join(pq_top, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count("*").cast("int").alias("n_exact"),
            F.count("_hit").cast("int").alias("n_overlap"),
            (F.count("_hit") * F.lit(1.0) / F.count("*")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# q102 — retrieval-quality eval: NDCG@10 of exact cosine top-k against
# label relevance (the IR metric complement of q82/q101's recall)
# ---------------------------------------------------------------------------
def _ann_ndcg_sql(k: int = 10) -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (
      SELECT vec_id AS cid, embedding AS cvec, label AS clabel
      FROM embeddings WHERE vec_id >= 5
    ),
    top AS (
      SELECT qid, cid, rank FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {_duck_cos('q.qvec', 'c.cvec')} DESC,
                                           c.cid ASC) AS rank
        FROM q, c
      ) WHERE rank <= {k}
    ),
    rels AS (
      SELECT t.qid, t.rank,
             CASE WHEN c.clabel = q.qlabel THEN 1 ELSE 0 END AS rel
      FROM top t JOIN c ON c.cid = t.cid JOIN q ON q.qid = t.qid
    ),
    dcg AS (
      SELECT qid, SUM(CAST(rel / log2(rank + 1.0) AS DECIMAL(28,12))) AS d
      FROM rels GROUP BY 1
    ),
    nrel AS (
      SELECT q.qid, COALESCE(lc.n, 0) AS n_rel
      FROM q LEFT JOIN (SELECT clabel, COUNT(*) AS n FROM c GROUP BY 1) lc
        ON lc.clabel = q.qlabel
    ),
    idcg AS (
      SELECT qid, n_rel,
             list_sum([CAST(1.0 / log2(i + 1.0) AS DECIMAL(28,12))
                       FOR i IN generate_series(1, LEAST({k}, n_rel))]) AS i
      FROM nrel
    ),
    rounded AS (
      SELECT d.qid, CAST(i.n_rel AS INT) AS n_rel,
             ROUND(CAST(d.d AS DOUBLE), 6) AS dcg,
             ROUND(CAST(i.i AS DOUBLE), 6) AS idcg
      FROM dcg d JOIN idcg i USING (qid)
    )
    SELECT qid, n_rel, dcg, idcg,
           ROUND(dcg / NULLIF(idcg, 0), 6) AS ndcg
    FROM rounded
    """


@register(
    "q102_ann_ndcg",
    _ann_ndcg_sql(),
    doc="retrieval-quality eval: NDCG@10 of the exact cosine top-k with "
    "label-match relevance — the graded IR metric next to q82/q101's "
    "recall. One corpus scan for the ranking, one for the label "
    "histogram (broadcast back); DCG/IDCG terms quantized to "
    "DECIMAL(28,12) so the sums are order-independent and "
    "oracle-replayable",
)
def q102_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("label").alias("clabel"),
    )
    return sim.ann_ndcg(q, c, k=10)


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
# q107 — SSL-prototype data pruning: keep the hardest half of every cluster
# ---------------------------------------------------------------------------
@register(
    "q107_prototype_pruning",
    f"""
    WITH {_kmeans_ctes()},
    fincent AS (SELECT cid, cent FROM c{_KMEANS_ITERS - 1}),
    scored AS (
      SELECT v.vec_id, a.cid AS cluster,
             list_sum([(CAST(v.embedding[i] AS DOUBLE) - c.cent[i])
                       * (CAST(v.embedding[i] AS DOUBLE) - c.cent[i])
                       FOR i IN generate_series(1, len(c.cent))]) AS d
      FROM embeddings v
      JOIN a{_KMEANS_ITERS} a USING (vec_id)
      JOIN fincent c ON c.cid = a.cid
    ),
    ranked AS (
      SELECT vec_id, cluster, d,
             ROW_NUMBER() OVER (PARTITION BY cluster
                                ORDER BY d DESC, vec_id ASC) AS hardness_rank,
             COUNT(*) OVER (PARTITION BY cluster) AS n_c
      FROM scored
    )
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           ROUND(d, 6) AS proto_dist,
           CAST(hardness_rank AS INT) AS hardness_rank,
           hardness_rank <= FLOOR(CAST(n_c AS DOUBLE) / 2.0) AS kept
    FROM ranked
    """,
    doc="SSL-prototype pruning (Sorscher et al. 2022): squared-L2 "
    "distance to the own-cluster prototype (zero-shuffle literal-"
    "centroid map), per-cluster hardness rank, keep the hardest half — "
    "the large-data pruning rule where prototype-near examples drop. "
    "Every k-means iteration replayed by the oracle",
)
def q107_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import prototype_pruning

    e = load_table(spark, sf_dir, "embeddings")
    return prototype_pruning(e, k=_KMEANS_K, iters=_KMEANS_ITERS)


# ---------------------------------------------------------------------------
# q108 — blocked record linkage: entity resolution on structured rows
# ---------------------------------------------------------------------------
_LINK_MAX_LEV = 2


@register(
    "q108_record_linkage",
    f"""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_LINK_MAX_LEV}
    """,
    doc="blocked record linkage (Fellegi-Sunter blocking+verify, the "
    "entity-resolution counterpart of the text dedup family): candidate "
    "pairs only within (nation, segment) blocks — an equi-join, never "
    "all-pairs — verified by Levenshtein on the name (integer DP, "
    "bit-portable). Blocking-key selectivity is the scale lever, the "
    "analogue of the shingle df-cap",
)
def q108_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = ensure_parallelism(load_table(spark, sf_dir, "customer"), "c_custkey")
    return dd.record_linkage_pairs(
        c, "c_custkey", "c_name",
        block_cols=["c_nationkey", "c_mktsegment"], max_lev=_LINK_MAX_LEV,
    )


# ---------------------------------------------------------------------------
# q109 — bitext margin mining (CCMatrix-style parallel-corpus construction)
# ---------------------------------------------------------------------------
_BITEXT_MIN_COS = 0.1
_BITEXT_KNN = 4
_BITEXT_TOPK = 50


def _bitext_sql() -> str:
    cos = _duck_cos("a.embedding", "b.embedding")
    return f"""
    WITH {_kmeans_ctes()},
    assign AS (SELECT vec_id, CAST(cid AS INT) AS cluster FROM a{_KMEANS_ITERS}),
    cl AS (
      SELECT e.vec_id, e.embedding, a.cluster, e.label % 2 AS side
      FROM embeddings e JOIN assign a USING (vec_id)
    ),
    pairs AS (
      SELECT id_a, id_b, cos FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
        FROM cl a JOIN cl b
          ON a.cluster = b.cluster AND a.side = 0 AND b.side = 1
      ) WHERE cos >= {_BITEXT_MIN_COS}
    ),
    ra AS (
      SELECT id_a, cos,
             ROW_NUMBER() OVER (PARTITION BY id_a
                                ORDER BY cos DESC, id_b) AS r
      FROM pairs
    ),
    aa AS (
      SELECT id_a, CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS avg_a
      FROM ra WHERE r <= {_BITEXT_KNN} GROUP BY 1
    ),
    rb AS (
      SELECT id_b, cos,
             ROW_NUMBER() OVER (PARTITION BY id_b
                                ORDER BY cos DESC, id_a) AS r
      FROM pairs
    ),
    ab AS (
      SELECT id_b, CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS avg_b
      FROM rb WHERE r <= {_BITEXT_KNN} GROUP BY 1
    ),
    scored AS (
      SELECT p.id_a, p.id_b, ROUND(p.cos, 6) AS cos,
             ROUND(p.cos / ((aa.avg_a + ab.avg_b) / 2.0), 6) AS margin
      FROM pairs p JOIN aa USING (id_a) JOIN ab USING (id_b)
    )
    SELECT id_a, id_b, cos, margin
    FROM scored ORDER BY margin DESC, id_a, id_b LIMIT {_BITEXT_TOPK}
    """


@register(
    "q109_bitext_margin_mining",
    _bitext_sql(),
    doc="CCMatrix-style bitext mining (Artetxe & Schwenk 2019): "
    "cross-side candidate pairs within learned k-means blocks, scored "
    "by the MARGIN criterion — cosine over the mean of each endpoint's "
    "k-NN cosines, which suppresses hub vectors — the mining step that "
    "builds parallel corpora from monolingual crawls. Blocked pair "
    "join (never all-pairs), pinned pair table (three consumers), "
    "DECIMAL-quantized k-NN means, TakeOrderedAndProject output",
)
def q109_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS)
    clustered = pin(
        e.join(assign, "vec_id").select(
            "vec_id", "embedding", "cluster", (F.col("label") % 2).alias("side")
        )
    )
    return sim.bitext_margin_pairs(
        clustered,
        "side",
        min_cos=_BITEXT_MIN_COS,
        k_nn=_BITEXT_KNN,
        top_k=_BITEXT_TOPK,
        persist_fn=pin,
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


# ---------------------------------------------------------------------------
# q111 — trained quality classifier: hashed-feature linear model, batch GD
# (the DCLM/CCNet model-based filter, trained inside the engine)
# ---------------------------------------------------------------------------
_CLF_BUCKETS = 64
_CLF_ITERS = 2


def _cfdiv(a: str, m: str) -> str:
    """Exact floor division in portable SQL (numerator made divisible)."""
    return f"CAST((({a}) - (((({a}) % ({m})) + ({m})) % ({m}))) / ({m}) AS BIGINT)"


def _classifier_sql(
    buckets: int = _CLF_BUCKETS, iters: int = _CLF_ITERS, train_where: str = ""
) -> str:
    """Replay of operators.classifier.hashed_linear_scores: every GD
    iteration is a (gradient, weights) CTE pair over the same tf table.
    With ``train_where``, the GRADIENT/label/count side restricts to the
    matching documents (proper training split) while the tf features and
    the final scoring cover the whole corpus — the q229 conformal shape;
    the default emits the exact historical full-corpus SQL (q111/q114)."""
    from frontmatter_mcp_spark.operators.classifier import LRINV, PDIV, SCALE
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    s, half = SCALE, SCALE // 2
    tw = f" WHERE {train_where}" if train_where else ""
    ctes = [
        """toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                            x -> x <> '')) AS t
      FROM documents
    )""",
        f"""tf AS (
      SELECT doc_id, {hash_bucket_sql('t', buckets)} AS b,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    )""",
        f"""lab AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM documents{tw}
    )""",
        f"nn AS (SELECT CAST(COUNT(*) * {LRINV} AS BIGINT) AS d FROM documents{tw})",
        # iteration 1: w = 0, so the residual is S/2 - S*y directly
        f"""g1 AS (
      SELECT b, CAST(SUM(({half} - {s} * y) * tf) AS BIGINT) AS g
      FROM tf JOIN lab USING (doc_id) GROUP BY b
    )""",
        f"w1 AS (SELECT b, -{_cfdiv('g', 'd')} AS w FROM g1 CROSS JOIN nn)",
    ]
    for i in range(2, iters + 1):
        p = i - 1
        ctes += [
            f"""z{p} AS (
      SELECT doc_id, CAST(SUM(w * tf) AS BIGINT) AS z
      FROM tf JOIN w{p} USING (b) GROUP BY doc_id
    )""",
            f"""p{p} AS (
      SELECT lab.doc_id, y,
             LEAST({s}, GREATEST(0, {half} + {_cfdiv('COALESCE(z, 0)', str(PDIV))})) AS p
      FROM lab LEFT JOIN z{p} ON lab.doc_id = z{p}.doc_id
    )""",
            f"""g{i} AS (
      SELECT b, CAST(SUM((p - {s} * y) * tf) AS BIGINT) AS g
      FROM tf JOIN p{i - 1} ON tf.doc_id = p{i - 1}.doc_id GROUP BY b
    )""",
            f"""w{i} AS (
      SELECT w{p}.b, w{p}.w - {_cfdiv('g', 'd')} AS w
      FROM w{p} JOIN g{i} ON w{p}.b = g{i}.b CROSS JOIN nn
    )""",
        ]
    ctes.append(
        f"""zf AS (
      SELECT doc_id, CAST(SUM(w * tf) AS BIGINT) AS z
      FROM tf JOIN w{iters} USING (b) GROUP BY doc_id
    )"""
    )
    final_lab = "lab"
    if train_where:
        ctes.append(
            """alllab AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
      FROM documents
    )"""
        )
        final_lab = "alllab"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT {final_lab}.doc_id, CAST(y AS INT) AS label,
           CAST(COALESCE(z, 0) AS BIGINT) AS score_fx,
           CAST(LEAST({s}, GREATEST(0, {half} + {_cfdiv('COALESCE(z, 0)', str(PDIV))}))
                AS DOUBLE) / {s} AS prob
    FROM {final_lab} LEFT JOIN zf ON {final_lab}.doc_id = zf.doc_id
    """


@register(
    "q111_quality_classifier",
    _classifier_sql(),
    doc="model-based quality filter, TRAINED in-engine (DCLM/CCNet "
    "recipe): batch gradient descent on hashed bag-of-words features "
    "separating the curated-positive set (here lang='en'; in production "
    "a reference corpus), then every document scored by the trained "
    "weights. All math is fixed-point integer (hard-sigmoid, exact "
    "floor-division updates), so training is bit-identical across "
    "engines and the oracle replays each GD step as a CTE pair. One "
    "corpus shuffle per iteration (map-side-combined 64-bucket gradient "
    "aggregate); weight tables are 64-row broadcasts; the tf table is "
    "pinned across its 2*iters+1 consumers",
)
def q111_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )


# ---------------------------------------------------------------------------
# q113 — BPE training loop: iterative merge induction (q98 scores ONE step;
# this runs the loop that actually builds the vocabulary)
# ---------------------------------------------------------------------------
_BPE_ITERS = 3


def _bpe_chain_ctes(iters: int) -> list[str]:
    """The shared merge-chain CTEs (replay of tokenize._bpe_loop): doc
    tokens, word counts, char-split s0, then a (pair-count, top-1,
    merged-sequence) triple per step. The word rides along through every
    s{t} so the apply side (q116) can join the final segmentation back
    to the corpus token stream."""
    mrg = "replace(pr, ' ', '')"

    def merge_expr(src: str) -> str:
        one = f"replace(' ' || {src} || ' ', ' ' || pr || ' ', ' ' || {mrg} || ' ')"
        return f"trim(replace({one}, ' ' || pr || ' ', ' ' || {mrg} || ' '))"

    ctes = [
        """toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    )""",
        """words AS (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM toks WHERE regexp_matches(t, '^[a-z]+$') GROUP BY t
    )""",
        """s0 AS (
      SELECT w, wc,
             array_to_string(list_transform(generate_series(1, length(w)),
                                            i -> substr(w, i, 1)), ' ') AS seq
      FROM words
    )""",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        ctes += [
            f"""c{t} AS (
      SELECT pr, CAST(SUM(wc) AS BIGINT) AS c FROM (
        SELECT wc, sym[i] || ' ' || sym[i + 1] AS pr
        FROM (SELECT wc, string_split(seq, ' ') AS sym FROM s{p}) q,
             UNNEST(generate_series(1, len(sym) - 1)) AS u(i)
        WHERE len(sym) >= 2
      ) GROUP BY pr
    )""",
            f"t{t} AS (SELECT pr, c FROM c{t} ORDER BY c DESC, pr LIMIT 1)",
            f"""s{t} AS (
      SELECT w, wc, {merge_expr('seq')} AS seq FROM s{p} CROSS JOIN t{t}
    )""",
        ]
    return ctes


def _bpe_merge_sql(iters: int = _BPE_ITERS) -> str:
    """Replay of tokenize.bpe_merge_steps: the shared chain plus a
    (symbol-census, stat-row) CTE pair per step."""
    mrg = "replace(pr, ' ', '')"
    ctes = _bpe_chain_ctes(iters)
    for t in range(1, iters + 1):
        ctes += [
            f"""v{t} AS (
      SELECT CAST(COUNT(DISTINCT s) AS INT) AS n_symbols
      FROM (SELECT unnest(string_split(seq, ' ')) AS s FROM s{t})
    )""",
            f"""r{t} AS (
      SELECT CAST({t} AS INT) AS step, pr AS pair, {mrg} AS merged,
             c AS pair_count, n_symbols
      FROM t{t} CROSS JOIN v{t}
    )""",
        ]
    joined = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(f"SELECT * FROM r{t}" for t in range(1, iters + 1))
    return f"""
    WITH {joined}
    {union}
    """


@register(
    "q113_bpe_merge_loop",
    _bpe_merge_sql(),
    doc="BPE vocabulary induction LOOP: words start as character "
    "sequences; each step counts frequency-weighted adjacent symbol "
    "pairs, merges the top pair corpus-wide (two-pass left-to-right "
    "literal replace — engine-portable greedy), and reports the merge + "
    "post-merge symbol census. The loop runs over the VOCABULARY, not "
    "the corpus (one corpus pass builds the word counts); per step: one "
    "map-side-combined pair aggregate, a 1-row top-pair broadcast, a "
    "narrow merge projection. Oracle replays every step as CTEs",
)
def q113_bpe_merge_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    words = (
        d.select(F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$"))
        .groupBy(F.col("t").alias("w"))
        .agg(F.count("*").cast("long").alias("wc"))
    )
    return tk.bpe_merge_steps(words, "w", "wc", iters=_BPE_ITERS, persist_fn=pin)


# ---------------------------------------------------------------------------
# q116 — BPE ENCODE: tokenize the corpus with the learned vocabulary
# (q113 trains the merges; this applies them — the tokenizer stage)
# ---------------------------------------------------------------------------
def _bpe_encode_sql(iters: int = _BPE_ITERS) -> str:
    joined = ",\n    ".join(
        _bpe_chain_ctes(iters)
        + [
            "wt AS (SELECT doc_id, t FROM toks WHERE regexp_matches(t, '^[a-z]+$'))",
            f"""sl AS (
      SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS sl FROM s{iters}
    )""",
            """agg AS (
      SELECT wt.doc_id, CAST(COUNT(*) AS INT) AS n_words,
             CAST(SUM(sl.sl) AS BIGINT) AS n_bpe_tokens
      FROM wt JOIN sl ON sl.w = wt.t GROUP BY wt.doc_id
    )""",
        ]
    )
    return f"""
    WITH {joined}
    SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
           CASE WHEN agg.n_words IS NULL THEN NULL
                ELSE CAST(agg.n_bpe_tokens AS DOUBLE) / agg.n_words END
             AS tokens_per_word
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


@register(
    "q116_bpe_encode",
    _bpe_encode_sql(),
    doc="tokenizer APPLY stage: the corpus encoded under the q113-"
    "trained BPE vocabulary — per-document word count, post-merge "
    "subword token count, and fertility (tokens per word, the metric "
    "tokenizer training optimizes). The merge loop reruns over the "
    "vocabulary (bit-identical pair choices to q113), the final "
    "segmentation lengths broadcast back onto the corpus token stream, "
    "and the per-doc aggregate is map-side combined — the corpus is "
    "scanned, never shuffled at token granularity beyond the doc key",
)
def q116_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = d.select("doc_id", F.explode(toks).alias("t")).filter(
        F.col("t").rlike("^[a-z]+$")
    )
    words = wt.groupBy(F.col("t").alias("w")).agg(
        F.count("*").cast("long").alias("wc")
    )
    seg = tk.bpe_segment_vocab(words, "w", "wc", iters=_BPE_ITERS, persist_fn=pin)
    sl = seg.select(
        "w", F.size(F.split(F.col("seq"), " ", -1)).cast("long").alias("sl")
    )
    agg = (
        wt.join(F.broadcast(sl), wt["t"] == sl["w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("sl").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0).cast("long")).alias("n_bpe_tokens"),
            (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias(
                "tokens_per_word"
            ),
        )
    )


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
# q117 — classifier calibration: reliability table for the q111 model
# (the eval stage that decides whether the filter's threshold is usable)
# ---------------------------------------------------------------------------
def _calibration_sql() -> str:
    from frontmatter_mcp_spark.operators.classifier import SCALE

    return f"""
    SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN (score_fx >= 0) = (label = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CAST(prob * {SCALE} AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * {SCALE}) AS mean_prob
    FROM ({_classifier_sql()}) s
    GROUP BY 1
    """


@register(
    "q117_classifier_calibration",
    _calibration_sql(),
    doc="model calibration / reliability table for the trained q111 "
    "filter: documents bucketed by predicted probability (10 bins), "
    "per-bin positive rate, accuracy, and mean predicted probability — "
    "the eval a production gate runs before trusting a threshold. The "
    "mean aggregates the INTEGER fixed-point probabilities (order-"
    "independent, exact) with ONE final double division; a 10-row "
    "output from one corpus-sized aggregate on top of the scoring plan",
)
def q117_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import SCALE, hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )
    correct = (F.col("score_fx") >= 0) == (F.col("label") == 1)
    return (
        scored.groupBy(
            F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
            F.sum(correct.cast("int")).cast("long").alias("n_correct"),
            (
                F.sum((F.col("prob") * SCALE).cast("long")).cast("double")
                / (F.count("*") * SCALE)
            ).alias("mean_prob"),
        )
    )


# ---------------------------------------------------------------------------
# q118 — vocabulary growth curve (Heaps' law audit): distinct-term count
# as the corpus grows, via the first-appearance trick
# ---------------------------------------------------------------------------
_GROWTH_DECILES = 10


def _vocab_growth_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    k = _GROWTH_DECILES
    return f"""
    WITH b AS (
      SELECT doc_id, {hash_bucket_sql('doc_id', k)} AS bk,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    tok AS (SELECT bk, unnest(w) AS t FROM b),
    per_bucket AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY bk
    ),
    docs_per_bucket AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS n_docs FROM b GROUP BY bk
    ),
    firsts AS (
      SELECT b_min AS bk, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
        SELECT t, MIN(bk) AS b_min FROM tok GROUP BY t
      ) GROUP BY b_min
    ),
    spine AS (SELECT i AS decile FROM UNNEST(generate_series(0, {k - 1})) AS g(i))
    SELECT CAST(decile AS INT) AS decile,
           CAST(SUM(COALESCE(d.n_docs, 0)) OVER w AS BIGINT) AS n_docs_cum,
           CAST(SUM(COALESCE(p.n_tok, 0)) OVER w AS BIGINT) AS n_tokens_cum,
           CAST(SUM(COALESCE(f.n_new, 0)) OVER w AS BIGINT) AS vocab_cum,
           CAST(SUM(COALESCE(f.n_new, 0)) OVER w AS DOUBLE)
             / SUM(COALESCE(p.n_tok, 0)) OVER w AS type_token_ratio
    FROM spine
    LEFT JOIN docs_per_bucket d ON d.bk = decile
    LEFT JOIN per_bucket p ON p.bk = decile
    LEFT JOIN firsts f ON f.bk = decile
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@register(
    "q118_vocab_growth",
    _vocab_growth_sql(),
    doc="vocabulary growth curve (Heaps'-law audit — the dedup/"
    "diversity health check run before tokenizer training): cumulative "
    "docs, tokens, distinct terms, and type-token ratio over ten "
    "deterministic hash-sample deciles. The FIRST-APPEARANCE trick "
    "makes it one pass: each term aggregates to its minimum decile "
    "(map-side combined), so the curve needs no per-prefix rescans; "
    "the cumulative window runs over the 10-row spine, never the data",
)
def q118_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    k = _GROWTH_DECILES
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    b = d.select(hash_bucket(F.col("doc_id"), k).alias("bk"), toks.alias("w"))
    tok = b.select("bk", F.explode("w").alias("t"))
    per_bucket = tok.groupBy("bk").agg(F.count("*").cast("long").alias("n_tok"))
    docs_per_bucket = b.groupBy("bk").agg(F.count("*").cast("long").alias("n_docs"))
    firsts = (
        tok.groupBy("t")
        .agg(F.min("bk").alias("bk"))
        .groupBy("bk")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    spine = d.sparkSession.range(k).select(F.col("id").cast("int").alias("decile"))
    joined = (
        spine.join(F.broadcast(docs_per_bucket), spine["decile"] == docs_per_bucket["bk"], "left")
        .drop("bk")
        .join(F.broadcast(per_bucket), spine["decile"] == per_bucket["bk"], "left")
        .drop("bk")
        .join(F.broadcast(firsts), spine["decile"] == firsts["bk"], "left")
        .drop("bk")
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    n_tok_cum = F.sum(F.coalesce("n_tok", F.lit(0))).over(w)
    vocab_cum = F.sum(F.coalesce("n_new", F.lit(0))).over(w)
    return joined.select(
        "decile",
        F.sum(F.coalesce("n_docs", F.lit(0))).over(w).cast("long").alias("n_docs_cum"),
        n_tok_cum.cast("long").alias("n_tokens_cum"),
        vocab_cum.cast("long").alias("vocab_cum"),
        (vocab_cum.cast("double") / n_tok_cum).alias("type_token_ratio"),
    )


# ---------------------------------------------------------------------------
# q119 — FUZZY decontamination: MinHash-LSH candidates across the
# train/benchmark boundary + exact-Jaccard verify (q60 catches verbatim
# overlap; this catches paraphrased/near-duplicate leakage)
# ---------------------------------------------------------------------------
_FUZZY_DECON_THRESHOLD = 0.4


def _fuzzy_decon_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    thr = _FUZZY_DECON_THRESHOLD
    return f"""
    WITH {_SHINGLES_CTE},
    fl AS (SELECT doc_id, {hash_bucket_sql('doc_id', 20)} = 0 AS bench
           FROM documents),
    sigs AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_shingles, {_sig_exprs()}
             FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    bbf AS (SELECT bb.doc_id, band, bucket, bench FROM bb JOIN fl USING (doc_id)),
    cand AS (
      SELECT DISTINCT t.doc_id AS train_id, s.doc_id AS bench_id
      FROM bbf t JOIN bbf s ON t.band = s.band AND t.bucket = s.bucket
      WHERE NOT t.bench AND s.bench
    ),
    dfreq AS (SELECT shingle, COUNT(*) AS dfc FROM sh GROUP BY 1),
    capped AS (
      SELECT sh.doc_id, sh.shingle, fl.bench
      FROM sh JOIN dfreq USING (shingle) JOIN fl USING (doc_id)
      WHERE dfc <= {_MAX_DF}
    ),
    ft AS (SELECT doc_id AS train_id, shingle FROM capped
           WHERE NOT bench AND doc_id IN (SELECT train_id FROM cand)),
    fs AS (SELECT doc_id AS bench_id, shingle FROM capped
           WHERE bench AND doc_id IN (SELECT bench_id FROM cand)),
    inter AS (
      SELECT ft.train_id, fs.bench_id, COUNT(*) AS n_common
      FROM ft JOIN fs USING (shingle)
      GROUP BY 1, 2
    )
    SELECT i.train_id, i.bench_id, CAST(i.n_common AS BIGINT) AS n_common,
           round(i.n_common * 1.0 / (sa.n_shingles + sb.n_shingles - i.n_common), 6)
             AS jaccard
    FROM inter i
    JOIN cand USING (train_id, bench_id)
    JOIN sigs sa ON sa.doc_id = i.train_id
    JOIN sigs sb ON sb.doc_id = i.bench_id
    WHERE i.n_common * 1.0 / (sa.n_shingles + sb.n_shingles - i.n_common) >= {thr}
    """


@register(
    "q119_fuzzy_decontamination",
    _fuzzy_decon_sql(),
    doc="fuzzy benchmark decontamination (the PaLM/GPT-style near-dup "
    "leakage scan): a 5% hash-designated benchmark side, MinHash-LSH "
    "candidates restricted CROSS-side (train x bench per band bucket — "
    "never train x train), df-capped exact-Jaccard verify on candidate "
    "ids only, re-filtered against the candidate set. One shared "
    "shingle subplan (pinned) feeds signatures, df-cap, and verify",
)
def q119_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return dd.fuzzy_decontaminate(
        d,
        "doc_id",
        "text",
        bench=hash_bucket(F.col("doc_id"), 20) == 0,
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        threshold=_FUZZY_DECON_THRESHOLD,
        max_df=_MAX_DF,
        persist_fn=pin,
    )


# ---------------------------------------------------------------------------
# q120 — soft dedup: duplicate-cluster-aware sampling weights
# (keep every copy, downweight by cluster size — the alternative to
# q56's hard keeper selection when provenance diversity matters)
# ---------------------------------------------------------------------------
@register(
    "q120_softdedup_weights",
    f"""
    SELECT doc_id, group_id,
           CAST(COUNT(*) OVER (PARTITION BY group_id) AS INT) AS group_size,
           CAST(1 AS DOUBLE) / COUNT(*) OVER (PARTITION BY group_id) AS weight,
           doc_id = group_id AS keeper
    FROM ({_neardup_groups_sql()}) g
    """,
    doc="soft dedup: every document keeps a sampling weight 1/|its "
    "near-dup cluster| (and the min-label keeper flag) instead of being "
    "dropped — total cluster mass stays 1, so the training distribution "
    "is dedup-corrected while provenance diversity survives. One "
    "bounded window (cluster key) on top of the q56 label-propagation "
    "plan; the weight is a single double division, bit-identical "
    "cross-engine",
)
def q120_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    groups = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )
    size = F.count("*").over(W.partitionBy("group_id"))
    return groups.select(
        "doc_id",
        "group_id",
        size.cast("int").alias("group_size"),
        (F.lit(1).cast("double") / size).alias("weight"),
        (F.col("doc_id") == F.col("group_id")).alias("keeper"),
    )


# ---------------------------------------------------------------------------
# q121 — embedding-store ROUND TRIP: write the corpus into the
# manifest-committed bucketed store, read the snapshot back, and run the
# q36 exact search over it — graded against the direct-table oracle, so
# the driver gate itself proves the store's write/read path is lossless
# (f32-exact) end to end.
# ---------------------------------------------------------------------------
@register(
    "q121_store_roundtrip_search",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id >= 5),
         pairs AS (
           SELECT qid, cid, {_duck_cos('qvec', 'cvec')} AS sim FROM q, c
         ),
         ranked AS (
           SELECT qid, cid, sim,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS rank
           FROM pairs
         )
    SELECT qid, cid, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 10
    """,
    doc="store round-trip fidelity under the oracle gate: embeddings "
    "upserted into the hash-bucketed, manifest-committed store, the "
    "snapshot read back, and exact cosine top-10 run over the "
    "round-tripped vectors — hash-compared against DuckDB computing "
    "directly from the source table. Any write/read corruption (f32 "
    "drift, lost bucket, stale generation) breaks the hash. Upsert is "
    "insert-or-replace by path, so bench reruns are idempotent",
)
def q121_store_roundtrip_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from frontmatter_mcp_spark.semantic.store import EmbeddingStore

    e = load_table(spark, sf_dir, "embeddings")
    dim = e.select(F.size("embedding").alias("d")).first()["d"]
    store_dir = (
        f"/tmp/fm_spark_q121_store_{_os.path.basename(sf_dir.rstrip('/'))}"
    )
    st = EmbeddingStore(spark, store_dir, model_name="fixture-f32", dim=dim)
    st.upsert(
        e.select(
            F.concat(F.lit("vec_"), F.col("vec_id").cast("string")).alias("path"),
            F.col("vec_id").cast("double").alias("mtime"),
            F.col("embedding").alias("vector"),
        )
    )
    back = st.read().select(
        F.substring("path", 5, 32).cast("long").alias("vec_id"),
        F.col("vector").alias("embedding"),
    )
    q = back.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = back.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    out = sim.cosine_topk(q, c, k=10, query_vec="qvec", cand_vec="cvec")
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# q122 — REAL-codec image fingerprinting under the oracle gate: text-
# seeded 8x8 BMPs encoded + decoded with the built-in codec, average-
# hashed; the oracle computes the EXPECTED aHash from the pixel recipe
# (pure md5 math) — so the hash compare certifies the codec round trip
# byte-for-byte, the same discipline q121 applies to the store.
# ---------------------------------------------------------------------------
def _image_ahash_sql(tag: str = "") -> str:
    hx_chain = " || ".join(f"md5(text || '{tag}|{k}')" for k in range(12))

    def hv(pos: str) -> str:
        return f"(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"

    def byte(c0: str) -> str:
        return f"({hv(c0)} * 16 + {hv(f'({c0}) + 1')})"

    gs = " + ".join(byte(f"6 * i + {1 + 2 * b}") for b in range(3))
    return f"""
    WITH chain AS (SELECT doc_id, {hx_chain} AS hx FROM documents),
    px AS (
      SELECT doc_id, i, {gs} AS gs
      FROM chain, UNNEST(generate_series(0, 63)) AS t(i)
    ),
    tot AS (SELECT doc_id, SUM(gs) AS tot FROM px GROUP BY 1),
    bits AS (
      SELECT px.doc_id, i, CASE WHEN 64 * gs > tot THEN 1 ELSE 0 END AS b
      FROM px JOIN tot USING (doc_id)
    ),
    bys AS (
      SELECT doc_id, CAST(FLOOR(i / 8.0) AS INT) AS j,
             CAST(SUM(b * ([128, 64, 32, 16, 8, 4, 2, 1])[(i % 8) + 1]) AS INT) AS bv
      FROM bits GROUP BY 1, 2
    ),
    ah AS (
      SELECT doc_id,
             string_agg(substr('0123456789abcdef', CAST(FLOOR(bv / 16.0) AS INT) + 1, 1)
                        || substr('0123456789abcdef', (bv % 16) + 1, 1),
                        '' ORDER BY j) AS ahash
      FROM bys GROUP BY doc_id
    )
    SELECT doc_id, 8 AS width, 8 AS height, ahash,
           CAST(COUNT(*) OVER (PARTITION BY ahash) AS INT) AS n_shared
    FROM ah
    """


@register(
    "q122_image_ahash_dedup",
    _image_ahash_sql(),
    doc="image-level exact dedup through the REAL image codec: text-"
    "seeded 8x8 RGB images are encoded to genuine 24-bit BMPs and "
    "decoded back with the built-in pure-numpy codec inside one Arrow-"
    "batched mapInPandas stage, then 64-bit average-hashed; the oracle "
    "derives the expected aHash from the pixel recipe alone, so any "
    "codec defect (BGR order, row stride, bottom-up flip) breaks the "
    "hash compare. Share counts via a window on the bounded hash key — "
    "identical source texts produce identical images, so aHash groups "
    "are the image analogue of q30",
)
def q122_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = mm.synthetic_image_ahash(d, "doc_id", "text")
    return fp.select(
        "doc_id",
        "width",
        "height",
        "ahash",
        F.count("*").over(W.partitionBy("ahash")).cast("int").alias("n_shared"),
    )


# ---------------------------------------------------------------------------
# q123 — REAL-parser WAV probing under the oracle gate (the q122
# discipline for audio): genuine PCM WAV bytes built per document, the
# built-in RIFF chunk-walk probe extracts the duration, and the oracle
# recomputes it from the recipe arithmetic alone.
# ---------------------------------------------------------------------------
@register(
    "q123_wav_probe",
    """
    SELECT doc_id,
           CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
           CAST(length(text) * 16 + 100 AS INT) AS n_samples,
           CAST((length(text) * 16 + 100) * 2 AS DOUBLE)
             / ((8000 + (doc_id % 8) * 1000) * 2) AS duration_s
    FROM documents
    """,
    doc="audio metadata extraction through the REAL RIFF parser: per-"
    "document PCM WAVs (with a pre-data LIST chunk so the chunk walk "
    "and odd-size padding execute) probed for duration inside one "
    "Arrow-batched mapInPandas stage; the oracle derives the expected "
    "duration from the byte recipe, certifying the parser byte-for-"
    "byte. Narrow stage, no shuffle",
)
def q123_wav_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return mm.synthetic_wav_probe(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# q124 — per-document duplication ratio: what fraction of a document's
# verbatim 8-token runs occur in OTHER documents (the Lee-et-al-style
# memorization-risk score; q41 finds the pairs, q59 the spans — this is
# the per-doc FILTER signal)
# ---------------------------------------------------------------------------
@register(
    "q124_duplication_ratio",
    """
    WITH fps AS (
      SELECT DISTINCT doc_id, substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                                      w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                                      w[i+6] || ' ' || w[i+7]), 1, 16) AS fp
      FROM (SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS w
            FROM documents),
           UNNEST(generate_series(1, len(w) - 7)) AS t(i)
      WHERE len(w) >= 8
    ),
    docfreq AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_windows,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS INT) AS n_shared
      FROM fps JOIN docfreq USING (fp) GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(n_windows, 0) AS n_windows,
           COALESCE(n_shared, 0) AS n_shared,
           CASE WHEN n_windows IS NULL THEN NULL
                ELSE CAST(n_shared AS DOUBLE) / n_windows END AS dup_ratio
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
    doc="per-document duplication ratio: the fraction of a doc's "
    "distinct verbatim 8-token windows that also appear in at least "
    "one other document — the per-doc memorization-risk filter signal "
    "(threshold it to drop mostly-duplicated docs while q56/q120 handle "
    "whole-document clusters). One fingerprint shuffle (map-side "
    "combined document frequencies joined back on the hash key), then "
    "a map-side per-doc aggregate",
)
def q124_duplication_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        "doc_id", F.explode(tk.window_fingerprints(F.col("text"), window=8)).alias("fp")
    )
    docfreq = fps.groupBy("fp").agg(F.count("*").alias("nd"))
    per_doc = (
        fps.join(docfreq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_windows"),
            F.sum((F.col("nd") > 1).cast("int")).cast("int").alias("n_shared"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.col("n_shared").cast("double") / F.col("n_windows")).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q125 — deterministic augmentation: hash-derived token dropout.
# Augmentation at pipeline scale must be REPRODUCIBLE (reruns/backfills
# produce byte-identical augmented corpora) — so the "randomness" is a
# pure function of (doc, position), the df.sample anti-pattern note in
# operators.sampling applied to data augmentation.
# ---------------------------------------------------------------------------
@register(
    "q125_deterministic_augmentation",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    ),
    kept AS (
      SELECT doc_id, i, w[i] AS t
      FROM toks, UNNEST(generate_series(1, len(w))) AS u(i)
      WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1)
            <> '0'
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
             md5(string_agg(t, ' ' ORDER BY i)) AS aug_fp
      FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id, CAST(len(w) AS INT) AS n_tokens,
           COALESCE(agg.n_kept, 0) AS n_kept, agg.aug_fp
    FROM toks LEFT JOIN agg ON agg.doc_id = toks.doc_id
    """,
    doc="reproducible data augmentation: ~1/16 token dropout where the "
    "drop decision is md5(doc, position) — reruns and backfills emit "
    "byte-identical augmented text (verified by the full augmented-"
    "text fingerprint), unlike RNG-seeded augmentation whose output "
    "shifts with partitioning. A narrow zero-shuffle projection (the "
    "index-aware filter lambda runs inside codegen)",
)
def q125_deterministic_augmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+", -1), lambda t: t != ""
    )
    keep = lambda t, i: F.substring(  # noqa: E731
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), i.cast("string"))),
        1,
        1,
    ) != "0"
    kept = F.filter(toks, keep)
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(kept).cast("int").alias("n_kept"),
        F.when(F.size(kept) > 0, F.md5(F.concat_ws(" ", kept))).alias("aug_fp"),
    )


# ---------------------------------------------------------------------------
# q126 — PageRank centrality over the similarity graph (the web-graph
# quality signal of corpus curation, on LSH near-dup edges), exact
# fixed-point integer math, every iteration replayed in the oracle
# ---------------------------------------------------------------------------
_PR_SCALE = 2**40
_PR_ITERS = 3


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    s, base = _PR_SCALE, _PR_SCALE * 15
    ctes = [
        _SHINGLES_CTE.strip().rstrip(","),
        f"sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id)",
        f"bb AS ({band_rows})",
        """pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id
    )""",
        """edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
    )""",
        "odeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY 1)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)",
        f"""p0 AS (
      SELECT doc_id, CAST({s} AS BIGINT) // n AS pr FROM documents CROSS JOIN nn
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""p{t} AS (
      SELECT d.doc_id,
             CAST({base} AS BIGINT) // (100 * n)
             + (85 * COALESCE(c.csum, CAST(0 AS BIGINT))) // 100 AS pr
      FROM documents d CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, CAST(SUM(p.pr // o.odeg) AS BIGINT) AS csum
        FROM edges e
        JOIN p{t - 1} p ON p.doc_id = e.src
        JOIN odeg o ON o.src = e.src
        GROUP BY e.dst
      ) c ON c.dst = d.doc_id
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT p.doc_id, CAST(COALESCE(o.odeg, 0) AS INT) AS out_degree,
           CAST(p.pr AS BIGINT) AS pr_fx
    FROM p{iters} p LEFT JOIN odeg o ON o.src = p.doc_id
    """


@register(
    "q126_similarity_pagerank",
    _pagerank_sql(),
    doc="PageRank centrality over the MinHash-LSH similarity graph — "
    "the web-graph quality signal of corpus curation (rank documents "
    "by how central they sit in the near-duplication structure; high "
    "centrality = template/boilerplate mass, a down-weighting signal). "
    "Exact scaled-integer floor-division math, so all three iterations "
    "replay bit-identically in the oracle CTEs; edges/out-degrees are "
    "pinned across iterations, each iteration is one dst-key shuffle "
    "with map-side combine, and the plan chain is linear in iters",
)
def q126_similarity_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import pagerank_fixed_point

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = dd.lsh_candidate_pairs(d, "doc_id", "text", _NUM_HASHES, _BANDS)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    return pagerank_fixed_point(
        edges, d.select("doc_id"), "doc_id", iters=_PR_ITERS,
        scale=_PR_SCALE, persist_fn=pin,
    )


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
# q128 — the q122 certification for the built-in PNG codec: DEFLATE,
# chunk CRCs, and ALL FIVE scanline filters (the encoder cycles filter
# types per row) stand between the pixel recipe and the hash — any
# defect in Sub/Up/Average/Paeth reconstruction breaks the compare.
# ---------------------------------------------------------------------------
@register(
    "q128_png_ahash_dedup",
    _image_ahash_sql("#png"),
    doc="image dedup through the REAL PNG codec: text-seeded 8x8 images "
    "encoded as genuine non-interlaced truecolor PNGs (zlib DEFLATE + "
    "CRC-verified chunks, scanline filters cycling None/Sub/Up/Average/"
    "Paeth) and decoded back with the built-in pure-stdlib decoder, "
    "then average-hashed; the oracle derives the expected aHash from "
    "the pixel recipe alone. Same narrow one-stage shape as q122",
)
def q128_png_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = mm.synthetic_image_ahash(d, "doc_id", "text", codec="png", tag="#png")
    return fp.select(
        "doc_id",
        "width",
        "height",
        "ahash",
        F.count("*").over(W.partitionBy("ahash")).cast("int").alias("n_shared"),
    )


# ---------------------------------------------------------------------------
# q129 — sparse-vector document similarity: tf/df-weighted cosine k-NN
# via a df-capped inverted index (the SPARSE counterpart of the dense
# embedding ANN family — BM25/TF-IDF-style retrieval structure)
# ---------------------------------------------------------------------------
_SPARSE_SCALE = 2**20
_SPARSE_MAX_DF = 50
_SPARSE_TOPK = 5


def _sparse_knn_sql() -> str:
    s, cap, k = _SPARSE_SCALE, _SPARSE_MAX_DF, _SPARSE_TOPK
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    ),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    w AS (
      SELECT tf.doc_id, tf.t, (tf.tf * {s}) // df.df AS w
      FROM tf JOIN df USING (t) WHERE df.df <= {cap}
    ),
    norms AS (
      SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nrm FROM w GROUP BY 1
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(SUM(a.w * b.w) AS BIGINT) AS dot
      FROM w a JOIN w b USING (t) WHERE a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT id_a, id_b, dot,
             CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS c
      FROM dots
      JOIN norms na ON na.doc_id = id_a
      JOIN norms nb ON nb.doc_id = id_b
    ),
    ranked AS (
      SELECT id_a, id_b, dot, c,
             ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS rnk
      FROM cos
    )
    SELECT id_a AS doc_id, id_b AS nbr_id, dot AS dot_fx,
           round(c, 6) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {k}
    """


@register(
    "q129_sparse_tfidf_knn",
    _sparse_knn_sql(),
    doc="sparse lexical k-NN: tf/df-weighted (fixed-point integer "
    "weights — ln-free, so cross-engine exact) cosine over a df-capped "
    "inverted-index self-join, top-5 neighbors per document with a "
    "total-order tiebreak. The sparse/lexical counterpart of the dense "
    "ANN family (q36/q43/q99): the stop-term df-cap is what bounds the "
    "posting-list join at corpus scale (the q33 discipline); dot "
    "products are exact integers, the only floats are one sqrt and one "
    "division per pair (IEEE-exact both engines)",
)
def q129_sparse_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s, cap, k = _SPARSE_SCALE, _SPARSE_MAX_DF, _SPARSE_TOPK
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfq = tf.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    w = pin(
        tf.join(dfq.filter(F.col("df") <= cap), "t").select(
            "doc_id", "t", F.expr(f"(tf * {s}) div df").alias("w")
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("id_b"), "t", F.col("w").alias("wb"))
    dots = (
        a.join(b, "t")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    cos = dots.join(na, "id_a").join(nb, "id_b").select(
        "id_a", "id_b", "dot",
        (F.col("dot").cast("double") / (F.col("na") * F.col("nb"))).alias("c"),
    )
    rnk_w = W.partitionBy("id_a").orderBy(F.col("c").desc(), F.col("id_b"))
    return (
        cos.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id_a").alias("doc_id"),
            F.col("id_b").alias("nbr_id"),
            F.col("dot").alias("dot_fx"),
            F.round("c", 6).alias("cosine"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# q130 — hard-negative mining for contrastive/embedding training: per
# query vector, the highest-cosine candidates whose LABEL differs (the
# pairs that teach a metric model the most; q109 mines positives, this
# mines the negatives)
# ---------------------------------------------------------------------------
@register(
    "q130_hard_negative_mining",
    f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlab, embedding AS qvec
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS cid, label AS clab, embedding AS cvec
               FROM embeddings WHERE vec_id >= 5),
         pairs AS (
           SELECT qid, cid, {_duck_cos('qvec', 'cvec')} AS sim
           FROM q JOIN c ON qlab <> clab
         ),
         ranked AS (
           SELECT qid, cid, sim,
                  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
                    AS rnk
           FROM pairs
         )
    SELECT qid, cid, sim, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 5
    """,
    doc="hard-negative mining: for each query vector the top-5 most-"
    "similar OTHER-label candidates — the negatives contrastive "
    "training needs (easy negatives teach nothing; same-label near "
    "neighbors would be false negatives and are excluded by the label "
    "join predicate). q36's broadcast-query scan shape with the label "
    "filter fused into the join, exact sequential-fold cosine",
)
def q130_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("qvec"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clab"),
        F.col("embedding").alias("cvec"),
    )
    pairs = F.broadcast(q).join(c, F.col("qlab") != F.col("clab")).select(
        "qid", "cid", vector.cosine_similarity(F.col("qvec"), F.col("cvec")).alias("sim")
    )
    rnk_w = W.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "cid", "sim", F.col("rnk").cast("int").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# q131 — dedup-corrected sampling: weighted reservoir sampling WITHOUT
# replacement (A-ES / Efraimidis-Spirakis) over the q120 soft-dedup
# weights — pick a training subset in which every near-dup CLUSTER
# carries total mass 1, with derandomized keys so reruns and the oracle
# agree exactly (q100's Gumbel discipline applied to weighted sampling)
# ---------------------------------------------------------------------------
_SOFTSAMPLE_K = 100


def _softdedup_sample_sql() -> str:
    u = f"(({_hash_bucket_duck('doc_id', _GUMBEL_SPAN)} + 0.5) / {float(_GUMBEL_SPAN)!r})"
    return f"""
    WITH g AS ({_neardup_groups_sql()}),
    sized AS (
      SELECT doc_id, group_id,
             CAST(COUNT(*) OVER (PARTITION BY group_id) AS INT) AS group_size
      FROM g
    ),
    keyed AS (
      SELECT doc_id, group_id, group_size,
             ROUND(ln({u}) * group_size, 6) AS sample_key
      FROM sized
    )
    SELECT doc_id, group_id, group_size, sample_key
    FROM keyed ORDER BY sample_key DESC, doc_id LIMIT {_SOFTSAMPLE_K}
    """


@register(
    "q131_softdedup_sample",
    _softdedup_sample_sql(),
    doc="dedup-corrected training subset: Efraimidis-Spirakis weighted "
    "sampling without replacement (key = ln(u)^(1/w) in log space = "
    "ln(u) * cluster_size, u derandomized from md5(doc_id)) over the "
    "q120 soft-dedup weights — a cluster of 10 near-dups gets the same "
    "total selection mass as a unique document, so the sample is "
    "dedup-corrected WITHOUT dropping provenance. One narrow map + "
    "TakeOrderedAndProject over the q56 propagation plan",
)
def q131_softdedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    groups = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )
    gs = F.count("*").over(W.partitionBy("group_id")).cast("int")
    u = (hash_bucket(F.col("doc_id"), _GUMBEL_SPAN) + F.lit(0.5)) / F.lit(
        float(_GUMBEL_SPAN)
    )
    keyed = groups.select(
        "doc_id",
        "group_id",
        gs.alias("group_size"),
        F.round(F.log(u) * gs, 6).alias("sample_key"),
    )
    return keyed.orderBy(F.col("sample_key").desc(), "doc_id").limit(_SOFTSAMPLE_K)


# ---------------------------------------------------------------------------
# q132 — Count-Min sketch heavy hitters: the streaming-sketch building
# block, built DETERMINISTICALLY (md5-derived hash rows), so unlike
# engine-native sketches (q27) both engines compute identical cells and
# the estimate property (est >= true, bounded overestimate) is
# hash-verified exactly
# ---------------------------------------------------------------------------
_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 20


def _cms_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql("CAST(r AS VARCHAR) || '|' || t", _CMS_WIDTH)
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    ),
    tf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    hashed AS (
      SELECT t, c, r, {col} AS col
      FROM tf CROSS JOIN UNNEST(generate_series(0, {_CMS_DEPTH - 1})) AS g(r)
    ),
    cells AS (SELECT r, col, CAST(SUM(c) AS BIGINT) AS v FROM hashed GROUP BY 1, 2),
    est AS (
      SELECT h.t, h.c, MIN(cells.v) AS est
      FROM hashed h JOIN cells ON cells.r = h.r AND cells.col = h.col
      GROUP BY 1, 2
    )
    SELECT t AS token, c AS true_count, est AS cms_estimate,
           est - c AS overestimate
    FROM est ORDER BY est DESC, t LIMIT {_CMS_TOPK}
    """


@register(
    "q132_countmin_heavy_hitters",
    _cms_sql(),
    doc="Count-Min sketch heavy hitters over the token stream: a "
    "4 x 256 sketch whose hash rows are md5-derived (deterministic, so "
    "the whole sketch — cells, min-estimates, the est >= true "
    "overestimate property — hash-matches across engines exactly, "
    "unlike engine-native sketches). The sketch aggregate is map-side "
    "combined into 1024 cells and broadcast back for estimates; the "
    "exact counts ride along here as the audit column — at true "
    "stream scale only the sketch survives",
)
def q132_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    tf = (
        d.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    rr = d.sparkSession.range(_CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    hashed = pin(
        tf.crossJoin(F.broadcast(rr)).select(
            "t",
            "c",
            "r",
            hash_bucket(
                F.concat(F.col("r").cast("string"), F.lit("|"), F.col("t")), _CMS_WIDTH
            ).alias("col"),
        )
    )
    cells = hashed.groupBy("r", "col").agg(F.sum("c").cast("long").alias("v"))
    est = (
        hashed.join(F.broadcast(cells), ["r", "col"])
        .groupBy("t", "c")
        .agg(F.min("v").alias("est"))
    )
    return (
        est.select(
            F.col("t").alias("token"),
            F.col("c").alias("true_count"),
            F.col("est").alias("cms_estimate"),
            (F.col("est") - F.col("c")).alias("overestimate"),
        )
        .orderBy(F.col("cms_estimate").desc(), "token")
        .limit(_CMS_TOPK)
    )


# ---------------------------------------------------------------------------
# q134 — BM25 retrieval top-k: the classic probabilistic lexical ranker
# (Robertson k1/b form, the scoring function behind Lucene/Elasticsearch
# and most retrieval-based data curation) over the same df-capped
# inverted index as q129's cosine k-NN
# ---------------------------------------------------------------------------
_BM25_K1 = "1.2"
_BM25_B = "0.75"
_BM25_SCALE = 1 << 30  # fixed-point accumulator: FLOOR(term * 2^30)
_BM25_MAX_DF = 50
_BM25_TOPK = 5
_BM25_QUERY_MOD = 50  # hash-designated query docs: doc_id % 50 == 0
_BM25_QUERY_TERMS = 8  # first N tokens of a query doc form the query


def _bm25_sql(dialect: str, table: str = "documents") -> str:
    """ONE scoring template, two dialects (the q127 discipline): only
    the tokenizer/explode/slice spellings differ; the double-arithmetic
    BM25 term and its fixed-point floor are the same character string,
    so both engines evaluate the same IEEE operation sequence. The sum
    over query terms is an exact BIGINT (order-independent); ln() is
    the one op with a known 1-ulp cross-engine wobble (q94), absorbed
    by ranking and reporting on the 2^-30-quantized score rounded to 4
    decimals."""
    k1, b, s = _BM25_K1, _BM25_B, _BM25_SCALE
    if dialect == "duckdb":
        tokenize = (
            "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
        )
        explode_all = "SELECT doc_id, unnest(w) AS t FROM toks"
        explode_q = (
            f"SELECT DISTINCT doc_id AS qid, unnest(w[1:{_BM25_QUERY_TERMS}]) AS t "
            f"FROM toks WHERE doc_id % {_BM25_QUERY_MOD} = 0"
        )
        dlen = "len(w)"
    else:
        tokenize = r"filter(split(trim(lower(text)), '\\s+'), x -> x <> '')"
        explode_all = "SELECT doc_id, explode(w) AS t FROM toks"
        explode_q = (
            f"SELECT DISTINCT doc_id AS qid, "
            f"explode(slice(w, 1, {_BM25_QUERY_TERMS})) AS t "
            f"FROM toks WHERE doc_id % {_BM25_QUERY_MOD} = 0"
        )
        dlen = "size(w)"
    # the shared scoring fragment — identical text in both dialects
    term = (
        f"ln(1 + (st.nd - df.df + 0.5) / (df.df + 0.5)) * "
        f"((tf.tf * ({k1} + 1)) / "
        f"(tf.tf + {k1} * (1 - {b} + {b} * dl.dl / (CAST(st.tt AS DOUBLE) / st.nd))))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {tokenize} AS w FROM {table}),
    lens AS (SELECT doc_id, CAST({dlen} AS BIGINT) AS dl FROM toks),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
           FROM lens WHERE dl > 0),
    alltoks AS ({explode_all}),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM alltoks GROUP BY 1, 2),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    qt AS ({explode_q}),
    scored AS (
      SELECT qt.qid, tf.doc_id,
             CAST(SUM(CAST(FLOOR(({term}) * {s}) AS BIGINT)) AS BIGINT) AS score_fx,
             CAST(COUNT(*) AS INT) AS n_terms
      FROM qt
      JOIN df ON df.t = qt.t AND df.df <= {_BM25_MAX_DF}
      JOIN tf ON tf.t = qt.t
      JOIN lens dl ON dl.doc_id = tf.doc_id
      CROSS JOIN st
      WHERE tf.doc_id <> qt.qid
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, score_fx, n_terms,
             ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) DESC, doc_id
             ) AS rnk
      FROM scored
    )
    SELECT qid AS query_id, doc_id AS hit_id, n_terms, score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


@register(
    "q134_bm25_topk",
    _bm25_sql("duckdb"),
    doc="BM25 top-k retrieval (Robertson k1=1.2 b=0.75 — the Lucene/"
    "Elasticsearch ranking function): hash-designated query docs (first "
    "8 tokens = the query) against the corpus through the q129-style "
    "df-capped inverted index — posting joins shuffle O(query terms x "
    "bounded postings), never corpus x corpus; corpus stats (N, total "
    "length) are a one-row broadcast. Per-term scores are floored into "
    "2^30 fixed point so the per-pair sum is an exact BIGINT "
    "(order-independent); ranking uses the quantized score with a "
    "doc-id tiebreak. One SQL template, both engines (q127 discipline)",
)
def q134_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_q134")
    return spark.sql(_bm25_sql("spark", "documents_q134"))


# ---------------------------------------------------------------------------
# q135 — exact connected components of the MinHash-LSH candidate graph
# by alternating large-star/small-star contraction (Kiveris et al.) —
# the O(log n)-round, O(edges)-shuffle algorithm that replaces
# fixed-iteration label propagation (q56) when components can be long
# chains. The oracle computes the same unique fixpoint via a recursive
# CTE, so the round count never enters the compare.
# ---------------------------------------------------------------------------
def _ccstar_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    bi AS (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
    reach(node, lbl) AS (
      SELECT DISTINCT a, a FROM bi
      UNION
      SELECT bi.a, reach.lbl FROM reach JOIN bi ON bi.b = reach.node
    ),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1)
    SELECT node AS doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS INT) AS comp_size
    FROM comp
    """


@register(
    "q135_connected_components",
    _ccstar_sql(),
    doc="exact connected components over the MinHash-LSH candidate graph "
    "via alternating large-star/small-star contraction (Kiveris et al. "
    "2014): O(log n) rounds on ANY topology — the scale answer to "
    "near-dup chains where fixed-iteration label propagation (q56) "
    "needs O(diameter) rounds. Every round is one groupBy + one join on "
    "the current edge list with a signature-based convergence check; "
    "per-round tables persisted, predecessors released. Oracle = the "
    "same unique fixpoint via recursive CTE, so iteration counts never "
    "enter the compare",
)
def q135_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    edges = pin(
        dd.lsh_candidate_pairs(d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS)
    )
    comp = dd.connected_components_star(edges, persist_fn=pin)
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count("*").over(W.partitionBy("component")).cast("int").alias("comp_size"),
    )


# ---------------------------------------------------------------------------
# q136 — deterministic HyperLogLog: the distinct-count sketch built from
# md5-derived registers (the q132 discipline applied to HLL), so the
# register table, the harmonic sum, and the estimate all hash-verify
# across engines — unlike engine-native approx_count_distinct (q27,
# bounded-error booleans only)
# ---------------------------------------------------------------------------
_HLL_M = 64  # registers (p = 6)
_HLL_RHO_BITS = 48  # leading-zero probe width (hex digits 8..19)
_HLL_FX = 1 << 49  # exact harmonic sum: sum of 2^(49 - rho) BIGINTs


def _hll_estimate_expr(sum_fx: str, zeros: str) -> str:
    """The shared double-arithmetic estimate — identical text both
    engines (alpha_64 * m^2 / harmonic_sum, with the small-range
    linear-counting correction). The harmonic sum arrives as an exact
    BIGINT (sum of 2^(49-rho)), so the only engine-wobbly op is ln()
    in the correction branch, absorbed by round-4 (q94 discipline)."""
    m = _HLL_M
    # e0-suffixed literals parse as DOUBLE in BOTH engines; bare 0.7213
    # is a DECIMAL literal whose division rules differ cross-engine
    # (measured: 15867.6944 vs 15867.6886 from identical registers)
    raw = (
        f"(0.7213e0 / (1e0 + 1.079e0 / {m})) * {m} * {m} "
        f"/ (CAST({sum_fx} AS DOUBLE) / {float(_HLL_FX)})"
    )
    return (
        f"round(CASE WHEN ({raw}) <= 2.5e0 * {m} AND {zeros} > 0 "
        f"THEN {m} * ln(CAST({m} AS DOUBLE) / {zeros}) "
        f"ELSE ({raw}) END, 4)"
    )


def _hll_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    # 48-bit probe value from md5 hex digits 8..19 (strpos digit fold —
    # the hash_bucket portability trick)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    est = _hll_estimate_expr("s.sum_fx", "s.zeros")
    return f"""
    WITH {_SHINGLES_CTE},
    items AS (SELECT DISTINCT shingle AS t FROM sh),
    regs AS (
      SELECT {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho
      FROM items GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} AS sum_fx,
             CAST({_HLL_M} - COUNT(*) AS INT) AS zeros,
             md5(string_agg(reg || ':' || rho, '|' ORDER BY reg)) AS register_fp
      FROM regs
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM items)
    SELECT n.n_exact, s.zeros, s.sum_fx, s.register_fp,
           {est} AS estimate,
           ABS({est} - n.n_exact) / n.n_exact <= 0.39 AS within_3sigma
    FROM s CROSS JOIN n
    """


@register(
    "q136_hll_distinct",
    _hll_sql(),
    doc="deterministic HyperLogLog distinct-count sketch over the corpus "
    "shingle set (word 3-grams — thousands of distinct items, the "
    "sketch's real operating range; the raw vocabulary is ~31 tokens): "
    "md5-derived register index (6 bits) + leading-zero rank "
    "over a 48-bit md5 probe, so the full register table (fingerprinted), "
    "the exact-BIGINT harmonic sum (sum of 2^(49-rho) — no double "
    "accumulation), the estimate, and its 3-sigma bound vs the exact "
    "count all hash-verify across engines — the cross-engine-checkable "
    "counterpart of q27's engine-native approx_count_distinct. One "
    "corpus explode, map-side combine into 64 registers",
)
def q136_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = pin(
        d.select(F.explode(dd.word_shingles(F.col("text"), 3)).alias("t")).distinct()
    )
    h = F.md5(F.col("t").cast("string"))
    v = F.lit(0).cast("long")
    for i in range(8, 20):
        v = v * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        )
    rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
    )
    regs = (
        toks.select(hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho"))
        .groupBy("reg")
        .agg(F.max("__rho").cast("int").alias("rho"))
    )
    s = regs.agg(
        (
            F.sum(F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long")).cast("long")
            + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
        ).alias("sum_fx"),
        (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("reg", "rho"))),
                    lambda r: F.concat(
                        r.reg.cast("string"), F.lit(":"), r.rho.cast("string")
                    ),
                ),
                "|",
            )
        ).alias("register_fp"),
    )
    n = toks.agg(F.count("*").cast("long").alias("n_exact"))
    est = _hll_estimate_expr("sum_fx", "zeros")
    return (
        s.crossJoin(F.broadcast(n))
        .selectExpr(
            "n_exact",
            "zeros",
            "sum_fx",
            "register_fp",
            f"{est} AS estimate",
            f"ABS({est} - n_exact) / n_exact <= 0.39 AS within_3sigma",
        )
    )


# ---------------------------------------------------------------------------
# q137 — per-document longest duplicated window via a doubling ladder
# (the variable-length upgrade over the fixed-n span family: q59
# detects 4-gram spans, q93 scrubs them, q124 ratios them; this
# measures HOW LONG the verbatim overlap runs — the ExactSubstr length
# signal of Lee et al. without a distributed suffix array)
# ---------------------------------------------------------------------------
_LADDER = [4, 8, 16, 32, 64]


def _dup_ladder_sql() -> str:
    ctes = [
        "toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w "
        "FROM documents)"
    ]
    prev_src = "toks"
    levels = []
    for n in _LADDER:
        s, d = f"s{n}", f"d{n}"
        ctes.append(
            f"""{s} AS (
      SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+{n - 1}], ' ')) AS sp
      FROM {prev_src}, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}
    )"""
        )
        ctes.append(
            f"""{d} AS (
      SELECT DISTINCT doc_id FROM {s}
      WHERE sp IN (SELECT sp FROM {s} GROUP BY sp HAVING COUNT(*) >= 2)
    )"""
        )
        levels.append(f"SELECT doc_id, {n} AS lvl FROM {d}")
        prev_src = f"(SELECT toks.* FROM toks JOIN {d} USING (doc_id))"
    lvl_union = " UNION ALL ".join(levels)
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block},
    lv AS ({lvl_union}),
    best AS (SELECT doc_id, MAX(lvl) AS mx FROM lv GROUP BY 1)
    SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_tokens,
           CAST(COALESCE(b.mx, 0) AS INT) AS max_dup_window
    FROM toks t LEFT JOIN best b USING (doc_id)
    """


@register(
    "q137_dup_window_ladder",
    _dup_ladder_sql(),
    doc="per-document longest cross-doc duplicated window at power-of-2 "
    "resolution (doubling ladder 4..64): each rung explodes windows ONLY "
    "for documents that passed the previous rung — a shared 2n-window "
    "implies a shared n-window, so the candidate set shrinks "
    "geometrically and the total shuffle is O(tokens of still-duplicated "
    "docs) per rung, never 5x the corpus. The variable-length "
    "ExactSubstr signal (Lee et al.) without a suffix array; spans "
    "distinct-per-doc before the count so within-doc repeats don't vote",
)
def q137_dup_window_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w")
    )
    cur = toks
    level_tables = []
    for n in _LADDER:
        spans = (
            cur.filter(F.size("w") >= n)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
                "w",
            )
            .select(
                "doc_id",
                # md5 the window BEFORE the shuffle: a 64-token span is
                # ~400 bytes, its hash 32 — the distinct/groupBy/join
                # exchanges carry the hash only (engine-portable, so the
                # oracle hashes identically)
                F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("sp"),
            )
            .distinct()
        )
        dup_spans = (
            spans.groupBy("sp").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
        )
        dup_docs = pin(spans.join(dup_spans, "sp").select("doc_id").distinct())
        level_tables.append(dup_docs.withColumn("lvl", F.lit(n)))
        cur = toks.join(dup_docs, "doc_id")
    lv = level_tables[0]
    for t in level_tables[1:]:
        lv = lv.unionAll(t)
    best = lv.groupBy("doc_id").agg(F.max("lvl").alias("mx"))
    return toks.join(best, "doc_id", "left").select(
        "doc_id",
        F.size("w").cast("int").alias("n_tokens"),
        F.coalesce("mx", F.lit(0)).cast("int").alias("max_dup_window"),
    )


# ---------------------------------------------------------------------------
# q138 — the q122/q128 certification for the built-in baseline JPEG
# codec: the ENTROPY layer (canonical Huffman tables from the Annex K
# BITS/HUFFVAL lists, magnitude/ones-complement value bits, ZRL/EOB run
# coding, DC DPCM across blocks, 0xFF byte stuffing, marker framing) is
# bijective, so the oracle derives every expected coefficient from the
# md5 recipe and the decode must recover it bit-exactly through a real
# JFIF bytestream. The lossy pixel path (float DCT + quantization) is
# unit-certified in tests/test_jpeg.py.
# ---------------------------------------------------------------------------
def _jpeg_cert_sql() -> str:
    from frontmatter_mcp_spark.sources.multimodal import _JPEG_AC_POS

    hexd = "0123456789abcdef"

    def fold2(h: str, i: int) -> str:  # 1-based hex positions i, i+1
        return (
            f"((strpos('{hexd}', substr({h}, {i}, 1)) - 1) * 16"
            f" + (strpos('{hexd}', substr({h}, {i + 1}, 1)) - 1))"
        )

    block_strs = []
    nz_terms = []
    for k in range(4):
        h = f"md5(text || '#jpeg{k}')"
        vals = {0: f"({fold2(h, 1)} - 128)"}
        for j, p in enumerate(_JPEG_AC_POS):
            vals[p] = f"({fold2(h, 3 + 2 * j)} - 128)"
        terms = []
        for i in range(64):
            if i in vals:
                terms.append(f"CAST({vals[i]} AS VARCHAR)")
                nz_terms.append(f"CASE WHEN {vals[i]} <> 0 THEN 1 ELSE 0 END")
            else:
                terms.append("'0'")
        # flat concat_ws call: a 64-deep `||` chain trips DuckDB's
        # binder recursion limit
        block_strs.append("concat_ws('|', " + ", ".join(terms) + ")")
    full = "concat_ws('|', " + ", ".join(block_strs) + ")"
    nz = " + ".join(nz_terms)
    return f"""
    SELECT doc_id, 16 AS width, 16 AS height,
           CAST(({nz}) AS INT) AS n_nonzero,
           md5({full}) AS coeff_fp
    FROM documents
    """


@register(
    "q138_jpeg_coeff_roundtrip",
    _jpeg_cert_sql(),
    doc="REAL baseline-JPEG certification through the oracle gate: four "
    "md5-seeded quantized-coefficient blocks per document are written as "
    "a genuine JFIF bytestream (standard Annex K Huffman tables, DC DPCM, "
    "ZRL runs forced by the coefficient positions, 0xFF stuffing) and "
    "decoded back by the built-in pure-numpy parser inside one "
    "Arrow-batched mapInPandas stage; the md5 fingerprint of all 256 "
    "decoded values must equal the oracle's recipe-derived fingerprint — "
    "the coefficient layer is bijective, so any entropy-coding defect "
    "breaks the hash. Closes the last hard-codec gap (BMP q122, PNG "
    "q128, WAV q123)",
)
def q138_jpeg_coeff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    return mm.synthetic_jpeg_coeff_fp(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# q140 — ANALYZE-style column statistics (the CBO stats collector every
# engine ships): per numeric column one-pass base stats, an equi-width
# 8-bucket histogram on the observed range, and the top-3 most common
# values — the inputs a cost-based optimizer uses for selectivity and
# the inputs a data engineer reads before trusting a table
# ---------------------------------------------------------------------------
_STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_HIST_BUCKETS = 8


def _stats_bucket_expr(v: str, mn: str, mx: str) -> str:
    """Shared bucket arithmetic — identical text both engines so the
    IEEE float ops and the floor land identically."""
    b = _HIST_BUCKETS
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
        f"LEAST(CAST(FLOOR(({v} - {mn}) / (({mx} - {mn}) / {b})) AS INT), {b - 1}) "
        f"END"
    )


def _colstats_sql() -> str:
    longs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _STATS_COLS
    )
    bucket = _stats_bucket_expr("l.v", "s.min_v", "s.max_v")
    return f"""
    WITH long AS ({longs}),
    stats AS (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
             MIN(v) AS min_v, MAX(v) AS max_v
      FROM long GROUP BY 1
    ),
    bucketed AS (
      SELECT l.col, {bucket} AS b
      FROM long l JOIN stats s USING (col) WHERE l.v IS NOT NULL
    ),
    hist AS (
      SELECT col, string_agg(b || ':' || c, ',' ORDER BY b) AS histogram
      FROM (SELECT col, b, CAST(COUNT(*) AS BIGINT) AS c FROM bucketed GROUP BY 1, 2)
      GROUP BY 1
    ),
    vc AS (
      SELECT col, CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR) AS vs, COUNT(*) AS c
      FROM long WHERE v IS NOT NULL GROUP BY 1, 2
    ),
    mcv AS (
      SELECT col, string_agg(vs || ':' || c, ',' ORDER BY rnk) AS top_values
      FROM (SELECT col, vs, c,
                   ROW_NUMBER() OVER (PARTITION BY col ORDER BY c DESC, vs) AS rnk
            FROM vc)
      WHERE rnk <= 3 GROUP BY 1
    )
    SELECT s.col, s.n, s.n_null, s.ndv, s.min_v, s.max_v, h.histogram, m.top_values
    FROM stats s JOIN hist h USING (col) JOIN mcv m USING (col)
    """


@register(
    "q140_column_stats",
    _colstats_sql(),
    doc="ANALYZE-style column statistics over lineitem's numeric columns: "
    "count/nulls/exact NDV/min/max in one unpivoted scan, an equi-width "
    "8-bucket histogram on the observed range (two-pass: the 4-row stats "
    "table broadcasts back for bucketing — the standard ANALYZE shape), "
    "and the top-3 most common values with a total-order tiebreak. The "
    "CBO selectivity inputs every engine ships; bucket arithmetic shared "
    "verbatim with the oracle so float edges land identically, MCV "
    "values decimal-formatted (double->string is not cross-engine "
    "stable)",
)
def q140_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ln = load_table(spark, sf_dir, "lineitem")
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS DOUBLE)" for c in _STATS_COLS
    )
    long = ln.selectExpr(
        f"stack({len(_STATS_COLS)}, {stack_args}) AS (col, v)"
    )
    long = pin(long)
    stats = long.groupBy("col").agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.count("v")).cast("long").alias("n_null"),
        F.countDistinct("v").cast("long").alias("ndv"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    joined = long.filter(F.col("v").isNotNull()).join(
        F.broadcast(stats.select("col", "min_v", "max_v")), "col"
    )
    bucket = F.expr(_stats_bucket_expr("v", "min_v", "max_v"))
    hist = (
        joined.select("col", bucket.alias("b"))
        .groupBy("col", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "c"))),
                    lambda s: F.concat(
                        s.b.cast("string"), F.lit(":"), s.c.cast("string")
                    ),
                ),
                ",",
            ).alias("histogram")
        )
    )
    vc = (
        long.filter(F.col("v").isNotNull())
        .select("col", F.col("v").cast("decimal(18,2)").cast("string").alias("vs"))
        .groupBy("col", "vs")
        .agg(F.count("*").alias("c"))
    )
    rnk = W.partitionBy("col").orderBy(F.col("c").desc(), "vs")
    mcv = (
        vc.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") <= 3)
        .groupBy("col")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", "vs", "c"))),
                    lambda s: F.concat(s.vs, F.lit(":"), s.c.cast("string")),
                ),
                ",",
            ).alias("top_values")
        )
    )
    return stats.join(hist, "col").join(mcv, "col").select(
        "col", "n", "n_null", "ndv", "min_v", "max_v", "histogram", "top_values"
    )


# ---------------------------------------------------------------------------
# q141 — incremental materialized-view maintenance: the MV is refreshed
# by MERGING partial aggregates of the old snapshot and the new delta
# instead of recomputing over the full table — the core mechanism of
# every incremental-refresh system (sums/counts merge; avg derives).
# The oracle recomputes the view directly over the whole table, so the
# hash compare IS the incremental == full-recompute proof.
# ---------------------------------------------------------------------------
_MV_DELTA_CUTOFF = "1998-09-01"


@register(
    "q141_incremental_mv",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
    doc="incremental materialized-view maintenance: the Spark side "
    "builds the MV from the pre-cutoff snapshot's partial aggregates "
    "MERGED with the delta batch's partial aggregates (sum+sum, "
    "count+count, avg re-derived — the algebraic-aggregate merge rule "
    "every incremental refresh engine implements); the oracle computes "
    "the view directly over the full table, so hash equality proves "
    "incremental == recompute. DECIMAL-exact sums; at scale the "
    "snapshot side is the stored MV, so refresh cost is O(delta), not "
    "O(table)",
)
def q141_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ln = load_table(spark, sf_dir, "lineitem")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s_price"),
            F.count("*").cast("long").alias("n"),
        )
    # the stored-MV side (everything before the cutoff) and the newly
    # ingested delta; in production `old` is read back from the MV
    # table, not recomputed — the merge below is the refresh operation
    old = partial(ln.filter(F.col("l_shipdate") < F.lit(_MV_DELTA_CUTOFF)))
    delta = partial(ln.filter(F.col("l_shipdate") >= F.lit(_MV_DELTA_CUTOFF)))
    merged = (
        old.unionAll(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("s_qty").alias("s_qty"),
            F.sum("s_price").alias("s_price"),
            F.sum("n").alias("n"),
        )
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("s_qty").cast("double").alias("sum_qty"),
        F.col("s_price").cast("double").alias("sum_price"),
        F.col("n").cast("long").alias("n_rows"),
        (F.col("s_qty").cast("double") / F.col("n")).alias("avg_qty"),
    )


# ---------------------------------------------------------------------------
# q142 — Z-order (Morton) data layout: the multi-column clustering
# primitive behind Delta/Iceberg OPTIMIZE ZORDER. Rows are laid out
# along an interleaved-bit curve over (l_partkey, l_suppkey) and cut
# into 16 "files"; the output is the per-file min/max envelope of BOTH
# columns — the zone-map metric that decides how many files a
# two-predicate scan can skip. Everything is exact integer arithmetic
# from ONE template (q127 discipline), so the layout hash-verifies.
# ---------------------------------------------------------------------------
_Z_BITS = 16
_Z_FILES = 16


def _zorder_sql(table: str, idiv: str) -> str:
    # 16-bit normalized rank per column, then bit interleave: exact
    # integer ops only (the scale product fits int64: values < 2^31)
    def norm(v: str, mn: str, mx: str) -> str:
        return (
            f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
            f"((({v} - {mn}) * {(1 << _Z_BITS) - 1}) {idiv} ({mx} - {mn})) END"
        )

    interleave = " + ".join(
        f"((xn {idiv} {1 << i}) % 2) * {1 << (2 * i)} "
        f"+ ((yn {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(_Z_BITS)
    )
    file_width = (1 << (2 * _Z_BITS)) // _Z_FILES
    return f"""
    WITH st AS (
      SELECT CAST(MIN(l_partkey) AS BIGINT) AS pmin, CAST(MAX(l_partkey) AS BIGINT) AS pmax,
             CAST(MIN(l_suppkey) AS BIGINT) AS smin, CAST(MAX(l_suppkey) AS BIGINT) AS smax
      FROM {table}
    ),
    nrm AS (
      SELECT CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk,
             {norm('CAST(l_partkey AS BIGINT)', 'st.pmin', 'st.pmax')} AS xn,
             {norm('CAST(l_suppkey AS BIGINT)', 'st.smin', 'st.smax')} AS yn
      FROM {table} CROSS JOIN st
    ),
    z AS (SELECT pk, sk, ({interleave}) AS zval FROM nrm),
    f AS (SELECT pk, sk, CAST(zval {idiv} {file_width} AS INT) AS file_id FROM z)
    SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(pk) AS part_lo, MAX(pk) AS part_hi,
           MIN(sk) AS supp_lo, MAX(sk) AS supp_hi
    FROM f GROUP BY 1
    """


@register(
    "q142_zorder_layout",
    _zorder_sql("lineitem", "//"),
    doc="Z-order (Morton) multi-column clustering over (l_partkey, "
    "l_suppkey): 16-bit normalized ranks bit-interleaved into a 32-bit "
    "curve position, rows cut into 16 equal curve ranges ('files'), and "
    "the per-file min/max envelope of BOTH columns emitted — the "
    "zone-map quality a two-predicate scan skips files by (linear "
    "layout keys one column tight and the other full-range; the curve "
    "bounds both). Exact integer arithmetic from one SQL template; the "
    "only corpus shuffle is the final 16-group aggregate, min/max stats "
    "are a one-row broadcast",
)
def q142_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q142")
    return spark.sql(_zorder_sql("lineitem_q142", " div "))


# ---------------------------------------------------------------------------
# q143 — SCD type-2 dimension history: turn a change stream into
# validity intervals (the warehouse-standard slowly-changing-dimension
# build; q26's CDC upsert keeps only latest state — this keeps the full
# history a point-in-time join needs). Consecutive duplicate states are
# collapsed first (a change event that doesn't change the tracked
# attribute must not open a new version).
# ---------------------------------------------------------------------------
@register(
    "q143_scd2_history",
    """
    WITH c AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, event_type FROM c
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    v AS (
      SELECT user_id, event_type AS status, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version
      FROM changes
    )
    SELECT user_id, status,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'), 'current')
             AS valid_to,
           CAST(version AS INT) AS version,
           valid_to IS NULL AS is_current
    FROM v
    """,
    doc="SCD type-2 dimension history from a change stream: per-user "
    "event-type runs collapsed (no-op changes open no version), then "
    "validity intervals via LEAD with a total-order tiebreak — "
    "valid_to of the latest version is NULL/'current'. The full-history "
    "complement of q26's keep-latest CDC upsert; the whole build is two "
    "windows over ONE exchange on user_id (plan: single Sort+Window "
    "chain, no extra shuffle)",
)
def q143_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    v = changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("vf"),
        F.lead("ts").over(w2).alias("vt"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
    return v.select(
        "user_id",
        "status",
        F.date_format("vf", fmt).alias("valid_from"),
        F.coalesce(F.date_format("vt", fmt), F.lit("current")).alias("valid_to"),
        "version",
        F.col("vt").isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# q144 — interval merging (gaps-and-islands): per supplier, overlapping
# [shipdate, receiptdate] windows coalesced into islands — the classic
# coverage/merge problem behind SLA windows, maintenance calendars, and
# validity-interval dedup. One window chain on a single exchange.
# ---------------------------------------------------------------------------
@register(
    "q144_interval_islands",
    """
    WITH iv AS (
      SELECT l_suppkey AS sk, CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE) + CAST(l_quantity AS INT) AS e,
             l_orderkey AS ok, l_linenumber AS ln
      FROM lineitem
    ),
    m AS (
      SELECT sk, s, e, ok, ln,
             MAX(e) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    g AS (
      SELECT sk, s, e, ok, ln,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS is_new
      FROM m
    ),
    agg AS (
      SELECT sk, island, MIN(s) AS island_start, MAX(e) AS island_end,
             COUNT(*) AS n_iv
      FROM (SELECT sk, s, e,
                   SUM(is_new) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
            FROM g)
      GROUP BY 1, 2
    )
    SELECT sk AS suppkey,
           CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           CAST(SUM(date_diff('day', island_start, island_end) + 1) AS BIGINT)
             AS covered_days,
           CAST(MAX(n_iv) AS BIGINT) AS max_island_size
    FROM agg GROUP BY 1
    """,
    doc="gaps-and-islands interval merge: per supplier the overlapping "
    "[shipdate, shipdate + quantity days] windows coalesce into islands via the "
    "running-max-end rule (new island iff start > max of all previous "
    "ends — handles nested intervals that LAG alone gets wrong), then "
    "per-supplier island count, total covered days, and largest island. "
    "Total-order window keys throughout; the whole build is one "
    "exchange on the supplier key",
)
def q144_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    iv = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.col("l_shipdate").cast("date").alias("s"),
        # the synthetic lineitem carries no receiptdate: derive a
        # deterministic interval end (ship + quantity days) so islands
        # genuinely overlap
        F.date_add(F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int")).alias("e"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    order = [F.col("s"), F.col("e"), F.col("ok"), F.col("ln")]
    w_prev = (
        W.partitionBy("sk").orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    )
    g = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "is_new",
        (
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))
        ).cast("int"),
    )
    w_run = (
        W.partitionBy("sk")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    isl = g.withColumn("island", F.sum("is_new").over(w_run))
    agg = isl.groupBy("sk", "island").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count("*").alias("n_iv"),
    )
    return agg.groupBy("sk").agg(
        F.count("*").cast("int").alias("n_islands"),
        F.sum("n_iv").cast("long").alias("n_intervals"),
        F.sum(F.datediff("island_end", "island_start") + 1)
        .cast("long")
        .alias("covered_days"),
        F.max("n_iv").cast("long").alias("max_island_size"),
    ).withColumnRenamed("sk", "suppkey")


# ---------------------------------------------------------------------------
# q145 — Johnson-Lindenstrauss random projection audit: 64d -> 16d via a
# +-1 sign matrix derived from md5 at BUILD time (data-independent plan
# literals, the q43 hyperplane discipline), evaluating per-pair distance
# distortion — the calibration run before trusting a projected index
# (JL: ratio concentrates around 1 with sd ~ sqrt(2/k)).
# ---------------------------------------------------------------------------
_JL_IN_DIM = 64
_JL_OUT_DIM = 16


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1 if hashlib.md5(f"jl|{j}|{i}".encode()).hexdigest()[0] >= "8" else -1
            for i in range(_JL_IN_DIM)
        ]
        for j in range(_JL_OUT_DIM)
    ]


def _jl_sql(table: str, base: int) -> str:
    """One template, two dialects: ``base`` is the engine's array index
    origin (DuckDB 1, Spark 0). Every float chain is written in one
    fixed left-associative order, so the doubles are bit-identical —
    the sign matrix is literal +/-."""
    signs = _jl_signs()
    diffs = ", ".join(
        f"CAST(a.embedding[{i + base}] AS DOUBLE) - "
        f"CAST(b.embedding[{i + base}] AS DOUBLE) AS d{i}"
        for i in range(_JL_IN_DIM)
    )
    d2_orig = "0 " + " ".join(f"+ d{i} * d{i}" for i in range(_JL_IN_DIM))
    projs = ", ".join(
        "(0 "
        + " ".join(
            ("+" if signs[j][i] > 0 else "-") + f" d{i}"
            for i in range(_JL_IN_DIM)
        )
        + f") AS p{j}"
        for j in range(_JL_OUT_DIM)
    )
    d2_proj = "0 " + " ".join(f"+ p{j} * p{j}" for j in range(_JL_OUT_DIM))
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {diffs}
      FROM {table} a JOIN {table} b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 5 = 0
    ),
    pr AS (
      SELECT id_a, id_b, ({d2_orig}) AS d2_orig, {projs}
      FROM pairs
    )
    SELECT id_a, id_b,
           round(d2_orig, 6) AS d2_orig,
           round(({d2_proj}), 6) AS d2_proj,
           round(CASE WHEN d2_orig = 0 THEN NULL
                      ELSE ({d2_proj}) / ({_JL_OUT_DIM} * d2_orig) END, 6)
             AS distortion_ratio
    FROM pr
    """


@register(
    "q145_jl_projection",
    _jl_sql("embeddings", 1),
    doc="Johnson-Lindenstrauss projection audit: 64d embeddings "
    "projected to 16d through a literal +-1 md5-derived sign matrix "
    "(data-independent plan constants — no matrix table, no join), and "
    "the squared-distance distortion ratio d2_proj/(k*d2_orig) measured "
    "on deterministic adjacent pairs. Linearity folds the projection "
    "into the difference vector, so each pair is one narrow codegen "
    "chain; every float sum is a fixed left-associative chain shared "
    "verbatim with the oracle (bit-identical doubles). The calibration "
    "evidence before swapping an ANN index to projected vectors",
)
def q145_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings_q145"
    )
    return spark.sql(_jl_sql("embeddings_q145", 0))


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
    pos = pin(pos)
    fr = pos.groupBy("t").agg(F.count("*").cast("long").alias("cnt"))
    tt = pos.agg(F.count("*").cast("long").alias("total"))
    thr = F.expr(_sg_keep_threshold("cnt", "total"))
    keep_key = hash_bucket(
        F.concat_ws(
            "|", F.col("doc_id").cast("string"), F.col("p").cast("string"), F.col("t")
        ),
        _SG_FX,
    )
    kept = pin(
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
# q147 — cluster-aware cross-validation folds: folds are assigned per
# NEAR-DUP GROUP (q56's propagation), not per document, so near-
# duplicates can never straddle a train/eval fold boundary — the
# leakage-safe split rule (the q60/q95 decontamination concern applied
# to CV). The output quantifies what doc-level splitting would have
# leaked.
# ---------------------------------------------------------------------------
_CV_FOLDS = 5


def _cv_folds_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    gfold = hash_bucket_sql("group_id", _CV_FOLDS)
    dfold = hash_bucket_sql("doc_id", _CV_FOLDS)
    groups = _neardup_groups_sql()
    return f"""
    WITH g AS ({groups}),
    a AS (
      SELECT doc_id, group_id, {gfold} AS fold, {dfold} AS doc_fold
      FROM g
    ),
    leaky AS (
      SELECT CAST(COUNT(*) AS INT) AS n_leaky_groups_doc_split
      FROM (SELECT group_id FROM a GROUP BY 1
            HAVING COUNT(DISTINCT doc_fold) > 1)
    )
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN group_id <> doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonkeeper_docs,
           l.n_leaky_groups_doc_split
    FROM a CROSS JOIN leaky l
    GROUP BY fold, l.n_leaky_groups_doc_split
    """


@register(
    "q147_cluster_cv_folds",
    _cv_folds_sql(),
    doc="leakage-safe cross-validation folds: every document inherits "
    "its near-dup GROUP's fold (md5 of the q56 group id), so paraphrase "
    "clusters never straddle a fold boundary; per-fold doc/group counts "
    "plus the count of groups a naive doc-level split WOULD have torn "
    "across folds (the leakage this rule prevents). One hash map over "
    "the propagation output + a group-key aggregate",
)
def q147_cluster_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    groups = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )
    a = pin(
        groups.select(
            "doc_id",
            "group_id",
            hash_bucket(F.col("group_id"), _CV_FOLDS).alias("fold"),
            hash_bucket(F.col("doc_id"), _CV_FOLDS).alias("doc_fold"),
        )
    )
    leaky = (
        a.groupBy("group_id")
        .agg(F.countDistinct("doc_fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .agg(F.count("*").cast("int").alias("n_leaky_groups_doc_split"))
    )
    return (
        a.crossJoin(F.broadcast(leaky))
        .groupBy("fold", "n_leaky_groups_doc_split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("group_id").cast("long").alias("n_groups"),
            F.sum((F.col("group_id") != F.col("doc_id")).cast("int"))
            .cast("long")
            .alias("n_nonkeeper_docs"),
        )
        .select(
            "fold", "n_docs", "n_groups", "n_nonkeeper_docs",
            "n_leaky_groups_doc_split",
        )
    )


# ---------------------------------------------------------------------------
# q148 — k-NN classifier evaluation over the embedding space: each held
# query vector is labeled by the majority label of its 5 nearest
# neighbors (cosine, ties to the smaller label) and scored against its
# true label — the standard probe for "does this embedding space
# separate my classes" before training anything on it.
# ---------------------------------------------------------------------------
@register(
    "q148_knn_classifier_eval",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS true_label
               FROM embeddings WHERE vec_id % 10 = 0),
    c AS (SELECT vec_id AS cid, embedding AS cvec, label AS clabel
          FROM embeddings WHERE vec_id % 10 <> 0),
    pairs AS (
      SELECT qid, true_label, cid, clabel, {_duck_cos('qvec', 'cvec')} AS sim
      FROM q, c
    ),
    top5 AS (
      SELECT qid, true_label, clabel
      FROM (SELECT qid, true_label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
                     AS rnk
            FROM pairs)
      WHERE rnk <= 5
    ),
    votes AS (
      SELECT qid, true_label, clabel, COUNT(*) AS v FROM top5 GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT qid, true_label, clabel AS predicted
      FROM (SELECT qid, true_label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY v DESC, clabel)
                     AS r
            FROM votes)
      WHERE r = 1
    )
    SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred GROUP BY 1
    """,
    doc="k-NN classifier probe of the embedding space: 10% held-out "
    "query vectors labeled by the majority label of their 5 exact-cosine "
    "nearest neighbors (vote ties to the smaller label, rank ties to the "
    "smaller id), per-class accuracy against the true labels — the "
    "does-the-space-separate-classes check run before training an "
    "embedding-based filter. Query side broadcasts into one candidate "
    "scan (q36 shape); both rankings are windows over bounded keys",
)
def q148_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("true_label"),
    )
    c = e.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        F.col("label").alias("clabel"),
    )
    # the top-5 table is bounded (5 x |queries|): IT is the broadcast
    # side of the corpus-label join, never the corpus
    top5 = c.select("cid", "clabel").join(
        F.broadcast(
            sim.cosine_topk(q, c, k=5).join(
                F.broadcast(q.select("qid", "true_label")), "qid"
            )
        ),
        "cid",
    )
    votes = top5.groupBy("qid", "true_label", "clabel").agg(
        F.count("*").alias("v")
    )
    r = W.partitionBy("qid").orderBy(F.col("v").desc(), "clabel")
    pred = (
        votes.withColumn("r", F.row_number().over(r))
        .filter(F.col("r") == 1)
        .select("qid", "true_label", F.col("clabel").alias("predicted"))
    )
    correct = F.sum(
        (F.col("predicted") == F.col("true_label")).cast("int")
    ).cast("long")
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("long").alias("n_queries"),
        correct.alias("n_correct"),
        F.round(correct.cast("double") / F.count("*"), 6).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# q149 — confusion matrix + precision/recall/F1 for the trained q111
# quality classifier (q117 gives calibration; this gives the
# thresholded operating point — the numbers a gate owner actually signs
# off on before turning the filter loose on a corpus)
# ---------------------------------------------------------------------------
def _confusion_sql() -> str:
    return f"""
    WITH s AS ({_classifier_sql()}),
    c AS (
      SELECT CAST(SUM(CASE WHEN label = 1 AND score_fx >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN label = 0 AND score_fx >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN label = 1 AND score_fx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN label = 0 AND score_fx < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM s
    )
    SELECT tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
    FROM c
    """


@register(
    "q149_classifier_confusion",
    _confusion_sql(),
    doc="confusion matrix + precision/recall/F1/accuracy for the q111 "
    "trained quality filter at the score>=0 operating point — the "
    "sign-off numbers for a model-based gate (q117 covers calibration). "
    "One extra 4-counter aggregate over the bit-exact replayed scores; "
    "ratios are identical double expressions rounded to 6",
)
def q149_classifier_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    s = hashed_linear_scores(
        d, "doc_id", "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS, iters=_CLF_ITERS, persist_fn=pin,
    )
    pred = F.col("score_fx") >= 0
    pos = F.col("label") == 1
    c = s.agg(
        F.sum((pos & pred).cast("int")).cast("long").alias("tp"),
        F.sum((~pos & pred).cast("int")).cast("long").alias("fp"),
        F.sum((pos & ~pred).cast("int")).cast("long").alias("fn"),
        F.sum((~pos & ~pred).cast("int")).cast("long").alias("tn"),
    )
    return c.selectExpr(
        "tp", "fp", "fn", "tn",
        "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_",
        "round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_",
        "round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1",
        "round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy",
    )


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
    cells = pin(
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


def _join_size_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql("CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)", _JSZ_WIDTH)
    return f"""
    WITH a AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
               FROM orders GROUP BY 1),
    b AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1),
    truth AS (SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS true_size
              FROM a JOIN b USING (k)),
    ca AS (SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
           FROM a CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
           GROUP BY 1, 2),
    cb AS (SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
           FROM b CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
           GROUP BY 1, 2),
    rows_ AS (SELECT ca.r, CAST(SUM(ca.v * cb.v) AS BIGINT) AS ip
              FROM ca JOIN cb ON ca.r = cb.r AND ca.col = cb.col
              GROUP BY 1),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_size FROM rows_)
    SELECT t.true_size, e.est_size,
           e.est_size >= t.true_size AS is_overestimate,
           round(CAST(e.est_size - t.true_size AS DOUBLE) / t.true_size, 6)
             AS rel_overestimate
    FROM truth t CROSS JOIN est e
    """


@register(
    "q152_join_size_sketch",
    _join_size_sql(),
    doc="join-size estimation from Count-Min sketches (AGMS inner "
    "product): |orders join lineitem| estimated as the min over 4 "
    "md5-derived sketch rows of the 256-cell inner product — the "
    "optimizer-statistics trick that prices a join from two tiny "
    "sketches instead of executing it. Each side collapses map-side to "
    "1024 cells; the inner product is a broadcast join of two "
    "sketch-sized tables; the hard est>=true overestimate property "
    "ships as a hash-checked boolean next to the exact join size",
)
def q152_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    o = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    ln = load_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count("*").cast("long").alias("c"))
    truth = o.join(ln.withColumnRenamed("c", "cb"), "k").agg(
        F.sum(F.col("c") * F.col("cb")).cast("long").alias("true_size")
    )
    rr = o.sparkSession.range(_JSZ_DEPTH).select(F.col("id").cast("int").alias("r"))

    def sketch(side: DataFrame) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(rr))
            .select(
                "r",
                hash_bucket(
                    F.concat(
                        F.col("r").cast("string"), F.lit("|"), F.col("k").cast("string")
                    ),
                    _JSZ_WIDTH,
                ).alias("col"),
                "c",
            )
            .groupBy("r", "col")
            .agg(F.sum("c").cast("long").alias("v"))
        )

    ca = sketch(o)
    cb = sketch(ln).withColumnRenamed("v", "vb")
    est = (
        ca.join(F.broadcast(cb), ["r", "col"])
        .groupBy("r")
        .agg(F.sum(F.col("v") * F.col("vb")).cast("long").alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_size"))
    )
    return truth.crossJoin(F.broadcast(est)).selectExpr(
        "true_size",
        "est_size",
        "est_size >= true_size AS is_overestimate",
        "round(CAST(est_size - true_size AS DOUBLE) / true_size, 6)"
        " AS rel_overestimate",
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
# q154 — frequent itemset pairs (the Apriori/FP-growth first pass):
# parts co-occurring in the same order with support and lift — the
# market-basket primitive. The pair join is keyed on the order
# (bounded basket size caps the fanout), never part x part.
# ---------------------------------------------------------------------------
_MB_MIN_SUPPORT = 3
_MB_TOPK = 20


@register(
    "q154_itemset_pairs",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    norders AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    freq AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY 1),
    pairs AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b ON b.ok = a.ok AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= {_MB_MIN_SUPPORT}
    ),
    scored AS (
      SELECT pk_a, pk_b, support,
             round(CAST(support AS DOUBLE) * n.n / (fa.c * fb.c), 6) AS lift
      FROM pairs
      JOIN freq fa ON fa.pk = pk_a
      JOIN freq fb ON fb.pk = pk_b
      CROSS JOIN norders n
    )
    SELECT pk_a, pk_b, support, lift
    FROM scored
    ORDER BY support DESC, pk_a, pk_b LIMIT {_MB_TOPK}
    """,
    doc="frequent itemset pairs (market-basket / Apriori first pass): "
    "parts co-occurring in an order, support-thresholded, with the lift "
    "ratio against independent part frequencies — co-purchase mining. "
    "The pair join keys on the ORDER (bounded basket size caps fanout "
    "at |basket|^2, never part x part); per-part frequencies broadcast "
    "back; top-k via TakeOrderedAndProject with a total-order tiebreak",
)
def q154_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = pin(
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    norders = items.agg(F.countDistinct("ok").cast("long").alias("n"))
    freq = items.groupBy("pk").agg(F.count("*").cast("long").alias("c"))
    a = items.select("ok", F.col("pk").alias("pk_a"))
    b = items.select("ok", F.col("pk").alias("pk_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= _MB_MIN_SUPPORT)
    )
    fa = freq.select(F.col("pk").alias("pk_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("pk").alias("pk_b"), F.col("c").alias("cb"))
    scored = (
        pairs.join(fa, "pk_a")
        .join(fb, "pk_b")
        .crossJoin(F.broadcast(norders))
        .select(
            "pk_a", "pk_b", "support",
            F.round(
                F.col("support").cast("double") * F.col("n")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("support").desc(), "pk_a", "pk_b"
    ).limit(_MB_TOPK)


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
    daily = pin(
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
# q157 — A/B experiment readout: users hash-split into two arms, per-arm
# purchase conversion, and the two-proportion z statistic with pooled
# standard error — the experimentation primitive. The normal CDF (erf)
# is NOT cross-engine portable, so the readout ships the z value and
# the |z| > 1.96 verdict, not a p-value.
# ---------------------------------------------------------------------------
def _ab_test_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    arm = f"CASE WHEN {hash_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END"
    return f"""
    WITH u AS (
      SELECT user_id, {arm} AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM u GROUP BY 1
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
             MAX(CASE WHEN arm = 'A' THEN conv END) AS ca,
             MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
             MAX(CASE WHEN arm = 'B' THEN conv END) AS cb
      FROM arms
    )
    SELECT na, ca, nb, cb,
           round(CAST(ca AS DOUBLE) / na, 6) AS rate_a,
           round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b,
           round(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 / na + 1e0 / nb)) END, 6) AS z,
           COALESCE(ABS(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb)) * (1e0 / na + 1e0 / nb)) END) > 1.96e0, FALSE) AS significant
    FROM wide
    """


@register(
    "q157_ab_test",
    _ab_test_sql(),
    doc="A/B experiment readout: users md5-hash-split into two arms, "
    "per-arm purchase conversion, two-proportion z with pooled standard "
    "error, and the |z| > 1.96 verdict. erf (the normal CDF) is not "
    "correctly-rounded cross-engine, so the readout ships z itself — "
    "which is all a dashboard thresholds anyway. One user-key aggregate "
    "+ a 2-row pivot",
)
def q157_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
        )
        .withColumn(
            "arm",
            F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise("B"),
        )
    )
    arms = u.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    # degenerate arms (0% or 100% pooled conversion) have zero pooled
    # variance: z is undefined (and Spark ANSI raises on the division)
    z = (
        "CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL ELSE "
        "(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)"
        " / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))"
        " * (1e0 - CAST(ca + cb AS DOUBLE) / (na + nb))"
        " * (1e0 / na + 1e0 / nb)) END"
    )
    return wide.selectExpr(
        "na", "ca", "nb", "cb",
        "round(CAST(ca AS DOUBLE) / na, 6) AS rate_a",
        "round(CAST(cb AS DOUBLE) / nb, 6) AS rate_b",
        f"round({z}, 6) AS z".format(z=z),
        f"COALESCE(ABS({z}) > 1.96e0, FALSE) AS significant".format(z=z),
    )


# ---------------------------------------------------------------------------
# q158 — day-of-week seasonality profile: per event type, each
# weekday's traffic as an index against the type's own mean — the
# calendar-shape fingerprint behind staffing, alert baselines (q89/
# q155 thresholds should season), and synthetic-data realism checks.
# ---------------------------------------------------------------------------
@register(
    "q158_dow_seasonality",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    dow AS (
      SELECT event_type, dayofweek(d) + 1 AS dw,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type,
             CAST(SUM(n_events) AS BIGINT) AS tot_events,
             CAST(SUM(n_days) AS BIGINT) AS tot_days
      FROM dow GROUP BY 1
    )
    SELECT dow.event_type, CAST(dw AS INT) AS dow, n_events, n_days,
           round((CAST(n_events AS DOUBLE) / n_days)
                 / (CAST(tot_events AS DOUBLE) / tot_days), 6)
             AS seasonality_index
    FROM dow JOIN base ON base.event_type = dow.event_type
    """,
    doc="day-of-week seasonality: per event type, each weekday's mean "
    "daily traffic indexed against the type's own overall mean — the "
    "calendar fingerprint that alert baselines (q89/q155) should season "
    "by. DuckDB dayofweek+1 == Spark dayofweek (the documented dialect "
    "identity); two bounded-key aggregates over the tiny daily table",
)
def q158_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    daily = pin(
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count("*").cast("long").alias("n"))
    )
    dow = daily.groupBy(
        "event_type", F.dayofweek("d").cast("int").alias("dow")
    ).agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_days"),
    )
    base = dow.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("tot_events"),
        F.sum("n_days").cast("long").alias("tot_days"),
    )
    return dow.join(F.broadcast(base), "event_type").selectExpr(
        "event_type", "dow", "n_events", "n_days",
        "round((CAST(n_events AS DOUBLE) / n_days)"
        " / (CAST(tot_events AS DOUBLE) / tot_days), 6) AS seasonality_index",
    )


# ---------------------------------------------------------------------------
# q159 — triangle count + global clustering coefficient of the
# MinHash-LSH similarity graph: triangles measure how CLIQUE-LIKE the
# near-dup structure is (template families form dense triangles;
# chains/stars do not) — the third classic graph primitive next to
# connected components (q135) and PageRank (q126). All integer math.
# ---------------------------------------------------------------------------
def _triangles_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    e AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
      ) GROUP BY 1
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
        ON e3.a = e1.a AND e3.b = e2.b
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
             CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges
      FROM e
    )
    SELECT b.n_nodes, b.n_edges, b.n_wedges, t.n_triangles,
           round(CASE WHEN b.n_wedges > 0
                      THEN 3e0 * t.n_triangles / b.n_wedges
                      ELSE NULL END, 6) AS clustering_coefficient
    FROM base b CROSS JOIN tri t
    """


@register(
    "q159_triangle_count",
    _triangles_sql(),
    doc="triangle count + global clustering coefficient of the "
    "MinHash-LSH similarity graph (how clique-like the near-dup "
    "structure is — template families triangle densely, chains do "
    "not). Triangles via the canonical a<b<c edge 3-way join: on a "
    "df-capped LSH graph node degrees are bounded, so the join is "
    "O(edges x bounded degree), never cubic; wedges are an exact "
    "integer aggregate of the degree table. The third graph primitive "
    "next to components (q135) and PageRank (q126)",
)
def q159_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    e = pin(
        dd.lsh_candidate_pairs(d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"]).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    base = e.agg(F.count("*").cast("long").alias("n_edges")).crossJoin(
        F.broadcast(
            deg.agg(
                F.count("*").cast("long").alias("n_nodes"),
                F.sum(F.col("d") * (F.col("d") - 1) / 2)
                .cast("long")
                .alias("n_wedges"),
            )
        )
    )
    return base.crossJoin(F.broadcast(tri)).selectExpr(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        "round(CASE WHEN n_wedges > 0 THEN 3e0 * n_triangles / n_wedges"
        " ELSE NULL END, 6) AS clustering_coefficient",
    )


# ---------------------------------------------------------------------------
# q160 — HLL register MERGE for distinct-key overlap: per-side register
# tables (q136 machinery) combine by elementwise MAX into the UNION
# sketch — the mergeability that makes HLL the engine-standard distinct
# counter (partial aggregates union exactly like this) — and the
# intersection estimate follows by inclusion-exclusion. Pairs with
# q152: CMS prices the JOIN SIZE, HLL prices the DISTINCT overlap.
# ---------------------------------------------------------------------------
def _hll_regs_sql(src: str, key: str) -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    return (
        f"SELECT {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho "
        f"FROM (SELECT DISTINCT CAST({key} AS VARCHAR) AS t FROM {src}) "
        f"GROUP BY 1"
    )


def _hll_est_from_regs(regs: str) -> str:
    sum_fx = (
        f"(SELECT CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)"
        f" + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} FROM {regs})"
    )
    zeros = f"(SELECT CAST({_HLL_M} - COUNT(*) AS INT) FROM {regs})"
    return _hll_estimate_expr(sum_fx, zeros)


@register(
    "q160_hll_join_overlap",
    f"""
    WITH ra AS ({_hll_regs_sql('orders', 'o_custkey')}),
    rb AS ({_hll_regs_sql('customer', 'c_custkey')}),
    ru AS (
      SELECT reg, CAST(MAX(rho) AS INT) AS rho
      FROM (SELECT reg, rho FROM ra UNION ALL SELECT reg, rho FROM rb)
      GROUP BY 1
    ),
    truth AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_a,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer) AS nd_b,
             (SELECT CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
               AS nd_overlap
      FROM orders
    )
    SELECT t.nd_a, t.nd_b, t.nd_overlap,
           {_hll_est_from_regs('ra')} AS est_a,
           {_hll_est_from_regs('rb')} AS est_b,
           {_hll_est_from_regs('ru')} AS est_union,
           round({_hll_est_from_regs('ra')} + {_hll_est_from_regs('rb')}
                 - {_hll_est_from_regs('ru')}, 4) AS est_overlap
    FROM truth t
    """,
    doc="HLL register MERGE for distinct-key join overlap: per-side "
    "register tables (the q136 sketch) combine by elementwise MAX into "
    "the exact union sketch — the mergeability property that makes HLL "
    "the engine-standard distinct counter — and |A intersect B| follows "
    "by inclusion-exclusion, all hash-verified next to the exact "
    "counts. Pairs with q152: CMS prices the join SIZE, HLL prices the "
    "DISTINCT overlap; both from sketch-sized state",
)
def q160_hll_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    def regs(df, key):
        t = df.select(F.col(key).cast("string").alias("t")).distinct()
        h = F.md5(F.col("t"))
        v = F.lit(0).cast("long")
        for i in range(8, 20):
            v = v * 16 + (
                F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
            )
        rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
            F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
        )
        return (
            t.select(hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho"))
            .groupBy("reg")
            .agg(F.max("__rho").cast("int").alias("rho"))
        )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ra = pin(regs(o, "o_custkey"))
    rb = pin(regs(c, "c_custkey"))
    ru = (
        ra.unionAll(rb).groupBy("reg").agg(F.max("rho").cast("int").alias("rho"))
    )

    def est(regs_df):
        s = regs_df.agg(
            (
                F.sum(F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long"))
                .cast("long")
                + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
            ).alias("sum_fx"),
            (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        )
        return s.selectExpr(
            f"{_hll_estimate_expr('sum_fx', 'zeros')} AS e"
        )

    ea = est(ra).withColumnRenamed("e", "est_a")
    eb = est(rb).withColumnRenamed("e", "est_b")
    eu = est(ru).withColumnRenamed("e", "est_union")
    truth = (
        o.agg(F.countDistinct("o_custkey").cast("long").alias("nd_a"))
        .crossJoin(
            F.broadcast(
                c.agg(F.countDistinct("c_custkey").cast("long").alias("nd_b"))
            )
        )
        .crossJoin(
            F.broadcast(
                o.join(c, o.o_custkey == c.c_custkey)
                .agg(F.countDistinct("o_custkey").cast("long").alias("nd_overlap"))
            )
        )
    )
    return (
        truth.crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .selectExpr(
            "nd_a", "nd_b", "nd_overlap", "est_a", "est_b", "est_union",
            "round(est_a + est_b - est_union, 4) AS est_overlap",
        )
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
    toks = pin(d.select("doc_id", "source", nt.alias("nt")))
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
    alloc = pin(
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
    from frontmatter_mcp_spark.workload.datapipe import _MIN_TOKENS, _PII_PATTERNS

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
    from frontmatter_mcp_spark.workload.datapipe import _MIN_TOKENS, _PII_PATTERNS

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
# q163 — unigram-LM tokenizer induction (SentencePiece-style hard-EM):
# the second tokenizer-training algorithm next to q113's BPE merge loop
# ---------------------------------------------------------------------------
_UNI_MAXW = 10  # words longer than this are excluded from the study
_UNI_MAXP = 3  # max piece length
_UNI_VOCAB = 200  # multi-char candidate pieces kept
_UNI_TOP = 50  # re-estimated pieces reported


def _unigram_chain_ctes(
    maxw: int = _UNI_MAXW,
    maxp: int = _UNI_MAXP,
    vocab: int = _UNI_VOCAB,
) -> list[str]:
    """The shared unigram-tokenizer CTE chain (replay of
    tokenize.unigram_segment_vocab): corpus tokens, word counts,
    candidate-piece selection, the per-position Viterbi DP unrolled into
    one CTE per character position (argmin via ROW_NUMBER over the
    integer objective), and the back-pointer walk likewise — ending at
    bt{maxw} = (w, wc, ps). The train side (q163) appends the M-step
    count; the apply side (q169) joins the segmentation lengths back to
    the corpus token stream."""
    ks = ", ".join(str(k) for k in range(1, maxp + 1))
    ctes = [
        """toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    x -> x <> '')) AS t
      FROM documents
    )""",
        f"""words AS MATERIALIZED (
      SELECT t AS w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM toks
      WHERE regexp_matches(t, '^[a-z]+$') AND length(t) <= {maxw}
      GROUP BY t
    )""",
        f"""occ AS MATERIALIZED (
      SELECT w, wc, t.t AS t, k.k AS k, substr(w, t.t - k.k + 1, k.k) AS piece
      FROM words,
           UNNEST(generate_series(1, length(w))) AS t(t),
           UNNEST([{ks}]) AS k(k)
      WHERE t.t >= k.k
    )""",
        """freqs AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS freq FROM occ GROUP BY piece
    )""",
        f"""pieces AS MATERIALIZED (
      SELECT piece, freq FROM freqs WHERE length(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM freqs WHERE length(piece) > 1
        ORDER BY freq DESC, piece LIMIT {vocab}
      )
    )""",
        """wpk AS MATERIALIZED (
      SELECT occ.w, occ.t, occ.k, p.freq AS f
      FROM occ JOIN pieces p ON p.piece = occ.piece
    )""",
        """dp0 AS MATERIALIZED (
      SELECT w, wc, CAST(0 AS INT) AS tokens, CAST(0 AS BIGINT) AS sumfreq,
             CAST(0 AS INT) AS back
      FROM words
    )""",
    ]
    for t in range(1, maxw + 1):
        branches = []
        for k in range(1, min(maxp, t) + 1):
            branches.append(
                f"""SELECT p.w, p.wc, CAST(p.tokens + 1 AS INT) AS tokens,
               CAST(p.sumfreq + c.f AS BIGINT) AS sumfreq, CAST(c.k AS INT) AS back
        FROM dp{t - k} p JOIN wpk c ON c.w = p.w AND c.t = {t} AND c.k = {k}"""
            )
        union = "\n        UNION ALL ".join(branches)
        ctes.append(
            f"""dp{t} AS MATERIALIZED (
      SELECT w, wc, tokens, sumfreq, back FROM (
        SELECT cand.*, ROW_NUMBER() OVER (
          PARTITION BY w ORDER BY tokens, sumfreq DESC, back DESC) AS rn
        FROM ({union}) cand
      ) WHERE rn = 1
    )"""
        )
    dpall = "\n      UNION ALL ".join(
        f"SELECT w, CAST({t} AS INT) AS pos, back FROM dp{t}"
        for t in range(1, maxw + 1)
    )
    ctes.append(f"""dpall AS MATERIALIZED (
      {dpall}
    )""")
    ctes.append(
        """bt0 AS MATERIALIZED (
      SELECT w, wc, CAST(length(w) AS INT) AS pos, CAST([] AS VARCHAR[]) AS ps
      FROM words
    )"""
    )
    for i in range(1, maxw + 1):
        ctes.append(
            f"""bt{i} AS MATERIALIZED (
      SELECT b.w, b.wc,
             CAST(CASE WHEN b.pos > 0 THEN b.pos - d.back ELSE b.pos END AS INT) AS pos,
             CASE WHEN b.pos > 0
                  THEN list_prepend(substr(b.w, b.pos - d.back + 1, d.back), b.ps)
                  ELSE b.ps END AS ps
      FROM bt{i - 1} b LEFT JOIN dpall d ON d.w = b.w AND d.pos = b.pos
    )"""
        )
    return ctes


def _unigram_sql(
    maxw: int = _UNI_MAXW,
    maxp: int = _UNI_MAXP,
    vocab: int = _UNI_VOCAB,
    top: int = _UNI_TOP,
) -> str:
    ctes = _unigram_chain_ctes(maxw, maxp, vocab)
    ctes.append(
        f"""est AS MATERIALIZED (
      SELECT piece, CAST(SUM(wc) AS BIGINT) AS est_count
      FROM (SELECT wc, unnest(ps) AS piece FROM bt{maxw})
      GROUP BY piece
    )"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT piece, CAST(length(piece) AS INT) AS piece_len, est_count,
           CAST(ROW_NUMBER() OVER (ORDER BY est_count DESC, piece) AS INT)
             AS vocab_rank
    FROM (SELECT * FROM est ORDER BY est_count DESC, piece LIMIT {top})
    """


@register(
    "q163_unigram_tokenizer",
    _unigram_sql(),
    doc="unigram-LM tokenizer induction (SentencePiece hard-EM, one E+M "
    "round) with a fully integer objective — fewest tokens, then max "
    "total piece frequency, then longest final piece — so the Viterbi "
    "DP argmin is exact and engine-portable (log-prob EM would hinge on "
    "libm ln's last ulp). Candidate pieces are the top frequency-ranked "
    "substrings plus all single chars; the DP is one Catalyst aggregate "
    "fold per WORD (vocabulary-sized, never corpus-sized), piece costs "
    "arrive via one broadcast join, and the M-step recount is a "
    "vocabulary-sized aggregate. Oracle unrolls the DP and the "
    "back-pointer walk into one CTE per character position",
)
def q163_unigram_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    words = (
        d.select(F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$") & (F.length("t") <= _UNI_MAXW))
        .groupBy(F.col("t").alias("w"))
        .agg(F.count("*").cast("long").alias("wc"))
    )
    return tk.unigram_induce(
        words,
        "w",
        "wc",
        max_piece=_UNI_MAXP,
        vocab_size=_UNI_VOCAB,
        top=_UNI_TOP,
        persist_fn=pin,
    )


# ---------------------------------------------------------------------------
# q164 — EXACT corpus-wide longest duplicated window length by binary
# search: the arbitrary-length completion of q137's power-of-2 ladder
# (ExactSubstr's length statistic, Lee et al., without a suffix array)
# ---------------------------------------------------------------------------
_EXD_MAX = 96  # search space [0, _EXD_MAX]
# probe = min(binary midpoint, 2*max(lo, 2)): doubling from below until
# the first miss, pure binary afterwards — one formula, no phase flag.
# Worst case 5 doubling probes (4..64) + 6 binary probes ([64,96] is 33
# wide), so 11 fixed steps always converge; early-converged steps
# re-probe lo over the tiny candidate set (no-ops, pennies)
_EXD_STEPS = 11


def _exact_dup_sql(maxn: int = _EXD_MAX, steps: int = _EXD_STEPS) -> str:
    """Replay of the driver-side binary search: one (probe, dup-count,
    state, candidate-set) CTE group per step, MATERIALIZED so the
    candidate-doc chain doesn't inline exponentially."""
    ctes = [
        """toks AS MATERIALIZED (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )""",
        f"st0 AS MATERIALIZED (SELECT CAST(0 AS INT) AS lo, CAST({maxn} AS INT) AS hi)",
        "cand0 AS MATERIALIZED (SELECT doc_id FROM documents)",
    ]
    traces = []
    for i in range(1, steps + 1):
        p = i - 1
        ctes += [
            f"""mid{i} AS MATERIALIZED (
      SELECT CAST(GREATEST(LEAST((lo + hi + 1) // 2, 2 * GREATEST(lo, 2)), 1)
                  AS INT) AS m
      FROM st{p}
    )""",
            f"""dup{i} AS MATERIALIZED (
      SELECT sp, CAST(COUNT(*) AS BIGINT) AS nd FROM (
        SELECT DISTINCT t.doc_id, md5(array_to_string(t.w[q.i : q.i + m.m - 1], ' ')) AS sp
        FROM toks t
        JOIN cand{p} c ON c.doc_id = t.doc_id
        CROSS JOIN mid{i} m,
        UNNEST(generate_series(1, len(t.w) - m.m + 1)) AS q(i)
        WHERE len(t.w) >= m.m
      ) GROUP BY sp HAVING COUNT(*) >= 2
    )""",
            f"""n{i} AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dup{i})""",
            f"""st{i} AS MATERIALIZED (
      SELECT CASE WHEN n.n > 0 THEN m.m ELSE s.lo END AS lo,
             CASE WHEN n.n > 0 THEN s.hi ELSE m.m - 1 END AS hi
      FROM st{p} s, mid{i} m, n{i} n
    )""",
            f"""cand{i} AS MATERIALIZED (
      SELECT DISTINCT t.doc_id
      FROM toks t JOIN cand{p} c ON c.doc_id = t.doc_id
      CROSS JOIN mid{i} m, n{i} n,
      UNNEST(generate_series(1, len(t.w) - m.m + 1)) AS q(i)
      WHERE n.n > 0 AND len(t.w) >= m.m
        AND md5(array_to_string(t.w[q.i : q.i + m.m - 1], ' '))
              IN (SELECT sp FROM dup{i})
      UNION ALL
      SELECT c.doc_id FROM cand{p} c CROSS JOIN n{i} n WHERE n.n = 0
    )""",
        ]
        traces.append(
            f"""SELECT CAST({i} AS INT) AS step, m.m AS probe_len, n.n AS n_dup_spans,
             CAST(CASE WHEN n.n > 0 THEN 1 ELSE 0 END AS INT) AS went_up,
             s.lo AS lo_after, s.hi AS hi_after
      FROM mid{i} m, n{i} n, st{i} s"""
        )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(traces)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY step
    """


@register(
    "q164_exact_dup_length",
    _exact_dup_sql(),
    doc="EXACT longest cross-document duplicated window length (token "
    "count) by a doubling-capped binary search over [0, 96]: probe "
    "length = min(binary midpoint, 2*max(lo,2)), so the search doubles "
    "from 4 while it keeps hitting and turns into pure binary search "
    "after the first miss — the full-corpus probes only ever use SHORT "
    "windows (a naive midpoint-first search md5'd 48-token windows over "
    "the whole corpus and measured 123s at sf0.1; this shape is ~25x "
    "cheaper), and by the time lengths grow the candidate-doc set has "
    "collapsed to the docs still holding a duplicate (lossless: a "
    "longer shared window implies the shorter one). Windows md5 before "
    "the shuffle; 11 fixed probes emit the full trace — lo_after of the "
    "last row is the exact answer; early convergence makes the spare "
    "probes tiny re-probes of lo. Driver holds two integers",
)
def q164_exact_dup_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = pin(
        d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+", -1).alias("w"))
    )
    cand = toks.select("doc_id")
    lo, hi = 0, _EXD_MAX
    trace = []
    for step in range(1, _EXD_STEPS + 1):
        mid = max(min((lo + hi + 1) // 2, 2 * max(lo, 2)), 1)
        spans = (
            toks.join(cand, "doc_id")
            .filter(F.size("w") >= mid)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(1), F.size("w") - (mid - 1))).alias("i"),
                "w",
            )
            .select(
                "doc_id",
                F.md5(F.array_join(F.slice("w", F.col("i"), mid), " ")).alias("sp"),
            )
            .distinct()
        )
        dup = pin(
            spans.groupBy("sp").agg(F.count("*").cast("long").alias("nd")).filter(
                F.col("nd") >= 2
            )
        )
        n = dup.count()
        if n > 0:
            # localCheckpoint, not pin: 11 steps each referencing the
            # previous candidate set through spans+dup nests the logical
            # plan O(2^steps) deep — at 7 steps analysis was slow, at 11
            # even building the plan STRING overflowed the heap. The
            # checkpoint makes each round's candidate set a leaf (the
            # q165/q135 lesson)
            cand = (
                spans.join(dup, "sp").select("doc_id").distinct()
                .localCheckpoint(eager=False)
            )
            lo = mid
        else:
            hi = mid - 1
        trace.append((step, mid, n, 1 if n > 0 else 0, lo, hi))
    return spark.createDataFrame(
        trace,
        "step int, probe_len int, n_dup_spans bigint, went_up int, "
        "lo_after int, hi_after int",
    )


# ---------------------------------------------------------------------------
# q165 — k-core peeling of the LSH similarity graph: the density
# primitive next to components (q135), PageRank (q126) and triangles
# (q159) — template families survive deep cores, chains/stars peel away
# ---------------------------------------------------------------------------
_KCORE_KS = [2, 3]
_KCORE_ROUNDS = 5  # converged at test scales; production loops to fixpoint


def _kcore_sql(ks=_KCORE_KS, rounds: int = _KCORE_ROUNDS) -> str:
    rows_per_band = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(
                f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(_BANDS)
    )
    ctes = [
        _SHINGLES_CTE.strip().rstrip(","),
        f"sigs AS MATERIALIZED (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id)",
        f"bb AS MATERIALIZED ({band_rows})",
        """e AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    )""",
    ]
    traces = []
    for k in ks:
        ctes.append(f"e_{k}_0 AS MATERIALIZED (SELECT a, b FROM e)")
        for r in range(1, rounds + 1):
            p = f"e_{k}_{r - 1}"
            ctes.append(
                f"""keep_{k}_{r} AS MATERIALIZED (
      SELECT n FROM (
        SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
          SELECT a AS n FROM {p} UNION ALL SELECT b AS n FROM {p}
        ) GROUP BY 1
      ) WHERE d >= {k}
    )"""
            )
            ctes.append(
                f"""e_{k}_{r} AS MATERIALIZED (
      SELECT p.a, p.b FROM {p} p
      JOIN keep_{k}_{r} ka ON ka.n = p.a
      JOIN keep_{k}_{r} kb ON kb.n = p.b
    )"""
            )
            traces.append(
                f"""SELECT CAST({k} AS INT) AS k, CAST({r} AS INT) AS round,
             CAST((SELECT COUNT(*) FROM keep_{k}_{r}) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM e_{k}_{r}) AS BIGINT) AS n_edges"""
            )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(traces)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY k, round
    """


@register(
    "q165_kcore_peeling",
    _kcore_sql(),
    doc="k-core peeling of the MinHash-LSH similarity graph for k=2,3: "
    "each round drops nodes of degree < k and keeps only edges between "
    "survivors, emitting the (k, round, nodes, edges) peeling trace — "
    "the subgraph-density primitive that separates clique-like template "
    "families (survive deep cores) from chains and stars (peel away). "
    "Five fixed rounds (converged at test scales — the trace itself "
    "proves it by repeating counts; production loops to fixpoint). "
    "Edge list is candidate-pair-sized, never corpus-sized; each round "
    "is one map-side-combined degree aggregate + two semi-joins on the "
    "shrinking edge set, pinned per round so the lazy chain does not "
    "nest exponentially (the q56 lesson)",
)
def q165_kcore_peeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    e0 = pin(
        dd.lsh_candidate_pairs(d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    traces = []
    for k in _KCORE_KS:
        e = e0
        for r in range(1, _KCORE_ROUNDS + 1):
            deg = (
                e.select(F.col("a").alias("n"))
                .unionAll(e.select(F.col("b").alias("n")))
                .groupBy("n")
                .agg(F.count("*").cast("long").alias("d"))
            )
            # localCheckpoint, not pin: with 2 ks x 5 rounds each
            # referencing the previous round 4x (degree union, the join,
            # the trace row), a persist-only chain still nests the LSH
            # subtree O(2^rounds) times in the LOGICAL plan and analysis
            # alone takes minutes — the q56 lesson's second half:
            # persist bounds execution, checkpointing bounds the plan
            # (on a cluster this is the classic GraphX/MLlib periodic-
            # checkpoint pattern; the per-round tables are edge-sized)
            keep = deg.filter(F.col("d") >= k).select("n").localCheckpoint(eager=False)
            e = (
                e.join(keep.withColumnRenamed("n", "a"), "a")
                .join(keep.withColumnRenamed("n", "b"), "b")
                .select("a", "b")
                .localCheckpoint(eager=False)
            )
            traces.append(
                keep.agg(F.count("*").cast("long").alias("n_nodes"))
                .crossJoin(e.agg(F.count("*").cast("long").alias("n_edges")))
                .select(
                    F.lit(k).cast("int").alias("k"),
                    F.lit(r).cast("int").alias("round"),
                    "n_nodes",
                    "n_edges",
                )
            )
    out = traces[0]
    for t in traces[1:]:
        out = out.unionAll(t)
    return out.orderBy("k", "round")


# ---------------------------------------------------------------------------
# q166 — KMV / bottom-k (theta) sketch set operations over per-language
# vocabularies: the third mergeable-sketch family next to HLL (q136/
# q160 — distinct + inclusion-exclusion overlap) and CMS (q132/q152 —
# frequencies + join size). Theta sketches estimate the INTERSECTION
# directly (count common hashes under the union threshold), which
# inclusion-exclusion cannot do without compounding two errors.
# ---------------------------------------------------------------------------
_KMV_K = 64
_KMV_REF_LANG = "en"


def _kmv_fold_spark(h):
    """First 13 hex digits of an md5 as a 52-bit long (exact in a
    double, so hash -> (0,1) division is bit-identical cross-engine)."""
    from frontmatter_mcp_spark.operators.sampling import _HEX

    val = F.lit(0).cast("long")
    for i in range(1, 14):
        val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return val


def _kmv_fold_sql(h: str) -> str:
    from frontmatter_mcp_spark.operators.sampling import _HEX

    expr = "CAST(0 AS BIGINT)"
    for i in range(1, 14):
        expr = f"({expr}) * 16 + (strpos('{_HEX}', substr({h}, {i}, 1)) - 1)"
    return f"({expr})"


def _kmv_sql(k: int = _KMV_K, ref: str = _KMV_REF_LANG) -> str:
    two52 = float(2**52)
    return f"""
    WITH wh AS MATERIALIZED (
      SELECT DISTINCT lang, md5(t) AS h FROM (
        SELECT lang,
               unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                      x -> x <> '')) AS t
        FROM documents
      ) WHERE regexp_matches(t, '^[a-z]+$')
    ),
    ex AS MATERIALIZED (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM wh GROUP BY lang
    ),
    sk AS MATERIALIZED (
      SELECT lang, h FROM (
        SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
        FROM wh
      ) WHERE rn <= {k}
    ),
    side AS MATERIALIZED (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS scnt, MAX(h) AS smax
      FROM sk GROUP BY lang
    ),
    pairu AS MATERIALIZED (
      SELECT pl, h FROM (
        SELECT lang AS pl, h FROM sk WHERE lang <> '{ref}'
        UNION
        SELECT o.lang AS pl, s.h
        FROM sk s CROSS JOIN (SELECT lang FROM ex WHERE lang <> '{ref}') o
        WHERE s.lang = '{ref}'
      )
    ),
    ustats AS MATERIALIZED (
      SELECT pl, CAST(COUNT(*) AS BIGINT) AS ucnt, MAX(h) AS theta_h FROM (
        SELECT pl, h, ROW_NUMBER() OVER (PARTITION BY pl ORDER BY h) AS rn
        FROM pairu
      ) WHERE rn <= {k} GROUP BY pl
    ),
    common AS MATERIALIZED (
      SELECT b.lang AS pl, b.h
      FROM (SELECT h FROM sk WHERE lang = '{ref}') a
      JOIN (SELECT lang, h FROM sk WHERE lang <> '{ref}') b ON b.h = a.h
    ),
    cstats AS MATERIALIZED (
      SELECT u.pl,
             CAST(COALESCE(SUM(CASE WHEN u.ucnt < {k} OR c.h < u.theta_h
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS ccnt
      FROM ustats u LEFT JOIN common c ON c.pl = u.pl
      GROUP BY u.pl
    ),
    exinter AS MATERIALIZED (
      SELECT b.lang AS pl, CAST(COUNT(*) AS BIGINT) AS xi
      FROM (SELECT h FROM wh WHERE lang = '{ref}') a
      JOIN (SELECT lang, h FROM wh WHERE lang <> '{ref}') b ON b.h = a.h
      GROUP BY b.lang
    )
    SELECT u.pl AS lang_b,
           ea.n AS n_a, eb.n AS n_b, COALESCE(xi.xi, 0) AS inter_exact,
           round(CASE WHEN sa.scnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('sa.smax')} / {two52})
                 ELSE CAST(sa.scnt AS DOUBLE) END, 4) AS est_a,
           round(CASE WHEN sb.scnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('sb.smax')} / {two52})
                 ELSE CAST(sb.scnt AS DOUBLE) END, 4) AS est_b,
           round(CASE WHEN u.ucnt = {k}
                 THEN ({k} - 1) / ({_kmv_fold_sql('u.theta_h')} / {two52})
                 ELSE CAST(u.ucnt AS DOUBLE) END, 4) AS union_est,
           round(CASE WHEN u.ucnt = {k}
                 THEN cs.ccnt / ({_kmv_fold_sql('u.theta_h')} / {two52})
                 ELSE CAST(cs.ccnt AS DOUBLE) END, 4) AS inter_est,
           round(CAST(COALESCE(xi.xi, 0) AS DOUBLE)
                 / (ea.n + eb.n - COALESCE(xi.xi, 0)), 6) AS jaccard_exact
    FROM ustats u
    JOIN cstats cs ON cs.pl = u.pl
    JOIN side sa ON sa.lang = '{ref}'
    JOIN side sb ON sb.lang = u.pl
    JOIN ex ea ON ea.lang = '{ref}'
    JOIN ex eb ON eb.lang = u.pl
    LEFT JOIN exinter xi ON xi.pl = u.pl
    ORDER BY lang_b
    """


@register(
    "q166_kmv_setops",
    _kmv_sql(),
    doc="KMV/bottom-k (theta) sketch set operations: per-language "
    "vocabulary sketches are the k lexicographically-smallest md5s "
    "(hex order IS 128-bit numeric order, so selection never leaves "
    "strings); union sketch = bottom-k of the merged sketches, distinct "
    "estimate = (k-1)/theta with theta folded to 52 bits (exact in a "
    "double, bit-identical division cross-engine), and the DIRECT "
    "intersection estimate = common sketch hashes under theta / theta — "
    "the operation HLL inclusion-exclusion (q160) can only approximate "
    "by compounding two errors. Exact counts ride along as calibration "
    "columns (the q82 pattern). Sketch build is one window top-k per "
    "side over the distinct-token table; everything after operates on "
    "k-row sketches — at 100 TB the sketches are partial-aggregable "
    "and the exact calibration columns are the part you would drop",
)
def q166_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k, ref = _KMV_K, _KMV_REF_LANG
    two52 = float(2**52)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wh = pin(
        d.select("lang", F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$"))
        .select("lang", F.md5("t").alias("h"))
        .distinct()
    )
    ex = wh.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    win = Window.partitionBy("lang").orderBy("h")
    sk = pin(
        wh.withColumn("rn", F.row_number().over(win)).filter(F.col("rn") <= k)
        .select("lang", "h")
    )
    side = sk.groupBy("lang").agg(
        F.count("*").cast("long").alias("scnt"), F.max("h").alias("smax")
    )
    others = ex.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"))
    pairu = (
        sk.filter(F.col("lang") != ref)
        .select(F.col("lang").alias("pl"), "h")
        .union(
            sk.filter(F.col("lang") == ref)
            .crossJoin(F.broadcast(others))
            .select("pl", "h")
        )
        .distinct()
    )
    uwin = Window.partitionBy("pl").orderBy("h")
    ustats = (
        pairu.withColumn("rn", F.row_number().over(uwin)).filter(F.col("rn") <= k)
        .groupBy("pl")
        .agg(F.count("*").cast("long").alias("ucnt"), F.max("h").alias("theta_h"))
    )
    common = (
        sk.filter(F.col("lang") == ref)
        .select("h")
        .join(sk.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"), "h"), "h")
    )
    cstats = (
        ustats.join(F.broadcast(common), "pl", "left")
        .groupBy("pl", "ucnt", "theta_h")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ucnt") < k) | (F.col("h") < F.col("theta_h")), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("ccnt")
        )
    )
    exinter = (
        wh.filter(F.col("lang") == ref)
        .select("h")
        .join(wh.filter(F.col("lang") != ref).select(F.col("lang").alias("pl"), "h"), "h")
        .groupBy("pl")
        .agg(F.count("*").cast("long").alias("xi"))
    )

    def est(scnt, smax):
        return F.round(
            F.when(
                scnt == k, (k - 1) / (_kmv_fold_spark(smax) / F.lit(two52))
            ).otherwise(scnt.cast("double")),
            4,
        )

    sa = F.broadcast(side.filter(F.col("lang") == ref).select(
        F.col("scnt").alias("scnt_a"), F.col("smax").alias("smax_a")
    ))
    sb = side.select(
        F.col("lang").alias("pl"),
        F.col("scnt").alias("scnt_b"),
        F.col("smax").alias("smax_b"),
    )
    ea = F.broadcast(ex.filter(F.col("lang") == ref).select(F.col("n").alias("n_a")))
    eb = ex.select(F.col("lang").alias("pl"), F.col("n").alias("n_b"))
    return (
        cstats.join(F.broadcast(sb), "pl")
        .join(F.broadcast(eb), "pl")
        .join(F.broadcast(exinter), "pl", "left")
        .crossJoin(sa)
        .crossJoin(ea)
        .select(
            F.col("pl").alias("lang_b"),
            "n_a",
            "n_b",
            F.coalesce("xi", F.lit(0)).cast("long").alias("inter_exact"),
            est(F.col("scnt_a"), F.col("smax_a")).alias("est_a"),
            est(F.col("scnt_b"), F.col("smax_b")).alias("est_b"),
            est(F.col("ucnt"), F.col("theta_h")).alias("union_est"),
            F.round(
                F.when(
                    F.col("ucnt") == k,
                    F.col("ccnt") / (_kmv_fold_spark(F.col("theta_h")) / F.lit(two52)),
                ).otherwise(F.col("ccnt").cast("double")),
                4,
            ).alias("inter_est"),
            F.round(
                F.coalesce("xi", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("xi", F.lit(0))),
                6,
            ).alias("jaccard_exact"),
        )
        .orderBy("lang_b")
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
# q168 — small-file compaction planner: the lakehouse maintenance op
# next to z-order layout (q142), SCD2 (q143) and incremental MV (q141)
# ---------------------------------------------------------------------------
_COMPACT_TARGET = 65536  # target bytes per compacted output file


@register(
    "q168_compaction_plan",
    f"""
    WITH sized AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_chars,
             CAST(prior // {_COMPACT_TARGET} AS INT) AS bin
      FROM sized
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / {_COMPACT_TARGET}, 4)
             AS fill_ratio
    FROM binned GROUP BY source, bin
    ORDER BY source, bin
    """,
    doc="small-file compaction planner: treats each document as an "
    "input file of n_chars bytes and assigns per-source compaction "
    "bins by the cumulative-sum next-fit rule (bin = floor(bytes "
    "before me / target)) — the same parallel bin rule as q80's "
    "sequence packing, so the plan needs one window cumsum per "
    "source, no sequential driver loop (first-fit-decreasing would "
    "serialize; next-fit overshoots a bin by at most one file, the "
    "standard trade for a fully parallel planner). Emits the "
    "compaction manifest: files, bytes, id range, fill ratio per bin",
)
def q168_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(win), F.lit(0)) / _COMPACT_TARGET
        )
        .cast("int")
        .alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
            F.round(
                F.sum("n_chars").cast("double") / _COMPACT_TARGET, 4
            ).alias("fill_ratio"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# q169 — unigram-tokenizer ENCODE: the corpus tokenized under the
# q163-induced vocabulary (the apply stage, pairing with q163 exactly
# as q116's BPE encode pairs with q113's merge loop) — emits the
# fertility metric that lets the two tokenizer families be compared
# ---------------------------------------------------------------------------
def _unigram_encode_sql(
    maxw: int = _UNI_MAXW, maxp: int = _UNI_MAXP, vocab: int = _UNI_VOCAB
) -> str:
    ctes = _unigram_chain_ctes(maxw, maxp, vocab)
    ctes += [
        f"""wt AS MATERIALIZED (
      SELECT doc_id, t FROM toks
      WHERE regexp_matches(t, '^[a-z]+$') AND length(t) <= {maxw}
    )""",
        f"""sl AS MATERIALIZED (
      SELECT w, CAST(len(ps) AS BIGINT) AS sl FROM bt{maxw}
    )""",
        """agg AS MATERIALIZED (
      SELECT wt.doc_id, CAST(COUNT(*) AS INT) AS n_words,
             CAST(SUM(sl.sl) AS BIGINT) AS n_pieces
      FROM wt JOIN sl ON sl.w = wt.t GROUP BY wt.doc_id
    )""",
    ]
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           COALESCE(agg.n_pieces, 0) AS n_pieces,
           CASE WHEN agg.n_words IS NULL THEN NULL
                ELSE CAST(agg.n_pieces AS DOUBLE) / agg.n_words END
             AS pieces_per_word
    FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
    """


@register(
    "q169_unigram_encode",
    _unigram_encode_sql(),
    doc="unigram-tokenizer APPLY stage: every in-domain corpus word "
    "(lowercase alpha, <= 10 chars) encoded under the q163-induced "
    "vocabulary — per-document word count, Viterbi piece count, and "
    "fertility (pieces per word), directly comparable to q116's BPE "
    "fertility. The Viterbi DP reruns over the VOCABULARY "
    "(bit-identical segmentations to q163), per-word piece counts "
    "broadcast back onto the corpus token stream, and the per-doc "
    "aggregate is map-side combined — the corpus is scanned, never "
    "shuffled at token granularity beyond the doc key",
)
def q169_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = (
        d.select("doc_id", F.explode(toks).alias("t"))
        .filter(F.col("t").rlike("^[a-z]+$") & (F.length("t") <= _UNI_MAXW))
    )
    words = wt.groupBy(F.col("t").alias("w")).agg(
        F.count("*").cast("long").alias("wc")
    )
    seg = tk.unigram_segment_vocab(
        words, "w", "wc", max_piece=_UNI_MAXP, vocab_size=_UNI_VOCAB, persist_fn=pin
    )
    sl = seg.select("w", F.size("ps").cast("long").alias("sl"))
    agg = (
        wt.join(F.broadcast(sl), wt["t"] == sl["w"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("sl").cast("long").alias("n_pieces"),
        )
    )
    return (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_pieces", F.lit(0).cast("long")).alias("n_pieces"),
            (F.col("n_pieces").cast("double") / F.col("n_words")).alias(
                "pieces_per_word"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q170 — hash-sample quantile summary: the engine-PORTABLE distributed
# quantile estimator next to q27's engine-specific approx_percentile
# sketch — a deterministic md5 Bernoulli sample IS a mergeable summary
# (union of per-partition samples = sample of the union), and because
# both engines draw the identical sample, the estimates hash-verify
# EXACTLY, with the error against ground truth reported alongside
# ---------------------------------------------------------------------------
_HSQ_RATE = 50  # buckets of 1000 -> 5% sample
_HSQ_PS = [0.25, 0.5, 0.75, 0.9375]  # binary fractions: interpolation exact


def _hsq_sql() -> str:
    b = _hash_bucket_duck("doc_id")
    est_cols = ", ".join(
        f"quantile_cont(n_chars, {p!r}) FILTER (WHERE {b} < {_HSQ_RATE}) AS est_p{i}"
        for i, p in enumerate(_HSQ_PS)
    )
    ex_cols = ", ".join(
        f"quantile_cont(n_chars, {p!r}) AS ex_p{i}" for i, p in enumerate(_HSQ_PS)
    )
    err_cols = ", ".join(
        f"round(abs(est_p{i} - ex_p{i}), 4) AS err_p{i}" for i in range(len(_HSQ_PS))
    )
    out_cols = ", ".join(
        f"round(est_p{i}, 4) AS est_p{i}, round(ex_p{i}, 4) AS exact_p{i}"
        for i in range(len(_HSQ_PS))
    )
    return f"""
    WITH stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) FILTER (WHERE {b} < {_HSQ_RATE}) AS BIGINT) AS n_sample,
             {est_cols},
             {ex_cols}
      FROM documents GROUP BY source
    )
    SELECT source, n_total, n_sample, {out_cols}, {err_cols}
    FROM stats ORDER BY source
    """


@register(
    "q170_hash_sample_quantiles",
    _hsq_sql(),
    doc="engine-portable distributed quantile summary: a deterministic "
    "5% md5-bucket Bernoulli sample per source (mergeable — the union "
    "of per-partition samples is the sample of the union, the property "
    "that makes it a summary and not just a sample) feeding exact "
    "interpolated quantiles at binary fractions, reported against the "
    "full-data truth with absolute errors. Complements q27: that "
    "checks Spark's own approx_percentile within published bounds "
    "(rows-only hash); this one hash-verifies EXACTLY because both "
    "engines draw the identical sample. One scan, one map-side-"
    "combined aggregate; at 100 TB the sample aggregate is the only "
    "memory-resident state and the exact columns are the part you drop",
)
def q170_hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    in_sample = hash_bucket(F.col("doc_id"), 1000) < _HSQ_RATE
    aggs = [
        F.count("*").cast("long").alias("n_total"),
        F.sum(in_sample.cast("long")).cast("long").alias("n_sample"),
    ]
    sampled = F.when(in_sample, F.col("n_chars"))
    for i, p in enumerate(_HSQ_PS):
        aggs.append(F.percentile(sampled, F.lit(p)).alias(f"est_raw{i}"))
        aggs.append(F.percentile("n_chars", F.lit(p)).alias(f"ex_raw{i}"))
    stats = d.groupBy("source").agg(*aggs)
    cols = ["source", "n_total", "n_sample"]
    for i in range(len(_HSQ_PS)):
        cols.append(F.round(F.col(f"est_raw{i}"), 4).alias(f"est_p{i}"))
        cols.append(F.round(F.col(f"ex_raw{i}"), 4).alias(f"exact_p{i}"))
    for i in range(len(_HSQ_PS)):
        cols.append(
            F.round(F.abs(F.col(f"est_raw{i}") - F.col(f"ex_raw{i}")), 4).alias(
                f"err_p{i}"
            )
        )
    return stats.select(*cols).orderBy("source")


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
    from pyspark.sql import Window

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    nll = tx.unigram_nll(d, "doc_id", "text").filter(F.col("nll_mean").isNotNull())
    staged = nll.withColumn(
        "stage", F.ntile(3).over(Window.orderBy("nll_mean", "doc_id"))
    )
    return staged.select(
        "doc_id",
        F.col("stage").cast("int").alias("stage"),
        F.round("nll_mean", 6).alias("difficulty"),
        F.row_number()
        .over(Window.orderBy("stage", F.md5(F.col("doc_id").cast("string")), "doc_id"))
        .cast("long")
        .alias("sched_order"),
    )


# ---------------------------------------------------------------------------
# q172 — EWMA daily smoothing + one-step forecast error: the
# exponential-smoothing primitive next to the windowed z-score (q89),
# MAD (q155) and day-of-week seasonality (q158). The fold is strictly
# sequential in day order, so both engines execute the IDENTICAL IEEE
# operation sequence — the only way a recursive filter can hash-match
# cross-engine (a closed-form pow() rewrite would hinge on libm)
# ---------------------------------------------------------------------------
@register(
    "q172_ewma_daily",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    folded AS (
      -- err_sum is packed BEFORE level on purpose: DuckDB's list_reduce
      -- evaluates struct_pack fields against an in-place accumulator, so
      -- a field reading a.level must come before the field writing it
      SELECT event_type, CAST(len(xs) AS INT) AS n_days,
             list_reduce(
               list_transform(xs, x -> struct_pack(
                 err_sum := 0e0, level := x, cnt := CAST(0 AS BIGINT), x := x)),
               (a, b) -> struct_pack(
                 err_sum := a.err_sum + abs(b.x - a.level),
                 level := a.level * 0.75e0 + b.x * 0.25e0,
                 cnt := a.cnt + 1,
                 x := b.x)) AS r
      FROM series
    )
    SELECT event_type, n_days,
           ROUND((r).level, 6) AS ewma_level,
           CASE WHEN (r).cnt > 0
                THEN ROUND((r).err_sum / (r).cnt, 6) ELSE NULL END AS mae_1step
    FROM folded ORDER BY event_type
    """,
    doc="EWMA (alpha=1/4, a dyadic constant — the multiply-add sequence "
    "is exact-identical cross-engine) over per-type daily counts, "
    "seeded by the first day, emitting the final smoothed level (= the "
    "flat next-day forecast) and the mean absolute one-step forecast "
    "error accumulated along the fold. One events scan, one day "
    "aggregate, then per-type sequential folds over day-count arrays — "
    "the time dimension is bounded (days, not rows), so the collected "
    "series stays tiny no matter the corpus size; a recursive filter "
    "cannot be parallelized past that without changing its arithmetic",
)
def q172_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("xs")
    )
    first = F.element_at("xs", 1)
    init = F.struct(
        first.alias("level"),
        F.lit(0.0).alias("err_sum"),
        F.lit(0).cast("long").alias("cnt"),
        first.alias("x"),
    )
    rest = F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0)))
    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(
            rest,
            init,
            lambda a, b: F.struct(
                (a["level"] * 0.75 + b * 0.25).alias("level"),
                (a["err_sum"] + F.abs(b - a["level"])).alias("err_sum"),
                (a["cnt"] + 1).alias("cnt"),
                b.alias("x"),
            ),
        ).alias("r"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("r")["level"], 6).alias("ewma_level"),
        F.when(
            F.col("r")["cnt"] > 0, F.round(F.col("r")["err_sum"] / F.col("r")["cnt"], 6)
        ).alias("mae_1step"),
    ).orderBy("event_type")


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
# q174 — active-interval sweep: "how many shipments are in flight on
# each day" is a point-in-interval RANGE JOIN (days x intervals) that
# naive engines answer with an O(n*m) theta join; the sweep turns it
# into +1/-1 boundary events and one cumulative sum — the q144 islands
# trick applied to global interval stabbing
# ---------------------------------------------------------------------------
@register(
    "q174_interval_sweep",
    """
    WITH bounds AS (
      SELECT l_shipdate AS day, 1 AS delta FROM lineitem
      UNION ALL
      SELECT l_shipdate + CAST(l_quantity AS INT) * INTERVAL '1 day'
               + INTERVAL '1 day', -1
      FROM lineitem
    ),
    daily AS (
      SELECT CAST(day AS DATE) AS day,
             CAST(SUM(delta) AS BIGINT) AS delta,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS starts
      FROM bounds GROUP BY 1
    ),
    swept AS (
      SELECT day, starts,
             CAST(SUM(delta) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS active
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, starts, active
    FROM swept ORDER BY day
    """,
    doc="global interval stabbing by sweep: every lineitem [shipdate, "
    "shipdate + quantity days] transit interval (the q144 windows) "
    "becomes a +1 at start and a -1 past its end, "
    "daily deltas aggregate map-side, and ONE running sum over the "
    "bounded day axis yields the active-shipment count for every day — "
    "O(n + days) against the O(n * days) point-in-interval range join a "
    "naive plan would produce (Spark has no range-join optimizer rule; "
    "this rewrite IS the optimization). The day axis is bounded, so the "
    "final single-partition window is over thousands of rows no matter "
    "the corpus size; everything corpus-sized happens in the partial "
    "aggregate",
)
def q174_interval_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.select(
        F.col("l_shipdate").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        li.select(
            F.date_add("l_shipdate", F.col("l_quantity").cast("int") + 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = bounds.groupBy("day").agg(
        F.sum("delta").cast("long").alias("delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("starts"),
    )
    win = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "starts",
        F.sum("delta").over(win).cast("long").alias("active"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q175 — novelty rate: the memorization-risk metric beside q60's
# decontamination DECISION — for every held-out document, what fraction
# of its 8-token windows never occurs in the training split
# ---------------------------------------------------------------------------
_NOV_N = 8


def _novelty_sql(n: int = _NOV_N) -> str:
    b = _hash_bucket_duck("doc_id")
    return f"""
    WITH toks AS (
      SELECT doc_id, {b} AS bucket, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    sp AS (
      SELECT doc_id, bucket,
             md5(array_to_string(w[i : i + {n - 1}], ' ')) AS fp
      FROM toks, UNNEST(generate_series(1, len(w) - {n - 1})) AS t(i)
      WHERE len(w) >= {n}
    ),
    train_fp AS (SELECT DISTINCT fp FROM sp WHERE bucket < 800),
    test_sp AS (SELECT doc_id, fp FROM sp WHERE bucket >= 900),
    scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN tr.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM test_sp t LEFT JOIN train_fp tr ON tr.fp = t.fp
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_windows, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_windows, 6) AS novelty_rate
    FROM scored ORDER BY doc_id
    """


@register(
    "q175_novelty_rate",
    _novelty_sql(),
    doc="memorization-risk novelty rate: every 8-token window of every "
    "held-out (hash-bucket >= 900) document checked against the "
    "distinct window set of the training split (bucket < 800) — "
    "novelty = the fraction a model could not have copied verbatim. "
    "q60 makes the binary keep/drop decision; this measures HOW novel "
    "each eval document is (near-zero rates flag eval sets that leak). "
    "Windows md5 to 32 bytes BEFORE the shuffle, the train set "
    "deduplicates before the join, and the test side is a ~10% slice — "
    "the anti-join shape (left join + NULL count) carries O(test "
    "windows + distinct train windows), never the corpus pair product",
)
def q175_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    n = _NOV_N
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), 1000).alias("bucket"),
        F.split(F.trim(F.col("text")), r"\s+", -1).alias("w"),
    )
    sp = (
        toks.filter(F.size("w") >= n)
        .select(
            "doc_id",
            "bucket",
            F.explode(F.sequence(F.lit(1), F.size("w") - (n - 1))).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "bucket",
            F.md5(F.array_join(F.slice("w", F.col("i"), n), " ")).alias("fp"),
        )
    )
    sp = pin(sp)
    train_fp = sp.filter(F.col("bucket") < 800).select("fp").distinct()
    test_sp = sp.filter(F.col("bucket") >= 900).select("doc_id", "fp")
    scored = (
        test_sp.join(
            train_fp.withColumn("seen", F.lit(1)), "fp", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return scored.select(
        "doc_id",
        "n_windows",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_windows"), 6).alias(
            "novelty_rate"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q176 — Holt linear-trend smoothing: q172's EWMA upgraded with a trend
# recursion (the forecast is level + trend, not flat). Two coupled
# recursions defeat the q172 struct-pack ordering trick (the trend
# update needs BOTH the new and the old level), so the oracle replays
# the fold with a recursive CTE instead — the q135 precedent
# ---------------------------------------------------------------------------
@register(
    "q176_holt_trend",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    holt AS (
      SELECT event_type, xs, 1 AS i, xs[1] AS level, 0e0 AS trend, 0e0 AS err
      FROM series
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * xs[i+1] + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * xs[i+1] + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend))
      FROM holt WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND(level + trend, 6) AS forecast_next,
           CASE WHEN len(xs) > 1
                THEN ROUND(err / (len(xs) - 1), 6) ELSE NULL END AS mae_1step
    FROM holt WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt double exponential smoothing (alpha=1/4, beta=1/8 — dyadic "
    "constants, exact-identical multiply-add sequences) over per-type "
    "daily counts: level AND trend recursions folded strictly in day "
    "order, one-step forecasts scored along the way, next-day forecast "
    "= level + trend (q172's flat forecast plus slope). Same scale "
    "shape as q172: corpus work is one day aggregate; the sequential "
    "fold runs over bounded day-count arrays. Oracle replays the fold "
    "via recursive CTE because the coupled recursions read both the "
    "old and new level in one step",
)
def q176_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "n"))),
            lambda s: s["n"].cast("double"),
        ).alias("xs")
    )
    first = F.element_at("xs", 1)
    init = F.struct(
        first.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
    )
    rest = F.slice("xs", 2, F.greatest(F.size("xs") - 1, F.lit(0)))

    def step(a, x):
        new_level = 0.25 * x + 0.75 * (a["level"] + a["trend"])
        return F.struct(
            new_level.alias("level"),
            (0.125 * (new_level - a["level"]) + 0.875 * a["trend"]).alias("trend"),
            (a["err"] + F.abs(x - (a["level"] + a["trend"]))).alias("err"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(rest, init, step).alias("r"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("r")["level"], 6).alias("level"),
        F.round(F.col("r")["trend"], 6).alias("trend"),
        F.round(F.col("r")["level"] + F.col("r")["trend"], 6).alias("forecast_next"),
        F.when(
            F.col("n_days") > 1,
            F.round(F.col("r")["err"] / (F.col("n_days") - 1), 6),
        ).alias("mae_1step"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q177 — IVF-PQ: the FAISS index architecture assembled from the parts
# this workload already certifies separately — coarse k-means cells
# (q48/q49) + product quantization of the RESIDUALS (q99) + nprobe ADC
# search restricted to the probed cells
# ---------------------------------------------------------------------------
_IVFPQ_NPROBE = 2
_IVFPQ_NQ = 5
_IVFPQ_TOPK = 10


def _ivfpq_sql() -> str:
    T = _KMEANS_ITERS
    ctes = [_kmeans_ctes()]
    ctes.append(
        f"""res AS MATERIALIZED (
      SELECT v.vec_id, a.cid AS cluster,
             [CAST(v.embedding[i] AS DOUBLE) - c.cent[i]
              FOR i IN generate_series(1, len(c.cent))] AS rv
      FROM embeddings v JOIN a{T} a USING (vec_id) JOIN c{T - 1} c ON c.cid = a.cid
    )"""
    )
    for s in range(_PQ_M):
        ctes.extend(_pq_subspace_ctes(s, src="res", col="rv"))
    enc_joins = " ".join(
        f"JOIN a{_PQ_ITERS}_s{s} e{s} USING (vec_id)" for s in range(1, _PQ_M)
    )
    ctes.append(
        "enc AS MATERIALIZED (SELECT e0.vec_id, r.cluster, "
        + ", ".join(f"e{s}.cid AS code{s}" for s in range(_PQ_M))
        + f" FROM a{_PQ_ITERS}_s0 e0 {enc_joins} JOIN res r USING (vec_id))"
    )
    cdist = (
        "list_sum([(CAST(q.embedding[i] AS DOUBLE) - c.cent[i]) * "
        "(CAST(q.embedding[i] AS DOUBLE) - c.cent[i]) "
        "FOR i IN generate_series(1, len(c.cent))])"
    )
    ctes.append(
        f"""probes AS MATERIALIZED (
      SELECT qid, cell FROM (
        SELECT q.vec_id AS qid, c.cid AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cdist} ASC, c.cid ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < {_IVFPQ_NQ}) q, c{T - 1} c
      ) WHERE rn <= {_IVFPQ_NPROBE}
    )"""
    )
    ctes.append(
        f"""qres AS MATERIALIZED (
      SELECT p.qid, p.cell,
             [CAST(q.embedding[i] AS DOUBLE) - c.cent[i]
              FOR i IN generate_series(1, len(c.cent))] AS qr
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.qid
      JOIN c{T - 1} c ON c.cid = p.cell
    )"""
    )
    dterms = []
    cb_joins = []
    for s in range(_PQ_M):
        lo = s * _PQ_SUB + 1
        ql = f"qr.qr[{lo} + i - 1]"
        cb = f"c{_PQ_ITERS - 1}_s{s}"
        cb_joins.append(f"JOIN {cb} cb{s} ON cb{s}.cid = enc.code{s}")
        dterms.append(
            f"list_sum([({ql} - cb{s}.cent[i]) * ({ql} - cb{s}.cent[i]) "
            f"FOR i IN generate_series(1, {_PQ_SUB})])"
        )
    approx = dterms[0]
    for d in dterms[1:]:
        approx = f"({approx} + {d})"
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block},
    pairs AS (
      SELECT qr.qid, enc.vec_id AS cand_id, qr.cell, {approx} AS approx_dist
      FROM qres qr JOIN enc ON enc.cluster = qr.cell {' '.join(cb_joins)}
    ),
    ranked AS (
      SELECT qid, cand_id, cell, approx_dist,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY approx_dist ASC, cand_id ASC) AS rank
      FROM pairs
    )
    SELECT qid, cand_id, CAST(cell AS INT) AS cell, approx_dist,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_IVFPQ_TOPK}
    """


@register(
    "q177_ivfpq_topk",
    _ivfpq_sql(),
    doc="IVF-PQ (the FAISS index architecture): coarse k-means cells "
    "(q48's quantizer) partition the corpus, product quantization "
    "(q99's machinery) encodes the RESIDUAL v - centroid[cell] as 4 "
    "int codes, and queries probe their nprobe=2 nearest cells with a "
    "per-cell residual ADC table — so the search scans M ints per "
    "candidate in ~nprobe/k of the corpus instead of D floats in all "
    "of it, which is the whole economics of billion-scale ANN. Encode "
    "and ADC are zero-shuffle codegen maps over plan-literal "
    "centroids; the cell restriction is a broadcast join on the "
    "cluster key (at scale: the cell is the storage partition key and "
    "this probe prunes partitions, the q81 pattern). Every training "
    "iteration (coarse and subspace) replays in the oracle bit-exactly",
)
def q177_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from frontmatter_mcp_spark.operators import quantize as pq
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_assign(
        e, k=_KMEANS_K, iters=_KMEANS_ITERS, return_centroids=True
    )
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in cents])
    v = F.col("embedding").cast("array<double>")
    res = pin(
        e.join(assigned, "vec_id").select(
            "vec_id",
            "cluster",
            F.zip_with(
                v, F.element_at(cents_lit, F.col("cluster") + 1), lambda a, b: a - b
            ).alias("rv"),
        )
    )
    books = pq.pq_train_codebooks(
        res, id_col="vec_id", vec_col="rv", m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS
    )
    encoded = pq.pq_encode(res, books, id_col="vec_id", vec_col="rv").join(
        res.select("vec_id", "cluster"), "vec_id"
    )
    q = e.filter(F.col("vec_id") < _IVFPQ_NQ).select(
        F.col("vec_id").alias("qid"), v.alias("qv")
    )
    cdist = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("qv"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )
    probes = q.select(
        "qid",
        "qv",
        F.explode(
            F.slice(
                F.array_sort(
                    F.zip_with(
                        cdist,
                        F.sequence(F.lit(0), F.lit(_KMEANS_K - 1)),
                        lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                    )
                ),
                1,
                _IVFPQ_NPROBE,
            )
        ).alias("p"),
    ).select(
        "qid",
        F.col("p")["cell"].alias("cell"),
        F.zip_with(
            F.col("qv"),
            F.element_at(cents_lit, F.col("p")["cell"] + 1),
            lambda a, b: a - b,
        ).alias("qr"),
    )
    m, sub = _PQ_M, _PQ_SUB
    dtab = F.array(
        *[
            F.transform(
                F.array(*[F.lit(c) for c in books[s]]),
                pq._subspace_sqdist(F.slice(F.col("qr"), s * sub + 1, sub)),
            )
            for s in range(m)
        ]
    )
    qp = probes.select("qid", "cell", dtab.alias("__dtab"))
    approx = F.aggregate(
        F.zip_with(
            F.col("__dtab"), F.col("codes"), lambda t, c: F.element_at(t, c + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = W.partitionBy("qid").orderBy(F.asc("approx_dist"), F.asc("cand_id"))
    return (
        F.broadcast(qp)
        .join(encoded, qp["cell"] == encoded["cluster"])
        .select(
            "qid",
            F.col("vec_id").alias("cand_id"),
            F.col("cell").cast("int").alias("cell"),
            approx.alias("approx_dist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _IVFPQ_TOPK)
    )


# ---------------------------------------------------------------------------
# q178 — IVF-PQ recall/cost sweep: the q101-style calibration for q177 —
# recall@10 AND candidates scanned per nprobe, the two axes every ANN
# deployment trades against each other
# ---------------------------------------------------------------------------
_IVFPQ_SWEEP = [1, 2, 4]


def _ivfpq_recall_sql() -> str:
    T = _KMEANS_ITERS
    nps = ", ".join(str(n) for n in _IVFPQ_SWEEP)
    ctes = [_kmeans_ctes()]
    ctes.append(
        f"""res AS MATERIALIZED (
      SELECT v.vec_id, a.cid AS cluster,
             [CAST(v.embedding[i] AS DOUBLE) - c.cent[i]
              FOR i IN generate_series(1, len(c.cent))] AS rv
      FROM embeddings v JOIN a{T} a USING (vec_id)
      JOIN c{T - 1} c ON c.cid = a.cid
    )"""
    )
    for s in range(_PQ_M):
        ctes.extend(_pq_subspace_ctes(s, src="res", col="rv"))
    enc_joins = " ".join(
        f"JOIN a{_PQ_ITERS}_s{s} e{s} USING (vec_id)" for s in range(1, _PQ_M)
    )
    ctes.append(
        "enc AS MATERIALIZED (SELECT e0.vec_id, r.cluster, "
        + ", ".join(f"e{s}.cid AS code{s}" for s in range(_PQ_M))
        + f" FROM a{_PQ_ITERS}_s0 e0 {enc_joins} JOIN res r USING (vec_id))"
    )
    maxp = max(_IVFPQ_SWEEP)
    cdist = (
        "list_sum([(CAST(q.embedding[i] AS DOUBLE) - c.cent[i]) * "
        "(CAST(q.embedding[i] AS DOUBLE) - c.cent[i]) "
        "FOR i IN generate_series(1, len(c.cent))])"
    )
    ctes.append(
        f"""probes AS MATERIALIZED (
      SELECT qid, cell, rn AS probe_rank FROM (
        SELECT q.vec_id AS qid, c.cid AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cdist} ASC, c.cid ASC) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < {_IVFPQ_NQ}) q, c{T - 1} c
      ) WHERE rn <= {maxp}
    )"""
    )
    ctes.append(
        f"""qres AS MATERIALIZED (
      SELECT p.qid, p.cell, p.probe_rank,
             [CAST(q.embedding[i] AS DOUBLE) - c.cent[i]
              FOR i IN generate_series(1, len(c.cent))] AS qr
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.qid
      JOIN c{T - 1} c ON c.cid = p.cell
    )"""
    )
    dterms = []
    cb_joins = []
    for s in range(_PQ_M):
        lo = s * _PQ_SUB + 1
        ql = f"qr.qr[{lo} + i - 1]"
        cb = f"c{_PQ_ITERS - 1}_s{s}"
        cb_joins.append(f"JOIN {cb} cb{s} ON cb{s}.cid = enc.code{s}")
        dterms.append(
            f"list_sum([({ql} - cb{s}.cent[i]) * ({ql} - cb{s}.cent[i]) "
            f"FOR i IN generate_series(1, {_PQ_SUB})])"
        )
    approx = dterms[0]
    for d in dterms[1:]:
        approx = f"({approx} + {d})"
    ctes.append(
        f"""pairs AS MATERIALIZED (
      SELECT qr.qid, enc.vec_id AS cand_id, qr.probe_rank, {approx} AS approx_dist
      FROM qres qr JOIN enc ON enc.cluster = qr.cell {' '.join(cb_joins)}
    )"""
    )
    exd = (
        "list_sum([(CAST(q.qvec[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE)) * "
        "(CAST(q.qvec[i] AS DOUBLE) - CAST(e.embedding[i] AS DOUBLE)) "
        "FOR i IN generate_series(1, len(q.qvec))])"
    )
    ctes.append(
        f"""ex AS MATERIALIZED (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {exd} ASC, e.vec_id ASC) AS rn
        FROM (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
              WHERE vec_id < {_IVFPQ_NQ}) q, embeddings e
      ) WHERE rn <= {_IVFPQ_TOPK}
    )"""
    )
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block},
    cfg AS (SELECT unnest([{nps}]) AS nprobe),
    ranked AS (
      SELECT cfg.nprobe, p.qid, p.cand_id,
             ROW_NUMBER() OVER (PARTITION BY cfg.nprobe, p.qid
                                ORDER BY p.approx_dist ASC, p.cand_id ASC) AS rank
      FROM cfg JOIN pairs p ON p.probe_rank <= cfg.nprobe
    ),
    scanned AS (
      SELECT cfg.nprobe, CAST(COUNT(*) AS BIGINT) AS cands
      FROM cfg JOIN pairs p ON p.probe_rank <= cfg.nprobe
      GROUP BY cfg.nprobe
    ),
    per_q AS (
      SELECT cfgq.nprobe, ex.qid,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COUNT(r.cand_id) AS BIGINT) AS n_overlap
      FROM (SELECT nprobe FROM cfg) cfgq
      CROSS JOIN ex
      LEFT JOIN (SELECT * FROM ranked WHERE rank <= {_IVFPQ_TOPK}) r
        ON r.nprobe = cfgq.nprobe AND r.qid = ex.qid AND r.cand_id = ex.vec_id
      GROUP BY cfgq.nprobe, ex.qid
    )
    SELECT s.nprobe, CAST(COUNT(*) AS INT) AS n_queries, s.cands,
           ROUND(CAST(SUM(p.n_overlap) AS DOUBLE) / SUM(p.n_exact), 6)
             AS mean_recall,
           ROUND(MIN(CAST(p.n_overlap AS DOUBLE) / p.n_exact), 6) AS min_recall
    FROM per_q p JOIN scanned s ON s.nprobe = p.nprobe
    GROUP BY s.nprobe, s.cands
    ORDER BY s.nprobe
    """


@register(
    "q178_ivfpq_recall",
    _ivfpq_recall_sql(),
    doc="IVF-PQ calibration sweep: recall@10 against the exact L2 "
    "top-10 AND candidates scanned, per nprobe in {1,2,4} — the "
    "recall/cost frontier that picks nprobe before trusting q177's "
    "index at scale (q101 calibrates the PQ alone; this adds the cell "
    "restriction's miss risk). The expensive subplans are shared "
    "across the sweep: one probe table at max nprobe, ONE ADC pass "
    "keeping the probe rank, configs then just filter probe_rank — "
    "the q91 shared-subplan discipline. Exact ground truth is the "
    "q36 broadcast brute force, the part you drop in production",
)
def q178_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from frontmatter_mcp_spark.operators import quantize as pq
    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_assign(
        e, k=_KMEANS_K, iters=_KMEANS_ITERS, return_centroids=True
    )
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in cents])
    v = F.col("embedding").cast("array<double>")
    res = pin(
        e.join(assigned, "vec_id").select(
            "vec_id",
            "cluster",
            F.zip_with(
                v, F.element_at(cents_lit, F.col("cluster") + 1), lambda a, b: a - b
            ).alias("rv"),
        )
    )
    books = pq.pq_train_codebooks(
        res, id_col="vec_id", vec_col="rv", m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS
    )
    encoded = pq.pq_encode(res, books, id_col="vec_id", vec_col="rv").join(
        res.select("vec_id", "cluster"), "vec_id"
    )
    q = e.filter(F.col("vec_id") < _IVFPQ_NQ).select(
        F.col("vec_id").alias("qid"), v.alias("qv")
    )
    maxp = max(_IVFPQ_SWEEP)
    cdist = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("qv"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda s, x: s + x,
        ),
    )
    probes = q.select(
        "qid",
        "qv",
        F.posexplode(
            F.slice(
                F.array_sort(
                    F.zip_with(
                        cdist,
                        F.sequence(F.lit(0), F.lit(_KMEANS_K - 1)),
                        lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                    )
                ),
                1,
                maxp,
            )
        ).alias("pidx", "p"),
    ).select(
        "qid",
        (F.col("pidx") + 1).alias("probe_rank"),
        F.col("p")["cell"].alias("cell"),
        F.zip_with(
            F.col("qv"),
            F.element_at(cents_lit, F.col("p")["cell"] + 1),
            lambda a, b: a - b,
        ).alias("qr"),
    )
    m, sub = _PQ_M, _PQ_SUB
    dtab = F.array(
        *[
            F.transform(
                F.array(*[F.lit(c) for c in books[s]]),
                pq._subspace_sqdist(F.slice(F.col("qr"), s * sub + 1, sub)),
            )
            for s in range(m)
        ]
    )
    qp = probes.select("qid", "probe_rank", dtab.alias("__dtab"))
    approx = F.aggregate(
        F.zip_with(
            F.col("__dtab"), F.col("codes"), lambda t, c: F.element_at(t, c + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cells = probes.select("qid", "probe_rank", "cell")
    pairs = pin(
        F.broadcast(qp.join(cells, ["qid", "probe_rank"]))
        .join(encoded, F.col("cell") == encoded["cluster"])
        .select(
            "qid",
            "probe_rank",
            F.col("vec_id").alias("cand_id"),
            approx.alias("approx_dist"),
        )
    )
    cfg = spark.range(0).sparkSession.createDataFrame(
        [(n,) for n in _IVFPQ_SWEEP], "nprobe int"
    )
    joined = F.broadcast(cfg).join(pairs, pairs["probe_rank"] <= cfg["nprobe"])
    rw = W.partitionBy("nprobe", "qid").orderBy(
        F.asc("approx_dist"), F.asc("cand_id")
    )
    ranked = joined.withColumn("rank", F.row_number().over(rw)).filter(
        F.col("rank") <= _IVFPQ_TOPK
    )
    scanned = joined.groupBy("nprobe").agg(
        F.count("*").cast("long").alias("cands")
    )
    qv2, cv = F.col("qv"), F.col("embedding").cast("array<double>")
    exd = F.aggregate(
        F.zip_with(qv2, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    ew = W.partitionBy("qid").orderBy(F.asc("d"), F.asc("vec_id"))
    ex = (
        F.broadcast(q)
        .crossJoin(e)
        .select("qid", "vec_id", exd.alias("d"))
        .withColumn("rn", F.row_number().over(ew))
        .filter(F.col("rn") <= _IVFPQ_TOPK)
        .select("qid", "vec_id")
    )
    per_q = (
        F.broadcast(cfg)
        .crossJoin(ex)
        .join(
            ranked.select(
                "nprobe", "qid", F.col("cand_id").alias("vec_id"), F.lit(1).alias("_hit")
            ),
            ["nprobe", "qid", "vec_id"],
            "left",
        )
        .groupBy("nprobe", "qid")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("_hit").cast("long").alias("n_overlap"),
        )
    )
    return (
        per_q.join(F.broadcast(scanned), "nprobe")
        .groupBy("nprobe", "cands")
        .agg(
            F.count("*").cast("int").alias("n_queries"),
            F.round(
                F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
            ).alias("mean_recall"),
            F.round(
                F.min(F.col("n_overlap").cast("double") / F.col("n_exact")), 6
            ).alias("min_recall"),
        )
        .select("nprobe", "n_queries", "cands", "mean_recall", "min_recall")
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# q179 — PSI drift between ingestion batches: the ML-ops distribution-
# drift metric next to q151's chi-square (composition independence) and
# q153's row-level diff — "did the new batch's length profile move?"
# ---------------------------------------------------------------------------
_PSI_BUCKETS = 16
_PSI_WIDTH = 256  # n_chars per bucket; last bucket is open-ended


def _psi_sql() -> str:
    b = _hash_bucket_duck("doc_id", 10)
    return f"""
    WITH base AS (
      SELECT LEAST(n_chars // {_PSI_WIDTH}, {_PSI_BUCKETS - 1}) AS bucket,
             CASE WHEN {b} <= 7 THEN 1 ELSE 0 END AS is_ref
      FROM documents
    ),
    counts AS (
      SELECT bucket,
             CAST(SUM(is_ref) AS BIGINT) AS n_ref,
             CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
      FROM base GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur
      FROM counts
    ),
    cells AS (
      SELECT g.bucket,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur,
             CAST(COALESCE(c.n_ref, 0) + 1 AS DOUBLE)
               / (t.t_ref + {_PSI_BUCKETS}) AS p_ref,
             CAST(COALESCE(c.n_cur, 0) + 1 AS DOUBLE)
               / (t.t_cur + {_PSI_BUCKETS}) AS p_cur
      FROM (SELECT unnest(generate_series(0, {_PSI_BUCKETS - 1})) AS bucket) g
      LEFT JOIN counts c USING (bucket)
      CROSS JOIN tot t
    ),
    terms AS (
      SELECT bucket, n_ref, n_cur, p_ref, p_cur,
             (p_ref - p_cur) * ln(p_ref / p_cur) AS psi_term
      FROM cells
    )
    SELECT CAST(bucket AS INT) AS bucket, n_ref, n_cur,
           ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND(psi_term, 6) AS psi_term,
           ROUND(CAST(SUM(CAST(psi_term AS DECIMAL(28,12))) OVER () AS DOUBLE), 6)
             AS psi_total
    FROM terms ORDER BY bucket
    """


@register(
    "q179_psi_drift",
    _psi_sql(),
    doc="population stability index between the reference ingestion "
    "batches (hash buckets 0-7) and the newest (8-9) over a 16-cell "
    "length histogram: per-cell Laplace-smoothed shares (so empty "
    "cells stay finite), psi_term = (p-q)*ln(p/q), and the corpus "
    "drift verdict as the decimal-exact total (> 0.2 is the classic "
    "retrain trigger). The whole metric is one corpus scan into a "
    "16-row map-side-combined histogram; everything after runs on 16 "
    "rows. The chi-square (q151) asks whether composition is "
    "independent; PSI quantifies HOW FAR a marginal moved",
)
def q179_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        F.least(
            F.floor(F.col("n_chars") / _PSI_WIDTH), F.lit(_PSI_BUCKETS - 1)
        ).cast("long").alias("bucket"),
        F.when(hash_bucket(F.col("doc_id"), 10) <= 7, 1).otherwise(0).alias("is_ref"),
    )
    counts = base.groupBy("bucket").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    grid = spark.createDataFrame(
        [(i,) for i in range(_PSI_BUCKETS)], "bucket long"
    )
    cells = (
        grid.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
            (
                (F.coalesce("n_ref", F.lit(0)) + 1).cast("double")
                / (F.col("t_ref") + _PSI_BUCKETS)
            ).alias("p_ref"),
            (
                (F.coalesce("n_cur", F.lit(0)) + 1).cast("double")
                / (F.col("t_cur") + _PSI_BUCKETS)
            ).alias("p_cur"),
        )
    )
    terms = cells.withColumn(
        "psi_term",
        (F.col("p_ref") - F.col("p_cur")) * F.log(F.col("p_ref") / F.col("p_cur")),
    )
    win = Window.partitionBy()
    return terms.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round("psi_term", 6).alias("psi_term"),
        F.round(
            F.sum(F.col("psi_term").cast("decimal(28,12)")).over(win).cast("double"),
            6,
        ).alias("psi_total"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# q180 — embedding-space isotropy audit: the vector-quality datacard —
# how much of the space's energy the top principal direction eats
# (anisotropic spaces hurt cosine retrieval; Ethayarajh 2019, Mu &
# Viswanath 2018 all-but-the-top), plus norm and centroid diagnostics
# ---------------------------------------------------------------------------
def _isotropy_sql(dim: int = _PI_DIM, iters: int = _PI_ITERS) -> str:
    dot = f"list_sum([x.x[j] * vv.v[j] FOR j IN generate_series(1, {dim})])"
    sq = f"list_sum([x.x[i] * x.x[i] FOR i IN generate_series(1, {dim})])"
    ctes = _power_iteration_ctes(dim, iters)
    ctes += [
        f"""ray AS (
      SELECT CAST(SUM(CAST(d * d AS DECIMAL(28,12))) AS DOUBLE) AS rayleigh
      FROM (SELECT {dot} AS d FROM x, v{iters} vv)
    )""",
        f"""tr AS (
      SELECT CAST(SUM(CAST(x.x[i] * x.x[i] AS DECIMAL(28,12))) AS DOUBLE) AS trace
      FROM x, UNNEST(generate_series(1, {dim})) AS t(i)
    )""",
        f"""norms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CAST(sqrt({sq}) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS mean_norm
      FROM x
    )""",
        f"""cmean AS (
      SELECT i AS pos, {_fx_mean('x.x[i]')} AS mv
      FROM x, UNNEST(generate_series(1, {dim})) AS t(i)
      GROUP BY i
    )""",
        """cnorm AS (
      SELECT sqrt(list_sum(list(mv * mv ORDER BY pos))) AS centroid_norm
      FROM cmean
    )""",
    ]
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH {cte_block}
    SELECT n.n_vecs, CAST({dim} AS INT) AS dim,
           ROUND(n.mean_norm, 6) AS mean_norm,
           ROUND(c.centroid_norm, 6) AS centroid_norm,
           ROUND(t.trace, 4) AS trace,
           ROUND(r.rayleigh, 4) AS lambda1,
           ROUND(r.rayleigh / t.trace, 6) AS top_dir_share
    FROM norms n, tr t, ray r, cnorm c
    """


@register(
    "q180_embedding_isotropy",
    _isotropy_sql(),
    doc="embedding-space isotropy audit: dominant-eigenvalue share "
    "lambda1/trace via the q77 power-iteration direction's Rayleigh "
    "quotient (decimal-exact row sums, so the eigen-estimate is "
    "bit-deterministic), mean vector norm, and the centroid norm "
    "(non-zero mean = the common-direction bias that 'all-but-the-top' "
    "removes before cosine retrieval). Everything is aggregates over "
    "ONE cast-vector table: three decimal-exact sums plus the "
    "fixed-point per-dim means — no pairwise anything; the audit costs "
    "a handful of corpus passes regardless of scale",
)
def q180_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.functions.vector import fixed_point_mean
    from frontmatter_mcp_spark.operators.clustering import power_iteration

    e = load_table(spark, sf_dir, "embeddings")
    v = power_iteration(e, iters=_PI_ITERS)
    dim = len(v)
    x = F.col("embedding").cast("array<double>")
    xs = pin(e.select(x.alias("x")))
    dot = F.aggregate(
        F.zip_with(F.col("x"), F.lit(v), lambda a, b: a * b),
        F.lit(0.0),
        lambda s, t: s + t,
    )
    sq = F.aggregate(
        F.transform(F.col("x"), lambda a: a * a), F.lit(0.0), lambda s, t: s + t
    )
    ray = xs.select(dot.alias("d")).agg(
        F.sum((F.col("d") * F.col("d")).cast("decimal(28,12)"))
        .cast("double")
        .alias("rayleigh")
    )
    tr = (
        xs.select(F.explode("x").alias("xi"))
        .agg(
            F.sum((F.col("xi") * F.col("xi")).cast("decimal(28,12)"))
            .cast("double")
            .alias("trace")
        )
    )
    norms = xs.agg(
        F.count("*").cast("long").alias("n_vecs"),
        (
            F.sum(F.sqrt(sq).cast("decimal(28,12)")).cast("double") / F.count("*")
        ).alias("mean_norm"),
    )
    cmean = (
        xs.select(F.posexplode("x").alias("pos", "xi"))
        .groupBy("pos")
        .agg(fixed_point_mean(F.col("xi")).alias("mv"))
    )
    cnorm = cmean.agg(
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("mv")))
                    ),
                    lambda s: s["mv"] * s["mv"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ).alias("centroid_norm")
    )
    return (
        norms.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(ray))
        .crossJoin(F.broadcast(cnorm))
        .select(
            "n_vecs",
            F.lit(dim).cast("int").alias("dim"),
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round("centroid_norm", 6).alias("centroid_norm"),
            F.round("trace", 4).alias("trace"),
            F.round("rayleigh", 4).alias("lambda1"),
            F.round(F.col("rayleigh") / F.col("trace"), 6).alias("top_dir_share"),
        )
    )


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
            "vec_id", F.zip_with("x", F.lit(mu), lambda a, b: a - b).alias("x")
        )
    )
    v_cent = power_iteration(x2, iters=_PI_ITERS, vec_col="x")
    dot_c = F.aggregate(
        F.zip_with("x", F.lit(v_cent), lambda a, b: a * b),
        F.lit(0.0),
        lambda s, t: s + t,
    )
    x3 = pin(
        x2.select(
            "vec_id",
            F.zip_with(
                "x", F.lit(v_cent), lambda a, b: a - b * dot_c
            ).alias("x"),
        )
    )
    v_corr = power_iteration(x3, iters=_PI_ITERS, vec_col="x")

    def stage_row(name, df, v):
        dot = F.aggregate(
            F.zip_with("x", F.lit(v), lambda a, b: a * b),
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
# q182 — cross-source duplication attribution: WHICH sources duplicate
# WHICH — the provenance matrix behind q30's exact-dup groups and
# q124's corpus-level ratio (mirror-heavy source pairs jump out)
# ---------------------------------------------------------------------------
@register(
    "q182_dup_attribution",
    """
    WITH fp AS (
      SELECT DISTINCT md5(text) AS fp, source FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS shared_contents
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_contents FROM fp GROUP BY 1
    )
    SELECT p.source_a, p.source_b, p.shared_contents,
           ta.n_contents AS n_a, tb.n_contents AS n_b,
           ROUND(CAST(p.shared_contents AS DOUBLE)
                 / LEAST(ta.n_contents, tb.n_contents), 6) AS containment
    FROM pairs p
    JOIN tot ta ON ta.source = p.source_a
    JOIN tot tb ON tb.source = p.source_b
    ORDER BY source_a, source_b
    """,
    doc="cross-source duplication attribution matrix: distinct content "
    "fingerprints per source self-joined on the 16-byte hash (source "
    "pairs ordered a<b), with pairwise containment = shared / "
    "min(|a|,|b|) — the provenance report that turns q30's dup groups "
    "into an actionable 'source X mirrors source Y' decision. The join "
    "carries only distinct (fp, source) rows — content-group-sized, "
    "never corpus-sized — and fans out only where a fingerprint "
    "genuinely spans sources; totals broadcast back onto the "
    "|sources|^2-bounded pair table",
)
def q182_dup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = pin(d.select(F.md5("text").alias("fp"), "source").distinct())
    a = fp.select(F.col("fp"), F.col("source").alias("source_a"))
    b = fp.select(F.col("fp"), F.col("source").alias("source_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_contents"))
    )
    tot = fp.groupBy("source").agg(F.count("*").cast("long").alias("n_contents"))
    return (
        pairs.join(
            F.broadcast(tot.select(F.col("source").alias("source_a"),
                                   F.col("n_contents").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("source_b"),
                                   F.col("n_contents").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_contents",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_contents").cast("double")
                / F.least("n_a", "n_b"),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q183 — referential-integrity audit: the other half of ANALYZE next to
# q140's column stats — does every child row have its parent?
# ---------------------------------------------------------------------------
@register(
    "q183_referential_integrity",
    """
    WITH checks AS (
      SELECT 'lineitem.l_orderkey -> orders' AS fk,
             CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      UNION ALL
      SELECT 'customer.c_nationkey -> nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      UNION ALL
      SELECT 'supplier.s_nationkey -> nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey
      UNION ALL
      SELECT 'nation.n_regionkey -> region',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    )
    SELECT fk, n_child, n_orphans,
           ROUND(CAST(n_orphans AS DOUBLE) / n_child, 6) AS orphan_rate,
           CAST(n_orphans = 0 AS INT) AS intact
    FROM checks ORDER BY fk
    """,
    doc="referential-integrity audit over the star schema's five FK "
    "edges: child count, orphan count (parent key missing), orphan "
    "rate, and the pass verdict — the data-quality gate every "
    "warehouse load runs beside column stats (q140). Each check is a "
    "left join counting parent NULLs; the three dimension parents "
    "broadcast, the orders parent join is the only key shuffle, and "
    "orphan counting is map-side combined (at scale: left ANTI join + "
    "count is equivalent and prunes matched rows earlier; the LEFT "
    "JOIN form keeps child counting in the same pass)",
)
def q183_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def check(name, child, ck, parent, pk, bcast):
        p = parent.select(pk)
        if bcast:
            p = F.broadcast(p)
        return (
            child.select(F.col(ck))
            .join(p, child[ck] == p[pk], "left")
            .agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_child"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )

    checks = (
        check("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey", False)
        .unionAll(check("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey", False))
        .unionAll(check("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey", True))
        .unionAll(check("supplier.s_nationkey -> nation", s, "s_nationkey", n, "n_nationkey", True))
        .unionAll(check("nation.n_regionkey -> region", n, "n_regionkey", r, "r_regionkey", True))
    )
    return checks.select(
        "fk",
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans").cast("double") / F.col("n_child"), 6).alias(
            "orphan_rate"
        ),
        (F.col("n_orphans") == 0).cast("int").alias("intact"),
    ).orderBy("fk")


# ---------------------------------------------------------------------------
# q184 — equi-depth histogram (the optimizer-statistics histogram Spark
# and every warehouse actually keeps — q140 built the equi-WIDTH kind):
# per numeric column, 8 boundaries at binary-fraction percentiles and
# the realized bucket occupancy (ties make real equi-depth buckets
# unequal — the report shows exactly how unequal)
# ---------------------------------------------------------------------------
_EQD_PS = [i / 8 for i in range(1, 9)]  # binary fractions: exact cross-engine
_EQD_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _equidepth_sql() -> str:
    ps = ", ".join(repr(p) for p in _EQD_PS)
    unpivot = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS val FROM lineitem"
        for c in _EQD_COLS
    )
    return f"""
    WITH vals AS MATERIALIZED ({unpivot}),
    bnds AS MATERIALIZED (
      SELECT col, quantile_cont(val, [{ps}]) AS b FROM vals GROUP BY col
    ),
    bucketed AS (
      SELECT v.col, len(list_filter(b.b, x -> x < v.val)) + 1 AS bucket, b.b
      FROM vals v JOIN bnds b ON b.col = v.col
    )
    SELECT col, CAST(bucket AS INT) AS bucket,
           ROUND(CASE WHEN bucket = 1 THEN NULL ELSE b[bucket - 1] END, 6) AS lo,
           ROUND(b[bucket], 6) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bucketed
    GROUP BY col, bucket, b
    ORDER BY col, bucket
    """


@register(
    "q184_equidepth_histogram",
    _equidepth_sql(),
    doc="equi-depth histogram for optimizer statistics: per numeric "
    "lineitem column, boundaries at the 1/8..8/8 percentiles (binary "
    "fractions, so Spark percentile == DuckDB quantile_cont bit-"
    "exactly) and the realized occupancy per bucket — heavy value ties "
    "(l_quantity has 50 distinct values) visibly overfill buckets, "
    "which is the property selectivity estimators must model. Two "
    "passes over one unpivoted scan: a per-column percentile aggregate "
    "(3 groups), boundaries broadcast back, bucket index = count of "
    "boundaries strictly below the value (an 8-element array scan in "
    "codegen), map-side-combined occupancy count",
)
def q184_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vals = None
    for c in _EQD_COLS:
        part = li.select(
            F.lit(c).alias("col"), F.col(c).cast("double").alias("val")
        )
        vals = part if vals is None else vals.unionAll(part)
    vals = pin(vals)
    bnds = vals.groupBy("col").agg(
        F.percentile("val", F.array(*[F.lit(p) for p in _EQD_PS])).alias("b")
    )
    bucketed = vals.join(F.broadcast(bnds), "col").select(
        "col",
        (F.size(F.filter("b", lambda x: x < F.col("val"))) + 1).alias("bucket"),
        "b",
    )
    return (
        bucketed.groupBy("col", "bucket", "b")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            "col",
            F.col("bucket").cast("int").alias("bucket"),
            F.round(
                F.when(
                    F.col("bucket") > 1, F.element_at("b", F.col("bucket") - 1)
                ),
                6,
            ).alias("lo"),
            F.round(F.element_at("b", F.col("bucket")), 6).alias("hi"),
            "n_rows",
        )
        .orderBy("col", "bucket")
    )


# ---------------------------------------------------------------------------
# q185 — join-estimate audit across the schema's FK edges: the AGMS
# sketch estimate (q152's machinery) AND the classic uniform NDV
# formula |A||B| / max(ndv_a, ndv_b) scored against the true join
# size on every edge — the report that shows WHERE the textbook
# formula breaks (skewed keys) and the sketch holds
# ---------------------------------------------------------------------------
_JEA_EDGES = [
    ("lineitem*orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders*customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer*nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


def _join_audit_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    col = hash_bucket_sql(
        "CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)", _JSZ_WIDTH
    )
    ctes, rows = [], []
    for i, (name, ta, ka, tb, kb) in enumerate(_JEA_EDGES):
        ctes += [
            f"""a{i} AS MATERIALIZED (
      SELECT {ka} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {ta} GROUP BY 1
    )""",
            f"""b{i} AS MATERIALIZED (
      SELECT {kb} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {tb} GROUP BY 1
    )""",
            f"""stats{i} AS MATERIALIZED (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM a{i}) AS n_a,
             (SELECT CAST(SUM(c) AS BIGINT) FROM b{i}) AS n_b,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM a{i}) AS ndv_a,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM b{i}) AS ndv_b,
             (SELECT CAST(COALESCE(SUM(a{i}.c * b{i}.c), 0) AS BIGINT)
              FROM a{i} JOIN b{i} USING (k)) AS true_size
    )""",
            f"""ca{i} AS MATERIALIZED (
      SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
      FROM a{i} CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
      GROUP BY 1, 2
    )""",
            f"""cb{i} AS MATERIALIZED (
      SELECT r, {col} AS col, CAST(SUM(c) AS BIGINT) AS v
      FROM b{i} CROSS JOIN UNNEST(generate_series(0, {_JSZ_DEPTH - 1})) AS g(r)
      GROUP BY 1, 2
    )""",
            f"""est{i} AS MATERIALIZED (
      SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM (
        SELECT ca{i}.r, CAST(SUM(ca{i}.v * cb{i}.v) AS BIGINT) AS ip
        FROM ca{i} JOIN cb{i} ON ca{i}.r = cb{i}.r AND ca{i}.col = cb{i}.col
        GROUP BY 1
      )
    )""",
        ]
        rows.append(
            f"""SELECT '{name}' AS edge, s.true_size, e.cms_est,
             CAST(s.n_a * s.n_b // GREATEST(s.ndv_a, s.ndv_b) AS BIGINT)
               AS ndv_est,
             ROUND(CAST(e.cms_est - s.true_size AS DOUBLE)
                   / s.true_size, 6) AS cms_rel_err,
             ROUND(CAST(s.n_a * s.n_b // GREATEST(s.ndv_a, s.ndv_b)
                        - s.true_size AS DOUBLE) / s.true_size, 6)
               AS ndv_rel_err
      FROM stats{i} s, est{i} e"""
        )
    cte_block = ",\n    ".join(ctes)
    union = "\n    UNION ALL ".join(rows)
    return f"""
    WITH {cte_block}
    {union}
    ORDER BY edge
    """


@register(
    "q185_join_estimate_audit",
    _join_audit_sql(),
    doc="join-size estimate audit over three FK edges: the AGMS/CMS "
    "sketch inner product (q152's estimator, guaranteed >= truth) and "
    "the classic uniform formula n_a*n_b/max(ndv) (what rule-based "
    "optimizers use without histograms) both scored against the exact "
    "join size — the uniform formula is exact on perfectly uniform "
    "FKs and drifts on skewed ones, which is precisely the evidence "
    "for keeping sketches in optimizer statistics. Per edge: two "
    "key-count aggregates, 1024-cell sketches, one sketch-sized inner "
    "product; the true size is the audit column a production "
    "optimizer never computes",
)
def q185_join_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    rr = spark.range(_JSZ_DEPTH).select(F.col("id").cast("int").alias("r"))

    def sketch(side: DataFrame) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(rr))
            .select(
                "r",
                hash_bucket(
                    F.concat(
                        F.col("r").cast("string"), F.lit("|"), F.col("k").cast("string")
                    ),
                    _JSZ_WIDTH,
                ).alias("col"),
                "c",
            )
            .groupBy("r", "col")
            .agg(F.sum("c").cast("long").alias("v"))
        )

    out = None
    for name, ta, ka, tb, kb in _JEA_EDGES:
        a = pin(
            load_table(spark, sf_dir, ta)
            .groupBy(F.col(ka).alias("k"))
            .agg(F.count("*").cast("long").alias("c"))
        )
        b = pin(
            load_table(spark, sf_dir, tb)
            .groupBy(F.col(kb).alias("k"))
            .agg(F.count("*").cast("long").alias("c"))
        )
        stats = (
            a.agg(
                F.sum("c").cast("long").alias("n_a"),
                F.count("*").cast("long").alias("ndv_a"),
            )
            .crossJoin(
                F.broadcast(
                    b.agg(
                        F.sum("c").cast("long").alias("n_b"),
                        F.count("*").cast("long").alias("ndv_b"),
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    a.join(b.withColumnRenamed("c", "cb"), "k").agg(
                        F.coalesce(F.sum(F.col("c") * F.col("cb")), F.lit(0))
                        .cast("long")
                        .alias("true_size")
                    )
                )
            )
        )
        est = (
            sketch(a)
            .join(F.broadcast(sketch(b).withColumnRenamed("v", "vb")), ["r", "col"])
            .groupBy("r")
            .agg(F.sum(F.col("v") * F.col("vb")).cast("long").alias("ip"))
            .agg(F.min("ip").cast("long").alias("cms_est"))
        )
        ndv_est = F.floor(
            F.col("n_a") * F.col("n_b") / F.greatest("ndv_a", "ndv_b")
        ).cast("long")
        row = stats.crossJoin(F.broadcast(est)).select(
            F.lit(name).alias("edge"),
            "true_size",
            "cms_est",
            ndv_est.alias("ndv_est"),
            F.round(
                (F.col("cms_est") - F.col("true_size")).cast("double")
                / F.col("true_size"),
                6,
            ).alias("cms_rel_err"),
            F.round(
                (ndv_est - F.col("true_size")).cast("double") / F.col("true_size"),
                6,
            ).alias("ndv_rel_err"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# q186 — personalized PageRank from a trusted seed set (TrustRank):
# q126 ranks by global similarity-graph centrality; this ranks by
# proximity to a vetted subset — the trust-propagation curation signal
# ---------------------------------------------------------------------------
def _ppr_sql(iters: int = _PR_ITERS) -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    s, base = _PR_SCALE, _PR_SCALE * 15
    ctes = [
        _SHINGLES_CTE.strip().rstrip(","),
        f"sigs AS MATERIALIZED (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id)",
        f"bb AS MATERIALIZED ({band_rows})",
        """pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id
    )""",
        """edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
    )""",
        "odeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg "
        "FROM edges GROUP BY 1)",
        """sf AS MATERIALIZED (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_seed
      FROM documents
    )""",
        "nseed AS MATERIALIZED (SELECT CAST(SUM(is_seed) AS BIGINT) AS ns FROM sf)",
        f"""p0 AS MATERIALIZED (
      SELECT doc_id, is_seed,
             CASE WHEN is_seed = 1 THEN CAST({s} AS BIGINT) // ns
                  ELSE CAST(0 AS BIGINT) END AS pr
      FROM sf CROSS JOIN nseed
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""p{t} AS MATERIALIZED (
      SELECT d.doc_id, d.is_seed,
             CASE WHEN d.is_seed = 1
                  THEN CAST({base} AS BIGINT) // (100 * ns)
                  ELSE CAST(0 AS BIGINT) END
             + (85 * COALESCE(c.csum, CAST(0 AS BIGINT))) // 100 AS pr
      FROM sf d CROSS JOIN nseed
      LEFT JOIN (
        SELECT e.dst, CAST(SUM(p.pr // o.odeg) AS BIGINT) AS csum
        FROM edges e
        JOIN p{t - 1} p ON p.doc_id = e.src
        JOIN odeg o ON o.src = e.src
        GROUP BY e.dst
      ) c ON c.dst = d.doc_id
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT p.doc_id, CAST(p.is_seed AS INT) AS is_seed,
           CAST(COALESCE(o.odeg, 0) AS INT) AS out_degree,
           CAST(p.pr AS BIGINT) AS pr_fx
    FROM p{iters} p LEFT JOIN odeg o ON o.src = p.doc_id
    """


@register(
    "q186_personalized_pagerank",
    _ppr_sql(),
    doc="personalized PageRank (TrustRank) over the LSH similarity "
    "graph: all teleport mass lands on the trusted seed set (lang='en' "
    "stands in for a vetted corpus), so pr_fx measures proximity to "
    "the seeds through the near-dup structure — zero means unreachable "
    "from any seed, the trust-propagation curation signal. Same exact "
    "scaled-integer floor-division arithmetic as q126 (bit-identical "
    "oracle replay per iteration), same scale shape: pinned annotated "
    "edges, one dst-key shuffle per iteration, linear plan chain",
)
def q186_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.clustering import ppr_fixed_point

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = dd.lsh_candidate_pairs(d, "doc_id", "text", _NUM_HASHES, _BANDS)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    seeds = d.filter(F.col("lang") == "en").select("doc_id")
    return ppr_fixed_point(
        edges, d.select("doc_id"), seeds, "doc_id",
        iters=_PR_ITERS, scale=_PR_SCALE, persist_fn=pin,
    )


# ---------------------------------------------------------------------------
# q187 — modularity of the near-dup partition: does q56's grouping
# actually carve the LSH graph at its joints? The community-QUALITY
# metric that closes the graph-analytics family (components q135,
# PageRank q126/q186, triangles q159, k-core q165)
# ---------------------------------------------------------------------------
_MOD_SCALE = 2**30


def _modularity_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE.strip().rstrip(',')},
    sigs AS MATERIALIZED (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS MATERIALIZED ({band_rows}),
    e AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sym AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e
    ),
    lbl0 AS MATERIALIZED (
      SELECT DISTINCT src AS node FROM sym
    ),
    l0 AS MATERIALIZED (SELECT node, node AS label FROM lbl0),
    l1 AS MATERIALIZED (
      SELECT l.node, LEAST(l.label, COALESCE(m.nl, l.label)) AS label
      FROM l0 l LEFT JOIN (
        SELECT s.src, MIN(x.label) AS nl FROM sym s
        JOIN l0 x ON x.node = s.dst GROUP BY s.src
      ) m ON m.src = l.node
    ),
    l2 AS MATERIALIZED (
      SELECT l.node, LEAST(l.label, COALESCE(m.nl, l.label)) AS label
      FROM l1 l LEFT JOIN (
        SELECT s.src, MIN(x.label) AS nl FROM sym s
        JOIN l1 x ON x.node = s.dst GROUP BY s.src
      ) m ON m.src = l.node
    ),
    l3 AS MATERIALIZED (
      SELECT l.node, LEAST(l.label, COALESCE(m.nl, l.label)) AS label
      FROM l2 l LEFT JOIN (
        SELECT s.src, MIN(x.label) AS nl FROM sym s
        JOIN l2 x ON x.node = s.dst GROUP BY s.src
      ) m ON m.src = l.node
    ),
    m AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    comm AS MATERIALIZED (
      SELECT la.label AS c,
             CAST(SUM(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT)
               AS e_in,
             CAST(0 AS BIGINT) AS d_sum
      FROM e
      JOIN l3 la ON la.node = e.a
      JOIN l3 lb ON lb.node = e.b
      GROUP BY la.label
    ),
    deg AS MATERIALIZED (
      SELECT l3.label AS c, CAST(COUNT(*) AS BIGINT) AS d_sum
      FROM sym JOIN l3 ON l3.node = sym.src
      GROUP BY l3.label
    ),
    per_c AS MATERIALIZED (
      SELECT d.c,
             COALESCE(cm.e_in, 0) AS e_in, d.d_sum,
             CAST(COALESCE(cm.e_in, 0) * {_MOD_SCALE} // m.m AS BIGINT)
             - CAST(d.d_sum * d.d_sum * {_MOD_SCALE} // (4 * m.m * m.m) AS BIGINT)
               AS q_fx
      FROM deg d LEFT JOIN comm cm ON cm.c = d.c CROSS JOIN m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
           (SELECT m FROM m) AS n_edges,
           CAST(SUM(e_in) AS BIGINT) AS intra_edges,
           CAST(SUM(q_fx) AS BIGINT) AS modularity_fx,
           ROUND(CAST(SUM(q_fx) AS DOUBLE) / {_MOD_SCALE}, 6) AS modularity
    FROM per_c
    """


@register(
    "q187_partition_modularity",
    _modularity_sql(),
    doc="Newman modularity of the min-label-propagation partition over "
    "the LSH similarity graph: Q = sum_c [e_c/m - (d_c/2m)^2] in exact "
    "2^30 fixed point (floor divisions, so the score hash-matches "
    "bit-for-bit) — the community-quality metric that says whether the "
    "near-dup grouping carves the graph at its joints (Q near the "
    "maximum means groups are dense inside, sparse between — template "
    "families; Q near 0 means the partition is no better than random). "
    "Three propagation rounds on the edge-node set only (the q56 "
    "shape), then everything runs on community-sized aggregates of the "
    "edge list",
)
def q187_partition_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    e = pin(
        dd.lsh_candidate_pairs(d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    )
    sym = pin(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    labels = pin(
        sym.select(F.col("src").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    for _ in range(3):
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nl"))
        )
        labels = pin(
            labels.join(nbr, labels["node"] == nbr["src"], "left").select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nl", F.col("label"))
                ).alias("label"),
            )
        )
    m_row = F.broadcast(e.agg(F.count("*").cast("long").alias("m")))
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("cb"))
    comm = (
        e.join(la, "a")
        .join(lb, "b")
        .groupBy(F.col("ca").alias("c"))
        .agg(
            F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
            .cast("long")
            .alias("e_in")
        )
    )
    deg = (
        sym.join(labels.select(F.col("node").alias("src"), "label"), "src")
        .groupBy(F.col("label").alias("c"))
        .agg(F.count("*").cast("long").alias("d_sum"))
    )
    s = _MOD_SCALE
    per_c = (
        deg.join(comm, "c", "left")
        .crossJoin(m_row)
        .select(
            "c",
            F.coalesce("e_in", F.lit(0)).alias("e_in"),
            "d_sum",
            (
                F.expr(f"CAST(coalesce(e_in, 0) * {s} AS BIGINT) div m")
                - F.expr(f"CAST(d_sum * d_sum * {s} AS BIGINT) div (4 * m * m)")
            ).alias("q_fx"),
        )
    )
    return per_c.crossJoin(m_row).agg(
        F.count("*").cast("long").alias("n_communities"),
        F.max("m").cast("long").alias("n_edges"),
        F.sum("e_in").cast("long").alias("intra_edges"),
        F.sum("q_fx").cast("long").alias("modularity_fx"),
        F.round(F.sum("q_fx").cast("double") / s, 6).alias("modularity"),
    )


# ---------------------------------------------------------------------------
# q188 — conversion-latency statistics: q18's as-of join finds WHICH
# click preceded each purchase; this measures HOW LONG attribution
# took — the funnel-latency layer (exact integer microsecond deltas,
# binary-fraction percentiles)
# ---------------------------------------------------------------------------
@register(
    "q188_conversion_latency",
    """
    WITH pairs AS (
      SELECT p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS lat_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(lat_us) AS BIGINT) AS min_us,
           ROUND(quantile_cont(lat_us, 0.5), 4) AS p50_us,
           ROUND(quantile_cont(lat_us, 0.75), 4) AS p75_us,
           ROUND(quantile_cont(lat_us, 0.9375), 4) AS p94_us,
           CAST(MAX(lat_us) AS BIGINT) AS max_us
    FROM pairs
    """,
    doc="conversion-latency profile over the click->purchase as-of "
    "pairs (attributed purchases only — the ASOF INNER form): exact "
    "integer microsecond deltas, interpolated percentiles at binary "
    "fractions (Spark percentile == DuckDB quantile_cont bit-exactly). "
    "Spark side reuses q18's union+window as-of rewrite, then one "
    "global aggregate; at scale the percentile becomes approx and the "
    "rest is unchanged",
)
def q188_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pairs = (
        tagged.withColumn(
            "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
        )
        .filter((F.col("is_purchase") == 1) & F.col("last_click_ts").isNotNull())
        .select(
            "user_id",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("last_click_ts").cast("timestamp"))
            ).alias("lat_us"),
        )
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("lat_us").cast("long").alias("min_us"),
        F.round(F.percentile("lat_us", F.lit(0.5)), 4).alias("p50_us"),
        F.round(F.percentile("lat_us", F.lit(0.75)), 4).alias("p75_us"),
        F.round(F.percentile("lat_us", F.lit(0.9375)), 4).alias("p94_us"),
        F.max("lat_us").cast("long").alias("max_us"),
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
           ROUND(s.s_low, 4) AS sample_low, ROUND(s.s_high, 4) AS sample_high,
           ROUND(s.e_low, 4) AS exact_low, ROUND(s.e_high, 4) AS exact_high,
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
            F.round("s_low", 4).alias("sample_low"),
            F.round("s_high", 4).alias("sample_high"),
            F.round("e_low", 4).alias("exact_low"),
            F.round("e_high", 4).alias("exact_high"),
            "n_flag_sample",
            "n_flag_exact",
            "n_only_sample",
            "n_only_exact",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q192 — CUSUM change-point detection over per-type daily volumes: the
# page-one drift detector (did this event type's rate shift upward, and
# WHEN) in exact integer arithmetic — scaled by n_days so the reference
# mean needs no division, folded sequentially over the bounded day axis
# ---------------------------------------------------------------------------
@register(
    "q192_cusum_changepoint",
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
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    series AS (
      SELECT event_type,
             list(struct_pack(day := strftime(day, '%Y-%m-%d'), n := n)
                  ORDER BY day) AS xs,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM filled GROUP BY 1
    ),
    folded AS (
      -- every field recomputes s_new from the OLD a.s and s is packed
      -- LAST, so DuckDB's in-place struct_pack evaluation and Spark's
      -- functional fold see identical values at every step
      SELECT event_type, n_days, total,
        list_reduce(
          list_prepend(
            struct_pack(max_s := CAST(0 AS BIGINT),
                        first_alarm := CAST(NULL AS VARCHAR),
                        n_alarms := CAST(0 AS BIGINT),
                        day := CAST(NULL AS VARCHAR),
                        d := CAST(0 AS BIGINT),
                        s := CAST(0 AS BIGINT)),
            list_transform(xs, x -> struct_pack(
              max_s := CAST(0 AS BIGINT),
              first_alarm := CAST(NULL AS VARCHAR),
              n_alarms := CAST(0 AS BIGINT),
              day := x.day,
              d := x.n * n_days - total - total // 4,
              s := CAST(0 AS BIGINT)))),
          (a, b) -> struct_pack(
            max_s := GREATEST(a.max_s,
                              GREATEST(CAST(0 AS BIGINT), a.s + b.d)),
            first_alarm := CASE
              WHEN a.first_alarm IS NULL
               AND GREATEST(CAST(0 AS BIGINT), a.s + b.d) > 3 * total
              THEN b.day ELSE a.first_alarm END,
            n_alarms := a.n_alarms + CASE
              WHEN GREATEST(CAST(0 AS BIGINT), a.s + b.d) > 3 * total
              THEN 1 ELSE 0 END,
            day := b.day,
            d := b.d,
            s := GREATEST(CAST(0 AS BIGINT), a.s + b.d))) AS r
      FROM series
    )
    SELECT event_type, CAST(n_days AS INT) AS n_days, total AS total_events,
           ROUND(CAST(total AS DOUBLE) / n_days, 4) AS mean_daily,
           (r).max_s AS max_cusum,
           (r).first_alarm AS first_alarm_day,
           CAST((r).n_alarms AS INT) AS n_alarms
    FROM folded ORDER BY event_type
    """,
    doc="one-sided CUSUM drift detection per event type: daily counts on "
    "a gap-filled day axis (missing days count 0 — a detector that skips "
    "quiet days is blind to outages), deviations scaled by n_days so the "
    "reference mean and the 25% allowance stay exact BIGINTs (x*n_days - "
    "total - total//4), folded as S_t = max(0, S_{t-1} + d_t) with alarm "
    "threshold 3*mean-days. Emits the max statistic, the FIRST alarm day "
    "(the change-point estimate), and the alarm-day count. One events "
    "scan, one day aggregate; the fold runs over the bounded day axis, "
    "so the collected series is O(days) no matter the corpus size",
)
def q192_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    series = filled.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("xs"),
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    zero = F.lit(0).cast("long")
    elems = F.transform(
        "xs",
        lambda x: F.struct(
            F.date_format(x["day"], "yyyy-MM-dd").alias("day"),
            (
                x["n"] * F.col("n_days") - F.col("total") - F.expr("total div 4")
            ).alias("d"),
        ),
    )
    init = F.struct(
        zero.alias("max_s"),
        F.lit(None).cast("string").alias("first_alarm"),
        zero.alias("n_alarms"),
        F.lit(None).cast("string").alias("day"),
        zero.alias("d"),
        zero.alias("s"),
    )

    def merge(a, b):
        s_new = F.greatest(zero, a["s"] + b["d"])
        alarm = s_new > 3 * F.col("total")
        return F.struct(
            F.greatest(a["max_s"], s_new).alias("max_s"),
            F.when(a["first_alarm"].isNull() & alarm, b["day"])
            .otherwise(a["first_alarm"])
            .alias("first_alarm"),
            (a["n_alarms"] + F.when(alarm, 1).otherwise(0)).alias("n_alarms"),
            b["day"].alias("day"),
            b["d"].alias("d"),
            s_new.alias("s"),
        )

    folded = series.select(
        "event_type",
        "n_days",
        "total",
        F.aggregate(elems, init, merge).alias("r"),
    )
    return folded.select(
        "event_type",
        F.col("n_days").cast("int").alias("n_days"),
        F.col("total").alias("total_events"),
        F.round(F.col("total").cast("double") / F.col("n_days"), 4).alias(
            "mean_daily"
        ),
        F.col("r")["max_s"].alias("max_cusum"),
        F.col("r")["first_alarm"].alias("first_alarm_day"),
        F.col("r")["n_alarms"].cast("int").alias("n_alarms"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q193 — Markov transition matrix over per-user event sequences + the
# chain's stationary distribution: the behavioral fingerprint (what
# follows what, and where does a random session spend its time) in the
# q126 exact fixed-point arithmetic so every power iteration replays
# bit-identically in the oracle CTEs
# ---------------------------------------------------------------------------
_MKV_SCALE = 2**30
_MKV_ITERS = 6


def _markov_sql(iters: int = _MKV_ITERS, s: int = _MKV_SCALE) -> str:
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
        f"""tfx AS (
      SELECT t.src, t.dst, (t.cnt * {s}) // r.tot AS p_fx
      FROM trans t JOIN rowtot r USING (src)
    )""",
        "types AS (SELECT DISTINCT event_type FROM events)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM types)",
        f"""pi0 AS (
      SELECT event_type, CAST({s} AS BIGINT) // n AS pi FROM types CROSS JOIN nn
    )""",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pi{t} AS (
      SELECT ty.event_type, COALESCE(c.m, CAST(0 AS BIGINT)) AS pi
      FROM types ty LEFT JOIN (
        SELECT t.dst, CAST(SUM(p.pi * t.p_fx // {s}) AS BIGINT) AS m
        FROM tfx t JOIN pi{t - 1} p ON p.event_type = t.src
        GROUP BY t.dst
      ) c ON c.dst = ty.event_type
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    top AS (
      SELECT src, dst, p_fx,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY p_fx DESC, dst) AS rn
      FROM tfx
    )
    SELECT ty.event_type,
           CAST(COALESCE(r.tot, 0) AS BIGINT) AS n_out,
           CAST(COALESCE(sp.p_fx, 0) AS BIGINT) AS self_p_fx,
           tp.dst AS top_next, tp.p_fx AS top_next_p_fx,
           CAST(p.pi AS BIGINT) AS pi_fx
    FROM types ty
    LEFT JOIN rowtot r ON r.src = ty.event_type
    LEFT JOIN (SELECT src, p_fx FROM tfx WHERE src = dst) sp
           ON sp.src = ty.event_type
    LEFT JOIN (SELECT src, dst, p_fx FROM top WHERE rn = 1) tp
           ON tp.src = ty.event_type
    JOIN pi{iters} p ON p.event_type = ty.event_type
    ORDER BY ty.event_type
    """


@register(
    "q193_markov_transitions",
    _markov_sql(),
    doc="first-order Markov model of user behavior: adjacent event pairs "
    "per user (one LAG window over (ts, event_id) total order) fold into "
    "a |types|^2 transition matrix; probabilities are 2^30 fixed point "
    "((cnt*S)//row_total, exact BIGINTs) and the stationary distribution "
    "runs 6 power iterations in the same floor-division arithmetic — "
    "each iteration one tiny matrix-vector join replayed verbatim in an "
    "oracle CTE (the q126 discipline; dangling mass drops, which is "
    "deterministic on both engines). Output per type: out-volume, "
    "self-loop probability, argmax next type, stationary mass. The "
    "corpus pays one window pass + one pair aggregate; everything "
    "iterative runs on the types-sized matrix",
)
def q193_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    tfx = pin(
        trans.join(rowtot, "src").select(
            "src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx")
        )
    )
    types = e.select("event_type").distinct()
    nn = types.agg(F.count("*").cast("long").alias("n"))
    pi = types.crossJoin(F.broadcast(nn)).select(
        "event_type", F.expr(f"cast({s} as bigint) div n").alias("pi")
    )
    for _ in range(_MKV_ITERS):
        contrib = (
            tfx.join(pi, tfx["src"] == pi["event_type"])
            .groupBy("dst")
            .agg(F.sum(F.expr(f"(pi * p_fx) div {s}")).cast("long").alias("m"))
        )
        pi = types.join(
            contrib, types["event_type"] == contrib["dst"], "left"
        ).select("event_type", F.coalesce("m", F.lit(0).cast("long")).alias("pi"))
    top_w = W.partitionBy("src").orderBy(F.col("p_fx").desc(), "dst")
    top = (
        tfx.withColumn("rn", F.row_number().over(top_w))
        .filter(F.col("rn") == 1)
        .select("src", F.col("dst").alias("top_next"), F.col("p_fx").alias("top_next_p_fx"))
    )
    selfp = tfx.filter(F.col("src") == F.col("dst")).select(
        "src", F.col("p_fx").alias("self_raw")
    )
    return (
        types.join(rowtot, types["event_type"] == rowtot["src"], "left")
        .drop(rowtot["src"])
        .join(selfp, types["event_type"] == selfp["src"], "left")
        .drop(selfp["src"])
        .join(top, types["event_type"] == top["src"], "left")
        .drop(top["src"])
        .join(pi, "event_type")
        .select(
            "event_type",
            F.coalesce("tot", F.lit(0).cast("long")).alias("n_out"),
            F.coalesce("self_raw", F.lit(0).cast("long")).alias("self_p_fx"),
            "top_next",
            "top_next_p_fx",
            F.col("pi").alias("pi_fx"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q194 — multi-touch conversion attribution: every purchase distributes
# one unit of credit over the user's preceding touches inside a 3-day
# horizon under three standard models (first-touch / last-touch /
# linear), in exact integer credit units so the division leaves no
# float residue (the remainder goes to the last touch by rule)
# ---------------------------------------------------------------------------
_ATTR_SCALE = 2**20
_ATTR_TOUCH_TYPES = ("click", "view", "signup")


def _attribution_sql(s: int = _ATTR_SCALE) -> str:
    touch_in = ", ".join(f"'{t}'" for t in _ATTR_TOUCH_TYPES)
    return f"""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, ts, event_type
      FROM events WHERE event_type IN ({touch_in})
    ),
    pairs AS (
      SELECT c.conv_id, t.touch_id, t.event_type, t.ts
      FROM conv c JOIN touch t ON t.user_id = c.user_id
       AND t.ts < c.conv_ts AND t.ts >= c.conv_ts - INTERVAL '3 days'
    ),
    ranked AS (
      SELECT conv_id, touch_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts, touch_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY conv_id
                                ORDER BY ts DESC, touch_id DESC) AS rn_last,
             COUNT(*) OVER (PARTITION BY conv_id) AS n_t
      FROM pairs
    ),
    credits AS (
      SELECT event_type, touch_id, conv_id,
             {s} // n_t
               + CASE WHEN rn_last = 1 THEN {s} % n_t ELSE 0 END AS c_lin,
             CASE WHEN rn_first = 1 THEN {s} ELSE 0 END AS c_first,
             CASE WHEN rn_last = 1 THEN {s} ELSE 0 END AS c_last
      FROM ranked
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT touch_id) AS BIGINT) AS n_touch_events,
           CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(SUM(c_lin) AS BIGINT) AS credit_linear,
           CAST(SUM(c_first) AS BIGINT) AS credit_first,
           CAST(SUM(c_last) AS BIGINT) AS credit_last
    FROM credits GROUP BY 1 ORDER BY 1
    """


@register(
    "q194_touch_attribution",
    _attribution_sql(),
    doc="multi-touch attribution over the click/view/signup -> purchase "
    "funnel: per conversion, the user's touches in the trailing 3 days "
    "ranked under a (ts, event_id) total order; linear credit is "
    "S//n with the integer remainder assigned to the LAST touch (sums "
    "are exactly S per attributed conversion — no float residue to "
    "drift cross-engine), first/last-touch get the whole unit. The "
    "pair join is user-keyed with a bounded time horizon (the q55 "
    "interval-join shape — at 100 TB this runs as the watermarked "
    "stream-stream join, state bounded by the 3-day horizon); ranks "
    "run per conversion, aggregation is map-side combined per channel",
)
def q194_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _ATTR_SCALE
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = e.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"), "user_id", "ts", "event_type"
    )
    pairs = conv.join(touch, "user_id").filter(
        (F.col("ts") < F.col("conv_ts"))
        & (F.col("ts") >= F.col("conv_ts") - F.expr("interval 3 days"))
    )
    ranked = pairs.select(
        "conv_id",
        "touch_id",
        "event_type",
        F.row_number()
        .over(W.partitionBy("conv_id").orderBy("ts", "touch_id"))
        .alias("rn_first"),
        F.row_number()
        .over(
            W.partitionBy("conv_id").orderBy(
                F.col("ts").desc(), F.col("touch_id").desc()
            )
        )
        .alias("rn_last"),
        F.count("*").over(W.partitionBy("conv_id")).alias("n_t"),
    )
    credits = ranked.select(
        "event_type",
        "touch_id",
        "conv_id",
        (
            F.expr(f"{s} div n_t")
            + F.when(F.col("rn_last") == 1, F.lit(s) % F.col("n_t")).otherwise(0)
        ).alias("c_lin"),
        F.when(F.col("rn_first") == 1, F.lit(s)).otherwise(0).alias("c_first"),
        F.when(F.col("rn_last") == 1, F.lit(s)).otherwise(0).alias("c_last"),
    )
    return (
        credits.groupBy("event_type")
        .agg(
            F.countDistinct("touch_id").cast("long").alias("n_touch_events"),
            F.countDistinct("conv_id").cast("long").alias("n_conversions"),
            F.sum("c_lin").cast("long").alias("credit_linear"),
            F.sum("c_first").cast("long").alias("credit_first"),
            F.sum("c_last").cast("long").alias("credit_last"),
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
             ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
           END AS flesch_ease,
           CASE WHEN n_words > 0 THEN
             ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                   + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4)
           END AS fk_grade
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
    ease = F.round(
        206.835
        - 1.015 * (wd / F.col("n_sentences"))
        - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
        4,
    )
    grade = F.round(
        0.39 * (wd / F.col("n_sentences"))
        + 11.8 * (F.col("n_syllables").cast("double") / F.col("n_words"))
        - 15.59,
        4,
    )
    return c.select(
        "doc_id",
        "source",
        F.col("n_sentences").cast("int").alias("n_sentences"),
        F.col("n_words").cast("int").alias("n_words"),
        F.col("n_syllables").cast("int").alias("n_syllables"),
        F.when(F.col("n_words") > 0, ease).alias("flesch_ease"),
        F.when(F.col("n_words") > 0, grade).alias("fk_grade"),
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
# q197 — daily value distribution bands: the box-plot time series
# (p25/p50/p75 + IQR whiskers + outlier count per day per type) that
# every metrics dashboard draws — exact interpolated percentiles at
# binary fractions (cross-engine bit-identical), decimal-exact means
# ---------------------------------------------------------------------------
@register(
    "q197_daily_value_bands",
    """
    WITH d AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day, value
      FROM events
    ),
    bands AS (
      SELECT event_type, day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             quantile_cont(value, 0.25e0) AS p25,
             quantile_cont(value, 0.5e0) AS p50,
             quantile_cont(value, 0.75e0) AS p75
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           ROUND(sum_value / n, 6) AS mean_value,
           ROUND(p25, 6) AS p25, ROUND(p50, 6) AS p50, ROUND(p75, 6) AS p75,
           ROUND(p75 - p25, 6) AS iqr,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d x
            WHERE x.event_type = bands.event_type AND x.day = bands.day
              AND (x.value < p25 - 1.5e0 * (p75 - p25)
                   OR x.value > p75 + 1.5e0 * (p75 - p25))) AS n_outliers
    FROM bands ORDER BY event_type, day
    """,
    doc="box-plot bands per (event type, day): exact interpolated "
    "quartiles at binary fractions, decimal-exact mean, IQR, and the "
    "Tukey 1.5*IQR outlier count (computed by a second pass against "
    "the per-group fences — in Spark one broadcast join back, not a "
    "correlated subquery). The day axis bounds every group; both "
    "scans are map-side-combined aggregates over the same shuffle key",
)
def q197_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    bands = d.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
    )
    fences = bands.select(
        "event_type",
        "day",
        (F.col("p25") - 1.5 * (F.col("p75") - F.col("p25"))).alias("lo"),
        (F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))).alias("hi"),
    )
    outliers = (
        d.join(F.broadcast(fences), ["event_type", "day"])
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .groupBy("event_type", "day")
        .agg(F.count("*").cast("long").alias("n_outliers"))
    )
    return (
        bands.join(outliers, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(F.col("sum_value") / F.col("n"), 6).alias("mean_value"),
            F.round("p25", 6).alias("p25"),
            F.round("p50", 6).alias("p50"),
            F.round("p75", 6).alias("p75"),
            F.round(F.col("p75") - F.col("p25"), 6).alias("iqr"),
            F.coalesce("n_outliers", F.lit(0).cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q198 — RFM customer segmentation: the canonical BI cohort cut —
# recency / frequency / monetary quintiles under total orders, with the
# standard named segments. Quintile cuts are NTILE under a total order
# (metric, then custkey), monetary is decimal-exact, recency is integer
# days vs the corpus horizon — every cut deterministic cross-engine
# ---------------------------------------------------------------------------
@register(
    "q198_rfm_segments",
    """
    WITH horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    rfm AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
      FROM orders CROSS JOIN horizon
      GROUP BY o_custkey, maxd
    ),
    scored AS (
      SELECT custkey, recency_days, n_orders, monetary,
             NTILE(5) OVER (ORDER BY recency_days, custkey) AS r_q,
             NTILE(5) OVER (ORDER BY n_orders DESC, custkey) AS f_q,
             NTILE(5) OVER (ORDER BY monetary DESC, custkey) AS m_q
      FROM rfm
    )
    SELECT custkey, CAST(recency_days AS INT) AS recency_days, n_orders,
           ROUND(monetary, 4) AS monetary,
           CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CASE
             WHEN r_q = 1 AND f_q <= 2 THEN 'champion'
             WHEN f_q <= 2 THEN 'loyal'
             WHEN r_q = 1 AND f_q >= 4 THEN 'new'
             WHEN r_q >= 4 AND f_q >= 4 THEN 'hibernating'
             WHEN r_q >= 4 THEN 'at_risk'
             ELSE 'regular'
           END AS segment
    FROM scored
    """,
    doc="RFM segmentation over orders: per-customer recency (integer "
    "days vs the corpus max date — one broadcast one-row horizon), "
    "frequency, and decimal-exact monetary value, cut into quintiles "
    "by NTILE under (metric, custkey) total orders, then the standard "
    "champion/loyal/new/at-risk/hibernating labeling. One orders "
    "shuffle on custkey; the three NTILEs share one customer-sized "
    "sort each — at 100 TB the quintile boundaries come from the q83 "
    "two-phase rank instead of a global NTILE, same cut points",
)
def q198_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    rfm = (
        o.crossJoin(F.broadcast(horizon))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.datediff(F.max("maxd"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .drop("maxd")
    )
    scored = rfm.select(
        "custkey",
        "recency_days",
        "n_orders",
        "monetary",
        F.ntile(5).over(W.orderBy("recency_days", "custkey")).alias("r_q"),
        F.ntile(5)
        .over(W.orderBy(F.col("n_orders").desc(), "custkey"))
        .alias("f_q"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary").desc(), "custkey"))
        .alias("m_q"),
    )
    seg = (
        F.when((F.col("r_q") == 1) & (F.col("f_q") <= 2), "champion")
        .when(F.col("f_q") <= 2, "loyal")
        .when((F.col("r_q") == 1) & (F.col("f_q") >= 4), "new")
        .when((F.col("r_q") >= 4) & (F.col("f_q") >= 4), "hibernating")
        .when(F.col("r_q") >= 4, "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "custkey",
        F.col("recency_days").cast("int").alias("recency_days"),
        "n_orders",
        F.round("monetary", 4).alias("monetary"),
        F.col("r_q").cast("int").alias("r_q"),
        F.col("f_q").cast("int").alias("f_q"),
        F.col("m_q").cast("int").alias("m_q"),
        seg.alias("segment"),
    )


# ---------------------------------------------------------------------------
# q199 — top behavioral paths: the most common 3-step event sequences
# per user (the "what do users actually do" path-analysis view that
# complements q193's one-step transition matrix and q74's fixed-target
# funnel) — two LAG windows, one trigram aggregate, total-order top-k
# ---------------------------------------------------------------------------
@register(
    "q199_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type AS t3,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t2,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t1
      FROM events
    ),
    tri AS (
      SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE t1 IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tri)
    SELECT path, n, n_users, ROUND(CAST(n AS DOUBLE) / total, 6) AS share
    FROM tri CROSS JOIN tot
    ORDER BY n DESC, path LIMIT 20
    """,
    doc="top-20 three-step user paths: trigrams of each user's event "
    "sequence under the (ts, event_id) total order (two LAGs share one "
    "window sort), aggregated with distinct-user support and share of "
    "all trigrams, top-k under (count desc, path) total order. One "
    "user-keyed window pass, one |types|^3-bounded aggregate, "
    "TakeOrderedAndProject for the limit",
)
def q199_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    # tri feeds two consumers with different projections (the share
    # denominator prunes n_users), so without a pin the corpus window
    # pass runs twice — the q75/q90 lesson
    tri = pin(
        seq.groupBy(F.concat_ws(" > ", "t1", "t2", "t3").alias("path")).agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
    )
    tot = tri.agg(F.sum("n").cast("long").alias("total"))
    return (
        tri.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            "n_users",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q200 — co-movement matrix: Pearson correlation of daily volumes
# between every event-type pair (do errors spike with purchases?) on a
# shared gap-filled day axis. Every moment sum is an exact BIGINT (the
# inputs are integer counts), and the final correlation is one double
# expression whose only rounding ops (cast, sqrt, divide) are IEEE
# correctly-rounded — bit-identical cross-engine with no libm exposure
# ---------------------------------------------------------------------------
@register(
    "q200_volume_correlation",
    """
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
      SELECT t.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM types t CROSS JOIN axis a
      LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = a.day
    ),
    pairs AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(x.n) AS BIGINT) AS sx, CAST(SUM(y.n) AS BIGINT) AS sy,
             CAST(SUM(x.n * y.n) AS BIGINT) AS sxy,
             CAST(SUM(x.n * x.n) AS BIGINT) AS sxx,
             CAST(SUM(y.n * y.n) AS BIGINT) AS syy
      FROM filled x JOIN filled y
        ON x.day = y.day AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(nd AS INT) AS n_days,
           ROUND(CAST(nd * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(nd * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(nd * syy - sy * sy AS DOUBLE))), 6) AS corr
    FROM pairs ORDER BY type_a, type_b
    """,
    doc="daily-volume correlation matrix across event types: counts on "
    "a shared gap-filled day axis (a type silent on a day is 0, not "
    "absent — dropping those days would bias every correlation toward "
    "+1), all five moment sums exact BIGINTs, Pearson r as one "
    "cast/sqrt/divide chain (IEEE correctly-rounded ops only). One "
    "events scan + one day aggregate; the pair join runs on the "
    "|types| x |days| bounded series, never on raw events",
)
def q200_volume_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .select("event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n"))
    )
    x = filled.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("xn")
    )
    y = filled.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("yn")
    )
    pairs = (
        x.join(y, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("long").alias("nd"),
            F.sum("xn").cast("long").alias("sx"),
            F.sum("yn").cast("long").alias("sy"),
            F.sum(F.col("xn") * F.col("yn")).cast("long").alias("sxy"),
            F.sum(F.col("xn") * F.col("xn")).cast("long").alias("sxx"),
            F.sum(F.col("yn") * F.col("yn")).cast("long").alias("syy"),
        )
    )
    nd, sx, sy = F.col("nd"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return pairs.select(
        "type_a",
        "type_b",
        nd.cast("int").alias("n_days"),
        F.round(
            (nd * sxy - sx * sy).cast("double")
            / (
                F.sqrt((nd * sxx - sx * sx).cast("double"))
                * F.sqrt((nd * syy - sy * sy).cast("double"))
            ),
            6,
        ).alias("corr"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# q201 — Holt-Winters additive seasonal smoothing (period 7): the
# forecasting-family completion (q172 level, q176 level+trend, now
# level+trend+weekly seasonality). All smoothing constants are dyadic
# (1/4, 1/8), so the multiply-add chains are exact-identical IEEE;
# the oracle replays the TRIPLE coupled recursion (the struct_pack
# in-place trick cannot express it) as a recursive CTE carrying the
# seasonal state as a LIST column
# ---------------------------------------------------------------------------
@register(
    "q201_holt_winters",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
      HAVING COUNT(*) >= 8
    ),
    init AS (
      SELECT event_type, xs,
             ((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7])
               / 7e0 AS lvl0
      FROM series
    ),
    hw AS (
      SELECT event_type, xs, 7 AS i, lvl0 AS level, 0e0 AS trend, 0e0 AS err,
             [xs[j] - lvl0 FOR j IN generate_series(1, 7)] AS seas
      FROM init
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
               + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
                         + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend + seas[(i % 7) + 1])),
             list_transform(seas, (s, j) -> CASE WHEN j = (i % 7) + 1
               THEN 0.25e0 * (xs[i+1]
                              - (0.25e0 * (xs[i+1] - seas[(i % 7) + 1])
                                 + 0.75e0 * (level + trend)))
                    + 0.75e0 * s
               ELSE s END)
      FROM hw WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND(level + trend + seas[(len(xs) % 7) + 1], 6) AS forecast_next,
           ROUND(list_aggregate(seas, 'max') - list_aggregate(seas, 'min'), 6)
             AS season_spread,
           ROUND(err / (len(xs) - 7), 6) AS mae_1step
    FROM hw WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt-Winters additive smoothing with weekly seasonality over "
    "per-type daily counts: level/trend/seasonal states initialized "
    "from the first week (level = first-week mean in one fixed "
    "left-associated chain, seasonal = deviations from it), then the "
    "triple coupled recursion folded strictly in day order with dyadic "
    "alpha=gamma=1/4, beta=1/8 — one-step forecast errors scored along "
    "the fold, next-day forecast = level + trend + the next slot's "
    "seasonal, plus the seasonal amplitude (spread). Corpus work is one "
    "day aggregate; the fold is O(days). Types with under 8 days drop "
    "(no week to initialize from) — deterministic on both engines",
)
def q201_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "n"))),
                lambda s: s["n"].cast("double"),
            ).alias("xs")
        )
        .filter(F.size("xs") >= 8)
    )
    x = [F.element_at("xs", j) for j in range(1, 8)]
    lvl0 = (
        ((((((x[0] + x[1]) + x[2]) + x[3]) + x[4]) + x[5]) + x[6]) / 7.0
    )
    seas0 = F.transform(F.slice("xs", 1, 7), lambda s: s - lvl0)
    init = F.struct(
        lvl0.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
        seas0.alias("seas"),
    )
    days = F.transform(
        F.sequence(F.lit(8), F.size("xs")),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("xs"), i.cast("int")).alias("x")
        ),
    )

    def step(a, b):
        slot1 = ((b["i"] - 1) % 7 + 1).cast("int")  # 1-based seasonal slot
        sv = F.element_at(a["seas"], slot1)
        new_level = 0.25 * (b["x"] - sv) + 0.75 * (a["level"] + a["trend"])
        new_trend = 0.125 * (new_level - a["level"]) + 0.875 * a["trend"]
        new_err = a["err"] + F.abs(b["x"] - (a["level"] + a["trend"] + sv))
        new_seas = F.transform(
            a["seas"],
            lambda s, j: F.when(
                j == (b["i"] - 1) % 7,  # Spark transform index is 0-based
                0.25 * (b["x"] - new_level) + 0.75 * s,
            ).otherwise(s),
        )
        return F.struct(
            new_level.alias("level"),
            new_trend.alias("trend"),
            new_err.alias("err"),
            new_seas.alias("seas"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(days, init, step).alias("r"),
    )
    r = F.col("r")
    return folded.select(
        "event_type",
        "n_days",
        F.round(r["level"], 6).alias("level"),
        F.round(r["trend"], 6).alias("trend"),
        F.round(
            r["level"]
            + r["trend"]
            + F.element_at(r["seas"], (F.col("n_days") % 7 + 1).cast("int")),
            6,
        ).alias("forecast_next"),
        F.round(F.array_max(r["seas"]) - F.array_min(r["seas"]), 6).alias(
            "season_spread"
        ),
        F.round(r["err"] / (F.col("n_days") - 7), 6).alias("mae_1step"),
    ).orderBy("event_type")


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
# q204 — experiment readout: the end-to-end A/B analysis every product
# team runs — deterministic hash assignment (the q57 split machinery),
# per-variant click->purchase conversion, and the two-proportion z-test
# verdict (q157's arithmetic) in one declarative plan
# ---------------------------------------------------------------------------
def _experiment_sql() -> str:
    b = _hash_bucket_duck("user_id", 2)
    return f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN {b} = 0 THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM events GROUP BY 1, 2
    ),
    v AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(clicked) AS BIGINT) AS n_clicked,
             CAST(SUM(CASE WHEN clicked = 1 AND purchased = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
      FROM assigned GROUP BY 1
    ),
    w AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n_users END) AS users_a,
        MAX(CASE WHEN variant = 'A' THEN n_clicked END) AS clicked_a,
        MAX(CASE WHEN variant = 'A' THEN n_converted END) AS converted_a,
        MAX(CASE WHEN variant = 'B' THEN n_users END) AS users_b,
        MAX(CASE WHEN variant = 'B' THEN n_clicked END) AS clicked_b,
        MAX(CASE WHEN variant = 'B' THEN n_converted END) AS converted_b
      FROM v
    )
    SELECT users_a, clicked_a, converted_a, users_b, clicked_b, converted_b,
           ROUND(CAST(converted_a AS DOUBLE) / clicked_a, 6) AS rate_a,
           ROUND(CAST(converted_b AS DOUBLE) / clicked_b, 6) AS rate_b,
           -- a pooled rate of exactly 0 or 1 has zero variance: no test
           CASE WHEN converted_a + converted_b > 0
                 AND converted_a + converted_b < clicked_a + clicked_b
                THEN ROUND((CAST(converted_a AS DOUBLE) / clicked_a
                            - CAST(converted_b AS DOUBLE) / clicked_b)
                     / sqrt((CAST(converted_a + converted_b AS DOUBLE)
                             / (clicked_a + clicked_b))
                            * (1e0 - CAST(converted_a + converted_b AS DOUBLE)
                                     / (clicked_a + clicked_b))
                            * (1e0 / clicked_a + 1e0 / clicked_b)), 6)
           END AS z,
           CASE WHEN converted_a + converted_b > 0
                 AND converted_a + converted_b < clicked_a + clicked_b
                THEN CAST(ABS((CAST(converted_a AS DOUBLE) / clicked_a
                          - CAST(converted_b AS DOUBLE) / clicked_b)
                         / sqrt((CAST(converted_a + converted_b AS DOUBLE)
                                 / (clicked_a + clicked_b))
                                * (1e0 - CAST(converted_a + converted_b AS DOUBLE)
                                         / (clicked_a + clicked_b))
                                * (1e0 / clicked_a + 1e0 / clicked_b))) > 1.96e0
                     AS INT)
                ELSE 0 END AS significant_05
    FROM w
    """


@register(
    "q204_experiment_readout",
    _experiment_sql(),
    doc="A/B experiment readout in one plan: users assigned to variants "
    "by the deterministic md5 bucket (the q57 split — assignment "
    "reproducible across engines and reruns), per-variant click->"
    "purchase conversion among clickers, and the pooled two-proportion "
    "z-test with the alpha=0.05 verdict (q157's IEEE sqrt/divide "
    "chain). One user-keyed aggregate + one 2-row pivot — at 100 TB "
    "the only shuffle is the per-user collapse, which AQE coalesces",
)
def q204_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    assigned = e.groupBy(
        "user_id",
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "A")
        .otherwise("B")
        .alias("variant"),
    ).agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("clicked"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("purchased"),
    )
    v = assigned.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("clicked").cast("long").alias("n_clicked"),
        F.sum(((F.col("clicked") == 1) & (F.col("purchased") == 1)).cast("int"))
        .cast("long")
        .alias("n_converted"),
    )
    w = v.agg(
        *[
            F.max(F.when(F.col("variant") == var, F.col(c))).alias(
                f"{out}_{var.lower()}"
            )
            for var in ("A", "B")
            for c, out in [
                ("n_users", "users"),
                ("n_clicked", "clicked"),
                ("n_converted", "converted"),
            ]
        ]
    )
    ca, cb = F.col("converted_a").cast("double"), F.col("converted_b").cast("double")
    ka, kb = F.col("clicked_a"), F.col("clicked_b")
    rate_a, rate_b = ca / ka, cb / kb
    pool = (ca + cb) / (ka + kb)
    # a pooled rate of exactly 0 or 1 has zero variance: no test
    nondegenerate = (
        (F.col("converted_a") + F.col("converted_b") > 0)
        & (F.col("converted_a") + F.col("converted_b") < ka + kb)
    )
    z = F.when(
        nondegenerate,
        (rate_a - rate_b)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / ka + 1.0 / kb)),
    )
    return w.select(
        "users_a",
        "clicked_a",
        "converted_a",
        "users_b",
        "clicked_b",
        "converted_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
        F.coalesce((F.abs(z) > 1.96).cast("int"), F.lit(0)).alias(
            "significant_05"
        ),
    )


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
    tf = pin(
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
# q206 — effective token budget: the number every pretraining plan
# actually needs — per-source tokens BEFORE and AFTER exact dedup
# (q30's global keeper rule), with the duplication inflation factor.
# The raw token count overstates a crawl's worth; this is the data
# card's "how much unique signal is really here" line
# ---------------------------------------------------------------------------
@register(
    "q206_effective_tokens",
    r"""
    WITH t AS (
      SELECT doc_id, source, md5(text) AS fp,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM t GROUP BY fp)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_tokens ELSE 0 END)
                AS BIGINT) AS effective_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / SUM(CASE WHEN k.doc_id IS NOT NULL THEN n_tokens
                            ELSE 0 END), 6) AS inflation
    FROM t LEFT JOIN keepers k ON k.doc_id = t.doc_id
    GROUP BY source ORDER BY source
    """,
    doc="per-source effective token budget after exact dedup: q30's "
    "global keeper rule (MIN doc_id per content fingerprint — a "
    "duplicate spanning sources credits only the keeper's source), "
    "raw vs effective token sums, and the inflation factor raw/"
    "effective. One scan computes fingerprints and token counts, one "
    "fp aggregate picks keepers, one semi-join-shaped left join marks "
    "them — all counters map-side combined. The inflation column is "
    "what turns a '2T tokens crawled' claim into the number the "
    "training-compute plan can use",
)
def q206_effective_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    t = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("fp"),
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+", -1), lambda x: x != F.lit(""))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    keepers = t.groupBy("fp").agg(F.min("doc_id").alias("kid"))
    marked = t.join(
        keepers, t["doc_id"] == keepers["kid"], "left"
    )
    kept = F.col("kid").isNotNull()
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("raw_tokens"),
            F.sum(kept.cast("long")).cast("long").alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("effective_tokens"),
        )
        .withColumn(
            "inflation",
            F.round(
                F.col("raw_tokens").cast("double") / F.col("effective_tokens"), 6
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q207 — cross-table AS-OF enrichment: every order annotated with the
# customer's most recent event STRICTLY before the order timestamp —
# the feature-engineering join (behavioral recency at decision time)
# done with the q18/q188 union+window rewrite instead of a per-row
# subquery: one shuffle on the user key, one ordered window pass
# ---------------------------------------------------------------------------
@register(
    "q207_order_asof_enrichment",
    """
    WITH u AS (
      SELECT user_id AS k, ts, 1 AS kind, event_type, event_id,
             CAST(NULL AS BIGINT) AS okey
      FROM events
      UNION ALL
      SELECT o_custkey, o_orderdate, 0, CAST(NULL AS VARCHAR),
             CAST(NULL AS BIGINT), o_orderkey
      FROM orders
    ),
    w AS (
      SELECT k, ts, kind, okey,
             last_value(event_type IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY ts, kind, COALESCE(event_id, okey)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type,
             last_value(CASE WHEN kind = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER
               (PARTITION BY k ORDER BY ts, kind, COALESCE(event_id, okey)
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_us
      FROM u
    )
    SELECT okey AS o_orderkey, k AS custkey,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS order_ts,
           last_type,
           CAST(CASE WHEN last_us IS NOT NULL
                     THEN (epoch_us(ts) - last_us) // 60000000 END AS BIGINT)
             AS gap_minutes
    FROM w WHERE kind = 0
    """,
    doc="as-of join ACROSS tables (orders x events on the shared user "
    "key): each order picks up the type and integer-minute recency of "
    "the customer's latest strictly-earlier event via the union+window "
    "rewrite — order rows sort BEFORE events at equal timestamps "
    "(kind 0 < 1), so same-instant events are excluded by "
    "construction, and last_value IGNORE NULLS carries the event "
    "state forward. One exchange on the user key, one window pass, "
    "no per-row subquery and no range join — the q18 discipline "
    "generalized to two tables. Customers with no prior events get "
    "NULLs (left-join semantics for free)",
)
def q207_order_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    u = e.select(
        F.col("user_id").alias("k"),
        "ts",
        F.lit(1).alias("kind"),
        "event_type",
        "event_id",
        F.lit(None).cast("long").alias("okey"),
    ).unionAll(
        o.select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("ts"),
            F.lit(0).alias("kind"),
            F.lit(None).cast("string").alias("event_type"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("o_orderkey").alias("okey"),
        )
    )
    win = (
        W.partitionBy("k")
        .orderBy("ts", "kind", F.coalesce("event_id", "okey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w = u.select(
        "k",
        "ts",
        "kind",
        "okey",
        F.last("event_type", ignorenulls=True).over(win).alias("last_type"),
        F.last(
            F.when(F.col("kind") == 1, F.unix_micros(F.col("ts").cast("timestamp"))),
            ignorenulls=True,
        )
        .over(win)
        .alias("last_us"),
    )
    return w.filter(F.col("kind") == 0).select(
        F.col("okey").alias("o_orderkey"),
        F.col("k").alias("custkey"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        "last_type",
        F.when(
            F.col("last_us").isNotNull(),
            F.expr(
                "(unix_micros(cast(ts as timestamp)) - last_us) div 60000000"
            ),
        )
        .cast("long")
        .alias("gap_minutes"),
    )


# ---------------------------------------------------------------------------
# q208 — tokenizer bake-off: the q113/q116 BPE family and the q163/q169
# unigram family trained exactly as their own queries train them, then
# compared head-to-head on the common word domain — weighted fertility,
# segmentation agreement, and piece-inventory overlap. The decision
# artifact a tokenizer selection actually needs, and the first query to
# run BOTH induction chains in one plan
# ---------------------------------------------------------------------------
def _bakeoff_sql() -> str:
    import re as _re

    uni = _unigram_chain_ctes()
    # the BPE chain's `toks` is identical to the unigram chain's (reuse
    # it); its `words` differs (no length cap) — namespace it to bwords
    bpe = [
        _re.sub(r"\bwords\b", "bwords", c) for c in _bpe_chain_ctes(_BPE_ITERS)[1:]
    ]
    ctes = uni + bpe
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    j AS (
      SELECT u.w, u.wc, b.seq, u.ps
      FROM bt{_UNI_MAXW} u JOIN s{_BPE_ITERS} b ON b.w = u.w
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common_words,
             CAST(SUM(wc) AS BIGINT) AS total_wc,
             CAST(SUM(wc * len(string_split(seq, ' '))) AS BIGINT) AS bt,
             CAST(SUM(wc * len(ps)) AS BIGINT) AS ut,
             CAST(SUM(CASE WHEN len(string_split(seq, ' ')) = len(ps)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_same_len,
             CAST(SUM(CASE WHEN seq = array_to_string(ps, ' ')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_same_seg
      FROM j
    ),
    pb AS (SELECT DISTINCT unnest(string_split(seq, ' ')) AS p FROM j),
    pu AS (SELECT DISTINCT unnest(ps) AS p FROM j),
    pc AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pb) AS n_bpe_pieces,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM pu) AS n_uni_pieces,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM pb JOIN pu USING (p)) AS n_shared_pieces
    )
    SELECT n_common_words, total_wc,
           ROUND(CAST(bt AS DOUBLE) / total_wc, 6) AS bpe_fertility,
           ROUND(CAST(ut AS DOUBLE) / total_wc, 6) AS uni_fertility,
           n_same_len, n_same_seg,
           n_bpe_pieces, n_uni_pieces, n_shared_pieces
    FROM m CROSS JOIN pc
    """


@register(
    "q208_tokenizer_bakeoff",
    _bakeoff_sql(),
    doc="tokenizer bake-off on the common word domain (lowercase alpha "
    "<= 10 chars): the BPE merge chain (trained on its own uncapped "
    "word census, bit-identical to q113/q116) and the unigram Viterbi "
    "chain (bit-identical to q163/q169) segment the same words; the "
    "report compares frequency-weighted fertility, how often the two "
    "families agree on piece COUNT and on the exact segmentation, and "
    "the used-piece inventory overlap. Both vocab pipelines run over "
    "the word census (corpus touched once for the shared token "
    "explode); the comparison join and piece aggregates are vocab-"
    "sized. One row out",
)
def q208_tokenizer_bakeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1), lambda t: t != ""
    )
    wt = d.select(F.explode(toks).alias("t")).filter(F.col("t").rlike("^[a-z]+$"))
    words = pin(
        wt.groupBy(F.col("t").alias("w")).agg(F.count("*").cast("long").alias("wc"))
    )
    bseg = tk.bpe_segment_vocab(words, "w", "wc", iters=_BPE_ITERS, persist_fn=pin)
    useg = tk.unigram_segment_vocab(
        words.filter(F.length("w") <= _UNI_MAXW),
        "w",
        "wc",
        max_piece=_UNI_MAXP,
        vocab_size=_UNI_VOCAB,
        persist_fn=pin,
    )
    j = pin(
        useg.select("w", "wc", "ps").join(bseg.select("w", "seq"), "w")
    )
    bl = F.size(F.split(F.col("seq"), " ", -1))
    ul = F.size("ps")
    m = j.agg(
        F.count("*").cast("long").alias("n_common_words"),
        F.sum("wc").cast("long").alias("total_wc"),
        F.sum(F.col("wc") * bl).cast("long").alias("bt"),
        F.sum(F.col("wc") * ul).cast("long").alias("ut"),
        F.sum((bl == ul).cast("int")).cast("long").alias("n_same_len"),
        F.sum((F.col("seq") == F.array_join("ps", " ")).cast("int"))
        .cast("long")
        .alias("n_same_seg"),
    )
    pb = j.select(F.explode(F.split("seq", " ", -1)).alias("p")).distinct()
    pu = j.select(F.explode("ps").alias("p")).distinct()
    pc = (
        pb.agg(F.count("*").cast("long").alias("n_bpe_pieces"))
        .crossJoin(F.broadcast(pu.agg(F.count("*").cast("long").alias("n_uni_pieces"))))
        .crossJoin(
            F.broadcast(
                pb.join(pu, "p").agg(
                    F.count("*").cast("long").alias("n_shared_pieces")
                )
            )
        )
    )
    return m.crossJoin(F.broadcast(pc)).select(
        "n_common_words",
        "total_wc",
        F.round(F.col("bt").cast("double") / F.col("total_wc"), 6).alias(
            "bpe_fertility"
        ),
        F.round(F.col("ut").cast("double") / F.col("total_wc"), 6).alias(
            "uni_fertility"
        ),
        "n_same_len",
        "n_same_seg",
        "n_bpe_pieces",
        "n_uni_pieces",
        "n_shared_pieces",
    )


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
# q210 — discount elasticity per brand: grouped OLS of quantity on
# discount over the lineitem facts — the classic "does discounting
# move volume" BI regression. Discounts are two-decimal and quantities
# integral, so every moment sum is EXACT in DECIMAL (no ln, no
# quantization loss — unlike q196's log-log fit); only the final
# closed-form slope touches doubles
# ---------------------------------------------------------------------------
@register(
    "q210_discount_elasticity",
    """
    WITH t AS (
      SELECT p.p_brand AS brand,
             CAST(l.l_discount AS DECIMAL(8,2)) AS x,
             CAST(l.l_quantity AS DECIMAL(8,2)) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    agg AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM t GROUP BY 1
    )
    SELECT brand, n,
           ROUND(sy / n, 6) AS mean_qty,
           ROUND(sx / n, 6) AS mean_discount,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
             AS intercept,
           ROUND(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n)
                 / (sy / n), 6) AS elasticity_at_mean
    FROM agg ORDER BY brand
    """,
    doc="grouped OLS of l_quantity on l_discount per part brand: the "
    "dimension join broadcasts, the five moment sums are map-side-"
    "combined DECIMAL aggregates (two-decimal discounts and integral "
    "quantities are exact in decimal — the sums carry NO float error, "
    "so this regression needs none of q196's quantization), and "
    "slope/intercept/point elasticity are one identical double chain. "
    "One fact scan, one brand-keyed exchange of 5 numbers per brand",
)
def q210_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    t = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.col("l_discount").cast("decimal(8,2)").alias("x"),
        F.col("l_quantity").cast("decimal(8,2)").alias("y"),
    )
    agg = t.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "brand",
        "n",
        F.round(sy / n, 6).alias("mean_qty"),
        F.round(sx / n, 6).alias("mean_discount"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(slope * (sx / n) / (sy / n), 6).alias("elasticity_at_mean"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# q211 — context-length planning sweep: for each candidate max_seq_len,
# the padding waste, truncation loss, and utilization of one-doc-per-
# sequence batching, against the concat-packing lower bound (q80's
# rule) — the numbers that decide a training run's sequence length.
# One corpus scan; the config dimension is a 4-element literal explode
# ---------------------------------------------------------------------------
_SEQLEN_CONFIGS = [256, 512, 1024, 2048]


@register(
    "q211_seqlen_sweep",
    rf"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    conf AS (SELECT unnest([{", ".join(str(c) for c in _SEQLEN_CONFIGS)}]) AS cap),
    swept AS (
      SELECT c.cap,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t.n) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN t.n <= c.cap THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fit,
             CAST(SUM(CASE WHEN t.n < c.cap THEN c.cap - t.n ELSE 0 END)
                  AS BIGINT) AS pad_tokens,
             CAST(SUM(CASE WHEN t.n > c.cap THEN t.n - c.cap ELSE 0 END)
                  AS BIGINT) AS truncated_tokens,
             CAST(SUM(CASE WHEN t.n < c.cap THEN t.n ELSE c.cap END) AS BIGINT)
               AS used_tokens
      FROM toks t CROSS JOIN conf c
      GROUP BY 1
    )
    SELECT cap, n_docs, total_tokens, n_fit, pad_tokens, truncated_tokens,
           ROUND(CAST(used_tokens AS DOUBLE) / (CAST(cap AS DOUBLE) * n_docs), 6)
             AS utilization,
           CAST(CAST(CEIL(CAST(total_tokens AS DOUBLE) / cap) AS BIGINT)
                AS BIGINT) AS packed_bins,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(CEIL(CAST(total_tokens AS DOUBLE) / cap) AS BIGINT), 6)
             AS packing_gain
    FROM swept ORDER BY cap
    """,
    doc="context-length sweep over {256,512,1024,2048}: per candidate "
    "cap, how many documents fit whole, the padding tokens burned and "
    "the tail tokens lost by one-doc-per-sequence batching, its "
    "utilization, and the q80 concat-packing bin count "
    "(ceil(total/cap)) with the sequences-saved gain factor — the "
    "planning table that picks a training run's sequence length "
    "before anyone pays for it. All counters exact integers, "
    "map-side combined over one token-count scan crossed with a "
    "4-row literal config table",
)
def q211_seqlen_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    # pinned: projection collapse would otherwise push the tokenize
    # under the config cross join and re-split every text 4x
    toks = pin(
        d.select(F.size(tx.tokens(F.col("text"))).cast("long").alias("n"))
    )
    conf = spark.createDataFrame(
        [(c,) for c in _SEQLEN_CONFIGS], "cap int"
    )
    t, c = F.col("n"), F.col("cap")
    swept = (
        toks.crossJoin(F.broadcast(conf))
        .groupBy("cap")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(t).cast("long").alias("total_tokens"),
            F.sum((t <= c).cast("int")).cast("long").alias("n_fit"),
            F.sum(F.when(t < c, c - t).otherwise(0)).cast("long").alias("pad_tokens"),
            F.sum(F.when(t > c, t - c).otherwise(0))
            .cast("long")
            .alias("truncated_tokens"),
            F.sum(F.when(t < c, t).otherwise(c)).cast("long").alias("used_tokens"),
        )
    )
    bins = F.ceil(F.col("total_tokens").cast("double") / F.col("cap")).cast("long")
    return swept.select(
        "cap",
        "n_docs",
        "total_tokens",
        "n_fit",
        "pad_tokens",
        "truncated_tokens",
        F.round(
            F.col("used_tokens").cast("double")
            / (F.col("cap").cast("double") * F.col("n_docs")),
            6,
        ).alias("utilization"),
        bins.alias("packed_bins"),
        F.round(F.col("n_docs").cast("double") / bins, 6).alias("packing_gain"),
    ).orderBy("cap")


# ---------------------------------------------------------------------------
# q212 — cohort LTV curves: users grouped by entry month, purchase
# revenue accumulated by months-since-entry — the lifetime-value view
# that q73's retention counts lack a money dimension for. Month deltas
# are exact integer arithmetic (y*12+m), revenue sums decimal-exact,
# the cumulative curve one bounded window per cohort
# ---------------------------------------------------------------------------
@register(
    "q212_cohort_ltv",
    """
    WITH entry AS (
      SELECT user_id,
             MIN(CAST(date_part('year', ts) AS BIGINT) * 12
                 + CAST(date_part('month', ts) AS BIGINT)) AS m0
      FROM events GROUP BY 1
    ),
    sizes AS (SELECT m0, CAST(COUNT(*) AS BIGINT) AS n_users FROM entry GROUP BY 1),
    rev AS (
      SELECT e.m0,
             CAST(date_part('year', p.ts) AS BIGINT) * 12
               + CAST(date_part('month', p.ts) AS BIGINT) - e.m0 AS k,
             CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS revenue
      FROM events p JOIN entry e USING (user_id)
      WHERE p.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    curve AS (
      SELECT m0, k, revenue,
             SUM(revenue) OVER (PARTITION BY m0 ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    )
    SELECT CAST(m0 // 12 AS INT) AS cohort_year,
           CAST(m0 % 12 + 1 AS INT) AS cohort_month,
           CAST(k AS INT) AS months_since,
           s.n_users,
           ROUND(CAST(revenue AS DOUBLE), 4) AS revenue,
           ROUND(CAST(cum AS DOUBLE), 4) AS cum_revenue,
           ROUND(CAST(cum AS DOUBLE) / s.n_users, 6) AS ltv_per_user
    FROM curve JOIN sizes s USING (m0)
    ORDER BY m0, k
    """,
    doc="cohort lifetime-value accumulation: entry month per user (an "
    "exact y*12+m integer, no interval arithmetic to disagree on), "
    "purchase revenue per (cohort, months-since) in decimal-exact "
    "sums, cumulated by one window over the bounded month axis, and "
    "normalized per cohort user. Note month-0 is the acquisition "
    "month. Corpus pays one user aggregate + one revenue aggregate; "
    "the curve runs on |cohorts| x |months| rows",
)
def q212_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    mexpr = (F.year("ts").cast("long") * 12 + F.month("ts").cast("long"))
    entry = e.groupBy("user_id").agg(F.min(mexpr).alias("m0"))
    sizes = entry.groupBy("m0").agg(F.count("*").cast("long").alias("n_users"))
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(entry, "user_id")
        .groupBy("m0", (mexpr - F.col("m0")).alias("k"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .alias("revenue")
        )
    )
    curve = rev.select(
        "m0",
        "k",
        "revenue",
        F.sum("revenue")
        .over(W.partitionBy("m0").orderBy("k").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    )
    return (
        curve.join(sizes, "m0")
        .select(
            F.expr("m0 div 12").cast("int").alias("cohort_year"),
            (F.col("m0") % 12 + 1).cast("int").alias("cohort_month"),
            F.col("k").cast("int").alias("months_since"),
            "n_users",
            F.round(F.col("revenue").cast("double"), 4).alias("revenue"),
            F.round(F.col("cum").cast("double"), 4).alias("cum_revenue"),
            F.round(F.col("cum").cast("double") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
        .orderBy("cohort_year", "cohort_month", "months_since")
    )


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
# q215 — inter-arrival burstiness per event type: per-user gaps between
# consecutive same-type events, their exact integer moments, and the
# Gamma method-of-moments fit (shape < 1 = bursty, > 1 = regular) —
# the renewal-process view that complements q209's first-passage curve
# ---------------------------------------------------------------------------
@register(
    "q215_interarrival_gamma",
    """
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id))) // 60000000 AS x
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM gaps WHERE x IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n,
           ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_minutes,
           ROUND((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 / (CAST(n AS DOUBLE) * (n - 1)), 6) AS var_minutes,
           ROUND((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                 / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    / (CAST(n AS DOUBLE) * (n - 1))), 6) AS gamma_shape,
           ROUND(((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 / (CAST(sx AS DOUBLE) / n), 6) AS gamma_scale,
           CAST((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                / (CAST(n AS DOUBLE) * (n - 1))
                > (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                AS INT) AS bursty
    FROM m WHERE n > 1 ORDER BY event_type
    """,
    doc="renewal statistics per event type: integer-minute inter-"
    "arrival gaps per (user, type) from one LAG window, exact BIGINT "
    "first/second moments, then the Gamma method-of-moments fit "
    "(shape = mean^2/var, scale = var/mean) and the burstiness "
    "verdict (var > mean^2 i.e. CV > 1 — shape < 1, clumped arrivals; "
    "an exponential process has shape exactly 1). One window pass "
    "sharing the (user, type) exchange, one map-side-combined moment "
    "aggregate, |types| rows out",
)
def q215_interarrival_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g0 = e.select("event_type", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    gaps = g0.select(
        "event_type",
        F.when(
            F.col("prev_us").isNotNull(),
            F.expr("(us - prev_us) div 60000000"),
        ).alias("x"),
    )
    m = (
        gaps.filter(F.col("x").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        .filter(F.col("n") > 1)
    )
    n = F.col("n")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    mean = sxd / n
    var = (n * sxxd - sxd * F.col("sx")) / (n.cast("double") * (n - 1))
    return m.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_minutes"),
        F.round(var, 6).alias("var_minutes"),
        F.round(mean * mean / var, 6).alias("gamma_shape"),
        F.round(var / mean, 6).alias("gamma_scale"),
        (var > mean * mean).cast("int").alias("bursty"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q216 — autocorrelation of daily volumes (lags 1..7): the "is there
# weekly structure / how persistent are shocks" diagnostic that picks
# between q172/q176/q201's smoothers. Deviations are scaled by n_days
# so every cross-product sum is an exact BIGINT on both engines; only
# the final ratio is a double
# ---------------------------------------------------------------------------
_ACF_MAX_LAG = 7


@register(
    "q216_volume_acf",
    f"""
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
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY a.event_type ORDER BY a.day)
                  AS BIGINT) AS i
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM filled GROUP BY 1
    ),
    dev AS (
      SELECT f.event_type, f.i, f.n * t.nd - t.s AS d, t.nd
      FROM filled f JOIN tot t USING (event_type)
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    num AS (
      SELECT a.event_type, l.lag,
             CAST(SUM(a.d * b.d) AS BIGINT) AS num
      FROM dev a
      JOIN lags l ON TRUE
      JOIN dev b ON b.event_type = a.event_type AND b.i = a.i + l.lag
      GROUP BY 1, 2
    ),
    den AS (
      SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS den, MAX(nd) AS nd
      FROM dev GROUP BY 1
    )
    SELECT n.event_type, CAST(n.lag AS INT) AS lag, CAST(d.nd AS INT) AS n_days,
           ROUND(CAST(n.num AS DOUBLE) / d.den, 6) AS acf
    FROM num n JOIN den d USING (event_type)
    ORDER BY n.event_type, n.lag
    """,
    doc="sample autocorrelation of per-type daily counts at lags 1-7 "
    "on the gap-filled day axis: deviations scaled by n_days "
    "(n_t*N - S, exact BIGINTs — no float mean to disagree on), "
    "lagged cross-products summed exactly via a self-join on the "
    "bounded day index, normalized by the lag-0 sum of squares (the "
    "standard biased ACF estimator). A near-1 lag-7 value is the "
    "weekly-seasonality trigger for q201. All iteration-free: one "
    "events scan, then |types| x |days| x 7 bounded work",
)
def q216_volume_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

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
    filled = (
        axis.join(daily, ["event_type", "day"], "left")
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
    dev = pin(
        filled.join(tot, "event_type").select(
            "event_type",
            "i",
            (F.col("n") * F.col("nd") - F.col("s")).alias("d"),
            "nd",
        )
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = dev.select("event_type", "i", F.col("d").alias("da"))
    b = dev.select(
        F.col("event_type").alias("et2"), F.col("i").alias("i2"), F.col("d").alias("db")
    )
    num = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("i2") == F.col("i") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(F.sum(F.col("da") * F.col("db")).cast("long").alias("num"))
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("long").alias("den"),
        F.max("nd").alias("nd"),
    )
    return (
        num.join(den, "event_type")
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("nd").cast("int").alias("n_days"),
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


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
# q218 — fulfillment SLA trends: ship-delay percentiles and on-time
# rate per order month — the supply-chain counterpart of q197's value
# bands. Delays are exact integer days; percentiles interpolate at
# binary fractions; the month axis bounds every group
# ---------------------------------------------------------------------------
@register(
    "q218_fulfillment_sla",
    """
    WITH d AS (
      SELECT strftime(time_bucket(INTERVAL '1 month', o.o_orderdate), '%Y-%m')
               AS order_month,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT order_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           quantile_cont(delay_days, 0.5e0) AS p50_delay,
           quantile_cont(delay_days, 0.75e0) AS p75_delay,
           quantile_cont(delay_days, 0.9375e0) AS p94_delay,
           CAST(MAX(delay_days) AS INT) AS max_delay,
           ROUND(CAST(SUM(CASE WHEN delay_days <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS on_time_30d
    FROM d GROUP BY order_month ORDER BY order_month
    """,
    doc="order-to-ship SLA per order month: integer-day delays "
    "(order date to each lineitem's ship date), exact interpolated "
    "delay percentiles at binary fractions (0.5/0.75/15/16), the max, "
    "and the 30-day on-time rate. The orderkey join is the only "
    "corpus exchange (fact-to-fact — sort-merge at scale, exactly as "
    "TPC-H plans it); the month axis bounds the output. The dashboard "
    "that catches a fulfillment regression the week it starts",
)
def q218_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "order_month"
        ),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    return (
        d.groupBy("order_month")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.percentile("delay_days", F.lit(0.5)).alias("p50_delay"),
            F.percentile("delay_days", F.lit(0.75)).alias("p75_delay"),
            F.percentile("delay_days", F.lit(0.9375)).alias("p94_delay"),
            F.max("delay_days").cast("int").alias("max_delay"),
            F.round(
                F.sum((F.col("delay_days") <= 30).cast("int")).cast("double")
                / F.count("*"),
                6,
            ).alias("on_time_30d"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# q219 — behavioral diversity profile: per-user Gini-Simpson diversity
# of the event-type mix (1 - sum p_i^2), bucketed into a population
# histogram. The exact-rational alternative to a Shannon-entropy
# profile — no ln anywhere, so the statistic is a pure integer ratio
# ---------------------------------------------------------------------------
@register(
    "q219_behavior_diversity",
    """
    WITH uc AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(COUNT(*) AS INT) AS n_types
      FROM uc GROUP BY 1
    ),
    d AS (
      SELECT user_id, n_types, total,
             1e0 - CAST(s2 AS DOUBLE) / (CAST(total AS DOUBLE) * total)
               AS diversity
      FROM u
    )
    SELECT CAST(FLOOR(diversity * 10e0) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(total) AS BIGINT) AS n_events,
           ROUND(MIN(diversity), 6) AS min_diversity,
           ROUND(MAX(diversity), 6) AS max_diversity,
           ROUND(CAST(SUM(CAST(n_types AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
             AS mean_types
    FROM d GROUP BY 1 ORDER BY 1
    """,
    doc="Gini-Simpson behavioral diversity per user (1 - sum(c_i^2)/"
    "T^2 — the collision-probability complement, exact integer "
    "numerators, no ln), histogrammed into diversity deciles with "
    "user/event mass and mean type breadth per bucket. decile 0 = "
    "single-minded users, 7+ = uniform across all five types (max "
    "diversity 0.8). Two map-side-combined aggregates sharing the "
    "user key; the floor(d*10) bucketing is deterministic because "
    "diversity is an exact double ratio of integers",
)
def q219_behavior_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    u = uc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.count("*").cast("int").alias("n_types"),
    )
    d = u.select(
        "n_types",
        "total",
        (
            1.0
            - F.col("s2").cast("double")
            / (F.col("total").cast("double") * F.col("total"))
        ).alias("diversity"),
    )
    return (
        d.groupBy(F.floor(F.col("diversity") * 10.0).cast("int").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("total").cast("long").alias("n_events"),
            F.round(F.min("diversity"), 6).alias("min_diversity"),
            F.round(F.max("diversity"), 6).alias("max_diversity"),
            F.round(
                F.sum(F.col("n_types").cast("long")).cast("double") / F.count("*"),
                6,
            ).alias("mean_types"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q220 — session entry/exit matrix: where sessions start, where they
# die, and how often they bounce — the web-analytics flow view built
# on q19/q52's 30-minute gap sessionization. One window chain shares
# the user-key sort; the matrix is |types|^2-bounded
# ---------------------------------------------------------------------------
@register(
    "q220_session_entry_exit",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    marked AS (
      SELECT DISTINCT user_id, sess,
             FIRST_VALUE(event_type) OVER w AS entry_type,
             LAST_VALUE(event_type) OVER w AS exit_type,
             COUNT(*) OVER w AS n_events
      FROM s
      WINDOW w AS (PARTITION BY user_id, sess ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS mean_events
    FROM marked GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="session flow matrix: 30-minute gap sessionization (the q19/"
    "q52 rule, same (ts, event_id) total order), each session's entry "
    "and exit event types from one full-frame window, then the "
    "|types|^2 matrix of session counts, single-event bounces, and "
    "mean session depth. The sessionize and mark windows share the "
    "user-key exchange; the distinct collapses to one row per "
    "session before the bounded matrix aggregate",
)
def q220_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    fw = (
        W.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    marked = s.select(
        "user_id",
        "sess",
        F.first("event_type").over(fw).alias("entry_type"),
        F.last("event_type").over(fw).alias("exit_type"),
        F.count("*").over(fw).alias("n_events"),
    ).distinct()
    return (
        marked.groupBy("entry_type", "exit_type")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("int"))
            .cast("long")
            .alias("n_bounces"),
            F.round(
                F.sum("n_events").cast("double") / F.count("*"), 6
            ).alias("mean_events"),
        )
        .orderBy("entry_type", "exit_type")
    )


# ---------------------------------------------------------------------------
# q221 — concurrent-session load curve: how many 30-minute-gap
# sessions are simultaneously open in each hour — q174's +1/-1 sweep
# applied to DERIVED intervals (the q220 sessions), i.e. the capacity-
# planning number a connection-pool or serving tier is sized from
# ---------------------------------------------------------------------------
@register(
    "q221_concurrent_sessions",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    spans AS (
      SELECT user_id, sess,
             time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
             time_bucket(INTERVAL '1 hour',
                         MAX(ts) + INTERVAL '30 minutes') + INTERVAL '1 hour'
               AS h1
      FROM s GROUP BY 1, 2
    ),
    bounds AS (
      SELECT h0 AS hour, 1 AS delta FROM spans
      UNION ALL
      SELECT h1, -1 FROM spans
    ),
    hourly AS (
      SELECT hour, CAST(SUM(delta) AS BIGINT) AS delta,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS starts
      FROM bounds GROUP BY 1
    )
    SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, starts,
           CAST(SUM(delta) OVER (ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS active
    FROM hourly ORDER BY hour
    """,
    doc="hourly concurrent-session curve: sessions from the q19/q52 "
    "30-minute gap rule become [first event hour, last event + 30min "
    "hour] intervals, each contributing +1/-1 boundary deltas, and "
    "ONE running sum over the bounded hour axis yields simultaneous "
    "open sessions — O(sessions + hours) against the O(sessions x "
    "hours) stabbing join a naive plan writes (the q174 rewrite over "
    "derived intervals). Peak `active` is the serving-capacity "
    "number. One user-key window chain + one session aggregate; the "
    "final window runs over hours only",
)
def q221_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = s.groupBy("user_id", "sess").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        (
            F.date_trunc(
                "hour", F.max("ts") + F.expr("interval 30 minutes")
            )
            + F.expr("interval 1 hour")
        ).alias("h1"),
    )
    bounds = spans.select(F.col("h0").alias("hour"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.col("h1").alias("hour"), F.lit(-1).alias("delta"))
    )
    hourly = bounds.groupBy("hour").agg(
        F.sum("delta").cast("long").alias("delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("starts"),
    )
    return hourly.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "starts",
        F.sum("delta")
        .over(W.orderBy("hour").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("active"),
    ).orderBy("hour")


# ---------------------------------------------------------------------------
# q223 — per-dimension embedding drift monitor: means and second
# moments of every embedding coordinate compared between two
# deterministic pipeline halves (vec_id parity as the batch split) —
# the production check for "did the new embedding/model/preprocessing
# batch shift the space" at coordinate granularity, complementing
# q179's scalar PSI and q180's global isotropy
# ---------------------------------------------------------------------------
_FXP_POW2 = 2**49


@register(
    "q223_embedding_drift",
    f"""
    WITH x AS (
      SELECT vec_id % 2 AS half, i - 1 AS pos,
             CAST(embedding[i] AS DOUBLE) AS xi
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    stats AS (
      SELECT half, pos,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(xi * {_FXP_POW2}.0) AS DECIMAL(38,0)))
                  AS DOUBLE) / COUNT(*) / {_FXP_POW2}.0 AS mean_v,
             CAST(SUM(CAST(xi * xi AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
               AS m2
      FROM x GROUP BY 1, 2
    ),
    w AS (
      SELECT a.pos, a.n AS n0, b.n AS n1,
             a.mean_v AS mean0, b.mean_v AS mean1,
             a.m2 - a.mean_v * a.mean_v AS var0,
             b.m2 - b.mean_v * b.mean_v AS var1
      FROM stats a JOIN stats b ON a.pos = b.pos AND a.half = 0 AND b.half = 1
    )
    SELECT CAST(pos AS INT) AS pos, n0, n1,
           ROUND(mean0, 6) AS mean0, ROUND(mean1, 6) AS mean1,
           ROUND(abs(mean1 - mean0), 6) AS mean_shift,
           ROUND(var0, 6) AS var0, ROUND(var1, 6) AS var1,
           ROUND(var1 / var0, 6) AS var_ratio,
           CAST(abs(mean1 - mean0) > 0.25e0 * sqrt(var0) AS INT) AS drifted
    FROM w ORDER BY pos
    """,
    doc="embedding drift per coordinate between two deterministic "
    "halves of the store (vec_id parity standing in for 'previous "
    "batch vs new batch'): fixed-point 2^49 means (the q39/q180 "
    "machinery — map-side-combined, no per-group arrays), decimal-"
    "quantized second moments, variance ratios, and a drifted flag "
    "when the mean shift exceeds a quarter of the reference sigma. "
    "One posexplode + one (half, dim) aggregate; output is dims-"
    "sized. The monitor that catches a silently retrained encoder "
    "before an ANN index is rebuilt against mixed geometry",
)
def q223_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.functions.vector import fixed_point_mean

    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "xi"),
    )
    stats = x.groupBy("half", "pos").agg(
        F.count("*").cast("long").alias("n"),
        fixed_point_mean(F.col("xi")).alias("mean_v"),
        (
            F.sum((F.col("xi") * F.col("xi")).cast("decimal(28,12)")).cast("double")
            / F.count("*")
        ).alias("m2"),
    )
    a = stats.filter(F.col("half") == 0).select(
        "pos",
        F.col("n").alias("n0"),
        F.col("mean_v").alias("mean0"),
        (F.col("m2") - F.col("mean_v") * F.col("mean_v")).alias("var0"),
    )
    b = stats.filter(F.col("half") == 1).select(
        F.col("pos").alias("pos1"),
        F.col("n").alias("n1"),
        F.col("mean_v").alias("mean1"),
        (F.col("m2") - F.col("mean_v") * F.col("mean_v")).alias("var1"),
    )
    w = a.join(b, a["pos"] == b["pos1"]).drop("pos1")
    return w.select(
        F.col("pos").cast("int").alias("pos"),
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.round(F.abs(F.col("mean1") - F.col("mean0")), 6).alias("mean_shift"),
        F.round("var0", 6).alias("var0"),
        F.round("var1", 6).alias("var1"),
        F.round(F.col("var1") / F.col("var0"), 6).alias("var_ratio"),
        (F.abs(F.col("mean1") - F.col("mean0")) > 0.25 * F.sqrt(F.col("var0")))
        .cast("int")
        .alias("drifted"),
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# q224 — maximal marginal relevance reranking: the diversity-aware
# rerank every RAG retrieval stack bolts onto raw ANN top-k (q36) —
# greedy selection maximizing lambda*relevance - (1-lambda)*max
# similarity to the already-picked set, 5 steps, each replayed as an
# oracle CTE. Closes the retrieval family next to q102's NDCG eval
# ---------------------------------------------------------------------------
_MMR_NQ = 3
_MMR_TOPC = 20
_MMR_K = 5


def _mmr_sql() -> str:
    cos_qc = _duck_cos("q.qv", "e.embedding")
    cos_ab = _duck_cos("ea.embedding", "eb.embedding")
    ctes = [
        f"q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {_MMR_NQ})",
        f"""c AS (
      SELECT qid, cid, r FROM (
        SELECT q.qid, e.vec_id AS cid, {cos_qc} AS r,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {cos_qc} DESC, e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id >= {_MMR_NQ}
      ) WHERE rn <= {_MMR_TOPC}
    )""",
        f"""ps AS (
      SELECT a.qid, a.cid AS ca, b.cid AS cb, {cos_ab} AS s
      FROM c a JOIN c b ON a.qid = b.qid AND a.cid <> b.cid
      JOIN embeddings ea ON ea.vec_id = a.cid
      JOIN embeddings eb ON eb.vec_id = b.cid
    )""",
        """sel1 AS (
      SELECT qid, cid, 1 AS step FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY r DESC, cid) AS rn
        FROM c
      ) WHERE rn = 1
    )""",
    ]
    for t in range(2, _MMR_K + 1):
        ctes.append(
            f"""sel{t} AS (
      SELECT qid, cid, step FROM sel{t - 1}
      UNION ALL
      SELECT qid, cid, {t} AS step FROM (
        SELECT c.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY c.qid
                 ORDER BY 0.7e0 * c.r - 0.3e0 * m.ms DESC, c.cid) AS rn
        FROM c
        JOIN (
          SELECT p.qid, p.ca AS cid, MAX(p.s) AS ms
          FROM ps p JOIN sel{t - 1} s ON s.qid = p.qid AND s.cid = p.cb
          GROUP BY 1, 2
        ) m ON m.qid = c.qid AND m.cid = c.cid
        WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} s2
                          WHERE s2.qid = c.qid AND s2.cid = c.cid)
      ) WHERE rn = 1
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT s.qid, CAST(s.step AS INT) AS step, s.cid,
           ROUND(c.r, 6) AS relevance
    FROM sel{_MMR_K} s JOIN c ON c.qid = s.qid AND c.cid = s.cid
    ORDER BY s.qid, s.step
    """


@register(
    "q224_mmr_rerank",
    _mmr_sql(),
    doc="MMR diversified reranking over the q36 retrieval shape: per "
    "query, the exact-cosine top-20 candidates (query side broadcast), "
    "then 5 greedy steps of argmax(0.7*relevance - 0.3*max-sim-to-"
    "selected) with a (score, cid) total order — each step one tiny "
    "join+window on the pinned candidate/pair tables, replayed "
    "verbatim in the oracle CTEs. Cosines are the sequential-fold "
    "doubles both engines compute bit-identically (q90 discipline). "
    "At scale the candidate fetch is the ANN index probe; the MMR "
    "loop always runs on k^2-bounded state per query",
)
def q224_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    base = e.filter(F.col("vec_id") >= _MMR_NQ).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    r = vector.cosine_similarity(F.col("qv"), F.col("embedding"))
    scored = F.broadcast(q).crossJoin(base).select(
        "qid", "cid", r.alias("r"), "embedding"
    )
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("r").desc(), "cid")
    )
    c = pin(
        scored.withColumn("rn", rn).filter(F.col("rn") <= _MMR_TOPC).select(
            "qid", "cid", "r", "embedding"
        )
    )
    a = c.select("qid", F.col("cid").alias("ca"), F.col("embedding").alias("ea"))
    b = c.select(
        F.col("qid").alias("qid2"),
        F.col("cid").alias("cb"),
        F.col("embedding").alias("eb"),
    )
    ps = pin(
        a.join(b, (F.col("qid") == F.col("qid2")) & (F.col("ca") != F.col("cb")))
        .select(
            "qid",
            "ca",
            "cb",
            vector.cosine_similarity(F.col("ea"), F.col("eb")).alias("s"),
        )
    )
    sel = (
        c.withColumn(
            "rn2",
            F.row_number().over(W.partitionBy("qid").orderBy(F.col("r").desc(), "cid")),
        )
        .filter(F.col("rn2") == 1)
        .select("qid", "cid", F.lit(1).alias("step"))
    )
    for t in range(2, _MMR_K + 1):
        ms = (
            ps.join(
                sel.select(F.col("qid").alias("q3"), F.col("cid").alias("c3")),
                (F.col("qid") == F.col("q3")) & (F.col("cb") == F.col("c3")),
            )
            .groupBy("qid", "ca")
            .agg(F.max("s").alias("ms"))
        )
        remaining = c.join(sel.select("qid", "cid"), ["qid", "cid"], "left_anti")
        picked = (
            remaining.join(
                ms,
                (remaining["qid"] == ms["qid"]) & (remaining["cid"] == ms["ca"]),
            )
            .drop(ms["qid"])
            .select(
                "qid",
                "cid",
                (0.7 * F.col("r") - 0.3 * F.col("ms")).alias("score"),
            )
            .withColumn(
                "rn3",
                F.row_number().over(
                    W.partitionBy("qid").orderBy(F.col("score").desc(), "cid")
                ),
            )
            .filter(F.col("rn3") == 1)
            .select("qid", "cid", F.lit(t).alias("step"))
        )
        sel = sel.unionAll(picked)
    return (
        sel.join(c.select("qid", "cid", "r"), ["qid", "cid"])
        .select(
            "qid",
            F.col("step").cast("int").alias("step"),
            "cid",
            F.round("r", 6).alias("relevance"),
        )
        .orderBy("qid", "step")
    )


# ---------------------------------------------------------------------------
# q225 — precedence matrix: for every event-type pair (a, b), in how
# many sessions does a occur strictly before b — the any-gap ordering
# signal q199's adjacent trigrams cannot see, and the lift against
# the independence baseline. First-occurrence times make it one
# bounded comparison per (session, pair), never a pair scan of events
# ---------------------------------------------------------------------------
# Shared with q258 (the streaming twin): the batch fixpoint both the
# q225 plan and the streaming session-window pipeline must reproduce.
PRECEDENCE_ORACLE_SQL = """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    firsts AS (
      SELECT user_id, sess, event_type, ts, event_id FROM (
        SELECT user_id, sess, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, sess, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM s
      ) WHERE rn = 1
    ),
    nsess AS (SELECT CAST(COUNT(DISTINCT (user_id, sess)) AS BIGINT) AS ns
              FROM firsts),
    occ AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM firsts GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS before_type, b.event_type AS after_type,
             CAST(COUNT(*) AS BIGINT) AS n_precede
      FROM firsts a JOIN firsts b
        ON a.user_id = b.user_id AND a.sess = b.sess
       AND a.event_type <> b.event_type
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
      GROUP BY 1, 2
    )
    SELECT p.before_type, p.after_type, p.n_precede,
           oa.n_sessions AS n_before, ob.n_sessions AS n_after,
           ROUND(CAST(p.n_precede AS DOUBLE) * t.ns
                 / (CAST(oa.n_sessions AS DOUBLE) * ob.n_sessions), 6)
             AS lift
    FROM pairs p
    JOIN occ oa ON oa.event_type = p.before_type
    JOIN occ ob ON ob.event_type = p.after_type
    CROSS JOIN nsess t
    ORDER BY p.before_type, p.after_type
    """


@register(
    "q225_precedence_matrix",
    PRECEDENCE_ORACLE_SQL,
    doc="session precedence matrix: per (session, type) FIRST "
    "occurrence under the (ts, event_id) total order, then one |types|^2-bounded self-join per session "
    "counting strict a-before-b precedences, with lift = P(a<b) / "
    "(P(a)P(b)) against session-level independence. The any-gap "
    "ordering view that complements q199 (adjacent steps) and q193 "
    "(one-step transitions). Corpus pays the q19 sessionize chain + "
    "one (session, type) aggregate; the pair join runs on at most "
    "|types| rows per session",
)
def q225_precedence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    fw = W.partitionBy("user_id", "sess", "event_type").orderBy(
        "ts", "event_id"
    )
    firsts = pin(
        s.withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") == 1)
        .select("user_id", "sess", "event_type", "ts", "event_id")
    )
    nsess = firsts.select("user_id", "sess").distinct().agg(
        F.count("*").cast("long").alias("ns")
    )
    occ = firsts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    a = firsts.select(
        "user_id",
        "sess",
        F.col("event_type").alias("before_type"),
        F.col("ts").alias("ta"),
        F.col("event_id").alias("ia"),
    )
    b = firsts.select(
        F.col("user_id").alias("u2"),
        F.col("sess").alias("s2"),
        F.col("event_type").alias("after_type"),
        F.col("ts").alias("tb"),
        F.col("event_id").alias("ib"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("sess") == F.col("s2"))
            & (F.col("before_type") != F.col("after_type"))
            & (
                (F.col("ta") < F.col("tb"))
                | ((F.col("ta") == F.col("tb")) & (F.col("ia") < F.col("ib")))
            ),
        )
        .groupBy("before_type", "after_type")
        .agg(F.count("*").cast("long").alias("n_precede"))
    )
    oa = occ.select(
        F.col("event_type").alias("before_type"),
        F.col("n_sessions").alias("n_before"),
    )
    ob = occ.select(
        F.col("event_type").alias("after_type"),
        F.col("n_sessions").alias("n_after"),
    )
    return (
        pairs.join(F.broadcast(oa), "before_type")
        .join(F.broadcast(ob), "after_type")
        .crossJoin(F.broadcast(nsess))
        .select(
            "before_type",
            "after_type",
            "n_precede",
            "n_before",
            "n_after",
            F.round(
                F.col("n_precede").cast("double") * F.col("ns")
                / (F.col("n_before").cast("double") * F.col("n_after")),
                6,
            ).alias("lift"),
        )
        .orderBy("before_type", "after_type")
    )


# ---------------------------------------------------------------------------
# q226 — watermark planning sweep: the observed-lateness table that
# picks a streaming watermark BEFORE deploying one — per candidate
# delay bound, how many events would arrive too late, at what rate,
# and how many event-time windows they would have corrected. Arrival
# lateness is derandomized from the event id (the q92/q125 md5
# discipline: 10% of events late, uniform 0-119 minutes)
# ---------------------------------------------------------------------------
_WM_CANDIDATES = [5, 15, 30, 60, 120]


def _watermark_sql() -> str:
    late_sel = _hash_bucket_duck("event_id", 1000)
    late_amt = _hash_bucket_duck("event_id || 'd'", 120)
    caps = ", ".join(str(w) for w in _WM_CANDIDATES)
    return f"""
    WITH lat AS (
      SELECT event_id, ts,
             CASE WHEN {late_sel} < 100 THEN {late_amt} ELSE 0 END AS delay_min
      FROM events
    ),
    w AS (SELECT unnest([{caps}]) AS wm),
    swept AS (
      SELECT w.wm,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN delay_min > w.wm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
             CAST(COUNT(DISTINCT CASE WHEN delay_min > w.wm
                  THEN time_bucket(INTERVAL '1 hour', ts) END) AS BIGINT)
               AS n_windows_affected,
             CAST(MAX(delay_min) AS INT) AS max_delay
      FROM lat CROSS JOIN w
      GROUP BY 1
    )
    SELECT wm AS watermark_minutes, n_events, n_late,
           ROUND(CAST(n_late AS DOUBLE) / n_events, 6) AS late_rate,
           n_windows_affected, max_delay
    FROM swept ORDER BY wm
    """


@register(
    "q226_watermark_sweep",
    _watermark_sql(),
    doc="streaming watermark sizing from the lateness distribution: "
    "per candidate bound (5/15/30/60/120 min), the events that would "
    "be dropped as too-late, the late rate, and the distinct "
    "event-time hours those stragglers belong to (the state the "
    "watermark would have had to keep open). Lateness is md5-derived "
    "(10% late, uniform 0-119 min) so both engines see the identical "
    "arrival process; in production the delay column is observed "
    "arrival_ts - event_ts and the same one-scan sweep applies. All "
    "counters map-side combined over one scan x 5-row config table",
)
def q226_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    delay = F.when(
        hash_bucket(F.col("event_id"), 1000) < 100,
        hash_bucket(F.concat(F.col("event_id").cast("string"), F.lit("d")), 120),
    ).otherwise(0)
    lat = pin(
        e.select("ts", delay.alias("delay_min"))
    )
    w = spark.createDataFrame([(c,) for c in _WM_CANDIDATES], "wm int")
    late = F.col("delay_min") > F.col("wm")
    swept = (
        lat.crossJoin(F.broadcast(w))
        .groupBy("wm")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(late.cast("int")).cast("long").alias("n_late"),
            F.countDistinct(F.when(late, F.date_trunc("hour", "ts")))
            .cast("long")
            .alias("n_windows_affected"),
            F.max("delay_min").cast("int").alias("max_delay"),
        )
    )
    return swept.select(
        F.col("wm").alias("watermark_minutes"),
        "n_events",
        "n_late",
        F.round(F.col("n_late").cast("double") / F.col("n_events"), 6).alias(
            "late_rate"
        ),
        "n_windows_affected",
        "max_delay",
    ).orderBy("watermark_minutes")


# ---------------------------------------------------------------------------
# q227 — revenue concentration (Lorenz deciles): what share of total
# revenue the top-k% of customers carry — the whale-dependence view
# next to q173's per-key Gini. Decile cuts by NTILE under a total
# order, revenue decimal-exact, shares one double chain
# ---------------------------------------------------------------------------
@register(
    "q227_revenue_concentration",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS rev
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT o_custkey, rev,
             NTILE(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM cust
    ),
    tot AS (SELECT CAST(SUM(rev) AS DECIMAL(28,6)) AS total FROM cust),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev) AS DECIMAL(28,6)) AS rev
      FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS INT) AS decile, n_customers,
           ROUND(CAST(rev AS DOUBLE), 4) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(rev) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(total AS DOUBLE), 6) AS cum_share
    FROM d CROSS JOIN tot ORDER BY decile
    """,
    doc="customer revenue Lorenz table: per-customer decimal-exact "
    "revenue, NTILE(10) deciles under (revenue desc, custkey) total "
    "order, per-decile share and the cumulative concentration curve "
    "(decile 1 cum_share is 'top-10% carries X%'). One custkey "
    "aggregate + one customer-sized sort; at 100 TB the decile "
    "boundaries come from the q83 two-phase rank",
)
def q227_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("rev")
    )
    ranked = cust.select(
        "rev",
        F.ntile(10)
        .over(W.orderBy(F.col("rev").desc(), "o_custkey"))
        .alias("decile"),
    )
    tot = cust.agg(F.sum("rev").cast("decimal(28,6)").alias("total"))
    d = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").cast("decimal(28,6)").alias("rev"),
    )
    cum = F.sum("rev").over(
        W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            F.round(F.col("rev").cast("double"), 4).alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
            F.round(
                cum.cast("double") / F.col("total").cast("double"), 6
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


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
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    key = lambda e: F.md5(  # noqa: E731
        F.concat(F.lit(e + "|"), F.col("doc_id").cast("string"))
    )
    r = d.select(
        "doc_id",
        F.row_number().over(W.orderBy(key("e1"), "doc_id")).cast("long").alias("r1"),
        F.row_number().over(W.orderBy(key("e2"), "doc_id")).cast("long").alias("r2"),
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
# q229 — split-conformal calibration of the q111 quality classifier:
# train on split 0, take the ceil((n+1)*0.9)-quantile nonconformity
# threshold from split 1's positives (a pure ORDER STATISTIC — integer
# rank, no interpolation, exact fixed-point scores), then audit the
# marginal coverage guarantee on held-out split 2. The distribution-
# free "is my filter's confidence honest" check, entirely in-engine
# ---------------------------------------------------------------------------
def _conformal_sql() -> str:
    split = _hash_bucket_duck("doc_id", 3)
    clf = _classifier_sql(train_where=f"{split} = 0")
    return f"""
    WITH clf AS ({clf}),
    tagged AS (
      SELECT c.doc_id, c.label, c.score_fx, {split} AS split
      FROM clf c
    ),
    cal AS (
      SELECT score_fx,
             CAST(ROW_NUMBER() OVER (ORDER BY score_fx DESC, doc_id)
                  AS BIGINT) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_cal
      FROM tagged WHERE split = 1 AND label = 1
    ),
    thr AS (
      SELECT n_cal,
             (9 * (n_cal + 1) + 9) // 10 AS k,
             MAX(CASE WHEN rn = (9 * (n_cal + 1) + 9) // 10
                      THEN score_fx END) AS t
      FROM cal GROUP BY n_cal
    ),
    ev AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_eval,
        CAST(SUM(label) AS BIGINT) AS n_eval_pos,
        CAST(SUM(CASE WHEN label = 1
                       AND (t.t IS NULL OR score_fx >= t.t)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        CAST(SUM(CASE WHEN t.t IS NULL OR score_fx >= t.t
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_selected
      FROM tagged CROSS JOIN thr t WHERE split = 2
    )
    SELECT t.n_cal AS n_cal_pos, CAST(t.k AS BIGINT) AS k_rank,
           t.t AS threshold_fx,
           e.n_eval, e.n_eval_pos,
           ROUND(CAST(e.n_covered AS DOUBLE) / e.n_eval_pos, 6) AS coverage,
           ROUND(CAST(e.n_selected AS DOUBLE) / e.n_eval, 6) AS selection_rate
    FROM thr t CROSS JOIN ev e
    """


@register(
    "q229_conformal_calibration",
    _conformal_sql(),
    doc="split-conformal prediction audit over the in-engine trained "
    "quality classifier: a 3-way md5 split (train / calibrate / "
    "evaluate), the q111 GD training restricted to split 0 via the "
    "parameterized replay (features and scoring still cover the whole "
    "corpus), the conformal threshold as the k = ceil(0.9*(n+1))-th "
    "LARGEST calibration-positive score (an exact integer-rank order "
    "statistic over exact fixed-point scores — if k exceeds n_cal the "
    "set is everything, the textbook rule), and held-out coverage + "
    "selection rate on split 2. Conformal's marginal-coverage "
    "guarantee makes `coverage` land near 0.9 for ANY score "
    "distribution — the honesty check for every model-based filter "
    "in this workload. Adds one rank over calibration positives and "
    "two counters to q111's training cost",
)
def q229_conformal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators import classifier as clf
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    split = hash_bucket(F.col("doc_id"), 3)
    w_rows = clf.train_weights(
        d.filter(split == 0),
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    ).collect()
    weights = {r.b: r.w for r in w_rows}
    scored = pin(
        d.select(
            "doc_id",
            split.alias("split"),
            (F.col("lang") == "en").cast("long").alias("label"),
            clf.literal_score_expr("text", weights, buckets=_CLF_BUCKETS).alias(
                "score_fx"
            ),
        )
    )
    cal = scored.filter((F.col("split") == 1) & (F.col("label") == 1)).select(
        "doc_id", "score_fx"
    )
    ncal = cal.agg(F.count("*").cast("long").alias("n_cal"))
    ranked = cal.select(
        "score_fx",
        F.row_number()
        .over(W.orderBy(F.col("score_fx").desc(), "doc_id"))
        .cast("long")
        .alias("rn"),
    )
    k = F.expr("(9 * (n_cal + 1) + 9) div 10")
    thr = (
        ranked.crossJoin(F.broadcast(ncal))
        .groupBy("n_cal")
        .agg(
            F.max(F.when(F.col("rn") == k, F.col("score_fx"))).alias("t"),
        )
        .select("n_cal", F.expr("(9 * (n_cal + 1) + 9) div 10").alias("k"), "t")
    )
    ev = (
        scored.filter(F.col("split") == 2)
        .crossJoin(F.broadcast(thr.select("t")))
        .agg(
            F.count("*").cast("long").alias("n_eval"),
            F.sum("label").cast("long").alias("n_eval_pos"),
            F.sum(
                F.when(
                    (F.col("label") == 1)
                    & (F.col("t").isNull() | (F.col("score_fx") >= F.col("t"))),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
            F.sum(
                F.when(
                    F.col("t").isNull() | (F.col("score_fx") >= F.col("t")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_selected"),
        )
    )
    return (
        thr.crossJoin(F.broadcast(ev))
        .select(
            F.col("n_cal").alias("n_cal_pos"),
            F.col("k").cast("long").alias("k_rank"),
            F.col("t").alias("threshold_fx"),
            "n_eval",
            "n_eval_pos",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_eval_pos"), 6
            ).alias("coverage"),
            F.round(
                F.col("n_selected").cast("double") / F.col("n_eval"), 6
            ).alias("selection_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q230 — reciprocal-rank fusion: the standard hybrid-retrieval combiner
# (RRF, k=60) over two independent ANN methods this workload already
# certifies — IVF cell probing (q37) and hyperplane LSH (q43) — with
# the exact brute-force top-10 annotated per fused hit. Two retrievers
# disagree on different misses; the fusion's in_exact rate shows the
# ensemble recovering what each single index drops
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_DEPTH = 20


def _rrf_sql() -> str:
    nb = _LSH_NBITS
    cents = f"""cents AS (
      SELECT label, list(mean_v ORDER BY pos) AS centroid
      FROM (
        SELECT label, i AS pos,
               {_fx_mean('CAST(embedding[i] AS DOUBLE)')} AS mean_v
        FROM cands, UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i
      ) GROUP BY label
    )"""
    return f"""
    WITH cands AS (SELECT * FROM embeddings WHERE vec_id >= 5),
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
          WHERE vec_id < 5),
    {cents},
    probe AS (
      SELECT qid, qvec, label,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY {_duck_cos('qvec', 'centroid')} DESC, label ASC)
               AS cell_rank
      FROM q, cents
    ),
    probed AS (SELECT qid, qvec, label FROM probe WHERE cell_rank <= 2),
    ipairs AS (
      SELECT p.qid, e.vec_id AS cid, {_duck_cos('p.qvec', 'e.embedding')} AS sim
      FROM probed p JOIN cands e ON e.label = p.label
    ),
    iranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
               AS rank
      FROM ipairs
    ),
    ivf AS (SELECT qid, cid, rank FROM iranked WHERE rank <= {_RRF_DEPTH}),
    cbuck AS (
      SELECT vec_id AS cid, embedding AS cvec,
             {_duck_lsh_bucket('embedding', nb)} AS bucket
      FROM cands
    ),
    qbuck AS (
      SELECT qid, qvec, {_duck_lsh_bucket('qvec', nb)} AS bucket FROM q
    ),
    lpairs AS (
      SELECT qb.qid, cb.cid, {_duck_cos('qb.qvec', 'cb.cvec')} AS sim
      FROM cbuck cb JOIN qbuck qb ON qb.bucket = cb.bucket
    ),
    lranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
               AS rank
      FROM lpairs
    ),
    lsh AS (SELECT qid, cid, rank FROM lranked WHERE rank <= {_RRF_DEPTH}),
    fused AS (
      SELECT COALESCE(i.qid, l.qid) AS qid, COALESCE(i.cid, l.cid) AS cid,
             i.rank AS ri, l.rank AS rl,
             COALESCE(1e0 / ({_RRF_K} + i.rank), 0e0)
               + COALESCE(1e0 / ({_RRF_K} + l.rank), 0e0) AS rrf
      FROM ivf i FULL JOIN lsh l ON i.qid = l.qid AND i.cid = l.cid
    ),
    franked AS (
      SELECT qid, cid, ri, rl, rrf,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, cid ASC)
               AS fused_rank
      FROM fused
    ),
    epairs AS (
      SELECT q.qid, e.vec_id AS cid, {_duck_cos('q.qvec', 'e.embedding')} AS sim
      FROM q, cands e
    ),
    exact AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
                 AS rank
        FROM epairs
      ) WHERE rank <= 10
    )
    SELECT f.qid, CAST(f.fused_rank AS INT) AS fused_rank, f.cid,
           ROUND(f.rrf, 9) AS rrf,
           CAST(f.ri IS NOT NULL AS INT) AS from_ivf,
           CAST(f.rl IS NOT NULL AS INT) AS from_lsh,
           CAST(ex.cid IS NOT NULL AS INT) AS in_exact_top10
    FROM franked f LEFT JOIN exact ex ON ex.qid = f.qid AND ex.cid = f.cid
    WHERE f.fused_rank <= 10
    ORDER BY f.qid, fused_rank
    """


@register(
    "q230_rrf_fusion",
    _rrf_sql(),
    doc="hybrid retrieval by reciprocal-rank fusion: IVF-probed top-20 "
    "and hyperplane-LSH top-20 per query (both over the same candidate "
    "set, both already certified standalone as q37/q43), fused by "
    "RRF(60) — rank-only combination, so the fusion needs no score "
    "normalization between methods — with per-hit provenance flags "
    "and the exact brute-force top-10 membership annotated. Ranks "
    "come from the certified sequential-fold cosines; the RRF score "
    "is a two-term exact-division sum in fixed order. Each retriever "
    "keeps its own scale shape (broadcast probes, bucket join); the "
    "fusion join runs on 2*depth rows per query",
)
def q230_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands = e.filter(F.col("vec_id") >= 5)
    cv = cands.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    ivf = (
        sim.ivf_topk(q, cands, k=_RRF_DEPTH, nprobe=2)
        .withColumnRenamed("vec_id", "cid")
        .select("qid", "cid", F.col("rank").alias("ri"))
    )
    lsh = sim.lsh_topk(
        q, cv, dim=_LSH_DIM, nbits=_LSH_NBITS, k=_RRF_DEPTH
    ).select(F.col("qid").alias("lqid"), F.col("cid").alias("lcid"), F.col("rank").alias("rl"))
    fused = ivf.join(
        lsh,
        (F.col("qid") == F.col("lqid")) & (F.col("cid") == F.col("lcid")),
        "full_outer",
    ).select(
        F.coalesce("qid", "lqid").alias("qid"),
        F.coalesce("cid", "lcid").alias("cid"),
        "ri",
        "rl",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("ri")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rl")), F.lit(0.0))
        ).alias("rrf"),
    )
    franked = fused.withColumn(
        "fused_rank",
        F.row_number().over(
            W.partitionBy("qid").orderBy(F.col("rrf").desc(), "cid")
        ),
    ).filter(F.col("fused_rank") <= 10)
    exact = sim.cosine_topk(q, cv, k=10).select(
        F.col("qid").alias("eqid"), F.col("cid").alias("ecid")
    )
    return (
        franked.join(
            exact,
            (F.col("qid") == F.col("eqid")) & (F.col("cid") == F.col("ecid")),
            "left",
        )
        .select(
            "qid",
            F.col("fused_rank").cast("int").alias("fused_rank"),
            "cid",
            F.round("rrf", 9).alias("rrf"),
            F.col("ri").isNotNull().cast("int").alias("from_ivf"),
            F.col("rl").isNotNull().cast("int").alias("from_lsh"),
            F.col("ecid").isNotNull().cast("int").alias("in_exact_top10"),
        )
        .orderBy("qid", "fused_rank")
    )


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
    g = d.select(
        F.col("n_chars").alias("gval"),
        F.row_number().over(W.orderBy("n_chars", "doc_id")).cast("long").alias("rg"),
    )
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
# q236 — Pareto frontier (skyline): the documents no other document
# dominates on (longer, higher lexical diversity) — the classic
# skyline operator, which Spark lacks natively, rewritten for 2D as
# ONE sort + ONE running-max window instead of the O(n^2) dominance
# self-join a naive plan writes
# ---------------------------------------------------------------------------
@register(
    "q236_pareto_frontier",
    r"""
    WITH m AS (
      SELECT doc_id, n_chars,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')))
               AS BIGINT) AS n_distinct_terms
      FROM documents
    ),
    swept AS (
      SELECT doc_id, n_chars, n_distinct_terms,
             MAX(n_distinct_terms) OVER (
               ORDER BY n_chars DESC, n_distinct_terms DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_seen
      FROM m
    )
    SELECT doc_id, n_chars, n_distinct_terms
    FROM swept
    WHERE best_seen IS NULL OR n_distinct_terms > best_seen
    ORDER BY n_chars DESC, doc_id
    """,
    doc="2D skyline over (n_chars, distinct-term count): a document is "
    "on the frontier iff no other document is at least as long AND "
    "strictly more lexically diverse — computed by sorting on the "
    "first criterion and keeping rows that beat the running max of "
    "the second (exact integers; the (n_chars desc, diversity desc, "
    "doc_id) total order makes equal-length groups resolve "
    "deterministically: only a group's best survives, and ties on "
    "both criteria keep the first doc_id). O(n log n) against the "
    "O(n^2) dominance join; the window is one global sort, which at "
    "100 TB becomes the q83 two-phase range sort with per-range "
    "running-max carry",
)
def q236_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    m = d.select(
        "doc_id",
        "n_chars",
        F.size(
            F.array_distinct(
                F.filter(
                    F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                    lambda x: x != F.lit(""),
                )
            )
        )
        .cast("long")
        .alias("n_distinct_terms"),
    )
    w = W.orderBy(
        F.col("n_chars").desc(), F.col("n_distinct_terms").desc(), "doc_id"
    ).rowsBetween(W.unboundedPreceding, -1)
    swept = m.withColumn("best_seen", F.max("n_distinct_terms").over(w))
    return (
        swept.filter(
            F.col("best_seen").isNull()
            | (F.col("n_distinct_terms") > F.col("best_seen"))
        )
        .select("doc_id", "n_chars", "n_distinct_terms")
        .orderBy(F.col("n_chars").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# q234 — time-decayed popularity ranking: event-type scores under a
# 7-day half-life, the ranking every "trending now" surface uses —
# with dyadic per-week decay (2^-weeks is an EXACT double), the
# whole score is deterministic without a single libm call
# ---------------------------------------------------------------------------
@register(
    "q234_decayed_popularity",
    """
    WITH horizon AS (SELECT MAX(time_bucket(INTERVAL '1 day', ts)) AS d1
                     FROM events),
    daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.event_type, d.n,
             date_diff('day', CAST(d.day AS DATE), CAST(h.d1 AS DATE)) AS age,
             CAST(d.n AS DOUBLE)
               / CAST(1 << LEAST(date_diff('day', CAST(d.day AS DATE),
                                           CAST(h.d1 AS DATE)) // 7, 62)
                      AS DOUBLE) AS term
      FROM daily d CROSS JOIN horizon h
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS raw_count,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS decayed_score,
           CAST(ROW_NUMBER() OVER (
             ORDER BY SUM(CAST(term AS DECIMAL(28,12))) DESC, event_type)
             AS INT) AS rank
    FROM scored GROUP BY event_type
    ORDER BY rank
    """,
    doc="half-life popularity: daily counts decayed by 2^-(age//7) — "
    "a dyadic factor, so n/2^k is exact in doubles and the "
    "DECIMAL-quantized sum is order-independent; ranking by the "
    "decayed score with a type tiebreak. A freshly-hot type outranks "
    "a historically-bigger but stale one — the recency ranking raw "
    "counts can't express. One day aggregate + a types-sized window; "
    "the decay is a shift, never exp()",
)
def q234_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.date_trunc("day", "ts")).alias("d1"))
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    scored = (
        daily.crossJoin(F.broadcast(horizon))
        .withColumn(
            "k",
            F.least(
                F.expr("datediff(to_date(d1), to_date(day)) div 7").cast("int"),
                F.lit(62),
            ),
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "cast(n as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
            ).alias("term"),
        )
    )
    agg = scored.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("raw_count"),
        F.sum(F.col("term").cast("decimal(28,12)")).alias("sd"),
    )
    return agg.select(
        "event_type",
        "raw_count",
        F.round(F.col("sd").cast("double"), 6).alias("decayed_score"),
        F.row_number()
        .over(W.orderBy(F.col("sd").desc(), "event_type"))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# q235 — data-quality census across EVERY table in the catalog: null /
# blank / distinct counts per column, generated from one shared spec
# so the Spark plan and the oracle can never disagree about what was
# profiled. The first page of every data-platform quality report
# ---------------------------------------------------------------------------
_CENSUS_SPEC: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "n"), ("r_name", "s")],
    "nation": [("n_nationkey", "n"), ("n_name", "s"), ("n_regionkey", "n")],
    "customer": [
        ("c_custkey", "n"), ("c_name", "s"), ("c_nationkey", "n"),
        ("c_acctbal", "n"), ("c_mktsegment", "s"),
    ],
    "supplier": [("s_suppkey", "n"), ("s_name", "s"), ("s_nationkey", "n")],
    "part": [
        ("p_partkey", "n"), ("p_name", "s"), ("p_brand", "s"),
        ("p_type", "s"), ("p_size", "n"), ("p_retailprice", "n"),
    ],
    "orders": [
        ("o_orderkey", "n"), ("o_custkey", "n"), ("o_orderstatus", "s"),
        ("o_totalprice", "n"), ("o_orderdate", "t"), ("o_orderpriority", "s"),
    ],
    "lineitem": [
        ("l_orderkey", "n"), ("l_partkey", "n"), ("l_suppkey", "n"),
        ("l_quantity", "n"), ("l_extendedprice", "n"), ("l_discount", "n"),
        ("l_returnflag", "s"), ("l_shipdate", "t"),
    ],
    "events": [
        ("event_id", "n"), ("ts", "t"), ("user_id", "n"),
        ("event_type", "s"), ("value", "n"), ("props", "s"),
    ],
    "documents": [
        ("doc_id", "n"), ("text", "s"), ("lang", "s"),
        ("source", "s"), ("n_chars", "n"),
    ],
    "embeddings": [("vec_id", "n"), ("label", "n")],
}


def _census_sql() -> str:
    parts = []
    for t, cols in _CENSUS_SPEC.items():
        aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
        rows = []
        for c, kind in cols:
            aggs.append(
                f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS nn_{c}"
            )
            aggs.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}")
            blank = (
                f"CAST(SUM(CASE WHEN trim({c}) = '' THEN 1 ELSE 0 END) AS BIGINT)"
                if kind == "s"
                else "CAST(0 AS BIGINT)"
            )
            aggs.append(f"{blank} AS nb_{c}")
            rows.append(
                f"SELECT '{t}' AS table_name, '{c}' AS column_name, n_rows,"
                f" nn_{c} AS n_null, nb_{c} AS n_blank, nd_{c} AS n_distinct"
                f" FROM agg_{t}"
            )
        parts.append((f"agg_{t} AS (SELECT {', '.join(aggs)} FROM {t})", rows))
    ctes = ",\n    ".join(p[0] for p in parts)
    unions = "\n      UNION ALL ".join(r for p in parts for r in p[1])
    return f"""
    WITH {ctes}
    SELECT * FROM ({unions})
    ORDER BY table_name, column_name
    """


@register(
    "q235_null_census",
    _census_sql(),
    doc="whole-catalog data-quality census: per (table, column), row "
    "count, NULLs, blank strings, and exact distinct counts — "
    "generated from ONE column spec shared with the Spark builder, so "
    "the profile and its oracle cannot drift. Each table is scanned "
    "once (all its column counters share the aggregate; the distinct "
    "counts expand map-side), and the result is columns-sized. The "
    "report that catches a silently-nulled upstream field the day it "
    "happens; at 100 TB swap the exact distincts for q136's HLL "
    "registers, same shape",
)
def q235_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, cols in _CENSUS_SPEC.items():
        df = load_table(spark, sf_dir, t)
        aggs = [F.count("*").cast("long").alias("n_rows")]
        for c, kind in cols:
            aggs.append(
                F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"nn_{c}")
            )
            aggs.append(F.countDistinct(c).cast("long").alias(f"nd_{c}"))
            blank = (
                F.sum((F.trim(F.col(c)) == "").cast("int")).cast("long")
                if kind == "s"
                else F.lit(0).cast("long")
            )
            aggs.append(blank.alias(f"nb_{c}"))
        agg = df.agg(*aggs)
        rows = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_name"),
                            F.lit(c).alias("column_name"),
                            F.col("n_rows").alias("n_rows"),
                            F.col(f"nn_{c}").alias("n_null"),
                            F.col(f"nb_{c}").alias("n_blank"),
                            F.col(f"nd_{c}").alias("n_distinct"),
                        )
                        for c, _ in cols
                    ]
                )
            ).alias("r")
        ).select("r.*")
        out = rows if out is None else out.unionAll(rows)
    return out.orderBy("table_name", "column_name")


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
# q238 — duplicate-pair explanations: the top near-dup pairs WITH the
# evidence a human reviewer needs — shared-shingle counts, Jaccard,
# and three deterministically-sampled common shingles quoted inline.
# Dedup verdicts that can be audited get trusted; opaque ones get
# re-litigated forever
# ---------------------------------------------------------------------------
_EXPLAIN_TOPK = 10


@register(
    "q238_pair_explanations",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {{maxdf}}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, n_common,
             round(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 6)
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ),
    top AS (
      SELECT id_a, id_b, n_common, jaccard FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, id_a, id_b) AS rn
        FROM scored
      ) WHERE rn <= {_EXPLAIN_TOPK}
    ),
    ev AS (
      SELECT t.id_a, t.id_b, a2.shingle,
             ROW_NUMBER() OVER (PARTITION BY t.id_a, t.id_b
               ORDER BY md5(a2.shingle), a2.shingle) AS srn
      FROM top t
      JOIN f a2 ON a2.doc_id = t.id_a
      JOIN f b2 ON b2.doc_id = t.id_b AND b2.shingle = a2.shingle
    ),
    quoted AS (
      SELECT id_a, id_b,
             string_agg(shingle, ' | ' ORDER BY md5(shingle), shingle)
               AS evidence
      FROM ev WHERE srn <= 3 GROUP BY 1, 2
    )
    SELECT t.id_a, t.id_b, t.n_common, t.jaccard, q.evidence
    FROM top t JOIN quoted q ON q.id_a = t.id_a AND q.id_b = t.id_b
    ORDER BY t.jaccard DESC, t.id_a, t.id_b
    """.replace("{maxdf}", "50"),
    doc="explainable dedup: the top-10 verified pairs by exact df-"
    "capped Jaccard (the q33 machinery) each annotated with three "
    "md5-sampled common shingles quoted verbatim — the audit record "
    "reviewers and takedown processes need next to a bare score. "
    "Evidence joins run only for the 10 selected pairs; shingle "
    "sampling is deterministic (md5 then text order), so the whole "
    "explanation table hash-verifies",
)
def q238_pair_explanations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_count"))
    f = pin(sh.join(dfreq.filter(F.col("df_count") <= 50), "shingle"))
    a = f.select(F.col("doc_id").alias("id_a"), "shingle")
    b = f.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("size_b"))
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    top = pin(
        scored.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("jaccard").desc(), "id_a", "id_b")),
        )
        .filter(F.col("rn") <= _EXPLAIN_TOPK)
        .drop("rn")
    )
    a2 = f.select(F.col("doc_id").alias("id_a"), "shingle")
    b2 = f.select(F.col("doc_id").alias("idb2"), F.col("shingle").alias("sh_b"))
    ev = (
        top.select("id_a", "id_b")
        .join(a2, "id_a")
        .join(
            b2,
            (F.col("id_b") == F.col("idb2")) & (F.col("shingle") == F.col("sh_b")),
        )
        .select(F.col("id_a").alias("ea"), F.col("id_b").alias("eb"), "shingle")
    )
    quoted = (
        ev.withColumn(
            "srn",
            F.row_number().over(
                W.partitionBy("ea", "eb").orderBy(F.md5("shingle"), "shingle")
            ),
        )
        .filter(F.col("srn") <= 3)
        .groupBy("ea", "eb")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.md5("shingle").alias("h"), "shingle"))
                    ),
                    lambda s: s["shingle"],
                ),
                " | ",
            ).alias("evidence")
        )
    )
    return (
        top.join(
            quoted,
            (top["id_a"] == quoted["ea"]) & (top["id_b"] == quoted["eb"]),
        )
        .select("id_a", "id_b", "n_common", "jaccard", "evidence")
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q239 — frequent triples: which THREE event types co-occur in one
# session beyond what their singles predict — the k=3 extension of
# q154's pair itemsets, feasible exactly because the per-session
# distinct-type set is bounded (the 3-subsets are generated from the
# session's own type set, never by a corpus three-way self-join)
# ---------------------------------------------------------------------------
@register(
    "q239_itemset_triples",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    ),
    items AS (SELECT DISTINCT user_id, sess, event_type FROM s),
    nsess AS (SELECT CAST(COUNT(DISTINCT (user_id, sess)) AS BIGINT) AS ns
              FROM items),
    singles AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1
    ),
    triples AS (
      SELECT a.event_type AS t1, b.event_type AS t2, c.event_type AS t3,
             CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM items a
      JOIN items b ON b.user_id = a.user_id AND b.sess = a.sess
                  AND b.event_type > a.event_type
      JOIN items c ON c.user_id = a.user_id AND c.sess = a.sess
                  AND c.event_type > b.event_type
      GROUP BY 1, 2, 3
    )
    SELECT t.t1, t.t2, t.t3, t.n_sessions,
           ROUND(CAST(t.n_sessions AS DOUBLE) / x.ns, 6) AS support,
           ROUND(CAST(t.n_sessions AS DOUBLE) * x.ns * x.ns
                 / (CAST(s1.n AS DOUBLE) * s2.n * s3.n), 6) AS lift
    FROM triples t
    JOIN singles s1 ON s1.event_type = t.t1
    JOIN singles s2 ON s2.event_type = t.t2
    JOIN singles s3 ON s3.event_type = t.t3
    CROSS JOIN nsess x
    ORDER BY t.t1, t.t2, t.t3
    """,
    doc="k=3 frequent itemsets over session type-sets: all ordered "
    "triples t1<t2<t3 counted by two self-joins on the (session, "
    "type) distinct set — bounded at C(|types|,3) rows per session, "
    "never a corpus-scale three-way join — with support and the "
    "three-way lift n*N^2/(n1*n2*n3) against session-level "
    "independence. The q154 basket analysis one order higher; the "
    "sessionize chain is shared with q220/q225",
)
def q239_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (us - F.lag(us).over(ow) > 1_800_000_000)
            | F.lag("ts").over(ow).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.withColumn(
        "sess", F.sum("is_new").over(ow.rowsBetween(W.unboundedPreceding, 0))
    )
    items = pin(s.select("user_id", "sess", "event_type").distinct())
    nsess = items.select("user_id", "sess").distinct().agg(
        F.count("*").cast("long").alias("ns")
    )
    singles = items.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    a = items.select("user_id", "sess", F.col("event_type").alias("t1"))
    b = items.select(
        F.col("user_id").alias("u2"), F.col("sess").alias("s2"),
        F.col("event_type").alias("t2"),
    )
    c = items.select(
        F.col("user_id").alias("u3"), F.col("sess").alias("s3"),
        F.col("event_type").alias("t3"),
    )
    triples = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("sess") == F.col("s2"))
            & (F.col("t2") > F.col("t1")),
        )
        .join(
            c,
            (F.col("user_id") == F.col("u3"))
            & (F.col("sess") == F.col("s3"))
            & (F.col("t3") > F.col("t2")),
        )
        .groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n_sessions"))
    )
    s1 = singles.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2_ = singles.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    s3_ = singles.select(F.col("event_type").alias("t3"), F.col("n").alias("n3"))
    return (
        triples.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2_), "t2")
        .join(F.broadcast(s3_), "t3")
        .crossJoin(F.broadcast(nsess))
        .select(
            "t1",
            "t2",
            "t3",
            "n_sessions",
            F.round(F.col("n_sessions").cast("double") / F.col("ns"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_sessions").cast("double") * F.col("ns") * F.col("ns")
                / (F.col("n1").cast("double") * F.col("n2") * F.col("n3")),
                6,
            ).alias("lift"),
        )
        .orderBy("t1", "t2", "t3")
    )


@register(
    "q240_stream_decayed_popularity",
    """
    WITH horizon AS (SELECT MAX(time_bucket(INTERVAL '1 day', ts)) AS d1
                     FROM events),
    daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.event_type, d.n,
             date_diff('day', CAST(d.day AS DATE), CAST(h.d1 AS DATE)) AS age,
             CAST(d.n AS DOUBLE)
               / CAST(1 << LEAST(date_diff('day', CAST(d.day AS DATE),
                                           CAST(h.d1 AS DATE)) // 7, 62)
                      AS DOUBLE) AS term
      FROM daily d CROSS JOIN horizon h
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS raw_count,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,12))) AS DOUBLE), 6)
             AS decayed_score,
           CAST(ROW_NUMBER() OVER (
             ORDER BY SUM(CAST(term AS DECIMAL(28,12))) DESC, event_type)
             AS INT) AS rank
    FROM scored GROUP BY event_type
    ORDER BY rank
    """,
    doc="streaming twin of q234's half-life popularity: the stateful "
    "stage is the watermarked 1-day tumbling count (state bounded by "
    "the watermark), and the dyadic decay + ranking run per trigger "
    "on the windows-sized aggregate (the q191/q222 foreachBatch "
    "discipline) — a live 'trending now' ranking whose scores are "
    "bit-identical to the batch recompute. == q234's batch oracle",
)
def q240_stream_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.streaming import events as ev

    stream = ev.read_events_stream(spark, sf_dir)
    out = ev.run_stream_to_batch(
        ev.tumbling_counts(stream, "1 day"), "stream_decay_out"
    )
    daily = out.select(
        "event_type",
        F.col("window.start").alias("day"),
        F.col("n").cast("long").alias("n"),
    )
    horizon = daily.agg(F.max("day").alias("d1"))
    scored = (
        daily.crossJoin(F.broadcast(horizon))
        .withColumn(
            "k",
            F.least(
                F.expr("datediff(to_date(d1), to_date(day)) div 7").cast("int"),
                F.lit(62),
            ),
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "cast(n as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
            ).alias("term"),
        )
    )
    agg = scored.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("raw_count"),
        F.sum(F.col("term").cast("decimal(28,12)")).alias("sd"),
    )
    return agg.select(
        "event_type",
        "raw_count",
        F.round(F.col("sd").cast("double"), 6).alias("decayed_score"),
        F.row_number()
        .over(W.orderBy(F.col("sd").desc(), "event_type"))
        .cast("int")
        .alias("rank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# q241 — price-volume decomposition: WHY did each brand's revenue move
# between 1995 and 1996 — the volume effect ((q2-q1) at old unit
# price) vs the price effect (new volume times the unit-price change),
# which sum EXACTLY to the revenue delta (algebraic identity, checked
# as an output column). The FP&A bridge chart as a query
# ---------------------------------------------------------------------------
@register(
    "q241_price_volume_bridge",
    """
    WITH y AS (
      SELECT p.p_brand AS brand,
             CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE date_part('year', o.o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT a.brand, a.qty AS q1, a.rev AS r1, b.qty AS q2, b.rev AS r2
      FROM y a JOIN y b ON a.brand = b.brand AND a.yr = 1995 AND b.yr = 1996
    )
    SELECT brand,
           ROUND(r1, 4) + 0e0 AS rev_1995, ROUND(r2, 4) + 0e0 AS rev_1996,
           ROUND(r2 - r1, 4) + 0e0 AS delta,
           ROUND((q2 - q1) * (r1 / q1), 4) + 0e0 AS volume_effect,
           ROUND(q2 * (r2 / q2 - r1 / q1), 4) + 0e0 AS price_effect,
           ROUND((r2 - r1) - ((q2 - q1) * (r1 / q1) + q2 * (r2 / q2 - r1 / q1)),
                 4) + 0e0 AS residual
    FROM w WHERE q1 > 0 AND q2 > 0
    ORDER BY brand
    """,
    doc="revenue bridge per brand between 1995 and 1996: decimal-exact "
    "yearly quantity and revenue, unit prices as their ratio, volume "
    "effect (q2-q1)*u1 and price effect q2*(u2-u1) — algebraically "
    "these sum to the delta, and the residual column proves it "
    "(vanishes up to the display rounding; both engines evaluate the "
    "identical double chain). One fact scan + broadcast dims, "
    "brand-sized everything after; the 'why did the number move' "
    "report every finance review opens with",
)
def q241_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    y = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("rev"),
        )
    )
    a = y.filter(F.col("yr") == 1995).select(
        "brand", F.col("qty").alias("q1"), F.col("rev").alias("r1")
    )
    b = y.filter(F.col("yr") == 1996).select(
        F.col("brand").alias("b2"), F.col("qty").alias("q2"), F.col("rev").alias("r2")
    )
    w = a.join(b, a["brand"] == b["b2"]).filter(
        (F.col("q1") > 0) & (F.col("q2") > 0)
    )
    q1, r1, q2, r2 = F.col("q1"), F.col("r1"), F.col("q2"), F.col("r2")
    vol = (q2 - q1) * (r1 / q1)
    price = q2 * (r2 / q2 - r1 / q1)
    # + 0.0 normalizes IEEE negative zero (a -1e-9 residual rounds to
    # -0.0 on one engine and 0.0 on the other)
    return w.select(
        "brand",
        (F.round(r1, 4) + 0.0).alias("rev_1995"),
        (F.round(r2, 4) + 0.0).alias("rev_1996"),
        (F.round(r2 - r1, 4) + 0.0).alias("delta"),
        (F.round(vol, 4) + 0.0).alias("volume_effect"),
        (F.round(price, 4) + 0.0).alias("price_effect"),
        (F.round((r2 - r1) - (vol + price), 4) + 0.0).alias("residual"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# q242 — seasonality-adjusted anomalies: daily volumes scored against
# their own day-of-week baseline (q158's seasonality REMOVED before
# q155's MAD rule runs) — the detector that doesn't page on every
# weekend dip. All integer: residuals scaled by the per-dow count,
# MAD per type via exact integer medians of scaled residuals
# ---------------------------------------------------------------------------
@register(
    "q242_seasonal_anomalies",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    dowbase AS (
      SELECT event_type, dayofweek(day) AS dow,
             CAST(SUM(n) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS k
      FROM daily GROUP BY 1, 2
    ),
    resid AS (
      SELECT d.event_type, d.day, d.n,
             d.n * b.k - b.s AS r_scaled, b.k
      FROM daily d JOIN dowbase b
        ON b.event_type = d.event_type AND b.dow = dayofweek(d.day)
    ),
    mad AS (
      SELECT event_type,
             CAST(median(ABS(r_scaled)) AS DOUBLE) AS mad_scaled
      FROM resid GROUP BY 1
    )
    SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day, r.n,
           ROUND(CAST(r.r_scaled AS DOUBLE) / r.k, 4) AS residual,
           ROUND(CAST(ABS(r.r_scaled) AS DOUBLE) / m.mad_scaled, 4)
             AS mad_score
    FROM resid r JOIN mad m ON m.event_type = r.event_type
    WHERE m.mad_scaled > 0
      AND CAST(ABS(r.r_scaled) AS DOUBLE) / m.mad_scaled > 5e0
    ORDER BY r.event_type, day
    """,
    doc="seasonal-residual anomaly detection: each (type, day) count's "
    "deviation from its own day-of-week mean as the exact integer "
    "n*k - s (scaled by the dow-group size so no float mean exists), "
    "then a per-type MAD rule on the scaled residuals — medians of "
    "integers interpolate at most at .5, exact on both engines — "
    "flagging days beyond 5 MADs. Removing the weekly baseline first "
    "is what separates 'Tuesday spike' from 'weekend as usual', the "
    "failure mode of the raw q155 rule on seasonal series. Two "
    "bounded aggregates + one join on the (type, dow) table",
)
def q242_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    dow = F.dayofweek("day")
    base = daily.groupBy("event_type", dow.alias("dow")).agg(
        F.sum("n").cast("long").alias("s"), F.count("*").cast("long").alias("k")
    )
    resid = pin(
        daily.join(
            base,
            (daily["event_type"] == base["event_type"]) & (dow == base["dow"]),
        )
        .drop(base["event_type"])
        .select(
            "event_type",
            "day",
            "n",
            (F.col("n") * F.col("k") - F.col("s")).alias("r_scaled"),
            "k",
        )
    )
    mad = resid.groupBy("event_type").agg(
        F.median(F.abs("r_scaled")).cast("double").alias("mad_scaled")
    )
    return (
        resid.join(
            mad.filter(F.col("mad_scaled") > 0).withColumnRenamed(
                "event_type", "et2"
            ),
            F.col("event_type") == F.col("et2"),
        )
        .filter(
            F.abs("r_scaled").cast("double") / F.col("mad_scaled") > 5.0
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(F.col("r_scaled").cast("double") / F.col("k"), 4).alias(
                "residual"
            ),
            F.round(
                F.abs("r_scaled").cast("double") / F.col("mad_scaled"), 4
            ).alias("mad_score"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q243 — degree assortativity of the MinHash-LSH similarity graph: do
# highly-duplicated documents link to other hubs (assortative, r > 0 —
# template families) or to leaves (disassortative — one boilerplate
# source radiating copies)? The structural summary beside q159's
# triangles, q165's cores, and q187's modularity — exact BIGINT
# moment sums over integer degrees, one IEEE sqrt chain at the end
# ---------------------------------------------------------------------------
def _assortativity_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE.strip().rstrip(',')},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY 1),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM edges e JOIN deg da ON da.node = e.src
                   JOIN deg db ON db.node = e.dst
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m2,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM ed
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT nn.n_nodes, m.m2 // 2 AS n_edges,
           ROUND(CAST(m.m2 * m.sxy - m.sx * m.sy AS DOUBLE)
                 / (sqrt(CAST(m.m2 * m.sxx - m.sx * m.sx AS DOUBLE))
                    * sqrt(CAST(m.m2 * m.syy - m.sy * m.sy AS DOUBLE))), 6)
             AS assortativity
    FROM m CROSS JOIN nn
    """


@register(
    "q243_degree_assortativity",
    _assortativity_sql(),
    doc="Newman degree assortativity over the LSH candidate graph "
    "(both edge directions, the standard undirected convention): "
    "Pearson correlation of endpoint degrees with every moment sum an "
    "exact BIGINT (degrees are integers; the edge list is the only "
    "corpus-scale table and it is touched once for degrees and once "
    "for endpoint pairs), final r one cast/sqrt/divide chain. "
    "Positive r = hubs-link-hubs template families; negative = "
    "star-shaped boilerplate radiation — they need different dedup "
    "strategies (q56 keeper rules vs q59 span removal)",
)
def q243_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = dd.lsh_candidate_pairs(d, "doc_id", "text", _NUM_HASHES, _BANDS)
    edges = pin(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("d")
    )
    da = deg.select(F.col("node").alias("na"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("nb"), F.col("d").alias("y"))
    ed = (
        edges.join(da, edges["src"] == F.col("na"))
        .join(db, edges["dst"] == F.col("nb"))
        .select("x", "y")
    )
    m = ed.agg(
        F.count("*").cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    m2, sx, sy = F.col("m2"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.crossJoin(F.broadcast(nn)).select(
        "n_nodes",
        F.expr("m2 div 2").alias("n_edges"),
        F.round(
            (m2 * sxy - sx * sy).cast("double")
            / (
                F.sqrt((m2 * sxx - sx * sx).cast("double"))
                * F.sqrt((m2 * syy - sy * sy).cast("double"))
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# q244 — vector hygiene: L2-norm outliers in the embedding store (zero
# or near-zero vectors from failed encodes, extreme norms from scale
# bugs) via the q155 MAD rule on norms — the QC pass every ANN index
# build should refuse to proceed without, beside q223's drift monitor
# ---------------------------------------------------------------------------
@register(
    "q244_embedding_norm_qc",
    f"""
    WITH norms AS (
      SELECT vec_id,
             sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * embedding[i]
                            FOR i IN generate_series(1, len(embedding))]))
               AS nrm
      FROM embeddings
    ),
    med AS (
      SELECT CAST(median(nrm) AS DOUBLE) AS m FROM norms
    ),
    madt AS (
      SELECT CAST(median(ABS(n.nrm - med.m)) AS DOUBLE) AS mad, MAX(med.m) AS m
      FROM norms n CROSS JOIN med GROUP BY ()
    )
    SELECT n.vec_id, ROUND(n.nrm, 6) AS norm,
           ROUND(t.m, 6) AS median_norm,
           CASE WHEN n.nrm < 1e-6 THEN 'zero_vector'
                WHEN ABS(n.nrm - t.m) > 5e0 * t.mad THEN 'norm_outlier'
           END AS reason
    FROM norms n CROSS JOIN madt t
    WHERE n.nrm < 1e-6 OR ABS(n.nrm - t.m) > 5e0 * t.mad
    ORDER BY n.vec_id
    """,
    doc="embedding-store QC: per-vector L2 norms (the sequential-fold "
    "dot both engines compute bit-identically), the median/MAD fence "
    "over them (medians of doubles interpolate by one exact IEEE "
    "midpoint), and the flagged rows with reasons — zero vectors "
    "(failed encodes) and 5-MAD norm outliers (mis-scaled batches). "
    "One narrow scan + two tiny aggregates broadcast back; an index "
    "build that skips this ships its encoder's failures into every "
    "similarity result",
)
def q244_embedding_norm_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(x, lambda a: a * a), F.lit(0.0), lambda s, t: s + t
        )
    )
    norms = pin(e.select("vec_id", nrm.alias("nrm")))
    med = norms.agg(F.median("nrm").cast("double").alias("m"))
    madt = (
        norms.crossJoin(F.broadcast(med))
        .agg(
            F.median(F.abs(F.col("nrm") - F.col("m"))).cast("double").alias("mad"),
            F.max("m").alias("m"),
        )
    )
    flagged = (
        norms.crossJoin(F.broadcast(madt))
        .filter(
            (F.col("nrm") < 1e-6)
            | (F.abs(F.col("nrm") - F.col("m")) > 5.0 * F.col("mad"))
        )
        .select(
            "vec_id",
            F.round("nrm", 6).alias("norm"),
            F.round("m", 6).alias("median_norm"),
            F.when(F.col("nrm") < 1e-6, "zero_vector")
            .when(
                F.abs(F.col("nrm") - F.col("m")) > 5.0 * F.col("mad"),
                "norm_outlier",
            )
            .alias("reason"),
        )
        .orderBy("vec_id")
    )
    return flagged


# ---------------------------------------------------------------------------
# q245 — ANN cost/recall ledger: for each retrieval method this
# workload certifies (brute force, IVF nprobe=2, hyperplane LSH), the
# DISTANCE COMPUTATIONS actually paid per query and the recall@10 they
# bought — the cross-method economics that q178 answers within IVF-PQ
# and q82 within LSH radii. Candidate-set sizes are exact integer
# counts; recall is overlap with the exact top-10
# ---------------------------------------------------------------------------
def _ann_ledger_sql() -> str:
    nb = _LSH_NBITS
    cents = f"""cents AS (
      SELECT label, list(mean_v ORDER BY pos) AS centroid
      FROM (
        SELECT label, i AS pos,
               {_fx_mean('CAST(embedding[i] AS DOUBLE)')} AS mean_v
        FROM cands, UNNEST(generate_series(1, len(embedding))) AS t(i)
        GROUP BY label, i
      ) GROUP BY label
    )"""
    return f"""
    WITH cands AS (SELECT * FROM embeddings WHERE vec_id >= 5),
    q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings
          WHERE vec_id < 5),
    nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
    {cents},
    epairs AS (
      SELECT q.qid, e.vec_id AS cid, {_duck_cos('q.qvec', 'e.embedding')} AS sim
      FROM q, cands e
    ),
    exact AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
                 AS rank
        FROM epairs
      ) WHERE rank <= 10
    ),
    probe AS (
      SELECT qid, qvec, label,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY {_duck_cos('qvec', 'centroid')} DESC, label ASC)
               AS cell_rank
      FROM q, cents
    ),
    probed AS (SELECT qid, qvec, label FROM probe WHERE cell_rank <= 2),
    ipairs AS (
      SELECT p.qid, e.vec_id AS cid, {_duck_cos('p.qvec', 'e.embedding')} AS sim
      FROM probed p JOIN cands e ON e.label = p.label
    ),
    itop AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
                 AS rank
        FROM ipairs
      ) WHERE rank <= 10
    ),
    cbuck AS (
      SELECT vec_id AS cid, embedding AS cvec,
             {_duck_lsh_bucket('embedding', nb)} AS bucket
      FROM cands
    ),
    qbuck AS (
      SELECT qid, qvec, {_duck_lsh_bucket('qvec', nb)} AS bucket FROM q
    ),
    lpairs AS (
      SELECT qb.qid, cb.cid, {_duck_cos('qb.qvec', 'cb.cvec')} AS sim
      FROM cbuck cb JOIN qbuck qb ON qb.bucket = cb.bucket
    ),
    ltop AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC)
                 AS rank
        FROM lpairs
      ) WHERE rank <= 10
    ),
    ledger AS (
      SELECT 'brute' AS method,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM epairs) AS n_distances,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_hits
      UNION ALL
      SELECT 'ivf_nprobe2',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ipairs),
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM itop t JOIN exact x ON x.qid = t.qid AND x.cid = t.cid)
      UNION ALL
      SELECT 'lsh_4bit',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lpairs),
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM ltop t JOIN exact x ON x.qid = t.qid AND x.cid = t.cid)
    )
    SELECT l.method, l.n_distances, l.n_hits,
           ROUND(CAST(l.n_distances AS DOUBLE) / nq.n, 4)
             AS distances_per_query,
           ROUND(CAST(l.n_hits AS DOUBLE) / (10 * nq.n), 6) AS recall_at10,
           ROUND(CAST(l.n_distances AS DOUBLE) / l.n_hits, 4)
             AS distances_per_hit
    FROM ledger l CROSS JOIN nq
    ORDER BY l.method
    """


@register(
    "q245_ann_cost_ledger",
    _ann_ledger_sql(),
    doc="cross-method ANN economics: distance computations paid (exact "
    "candidate-pair counts) vs recall@10 bought, for brute force, "
    "IVF(nprobe=2), and 4-bit hyperplane LSH over the same query/"
    "candidate split — distances-per-hit is the number an index "
    "choice is actually made on. All counts exact integers on the "
    "certified q36/q37/q43 plans; recall joins run on 10-row-per-"
    "query toplists. The ledger view that makes q82/q178's per-"
    "family sweeps comparable ACROSS families",
)
def q245_ann_cost_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cands = e.filter(F.col("vec_id") >= 5)
    cv = cands.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    nq = q.count()
    # brute force: every (q, cand) pair is a distance computation
    exact = pin(
        sim.cosine_topk(q, cv, k=10).select("qid", "cid")
    )
    n_brute = cands.count() * nq
    # IVF: distances = centroid scans (tiny, excluded on both sides) +
    # candidates inside the probed cells
    cents = sim.label_centroids(cands)
    probe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "cent_sim",
            vector.cosine_similarity(F.col("qvec"), F.col("centroid")),
        )
    )
    from pyspark.sql.window import Window as W

    wp = W.partitionBy("qid").orderBy(F.desc("cent_sim"), F.asc("label"))
    probed = (
        probe.withColumn("cell_rank", F.row_number().over(wp))
        .filter(F.col("cell_rank") <= 2)
        .select("qid", "qvec", "label")
    )
    ipairs = pin(
        cands.join(F.broadcast(probed), "label").select(
            "qid",
            F.col("vec_id").alias("cid"),
            vector.cosine_similarity(F.col("qvec"), F.col("embedding")).alias(
                "sim"
            ),
        )
    )
    wr = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    itop = ipairs.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= 10
    )
    lsh_all = pin(
        sim.lsh_topk(q, cv, dim=_LSH_DIM, nbits=_LSH_NBITS, k=10**9)
    )
    ltop = lsh_all.filter(F.col("rank") <= 10)

    def row(method, n_dist_df_or_int, top):
        hits = top.join(exact, ["qid", "cid"]).count()
        nd = (
            n_dist_df_or_int
            if isinstance(n_dist_df_or_int, int)
            else n_dist_df_or_int.count()
        )
        return (method, nd, hits)

    rows = [
        row("brute", n_brute, exact),
        row("ivf_nprobe2", ipairs, itop),
        row("lsh_4bit", lsh_all, ltop),
    ]
    out = spark.createDataFrame(
        rows, "method string, n_distances long, n_hits long"
    )
    return out.select(
        "method",
        "n_distances",
        "n_hits",
        F.round(F.col("n_distances").cast("double") / nq, 4).alias(
            "distances_per_query"
        ),
        F.round(F.col("n_hits").cast("double") / (10 * nq), 6).alias(
            "recall_at10"
        ),
        F.round(
            F.col("n_distances").cast("double") / F.col("n_hits"), 4
        ).alias("distances_per_hit"),
    ).orderBy("method")


# ---------------------------------------------------------------------------
# q246 — sketch ROLLUP up the time hierarchy: per-day HLL registers of
# distinct users merged into monthly and total registers by
# elementwise MAX — months and the grand total cost NO rescan of the
# events table, the exact warehouse pattern that makes sketches (not
# counts) the thing you materialize. Exact audit columns ride along
# ---------------------------------------------------------------------------
def _hll_rollup_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    idx = hash_bucket_sql("t", _HLL_M)
    v = "CAST(0 AS BIGINT)"
    for i in range(8, 20):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5(CAST(t AS VARCHAR)), {i}, 1)) - 1)"
        )
    rho = (
        f"CASE WHEN ({v}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS} - length(bin({v})) + 1 END"
    )
    est = _hll_estimate_expr("s.sum_fx", "s.zeros")
    lvl_sum = f"""
      SELECT period,
             CAST(SUM(CAST(POW(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + CAST(({_HLL_M} - COUNT(*)) AS BIGINT) * {_HLL_FX} AS sum_fx,
             CAST({_HLL_M} - COUNT(*) AS INT) AS zeros
    """
    return f"""
    WITH items AS (
      SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS day, user_id AS t
      FROM events
    ),
    dayregs AS (
      SELECT day, {idx} AS reg, CAST(MAX({rho}) AS INT) AS rho
      FROM items GROUP BY 1, 2
    ),
    daysum AS ({lvl_sum.replace('period', "strftime(day, '%Y-%m-%d') AS period")}
      FROM dayregs GROUP BY day),
    monregs AS (
      SELECT strftime(day, '%Y-%m') AS mon, reg, CAST(MAX(rho) AS INT) AS rho
      FROM dayregs GROUP BY 1, 2
    ),
    monsum AS ({lvl_sum.replace('period', 'mon AS period')}
      FROM monregs GROUP BY mon),
    totregs AS (SELECT reg, CAST(MAX(rho) AS INT) AS rho
                FROM dayregs GROUP BY 1),
    totsum AS ({lvl_sum.replace('period', "'ALL' AS period")}
      FROM totregs GROUP BY 1=1),
    dayex AS (SELECT strftime(day, '%Y-%m-%d') AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact
              FROM items GROUP BY 1),
    monex AS (SELECT strftime(day, '%Y-%m') AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact
              FROM items GROUP BY 1),
    totex AS (SELECT 'ALL' AS period,
                     CAST(COUNT(DISTINCT t) AS BIGINT) AS n_exact FROM items),
    lv AS (
      SELECT 'day' AS level, s.period, s.sum_fx, s.zeros, e.n_exact
      FROM daysum s JOIN dayex e USING (period)
      UNION ALL
      SELECT 'month', s.period, s.sum_fx, s.zeros, e.n_exact
      FROM monsum s JOIN monex e USING (period)
      UNION ALL
      SELECT 'total', s.period, s.sum_fx, s.zeros, e.n_exact
      FROM totsum s JOIN totex e USING (period)
    )
    SELECT level, period, n_exact, s.zeros, s.sum_fx,
           {est} AS estimate,
           ABS({est} - n_exact) / n_exact <= 0.39 AS within_3sigma
    FROM lv s
    ORDER BY level, period
    """


@register(
    "q246_hll_time_rollup",
    _hll_rollup_sql(),
    doc="mergeable-sketch rollup: per-day HLL registers of distinct "
    "users (q136's deterministic md5 construction), merged into "
    "monthly and grand-total registers by elementwise MAX — the "
    "month/total estimates NEVER rescan events, which is the entire "
    "reason a warehouse materializes sketches instead of counts "
    "(distincts don't add; registers do merge). Exact per-level "
    "audits and 3-sigma bounds ride along as the columns a real "
    "deployment drops. One events scan, day-register state is "
    "|days| x 64 integers",
)
def q246_hll_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    items = pin(
        e.select(
            F.date_trunc("day", "ts").alias("day"), F.col("user_id").alias("t")
        ).distinct()
    )
    h = F.md5(F.col("t").cast("string"))
    v = F.lit(0).cast("long")
    for i in range(8, 20):
        v = v * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        )
    rho = F.when(v == 0, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        F.lit(_HLL_RHO_BITS) - F.length(F.bin(v)) + 1
    )
    dayregs = pin(
        items.select(
            "day", hash_bucket(F.col("t"), _HLL_M).alias("reg"), rho.alias("__rho")
        )
        .groupBy("day", "reg")
        .agg(F.max("__rho").cast("int").alias("rho"))
    )

    def lvl_sum(regs, period_col):
        return regs.groupBy(period_col.alias("period")).agg(
            (
                F.sum(
                    F.pow(F.lit(2), F.lit(49) - F.col("rho")).cast("long")
                ).cast("long")
                + (F.lit(_HLL_M) - F.count("*")).cast("long") * F.lit(_HLL_FX)
            ).alias("sum_fx"),
            (F.lit(_HLL_M) - F.count("*")).cast("int").alias("zeros"),
        )

    daysum = lvl_sum(dayregs, F.date_format("day", "yyyy-MM-dd"))
    monregs = dayregs.groupBy(
        F.date_format("day", "yyyy-MM").alias("mon"), "reg"
    ).agg(F.max("rho").cast("int").alias("rho"))
    monsum = lvl_sum(monregs, F.col("mon"))
    totregs = dayregs.groupBy("reg").agg(F.max("rho").cast("int").alias("rho"))
    totsum = lvl_sum(totregs.withColumn("k", F.lit("ALL")), F.col("k"))
    dayex = items.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("period")
    ).agg(F.countDistinct("t").cast("long").alias("n_exact"))
    monex = items.groupBy(
        F.date_format("day", "yyyy-MM").alias("period")
    ).agg(F.countDistinct("t").cast("long").alias("n_exact"))
    totex = items.agg(
        F.lit("ALL").alias("period"),
        F.countDistinct("t").cast("long").alias("n_exact"),
    )
    lv = (
        daysum.join(dayex, "period").withColumn("level", F.lit("day"))
        .unionByName(
            monsum.join(monex, "period").withColumn("level", F.lit("month"))
        )
        .unionByName(
            totsum.join(totex, "period").withColumn("level", F.lit("total"))
        )
    )
    m = _HLL_M
    raw = (
        F.lit(0.7213 / (1.0 + 1.079 / m))
        * m
        * m
        / (F.col("sum_fx").cast("double") / float(_HLL_FX))
    )
    est = F.round(
        F.when(
            (raw <= 2.5 * m) & (F.col("zeros") > 0),
            m * F.log(F.lit(float(m)) / F.col("zeros")),
        ).otherwise(raw),
        4,
    )
    return lv.select(
        "level",
        "period",
        "n_exact",
        "zeros",
        "sum_fx",
        est.alias("estimate"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.39).alias(
            "within_3sigma"
        ),
    ).orderBy("level", "period")


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
    daily = pin(
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
    dev = pin(
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
# q250 — training-readiness gate: CI for the corpus. Five cheap audit
# signals this workload certifies individually — dup inflation (q206),
# mixture design effect (q214), epoch-shuffle decorrelation (q228),
# max cross-source KS drift (q203), and the hapax floor (q249) —
# recomputed in ONE plan as named verdicts plus the overall PASS bit
# that a pipeline can block a training launch on
# ---------------------------------------------------------------------------
def _readiness_sql() -> str:
    kish = _kish_sql("documents", "//")
    return rf"""
    WITH tok AS (
      SELECT doc_id, md5(text) AS fp,
             CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    keep AS (SELECT MIN(doc_id) AS kid FROM tok GROUP BY fp),
    infl AS (
      SELECT CAST(SUM(n) AS DOUBLE)
             / SUM(CASE WHEN k.kid IS NOT NULL THEN n ELSE 0 END) AS inflation
      FROM tok LEFT JOIN keep k ON k.kid = tok.doc_id
    ),
    kish AS (SELECT deff FROM ({kish})),
    ranks AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e1|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r1,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5('e2|' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS r2
      FROM documents
    ),
    rho AS (
      SELECT ABS(1e0 - 6e0 * SUM((r1 - r2) * (r1 - r2))
                 / (CAST(COUNT(*) AS DOUBLE)
                    * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1e0))) AS a,
             3e0 / sqrt(CAST(COUNT(*) AS DOUBLE)) AS bound
      FROM ranks
    ),
    src AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM src GROUP BY 1),
    vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    saxis AS (
      SELECT t.source, t.n, a.v, COALESCE(s.c, CAST(0 AS BIGINT)) AS cv
      FROM stot t CROSS JOIN vals a
      LEFT JOIN src s ON s.source = t.source AND s.n_chars = a.v
    ),
    scum AS (
      SELECT source, n, v,
             CAST(SUM(cv) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cc
      FROM saxis
    ),
    ksmax AS (
      SELECT MAX(CAST(ABS(a.cc * b.n - b.cc * a.n) AS DOUBLE)
                 / (CAST(a.n AS DOUBLE) * b.n)) AS d
      FROM scum a JOIN scum b ON a.v = b.v AND a.source < b.source
    ),
    hap AS (
      SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hapax
      FROM (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
                        '\s+'), x -> x <> '')) AS term
          FROM documents
        ) GROUP BY term
      )
    )
    SELECT ROUND(i.inflation, 4) AS dup_inflation,
           CAST(i.inflation <= 1.5e0 AS INT) AS dup_ok,
           ROUND(k.deff, 4) AS mixture_deff,
           CAST(k.deff <= 2e0 AS INT) AS mixture_ok,
           ROUND(r.a, 6) AS shuffle_abs_rho,
           CAST(r.a < r.bound AS INT) AS shuffle_ok,
           ROUND(m.d, 6) AS max_ks_drift,
           CAST(m.d <= 0.3e0 AS INT) AS drift_ok,
           ROUND(h.hapax, 6) AS hapax_frac,
           CAST(h.hapax >= 0.05e0 AS INT) AS richness_ok,
           CAST(i.inflation <= 1.5e0 AND k.deff <= 2e0 AND r.a < r.bound
                AND m.d <= 0.3e0 AND h.hapax >= 0.05e0 AS INT) AS ready
    FROM infl i CROSS JOIN kish k CROSS JOIN rho r
    CROSS JOIN ksmax m CROSS JOIN hap h
    """


@register(
    "q250_training_readiness",
    _readiness_sql(),
    doc="the launch gate: five independently-certified audit rules "
    "(q206 dup inflation <= 1.5, q214 Kish design effect <= 2, q228 "
    "epoch-shuffle |rho| under 3/sqrt(n), q203 max cross-source KS "
    "drift <= 0.3, q249 hapax fraction >= 0.05) recomputed in one "
    "declarative plan as named verdict bits plus the overall `ready` "
    "flag — continuous integration for the corpus itself, the row a "
    "training launch blocks on. Each signal keeps its certified "
    "shape (fingerprint aggregate, IPF chain, rank windows, bounded "
    "KS axis, vocab aggregate); the gate is their one-row cross join",
)
def q250_training_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents_q250")
    # signal 1: dup inflation (q206 rule)
    tok = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        )
        .cast("long")
        .alias("n"),
    )
    keep = tok.groupBy("fp").agg(F.min("doc_id").alias("kid"))
    infl = (
        tok.join(keep, tok["doc_id"] == keep["kid"], "left")
        .agg(
            (
                F.sum("n").cast("double")
                / F.sum(F.when(F.col("kid").isNotNull(), F.col("n")).otherwise(0))
            ).alias("inflation")
        )
    )
    # signal 2: Kish design effect over the raking weights (q214 chain)
    kish = spark.sql(_kish_sql("documents_q250", " div ")).select("deff")
    # signal 3: epoch-shuffle decorrelation (q228 rule)
    key = lambda e: F.md5(  # noqa: E731
        F.concat(F.lit(e + "|"), F.col("doc_id").cast("string"))
    )
    ranks = d.select(
        F.row_number().over(W.orderBy(key("e1"), "doc_id")).cast("long").alias("r1"),
        F.row_number().over(W.orderBy(key("e2"), "doc_id")).cast("long").alias("r2"),
    )
    nd = F.count("*").cast("double")
    rho = ranks.agg(
        F.abs(
            1.0
            - 6.0
            * F.sum((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2")))
            / (nd * (nd * F.count("*") - 1.0))
        ).alias("a"),
        (3.0 / F.sqrt(nd)).alias("bound"),
    )
    # signal 4: max cross-source KS drift (q203 machinery, max only)
    src = d.groupBy("source", "n_chars").agg(F.count("*").cast("long").alias("c"))
    stot = src.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    vals = d.select(F.col("n_chars").alias("v")).distinct()
    saxis = (
        stot.select(F.col("source").alias("s"), "n")
        .crossJoin(vals)
        .join(
            src.select(
                F.col("source").alias("s2"), F.col("n_chars").alias("v2"), "c"
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
    scum = saxis.select(
        "source",
        "n",
        "v",
        F.sum("cv")
        .over(
            W.partitionBy("source").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("cc"),
    )
    a = scum.select(
        F.col("source").alias("sa"), F.col("n").alias("na"), "v",
        F.col("cc").alias("ca"),
    )
    b = scum.select(
        F.col("source").alias("sb"), F.col("n").alias("nb"),
        F.col("v").alias("vb"), F.col("cc").alias("cb"),
    )
    ksmax = (
        a.join(b, (F.col("v") == F.col("vb")) & (F.col("sa") < F.col("sb")))
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
                .cast("double")
                / (F.col("na").cast("double") * F.col("nb"))
            ).alias("d")
        )
    )
    # signal 5: hapax floor (q249 rule, global)
    vocab = d.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
                lambda x: x != F.lit(""),
            )
        ).alias("term")
    ).groupBy("term").agg(F.count("*").cast("long").alias("c"))
    hap = vocab.agg(
        (
            F.sum((F.col("c") == 1).cast("int")).cast("double") / F.count("*")
        ).alias("hapax")
    )
    row = (
        infl.crossJoin(F.broadcast(kish))
        .crossJoin(F.broadcast(rho))
        .crossJoin(F.broadcast(ksmax))
        .crossJoin(F.broadcast(hap))
    )
    ready = (
        (F.col("inflation") <= 1.5)
        & (F.col("deff") <= 2.0)
        & (F.col("a") < F.col("bound"))
        & (F.col("d") <= 0.3)
        & (F.col("hapax") >= 0.05)
    )
    return row.select(
        F.round("inflation", 4).alias("dup_inflation"),
        (F.col("inflation") <= 1.5).cast("int").alias("dup_ok"),
        F.round("deff", 4).alias("mixture_deff"),
        (F.col("deff") <= 2.0).cast("int").alias("mixture_ok"),
        F.round("a", 6).alias("shuffle_abs_rho"),
        (F.col("a") < F.col("bound")).cast("int").alias("shuffle_ok"),
        F.round("d", 6).alias("max_ks_drift"),
        (F.col("d") <= 0.3).cast("int").alias("drift_ok"),
        F.round("hapax", 6).alias("hapax_frac"),
        (F.col("hapax") >= 0.05).cast("int").alias("richness_ok"),
        ready.cast("int").alias("ready"),
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
# q252 — Theil-Sen robust trend: the median of all pairwise slopes of
# each type's daily series — the trend estimate one crazy outage day
# cannot drag (unlike q176/q210's least squares). Pairwise slopes are
# exact rationals evaluated identically; the O(days^2) pair set is
# bounded because the time axis is days, not rows
# ---------------------------------------------------------------------------
@register(
    "q252_theil_sen_trend",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS i
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / (b.i - a.i) AS s
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type AND b.i > a.i
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(median(s) AS DOUBLE), 6) AS theil_sen_slope,
           ROUND(CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_rising
    FROM slopes GROUP BY event_type ORDER BY event_type
    """,
    doc="Theil-Sen slope per event type over observed daily counts: "
    "every day-pair's slope (integer difference ratios — exact "
    "rationals in doubles), the median slope (interpolating one exact "
    "IEEE midpoint at most), and the fraction of rising pairs (a "
    "Mann-Kendall-style direction signal). Breakdown point 29% vs "
    "OLS's zero: one corrupted day moves q176's fit but not this. "
    "The pair join is |days|^2-bounded per type after one day "
    "aggregate of the corpus",
)
def q252_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    idx = pin(
        daily.select(
            "event_type",
            "n",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("day"))
            .cast("long")
            .alias("i"),
        )
    )
    a = idx.select("event_type", F.col("n").alias("na"), F.col("i").alias("ia"))
    b = idx.select(
        F.col("event_type").alias("et2"),
        F.col("n").alias("nb"),
        F.col("i").alias("ib"),
    )
    slopes = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("ib") > F.col("ia"))
    ).select(
        "event_type",
        ((F.col("nb") - F.col("na")).cast("double") / (F.col("ib") - F.col("ia"))).alias(
            "s"
        ),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.median("s").cast("double"), 6).alias("theil_sen_slope"),
            F.round(
                F.sum((F.col("s") > 0).cast("int")).cast("double") / F.count("*"),
                6,
            ).alias("frac_rising"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q253 — change-point localization by binary segmentation: the single
# split of each type's gap-filled daily series that maximizes the
# between-segment sum of squares — WHERE the level shifted, the
# complement of q192's CUSUM (which says THAT and roughly when it
# drifted). Scores are integer-cross-multiplied before one double
# division, argmax under a (score, day) total order
# ---------------------------------------------------------------------------
@register(
    "q253_binseg_changepoint",
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
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    cum AS (
      SELECT event_type, day, n,
             CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS s1,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS k,
             CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nt
      FROM filled
    ),
    scored AS (
      SELECT event_type, day, k, s1, s, nt,
             CAST((s1 * nt - s * k) * (s1 * nt - s * k) AS DOUBLE)
               / (CAST(k AS DOUBLE) * (nt - k) * nt * nt) AS bss,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY
               CAST((s1 * nt - s * k) * (s1 * nt - s * k) AS DOUBLE)
                 / (CAST(k AS DOUBLE) * (nt - k) * nt * nt) DESC, day)
               AS rn
      FROM cum WHERE k < nt
    )
    SELECT event_type,
           strftime(day + INTERVAL '1 day', '%Y-%m-%d') AS shift_day,
           CAST(nt AS INT) AS n_days,
           ROUND(CAST(s1 AS DOUBLE) / k, 6) AS mean_before,
           ROUND(CAST(s - s1 AS DOUBLE) / (nt - k), 6) AS mean_after,
           ROUND(CAST(s - s1 AS DOUBLE) / (nt - k)
                 - CAST(s1 AS DOUBLE) / k, 6) AS level_shift,
           ROUND(bss, 6) AS bss_score
    FROM scored WHERE rn = 1 ORDER BY event_type
    """,
    doc="binary-segmentation change-point per type: one prefix-sum "
    "window gives every candidate split's between-segment score "
    "(s1*N - S*k cross-multiplied as exact BIGINTs, squared, one "
    "double division), argmax under (score desc, day) picks the "
    "boundary, and the output names the first day of the NEW level "
    "with both segment means and the shift. CUSUM (q192) alarms; "
    "this localizes — together they are the drift post-mortem. All "
    "work beyond the day aggregate is O(days) per type",
)
def q253_binseg_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

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
        "event_type", "day", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    wp = W.partitionBy("event_type")
    cum = filled.select(
        "event_type",
        "day",
        F.sum("n")
        .over(wp.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("s1"),
        F.row_number().over(wp.orderBy("day")).cast("long").alias("k"),
        F.sum("n").over(wp).cast("long").alias("s"),
        F.count("*").over(wp).cast("long").alias("nt"),
    ).filter(F.col("k") < F.col("nt"))
    num = (F.col("s1") * F.col("nt") - F.col("s") * F.col("k"))
    bss = (num * num).cast("double") / (
        F.col("k").cast("double")
        * (F.col("nt") - F.col("k"))
        * F.col("nt")
        * F.col("nt")
    )
    scored = cum.withColumn("bss", bss).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("bss").desc(), "day")
        ),
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format(
                F.col("day") + F.expr("interval 1 day"), "yyyy-MM-dd"
            ).alias("shift_day"),
            F.col("nt").cast("int").alias("n_days"),
            F.round(F.col("s1").cast("double") / F.col("k"), 6).alias(
                "mean_before"
            ),
            F.round(
                (F.col("s") - F.col("s1")).cast("double")
                / (F.col("nt") - F.col("k")),
                6,
            ).alias("mean_after"),
            F.round(
                (F.col("s") - F.col("s1")).cast("double")
                / (F.col("nt") - F.col("k"))
                - F.col("s1").cast("double") / F.col("k"),
                6,
            ).alias("level_shift"),
            F.round("bss", 6).alias("bss_score"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q254 — bot heuristics: users flagged by the composite every abuse
# team starts from — extreme volume (MAD fence over per-user counts),
# collapsed behavioral diversity (q219's Gini-Simpson), and
# machine-regular inter-arrival gaps (MAD-to-median ratio of the
# user's own gap series). Exact integer/rational signals throughout
# ---------------------------------------------------------------------------
@register(
    "q254_bot_heuristics",
    """
    WITH ue AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
             1e0 - CAST(SUM(c * c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) * SUM(c)) AS diversity
      FROM ue GROUP BY 1
    ),
    vol AS (
      SELECT CAST(median(n_events) AS DOUBLE) AS med FROM u
    ),
    volmad AS (
      SELECT CAST(median(ABS(u.n_events - v.med)) AS DOUBLE) AS mad,
             MAX(v.med) AS med
      FROM u CROSS JOIN vol v GROUP BY ()
    ),
    gaps AS (
      SELECT user_id,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) // 60000000 AS g
      FROM events
    ),
    greg AS (
      SELECT user_id,
             CAST(median(g) AS DOUBLE) AS med_gap,
             CAST(median(ABS(g - (SELECT median(g2.g) FROM gaps g2
                                  WHERE g2.user_id = gaps.user_id
                                    AND g2.g IS NOT NULL))) AS DOUBLE)
               AS mad_gap,
             CAST(COUNT(g) AS BIGINT) AS n_gaps
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    )
    SELECT u.user_id, u.n_events,
           ROUND(u.diversity, 6) AS diversity,
           ROUND(g.med_gap, 4) AS median_gap_min,
           ROUND(g.mad_gap, 4) AS gap_mad,
           CAST(u.n_events > v.med + 5e0 * v.mad AS INT) AS volume_flag,
           CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
             AS monotony_flag,
           CAST(g.n_gaps >= 10 AND g.med_gap > 0
                AND g.mad_gap / g.med_gap < 0.1e0 AS INT) AS regularity_flag,
           CAST(u.n_events > v.med + 5e0 * v.mad AS INT)
             + CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
             + CAST(g.n_gaps >= 10 AND g.med_gap > 0
                    AND g.mad_gap / g.med_gap < 0.1e0 AS INT) AS bot_score
    FROM u
    JOIN greg g ON g.user_id = u.user_id
    CROSS JOIN volmad v
    WHERE CAST(u.n_events > v.med + 5e0 * v.mad AS INT)
        + CAST(u.diversity < 0.2e0 AND u.n_events >= 10 AS INT)
        + CAST(g.n_gaps >= 10 AND g.med_gap > 0
               AND g.mad_gap / g.med_gap < 0.1e0 AS INT) >= 1
    ORDER BY u.user_id
    """,
    doc="composite bot screen: per-user event volume against the "
    "population MAD fence, Gini-Simpson behavioral diversity under "
    "0.2 (single-minded automation), and inter-arrival regularity "
    "(per-user gap MAD under 10% of the median gap — humans are "
    "bursty, schedulers are not), emitted as three flags plus their "
    "sum for users tripping any. Medians over integers interpolate "
    "one exact midpoint; everything else is integer ratios. One "
    "(user, type) aggregate + one user-keyed gap window + tiny "
    "broadcast fences",
)
def q254_bot_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    ue = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    u = ue.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        (
            1.0
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c").cast("double") * F.sum("c"))
        ).alias("diversity"),
    )
    vol = u.agg(F.median("n_events").cast("double").alias("med"))
    volmad = (
        u.crossJoin(F.broadcast(vol))
        .agg(
            F.median(F.abs(F.col("n_events") - F.col("med")))
            .cast("double")
            .alias("mad"),
            F.max("med").alias("med"),
        )
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", us.alias("us"), F.lag(us).over(ow).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("user_id", F.expr("(us - p) div 60000000").alias("g"))
    )
    greg = gaps.groupBy("user_id").agg(
        F.median("g").cast("double").alias("med_gap"),
        F.count("*").cast("long").alias("n_gaps"),
    )
    gmad = (
        gaps.join(greg.select("user_id", "med_gap"), "user_id")
        .groupBy("user_id")
        .agg(
            F.median(F.abs(F.col("g") - F.col("med_gap")))
            .cast("double")
            .alias("mad_gap")
        )
    )
    j = (
        u.join(greg, "user_id")
        .join(gmad, "user_id")
        .crossJoin(F.broadcast(volmad))
    )
    vflag = (F.col("n_events") > F.col("med") + 5.0 * F.col("mad")).cast("int")
    mflag = ((F.col("diversity") < 0.2) & (F.col("n_events") >= 10)).cast("int")
    rflag = (
        (F.col("n_gaps") >= 10)
        & (F.col("med_gap") > 0)
        & (F.col("mad_gap") / F.col("med_gap") < 0.1)
    ).cast("int")
    return (
        j.filter(vflag + mflag + rflag >= 1)
        .select(
            "user_id",
            "n_events",
            F.round("diversity", 6).alias("diversity"),
            F.round("med_gap", 4).alias("median_gap_min"),
            F.round("mad_gap", 4).alias("gap_mad"),
            vflag.alias("volume_flag"),
            mflag.alias("monotony_flag"),
            rflag.alias("regularity_flag"),
            (vflag + mflag + rflag).alias("bot_score"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q255 — absorbing-chain conversion analysis: from each event type,
# the probability of reaching 'purchase' within T steps and the
# expected number of steps conditional on arriving — q193's transition
# matrix treated as an absorbing Markov chain (purchase absorbs), the
# truncated Neumann recursion replayed per step in oracle CTEs with
# the same 2^30 fixed-point floor arithmetic
# ---------------------------------------------------------------------------
_ABS_STEPS = 8


def _absorption_sql(T: int = _ABS_STEPS, s: int = _MKV_SCALE) -> str:
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
        f"""tfx AS (
      SELECT t.src, t.dst, (t.cnt * {s}) // r.tot AS p_fx
      FROM trans t JOIN rowtot r USING (src)
    )""",
        "types AS (SELECT DISTINCT event_type FROM events)",
        # a0: probability of being absorbed in exactly 0 further steps
        f"""a0 AS (
      SELECT event_type,
             CAST(0 AS BIGINT) AS p_abs, CAST(0 AS BIGINT) AS e_steps
      FROM types
    )""",
    ]
    for t in range(1, T + 1):
        # p_abs{t}[i] = P(absorbed within t steps from i)
        #            = p(i->purchase) + sum_{j transient} p(i->j) * p_abs{t-1}[j]
        # e_steps accumulates sum over step index k of k * P(absorb at k)
        ctes.append(
            f"""a{t} AS (
      SELECT ty.event_type,
             COALESCE(d.direct, CAST(0 AS BIGINT))
               + COALESCE(c.carry, CAST(0 AS BIGINT)) AS p_abs,
             COALESCE(d.direct, CAST(0 AS BIGINT))
               + COALESCE(c.ecarry, CAST(0 AS BIGINT)) AS e_steps
      FROM types ty
      LEFT JOIN (
        SELECT src AS event_type, p_fx AS direct FROM tfx
        WHERE dst = 'purchase' AND src <> 'purchase'
      ) d ON d.event_type = ty.event_type
      LEFT JOIN (
        SELECT t.src AS event_type,
               CAST(SUM(t.p_fx * a.p_abs // {s}) AS BIGINT) AS carry,
               CAST(SUM(t.p_fx * (a.p_abs + a.e_steps) // {s}) AS BIGINT)
                 AS ecarry
        FROM tfx t JOIN a{t - 1} a ON a.event_type = t.dst
        WHERE t.dst <> 'purchase' AND t.src <> 'purchase'
        GROUP BY t.src
      ) c ON c.event_type = ty.event_type
    )"""
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT a.event_type,
           CAST(a.p_abs AS BIGINT) AS p_absorb_fx,
           ROUND(CAST(a.p_abs AS DOUBLE) / {s}, 6) AS p_absorb,
           CASE WHEN a.p_abs > 0
                THEN ROUND(CAST(a.e_steps AS DOUBLE) / a.p_abs, 4) END
             AS mean_steps_given_absorbed
    FROM a{_ABS_STEPS} a
    WHERE a.event_type <> 'purchase'
    ORDER BY a.event_type
    """


@register(
    "q255_absorption_analysis",
    _absorption_sql(),
    doc=f"absorbing-chain funnel analysis: with 'purchase' absorbing, "
    f"the {_ABS_STEPS}-step truncated recursion p_t(i) = p(i->abs) + "
    "sum_j p(i->j) p_(t-1)(j) over q193's fixed-point transition "
    "matrix, carrying alongside the step-weighted mass that yields "
    "E[steps | absorbed] — every iteration replayed verbatim as an "
    "oracle CTE in the same floor-division arithmetic. 'How far is "
    "each behavior from the money' — the summary a growth team draws "
    "the funnel around. One window pass + one pair aggregate over "
    "events; the recursion runs on the |types|^2 matrix",
)
def q255_absorption_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    tfx = pin(
        trans.join(rowtot, "src").select(
            "src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx")
        )
    )
    types = e.select("event_type").distinct()
    direct = tfx.filter(
        (F.col("dst") == "purchase") & (F.col("src") != "purchase")
    ).select(F.col("src").alias("event_type"), F.col("p_fx").alias("direct"))
    a = types.select(
        "event_type",
        F.lit(0).cast("long").alias("p_abs"),
        F.lit(0).cast("long").alias("e_steps"),
    )
    for _ in range(_ABS_STEPS):
        carry = (
            tfx.filter((F.col("dst") != "purchase") & (F.col("src") != "purchase"))
            .join(
                a.select(
                    F.col("event_type").alias("jt"),
                    F.col("p_abs").alias("pa"),
                    F.col("e_steps").alias("es"),
                ),
                F.col("dst") == F.col("jt"),
            )
            .groupBy("src")
            .agg(
                F.sum(F.expr(f"(p_fx * pa) div {s}")).cast("long").alias("carry"),
                F.sum(F.expr(f"(p_fx * (pa + es)) div {s}"))
                .cast("long")
                .alias("ecarry"),
            )
        )
        a = (
            types.join(F.broadcast(direct), "event_type", "left")
            .join(
                F.broadcast(carry.withColumnRenamed("src", "event_type")),
                "event_type",
                "left",
            )
            .select(
                "event_type",
                (
                    F.coalesce("direct", F.lit(0).cast("long"))
                    + F.coalesce("carry", F.lit(0).cast("long"))
                ).alias("p_abs"),
                (
                    F.coalesce("direct", F.lit(0).cast("long"))
                    + F.coalesce("ecarry", F.lit(0).cast("long"))
                ).alias("e_steps"),
            )
        )
    return (
        a.filter(F.col("event_type") != "purchase")
        .select(
            "event_type",
            F.col("p_abs").alias("p_absorb_fx"),
            F.round(F.col("p_abs").cast("double") / s, 6).alias("p_absorb"),
            F.when(
                F.col("p_abs") > 0,
                F.round(F.col("e_steps").cast("double") / F.col("p_abs"), 4),
            ).alias("mean_steps_given_absorbed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q256 — diminishing-novelty curve: simulate ingesting the corpus in
# ten deterministic waves and measure, per wave, how many documents
# are content-NOVEL vs already seen in earlier waves — the marginal
# value-of-more-data curve that decides when another crawl batch
# stops paying (doc-level complement of q175's n-gram novelty)
# ---------------------------------------------------------------------------
def _novelty_curve_sql() -> str:
    b = _hash_bucket_duck("doc_id", 10)
    return f"""
    WITH t AS (
      SELECT doc_id, md5(text) AS fp, {b} AS wave FROM documents
    ),
    firsts AS (
      SELECT fp, MIN(wave * 10000000000 + doc_id) AS fk FROM t GROUP BY fp
    ),
    marked AS (
      SELECT t.wave,
             CASE WHEN t.wave * 10000000000 + t.doc_id = f.fk
                  THEN 1 ELSE 0 END AS novel
      FROM t JOIN firsts f ON f.fp = t.fp
    ),
    per AS (
      SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(novel) AS BIGINT) AS n_novel
      FROM marked GROUP BY 1
    )
    SELECT CAST(wave AS INT) AS wave, n_docs, n_novel,
           ROUND(1e0 - CAST(n_novel AS DOUBLE) / n_docs, 6) AS dup_rate,
           CAST(SUM(n_novel) OVER (ORDER BY wave
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_unique
    FROM per ORDER BY wave
    """


@register(
    "q256_novelty_curve",
    _novelty_curve_sql(),
    doc="ingestion-wave novelty curve: documents assigned to ten "
    "deterministic md5 waves, each content fingerprint credited as "
    "novel exactly once — at its first (wave, doc_id) occurrence "
    "(one integer composite key, collision-free since doc_id < 1e10) "
    "— yielding per-wave dup rates and the cumulative unique count. "
    "A flattening cum_unique curve is the 'more crawl buys less' "
    "signal that caps acquisition spend. One fingerprint aggregate + "
    "one join; the curve is 10 rows",
)
def q256_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        hash_bucket(F.col("doc_id"), 10).alias("wave"),
    )
    key = F.col("wave").cast("long") * 10_000_000_000 + F.col("doc_id")
    firsts = t.select("fp", key.alias("k")).groupBy("fp").agg(
        F.min("k").alias("fk")
    )
    marked = t.join(firsts, "fp").select(
        "wave", (key == F.col("fk")).cast("int").alias("novel")
    )
    per = marked.groupBy("wave").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("novel").cast("long").alias("n_novel"),
    )
    return per.select(
        F.col("wave").cast("int").alias("wave"),
        "n_docs",
        "n_novel",
        F.round(1.0 - F.col("n_novel").cast("double") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
        F.sum("n_novel")
        .over(W.orderBy("wave").rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_unique"),
    ).orderBy("wave")


# ---------------------------------------------------------------------------
# q257 — Holt-Winters MULTIPLICATIVE seasonality: the variant q201's
# additive model cannot express — seasonal swings that scale with the
# level (a type that doubles its volume doubles its weekend dip).
# Same fold discipline as q201: dyadic constants, strictly sequential
# day-ordered recursion, every arithmetic op IEEE (+ * / abs — division
# is correctly rounded, unlike pow), so both engines produce
# bit-identical doubles without a single libm call.
# ---------------------------------------------------------------------------
@register(
    "q257_holt_winters_multiplicative",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, list(CAST(n AS DOUBLE) ORDER BY day) AS xs
      FROM daily GROUP BY event_type
      HAVING COUNT(*) >= 8
    ),
    init AS (
      SELECT event_type, xs,
             ((((((xs[1] + xs[2]) + xs[3]) + xs[4]) + xs[5]) + xs[6]) + xs[7])
               / 7e0 AS lvl0
      FROM series
    ),
    hw AS (
      SELECT event_type, xs, 7 AS i, lvl0 AS level, 0e0 AS trend, 0e0 AS err,
             [xs[j] / lvl0 FOR j IN generate_series(1, 7)] AS seas
      FROM init
      UNION ALL
      SELECT event_type, xs, i + 1,
             0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
               + 0.75e0 * (level + trend),
             0.125e0 * ((0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
                         + 0.75e0 * (level + trend)) - level)
               + 0.875e0 * trend,
             err + abs(xs[i+1] - (level + trend) * seas[(i % 7) + 1]),
             list_transform(seas, (s, j) -> CASE WHEN j = (i % 7) + 1
               THEN 0.25e0 * (xs[i+1]
                              / (0.25e0 * (xs[i+1] / seas[(i % 7) + 1])
                                 + 0.75e0 * (level + trend)))
                    + 0.75e0 * s
               ELSE s END)
      FROM hw WHERE i < len(xs)
    )
    SELECT event_type, CAST(len(xs) AS INT) AS n_days,
           ROUND(level, 6) AS level,
           ROUND(trend, 6) AS trend,
           ROUND((level + trend) * seas[(len(xs) % 7) + 1], 6) AS forecast_next,
           ROUND(list_aggregate(seas, 'max') / list_aggregate(seas, 'min'), 6)
             AS season_ratio,
           ROUND(err / (len(xs) - 7), 6) AS mae_1step
    FROM hw WHERE i = len(xs)
    ORDER BY event_type
    """,
    doc="Holt-Winters multiplicative smoothing with weekly seasonality "
    "over per-type daily counts — seasonal factors are RATIOS to the "
    "level (initialized as first-week xs/level ratios), so the model "
    "fits series whose weekly swing grows with volume, where q201's "
    "additive offsets lag. Updates: level = a*(x/seas) + "
    "(1-a)*(level+trend), seas = g*(x/new_level) + (1-g)*seas, with "
    "dyadic a=g=1/4, b=1/8; one-step errors scored against "
    "(level+trend)*seas along the fold; season_ratio = max/min factor "
    "(peak-to-trough multiplier). Daily counts are >= 1 so every "
    "divisor stays positive. Corpus work is one day aggregate; the "
    "fold is O(days) per type — identical shuffle profile to q201",
)
def q257_holt_winters_multiplicative(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "n"))),
                lambda s: s["n"].cast("double"),
            ).alias("xs")
        )
        .filter(F.size("xs") >= 8)
    )
    x = [F.element_at("xs", j) for j in range(1, 8)]
    lvl0 = ((((((x[0] + x[1]) + x[2]) + x[3]) + x[4]) + x[5]) + x[6]) / 7.0
    seas0 = F.transform(F.slice("xs", 1, 7), lambda s: s / lvl0)
    init = F.struct(
        lvl0.alias("level"),
        F.lit(0.0).alias("trend"),
        F.lit(0.0).alias("err"),
        seas0.alias("seas"),
    )
    days = F.transform(
        F.sequence(F.lit(8), F.size("xs")),
        lambda i: F.struct(
            i.alias("i"), F.element_at(F.col("xs"), i.cast("int")).alias("x")
        ),
    )

    def step(a, b):
        slot1 = ((b["i"] - 1) % 7 + 1).cast("int")  # 1-based seasonal slot
        sv = F.element_at(a["seas"], slot1)
        new_level = 0.25 * (b["x"] / sv) + 0.75 * (a["level"] + a["trend"])
        new_trend = 0.125 * (new_level - a["level"]) + 0.875 * a["trend"]
        new_err = a["err"] + F.abs(b["x"] - (a["level"] + a["trend"]) * sv)
        new_seas = F.transform(
            a["seas"],
            lambda s, j: F.when(
                j == (b["i"] - 1) % 7,  # Spark transform index is 0-based
                0.25 * (b["x"] / new_level) + 0.75 * s,
            ).otherwise(s),
        )
        return F.struct(
            new_level.alias("level"),
            new_trend.alias("trend"),
            new_err.alias("err"),
            new_seas.alias("seas"),
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("int").alias("n_days"),
        F.aggregate(days, init, step).alias("r"),
    )
    r = F.col("r")
    return folded.select(
        "event_type",
        "n_days",
        F.round(r["level"], 6).alias("level"),
        F.round(r["trend"], 6).alias("trend"),
        F.round(
            (r["level"] + r["trend"])
            * F.element_at(r["seas"], (F.col("n_days") % 7 + 1).cast("int")),
            6,
        ).alias("forecast_next"),
        F.round(F.array_max(r["seas"]) / F.array_min(r["seas"]), 6).alias(
            "season_ratio"
        ),
        F.round(r["err"] / (F.col("n_days") - 7), 6).alias("mae_1step"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q259 — Misra-Gries frequent-items summaries, the FOURTH sketch family
# (beside CMS q132, HLL q136, KMV q166) — and the one whose summary
# CONTENTS depend on processing order, which is why it was deferred:
# the cross-engine answer is to PIN the order. Per doc-hash bucket
# (the map-side substream), a weighted MG fold over that bucket's
# token-bigram histogram in bigram order; then one merge fold over the
# per-bucket summaries in (bucket, bigram) order. Every step is the
# classic insert: bump on match, append under capacity, else subtract
# the (k+1)-entry minimum from all and drop zeros — identical branch
# logic on both engines, so the summaries are bit-identical. Merging
# valid sub-summaries preserves the MG guarantee with the error budget
# doubled: est <= true <= est + 2N/(k+1) (Agarwal et al., Mergeable
# Summaries) — both bounds ride along as hash-checked booleans against
# the exact counts.
# ---------------------------------------------------------------------------
_MG_K = 16  # summary capacity
_MG_BUCKETS = 16  # map-side substreams


def _mg_insert_duck(S: str, xt: str, xc: str) -> str:
    ap = f"list_append({S}, struct_pack(t := {xt}, c := {xc}))"
    delta = f"list_aggregate(list_transform({ap}, z -> z.c), 'min')"
    return f"""CASE
      WHEN len(list_filter({S}, e -> e.t = {xt})) > 0
      THEN list_transform({S}, e -> CASE WHEN e.t = {xt}
             THEN struct_pack(t := e.t, c := e.c + {xc}) ELSE e END)
      WHEN len({S}) < {_MG_K} THEN {ap}
      ELSE list_filter(list_transform({ap},
             e -> struct_pack(t := e.t, c := e.c - {delta})), e -> e.c > 0)
    END"""


def _mg_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", _MG_BUCKETS)
    empty = "CAST([] AS STRUCT(t VARCHAR, c BIGINT)[])"
    kp1 = _MG_K + 1
    return f"""
    WITH RECURSIVE toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT {bucket} AS bucket, w[i] || ' ' || w[i+1] AS t
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
      WHERE len(w) >= 2
    ),
    hist AS MATERIALIZED (SELECT bucket, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM grams GROUP BY 1, 2),
    items AS MATERIALIZED (
      SELECT bucket, t, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY t) AS INT)
               AS idx
      FROM hist
    ),
    fold AS (
      SELECT DISTINCT bucket, 0 AS i, {empty} AS S FROM items
      UNION ALL
      SELECT f.bucket, f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM fold f JOIN items x ON x.bucket = f.bucket AND x.idx = f.i + 1
    ),
    bsum AS (
      SELECT f.bucket, f.S
      FROM fold f
      JOIN (SELECT bucket, MAX(idx) AS mx FROM items GROUP BY 1) m
        ON m.bucket = f.bucket AND f.i = m.mx
    ),
    entries AS (
      SELECT bucket, unnest(S) AS e FROM bsum
    ),
    mitems AS MATERIALIZED (
      SELECT e.t AS t, e.c AS c,
             CAST(ROW_NUMBER() OVER (ORDER BY bucket, e.t) AS INT) AS idx
      FROM entries
    ),
    mfold AS (
      SELECT 0 AS i, {empty} AS S
      UNION ALL
      SELECT f.i + 1, {_mg_insert_duck("f.S", "x.t", "x.c")}
      FROM mfold f JOIN mitems x ON x.idx = f.i + 1
    ),
    final AS (
      SELECT S FROM mfold WHERE i = (SELECT MAX(idx) FROM mitems)
    ),
    summ AS (SELECT unnest(S) AS e FROM final),
    truth AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS true_c
              FROM grams GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grams)
    SELECT s.e.t AS gram, s.e.c AS est_c, tr.true_c,
           CAST((2 * tot.n) // {kp1} AS BIGINT) AS err_bound,
           CAST(s.e.c <= tr.true_c AS INT) AS lower_ok,
           CAST(tr.true_c - s.e.c <= (2 * tot.n) // {kp1} AS INT) AS upper_ok,
           CAST(s.e.c > tot.n // {kp1} AS INT) AS guaranteed_frequent,
           CAST(ROW_NUMBER() OVER (ORDER BY s.e.c DESC, s.e.t) AS INT) AS rank
    FROM summ s JOIN truth tr ON tr.t = s.e.t CROSS JOIN tot
    ORDER BY rank
    """


@register(
    "q259_misra_gries",
    _mg_sql(),
    doc="mergeable Misra-Gries frequent-bigram summaries with a PINNED "
    "merge order: per doc-hash bucket a weighted MG(k=16) fold over the "
    "bucket's bigram histogram in bigram order (the map-side summary an "
    "executor computes per partition at 100 TB without holding the "
    "vocabulary), then one merge fold over the 16 bucket summaries in "
    "(bucket, bigram) order — contents of an MG summary depend on "
    "processing order, so pinning both folds makes the whole sketch "
    "bit-identical across engines, which HLL/CMS/KMV got for free from "
    "order-independence. Two-level merging doubles the error budget: "
    "est <= true <= est + 2N/(k+1), both asserted as hash-checked "
    "booleans against the exact histogram (q166's calibration "
    "discipline). On this deliberately flat synthetic corpus nothing "
    "clears the N/(k+1) guaranteed-frequent bar — the flag column "
    "shows it honestly; on a Zipfian stream the same plan surfaces the "
    "head. Corpus work: one explode + one (bucket, bigram) aggregate; "
    "each fold is O(distinct items) with a <=k-entry accumulator",
)
def q259_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    k = _MG_K

    def insert(S, x):
        matched = F.exists(S, lambda e: e["t"] == x["t"])
        bumped = F.transform(
            S,
            lambda e: F.when(
                e["t"] == x["t"],
                F.struct(e["t"].alias("t"), (e["c"] + x["c"]).alias("c")),
            ).otherwise(e),
        )
        ap = F.concat(
            S, F.array(F.struct(x["t"].alias("t"), x["c"].alias("c")))
        )
        delta = F.array_min(F.transform(ap, lambda z: z["c"]))
        dec = F.filter(
            F.transform(
                ap,
                lambda e: F.struct(
                    e["t"].alias("t"), (e["c"] - delta).alias("c")
                ),
            ),
            lambda e: e["c"] > 0,
        )
        return F.when(matched, bumped).when(F.size(S) < k, ap).otherwise(dec)

    empty = F.array().cast("array<struct<t:string,c:bigint>>")
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select(
        hash_bucket(F.col("doc_id"), _MG_BUCKETS).alias("bucket"), w.alias("w")
    ).filter(F.size("w") >= 2)
    grams = pin(
        toks.select(
            "bucket",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("w"), i.cast("int")),
                        F.lit(" "),
                        F.element_at(F.col("w"), (i + 1).cast("int")),
                    ),
                )
            ).alias("t"),
        )
    )
    hist = grams.groupBy("bucket", "t").agg(F.count("*").cast("long").alias("c"))
    per_bucket = hist.groupBy("bucket").agg(
        F.sort_array(F.collect_list(F.struct("t", "c"))).alias("items")
    )
    bsum = per_bucket.select(
        "bucket", F.aggregate("items", empty, insert).alias("S")
    )
    entries = bsum.select("bucket", F.explode("S").alias("e")).select(
        "bucket", F.col("e.t").alias("t"), F.col("e.c").alias("c")
    )
    merged = entries.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("bucket", "t", "c"))),
            lambda s: F.struct(s["t"].alias("t"), s["c"].alias("c")),
        ).alias("mitems")
    ).select(F.aggregate("mitems", empty, insert).alias("S"))
    summ = merged.select(F.explode("S").alias("e")).select(
        F.col("e.t").alias("gram"), F.col("e.c").alias("est_c")
    )
    truth = grams.groupBy("t").agg(F.count("*").cast("long").alias("true_c"))
    tot = grams.agg(F.count("*").cast("long").alias("n"))
    kp1 = k + 1
    return (
        truth.join(F.broadcast(summ), truth["t"] == summ["gram"])
        .crossJoin(F.broadcast(tot))
        .select(
            "gram",
            "est_c",
            "true_c",
            F.expr(f"cast((2 * n) div {kp1} as bigint)").alias("err_bound"),
            (F.col("est_c") <= F.col("true_c")).cast("int").alias("lower_ok"),
            (
                F.col("true_c") - F.col("est_c")
                <= F.expr(f"(2 * n) div {kp1}")
            )
            .cast("int")
            .alias("upper_ok"),
            (F.col("est_c") > F.expr(f"n div {kp1}"))
            .cast("int")
            .alias("guaranteed_frequent"),
            F.row_number()
            .over(W.orderBy(F.col("est_c").desc(), "gram"))
            .cast("int")
            .alias("rank"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q260 — MMR lambda sweep: the calibration query q224 needs before
# anyone picks its 0.7 — the greedy selection re-run under four
# relevance/diversity trade-offs on the SAME pinned candidate and
# pair-similarity tables, reporting each lambda's mean relevance,
# mean intra-list similarity (redundancy), and the selected set
# itself. The q82/q91/q178 sweep discipline applied to reranking.
# ---------------------------------------------------------------------------
_MMR_LAMBDAS = [("0.3", "0.7"), ("0.5", "0.5"), ("0.7", "0.3"), ("0.9", "0.1")]


def _mmr_sweep_sql() -> str:
    cos_qc = _duck_cos("q.qv", "e.embedding")
    cos_ab = _duck_cos("ea.embedding", "eb.embedding")
    ctes = [
        f"q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv "
        f"FROM embeddings WHERE vec_id < {_MMR_NQ})",
        f"""c AS MATERIALIZED (
      SELECT qid, cid, r FROM (
        SELECT q.qid, e.vec_id AS cid, {cos_qc} AS r,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {cos_qc} DESC, e.vec_id) AS rn
        FROM q JOIN embeddings e ON e.vec_id >= {_MMR_NQ}
      ) WHERE rn <= {_MMR_TOPC}
    )""",
        f"""ps AS MATERIALIZED (
      SELECT a.qid, a.cid AS ca, b.cid AS cb, {cos_ab} AS s
      FROM c a JOIN c b ON a.qid = b.qid AND a.cid <> b.cid
      JOIN embeddings ea ON ea.vec_id = a.cid
      JOIN embeddings eb ON eb.vec_id = b.cid
    )""",
    ]
    outs = []
    for li, (lam, lam2) in enumerate(_MMR_LAMBDAS):
        ctes.append(
            f"""sel_{li}_1 AS (
      SELECT qid, cid, 1 AS step FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY r DESC, cid) AS rn
        FROM c
      ) WHERE rn = 1
    )"""
        )
        for t in range(2, _MMR_K + 1):
            ctes.append(
                f"""sel_{li}_{t} AS (
      SELECT qid, cid, step FROM sel_{li}_{t - 1}
      UNION ALL
      SELECT qid, cid, {t} AS step FROM (
        SELECT c.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY c.qid
                 ORDER BY {lam}e0 * c.r - {lam2}e0 * m.ms DESC, c.cid) AS rn
        FROM c
        JOIN (
          SELECT p.qid, p.ca AS cid, MAX(p.s) AS ms
          FROM ps p JOIN sel_{li}_{t - 1} s ON s.qid = p.qid AND s.cid = p.cb
          GROUP BY 1, 2
        ) m ON m.qid = c.qid AND m.cid = c.cid
        WHERE NOT EXISTS (SELECT 1 FROM sel_{li}_{t - 1} s2
                          WHERE s2.qid = c.qid AND s2.cid = c.cid)
      ) WHERE rn = 1
    )"""
            )
        k = _MMR_K
        ctes.append(
            f"""rels_{li} AS (
      SELECT s.qid,
             ROUND(CAST(SUM(CAST(c.r AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_relevance,
             string_agg(CAST(s.cid AS VARCHAR), '|' ORDER BY s.step)
               AS selection
      FROM sel_{li}_{k} s JOIN c ON c.qid = s.qid AND c.cid = s.cid
      GROUP BY s.qid
    )"""
        )
        ctes.append(
            f"""sims_{li} AS (
      SELECT p.qid,
             ROUND(CAST(SUM(CAST(p.s AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_intra_sim
      FROM ps p
      JOIN sel_{li}_{k} sa ON sa.qid = p.qid AND sa.cid = p.ca
      JOIN sel_{li}_{k} sb ON sb.qid = p.qid AND sb.cid = p.cb
      GROUP BY p.qid
    )"""
        )
        outs.append(
            f"SELECT CAST({lam}e0 AS DOUBLE) AS lam, r.qid, r.mean_relevance, "
            f"s.mean_intra_sim, r.selection "
            f"FROM rels_{li} r JOIN sims_{li} s ON s.qid = r.qid"
        )
    joined = ",\n    ".join(ctes)
    union = "\n    UNION ALL\n    ".join(outs)
    return f"""
    WITH {joined}
    SELECT * FROM ({union})
    ORDER BY lam, qid
    """


@register(
    "q260_mmr_lambda_sweep",
    _mmr_sweep_sql(),
    doc="MMR trade-off sweep: q224's greedy diversified selection re-run "
    "at lambda in {0.3, 0.5, 0.7, 0.9} over ONE shared pinned candidate "
    "table and ONE pinned pair-similarity table — per (lambda, query): "
    "mean relevance of the selected 5, mean pairwise intra-list cosine "
    "(the redundancy a bigger lambda buys), and the selection itself in "
    "pick order. Falling redundancy vs sagging relevance across the "
    "rows IS the calibration curve that justifies a production lambda. "
    "Sums are DECIMAL-quantized (order-independent); every argmax uses "
    "the (score, cid) total order. The sweep multiplies only the "
    "k^2-bounded greedy state — the corpus-facing candidate fetch runs "
    "once, exactly how a 100 TB calibration should",
)
def q260_mmr_lambda_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    base = e.filter(F.col("vec_id") >= _MMR_NQ).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    r = vector.cosine_similarity(F.col("qv"), F.col("embedding"))
    scored = F.broadcast(q).crossJoin(base).select(
        "qid", "cid", r.alias("r"), "embedding"
    )
    rn = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("r").desc(), "cid")
    )
    c = pin(
        scored.withColumn("rn", rn).filter(F.col("rn") <= _MMR_TOPC).select(
            "qid", "cid", "r", "embedding"
        )
    )
    a = c.select("qid", F.col("cid").alias("ca"), F.col("embedding").alias("ea"))
    b = c.select(
        F.col("qid").alias("qid2"),
        F.col("cid").alias("cb"),
        F.col("embedding").alias("eb"),
    )
    ps = pin(
        a.join(b, (F.col("qid") == F.col("qid2")) & (F.col("ca") != F.col("cb")))
        .select(
            "qid",
            "ca",
            "cb",
            vector.cosine_similarity(F.col("ea"), F.col("eb")).alias("s"),
        )
    )

    def greedy(lam: float, lam2: float):
        sel = (
            c.withColumn(
                "rn2",
                F.row_number().over(
                    W.partitionBy("qid").orderBy(F.col("r").desc(), "cid")
                ),
            )
            .filter(F.col("rn2") == 1)
            .select("qid", "cid", F.lit(1).alias("step"))
        )
        for t in range(2, _MMR_K + 1):
            ms = (
                ps.join(
                    sel.select(F.col("qid").alias("q3"), F.col("cid").alias("c3")),
                    (F.col("qid") == F.col("q3")) & (F.col("cb") == F.col("c3")),
                )
                .groupBy("qid", "ca")
                .agg(F.max("s").alias("ms"))
            )
            remaining = c.join(sel.select("qid", "cid"), ["qid", "cid"], "left_anti")
            picked = (
                remaining.join(
                    ms,
                    (remaining["qid"] == ms["qid"]) & (remaining["cid"] == ms["ca"]),
                )
                .drop(ms["qid"])
                .select(
                    "qid",
                    "cid",
                    (F.lit(lam) * F.col("r") - F.lit(lam2) * F.col("ms")).alias(
                        "score"
                    ),
                )
                .withColumn(
                    "rn3",
                    F.row_number().over(
                        W.partitionBy("qid").orderBy(F.col("score").desc(), "cid")
                    ),
                )
                .filter(F.col("rn3") == 1)
                .select("qid", "cid", F.lit(t).alias("step"))
            )
            # localCheckpoint bounds the PLAN of the iterative chain
            # (the q135/q165 lesson): each step otherwise nests the
            # previous selection on three sides of its joins, and with
            # four lambda chains the analyzer cost dwarfs the <=15-row
            # data. Eager checkpoint of a 15-row frame is ~free.
            sel = sel.unionAll(picked).localCheckpoint()
        return sel

    out = None
    for lam_s, lam2_s in _MMR_LAMBDAS:
        lam, lam2 = float(lam_s), float(lam2_s)
        sel = greedy(lam, lam2)
        rels = (
            sel.join(c.select("qid", "cid", "r"), ["qid", "cid"])
            .groupBy("qid")
            .agg(
                F.round(
                    F.sum(F.col("r").cast("decimal(28,12)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("mean_relevance"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("step", "cid"))),
                        lambda s: s["cid"].cast("string"),
                    ),
                    "|",
                ).alias("selection"),
            )
        )
        sa = sel.select(F.col("qid").alias("qa"), F.col("cid").alias("ca2"))
        sb = sel.select(F.col("qid").alias("qb"), F.col("cid").alias("cb2"))
        sims = (
            ps.join(sa, (F.col("qid") == F.col("qa")) & (F.col("ca") == F.col("ca2")))
            .join(sb, (F.col("qid") == F.col("qb")) & (F.col("cb") == F.col("cb2")))
            .groupBy("qid")
            .agg(
                F.round(
                    F.sum(F.col("s").cast("decimal(28,12)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("mean_intra_sim")
            )
        )
        row = rels.join(sims, "qid").select(
            F.lit(lam).alias("lam"),
            "qid",
            "mean_relevance",
            "mean_intra_sim",
            "selection",
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("lam", "qid")


# ---------------------------------------------------------------------------
# q261 — 3D skyline: q236's sort+running-max rewrite is 2D-only (a
# running max is a total order; three criteria are a partial order),
# so the 3D frontier uses the block-nested-loop shape — a LOCAL
# skyline per doc-hash bucket (each bucket a O(|bucket|^2) dominance
# anti-join — the per-partition prune an executor runs map-side),
# then the exact global frontier over the surviving candidates
# (skylines are distributive: the global skyline is a subset of the
# union of local skylines). Pure set semantics — no processing order
# anywhere, unlike q259's MG folds.
# ---------------------------------------------------------------------------
def _skyline3_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("doc_id", 16)
    dom = (
        "b.d1 >= a.d1 AND b.d2 >= a.d2 AND b.d3 >= a.d3 "
        "AND (b.d1 > a.d1 OR b.d2 > a.d2 OR b.d3 > a.d3)"
    )
    return f"""
    WITH m AS MATERIALIZED (
      SELECT doc_id, {bucket} AS bucket,
             n_chars AS d1,
             CAST(len(list_distinct(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')))
               AS BIGINT) AS d2,
             CAST(list_aggregate(list_transform(list_filter(
               string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''),
               x -> length(x)), 'max') AS BIGINT) AS d3
      FROM documents
    ),
    local AS MATERIALIZED (
      SELECT a.* FROM m a
      WHERE NOT EXISTS (
        SELECT 1 FROM m b WHERE b.bucket = a.bucket AND {dom}
      )
    )
    SELECT a.doc_id, a.d1 AS n_chars, a.d2 AS n_distinct_terms,
           a.d3 AS max_token_len
    FROM local a
    WHERE NOT EXISTS (SELECT 1 FROM local b WHERE {dom})
    ORDER BY a.d1 DESC, a.d2 DESC, a.d3 DESC, a.doc_id
    """


@register(
    "q261_skyline_3d",
    _skyline3_sql(),
    doc="3D Pareto frontier over (length, lexical diversity, longest "
    "token): the documents no other document weakly dominates on all "
    "three with at least one strict — q236's 2D running-max rewrite "
    "cannot express a 3-criteria partial order, so this is the "
    "distributed block-nested-loop skyline: per-bucket local frontier "
    "(each bucket one bounded O(b^2) dominance anti-join, the map-side "
    "prune), then the exact global anti-join over the tiny candidate "
    "union — sound because any global-skyline point is also a local-"
    "skyline point in its own bucket. All-integer criteria, set "
    "semantics (no order dependence). Corpus pays one narrow "
    "projection + one bucket-keyed self-join; the global pass runs on "
    "candidates only",
)
def q261_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    m = pin(
        d.select(
            "doc_id",
            hash_bucket(F.col("doc_id"), 16).alias("bucket"),
            F.col("n_chars").alias("d1"),
            F.size(F.array_distinct(w)).cast("long").alias("d2"),
            F.array_max(F.transform(w, lambda x: F.length(x)))
            .cast("long")
            .alias("d3"),
        )
    )

    def dominated_by(a, b):
        return (
            (b["d1"] >= a["d1"])
            & (b["d2"] >= a["d2"])
            & (b["d3"] >= a["d3"])
            & ((b["d1"] > a["d1"]) | (b["d2"] > a["d2"]) | (b["d3"] > a["d3"]))
        )

    mb = m.select(
        F.col("bucket").alias("bb"),
        F.col("d1").alias("bd1"),
        F.col("d2").alias("bd2"),
        F.col("d3").alias("bd3"),
    )
    b = F.struct(
        F.col("bd1").alias("d1"), F.col("bd2").alias("d2"), F.col("bd3").alias("d3")
    )
    a = F.struct(F.col("d1"), F.col("d2"), F.col("d3"))
    local = m.join(
        mb,
        (F.col("bucket") == F.col("bb")) & dominated_by(a, b),
        "left_anti",
    )
    lb = local.select(
        F.col("d1").alias("bd1"), F.col("d2").alias("bd2"), F.col("d3").alias("bd3")
    )
    sky = local.join(F.broadcast(lb), dominated_by(a, b), "left_anti")
    return sky.select(
        "doc_id",
        F.col("d1").alias("n_chars"),
        F.col("d2").alias("n_distinct_terms"),
        F.col("d3").alias("max_token_len"),
    ).orderBy(
        F.col("n_chars").desc(),
        F.col("n_distinct_terms").desc(),
        F.col("max_token_len").desc(),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# q262 — BM25F fielded ranking: the structured-document upgrade of
# q134 — a match in the title field (first 6 tokens, the markdown
# heading analogue) is worth more than one in the body, and each
# field carries its OWN length normalization before saturation
# (Robertson/Zaragoza "simple BM25F": saturate the weighted
# field-normalized tf once, NOT per field — the property plain
# per-field BM25 summing gets wrong). One SQL template, two dialects
# (the q127/q134 discipline); per-term scores floored into 2^30 fixed
# point so per-pair sums are exact BIGINTs.
# ---------------------------------------------------------------------------
_BM25F_TITLE_LEN = 6  # leading tokens designated the "title" field
_BM25F_WEIGHTS = "CASE WHEN tf.field = 'title' THEN 2e0 ELSE 1e0 END"
_BM25F_B = "CASE WHEN tf.field = 'title' THEN 0.5e0 ELSE 0.75e0 END"


def _bm25f_sql(dialect: str, table: str = "documents") -> str:
    k1, s, tl = _BM25_K1, _BM25_SCALE, _BM25F_TITLE_LEN
    if dialect == "duckdb":
        tokenize = (
            "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
        )
        field_rows = (
            f"SELECT doc_id, 'title' AS field, w[1:{tl}] AS fw FROM toks "
            f"UNION ALL SELECT doc_id, 'body' AS field, w[{tl + 1}:] AS fw FROM toks"
        )
        explode_f = "SELECT doc_id, field, unnest(fw) AS t FROM fields"
        explode_q = (
            f"SELECT DISTINCT doc_id AS qid, unnest(w[1:{_BM25_QUERY_TERMS}]) AS t "
            f"FROM toks WHERE doc_id % {_BM25_QUERY_MOD} = 0"
        )
        flen = "len(fw)"
    else:
        tokenize = r"filter(split(trim(lower(text)), '\\s+'), x -> x <> '')"
        field_rows = (
            f"SELECT doc_id, 'title' AS field, slice(w, 1, {tl}) AS fw FROM toks "
            f"UNION ALL SELECT doc_id, 'body' AS field, "
            f"slice(w, {tl + 1}, greatest(size(w) - {tl}, 0)) AS fw FROM toks"
        )
        explode_f = "SELECT doc_id, field, explode(fw) AS t FROM fields"
        explode_q = (
            f"SELECT DISTINCT doc_id AS qid, "
            f"explode(slice(w, 1, {_BM25_QUERY_TERMS})) AS t "
            f"FROM toks WHERE doc_id % {_BM25_QUERY_MOD} = 0"
        )
        flen = "size(fw)"
    # shared scoring fragments — identical text in both dialects
    wn = (
        f"({_BM25F_WEIGHTS}) * tf.tf / "
        f"(1e0 - ({_BM25F_B}) + ({_BM25F_B}) * dl.dl "
        f"/ (CAST(st.tt AS DOUBLE) / st.nd))"
    )
    term = (
        f"ln(1 + (d2.nd - df.df + 0.5) / (df.df + 0.5)) * "
        f"((w.ptf * ({k1} + 1)) / ({k1} + w.ptf))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {tokenize} AS w FROM {table}),
    fields AS ({field_rows}),
    flens AS (SELECT doc_id, field, CAST({flen} AS BIGINT) AS dl FROM fields),
    fstats AS (SELECT field, CAST(SUM(dl) AS BIGINT) AS tt,
                      CAST(COUNT(*) AS BIGINT) AS nd
               FROM flens GROUP BY field),
    ft AS ({explode_f}),
    ftf AS (SELECT doc_id, field, t, CAST(COUNT(*) AS BIGINT) AS tf
            FROM ft GROUP BY 1, 2, 3),
    docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM toks),
    df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM ft GROUP BY 1),
    qt AS ({explode_q}),
    wtf AS (
      SELECT qt.qid, tf.doc_id, qt.t, SUM({wn}) AS ptf
      FROM qt
      JOIN df ON df.t = qt.t AND df.df <= {_BM25_MAX_DF}
      JOIN ftf tf ON tf.t = qt.t
      JOIN flens dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
      JOIN fstats st ON st.field = tf.field
      WHERE tf.doc_id <> qt.qid
      GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT w.qid, w.doc_id,
             CAST(SUM(CAST(FLOOR(({term}) * {s}) AS BIGINT)) AS BIGINT)
               AS score_fx,
             CAST(COUNT(*) AS INT) AS n_terms
      FROM wtf w JOIN df ON df.t = w.t CROSS JOIN docs d2
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, score_fx, n_terms,
             ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) DESC, doc_id
             ) AS rnk
      FROM scored
    )
    SELECT qid AS query_id, doc_id AS hit_id, n_terms, score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


@register(
    "q262_bm25f_topk",
    _bm25f_sql("duckdb"),
    doc="BM25F fielded top-k retrieval over structured documents: the "
    "first 6 tokens act as a 2x-weighted 'title' field with its own "
    "gentler length normalization (b=0.5) beside the body (b=0.75); "
    "field-normalized weighted tfs are summed into one pseudo-tf and "
    "saturated ONCE (simple BM25F — per-field saturation would let a "
    "term max out twice). Same df-capped posting-join shape, fixed-"
    "point exact score sums, and (score, doc_id) ranking as q134; the "
    "field dimension multiplies the posting join by |fields|=2, never "
    "corpus x corpus. Summed addends per (query, doc, term) are at "
    "most two doubles — IEEE addition is commutative, so the "
    "group-order-free SUM is still deterministic",
)
def q262_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q262"
    )
    return spark.sql(_bm25f_sql("spark", "documents_q262"))


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
# q264 — winnowing fingerprint selection (Schleimer et al. 2003, the
# MOSS algorithm): from every window of W consecutive k-gram hashes
# keep the RIGHTMOST minimum — the position-robust fingerprint scheme
# whose guarantee (every window contributes, so no gap between chosen
# positions exceeds W) is what q41's fixed-stride fingerprints lack.
# The rightmost-argmin is one integer MIN: key = h*256 + (window_end
# - j), so smaller hash wins and ties fall to the larger position —
# no argmax_by/min_by portability surface at all.
# ---------------------------------------------------------------------------
_WIN_K = 4  # tokens per k-gram
_WIN_W = 4  # k-grams per window


def _hex48_duck(expr: str) -> str:
    v = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        v = (
            f"({v}) * 16 + (strpos('0123456789abcdef', "
            f"substr(md5({expr}), {i}, 1)) - 1)"
        )
    return f"({v})"


def _winnow_fp_ctes() -> str:
    """CTE chain toks..fp shared by q264 (per-doc report) and q276
    (cross-doc candidate pairs)."""
    k, w = _WIN_K, _WIN_W
    kgram = " || ' ' || ".join(f"w[i+{j}]" for j in range(k)).replace(
        "w[i+0]", "w[i]"
    )
    return f"""toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    kg AS MATERIALIZED (
      SELECT doc_id, len(w) - {k} + 1 AS m, i,
             {_hex48_duck(kgram)} AS h
      FROM toks, UNNEST(generate_series(1, len(w) - {k} + 1)) AS g(i)
      WHERE len(w) >= {k + w - 1}
    ),
    wins AS (
      SELECT doc_id, p, i AS j, h
      FROM kg, UNNEST(generate_series(GREATEST(1, i - {w} + 1),
                                      LEAST(i, m - {w} + 1))) AS gp(p)
    ),
    sel AS (
      SELECT doc_id, p,
             MIN(h * 256 + (p + {w} - 1 - j)) AS key
      FROM wins GROUP BY 1, 2
    ),
    fp AS (
      SELECT DISTINCT doc_id, p + {w} - 1 - (key % 256) AS j, key // 256 AS h
      FROM sel
    )"""


def _winnow_sql() -> str:
    w = _WIN_W
    return f"""
    WITH {_winnow_fp_ctes()},
    g AS (
      SELECT doc_id, j,
             j - LAG(j) OVER (PARTITION BY doc_id ORDER BY j) AS gap
      FROM fp
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap,
             CAST(MIN(j) AS BIGINT) AS first_j,
             CAST(MAX(j) AS BIGINT) AS last_j
      FROM g GROUP BY 1
    ),
    md AS (SELECT DISTINCT doc_id, m FROM kg)
    SELECT a.doc_id, CAST(md.m AS BIGINT) AS n_kgrams, a.n_fingerprints,
           ROUND(CAST(a.n_fingerprints AS DOUBLE) / (md.m - {w} + 1), 6)
             AS density,
           a.max_gap,
           CAST(a.max_gap <= {w} AND a.first_j <= {w}
                AND a.last_j >= md.m - {w} + 1 AS INT) AS guarantee_ok
    FROM agg a JOIN md ON md.doc_id = a.doc_id
    ORDER BY a.doc_id
    """


@register(
    "q264_winnowing_fingerprints",
    _winnow_sql(),
    doc="winnowing fingerprint selection over token 4-gram hashes "
    "(48-bit md5-derived), window W=4, rightmost-min tie-break encoded "
    "as MIN(h*256 + distance-from-window-end) — pure integer math both "
    "engines evaluate identically. Per doc: fingerprint count, density "
    "(the paper's expected 2/(W+1) reference point), the max gap "
    "between chosen positions, and the winnowing GUARANTEE as a "
    "hash-checked boolean (no uncovered window: max_gap <= W and both "
    "boundary windows covered). Docs shorter than K+W-1 tokens have no "
    "full window and drop. The fingerprints are what a plagiarism/"
    "near-dup index stores at 64x compression vs all k-grams; corpus "
    "work is one explode to W rows per k-gram + two aggregates — "
    "no joins until the doc-level report",
)
def q264_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    k, w = _WIN_K, _WIN_W
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w")).filter(F.size("w") >= k + w - 1)
    kgram_parts = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("w"), (i + j).cast("int")) for j in range(k)]
    )
    kg = pin(
        toks.select(
            "doc_id",
            (F.size("w") - k + 1).cast("long").alias("m"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - k + 1),
                    lambda i: F.struct(
                        i.cast("long").alias("i"),
                        F.conv(F.substring(F.md5(kgram_parts(i)), 1, 12), 16, 10)
                        .cast("long")
                        .alias("h"),
                    ),
                )
            ).alias("e"),
        ).select("doc_id", "m", F.col("e.i").alias("i"), F.col("e.h").alias("h"))
    )
    wins = kg.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1).cast("long"), F.col("i") - w + 1),
                F.least(F.col("i"), F.col("m") - w + 1),
            )
        ).alias("p"),
        F.col("i").alias("j"),
        "h",
    )
    sel = wins.groupBy("doc_id", "p").agg(
        F.min(F.col("h") * 256 + (F.col("p") + w - 1 - F.col("j"))).alias("key")
    )
    fp = sel.select(
        "doc_id",
        (F.col("p") + w - 1 - F.col("key") % 256).alias("j"),
        # integer div, not /: key reaches 2^56 and double division
        # would round above 2^53 (DuckDB's // is exact)
        F.expr("key div 256").alias("h"),
    ).distinct()
    g = fp.select(
        "doc_id",
        "j",
        (
            F.col("j")
            - F.lag("j").over(W.partitionBy("doc_id").orderBy("j"))
        ).alias("gap"),
    )
    agg = g.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
        F.min("j").cast("long").alias("first_j"),
        F.max("j").cast("long").alias("last_j"),
    )
    md = kg.select("doc_id", "m").distinct()
    return (
        agg.join(md, "doc_id")
        .select(
            "doc_id",
            F.col("m").cast("long").alias("n_kgrams"),
            "n_fingerprints",
            F.round(
                F.col("n_fingerprints").cast("double") / (F.col("m") - w + 1), 6
            ).alias("density"),
            "max_gap",
            (
                (F.col("max_gap") <= w)
                & (F.col("first_j") <= w)
                & (F.col("last_j") >= F.col("m") - w + 1)
            )
            .cast("int")
            .alias("guarantee_ok"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q265 — Local Outlier Factor over the embedding space: the
# density-RATIO outlier score (Breunig et al. 2000) that catches what
# q155's global MAD and q244's norm QC cannot — a point that is
# normal globally but isolated relative to ITS OWN neighborhood's
# density. kNN restricted to the point's k-means cell (q48's
# quantizer — the same blocking every dense-pair operator here uses),
# so the pair join is O(n^2/k) not O(n^2); the oracle replays the
# Lloyd iterations and the full reach-distance chain.
# ---------------------------------------------------------------------------
_LOF_K = 5
_LOF_THRESHOLD = "1.5e0"


def _lof_sql() -> str:
    cosd = f"(1e0 - {_duck_cos('a.embedding', 'b.embedding')})"
    return f"""
    WITH {_kmeans_ctes()},
    assign AS (SELECT vec_id, CAST(cid AS INT) AS cluster FROM a{_KMEANS_ITERS}),
    cl AS MATERIALIZED (
      SELECT e.vec_id, e.embedding, a.cluster
      FROM embeddings e JOIN assign a USING (vec_id)
    ),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS ida, b.vec_id AS idb, {cosd} AS d
      FROM cl a JOIN cl b
        ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT ida, idb, d,
             ROW_NUMBER() OVER (PARTITION BY ida ORDER BY d, idb) AS rn
      FROM pairs
    ),
    knn AS MATERIALIZED (SELECT ida, idb, d FROM ranked WHERE rn <= {_LOF_K}),
    kd AS MATERIALIZED (SELECT ida AS v, MAX(d) AS kdist FROM knn GROUP BY 1),
    reach AS (
      SELECT k.ida, k.idb, GREATEST(kd.kdist, k.d) AS rd
      FROM knn k JOIN kd ON kd.v = k.idb
    ),
    lrd AS MATERIALIZED (
      SELECT ida AS v,
             COUNT(*) / CAST(SUM(CAST(rd AS DECIMAL(28,12))) AS DOUBLE)
               AS lrd
      FROM reach GROUP BY 1
    ),
    lof AS (
      SELECT k.ida AS vec_id,
             CAST(SUM(CAST(lb.lrd AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*) / la.lrd AS lof
      FROM knn k
      JOIN lrd lb ON lb.v = k.idb
      JOIN lrd la ON la.v = k.ida
      GROUP BY k.ida, la.lrd
    )
    SELECT l.vec_id, c.cluster, ROUND(kd.kdist, 6) AS kdist,
           ROUND(la.lrd, 6) AS lrd, ROUND(l.lof, 6) AS lof,
           CAST(l.lof > {_LOF_THRESHOLD} AS INT) AS is_outlier
    FROM lof l
    JOIN cl c ON c.vec_id = l.vec_id
    JOIN kd ON kd.v = l.vec_id
    JOIN lrd la ON la.v = l.vec_id
    ORDER BY l.vec_id
    """


@register(
    "q265_lof_outliers",
    _lof_sql(),
    doc="Local Outlier Factor (k=5) over cosine distance within "
    "k-means cells: k-distance, reachability distance "
    "max(kdist(neighbor), d), local reachability density, and the "
    "LOF density ratio with a 1.5 outlier flag — the embedding-QC "
    "signal that scores isolation RELATIVE to local density, not "
    "global spread. Blocked kNN makes the pair join O(n^2/k) with the "
    "same approximation posture as q109/q148; reach/lrd sums are "
    "DECIMAL-quantized, all ranks on the (d, id) total order. At "
    "100 TB the cell pair join shards by cluster key and the three "
    "per-point tables are map-side aggregates",
)
def q265_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.clustering import kmeans_assign

    e = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(e, k=_KMEANS_K, iters=_KMEANS_ITERS)
    cl = pin(e.join(assign, "vec_id").select("vec_id", "embedding", "cluster"))
    a = cl.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("cluster").alias("ca"),
    )
    b = cl.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        F.col("cluster").alias("cb"),
    )
    d = 1.0 - vector.cosine_similarity(F.col("ea"), F.col("eb"))
    pairs = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("ida") != F.col("idb"))
    ).select("ida", "idb", d.alias("d"))
    knn = pin(
        pairs.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("ida").orderBy("d", "idb")),
        )
        .filter(F.col("rn") <= _LOF_K)
        .select("ida", "idb", "d")
    )
    kd = pin(knn.groupBy(F.col("ida").alias("v")).agg(F.max("d").alias("kdist")))
    reach = knn.join(kd, knn["idb"] == kd["v"]).select(
        "ida", "idb", F.greatest(F.col("kdist"), F.col("d")).alias("rd")
    )
    lrd = pin(
        reach.groupBy(F.col("ida").alias("v")).agg(
            (
                F.count("*")
                / F.sum(F.col("rd").cast("decimal(28,12)")).cast("double")
            ).alias("lrd")
        )
    )
    lb = lrd.select(F.col("v").alias("vb"), F.col("lrd").alias("lrd_b"))
    la = lrd.select(F.col("v").alias("va"), F.col("lrd").alias("lrd_a"))
    lof = (
        knn.join(lb, knn["idb"] == lb["vb"])
        .join(la, knn["ida"] == la["va"])
        .groupBy("ida", "lrd_a")
        .agg(
            (
                F.sum(F.col("lrd_b").cast("decimal(28,12)")).cast("double")
                / F.count("*")
                / F.first("lrd_a")
            ).alias("lof")
        )
    )
    return (
        lof.join(cl.select("vec_id", "cluster"), lof["ida"] == F.col("vec_id"))
        .join(kd, F.col("v") == F.col("vec_id"))
        .select(
            "vec_id",
            "cluster",
            F.round("kdist", 6).alias("kdist"),
            F.round("lrd_a", 6).alias("lrd"),
            F.round("lof", 6).alias("lof"),
            (F.col("lof") > 1.5).cast("int").alias("is_outlier"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q266 — BFS hop distance from a trusted seed set over the MinHash-LSH
# similarity graph: min hops (capped at 4) from any hash-designated
# trusted document, with deterministic seed attribution (smallest seed
# among those at the min distance) — the hop-count complement of q186's
# TrustRank mass (which decays but never says "2 hops away"). Spark
# runs frontier rounds with per-round localCheckpoint (the q135
# discipline); the oracle reaches the same unique fixpoint by
# recursive CTE, so round structure never enters the compare.
# ---------------------------------------------------------------------------
_BFS_HOPS = 4
_BFS_SEED_MOD = 50


def _bfs_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    bi AS MATERIALIZED (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
    reach(node, hop, seed) AS (
      SELECT doc_id, 0, doc_id FROM documents
      WHERE doc_id % {_BFS_SEED_MOD} = 0
      UNION
      SELECT bi.b, reach.hop + 1, reach.seed
      FROM reach JOIN bi ON bi.a = reach.node
      WHERE reach.hop < {_BFS_HOPS}
    ),
    m AS (SELECT node, MIN(hop) AS hops FROM reach GROUP BY 1)
    SELECT m.node AS doc_id, CAST(m.hops AS INT) AS hops,
           MIN(r.seed) AS nearest_seed
    FROM reach r JOIN m ON m.node = r.node AND r.hop = m.hops
    GROUP BY m.node, m.hops
    ORDER BY doc_id
    """


@register(
    "q266_trust_bfs_hops",
    _bfs_sql(),
    doc="BFS curation distance: min hop count (<= 4) from the trusted "
    "seed documents (doc_id % 50 = 0) through the LSH candidate graph, "
    "with the smallest achieving seed as attribution — per-round "
    "frontier join + MIN(struct(hop, seed)) fold, each round "
    "localCheckpointed so the plan stays linear in rounds (q135/q165 "
    "lesson). Shuffle per round is O(edges); unreachable docs drop "
    "instead of carrying a sentinel. Oracle = the same unique fixpoint "
    "via recursive CTE with the horizon in the WHERE",
)
def q266_trust_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    cand = dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
    )
    bi = pin(
        cand.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).union(
            cand.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
        )
    )
    dist = (
        d.filter(F.col("doc_id") % _BFS_SEED_MOD == 0)
        .select(
            F.col("doc_id").alias("node"),
            F.lit(0).alias("hop"),
            F.col("doc_id").alias("seed"),
        )
        .localCheckpoint()
    )
    for _ in range(_BFS_HOPS):
        nxt = dist.join(bi, dist["node"] == bi["a"]).select(
            F.col("b").alias("node"),
            (F.col("hop") + 1).alias("hop"),
            F.col("seed"),
        )
        dist = (
            dist.union(nxt)
            .groupBy("node")
            .agg(F.min(F.struct("hop", "seed")).alias("m"))
            .select("node", F.col("m.hop").alias("hop"), F.col("m.seed").alias("seed"))
            .localCheckpoint()
        )
    return dist.select(
        F.col("node").alias("doc_id"),
        F.col("hop").cast("int").alias("hops"),
        F.col("seed").alias("nearest_seed"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q267 — content-defined chunking (the rsync/LBFS/restic boundary
# rule): a chunk break falls BEFORE token i wherever the 48-bit hash
# of the preceding bigram is 0 mod D — boundaries move WITH content,
# so an insertion re-chunks only its neighborhood, where q79's fixed
# windows shift every downstream chunk. The storage-dedup view of the
# corpus: chunk fingerprints shared across documents are bytes a
# dedup store writes once.
# ---------------------------------------------------------------------------
_CDC_D = 32  # expected chunk length in tokens


def _cdc_sql() -> str:
    h = _hex48_duck("w[i-1] || ' ' || w[i]")
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, i, w[i] AS t,
             CASE WHEN i >= 2 AND ({h}) % {_CDC_D} = 0
                  THEN 1 ELSE 0 END AS brk
      FROM toks, UNNEST(generate_series(1, len(w))) AS g(i)
    ),
    ck AS (
      SELECT doc_id, i, t,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk
      FROM pos
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, chunk, CAST(COUNT(*) AS BIGINT) AS n_toks,
             md5(string_agg(t, ' ' ORDER BY i)) AS fp
      FROM ck GROUP BY 1, 2
    ),
    share AS (SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
              FROM chunks GROUP BY 1)
    SELECT c.doc_id,
           CAST(SUM(c.n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(MAX(c.n_toks) AS BIGINT) AS max_chunk_tokens,
           ROUND(CAST(SUM(c.n_toks) AS DOUBLE) / COUNT(*), 6)
             AS mean_chunk_tokens,
           CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_chunks
    FROM chunks c JOIN share s ON s.fp = c.fp
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """


@register(
    "q267_content_defined_chunking",
    _cdc_sql(),
    doc="content-defined chunking over token streams: break before "
    "token i iff hash48(bigram ending at i) = 0 mod 32 (expected "
    "32-token chunks, boundaries a local edit cannot shift globally), "
    "chunk fingerprints via md5 of the joined tokens, and per doc the "
    "chunk count/size profile plus how many of its chunks appear in "
    "at least one OTHER document — the dedup-store view (shared "
    "chunks are stored once). No min/max chunk clamp (stated "
    "honestly; production CDC adds one against pathological runs). "
    "One explode + one window + two aggregates; the share join is on "
    "the chunk-hash key, O(chunks)",
)
def q267_content_defined_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.element_at(F.col("w"), (F.col("i") - 1).cast("int")),
                    F.lit(" "),
                    F.element_at(F.col("w"), F.col("i").cast("int")),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    pos = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("w"))).alias("i"),
        "w",
    ).select(
        "doc_id",
        "i",
        F.element_at(F.col("w"), F.col("i").cast("int")).alias("t"),
        F.when((F.col("i") >= 2) & (h % _CDC_D == 0), 1).otherwise(0).alias("brk"),
    )
    ck = pos.withColumn(
        "chunk",
        F.sum("brk").over(
            W.partitionBy("doc_id").orderBy("i").rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    chunks = pin(
        ck.groupBy("doc_id", "chunk").agg(
            F.count("*").cast("long").alias("n_toks"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "t"))),
                        lambda s: s["t"],
                    ),
                    " ",
                )
            ).alias("fp"),
        )
    )
    share = chunks.groupBy("fp").agg(
        F.count_distinct("doc_id").cast("long").alias("nd")
    )
    return (
        chunks.join(share, "fp")
        .groupBy("doc_id")
        .agg(
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_chunks"),
            F.max("n_toks").cast("long").alias("max_chunk_tokens"),
            F.round(
                F.sum("n_toks").cast("double") / F.count("*"), 6
            ).alias("mean_chunk_tokens"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("shared_chunks"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q268 — Markov removal-effect attribution (Anderl et al.): each
# channel's value is how much total conversion DROPS when the channel
# is deleted from the journey graph (paths through it fail) — the
# counterfactual attribution that first/last/linear (q194) cannot
# express (a middle channel that never touches the conversion edge
# still carries mass). Start distribution = each user's first event;
# the q255 truncated absorption recursion runs once on the full chain
# and once per removed channel on the filtered matrix, all in the
# same 2^30 fixed-point floor arithmetic. Channels are enumerated
# statically (the fixture's event universe is stable across SFs, the
# 'purchase' convention used since q74).
# ---------------------------------------------------------------------------
_RE_CHANNELS = ["click", "error", "signup", "view"]  # transient states


def _removal_sql(T: int = _ABS_STEPS, s: int = _MKV_SCALE) -> str:
    ctes = [
        """pairs AS MATERIALIZED (
      SELECT user_id, ts, event_id, event_type AS dst,
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
        """firsts AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    )""",
        f"""pi0 AS MATERIALIZED (
      SELECT event_type,
             (CAST(COUNT(*) AS BIGINT) * {s})
               // (SELECT COUNT(*) FROM firsts) AS w_fx
      FROM firsts GROUP BY 1
    )""",
        "types AS MATERIALIZED (SELECT DISTINCT event_type FROM events)",
    ]
    variants = [("full", None)] + [(f"rm_{c}", c) for c in _RE_CHANNELS]
    for vname, rm in variants:
        drop = "" if rm is None else f" AND src <> '{rm}' AND dst <> '{rm}'"
        tyf = "" if rm is None else f" WHERE event_type <> '{rm}'"
        ctes.append(
            f"""a_{vname}_0 AS (
      SELECT event_type, CAST(0 AS BIGINT) AS p_abs FROM types{tyf}
    )"""
        )
        for t in range(1, T + 1):
            ctes.append(
                f"""a_{vname}_{t} AS (
      SELECT ty.event_type,
             COALESCE(d.direct, CAST(0 AS BIGINT))
               + COALESCE(c.carry, CAST(0 AS BIGINT)) AS p_abs
      FROM (SELECT event_type FROM types{tyf}) ty
      LEFT JOIN (
        SELECT src AS event_type, p_fx AS direct FROM tfx
        WHERE dst = 'purchase' AND src <> 'purchase'{drop}
      ) d ON d.event_type = ty.event_type
      LEFT JOIN (
        SELECT t.src AS event_type,
               CAST(SUM(t.p_fx * a.p_abs // {s}) AS BIGINT) AS carry
        FROM tfx t JOIN a_{vname}_{t - 1} a ON a.event_type = t.dst
        WHERE t.dst <> 'purchase' AND t.src <> 'purchase'{drop}
        GROUP BY t.src
      ) c ON c.event_type = ty.event_type
    )"""
            )
        start_drop = "" if rm is None else f" AND p.event_type <> '{rm}'"
        ctes.append(
            f"""conv_{vname} AS (
      SELECT (SELECT COALESCE(MAX(w_fx), 0) FROM pi0
              WHERE event_type = 'purchase')
             + COALESCE(CAST(SUM(p.w_fx * a.p_abs // {s}) AS BIGINT), 0)
               AS conv_fx
      FROM pi0 p JOIN a_{vname}_{T} a ON a.event_type = p.event_type
      WHERE p.event_type <> 'purchase'{start_drop}
    )"""
        )
    union = "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS channel, (SELECT conv_fx FROM conv_rm_{c}) AS conv_removed_fx"
        for c in _RE_CHANNELS
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined},
    rem AS ({union})
    SELECT r.channel,
           COALESCE(p.w_fx, 0) AS start_share_fx,
           f.conv_fx AS conv_full_fx,
           r.conv_removed_fx,
           ROUND(1e0 - CAST(r.conv_removed_fx AS DOUBLE) / f.conv_fx, 6)
             AS removal_effect,
           CAST(ROW_NUMBER() OVER (
             ORDER BY f.conv_fx - r.conv_removed_fx DESC, r.channel) AS INT)
             AS rank
    FROM rem r
    CROSS JOIN conv_full f
    LEFT JOIN pi0 p ON p.event_type = r.channel
    ORDER BY rank
    """


@register(
    "q268_markov_removal_attribution",
    _removal_sql(),
    doc="Markov removal-effect attribution: conversion mass = sum over "
    "start states (each user's first event) of the 8-step truncated "
    "absorption probability into 'purchase'; each channel's effect = "
    "1 - conv(without the channel)/conv(full), where removal deletes "
    "the state (transitions into it are lost paths, starts at it are "
    "lost users) — the counterfactual credit q194's positional rules "
    "cannot see. One window pass + one pair aggregate over events; "
    "five |types|^2 fixed-point recursions (full + one per removed "
    "channel), every iteration replayed as an oracle CTE in identical "
    "floor arithmetic. Ranked by absolute conversion drop",
)
def q268_markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    s = _MKV_SCALE
    T = _ABS_STEPS
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = pairs.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    rowtot = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("tot"))
    tfx_rows = (
        trans.join(rowtot, "src")
        .select("src", "dst", F.expr(f"(cnt * {s}) div tot").alias("p_fx"))
        .collect()
    )
    firsts = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    pi0_rows = firsts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt")
    ).collect()
    types = sorted({r.src for r in tfx_rows} | {r.dst for r in tfx_rows}
                   | {r.event_type for r in pi0_rows})
    # the recursion runs on the |types|^2 matrix — driver state, exact
    # integers (Python // == SQL // on the nonnegative fixed points)
    nuser = sum(r.cnt for r in pi0_rows)
    pi0 = {r.event_type: (r.cnt * s) // nuser for r in pi0_rows}
    tfx = {(r.src, r.dst): r.p_fx for r in tfx_rows}

    def conv(rm: str | None) -> int:
        keep = [t for t in types if t != rm]
        p_abs = {t: 0 for t in keep}
        for _ in range(T):
            nxt = {}
            for i in keep:
                if i == "purchase":
                    nxt[i] = 0
                    continue
                direct = tfx.get((i, "purchase"), 0)
                carry = sum(
                    (tfx[(i, j)] * p_abs[j]) // s
                    for j in keep
                    if j != "purchase" and (i, j) in tfx
                )
                nxt[i] = direct + carry
            p_abs = nxt
        total = pi0.get("purchase", 0)
        total += sum(
            (pi0[i] * p_abs[i]) // s
            for i in keep
            if i != "purchase" and i in pi0
        )
        return total

    full = conv(None)
    rows = []
    for c in _RE_CHANNELS:
        removed = conv(c)
        rows.append((c, pi0.get(c, 0), full, removed))
    rows.sort(key=lambda r: (-(r[2] - r[3]), r[0]))
    import math

    def round6(v: float) -> float:
        # SQL ROUND is half-UP; Python round() is half-even
        return math.floor(v * 1e6 + 0.5) / 1e6

    out = [
        (
            c,
            share,
            f_,
            r_,
            round6(1.0 - float(r_) / f_),
            rank + 1,
        )
        for rank, (c, share, f_, r_) in enumerate(rows)
    ]
    return spark.createDataFrame(
        out,
        "channel string, start_share_fx long, conv_full_fx long, "
        "conv_removed_fx long, removal_effect double, rank int",
    ).orderBy("rank")


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


def _bloom_fpr_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    wave = hash_bucket_sql("doc_id", 10)
    keys = [hash_bucket_sql(f"fp || '|{i}'", _BLOOM_M) for i in range(_BLOOM_K)]
    pos_rows = " UNION ALL ".join(
        f"SELECT {kexpr} AS pos FROM members" for kexpr in keys
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT fp, {kexpr} AS pos FROM probes" for kexpr in keys
    )
    m, k = _BLOOM_M, _BLOOM_K
    return f"""
    WITH fps AS MATERIALIZED (
      SELECT md5(text) AS fp, {wave} AS wave FROM documents
    ),
    members AS MATERIALIZED (SELECT DISTINCT fp FROM fps WHERE wave < 8),
    probes AS MATERIALIZED (
      SELECT DISTINCT fp FROM fps p WHERE wave >= 8
        AND NOT EXISTS (SELECT 1 FROM members m WHERE m.fp = p.fp)
    ),
    bits AS MATERIALIZED (SELECT DISTINCT pos FROM ({pos_rows})),
    pp AS (SELECT DISTINCT fp, pos FROM ({probe_pos})),
    hits AS (
      SELECT pp.fp, CAST(COUNT(b.pos) AS BIGINT) AS nhit,
             CAST(COUNT(*) AS BIGINT) AS npos
      FROM pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pp.fp
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(CASE WHEN nhit = npos THEN 1 ELSE 0 END) AS BIGINT)
               AS false_positives
      FROM hits
    )
    SELECT n_members, bits_set, n_probes, false_positives,
           ROUND(CAST(bits_set AS DOUBLE) / {m}, 6) AS fill_ratio,
           ROUND(CAST(false_positives AS DOUBLE) / n_probes, 6)
             AS realized_fpr,
           ROUND(CAST(bits_set AS DOUBLE) / {m}
                 * (CAST(bits_set AS DOUBLE) / {m})
                 * (CAST(bits_set AS DOUBLE) / {m}), 6) AS fill_fpr,
           ROUND((1e0 - exp(-({k}e0 * n_members) / {m}e0))
                 * (1e0 - exp(-({k}e0 * n_members) / {m}e0))
                 * (1e0 - exp(-({k}e0 * n_members) / {m}e0)), 6)
             AS theoretical_fpr
    FROM agg
    """


@register(
    "q269_bloom_fpr_calibration",
    _bloom_fpr_sql(),
    doc="Bloom false-positive audit: an m=4096-bit, k=3 filter built "
    "from md5-derived positions over the existing-corpus fingerprints "
    "(waves 0-7), probed with the genuinely novel wave-8/9 "
    "fingerprints (anti-joined so every probe is a true non-member). "
    "Outputs the set-bit census, realized FPR, the fill-ratio^k exact "
    "upper view, and the textbook (1 - e^(-kn/m))^k — cubes by "
    "multiplication, never pow(); exp's 1-ulp class is absorbed by "
    "the 6-decimal round (q94 discipline). The calibration that sizes "
    "q86's prefilter before anyone trusts its shuffle savings. One "
    "fingerprint scan; every join is on bit positions or fingerprints",
)
def q269_bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    m, k = _BLOOM_M, _BLOOM_K
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fps = d.select(
        F.md5("text").alias("fp"), hash_bucket(F.col("doc_id"), 10).alias("wave")
    )
    members = pin(fps.filter(F.col("wave") < 8).select("fp").distinct())
    probes = (
        fps.filter(F.col("wave") >= 8)
        .select("fp")
        .distinct()
        .join(members, "fp", "left_anti")
    )
    pos_of = lambda i: hash_bucket(
        F.concat(F.col("fp"), F.lit(f"|{i}")), m
    ).alias("pos")
    bits = None
    for i in range(k):
        part = members.select(pos_of(i))
        bits = part if bits is None else bits.union(part)
    bits = pin(bits.distinct())
    pp = None
    for i in range(k):
        part = probes.select("fp", pos_of(i))
        pp = part if pp is None else pp.union(part)
    pp = pp.distinct()
    hits = (
        pp.join(
            F.broadcast(bits.withColumnRenamed("pos", "bpos")),
            F.col("pos") == F.col("bpos"),
            "left",
        )
        .groupBy("fp")
        .agg(
            F.count("bpos").cast("long").alias("nhit"),
            F.count("*").cast("long").alias("npos"),
        )
    )
    nm = members.agg(F.count("*").cast("long").alias("n_members"))
    nb = bits.agg(F.count("*").cast("long").alias("bits_set"))
    agg = (
        hits.agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(F.when(F.col("nhit") == F.col("npos"), 1).otherwise(0))
            .cast("long")
            .alias("false_positives"),
        )
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(nb))
    )
    fill = F.col("bits_set").cast("double") / m
    t = 1.0 - F.exp(-(F.lit(float(k)) * F.col("n_members")) / float(m))
    return agg.select(
        "n_members",
        "bits_set",
        "n_probes",
        "false_positives",
        F.round(fill, 6).alias("fill_ratio"),
        F.round(F.col("false_positives").cast("double") / F.col("n_probes"), 6)
        .alias("realized_fpr"),
        F.round(fill * fill * fill, 6).alias("fill_fpr"),
        F.round(t * t * t, 6).alias("theoretical_fpr"),
    )


# ---------------------------------------------------------------------------
# q270 — single-link dendrogram cut sweep: exact connected components
# of the Jaccard similarity graph at four thresholds — single-link
# agglomerative clustering IS "components at cut tau", so one sweep
# shows the clustering granularity curve (how fast near-dup islands
# merge into continents as the bar drops) without ever building a
# dendrogram. Pairs computed once (q33's df-capped machinery, pinned);
# each cut reruns only the star-contraction on its edge subset.
# ---------------------------------------------------------------------------
_SL_TAUS = ["0.03", "0.05", "0.5", "0.9"]
_SL_PREFILTER = 0.029  # unrounded guard below the lowest cut


def _singlelink_sql() -> str:
    ctes = [
        _SHINGLES_CTE.strip(),
        "sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1)",
        "dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1)",
        f"""f AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
          WHERE dfreq.df_count <= {_MAX_DF})""",
        """inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM f a JOIN f b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )""",
        f"""jac AS MATERIALIZED (
      SELECT id_a, id_b,
             ROUND(n_common * 1.0 / (sa.set_size + sb.set_size - n_common), 6)
               AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_SL_PREFILTER}
    )""",
    ]
    outs = []
    for i, tau in enumerate(_SL_TAUS):
        ctes.append(
            f"""bi_{i} AS MATERIALIZED (
      SELECT id_a AS a, id_b AS b FROM jac WHERE j >= {tau}e0
      UNION SELECT id_b, id_a FROM jac WHERE j >= {tau}e0
    )"""
        )
        ctes.append(
            f"""reach_{i}(node, lbl) AS (
      SELECT DISTINCT a, a FROM bi_{i}
      UNION
      SELECT bi_{i}.a, reach_{i}.lbl FROM reach_{i}
      JOIN bi_{i} ON bi_{i}.b = reach_{i}.node
    )"""
        )
        ctes.append(
            f"""comp_{i} AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT node, MIN(lbl) AS component FROM reach_{i} GROUP BY 1
      ) GROUP BY 1
    )"""
        )
        outs.append(
            f"""SELECT CAST({tau}e0 AS DOUBLE) AS tau,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM jac WHERE j >= {tau}e0)
             AS n_edges,
           CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(COALESCE(MAX(cnt), 0) AS BIGINT) AS max_comp_size
    FROM comp_{i}"""
        )
    joined = ",\n    ".join(ctes)
    union = "\n    UNION ALL\n    ".join(outs)
    return f"""
    WITH RECURSIVE {joined}
    SELECT * FROM ({union})
    ORDER BY tau
    """


@register(
    "q270_singlelink_cut_sweep",
    _singlelink_sql(),
    doc="single-link clustering granularity sweep: exact components of "
    "the df-capped Jaccard graph at cuts 0.03/0.05/0.5/0.9 — per cut "
    "the edge count, clustered-node count, component count, and "
    "largest-island size; reading the rows top-down is walking the "
    "dendrogram from near-identical copies to loose topical puddles, "
    "the calibration for choosing q56/q135's operating threshold. "
    "Pair computation runs ONCE (pinned); each cut pays only star "
    "contraction on its own edge subset (O(edges) shuffles, O(log n) "
    "rounds, per-round localCheckpoint). Cuts filter on the 6-decimal "
    "ROUNDED similarity on both engines; the operator prefilter sits "
    "at 0.029 unrounded so no boundary pair can straddle the lowest "
    "cut differently",
)
def q270_singlelink_cut_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    jac = pin(
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=_SL_PREFILTER, max_df=_MAX_DF
        )
    )
    out = None
    for tau in _SL_TAUS:
        t = float(tau)
        edges = jac.filter(F.col("jaccard") >= t).select("id_a", "id_b")
        comp = dd.connected_components_star(edges, persist_fn=pin)
        csz = comp.groupBy("component").agg(F.count("*").cast("long").alias("cnt"))
        ne = edges.agg(F.count("*").cast("long").alias("n_edges"))
        row = (
            csz.agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_nodes"),
                F.count("*").cast("long").alias("n_components"),
                F.coalesce(F.max("cnt"), F.lit(0))
                .cast("long")
                .alias("max_comp_size"),
            )
            .crossJoin(F.broadcast(ne))
            .select(
                F.lit(t).alias("tau"),
                "n_edges",
                "n_nodes",
                "n_components",
                "max_comp_size",
            )
            .localCheckpoint()
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("tau")


# ---------------------------------------------------------------------------
# q271 — continuation pairs: document A's token SUFFIX equals document
# B's PREFIX — the signature of one source text split across crawl
# records / shard boundaries, which no symmetric dedup op here flags
# (Jaccard/containment score low for a thin overlap, and q59's spans
# don't say "B continues A"). Seeded by an equi-join on the 3-token
# boundary gram, then the maximal overlap measured per candidate pair
# (capped at 16 tokens) by direct token-slice equality.
# ---------------------------------------------------------------------------
_CONT_SEED = 3
_CONT_MAX = 16


def _continuation_sql() -> str:
    k = _CONT_SEED
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    hb AS MATERIALIZED (
      SELECT doc_id, w, len(w) AS n,
             array_to_string(w[1:{k}], ' ') AS head,
             array_to_string(w[len(w)-{k}+1:], ' ') AS tail
      FROM toks WHERE len(w) >= {k} * 2
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.w AS wa, a.n AS na, b.w AS wb, b.n AS nb
      FROM hb a JOIN hb b ON a.tail = b.head AND a.doc_id <> b.doc_id
    ),
    ov AS (
      SELECT id_a, id_b, wb,
             list_max([CASE WHEN wa[na-m+1:] = wb[1:m] THEN m END
                       FOR m IN generate_series({k},
                           LEAST({_CONT_MAX}, LEAST(na, nb)))]) AS overlap
      FROM cand
    )
    SELECT id_a, id_b, CAST(overlap AS BIGINT) AS overlap_tokens,
           array_to_string(wb[1:overlap], ' ') AS overlap_text
    FROM ov WHERE overlap IS NOT NULL
    ORDER BY id_a, id_b
    """


@register(
    "q271_continuation_pairs",
    _continuation_sql(),
    doc="shard-boundary continuation detection: pairs where doc A's "
    "token suffix equals doc B's prefix — seeded by one equi-join on "
    "the 3-token boundary gram (O(docs) shuffle on a tiny key), then "
    "the MAXIMAL overlap per candidate measured by token-slice "
    "equality up to 16 tokens. The asymmetric 'B continues A' signal "
    "that symmetric Jaccard/containment scores near zero; downstream "
    "a pipeline stitches such pairs back into one document before "
    "training (split articles otherwise truncate context mid-"
    "sentence). Candidate volume is collision-bounded; full token "
    "arrays ride only on candidate rows",
)
def q271_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = _CONT_SEED
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    hb = (
        d.select("doc_id", wcol.alias("w"))
        .filter(F.size("w") >= k * 2)
        .select(
            "doc_id",
            "w",
            F.size("w").alias("n"),
            F.array_join(F.slice("w", 1, k), " ").alias("head"),
            F.array_join(
                F.slice(F.col("w"), F.size("w") - k + 1, k), " "
            ).alias("tail"),
        )
    )
    a = hb.select(
        F.col("doc_id").alias("id_a"),
        F.col("w").alias("wa"),
        F.col("n").alias("na"),
        "tail",
    )
    b = hb.select(
        F.col("doc_id").alias("id_b"),
        F.col("w").alias("wb"),
        F.col("n").alias("nb"),
        F.col("head").alias("headb"),
    )
    cand = a.join(
        b, (F.col("tail") == F.col("headb")) & (F.col("id_a") != F.col("id_b"))
    )
    overlap = F.array_max(
        F.filter(
            F.transform(
                F.sequence(
                    F.lit(k), F.least(F.lit(_CONT_MAX), F.least("na", "nb"))
                ),
                lambda m: F.when(
                    F.slice(F.col("wa"), F.col("na") - m + 1, m)
                    == F.slice(F.col("wb"), F.lit(1), m),
                    m,
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        cand.select("id_a", "id_b", "wb", overlap.alias("overlap"))
        .filter(F.col("overlap").isNotNull())
        .select(
            "id_a",
            "id_b",
            F.col("overlap").cast("long").alias("overlap_tokens"),
            F.array_join(
                F.slice(F.col("wb"), F.lit(1), F.col("overlap")), " "
            ).alias("overlap_text"),
        )
        .orderBy("id_a", "id_b")
    )


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
# q273 — always-valid sequential A/B test (mSPRT, Johari et al. —
# the "peeking problem" fix): q157's fixed-horizon z-test is only
# valid if you look once; a live dashboard looks every day, so this
# computes the mixture likelihood ratio per day over the cumulative
# two-proportion stream and the always-valid p-value = running min of
# 1/Lambda — valid at EVERY stopping time. Users hash-assigned to
# arms; trials are user-days, success = a purchase that day.
# ---------------------------------------------------------------------------
_MSPRT_TAU2 = "0.01e0"  # mixture variance


def _msprt_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    arm = f"CASE WHEN {hash_bucket_sql('user_id', 2)} = 0 THEN 'A' ELSE 'B' END"
    t2 = _MSPRT_TAU2
    return f"""
    WITH ud AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day,
             {arm} AS arm,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT day, arm, CAST(COUNT(*) AS BIGINT) AS t_cnt,
             CAST(SUM(conv) AS BIGINT) AS s_cnt
      FROM ud GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, arm,
             SUM(t_cnt) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
             SUM(s_cnt) OVER (PARTITION BY arm ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM daily
    ),
    wide AS (
      SELECT a.day, a.n AS n_a, a.s AS s_a, b.n AS n_b, b.s AS s_b
      FROM cum a JOIN cum b ON a.day = b.day AND a.arm = 'A' AND b.arm = 'B'
    ),
    stat AS (
      SELECT day, n_a, s_a, n_b, s_b,
             CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS theta,
             (CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
               * (1e0 - CAST(s_a + s_b AS DOUBLE) / (n_a + n_b))
               * (1e0 / n_a + 1e0 / n_b) AS v
      FROM wide
    ),
    lam AS (
      SELECT day, n_a, s_a, n_b, s_b, theta, v,
             sqrt(v / (v + {t2}))
               * exp((theta * theta) * {t2} / (2e0 * v * (v + {t2}))) AS lambda
      FROM stat WHERE v > 0e0
    ),
    pv AS (
      SELECT day, n_a, s_a, n_b, s_b, theta, lambda,
             LEAST(1e0, MIN(1e0 / lambda) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_always
      FROM lam
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_a, s_a, n_b, s_b,
           ROUND(theta, 6) AS theta,
           ROUND(lambda, 6) AS lambda,
           ROUND(p_always, 6) AS p_always,
           CAST(p_always < 0.05e0 AS INT) AS reject_05
    FROM pv ORDER BY day
    """


@register(
    "q273_msprt_sequential_ab",
    _msprt_sql(),
    doc="mixture SPRT always-valid A/B readout: per day, the "
    "cumulative two-proportion stream (users md5-split into arms, "
    "trials = user-days, success = purchase), the mixture likelihood "
    "ratio Lambda = sqrt(V/(V+tau^2)) * exp(theta^2 tau^2 / "
    "(2V(V+tau^2))), and the always-valid p = min(1, running min of "
    "1/Lambda) with the 0.05 rejection flag — the dashboard that a "
    "team may peek at daily without inflating false positives, which "
    "q157's fixed-horizon z-test forbids. Zero-variance warmup days "
    "drop. sqrt is correctly rounded; exp's 1-ulp class is absorbed "
    "by the 6-decimal round (q269 discipline). One user-day "
    "aggregate + one |days|-sized window chain",
)
def q273_msprt_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    arm = F.when(hash_bucket(F.col("user_id"), 2) == 0, "A").otherwise("B")
    ud = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    ).select("user_id", "day", arm.alias("arm"), "conv")
    daily = ud.groupBy("day", "arm").agg(
        F.count("*").cast("long").alias("t_cnt"),
        F.sum("conv").cast("long").alias("s_cnt"),
    )
    cw = W.partitionBy("arm").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        "arm",
        F.sum("t_cnt").over(cw).alias("n"),
        F.sum("s_cnt").over(cw).alias("s"),
    )
    a = cum.filter(F.col("arm") == "A").select(
        "day", F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = cum.filter(F.col("arm") == "B").select(
        F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    wide = a.join(b, F.col("day") == F.col("day_b")).drop("day_b")
    theta = F.col("s_a").cast("double") / F.col("n_a") - F.col("s_b").cast(
        "double"
    ) / F.col("n_b")
    pooled = (F.col("s_a") + F.col("s_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    v = pooled * (1.0 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    t2 = 0.01
    stat = wide.select(
        "day", "n_a", "s_a", "n_b", "s_b", theta.alias("theta"), v.alias("v")
    ).filter(F.col("v") > 0.0)
    lam = stat.select(
        "day",
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        "theta",
        (
            F.sqrt(F.col("v") / (F.col("v") + t2))
            * F.exp(
                (F.col("theta") * F.col("theta"))
                * t2
                / (2.0 * F.col("v") * (F.col("v") + t2))
            )
        ).alias("lambda"),
    )
    pw = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    pv = lam.withColumn(
        "p_always", F.least(F.lit(1.0), F.min(1.0 / F.col("lambda")).over(pw))
    )
    return pv.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round("theta", 6).alias("theta"),
        F.round("lambda", 6).alias("lambda"),
        F.round("p_always", 6).alias("p_always"),
        (F.col("p_always") < 0.05).cast("int").alias("reject_05"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q274 — Heaps-law fit + crawl extrapolation: q256 measured the
# novelty curve; this PRICES the next crawl — fit unique(n) = K*n^b
# by log-log OLS over the ten cumulative wave points (the q196 OLS
# discipline), then extrapolate to a 10x crawl and report the
# predicted unique yield and marginal novelty rate. The quantified
# "more crawl buys less" answer an acquisition budget actually needs.
# ---------------------------------------------------------------------------
def _heaps_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    wave = hash_bucket_sql("doc_id", 10)
    return f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, md5(text) AS fp, {wave} AS wave FROM documents
    ),
    firsts AS (
      SELECT fp, MIN(CAST(wave AS BIGINT) * 10000000000 + doc_id) AS fk
      FROM t GROUP BY 1
    ),
    marked AS (
      SELECT t.wave,
             CASE WHEN CAST(t.wave AS BIGINT) * 10000000000 + t.doc_id = f.fk
                  THEN 1 ELSE 0 END AS novel
      FROM t JOIN firsts f ON f.fp = t.fp
    ),
    per AS (
      SELECT wave, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(novel) AS BIGINT) AS n_novel
      FROM marked GROUP BY 1
    ),
    curve AS MATERIALIZED (
      SELECT wave,
             CAST(SUM(n_docs) OVER (ORDER BY wave
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_docs,
             CAST(SUM(n_novel) OVER (ORDER BY wave
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_unique
      FROM per
    ),
    pts AS (
      SELECT CAST(ln(CAST(cum_docs AS DOUBLE)) AS DECIMAL(28,12)) AS x,
             CAST(ln(CAST(cum_unique AS DOUBLE)) AS DECIMAL(28,12)) AS y,
             CAST(ln(CAST(cum_docs AS DOUBLE)) * ln(CAST(cum_unique AS DOUBLE))
                  AS DECIMAL(28,12)) AS xy,
             CAST(ln(CAST(cum_docs AS DOUBLE)) * ln(CAST(cum_docs AS DOUBLE))
                  AS DECIMAL(28,12)) AS xx
      FROM curve
    ),
    fit AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xy) AS DOUBLE) AS sxy, CAST(SUM(xx) AS DOUBLE) AS sxx
      FROM pts
    ),
    co AS MATERIALIZED (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta,
             (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS lnk
      FROM fit
    ),
    tot AS (SELECT MAX(cum_docs) AS nd, MAX(cum_unique) AS nu FROM curve)
    SELECT c.wave AS point, c.cum_docs, c.cum_unique,
           ROUND(exp(co.lnk + co.beta * ln(CAST(c.cum_docs AS DOUBLE))), 4)
             AS fitted_unique,
           ROUND(co.beta, 6) AS heaps_beta
    FROM curve c CROSS JOIN co
    UNION ALL
    SELECT 99 AS point, t.nd * 10 AS cum_docs, NULL AS cum_unique,
           ROUND(exp(co.lnk + co.beta * ln(CAST(t.nd AS DOUBLE) * 10e0)), 4)
             AS fitted_unique,
           ROUND(co.beta, 6) AS heaps_beta
    FROM tot t CROSS JOIN co
    ORDER BY point
    """


@register(
    "q274_heaps_extrapolation",
    _heaps_sql(),
    doc="Heaps-law crawl pricing: the q256 cumulative (docs, unique "
    "fingerprints) curve fitted as unique = K * n^beta by log-log OLS "
    "(DECIMAL-quantized ln terms, q196 discipline), each wave point "
    "reported observed-vs-fitted, plus the point=99 extrapolation row "
    "predicting unique yield at a 10x crawl — beta near 1 means crawl "
    "more, beta near 0 means the well is dry. exp/ln wobble absorbed "
    "by rounding (4 decimals on the fitted counts). One fingerprint "
    "aggregate; the fit runs on ten points",
)
def q274_heaps_extrapolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        hash_bucket(F.col("doc_id"), 10).alias("wave"),
    )
    key = F.col("wave").cast("long") * 10_000_000_000 + F.col("doc_id")
    firsts = t.select("fp", key.alias("k")).groupBy("fp").agg(
        F.min("k").alias("fk")
    )
    marked = t.join(firsts, "fp").select(
        "wave", (key == F.col("fk")).cast("int").alias("novel")
    )
    per = marked.groupBy("wave").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("novel").cast("long").alias("n_novel"),
    )
    cw = W.orderBy("wave").rowsBetween(W.unboundedPreceding, 0)
    curve = pin(
        per.select(
            "wave",
            F.sum("n_docs").over(cw).cast("long").alias("cum_docs"),
            F.sum("n_novel").over(cw).cast("long").alias("cum_unique"),
        )
    )
    x = F.log(F.col("cum_docs").cast("double"))
    y = F.log(F.col("cum_unique").cast("double"))
    fit = curve.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x.cast("decimal(28,12)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,12)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,12)")).cast("double").alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    co = F.broadcast(
        fit.select(
            beta.alias("beta"),
            ((F.col("sy") - beta * F.col("sx")) / F.col("n")).alias("lnk"),
        )
    )
    obs = curve.crossJoin(co).select(
        F.col("wave").cast("int").alias("point"),
        "cum_docs",
        "cum_unique",
        F.round(
            F.exp(F.col("lnk") + F.col("beta") * F.log(F.col("cum_docs").cast("double"))),
            4,
        ).alias("fitted_unique"),
        F.round("beta", 6).alias("heaps_beta"),
    )
    tot = curve.agg(
        F.max("cum_docs").alias("nd"), F.max("cum_unique").alias("nu")
    )
    ext = tot.crossJoin(co).select(
        F.lit(99).alias("point"),
        (F.col("nd") * 10).cast("long").alias("cum_docs"),
        F.lit(None).cast("long").alias("cum_unique"),
        F.round(
            F.exp(
                F.col("lnk")
                + F.col("beta") * F.log(F.col("nd").cast("double") * 10.0)
            ),
            4,
        ).alias("fitted_unique"),
        F.round("beta", 6).alias("heaps_beta"),
    )
    return obs.unionAll(ext).orderBy("point")


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
    v = pin(
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
# q276 — winnowing candidate pairs: documents sharing >= 2 selected
# fingerprints (distinct hashes, hub hashes df-capped) — MOSS's
# actual matching step on top of q264's selection, and the third
# blocking family beside MinHash-LSH (q32) and SimHash bands (q96):
# winnowing candidates carry POSITIONS, so a hit localizes the
# shared passage instead of just naming the pair.
# ---------------------------------------------------------------------------
_WIN_PAIR_MAXDF = 50
_WIN_PAIR_MIN = 2


def _winnow_pairs_sql() -> str:
    return f"""
    WITH {_winnow_fp_ctes()},
    fph AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM fp),
    hdf AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM fph GROUP BY 1),
    keep AS (SELECT f.doc_id, f.h FROM fph f JOIN hdf USING (h)
             WHERE hdf.df <= {_WIN_PAIR_MAXDF}),
    nfp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
            FROM fph GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.id_a, s.id_b, s.n_shared, na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
           ROUND(CAST(s.n_shared AS DOUBLE) / LEAST(na.n_fp, nb.n_fp), 6)
             AS score
    FROM shared s
    JOIN nfp na ON na.doc_id = s.id_a
    JOIN nfp nb ON nb.doc_id = s.id_b
    WHERE s.n_shared >= {_WIN_PAIR_MIN}
    ORDER BY s.id_a, s.id_b
    """


def _winnow_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, w = _WIN_K, _WIN_W
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = d.select("doc_id", wcol.alias("w")).filter(F.size("w") >= k + w - 1)
    kgram_parts = lambda i: F.concat_ws(
        " ", *[F.element_at(F.col("w"), (i + j).cast("int")) for j in range(k)]
    )
    kg = toks.select(
        "doc_id",
        (F.size("w") - k + 1).cast("long").alias("m"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - k + 1),
                lambda i: F.struct(
                    i.cast("long").alias("i"),
                    F.conv(F.substring(F.md5(kgram_parts(i)), 1, 12), 16, 10)
                    .cast("long")
                    .alias("h"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "m", F.col("e.i").alias("i"), F.col("e.h").alias("h"))
    wins = kg.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1).cast("long"), F.col("i") - w + 1),
                F.least(F.col("i"), F.col("m") - w + 1),
            )
        ).alias("p"),
        F.col("i").alias("j"),
        "h",
    )
    sel = wins.groupBy("doc_id", "p").agg(
        F.min(F.col("h") * 256 + (F.col("p") + w - 1 - F.col("j"))).alias("key")
    )
    fph = pin(
        sel.select("doc_id", F.expr("key div 256").alias("h")).distinct()
    )
    hdf = fph.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    keep = fph.join(hdf.filter(F.col("df") <= _WIN_PAIR_MAXDF), "h").select(
        "doc_id", "h"
    )
    nfp = fph.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_fp"))
    a = keep.select(F.col("doc_id").alias("id_a"), "h")
    b = keep.select(F.col("doc_id").alias("id_b"), F.col("h").alias("hb"))
    shared = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_PAIR_MIN)
    )
    na = nfp.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("n_fp_a"))
    nb = nfp.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("n_fp_a"), F.col("n_fp_b")),
                6,
            ).alias("score"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "q276_winnowing_pairs",
    _winnow_pairs_sql(),
    doc="winnowing-fingerprint candidate pairs (the MOSS matching "
    "step): distinct selected hashes per doc, hub hashes dropped at "
    "df>50 (the q33 stop-shingle discipline applied to fingerprints), "
    "pairs sharing >= 2 fingerprints scored by shared/min(doc "
    "fingerprints) — a containment-flavored score on the 64x-"
    "compressed index, never the raw k-gram sets. The join shuffles "
    "O(selected fingerprints), bounded per hash by the df-cap",
)
def q276_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _winnow_pairs_df(spark, sf_dir)


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


def _vopt_sql() -> str:
    return """
    WITH daily AS MATERIALIZED (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT day, n, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
    ),
    pre AS MATERIALIZED (
      SELECT i, day, n,
             SUM(n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS s,
             SUM(n * n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ss
      FROM idx
    ),
    nn AS (SELECT MAX(i) AS n_days FROM pre),
    cuts AS (
      SELECT a.i AS j1, b.i AS j2, c.i AS j3, t.n_days
      FROM pre a, pre b, pre c, nn t
      WHERE a.i < b.i AND b.i < c.i AND c.i < t.n_days
    ),
    seg AS (
      SELECT j1, j2, j3, n_days,
             ((SELECT ss FROM pre WHERE i = j1)
              - ((SELECT s FROM pre WHERE i = j1)
                 * (SELECT s FROM pre WHERE i = j1)) // j1)
             + ((SELECT ss FROM pre WHERE i = j2)
                - (SELECT ss FROM pre WHERE i = j1)
                - (((SELECT s FROM pre WHERE i = j2)
                    - (SELECT s FROM pre WHERE i = j1))
                   * ((SELECT s FROM pre WHERE i = j2)
                      - (SELECT s FROM pre WHERE i = j1))) // (j2 - j1))
             + ((SELECT ss FROM pre WHERE i = j3)
                - (SELECT ss FROM pre WHERE i = j2)
                - (((SELECT s FROM pre WHERE i = j3)
                    - (SELECT s FROM pre WHERE i = j2))
                   * ((SELECT s FROM pre WHERE i = j3)
                      - (SELECT s FROM pre WHERE i = j2))) // (j3 - j2))
             + ((SELECT ss FROM pre WHERE i = n_days)
                - (SELECT ss FROM pre WHERE i = j3)
                - (((SELECT s FROM pre WHERE i = n_days)
                    - (SELECT s FROM pre WHERE i = j3))
                   * ((SELECT s FROM pre WHERE i = n_days)
                      - (SELECT s FROM pre WHERE i = j3))) // (n_days - j3))
               AS cost
      FROM cuts
    ),
    best AS MATERIALIZED (
      SELECT j1, j2, j3, n_days, cost
      FROM seg ORDER BY cost, j1, j2, j3 LIMIT 1
    ),
    bounds AS (
      SELECT 1 AS bin, 1 AS lo, j1 AS hi, cost, n_days FROM best
      UNION ALL SELECT 2, j1 + 1, j2, cost, n_days FROM best
      UNION ALL SELECT 3, j2 + 1, j3, cost, n_days FROM best
      UNION ALL SELECT 4, j3 + 1, n_days, cost, n_days FROM best
    ),
    ew AS (
      SELECT CAST(SUM(sse) AS BIGINT) AS ew_cost FROM (
        SELECT SUM(b.n * b.n) - (SUM(b.n) * SUM(b.n)) // COUNT(*) AS sse
        FROM pre b CROSS JOIN nn t
        GROUP BY (((b.i - 1) * 4) // t.n_days)
      )
    )
    SELECT bo.bin,
           strftime((SELECT day FROM pre WHERE i = bo.lo),
                    '%Y-%m-%d') AS day_start,
           strftime((SELECT day FROM pre WHERE i = bo.hi),
                    '%Y-%m-%d') AS day_end,
           CAST(bo.hi - bo.lo + 1 AS BIGINT) AS n_days,
           (SELECT s FROM pre WHERE i = bo.hi)
             - COALESCE((SELECT s FROM pre WHERE i = bo.lo - 1), 0)
             AS total_events,
           bo.cost AS vopt_cost_fx,
           e.ew_cost AS equiwidth_cost_fx,
           ROUND(1e0 - CAST(bo.cost AS DOUBLE) / e.ew_cost, 6)
             AS error_reduction
    FROM bounds bo CROSS JOIN ew e
    ORDER BY bo.bin
    """


@register(
    "q279_voptimal_histogram",
    _vopt_sql(),
    doc="V-optimal histogram (B=4) of the daily event-volume series: "
    "exhaustive search over (j1<j2<j3) cuts minimizing the exact "
    "integer sum of within-bin SSE terms SS - floor(S^2/len), with "
    "the (cost, cuts) lexicographic tie-break identical on both "
    "engines; reports each optimal bin's span/mass/cost beside the "
    "equi-width layout's cost and the error reduction bought. The "
    "corpus pays one day aggregate; the O(days^3) search runs on the "
    "bounded day axis (driver-side in Spark, the q268 pattern)",
)
def q279_voptimal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in daily]
    xs = [r.n for r in daily]
    N = len(xs)
    s = [0] * (N + 1)
    ss = [0] * (N + 1)
    for i in range(1, N + 1):
        s[i] = s[i - 1] + xs[i - 1]
        ss[i] = ss[i - 1] + xs[i - 1] * xs[i - 1]

    def sse(lo: int, hi: int) -> int:  # 1-based inclusive
        ln = hi - lo + 1
        sg = s[hi] - s[lo - 1]
        return (ss[hi] - ss[lo - 1]) - (sg * sg) // ln

    best = None
    for j1 in range(1, N - 2):
        c1 = sse(1, j1)
        for j2 in range(j1 + 1, N - 1):
            c2 = c1 + sse(j1 + 1, j2)
            for j3 in range(j2 + 1, N):
                cost = c2 + sse(j2 + 1, j3) + sse(j3 + 1, N)
                key = (cost, j1, j2, j3)
                if best is None or key < best:
                    best = key
    cost, j1, j2, j3 = best
    # equi-width layout on the day index: bin_no = ((i-1)*4)//N
    ew_cost = 0
    groups: dict[int, list[int]] = {}
    for i in range(1, N + 1):
        groups.setdefault(((i - 1) * 4) // N, []).append(i)
    for g in groups.values():
        ew_cost += sse(g[0], g[-1])
    bounds = [(1, 1, j1), (2, j1 + 1, j2), (3, j2 + 1, j3), (4, j3 + 1, N)]
    import math

    rows = [
        (
            b,
            days[lo - 1].strftime("%Y-%m-%d"),
            days[hi - 1].strftime("%Y-%m-%d"),
            hi - lo + 1,
            s[hi] - s[lo - 1],
            cost,
            ew_cost,
            math.floor((1.0 - float(cost) / ew_cost) * 1e6 + 0.5) / 1e6,
        )
        for b, lo, hi in bounds
    ]
    return spark.createDataFrame(
        rows,
        "bin int, day_start string, day_end string, n_days long, "
        "total_events long, vopt_cost_fx long, equiwidth_cost_fx long, "
        "error_reduction double",
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# q280 — edit-distance verification of LSH candidates: the third
# verification metric for near-dup candidates after Jaccard (q33,
# order-free) and containment (q87, length-free) — LEVENSHTEIN keeps
# order AND position, so a doc with the same vocabulary reshuffled
# scores high Jaccard but low edit similarity. Both engines ship an
# exact integer levenshtein; it is O(len^2) per pair, which is
# precisely why it only ever runs on the LSH-bounded candidate set,
# never the corpus.
# ---------------------------------------------------------------------------
def _edit_verify_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    txt AS (SELECT doc_id, trim(lower(text)) AS t,
                   length(trim(lower(text))) AS n
            FROM documents),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS edit_dist,
             CAST(GREATEST(ta.n, tb.n) AS BIGINT) AS max_len
      FROM cand c
      JOIN txt ta ON ta.doc_id = c.id_a
      JOIN txt tb ON tb.doc_id = c.id_b
    )
    SELECT id_a, id_b, edit_dist, max_len,
           ROUND(1e0 - CAST(edit_dist AS DOUBLE) / max_len, 6)
             AS edit_similarity,
           CAST(edit_dist * 10 <= max_len AS INT) AS verified_90
    FROM scored
    ORDER BY id_a, id_b
    """


@register(
    "q280_edit_distance_verify",
    _edit_verify_sql(),
    doc="Levenshtein verification of the MinHash-LSH candidate pairs: "
    "exact character edit distance (both engines' built-in integer "
    "DP), similarity 1 - dist/max_len, and a 90%-similarity verdict "
    "as the exact integer cross-multiplication dist*10 <= max_len. "
    "Order- and position-sensitive where Jaccard (q33) is order-free "
    "and containment (q87) is length-free — shuffled-vocabulary fakes "
    "fail here. O(len^2) per pair is affordable ONLY on the "
    "LSH-bounded candidate set; the plan touches the corpus once for "
    "signatures and once for the two text lookups",
)
def q280_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    cand = dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
    )
    txt = d.select(
        "doc_id",
        F.trim(F.lower(F.col("text"))).alias("t"),
        F.length(F.trim(F.lower(F.col("text")))).alias("n"),
    )
    ta = txt.select(
        F.col("doc_id").alias("id_a"), F.col("t").alias("tA"), F.col("n").alias("nA")
    )
    tb = txt.select(
        F.col("doc_id").alias("id_b"), F.col("t").alias("tB"), F.col("n").alias("nB")
    )
    scored = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("tA", "tB").cast("long").alias("edit_dist"),
            F.greatest("nA", "nB").cast("long").alias("max_len"),
        )
    )
    return scored.select(
        "id_a",
        "id_b",
        "edit_dist",
        "max_len",
        F.round(
            1.0 - F.col("edit_dist").cast("double") / F.col("max_len"), 6
        ).alias("edit_similarity"),
        (F.col("edit_dist") * 10 <= F.col("max_len")).cast("int").alias(
            "verified_90"
        ),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q281 — digit-normalized (template) dedup: documents identical up to
# NUMBERS — timestamps, IDs, counters — are one template stamped many
# times; exact dedup (q30) misses them because every stamp hashes
# differently. Fingerprint md5(text with digit runs collapsed to #),
# group, and report the template families exact dedup could not see.
# ---------------------------------------------------------------------------
@register(
    "q281_digit_normalized_dedup",
    """
    WITH fp AS (
      SELECT doc_id, md5(text) AS raw_fp,
             md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS norm_fp
      FROM documents
    ),
    fam AS (
      SELECT norm_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT raw_fp) AS BIGINT) AS n_raw_variants,
             MIN(doc_id) AS keeper_id
      FROM fp GROUP BY 1
    )
    SELECT keeper_id, n_docs, n_raw_variants,
           CAST(n_docs - 1 AS BIGINT) AS n_removable,
           CAST(n_raw_variants > 1 AS INT) AS template_family
    FROM fam
    WHERE n_docs > 1
    ORDER BY n_docs DESC, keeper_id
    """,
    doc="template dedup by digit normalization: collapse every digit "
    "run to '#', fingerprint, group — families with n_raw_variants > 1 "
    "are templates stamped with different numbers, invisible to q30's "
    "exact hash and cheap enough to run before any MinHash machinery "
    "(one narrow map + one fingerprint aggregate, the q30 shuffle "
    "profile exactly). keeper = min doc_id, the q56 convention",
)
def q281_digit_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    fp = d.select(
        "doc_id",
        F.md5("text").alias("raw_fp"),
        F.md5(F.regexp_replace("text", "[0-9]+", "#")).alias("norm_fp"),
    )
    fam = fp.groupBy("norm_fp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("raw_fp").cast("long").alias("n_raw_variants"),
        F.min("doc_id").alias("keeper_id"),
    )
    return (
        fam.filter(F.col("n_docs") > 1)
        .select(
            "keeper_id",
            "n_docs",
            "n_raw_variants",
            (F.col("n_docs") - 1).cast("long").alias("n_removable"),
            (F.col("n_raw_variants") > 1).cast("int").alias("template_family"),
        )
        .orderBy(F.col("n_docs").desc(), "keeper_id")
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
# q283 — scalar calibration metrics (ECE / MCE / Brier) for the q111
# trained filter: q117 prints the reliability TABLE; this is the
# number a model card quotes. With fixed-point probabilities the ECE
# collapses to an exact integer: sum over bins of |n_pos*S - sum p_fx|
# all over N*S — no per-bin float means at all; Brier's numerator is
# the exact BIGINT sum of (p_fx - y*S)^2.
# ---------------------------------------------------------------------------
def _ece_sql() -> str:
    from frontmatter_mcp_spark.operators.classifier import SCALE

    return f"""
    WITH scored AS ({_classifier_sql()}),
    fx AS (
      SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
             CAST(prob * {SCALE} AS BIGINT) AS pfx,
             CAST(label AS BIGINT) AS y
      FROM scored
    ),
    bins AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(ABS(SUM(y) * {SCALE} - SUM(pfx)) AS BIGINT) AS diff_fx
      FROM fx GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((pfx - y * {SCALE}) * (pfx - y * {SCALE})) AS BIGINT)
               AS brier_fx
      FROM fx
    )
    SELECT t.n, CAST(COUNT(*) AS INT) AS n_bins,
           ROUND(CAST(SUM(b.diff_fx) AS DOUBLE) / (t.n * {SCALE}), 6) AS ece,
           ROUND(MAX(CAST(b.diff_fx AS DOUBLE) / b.nb) / {SCALE}, 6) AS mce,
           ROUND(CAST(t.brier_fx AS DOUBLE)
                 / (t.n * CAST({SCALE} AS DOUBLE) * {SCALE}), 6) AS brier
    FROM bins b CROSS JOIN tot t
    GROUP BY t.n, t.brier_fx
    """


@register(
    "q283_calibration_scalars",
    _ece_sql(),
    doc="expected / maximum calibration error and Brier score for the "
    "q111 classifier over the q117 bins: ECE = sum_b |n_pos_b*S - "
    "sum p_fx_b| / (N*S) — an exact integer numerator because the "
    "probabilities are already fixed-point; MCE takes the worst bin "
    "(max of per-bin rationals as IEEE doubles); Brier = exact "
    "sum (p_fx - y*S)^2 over N*S^2. One scoring pass + a 10-row "
    "bin aggregate; the scalars a model card quotes beside q117's "
    "table and q149's confusion matrix",
)
def q283_calibration_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import SCALE, hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )
    fx = scored.select(
        F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket"),
        (F.col("prob") * SCALE).cast("long").alias("pfx"),
        F.col("label").cast("long").alias("y"),
    )
    bins = fx.groupBy("bucket").agg(
        F.count("*").cast("long").alias("nb"),
        F.abs(F.sum("y") * SCALE - F.sum("pfx")).cast("long").alias("diff_fx"),
    )
    tot = fx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("pfx") - F.col("y") * SCALE) * (F.col("pfx") - F.col("y") * SCALE))
        .cast("long")
        .alias("brier_fx"),
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "brier_fx")
        .agg(
            F.count("*").cast("int").alias("n_bins"),
            F.round(
                F.sum("diff_fx").cast("double") / (F.col("n") * F.lit(SCALE)), 6
            ).alias("ece"),
            F.round(
                F.max(F.col("diff_fx").cast("double") / F.col("nb")) / SCALE, 6
            ).alias("mce"),
            F.round(
                F.col("brier_fx").cast("double")
                / (F.col("n") * float(SCALE) * SCALE),
                6,
            ).alias("brier"),
        )
        .select("n", "n_bins", "ece", "mce", "brier")
    )


# ---------------------------------------------------------------------------
# q284 — difference-in-differences: the causal-inference workhorse —
# treatment series vs control series, before vs after an intervention
# day, the DiD estimate = (T_post - T_pre) - (C_post - C_pre) in
# DAILY MEANS, with the parallel-trends diagnostic (pre-period slope
# gap) that decides whether the design is believable. Means are
# exact-integer cross-multiplications until one final double cast.
# The intervention day is the series midpoint (deterministic).
# ---------------------------------------------------------------------------
@register(
    "q284_diff_in_diff",
    """
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1, 2
    ),
    axis AS (
      SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             (SELECT COUNT(DISTINCT day) FROM daily) AS nd
      FROM (SELECT DISTINCT day FROM daily)
    ),
    cells AS (
      SELECT CASE WHEN d.event_type = 'click' THEN 1 ELSE 0 END AS treated,
             CASE WHEN a.i * 2 > a.nd THEN 1 ELSE 0 END AS post,
             CAST(SUM(d.n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily d JOIN axis a USING (day)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN total END) AS t1,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN n_days END) AS t1n,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN total END) AS t0,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN n_days END) AS t0n,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN total END) AS c1,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN n_days END) AS c1n,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN total END) AS c0,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN n_days END) AS c0n
      FROM cells
    ),
    pre AS (
      SELECT CASE WHEN d.event_type = 'click' THEN 1 ELSE 0 END AS treated,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.i) AS BIGINT) AS sx, CAST(SUM(d.n) AS BIGINT) AS sy,
             CAST(SUM(a.i * d.n) AS BIGINT) AS sxy,
             CAST(SUM(a.i * a.i) AS BIGINT) AS sxx
      FROM daily d JOIN axis a USING (day)
      WHERE a.i * 2 <= a.nd
      GROUP BY 1
    ),
    slopes AS (
      SELECT
        MAX(CASE WHEN treated = 1 THEN
          CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END)
          AS slope_t,
        MAX(CASE WHEN treated = 0 THEN
          CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END)
          AS slope_c
      FROM pre
    )
    SELECT
      ROUND(CAST(w.t0 AS DOUBLE) / w.t0n, 6) AS treated_pre_mean,
      ROUND(CAST(w.t1 AS DOUBLE) / w.t1n, 6) AS treated_post_mean,
      ROUND(CAST(w.c0 AS DOUBLE) / w.c0n, 6) AS control_pre_mean,
      ROUND(CAST(w.c1 AS DOUBLE) / w.c1n, 6) AS control_post_mean,
      ROUND((CAST(w.t1 AS DOUBLE) / w.t1n - CAST(w.t0 AS DOUBLE) / w.t0n)
            - (CAST(w.c1 AS DOUBLE) / w.c1n - CAST(w.c0 AS DOUBLE) / w.c0n), 6)
        AS did_estimate,
      ROUND(s.slope_t - s.slope_c, 6) AS pretrend_slope_gap
    FROM w CROSS JOIN slopes s
    """,
    doc="difference-in-differences on daily volumes: 'click' treated vs "
    "'view' control, intervention at the day-axis midpoint; DiD = "
    "(post-pre) mean change in treatment minus the same in control, "
    "plus the pre-period OLS slope GAP between arms — the parallel-"
    "trends check that makes or breaks the design (exact-integer "
    "moment sums, one double division each, q196 discipline). One day "
    "aggregate + 4-cell algebra",
)
def q284_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    days = daily.select("day").distinct()
    nd = days.count()
    axis = days.select(
        "day", F.row_number().over(W.orderBy("day")).cast("long").alias("i")
    )
    j = daily.join(F.broadcast(axis), "day").select(
        (F.col("event_type") == "click").cast("int").alias("treated"),
        (F.col("i") * 2 > nd).cast("int").alias("post"),
        "i",
        "n",
    )
    cells = j.groupBy("treated", "post").agg(
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_days"),
    )
    w = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), F.col(c)
                )
            ).alias(f"{name}{suffix}")
            for t, p, name in [(1, 1, "t1"), (1, 0, "t0"), (0, 1, "c1"), (0, 0, "c0")]
            for c, suffix in [("total", ""), ("n_days", "n")]
        ]
    )
    pre = (
        j.filter(F.col("i") * 2 <= nd)
        .groupBy("treated")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("i").cast("long").alias("sx"),
            F.sum("n").cast("long").alias("sy"),
            F.sum(F.col("i") * F.col("n")).cast("long").alias("sxy"),
            F.sum(F.col("i") * F.col("i")).cast("long").alias("sxx"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slopes = pre.agg(
        F.max(F.when(F.col("treated") == 1, slope)).alias("slope_t"),
        F.max(F.when(F.col("treated") == 0, slope)).alias("slope_c"),
    )
    tpre = F.col("t0").cast("double") / F.col("t0n")
    tpost = F.col("t1").cast("double") / F.col("t1n")
    cpre = F.col("c0").cast("double") / F.col("c0n")
    cpost = F.col("c1").cast("double") / F.col("c1n")
    return (
        w.crossJoin(F.broadcast(slopes))
        .select(
            F.round(tpre, 6).alias("treated_pre_mean"),
            F.round(tpost, 6).alias("treated_post_mean"),
            F.round(cpre, 6).alias("control_pre_mean"),
            F.round(cpost, 6).alias("control_post_mean"),
            F.round((tpost - tpre) - (cpost - cpre), 6).alias("did_estimate"),
            F.round(F.col("slope_t") - F.col("slope_c"), 6).alias(
                "pretrend_slope_gap"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q285 — capture-recapture corpus-size estimation (Lincoln-Petersen
# with the Chapman correction): two INDEPENDENT deterministic md5
# samples of document fingerprints; the overlap rate estimates the
# total DISTINCT content population — the survey-statistics answer to
# "how big is the deduplicated web" that needs two cheap samples
# instead of a full q30 pass, with the exact answer riding along as
# calibration (q166 discipline).
# ---------------------------------------------------------------------------
def _caprecap_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    b1 = hash_bucket_sql("fp || '|s1'", 1000)
    b2 = hash_bucket_sql("fp || '|s2'", 1000)
    return f"""
    WITH fps AS MATERIALIZED (
      SELECT DISTINCT md5(text) AS fp FROM documents
    ),
    marks AS (
      SELECT fp, CAST({b1} < 200 AS INT) AS in1, CAST({b2} < 200 AS INT) AS in2
      FROM fps
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(in1) AS BIGINT) AS n1,
             CAST(SUM(in2) AS BIGINT) AS n2,
             CAST(SUM(in1 * in2) AS BIGINT) AS m
      FROM marks
    )
    SELECT n_true, n1, n2, m,
           CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_est,
           ROUND(CAST(n1 AS DOUBLE) * n2 / m, 4) AS lincoln_petersen_est,
           ROUND(ABS(CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS DOUBLE)
                     - n_true) / n_true, 6) AS chapman_rel_err,
           CAST(ABS(CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS DOUBLE)
                    - n_true) / n_true <= 0.15e0 AS INT) AS within_15pct
    FROM agg
    """


@register(
    "q285_capture_recapture",
    _caprecap_sql(),
    doc="capture-recapture estimate of the distinct-content population: "
    "two independent 20% md5 samples of document fingerprints (keyed "
    "with different salts, so membership is independent), overlap m, "
    "Chapman estimator (n1+1)(n2+1)/(m+1) - 1 in exact integer floor "
    "division beside the raw Lincoln-Petersen ratio — the two-cheap-"
    "passes population estimate, with the exact distinct count and "
    "relative error as hash-checked calibration columns. One "
    "fingerprint scan, one aggregate, no joins",
)
def q285_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    fps = d.select(F.md5("text").alias("fp")).distinct()
    marks = fps.select(
        (hash_bucket(F.concat(F.col("fp"), F.lit("|s1")), 1000) < 200)
        .cast("int")
        .alias("in1"),
        (hash_bucket(F.concat(F.col("fp"), F.lit("|s2")), 1000) < 200)
        .cast("int")
        .alias("in2"),
    )
    agg = marks.agg(
        F.count("*").cast("long").alias("n_true"),
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
    )
    chapman = F.expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1")
    rel_err = F.abs(chapman.cast("double") - F.col("n_true")) / F.col("n_true")
    return agg.select(
        "n_true",
        "n1",
        "n2",
        "m",
        chapman.cast("long").alias("chapman_est"),
        F.round(F.col("n1").cast("double") * F.col("n2") / F.col("m"), 4).alias(
            "lincoln_petersen_est"
        ),
        F.round(rel_err, 6).alias("chapman_rel_err"),
        (rel_err <= 0.15).cast("int").alias("within_15pct"),
    )


# ---------------------------------------------------------------------------
# q286 — rarity-weighted Jaccard: plain Jaccard (q33) lets fifty
# shared boilerplate shingles outvote one shared rare passage; here
# every kept shingle carries an integer rarity weight (N*16)//df —
# monotone in inverse document frequency with NO ln, so the weighted
# intersection and union are exact BIGINTs and the score is one final
# division. Stop-shingles (df > cap) are excluded from numerator AND
# denominator — standard stopword semantics, stated in the contract.
# ---------------------------------------------------------------------------
_WJ_THRESHOLD = "0.25e0"


def _weighted_jaccard_sql() -> str:
    return f"""
    WITH {_SHINGLES_CTE},
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM sh),
    dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
              FROM sh GROUP BY 1),
    wsh AS (
      SELECT sh.doc_id, sh.shingle, (nd.n * 16) // dfreq.df AS w
      FROM sh JOIN dfreq USING (shingle) CROSS JOIN nd
      WHERE dfreq.df <= {_MAX_DF}
    ),
    sizes AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS tw
              FROM wsh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(a.w) AS BIGINT) AS iw,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM wsh a JOIN wsh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common, iw,
           sa.tw + sb.tw - iw AS uw,
           ROUND(CAST(iw AS DOUBLE) / (sa.tw + sb.tw - iw), 6)
             AS weighted_jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(iw AS DOUBLE) / (sa.tw + sb.tw - iw) >= {_WJ_THRESHOLD}
    ORDER BY id_a, id_b
    """


@register(
    "q286_weighted_jaccard_pairs",
    _weighted_jaccard_sql(),
    doc="rarity-weighted Jaccard pairs >= 0.25 over the df-capped "
    "shingle space: weight (N*16)//df is an exact integer IDF "
    "surrogate (no ln, so weights can never flip on a 1-ulp "
    "boundary); weighted intersection / weighted union with both "
    "sums BIGINT-exact, one double division at the end. A pair "
    "sharing one rare passage now outranks a pair sharing generic "
    "glue — the ranking plain q33 inverts on boilerplate-heavy "
    "corpora. Same O(n) df-capped self-join shuffle profile as q33",
)
def q286_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    nd = sh.select("doc_id").distinct().count()
    dfreq = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    wsh = pin(
        sh.join(dfreq.filter(F.col("df") <= _MAX_DF), "shingle").select(
            "doc_id", "shingle", F.expr(f"({nd} * 16) div df").alias("w")
        )
    )
    sizes = wsh.groupBy("doc_id").agg(F.sum("w").cast("long").alias("tw"))
    a = wsh.select(F.col("doc_id").alias("id_a"), "shingle", F.col("w").alias("wa"))
    b = wsh.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("sh2"))
    inter = (
        a.join(b, (F.col("shingle") == F.col("sh2")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum("wa").cast("long").alias("iw"),
            F.count("*").cast("long").alias("n_common"),
        )
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("tw").alias("twa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("tw").alias("twb"))
    uw = F.col("twa") + F.col("twb") - F.col("iw")
    wj = F.col("iw").cast("double") / uw
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(wj >= 0.25)
        .select(
            "id_a",
            "id_b",
            "n_common",
            "iw",
            uw.cast("long").alias("uw"),
            F.round(wj, 6).alias("weighted_jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q287 — path census by NATIVE recursive CTE: Spark 4.1 executes
# WITH RECURSIVE, so for the first time a recursion runs as the SAME
# VERBATIM SQL text on both engines — no oracle-side replay, no
# Python loop, the engine's own iterative execution on each side.
# The recursion enumerates walks (UNION ALL path semantics — Spark
# does not yet support the deduplicating UNION in recursion, which is
# exactly why this counts PATHS, a quantity where multiplicity is the
# point) of length <= 4 from 'signup' through the observed
# event-transition graph.
# ---------------------------------------------------------------------------
_PATH_CENSUS_SQL = """
    WITH RECURSIVE pairs AS (
      SELECT user_id, event_type AS dst,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS src
      FROM events
    ),
    edges AS (SELECT DISTINCT src, dst FROM pairs WHERE src IS NOT NULL),
    walk AS (
      SELECT 0 AS step, 'signup' AS node
      UNION ALL
      SELECT w.step + 1 AS step, e.dst AS node
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.step < 4
    )
    SELECT step, node, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM walk GROUP BY step, node
    ORDER BY step, node
    """


@register(
    "q287_recursive_path_census",
    _PATH_CENSUS_SQL,
    doc="walk census of the behavior graph from 'signup': number of "
    "distinct edge-paths of each length <= 4 ending at each type, "
    "over the DISTINCT observed transition edges — computed by ONE "
    "verbatim WITH RECURSIVE text that Spark 4.1 and DuckDB both "
    "execute natively (the first query here where neither side "
    "replays the other's iteration; Spark's recursion supports UNION "
    "ALL only, so the path-multiplicity semantics is the honest "
    "choice). The corpus pays one window pass; the recursion runs on "
    "the |types|^2 edge set. Path counts growing super-linearly in "
    "step = a densely connected behavior graph (users can reach "
    "anything from anywhere — no funnel discipline)",
)
def q287_recursive_path_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_PATH_CENSUS_SQL)


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
# q291 — padding-waste audit: what fraction of a training batch is
# pad tokens under three batching strategies — one global bucket
# (pad everything to the corpus max), power-of-two length buckets,
# and exact 64-token bins — the throughput number that decides
# whether a loader needs q80's sequence packing at all. Pure integer
# accounting: waste = sum(bucket_ceiling - len).
# ---------------------------------------------------------------------------
@register(
    "q291_padding_waste",
    r"""
    WITH lens AS (
      SELECT CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS BIGINT) AS n
      FROM documents
    ),
    nz AS (SELECT n FROM lens WHERE n > 0),
    mx AS (SELECT MAX(n) AS gmax, CAST(SUM(n) AS BIGINT) AS total,
                  CAST(COUNT(*) AS BIGINT) AS nd FROM nz),
    pow2 AS (
      SELECT n, CASE WHEN n = 1 THEN 1
                     ELSE (CAST(1 AS BIGINT) << length(bin(n - 1))) END AS cap
      FROM nz
    ),
    bin64 AS (
      SELECT n, ((n + 63) // 64) * 64 AS cap FROM nz
    ),
    s AS (
      SELECT 'global_max' AS strategy,
             (SELECT CAST(SUM(m.gmax - z.n) AS BIGINT)
              FROM nz z CROSS JOIN mx m) AS pad_tokens
      UNION ALL
      SELECT 'pow2_buckets', CAST(SUM(cap - n) AS BIGINT) FROM pow2
      UNION ALL
      SELECT 'bin64', CAST(SUM(cap - n) AS BIGINT) FROM bin64
    )
    SELECT s.strategy, m.nd AS n_docs, m.total AS real_tokens, s.pad_tokens,
           ROUND(CAST(s.pad_tokens AS DOUBLE)
                 / (m.total + s.pad_tokens), 6) AS waste_fraction
    FROM s CROSS JOIN mx m
    ORDER BY s.strategy
    """,
    doc="padding-waste comparison across batching strategies: pad-to-"
    "corpus-max vs power-of-two length buckets vs exact 64-token "
    "bins — pad tokens and the wasted fraction of every compute "
    "batch, the number that justifies (or spares) q80's packing "
    "machinery. pow2 ceilings via 2^ceil(log2 n): exact powers of "
    "two are exact in doubles and ceil snaps to the integer exponent, "
    "so the BIGINT cast is stable on both engines; 64-bins are pure "
    "integer arithmetic. One scan, three cheap aggregates",
)
def q291_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    nz = pin(d.select(F.size(w).cast("long").alias("n")).filter(F.col("n") > 0))
    mx = nz.agg(
        F.max("n").alias("gmax"),
        F.sum("n").cast("long").alias("total"),
        F.count("*").cast("long").alias("nd"),
    )
    g = (
        nz.crossJoin(F.broadcast(mx))
        .agg(F.sum(F.col("gmax") - F.col("n")).cast("long").alias("pad_tokens"))
        .select(F.lit("global_max").alias("strategy"), "pad_tokens")
    )
    p2 = nz.select(
        "n",
        # exact integer ceiling power of two: 1 << bitlength(n-1);
        # the ln/log2 route can flip ceil() across engines by 1 ulp
        # at exact powers of two
        F.when(F.col("n") == 1, F.lit(1).cast("long"))
        .otherwise(
            F.expr("shiftleft(cast(1 as bigint), length(bin(n - 1)))")
        )
        .alias("cap"),
    ).agg(F.sum(F.col("cap") - F.col("n")).cast("long").alias("pad_tokens")).select(
        F.lit("pow2_buckets").alias("strategy"), "pad_tokens"
    )
    b64 = nz.select(
        "n", (F.expr("((n + 63) div 64) * 64")).alias("cap")
    ).agg(F.sum(F.col("cap") - F.col("n")).cast("long").alias("pad_tokens")).select(
        F.lit("bin64").alias("strategy"), "pad_tokens"
    )
    s = g.unionAll(p2).unionAll(b64)
    return (
        s.crossJoin(F.broadcast(mx))
        .select(
            "strategy",
            F.col("nd").alias("n_docs"),
            F.col("total").alias("real_tokens"),
            "pad_tokens",
            F.round(
                F.col("pad_tokens").cast("double")
                / (F.col("total") + F.col("pad_tokens")),
                6,
            ).alias("waste_fraction"),
        )
        .orderBy("strategy")
    )


# ---------------------------------------------------------------------------
# q292 — dedup ROI: near-dup clusters ranked by the TOKENS a dedup
# pass would free (non-keeper members' token mass) — the number that
# turns q56's group labels into a prioritized work queue and a
# storage/compute forecast. Keeper = min doc id (the group label
# itself, q56's convention), so freed = cluster total minus keeper.
# ---------------------------------------------------------------------------
def _dedup_roi_sql() -> str:
    return f"""
    WITH grp AS MATERIALIZED ({_neardup_groups_sql()}),
    toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cl AS (
      SELECT g.group_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
             CAST(SUM(CASE WHEN g.doc_id <> g.group_id THEN t.n_tok
                           ELSE 0 END) AS BIGINT) AS tokens_freed
      FROM grp g JOIN toks t USING (doc_id)
      GROUP BY 1 HAVING COUNT(*) > 1
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(tokens_freed), 0) AS BIGINT) AS freed_all,
             (SELECT CAST(SUM(n_tok) AS BIGINT) FROM toks) AS corpus_tokens
      FROM cl
    )
    SELECT c.group_id AS keeper_id, c.n_docs, c.tokens_total, c.tokens_freed,
           t.freed_all, ROUND(CAST(t.freed_all AS DOUBLE)
                              / t.corpus_tokens, 6) AS corpus_freed_frac
    FROM cl c CROSS JOIN tot t
    ORDER BY c.tokens_freed DESC, c.group_id
    LIMIT 20
    """


@register(
    "q292_dedup_roi",
    _dedup_roi_sql(),
    doc="dedup return-on-investment: the q56 near-dup clusters ranked "
    "by tokens freed if only the keeper (min doc id) survives — "
    "top-20 work queue plus the corpus-level freed fraction riding "
    "on every row. The triage view that decides whether a dedup pass "
    "pays for its shuffle at all. Adds one token scan + one "
    "group-keyed aggregate on top of the q56 propagation plan",
)
def q292_dedup_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    grp = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    toks = pin(d.select("doc_id", F.size(w).cast("long").alias("n_tok")))
    cl = (
        grp.join(toks, "doc_id")
        .groupBy("group_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(
                F.when(F.col("doc_id") != F.col("group_id"), F.col("n_tok"))
                .otherwise(0)
            )
            .cast("long")
            .alias("tokens_freed"),
        )
        .filter(F.col("n_docs") > 1)
    )
    tot = cl.agg(
        F.coalesce(F.sum("tokens_freed"), F.lit(0)).cast("long").alias("freed_all")
    ).crossJoin(
        F.broadcast(toks.agg(F.sum("n_tok").cast("long").alias("corpus_tokens")))
    )
    return (
        cl.crossJoin(F.broadcast(tot))
        .select(
            F.col("group_id").alias("keeper_id"),
            "n_docs",
            "tokens_total",
            "tokens_freed",
            "freed_all",
            F.round(
                F.col("freed_all").cast("double") / F.col("corpus_tokens"), 6
            ).alias("corpus_freed_frac"),
        )
        .orderBy(F.col("tokens_freed").desc(), "keeper_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q293 — Chow structural-break test: the FORMAL version of what q192
# (CUSUM) detects and q253 (binseg) localizes — fit OLS trends to the
# two halves of each type's daily series and to the pooled series,
# and report the F-statistic for "did the trend break at the
# midpoint". RSS values come from exact integer moment sums (q196
# discipline), so the only doubles are the final divisions.
# ---------------------------------------------------------------------------
@register(
    "q293_chow_break_test",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS x,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      FROM daily
    ),
    seg AS (
      SELECT event_type,
             CASE WHEN x * 2 <= nd THEN 1 ELSE 2 END AS half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1, 2
    ),
    rss AS (
      SELECT event_type, half, n,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / n
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)) AS ss
      FROM seg
    ),
    pooled AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM idx GROUP BY 1
    ),
    prss AS (
      SELECT event_type, n,
             (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) / n
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * sxx
                                       - CAST(sx AS DOUBLE) * sx)) AS ss
      FROM pooled
    ),
    halves AS (
      SELECT event_type,
             SUM(CASE WHEN half = 1 THEN ss END) AS ss1,
             SUM(CASE WHEN half = 2 THEN ss END) AS ss2
      FROM rss GROUP BY 1
    )
    SELECT p.event_type, CAST(p.n AS INT) AS n_days,
           ROUND(p.ss, 4) AS rss_pooled,
           ROUND(h.ss1 + h.ss2, 4) AS rss_split,
           ROUND(((p.ss - h.ss1 - h.ss2) / 2e0)
                 / ((h.ss1 + h.ss2) / (p.n - 4e0)), 6) AS chow_f,
           CAST(p.n - 4 AS INT) AS df2
    FROM prss p JOIN halves h USING (event_type)
    ORDER BY p.event_type
    """,
    doc="Chow test for a trend break at each type's series midpoint: "
    "per-half and pooled OLS residual sums of squares from exact "
    "BIGINT moments (RSS = (n*Syy - Sy^2)/n - (n*Sxy - Sx*Sy)^2 / "
    "(n*(n*Sxx - Sx^2)) — one algebraic form, both engines), then "
    "F = ((RSSp - RSS1 - RSS2)/2) / ((RSS1+RSS2)/(n-4)) with df2 "
    "reported so a reader applies their own critical value — the "
    "formal complement of q192's CUSUM alarm and q253's binseg "
    "localization. One day aggregate + two moment aggregates",
)
def q293_chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    )
    idx = daily.select(
        "event_type",
        "y",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("x"),
        F.count("*").over(W.partitionBy("event_type")).cast("long").alias("nd"),
    )

    def moments(df, extra):
        return df.groupBy("event_type", *extra).agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )

    def ss():
        n = F.col("n").cast("double")
        return (n * F.col("syy") - F.col("sy").cast("double") * F.col("sy")) / n - (
            (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            * (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        ) / (n * (n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")))

    seg = moments(
        idx.withColumn(
            "half", F.when(F.col("x") * 2 <= F.col("nd"), 1).otherwise(2)
        ),
        ["half"],
    ).withColumn("ss", ss())
    halves = seg.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, F.col("ss"))).alias("ss1"),
        F.sum(F.when(F.col("half") == 2, F.col("ss"))).alias("ss2"),
    )
    pooled = moments(idx, []).withColumn("ss", ss())
    return (
        pooled.join(halves, "event_type")
        .select(
            "event_type",
            F.col("n").cast("int").alias("n_days"),
            F.round("ss", 4).alias("rss_pooled"),
            F.round(F.col("ss1") + F.col("ss2"), 4).alias("rss_split"),
            F.round(
                ((F.col("ss") - F.col("ss1") - F.col("ss2")) / 2.0)
                / ((F.col("ss1") + F.col("ss2")) / (F.col("n") - 4.0)),
                6,
            ).alias("chow_f"),
            (F.col("n") - 4).cast("int").alias("df2"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q294 — seasonality strength (eta-squared): what fraction of each
# type's daily-volume variance the day-of-week explains — the scalar
# that says whether q158's dow means matter and whether q201/q257's
# seasonal machinery is warranted, computed as a pure variance
# decomposition in exact integer moments (between-group SS over
# total SS, both as n-scaled integers so no float mean ever exists).
# ---------------------------------------------------------------------------
@register(
    "q294_seasonality_strength",
    """
    WITH daily AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(dayofweek(time_bucket(INTERVAL '1 day', ts)) + 1 AS INT)
               AS dow,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(y) AS BIGINT) AS sg
      FROM daily GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s, CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    ),
    bg AS (
      SELECT g.event_type,
             CAST(SUM((g.sg * g.sg) // g.ng) AS BIGINT) AS sum_sq_over_n
      FROM g GROUP BY 1
    )
    SELECT t.event_type, CAST(t.n AS INT) AS n_days,
           ROUND((CAST(bg.sum_sq_over_n AS DOUBLE)
                  - CAST(t.s AS DOUBLE) * t.s / t.n)
                 / (t.ss - CAST(t.s AS DOUBLE) * t.s / t.n), 6)
             AS eta_squared,
           CAST((CAST(bg.sum_sq_over_n AS DOUBLE)
                 - CAST(t.s AS DOUBLE) * t.s / t.n)
                / (t.ss - CAST(t.s AS DOUBLE) * t.s / t.n) >= 0.2e0 AS INT)
             AS seasonal
    FROM t JOIN bg USING (event_type)
    ORDER BY t.event_type
    """,
    doc="day-of-week seasonality strength per type: eta^2 = "
    "between-dow sum of squares over total sum of squares on daily "
    "volumes — between-SS via the exact integer sum of floor(Sg^2/ng) "
    "(one floor per dow group, identical both engines), total-SS from "
    "BIGINT moments; one final double chain. eta^2 >= 0.2 flags types "
    "where the q201/q257 seasonal models earn their complexity; near "
    "zero says a flat q176 trend suffices. The dow label uses "
    "DuckDB's dayofweek+1 == Spark's dayofweek convention (the "
    "established shim) and is a GROUP KEY only",
)
def q294_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("y")).withColumn(
        "dow", F.dayofweek("day").cast("int")
    )
    g = daily.groupBy("event_type", "dow").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("y").cast("long").alias("sg"),
    )
    t = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    bg = g.groupBy("event_type").agg(
        F.sum(F.expr("(sg * sg) div ng")).cast("long").alias("sum_sq_over_n")
    )
    num = F.col("sum_sq_over_n").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("n")
    den = F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return (
        t.join(bg, "event_type")
        .select(
            "event_type",
            F.col("n").cast("int").alias("n_days"),
            F.round(num / den, 6).alias("eta_squared"),
            (num / den >= 0.2).cast("int").alias("seasonal"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q295 — blocking-method agreement: MinHash-LSH (q32) and SimHash
# banding (q96) hunt the same near-dup pairs with different hash
# geometry — this scores BOTH candidate sets against the exact-
# Jaccard truth (q33's >= 0.4 pairs) and against each other, the
# audit that says whether running two blockers buys recall or only
# compute. Per method: candidates, hits, precision, recall; plus the
# candidate-set Jaccard between the methods on every row.
# ---------------------------------------------------------------------------
def _blocking_agreement_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sh2 AS MATERIALIZED (
      SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fkeep AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
              WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fkeep a JOIN fkeep b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
    ov AS (
      SELECT CAST((SELECT COUNT(*) FROM mh JOIN sh2 USING (id_a, id_b))
                  AS BIGINT) AS n_both,
             CAST((SELECT COUNT(*) FROM mh) AS BIGINT) AS n_mh,
             CAST((SELECT COUNT(*) FROM sh2) AS BIGINT) AS n_sh
    ),
    rowsq AS (
      SELECT 'minhash_lsh' AS method,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM mh) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM mh JOIN truth USING (id_a, id_b)) AS n_hits
      UNION ALL
      SELECT 'simhash_bands',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sh2),
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM sh2 JOIN truth USING (id_a, id_b))
    )
    SELECT r.method, r.n_candidates, t.n_truth, r.n_hits,
           ROUND(CAST(r.n_hits AS DOUBLE) / r.n_candidates, 6) AS precision,
           ROUND(CAST(r.n_hits AS DOUBLE) / t.n_truth, 6) AS recall,
           ROUND(CAST(o.n_both AS DOUBLE)
                 / (o.n_mh + o.n_sh - o.n_both), 6) AS method_overlap
    FROM rowsq r CROSS JOIN nt t CROSS JOIN ov o
    ORDER BY r.method
    """


@register(
    "q295_blocking_agreement",
    _blocking_agreement_sql(),
    doc="cross-method blocking audit: MinHash-LSH vs SimHash-band "
    "candidate pairs scored against exact-Jaccard truth (precision / "
    "recall per method) and against each other (candidate-set "
    "Jaccard) — low overlap with comparable recall means the two "
    "geometries catch DIFFERENT pairs and an ensemble pays; high "
    "overlap means the second blocker is pure cost. All set algebra "
    "on bounded candidate tables; the corpus pays the q32 + q96 + "
    "q33 plans it already runs",
)
def q295_blocking_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    mh = pin(
        dd.lsh_candidate_pairs(
            d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
        ).select("id_a", "id_b").distinct()
    )
    sh2 = pin(
        dd.simhash_candidate_pairs(
            d,
            "doc_id",
            "text",
            bits=_SIMHASH_BITS,
            bands=_SIMHASH_BANDS,
            max_hamming=_SIMHASH_MAX_HAMMING,
            max_bucket=_SIMHASH_MAX_BUCKET,
            persist_fn=pin,
        ).select("id_a", "id_b").distinct()
    )
    truth = pin(
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
        ).select("id_a", "id_b")
    )
    nt = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_both = mh.join(sh2, ["id_a", "id_b"]).agg(
        F.count("*").cast("long").alias("n_both")
    )
    n_mh = mh.agg(F.count("*").cast("long").alias("n_mh"))
    n_sh = sh2.agg(F.count("*").cast("long").alias("n_sh"))
    ov = (
        n_both.crossJoin(F.broadcast(n_mh)).crossJoin(F.broadcast(n_sh))
    )
    r1 = (
        mh.join(truth, ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_hits"))
        .crossJoin(F.broadcast(n_mh.withColumnRenamed("n_mh", "n_candidates")))
        .select(F.lit("minhash_lsh").alias("method"), "n_candidates", "n_hits")
    )
    r2 = (
        sh2.join(truth, ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_hits"))
        .crossJoin(F.broadcast(n_sh.withColumnRenamed("n_sh", "n_candidates")))
        .select(F.lit("simhash_bands").alias("method"), "n_candidates", "n_hits")
    )
    return (
        r1.unionAll(r2)
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ov))
        .select(
            "method",
            "n_candidates",
            "n_truth",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_candidates"), 6
            ).alias("precision"),
            F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_mh") + F.col("n_sh") - F.col("n_both")),
                6,
            ).alias("method_overlap"),
        )
        .orderBy("method")
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
    tfx = pin(
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
    cond = pin(
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
# q297 — classifier operating-point sweep: precision/recall/F1 and
# Youden's J at every decile score threshold of the q111 trained
# filter, with the F1-argmax flagged — the missing step between
# q117's calibration table and a production cutoff. Counts per
# threshold come from ONE cumulative pass over the score-bucket
# histogram (suffix sums), never a per-threshold rescan.
# ---------------------------------------------------------------------------
def _opsweep_sql() -> str:
    return f"""
    WITH scored AS ({_classifier_sql()}),
    b AS (
      SELECT CAST(LEAST(9, FLOOR(prob * 10)) AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS pos
      FROM scored GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all, CAST(SUM(pos) AS BIGINT) AS p_all
      FROM b
    ),
    thresh AS (
      SELECT t.thr,
             CAST(COALESCE(SUM(b.n), 0) AS BIGINT) AS pred_pos,
             CAST(COALESCE(SUM(b.pos), 0) AS BIGINT) AS tp
      FROM (SELECT UNNEST(generate_series(0, 9)) AS thr) t
      LEFT JOIN b ON b.bucket >= t.thr
      GROUP BY t.thr
    )
    SELECT CAST(t.thr AS INT) AS threshold_decile,
           t.pred_pos, t.tp,
           ROUND(CASE WHEN t.pred_pos > 0
                      THEN CAST(t.tp AS DOUBLE) / t.pred_pos ELSE 0e0 END, 6)
             AS precision,
           ROUND(CAST(t.tp AS DOUBLE) / x.p_all, 6) AS recall,
           ROUND(CASE WHEN t.tp > 0 THEN
             2e0 * (CAST(t.tp AS DOUBLE) / t.pred_pos)
                 * (CAST(t.tp AS DOUBLE) / x.p_all)
             / (CAST(t.tp AS DOUBLE) / t.pred_pos
                + CAST(t.tp AS DOUBLE) / x.p_all) ELSE 0e0 END, 6) AS f1,
           ROUND(CAST(t.tp AS DOUBLE) / x.p_all
                 - CAST(t.pred_pos - t.tp AS DOUBLE) / (x.n_all - x.p_all), 6)
             AS youden_j
    FROM thresh t CROSS JOIN tot x
    ORDER BY threshold_decile
    """


@register(
    "q297_operating_point_sweep",
    _opsweep_sql(),
    doc="threshold sweep for the q111 quality filter: at each decile "
    "cutoff, predicted-positive and true-positive counts by SUFFIX "
    "SUMS over the 10-bucket score histogram (one corpus pass total), "
    "then precision/recall/F1/Youden's J as final double chains — the "
    "operating-point table that turns q117's calibration into an "
    "actual production cutoff. Zero-prediction edge rows pin their "
    "ratios to 0 on both engines",
)
def q297_operating_point_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )
    b = scored.groupBy(
        F.least(F.lit(9), F.floor(F.col("prob") * 10)).cast("int").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("p_all"),
    )
    thr = spark.range(0, 10).select(F.col("id").cast("int").alias("thr"))
    thresh = (
        thr.join(F.broadcast(b), F.col("bucket") >= F.col("thr"), "left")
        .groupBy("thr")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("pred_pos"),
            F.coalesce(F.sum("pos"), F.lit(0)).cast("long").alias("tp"),
        )
    )
    prec = F.when(
        F.col("pred_pos") > 0,
        F.col("tp").cast("double") / F.col("pred_pos"),
    ).otherwise(F.lit(0.0))
    rec = F.col("tp").cast("double") / F.col("p_all")
    return (
        thresh.crossJoin(F.broadcast(tot))
        .select(
            F.col("thr").cast("int").alias("threshold_decile"),
            "pred_pos",
            "tp",
            F.round(prec, 6).alias("precision"),
            F.round(rec, 6).alias("recall"),
            F.round(
                F.when(
                    F.col("tp") > 0, 2.0 * prec * rec / (prec + rec)
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("f1"),
            F.round(
                rec
                - (F.col("pred_pos") - F.col("tp")).cast("double")
                / (F.col("n_all") - F.col("p_all")),
                6,
            ).alias("youden_j"),
        )
        .orderBy("threshold_decile")
    )


# ---------------------------------------------------------------------------
# q298 — exact AUC by rank statistics (Mann-Whitney U): the
# threshold-free companion to q297's operating points — computed on
# the fixed-point scores with AVERAGE ranks for ties, so U and
# AUC*2*n1*n0 are exact integers (ties come in integer multiples of
# 1/2, absorbed by doubling) and the only double is the final ratio.
# ---------------------------------------------------------------------------
def _auc_sql() -> str:
    return f"""
    WITH scored AS ({_classifier_sql()}),
    r AS (
      SELECT label, score_fx,
             RANK() OVER (ORDER BY score_fx) AS rk,
             COUNT(*) OVER (PARTITION BY score_fx) AS nt
      FROM scored
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN label = 1
                           THEN 2 * rk + nt - 1 ELSE 0 END) AS BIGINT)
               AS rank2_pos,
             CAST(SUM(label) AS BIGINT) AS n1,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM r
    )
    SELECT n1, n - n1 AS n0,
           CAST(rank2_pos - n1 * (n1 + 1) AS BIGINT) AS u2,
           ROUND(CAST(rank2_pos - n1 * (n1 + 1) AS DOUBLE)
                 / (2e0 * n1 * (n - n1)), 6) AS auc
    FROM s
    """


@register(
    "q298_exact_auc",
    _auc_sql(),
    doc="exact ROC AUC for the q111 filter via the Mann-Whitney rank "
    "sum: average ranks under ties expressed as the integer "
    "2*rank + ties - 1 (doubled midrank), so the U statistic is an "
    "exact BIGINT — U2 = 2*sum(midranks of positives) - 2*n1(n1+1)/2 "
    "— and AUC = U2 / (2 n1 n0) is one double division. The "
    "threshold-free number beside q297's per-cutoff table; one global "
    "sort-rank window over the scored corpus (at 100 TB: the q83 "
    "two-phase rank)",
)
def q298_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.classifier import hashed_linear_scores

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    scored = hashed_linear_scores(
        d,
        "doc_id",
        "text",
        label=(F.col("lang") == "en").cast("int"),
        buckets=_CLF_BUCKETS,
        iters=_CLF_ITERS,
        persist_fn=pin,
    )
    r = scored.select(
        "label",
        F.rank().over(W.orderBy("score_fx")).alias("rk"),
        F.count("*").over(W.partitionBy("score_fx")).alias("nt"),
    )
    s = r.agg(
        F.sum(
            F.when(F.col("label") == 1, 2 * F.col("rk") + F.col("nt") - 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("rank2_pos"),
        F.sum("label").cast("long").alias("n1"),
        F.count("*").cast("long").alias("n"),
    )
    u2 = F.col("rank2_pos") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n0"),
        u2.cast("long").alias("u2"),
        F.round(
            u2.cast("double") / (2.0 * F.col("n1") * (F.col("n") - F.col("n1"))),
            6,
        ).alias("auc"),
    )


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
             ROUND(n_common * 1.0
                   / (sa.set_size + sb.set_size - n_common), 6) AS j
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
# q303 — graph diameter estimate by double BFS sweep: BFS from a
# deterministic seed to its farthest node u, then BFS from u — the
# classic 2-sweep lower bound on the diameter of each near-dup
# component, the "how chain-like are my duplicate clusters" number
# that decides between q56's fixed-iteration propagation (needs
# O(diameter) rounds) and q135's star contraction (O(log n) always).
# Both sweeps reuse the q266 bounded-hop machinery.
# ---------------------------------------------------------------------------
_DIAM_HOPS = 6


def _diameter_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    bi AS MATERIALIZED (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
    seed AS (SELECT MIN(a) AS s FROM bi),
    r1(node, hop) AS (
      SELECT s, 0 FROM seed
      UNION
      SELECT bi.b, r1.hop + 1 FROM r1 JOIN bi ON bi.a = r1.node
      WHERE r1.hop < {_DIAM_HOPS}
    ),
    d1 AS (SELECT node, MIN(hop) AS hop FROM r1 GROUP BY 1),
    far1 AS (
      SELECT node AS u, hop AS ecc1 FROM d1
      ORDER BY hop DESC, node LIMIT 1
    ),
    r2(node, hop) AS (
      SELECT u, 0 FROM far1
      UNION
      SELECT bi.b, r2.hop + 1 FROM r2 JOIN bi ON bi.a = r2.node
      WHERE r2.hop < {_DIAM_HOPS}
    ),
    d2 AS (SELECT node, MIN(hop) AS hop FROM r2 GROUP BY 1),
    far2 AS (
      SELECT node AS v, hop AS diameter_lb FROM d2
      ORDER BY hop DESC, node LIMIT 1
    )
    SELECT f1.u AS sweep1_end, f1.ecc1 AS sweep1_ecc,
           f2.v AS sweep2_end, f2.diameter_lb,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS component_nodes,
           CAST(f2.diameter_lb >= 3 AS INT) AS chainlike
    FROM far1 f1 CROSS JOIN far2 f2
    """


@register(
    "q303_graph_diameter_sweep",
    _diameter_sql(),
    doc="2-sweep diameter lower bound of the seed's near-dup "
    "component: BFS (hop-capped at 6) from the smallest edge-endpoint "
    "to its farthest node u — ties broken by node id — then BFS from "
    "u; the second eccentricity lower-bounds the diameter. "
    "diameter_lb >= 3 flags chain-like duplicate topology where "
    "fixed-iteration label propagation (q56) under-merges and star "
    "contraction (q135) is mandatory. Each sweep is the q266 frontier "
    "shape; the oracle replays both as recursive CTEs",
)
def q303_graph_diameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    cand = dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
    )
    bi = pin(
        cand.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).union(
            cand.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
        )
    )
    seed_row = bi.agg(F.min("a").alias("s")).collect()[0]
    seed = seed_row.s

    def bfs(start: int):
        dist = (
            bi.sparkSession.createDataFrame(
                [(start, 0)], "node long, hop int"
            ).localCheckpoint()
        )
        for _ in range(_DIAM_HOPS):
            nxt = dist.join(bi, dist["node"] == bi["a"]).select(
                F.col("b").alias("node"), (F.col("hop") + 1).alias("hop")
            )
            dist = (
                dist.union(nxt)
                .groupBy("node")
                .agg(F.min("hop").alias("hop"))
                .localCheckpoint()
            )
        return dist

    d1 = bfs(seed)
    far1 = d1.orderBy(F.col("hop").desc(), "node").limit(1).collect()[0]
    d2 = bfs(far1.node)
    far2 = d2.orderBy(F.col("hop").desc(), "node").limit(1).collect()[0]
    n_comp = d1.count()
    return d.sparkSession.createDataFrame(
        [
            (
                far1.node,
                int(far1.hop),
                far2.node,
                int(far2.hop),
                n_comp,
                1 if far2.hop >= 3 else 0,
            )
        ],
        "sweep1_end long, sweep1_ecc int, sweep2_end long, diameter_lb int, "
        "component_nodes long, chainlike int",
    )


# ---------------------------------------------------------------------------
# q304 — near-dup cluster language purity: do q56's duplicate
# clusters stay inside one language, or do they straddle (template
# farms stamped per-locale, or machine translation)? Per multi-member
# cluster: language count and majority share; corpus-level, the
# fraction of clusters and of member documents that cross languages —
# the audit that decides whether dedup may run per-language shards
# (a 100 TB partitioning win) or must stay global.
# ---------------------------------------------------------------------------
@register(
    "q304_cluster_lang_purity",
    f"""
    WITH grp AS MATERIALIZED ({_neardup_groups_sql()}),
    mem AS (
      SELECT g.group_id, g.doc_id, d.lang
      FROM grp g JOIN documents d USING (doc_id)
    ),
    multi AS (
      SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(MAX(cnt) AS BIGINT) AS majority
      FROM (
        SELECT group_id, doc_id, lang,
               COUNT(*) OVER (PARTITION BY group_id, lang) AS cnt
        FROM mem
      )
      GROUP BY group_id HAVING COUNT(*) > 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(COALESCE(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_cross,
             CAST(COALESCE(SUM(CASE WHEN n_langs > 1 THEN n_docs ELSE 0 END), 0)
                  AS BIGINT) AS docs_cross,
             CAST(COALESCE(SUM(n_docs), 0) AS BIGINT) AS docs_all
      FROM multi
    )
    SELECT m.group_id AS keeper_id, m.n_docs, m.n_langs,
           ROUND(CAST(m.majority AS DOUBLE) / m.n_docs, 6) AS majority_share,
           CAST(m.n_langs > 1 AS INT) AS cross_lang,
           ROUND(CAST(t.n_cross AS DOUBLE) / t.n_clusters, 6)
             AS cross_cluster_rate,
           ROUND(CAST(t.docs_cross AS DOUBLE) / t.docs_all, 6)
             AS cross_doc_rate
    FROM multi m CROSS JOIN tot t
    ORDER BY m.n_docs DESC, m.group_id
    """,
    doc="language purity of near-dup clusters: per multi-member q56 "
    "cluster the distinct-language count and majority-language share, "
    "plus corpus rates of cross-language clusters and member docs "
    "riding on every row — near-zero rates license per-language "
    "dedup sharding (the easiest 100 TB partition win); high rates "
    "mean templates/translations straddle locales and dedup must "
    "stay global. One lang join + one group aggregate on top of the "
    "q56 propagation plan",
)
def q304_cluster_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    grp = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=pin,
    )
    mem = grp.join(d.select("doc_id", "lang"), "doc_id")
    multi = (
        mem.withColumn(
            "cnt", F.count("*").over(W.partitionBy("group_id", "lang"))
        )
        .groupBy("group_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
            F.max("cnt").cast("long").alias("majority"),
        )
        .filter(F.col("n_docs") > 1)
    )
    multi = pin(multi)
    tot = multi.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.coalesce(
            F.sum(F.when(F.col("n_langs") > 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_cross"),
        F.coalesce(
            F.sum(F.when(F.col("n_langs") > 1, F.col("n_docs")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("docs_cross"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("docs_all"),
    )
    return (
        multi.crossJoin(F.broadcast(tot))
        .select(
            F.col("group_id").alias("keeper_id"),
            "n_docs",
            "n_langs",
            F.round(F.col("majority").cast("double") / F.col("n_docs"), 6).alias(
                "majority_share"
            ),
            (F.col("n_langs") > 1).cast("int").alias("cross_lang"),
            F.round(
                F.col("n_cross").cast("double") / F.col("n_clusters"), 6
            ).alias("cross_cluster_rate"),
            F.round(
                F.col("docs_cross").cast("double") / F.col("docs_all"), 6
            ).alias("cross_doc_rate"),
        )
        .orderBy(F.col("n_docs").desc(), "keeper_id")
    )


# ---------------------------------------------------------------------------
# q305 — dedup funnel ledger: one row per stage of the dedup
# pipeline — exact-hash dups, digit-template families, MinHash-LSH
# candidates, SimHash candidates, winnowing candidates, exact-Jaccard
# verified pairs — each with its pair/group count and the survivor
# ratio against the all-pairs ceiling n(n-1)/2. The funnel view that
# shows WHERE candidate mass dies, stitched from six certified
# machineries in one plan.
# ---------------------------------------------------------------------------
def _dedup_funnel_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    exact AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS cnt
      FROM (SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY 1) WHERE c > 1
    ),
    tmpl AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS cnt
      FROM (SELECT md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS nfp,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY 1) WHERE c > 1
    ),
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT DISTINCT a.doc_id, b.doc_id
        FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
      )
    ),
    sh_cnt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
      )
    ),
    wn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM ({_winnow_pairs_sql()})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
           WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fk a JOIN fk b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    stages AS (
      SELECT 1 AS stage, 'exact_hash_pairs' AS name,
             (SELECT cnt FROM exact) AS n_pairs
      UNION ALL SELECT 2, 'template_pairs', (SELECT cnt FROM tmpl)
      UNION ALL SELECT 3, 'minhash_lsh_candidates', (SELECT cnt FROM mh)
      UNION ALL SELECT 4, 'simhash_candidates', (SELECT cnt FROM sh_cnt)
      UNION ALL SELECT 5, 'winnowing_candidates', (SELECT cnt FROM wn)
      UNION ALL SELECT 6, 'jaccard_verified', (SELECT cnt FROM verified)
    )
    SELECT s.stage, s.name, s.n_pairs,
           ROUND(CAST(s.n_pairs AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2e0), 9)
             AS all_pairs_fraction
    FROM stages s CROSS JOIN nd t
    ORDER BY s.stage
    """


@register(
    "q305_dedup_funnel",
    _dedup_funnel_sql(),
    doc="the dedup candidate funnel in one table: exact-hash duplicate "
    "pairs, digit-template pairs, MinHash-LSH candidates, SimHash "
    "candidates, winnowing candidates, and exact-Jaccard verified "
    "pairs — each as a count and as a fraction of the n(n-1)/2 "
    "all-pairs ceiling, the single view that shows where candidate "
    "mass dies and which blocker over- or under-generates. Six "
    "certified machineries composed; every stage keeps its own "
    "bounded shuffle profile",
)
def q305_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    nd = d.count()
    ceiling = float(nd) * (nd - 1) / 2.0

    def pair_count_from_groups(col):
        fam = d.select(col.alias("k")).groupBy("k").agg(
            F.count("*").cast("long").alias("c")
        )
        return (
            fam.filter(F.col("c") > 1)
            .agg(
                F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
                .cast("long")
                .alias("cnt")
            )
            .collect()[0]
            .cnt
        )

    n_exact = pair_count_from_groups(F.md5("text"))
    n_tmpl = pair_count_from_groups(
        F.md5(F.regexp_replace("text", "[0-9]+", "#"))
    )
    n_mh = (
        dd.lsh_candidate_pairs(
            d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    n_sh = (
        dd.simhash_candidate_pairs(
            d,
            "doc_id",
            "text",
            bits=_SIMHASH_BITS,
            bands=_SIMHASH_BANDS,
            max_hamming=_SIMHASH_MAX_HAMMING,
            max_bucket=_SIMHASH_MAX_BUCKET,
            persist_fn=pin,
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    # the plain helper, NOT the registered wrapper: invoking a registry
    # entry mid-query would release_pinned() this query's own pins
    n_wn = _winnow_pairs_df(spark, sf_dir).count()
    n_ver = (
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
        ).count()
    )
    rows = [
        (1, "exact_hash_pairs", n_exact),
        (2, "template_pairs", n_tmpl),
        (3, "minhash_lsh_candidates", n_mh),
        (4, "simhash_candidates", n_sh),
        (5, "winnowing_candidates", n_wn),
        (6, "jaccard_verified", n_ver),
    ]
    import math

    out = [
        (s, name, int(c), math.floor(c / ceiling * 1e9 + 0.5) / 1e9)
        for s, name, c in rows
    ]
    return spark.createDataFrame(
        out, "stage int, name string, n_pairs long, all_pairs_fraction double"
    ).orderBy("stage")


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
# q307 — coverage vocabulary budget: the smallest top-K vocabulary
# covering 95% / 99% of corpus token mass, per language — the inverse
# of q63's fixed-K coverage and the number a tokenizer budget (q113/
# q163 vocab sizes, q211 context planning) is actually set from.
# Rank by (count desc, term) total order; the cut is the first rank
# whose running mass crosses the integer threshold mass*p (exact
# cross-multiplication, no percent floats).
# ---------------------------------------------------------------------------
@register(
    "q307_vocab_coverage_budget",
    r"""
    WITH words AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    v AS (SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM words GROUP BY 1, 2),
    r AS (
      SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, t) AS rk,
             SUM(c) OVER (PARTITION BY lang
                          ORDER BY c DESC, t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(c) OVER (PARTITION BY lang) AS total,
             COUNT(*) OVER (PARTITION BY lang) AS vocab
      FROM v
    )
    SELECT lang,
           CAST(MAX(vocab) AS BIGINT) AS vocab_size,
           CAST(MAX(total) AS BIGINT) AS n_tokens,
           CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END) AS BIGINT)
             AS k_for_95pct,
           CAST(MIN(CASE WHEN cum * 100 >= total * 99 THEN rk END) AS BIGINT)
             AS k_for_99pct,
           ROUND(CAST(MIN(CASE WHEN cum * 100 >= total * 95 THEN rk END)
                      AS DOUBLE) / MAX(vocab), 6) AS frac_95
    FROM r GROUP BY lang
    ORDER BY lang
    """,
    doc="per-language vocabulary budget: the smallest top-K (by count, "
    "term tie-break) covering 95% and 99% of token mass — thresholds "
    "as exact integer cross-multiplications cum*100 >= total*p, so no "
    "float percent ever exists. frac_95 near 1 means a flat "
    "distribution where truncated vocabularies hemorrhage coverage; "
    "near 0 means a tiny head suffices. One vocab aggregate + one "
    "per-language window",
)
def q307_vocab_coverage_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    v = (
        d.select("lang", F.explode(wcol).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    ow = W.partitionBy("lang").orderBy(F.col("c").desc(), "t")
    r = v.select(
        "lang",
        "c",
        F.row_number().over(ow).alias("rk"),
        F.sum("c").over(ow.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("total"),
        F.count("*").over(W.partitionBy("lang")).alias("vocab"),
    )
    return (
        r.groupBy("lang")
        .agg(
            F.max("vocab").cast("long").alias("vocab_size"),
            F.max("total").cast("long").alias("n_tokens"),
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * 95, F.col("rk"))
            )
            .cast("long")
            .alias("k_for_95pct"),
            F.min(
                F.when(F.col("cum") * 100 >= F.col("total") * 99, F.col("rk"))
            )
            .cast("long")
            .alias("k_for_99pct"),
        )
        .select(
            "lang",
            "vocab_size",
            "n_tokens",
            "k_for_95pct",
            "k_for_99pct",
            F.round(
                F.col("k_for_95pct").cast("double") / F.col("vocab_size"), 6
            ).alias("frac_95"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q308 — language homophily of the similarity graph: the fraction of
# LSH candidate edges joining same-language documents vs the expected
# fraction under random wiring (sum of squared language shares) — the
# one-number version of q304's cluster purity, computed on EDGES
# before any component resolution. Homophily >> 1 licenses
# per-language sharding of the whole candidate machinery.
# ---------------------------------------------------------------------------
def _homophily_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM sigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    bb AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    lab AS (
      SELECT c.id_a, c.id_b,
             CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END AS same
      FROM cand c
      JOIN documents da ON da.doc_id = c.id_a
      JOIN documents db ON db.doc_id = c.id_b
    ),
    e AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(SUM(same) AS BIGINT) AS n_same
      FROM lab
    ),
    shares AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS ss, CAST(SUM(c) AS BIGINT) AS n
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang)
    )
    SELECT e.n_edges, e.n_same,
           ROUND(CAST(e.n_same AS DOUBLE) / e.n_edges, 6) AS same_lang_frac,
           ROUND(CAST(s.ss AS DOUBLE) / (CAST(s.n AS DOUBLE) * s.n), 6)
             AS expected_frac,
           ROUND((CAST(e.n_same AS DOUBLE) / e.n_edges)
                 / (CAST(s.ss AS DOUBLE) / (CAST(s.n AS DOUBLE) * s.n)), 6)
             AS homophily_ratio
    FROM e CROSS JOIN shares s
    """


@register(
    "q308_lang_homophily",
    _homophily_sql(),
    doc="edge-level language homophily of the MinHash-LSH candidate "
    "graph: observed same-language edge fraction over the random-"
    "wiring expectation sum(share_l^2) — the ratio version of q304's "
    "cluster purity, available BEFORE component resolution. Ratio "
    "near 1/expected ceiling means near-dups respect language "
    "boundaries and the entire dedup machinery can shard by lang "
    "(shuffles shrink by the share-squared factor). Edge labeling is "
    "two id joins; everything else is one-row algebra",
)
def q308_lang_homophily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    cand = dd.lsh_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
    )
    la = d.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a"))
    lb = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b"))
    e = (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum((F.col("lang_a") == F.col("lang_b")).cast("int"))
            .cast("long")
            .alias("n_same"),
        )
    )
    shares = (
        d.groupBy("lang")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
            F.sum("c").cast("long").alias("n"),
        )
    )
    obs = F.col("n_same").cast("double") / F.col("n_edges")
    exp = F.col("ss").cast("double") / (F.col("n").cast("double") * F.col("n"))
    return (
        e.crossJoin(F.broadcast(shares))
        .select(
            "n_edges",
            "n_same",
            F.round(obs, 6).alias("same_lang_frac"),
            F.round(exp, 6).alias("expected_frac"),
            F.round(obs / exp, 6).alias("homophily_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q309 — stop-shingle census: the receipt for the df-cap discipline
# every pair operator here relies on — the shingles the cap drops,
# and the pair mass df*(df-1)/2 each WOULD have pushed through the
# self-join. The top offenders plus, on every row, the total pairs
# avoided and the all-pairs ceiling fraction: the difference between
# the O(n) pipeline that runs and the O(n^2) one that doesn't.
# ---------------------------------------------------------------------------
@register(
    "q309_stop_shingle_census",
    f"""
    WITH {_SHINGLES_CTE},
    dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
              FROM sh GROUP BY 1),
    dropped AS (SELECT shingle, df, df * (df - 1) // 2 AS pairs_avoided
                FROM dfreq WHERE df > {_MAX_DF}),
    tot AS (
      SELECT CAST(COALESCE(SUM(pairs_avoided), 0) AS BIGINT) AS avoided_all,
             CAST(COUNT(*) AS BIGINT) AS n_dropped,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM dfreq) AS vocab,
             (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM sh) AS nd
      FROM dropped
    )
    SELECT d.shingle, d.df, CAST(d.pairs_avoided AS BIGINT) AS pairs_avoided,
           t.n_dropped, t.avoided_all,
           ROUND(CAST(t.avoided_all AS DOUBLE)
                 / (CAST(t.nd AS DOUBLE) * (t.nd - 1) / 2e0), 6)
             AS ceiling_fraction,
           ROUND(CAST(t.n_dropped AS DOUBLE) / t.vocab, 6)
             AS dropped_vocab_frac
    FROM dropped d CROSS JOIN tot t
    ORDER BY d.df DESC, d.shingle
    LIMIT 20
    """,
    doc="stop-shingle census: the shingles the df-cap (>{cap}) drops "
    "before the pair self-join, each with the df*(df-1)/2 pair mass "
    "it would have generated — top-20 offenders with the corpus-level "
    "pairs-avoided total and its fraction of the all-pairs ceiling on "
    "every row. This table IS the scalability argument for q33/q87/"
    "q286: the cap converts a quadratic blowup into bounded work, and "
    "here is exactly how much. One shingle aggregate".format(
        cap=_MAX_DF
    ),
)
def q309_stop_shingle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    sh = d.select(
        "doc_id", F.explode(dd.word_shingles(F.col("text"), 3)).alias("shingle")
    )
    sh = pin(sh)
    dfreq = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("df"))
    dropped = dfreq.filter(F.col("df") > _MAX_DF).select(
        "shingle", "df", F.expr("df * (df - 1) div 2").alias("pairs_avoided")
    )
    nd = sh.select("doc_id").distinct().count()
    vocab = dfreq.count()
    tot = dropped.agg(
        F.coalesce(F.sum("pairs_avoided"), F.lit(0))
        .cast("long")
        .alias("avoided_all"),
        F.count("*").cast("long").alias("n_dropped"),
    )
    ceiling = float(nd) * (nd - 1) / 2.0
    return (
        dropped.crossJoin(F.broadcast(tot))
        .select(
            "shingle",
            "df",
            F.col("pairs_avoided").cast("long").alias("pairs_avoided"),
            "n_dropped",
            "avoided_all",
            F.round(F.col("avoided_all").cast("double") / ceiling, 6).alias(
                "ceiling_fraction"
            ),
            F.round(F.col("n_dropped").cast("double") / vocab, 6).alias(
                "dropped_vocab_frac"
            ),
        )
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q310 — ensemble verified near-dup pairs: candidates from ANY of the
# three blockers (MinHash-LSH, SimHash bands, winnowing), verified
# ONCE by exact Jaccard — the production composition q295's agreement
# audit argues for, with per-pair provenance flags showing which
# blocker(s) found it and the ensemble recall against the full
# verified truth on every row.
# ---------------------------------------------------------------------------
def _ensemble_pairs_sql() -> str:
    rows = _NUM_HASHES // _BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({parts}) AS bucket FROM msigs".format(
            b=b,
            parts=" || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    msigs AS (SELECT doc_id, {_sig_exprs()} FROM sh GROUP BY doc_id),
    mbb AS ({band_rows}),
    mh AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mbb a JOIN mbb b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id
    ),
    sh2 AS MATERIALIZED (
      SELECT DISTINCT id_a, id_b FROM ({_simhash_pairs_sql()})
    ),
    wn AS MATERIALIZED (
      SELECT id_a, id_b FROM ({_winnow_pairs_sql()})
    ),
    cand AS MATERIALIZED (
      SELECT id_a, id_b FROM mh
      UNION SELECT id_a, id_b FROM sh2
      UNION SELECT id_a, id_b FROM wn
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df_count FROM sh GROUP BY 1),
    fk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle)
           WHERE dfreq.df_count <= {_MAX_DF}),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM fk a JOIN fk b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common)
            >= {_JACCARD_THRESHOLD}
    ),
    verified AS (
      SELECT c.id_a, c.id_b FROM cand c JOIN truth t USING (id_a, id_b)
    ),
    stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verified) AS n_verified,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth
    )
    SELECT v.id_a, v.id_b,
           CAST(EXISTS (SELECT 1 FROM mh m
                        WHERE m.id_a = v.id_a AND m.id_b = v.id_b) AS INT)
             AS via_minhash,
           CAST(EXISTS (SELECT 1 FROM sh2 s
                        WHERE s.id_a = v.id_a AND s.id_b = v.id_b) AS INT)
             AS via_simhash,
           CAST(EXISTS (SELECT 1 FROM wn w
                        WHERE w.id_a = v.id_a AND w.id_b = v.id_b) AS INT)
             AS via_winnowing,
           ROUND(CAST(st.n_verified AS DOUBLE) / st.n_truth, 6)
             AS ensemble_recall
    FROM verified v CROSS JOIN stats st
    ORDER BY v.id_a, v.id_b
    """


@register(
    "q310_ensemble_verified_pairs",
    _ensemble_pairs_sql(),
    doc="the production near-dup pipeline: union of MinHash-LSH, "
    "SimHash-band, and winnowing candidates, verified ONCE by exact "
    "Jaccard >= 0.4 — each surviving pair carries provenance flags "
    "(which blockers found it) and the ensemble's recall against the "
    "full verified truth. The composition q295's agreement numbers "
    "justify; verification cost is paid on the union, not per "
    "blocker. Every stage keeps its own bounded shuffle",
)
def q310_ensemble_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    mh = pin(
        dd.lsh_candidate_pairs(
            d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS
        ).select("id_a", "id_b").distinct()
    )
    sh2 = pin(
        dd.simhash_candidate_pairs(
            d,
            "doc_id",
            "text",
            bits=_SIMHASH_BITS,
            bands=_SIMHASH_BANDS,
            max_hamming=_SIMHASH_MAX_HAMMING,
            max_bucket=_SIMHASH_MAX_BUCKET,
            persist_fn=pin,
        ).select("id_a", "id_b").distinct()
    )
    wn = pin(_winnow_pairs_df(spark, sf_dir).select("id_a", "id_b"))
    cand = mh.union(sh2).union(wn).distinct()
    truth = pin(
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF
        ).select("id_a", "id_b")
    )
    verified = cand.join(truth, ["id_a", "id_b"])
    stats = (
        verified.agg(F.count("*").cast("long").alias("n_verified"))
        .crossJoin(
            F.broadcast(truth.agg(F.count("*").cast("long").alias("n_truth")))
        )
    )
    flag = lambda df, name: df.select(
        "id_a", "id_b", F.lit(1).alias(name)
    )
    return (
        verified.join(F.broadcast(flag(mh, "via_minhash")), ["id_a", "id_b"], "left")
        .join(F.broadcast(flag(sh2, "via_simhash")), ["id_a", "id_b"], "left")
        .join(F.broadcast(flag(wn, "via_winnowing")), ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "id_a",
            "id_b",
            F.coalesce("via_minhash", F.lit(0)).cast("int").alias("via_minhash"),
            F.coalesce("via_simhash", F.lit(0)).cast("int").alias("via_simhash"),
            F.coalesce("via_winnowing", F.lit(0))
            .cast("int")
            .alias("via_winnowing"),
            F.round(
                F.col("n_verified").cast("double") / F.col("n_truth"), 6
            ).alias("ensemble_recall"),
        )
        .orderBy("id_a", "id_b")
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
