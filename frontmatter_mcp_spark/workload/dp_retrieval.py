"""Retrieval family: TF-IDF/BM25/LM ranking, fusion, PRF, reranking, mining and retrieval evaluation.

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
    _BM25_SCALE,
    _KMEANS_ITERS,
    _KMEANS_K,
    _LSH_DIM,
    _LSH_NBITS,
    _duck_cos,
    _duck_lsh_bucket,
    _fx_mean,
    _kmeans_ctes,
)

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
    clustered = hold(
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
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -10% (0.71->0.64)
    w = hold(
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
# q134 — BM25 retrieval top-k: the classic probabilistic lexical ranker
# (Robertson k1/b form, the scoring function behind Lucene/Elasticsearch
# and most retrieval-based data curation) over the same df-capped
# inverted index as q129's cosine k-NN
# ---------------------------------------------------------------------------
_BM25_K1 = "1.2"

_BM25_B = "0.75"

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
    "loop always runs on k^2-bounded state per query — executed as "
    "operators.mmr.mmr_greedy: one cogroup shuffle by qid, the greedy "
    "loop local per group (the oracle unrolls the identical selection "
    "as CTEs; the loop's arithmetic and (score, cid) argmax order are "
    "engine-identical by construction, see the operator docstring)",
)
def q224_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.mmr import mmr_greedy

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
    c = hold(
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
    ps = (
        a.join(b, (F.col("qid") == F.col("qid2")) & (F.col("ca") != F.col("cb")))
        .select(
            "qid",
            "ca",
            "cb",
            vector.cosine_similarity(F.col("ea"), F.col("eb")).alias("s"),
        )
    )
    sel = mmr_greedy(c, ps, [(0.7, 0.3)], _MMR_K).drop("lam")
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

    from frontmatter_mcp_spark.operators.mmr import mmr_greedy

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
    c = hold(
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
    ps = hold(
        a.join(b, (F.col("qid") == F.col("qid2")) & (F.col("ca") != F.col("cb")))
        .select(
            "qid",
            "ca",
            "cb",
            vector.cosine_similarity(F.col("ea"), F.col("eb")).alias("s"),
        )
    )

    # three consumers (rels, sa, sb) — pin so the cogroup job runs once
    sel_all = hold(
        mmr_greedy(c, ps, [(float(l), float(l2)) for l, l2 in _MMR_LAMBDAS], _MMR_K)
    )
    rels = (
        sel_all.join(c.select("qid", "cid", "r"), ["qid", "cid"])
        .groupBy("lam", "qid")
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
    sa = sel_all.select(
        F.col("lam").alias("la"), F.col("qid").alias("qa"), F.col("cid").alias("ca2")
    )
    sb = sel_all.select(
        F.col("lam").alias("lb"), F.col("qid").alias("qb"), F.col("cid").alias("cb2")
    )
    sims = (
        ps.join(sa, (F.col("qid") == F.col("qa")) & (F.col("ca") == F.col("ca2")))
        .join(
            sb,
            (F.col("la") == F.col("lb"))
            & (F.col("qid") == F.col("qb"))
            & (F.col("cb") == F.col("cb2")),
        )
        .groupBy(F.col("la").alias("lam"), F.col("qid"))
        .agg(
            F.round(
                F.sum(F.col("s").cast("decimal(28,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_intra_sim")
        )
    )
    return (
        rels.join(sims, ["lam", "qid"])
        .select("lam", "qid", "mean_relevance", "mean_intra_sim", "selection")
        .orderBy("lam", "qid")
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
# q323 — Dirichlet-smoothed query-likelihood retrieval (Zhai/Lafferty):
# the language-modeling ranker beside q134's BM25 and q129's cosine —
# score(q,d) = sum_t ln(1 + tf * |C| / (mu * cf_t)) + |q| ln(mu/(dl+mu)),
# the sparse decomposition that keeps the posting join O(query terms x
# bounded postings) even though the smoothed model assigns every term
# nonzero mass (the naive form is dense corpus x queries). One SQL
# template, two dialects (q127/q134 discipline); per-term scores
# floored into 2^30 fixed point so per-pair sums are exact BIGINTs.
# ---------------------------------------------------------------------------
_QL_MU = "100e0"

def _ql_sql(dialect: str, table: str = "documents") -> str:
    s, cap, mu = _BM25_SCALE, _BM25_MAX_DF, _QL_MU
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
    # shared scoring fragments — identical text in both dialects
    term_match = f"ln(1 + (tf.tf * CAST(st.tt AS DOUBLE)) / ({mu} * cf.cf))"
    term_len = f"ln({mu} / (dl.dl + {mu}))"
    return f"""
    WITH toks AS (SELECT doc_id, {tokenize} AS w FROM {table}),
    lens AS (SELECT doc_id, CAST({dlen} AS BIGINT) AS dl FROM toks),
    st AS (SELECT CAST(SUM(dl) AS BIGINT) AS tt FROM lens),
    alltoks AS ({explode_all}),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
           FROM alltoks GROUP BY 1, 2),
    cf AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS cf,
                  CAST(COUNT(*) AS BIGINT) AS df
           FROM tf GROUP BY 1),
    qt AS ({explode_q}),
    qstats AS (
      SELECT qt.qid, CAST(COUNT(*) AS BIGINT) AS nq
      FROM qt JOIN cf ON cf.t = qt.t AND cf.df <= {cap}
      GROUP BY 1
    ),
    matched AS (
      SELECT qt.qid, tf.doc_id,
             CAST(SUM(CAST(FLOOR(({term_match}) * {s}) AS BIGINT)) AS BIGINT)
               AS match_fx,
             CAST(COUNT(*) AS INT) AS n_matched
      FROM qt
      JOIN cf ON cf.t = qt.t AND cf.df <= {cap}
      JOIN tf ON tf.t = qt.t
      CROSS JOIN st
      WHERE tf.doc_id <> qt.qid
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT m.qid, m.doc_id, m.n_matched,
             m.match_fx
               + q.nq * CAST(FLOOR(({term_len}) * {s}) AS BIGINT) AS score_fx
      FROM matched m
      JOIN qstats q ON q.qid = m.qid
      JOIN lens dl ON dl.doc_id = m.doc_id
    ),
    ranked AS (
      SELECT qid, doc_id, n_matched,
             ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) DESC, doc_id
             ) AS rnk
      FROM scored
    )
    SELECT qid AS query_id, doc_id AS hit_id, n_matched, score,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


@register(
    "q323_dirichlet_ql_topk",
    _ql_sql("duckdb"),
    doc="Dirichlet-smoothed query-likelihood top-k (Zhai/Lafferty "
    "mu=100 — the language-modeling ranker beside q134's BM25): the "
    "rank-equivalent sparse decomposition sum ln(1 + tf*|C|/(mu*cf)) "
    "+ |q| ln(mu/(dl+mu)) keeps the posting join bounded even though "
    "the smoothed model scores every (query, doc) pair — the doc-"
    "length term is per-doc, the match term joins df-capped postings "
    "only. Per-term scores floored into 2^30 fixed point (exact "
    "BIGINT per-pair sums); ln's 1-ulp wobble absorbed by quantized "
    "ranking (q134's discipline). One SQL template, two dialects. "
    "With q134/q129/q262 this completes the classic lexical-ranker "
    "family: tf-idf cosine, BM25, BM25F, and the LM approach",
)
def q323_dirichlet_ql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q323"
    )
    return spark.sql(_ql_sql("spark", "documents_q323"))

# ---------------------------------------------------------------------------
# q345 — Rocchio pseudo-relevance feedback (two-pass retrieval): the
# classic query-expansion loop — BM25 pass 1 takes the top-3 docs per
# query, their highest-idf-mass terms (df-capped, original terms
# excluded) expand the query at half weight (Rocchio alpha=1,
# beta=0.5 as integer weights 2:1), and BM25 scores the expanded
# query in pass 2. Both passes ride q134's posting-join discipline;
# every weight/idf/term score is floored into fixed point so per-pair
# sums are exact BIGINTs.
# ---------------------------------------------------------------------------
_PRF_FEEDBACK_K = 3

_PRF_EXP_TERMS = 5

_PRF_IDF_FX = 1 << 20

def _rocchio_sql(dialect: str, table: str = "documents") -> str:
    k1, b, s = _BM25_K1, _BM25_B, _BM25_SCALE
    cap, ifx = _BM25_MAX_DF, _PRF_IDF_FX
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
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
           FROM alltoks GROUP BY 1, 2),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    qt AS ({explode_q}),
    p1 AS (
      SELECT qt.qid, tf.doc_id,
             CAST(SUM(CAST(FLOOR(({term}) * {s}) AS BIGINT)) AS BIGINT)
               AS score_fx
      FROM qt
      JOIN df ON df.t = qt.t AND df.df <= {cap}
      JOIN tf ON tf.t = qt.t
      JOIN lens dl ON dl.doc_id = tf.doc_id
      CROSS JOIN st
      WHERE tf.doc_id <> qt.qid
      GROUP BY 1, 2
    ),
    fb AS (
      SELECT qid, doc_id FROM (
        SELECT qid, doc_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY ROUND(CAST(score_fx AS DOUBLE) / {s}, 4) DESC,
                          doc_id) AS rn
        FROM p1
      ) WHERE rn <= {_PRF_FEEDBACK_K}
    ),
    cand AS (
      SELECT fb.qid, tf.t,
             CAST(SUM(tf.tf * CAST(FLOOR(ln((st.nd + 1e0) / df.df) * {ifx})
                                   AS BIGINT)) AS BIGINT) AS w_fx
      FROM fb
      JOIN tf ON tf.doc_id = fb.doc_id
      JOIN df ON df.t = tf.t AND df.df <= {cap}
      CROSS JOIN st
      WHERE NOT EXISTS (SELECT 1 FROM qt q2
                        WHERE q2.qid = fb.qid AND q2.t = tf.t)
      GROUP BY 1, 2
    ),
    exp_t AS (
      SELECT qid, t FROM (
        SELECT qid, t,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY w_fx DESC, t) AS rn
        FROM cand
      ) WHERE rn <= {_PRF_EXP_TERMS}
    ),
    q2 AS (
      SELECT qid, t, CAST(2 AS BIGINT) AS qw FROM qt
      UNION ALL
      SELECT qid, t, CAST(1 AS BIGINT) AS qw FROM exp_t
    ),
    p2 AS (
      SELECT q2.qid, tf.doc_id,
             CAST(SUM(q2.qw * CAST(FLOOR(({term}) * {s}) AS BIGINT))
                  AS BIGINT) AS score_fx,
             CAST(COUNT(*) AS INT) AS n_matched
      FROM q2
      JOIN df ON df.t = q2.t AND df.df <= {cap}
      JOIN tf ON tf.t = q2.t
      JOIN lens dl ON dl.doc_id = tf.doc_id
      CROSS JOIN st
      WHERE tf.doc_id <> q2.qid
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT qid, doc_id, n_matched,
             ROUND(CAST(score_fx AS DOUBLE) / {s} / 2, 4) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY ROUND(CAST(score_fx AS DOUBLE) / {s} / 2, 4) DESC,
                        doc_id) AS rnk
      FROM p2
    )
    SELECT qid AS query_id, doc_id AS hit_id, n_matched, score,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


@register(
    "q345_rocchio_prf",
    _rocchio_sql("duckdb"),
    doc="Rocchio pseudo-relevance feedback: BM25 pass 1 takes each "
    "query's top-3 documents, their top-5 idf-mass terms (df-capped, "
    "original query terms excluded via anti-join) expand the query at "
    "Rocchio weights alpha:beta = 2:1 (integer multipliers on the "
    "2^30-floored per-term scores — per-pair sums stay exact "
    "BIGINTs), and pass 2 re-ranks with the expanded query. The "
    "classic recall-boosting IR loop completing the ranker family "
    "(q129 cosine, q134 BM25, q262 BM25F, q323 LM, q230 fusion — and "
    "now feedback). Both passes are df-capped posting joins; the "
    "feedback set is 3 docs/query, the expansion 5 terms/query — "
    "everything between passes is query-count-bounded",
)
def q345_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q345"
    )
    return spark.sql(_rocchio_sql("spark", "documents_q345"))

# ---------------------------------------------------------------------------
# q356 — posting-list delta-compression estimate: per document-
# frequency bucket, the bytes an inverted index pays storing postings
# raw (8 bytes/doc-id) vs varint-encoded doc-id GAPS — the q354
# front-coding audit's sibling for the posting side (together they
# price the whole index). Gap varint widths are exact integer CASE
# ladders; postings sort under the (term, doc_id) total order.
# ---------------------------------------------------------------------------
@register(
    "q356_posting_compression",
    r"""
    WITH words AS (
      SELECT DISTINCT doc_id, unnest(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS t
      FROM documents
    ),
    p AS (
      SELECT t, doc_id,
             doc_id - LAG(doc_id) OVER (PARTITION BY t ORDER BY doc_id)
               AS gap
      FROM words
    ),
    b AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(CASE
               WHEN gap IS NULL THEN
                 CASE WHEN doc_id < 128 THEN 1
                      WHEN doc_id < 16384 THEN 2
                      WHEN doc_id < 2097152 THEN 3
                      WHEN doc_id < 268435456 THEN 4 ELSE 5 END
               WHEN gap < 128 THEN 1
               WHEN gap < 16384 THEN 2
               WHEN gap < 2097152 THEN 3
               WHEN gap < 268435456 THEN 4 ELSE 5 END) AS BIGINT)
               AS varint_bytes
      FROM p GROUP BY 1
    ),
    g AS (
      SELECT CASE WHEN df = 1 THEN '1'
                  WHEN df <= 4 THEN '2-4'
                  WHEN df <= 16 THEN '5-16'
                  WHEN df <= 64 THEN '17-64'
                  ELSE '65+' END AS df_bucket,
             CAST(MIN(df) AS BIGINT) AS bucket_order,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(df) AS BIGINT) AS n_postings,
             CAST(SUM(df) * 8 AS BIGINT) AS raw_bytes,
             CAST(SUM(varint_bytes) AS BIGINT) AS coded_bytes
      FROM b GROUP BY 1
    )
    SELECT df_bucket, n_terms, n_postings, raw_bytes, coded_bytes,
           ROUND(1e0 - CAST(coded_bytes AS DOUBLE) / raw_bytes, 6)
             AS savings
    FROM g
    ORDER BY bucket_order
    """,
    doc="posting-list storage audit: per document-frequency bucket, "
    "raw 8-byte/posting cost vs varint-encoded doc-id gaps (first "
    "posting stores the absolute id; widths by the exact 7-bit CASE "
    "ladder — pure integers, both engines) — q354 prices the term "
    "dictionary, this prices the postings, and together they say "
    "what the q58/q129/q134/q345 index family costs to persist at "
    "corpus scale (high-df terms compress hardest: dense postings "
    "have small gaps). One distinct (doc, term) explode + one "
    "per-term window + two aggregates",
)
def q356_posting_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    wcol = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    words = d.select("doc_id", F.explode(wcol).alias("t")).distinct()
    p = words.select(
        "t",
        "doc_id",
        (
            F.col("doc_id")
            - F.lag("doc_id").over(W.partitionBy("t").orderBy("doc_id"))
        ).alias("gap"),
    )

    def width(col):
        return (
            F.when(col < 128, 1)
            .when(col < 16384, 2)
            .when(col < 2097152, 3)
            .when(col < 268435456, 4)
            .otherwise(5)
        )

    vb = F.when(F.col("gap").isNull(), width(F.col("doc_id"))).otherwise(
        width(F.col("gap"))
    )
    b = p.groupBy("t").agg(
        F.count("*").cast("long").alias("df"),
        F.sum(vb).cast("long").alias("varint_bytes"),
    )
    bucket = (
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") <= 4, "2-4")
        .when(F.col("df") <= 16, "5-16")
        .when(F.col("df") <= 64, "17-64")
        .otherwise("65+")
    )
    g = b.groupBy(bucket.alias("df_bucket")).agg(
        F.min("df").cast("long").alias("bucket_order"),
        F.count("*").cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        (F.sum("df") * 8).cast("long").alias("raw_bytes"),
        F.sum("varint_bytes").cast("long").alias("coded_bytes"),
    )
    return (
        g.select(
            "df_bucket",
            "n_terms",
            "n_postings",
            "raw_bytes",
            "coded_bytes",
            F.round(
                F.lit(1.0)
                - F.col("coded_bytes").cast("double") / F.col("raw_bytes"),
                6,
            ).alias("savings"),
        )
        .orderBy(F.col("n_postings").desc(), "df_bucket")
    )

# ---------------------------------------------------------------------------
# q361 — MRR and success@k retrieval eval: the rank-of-first-hit
# metrics beside q102's graded NDCG — MRR reads "how deep does a user
# scroll to the first relevant result", success@k "does the first
# page contain one at all". Reciprocal ranks are exact rationals
# quantized into 2^20 fixed point (order-free mean); label-match
# relevance, same protocol as q102.
# ---------------------------------------------------------------------------
_MRR_FX = 1 << 20


@register(
    "q361_retrieval_mrr",
    f"""
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
      ) WHERE rank <= 10
    ),
    rels AS (
      SELECT t.qid, t.rank,
             CASE WHEN cc.clabel = q.qlabel THEN 1 ELSE 0 END AS rel
      FROM top t JOIN c cc ON cc.cid = t.cid JOIN q ON q.qid = t.qid
    ),
    firsts AS (
      SELECT qid, MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel
      FROM rels GROUP BY 1
    ),
    per_q AS (
      SELECT f.qid, f.first_rel,
             CASE WHEN f.first_rel IS NULL THEN 0
                  ELSE {_MRR_FX} // f.first_rel END AS rr_fx,
             CAST(f.first_rel IS NOT NULL AND f.first_rel <= 1 AS INT)
               AS s1,
             CAST(f.first_rel IS NOT NULL AND f.first_rel <= 5 AS INT)
               AS s5,
             CAST(f.first_rel IS NOT NULL AS INT) AS s10
      FROM firsts f
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_q,
             CAST(SUM(rr_fx) AS BIGINT) AS rr_sum,
             CAST(SUM(s1) AS BIGINT) AS h1,
             CAST(SUM(s5) AS BIGINT) AS h5,
             CAST(SUM(s10) AS BIGINT) AS h10
      FROM per_q
    )
    SELECT p.qid, CAST(p.first_rel AS INT) AS first_relevant_rank,
           ROUND(CAST(p.rr_fx AS DOUBLE) / {_MRR_FX}, 6)
             AS reciprocal_rank,
           ROUND(CAST(a.rr_sum AS DOUBLE) / a.n_q / {_MRR_FX}, 6) AS mrr,
           ROUND(CAST(a.h1 AS DOUBLE) / a.n_q, 6) AS success_at_1,
           ROUND(CAST(a.h5 AS DOUBLE) / a.n_q, 6) AS success_at_5,
           ROUND(CAST(a.h10 AS DOUBLE) / a.n_q, 6) AS success_at_10
    FROM per_q p CROSS JOIN agg a
    ORDER BY p.qid
    """,
    doc="MRR + success@1/5/10 of the exact cosine ranking with label-"
    "match relevance (q102's protocol, q36's plan): reciprocal ranks "
    "as exact 2^20 floor-divided integers so the MRR mean is "
    "order-free, first-relevant rank per query, and the success "
    "ladder as exact count ratios — the rank-of-first-hit metrics "
    "that complete the retrieval-eval family (recall q82/q101, "
    "graded NDCG q102, cost q245). One broadcast-queries corpus "
    "scan + bounded aggregates",
)
def q361_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("clabel"),
    )
    pairs = c.crossJoin(F.broadcast(q)).withColumn(
        "sim", vector.cosine_similarity(F.col("qv"), F.col("cv"))
    )
    top = (
        pairs.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
            ),
        )
        .filter(F.col("rank") <= 10)
        .select(
            "qid",
            "rank",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    firsts = top.groupBy("qid").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel")
    )
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -27% (1.38->1.01)
    per_q = hold(
        firsts.select(
            "qid",
            "first_rel",
            F.when(F.col("first_rel").isNull(), F.lit(0))
            .otherwise(F.expr(f"{_MRR_FX} div first_rel"))
            .cast("long")
            .alias("rr_fx"),
            (
                F.col("first_rel").isNotNull() & (F.col("first_rel") <= 1)
            )
            .cast("int")
            .alias("s1"),
            (
                F.col("first_rel").isNotNull() & (F.col("first_rel") <= 5)
            )
            .cast("int")
            .alias("s5"),
            F.col("first_rel").isNotNull().cast("int").alias("s10"),
        )
    )
    agg = per_q.agg(
        F.count("*").cast("long").alias("n_q"),
        F.sum("rr_fx").cast("long").alias("rr_sum"),
        F.sum("s1").cast("long").alias("h1"),
        F.sum("s5").cast("long").alias("h5"),
        F.sum("s10").cast("long").alias("h10"),
    )
    return (
        per_q.crossJoin(F.broadcast(agg))
        .select(
            "qid",
            F.col("first_rel").cast("int").alias("first_relevant_rank"),
            F.round(F.col("rr_fx").cast("double") / _MRR_FX, 6).alias(
                "reciprocal_rank"
            ),
            F.round(
                F.col("rr_sum").cast("double") / F.col("n_q") / _MRR_FX, 6
            ).alias("mrr"),
            F.round(F.col("h1").cast("double") / F.col("n_q"), 6).alias(
                "success_at_1"
            ),
            F.round(F.col("h5").cast("double") / F.col("n_q"), 6).alias(
                "success_at_5"
            ),
            F.round(F.col("h10").cast("double") / F.col("n_q"), 6).alias(
                "success_at_10"
            ),
        )
        .orderBy("qid")
    )

# ---------------------------------------------------------------------------
# q365 — Rocchio PRF calibration sweep: q345 fixed (fb_k=3, 5 terms);
# this re-runs the feedback loop under the four (fb_k, exp_terms)
# corners on ONE shared pass-1 ranking (the q82/q91/q260 sweep
# discipline) and scores each config's top-5 by same-source
# precision (the fixture's topicality label) and by overlap with the
# no-feedback baseline — the chart that says whether feedback helps,
# and how aggressive it should be. All metrics exact integer ratios.
# ---------------------------------------------------------------------------
_PRF_SWEEP = [(1, 3), (1, 5), (3, 3), (3, 5)]

def _rocchio_sweep_sql(dialect: str, table: str = "documents") -> str:
    k1, b, s = _BM25_K1, _BM25_B, _BM25_SCALE
    cap, ifx = _BM25_MAX_DF, _PRF_IDF_FX
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
    term = (
        f"ln(1 + (st.nd - df.df + 0.5) / (df.df + 0.5)) * "
        f"((tf.tf * ({k1} + 1)) / "
        f"(tf.tf + {k1} * (1 - {b} + {b} * dl.dl / (CAST(st.tt AS DOUBLE) / st.nd))))"
    )
    max_fb = max(fk for fk, _ in _PRF_SWEEP)
    cfg_blocks, cfg_rows = [], []
    for fk, ne in _PRF_SWEEP:
        ns = f"c{fk}_{ne}"
        cfg_blocks.append(
            f"""{ns}_exp AS (
      SELECT qid, t FROM (
        SELECT cd.qid, cd.t,
               ROW_NUMBER() OVER (PARTITION BY cd.qid
                                  ORDER BY cd.w_fx DESC, cd.t) AS rn
        FROM cand_{fk} cd
      ) WHERE rn <= {ne}
    ),
    {ns}_q2 AS (
      SELECT qid, t, CAST(2 AS BIGINT) AS qw FROM qt
      UNION ALL
      SELECT qid, t, CAST(1 AS BIGINT) AS qw FROM {ns}_exp
    ),
    {ns}_top AS (
      SELECT qid, doc_id FROM (
        SELECT q2.qid, tf.doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q2.qid
                 ORDER BY ROUND(CAST(SUM(q2.qw * CAST(FLOOR(({term}) * {s})
                        AS BIGINT)) AS DOUBLE) / {s} / 2, 4) DESC,
                        tf.doc_id) AS rnk
        FROM {ns}_q2 q2
        JOIN df ON df.t = q2.t AND df.df <= {cap}
        JOIN tf ON tf.t = q2.t
        JOIN lens dl ON dl.doc_id = tf.doc_id
        CROSS JOIN st
        WHERE tf.doc_id <> q2.qid
        GROUP BY q2.qid, tf.doc_id
      ) WHERE rnk <= 5
    ),
    {ns}_m AS (
      SELECT {fk} AS fb_k, {ne} AS exp_terms,
             CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(SUM(CASE WHEN ds.source = qs.source THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same_source,
             CAST(SUM(CASE WHEN b5.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_overlap_baseline
      FROM {ns}_top t
      JOIN {table} ds ON ds.doc_id = t.doc_id
      JOIN {table} qs ON qs.doc_id = t.qid
      LEFT JOIN base5 b5 ON b5.qid = t.qid AND b5.doc_id = t.doc_id
    )"""
        )
        cfg_rows.append(f"SELECT * FROM {ns}_m")
    cfg_sql = ",\n    ".join(cfg_blocks)
    rows_sql = " UNION ALL ".join(cfg_rows)
    return f"""
    WITH toks AS (SELECT doc_id, {tokenize} AS w FROM {table}),
    lens AS (SELECT doc_id, CAST({dlen} AS BIGINT) AS dl FROM toks),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
           FROM lens WHERE dl > 0),
    alltoks AS ({explode_all}),
    tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
           FROM alltoks GROUP BY 1, 2),
    df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    qt AS ({explode_q}),
    p1 AS (
      SELECT qt.qid, tf.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY qt.qid
               ORDER BY ROUND(CAST(SUM(CAST(FLOOR(({term}) * {s}) AS BIGINT))
                      AS DOUBLE) / {s}, 4) DESC, tf.doc_id) AS rnk
      FROM qt
      JOIN df ON df.t = qt.t AND df.df <= {cap}
      JOIN tf ON tf.t = qt.t
      JOIN lens dl ON dl.doc_id = tf.doc_id
      CROSS JOIN st
      WHERE tf.doc_id <> qt.qid
      GROUP BY qt.qid, tf.doc_id
    ),
    base5 AS (SELECT qid, doc_id FROM p1 WHERE rnk <= 5),
    fb_{max_fb} AS (SELECT qid, doc_id, rnk FROM p1 WHERE rnk <= {max_fb}),
    cand_all AS (
      SELECT fb.qid, fb.rnk, tf.t,
             tf.tf * CAST(FLOOR(ln((st.nd + 1e0) / df.df) * {ifx})
                          AS BIGINT) AS w1
      FROM fb_{max_fb} fb
      JOIN tf ON tf.doc_id = fb.doc_id
      JOIN df ON df.t = tf.t AND df.df <= {cap}
      CROSS JOIN st
      WHERE NOT EXISTS (SELECT 1 FROM qt q2
                        WHERE q2.qid = fb.qid AND q2.t = tf.t)
    ),
    cand_1 AS (SELECT qid, t, CAST(SUM(w1) AS BIGINT) AS w_fx
               FROM cand_all WHERE rnk <= 1 GROUP BY 1, 2),
    cand_3 AS (SELECT qid, t, CAST(SUM(w1) AS BIGINT) AS w_fx
               FROM cand_all WHERE rnk <= 3 GROUP BY 1, 2),
    {cfg_sql},
    basem AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(SUM(CASE WHEN ds.source = qs.source THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same
      FROM base5 b
      JOIN {table} ds ON ds.doc_id = b.doc_id
      JOIN {table} qs ON qs.doc_id = b.qid
    )
    SELECT m.fb_k, m.exp_terms, m.n_hits, m.n_same_source,
           ROUND(CAST(m.n_same_source AS DOUBLE) / m.n_hits, 6)
             AS precision_same_source,
           ROUND(CAST(bm.n_same AS DOUBLE) / bm.n_hits, 6)
             AS baseline_precision,
           ROUND(CAST(m.n_overlap_baseline AS DOUBLE) / m.n_hits, 6)
             AS overlap_with_baseline
    FROM ({rows_sql}) m CROSS JOIN basem bm
    ORDER BY m.fb_k, m.exp_terms
    """


@register(
    "q365_rocchio_sweep",
    _rocchio_sweep_sql("duckdb"),
    doc="Rocchio PRF calibration sweep: the four (fb_k, exp_terms) "
    "corners (1/3 docs x 3/5 terms) re-rank on ONE shared BM25 "
    "pass-1 table and one shared candidate-term table (the "
    "q82/q91/q260 sweep discipline — the expensive posting joins "
    "never repeat per config), scored by same-source precision@5 "
    "(the fixture's topicality label) against the no-feedback "
    "baseline, plus top-5 overlap with it (how much each config "
    "actually changes results). The calibration chart q345's fixed "
    "(3, 5) choice should be read against. All metrics exact "
    "integer ratios; expansion weights integer idf-mass",
)
def q365_rocchio_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_q365"
    )
    return spark.sql(_rocchio_sweep_sql("spark", "documents_q365"))
