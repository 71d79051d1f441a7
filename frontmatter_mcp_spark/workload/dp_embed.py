"""Embedding family: ANN (brute/IVF/LSH/PQ), clustering, quantization, semantic dedup, representation diagnostics (CKA, isotropy).

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
from frontmatter_mcp_spark.operators.holds import hold, overlap
from frontmatter_mcp_spark.workload.registry import pin, register
from frontmatter_mcp_spark.workload.dp_shared import (
    _ABS_STEPS,
    _JACCARD_THRESHOLD,
    _KMEANS_ITERS,
    _KMEANS_K,
    _LP_ITERS,
    _LSH_DIM,
    _LSH_NBITS,
    _MAX_DF,
    _MKV_SCALE,
    _PI_DIM,
    _PI_ITERS,
    _SHINGLES_CTE,
    _duck_cos,
    _duck_lsh_bucket,
    _fx_mean,
    _hash_bucket_duck,
    _kmeans_ctes,
    _neardup_groups_sql,
    _power_iteration_ctes,
)

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
           CAST(SUM(CAST(FLOOR(d2 * 562949953421312e0) AS DECIMAL(38,0)))
                AS DOUBLE) / 562949953421312e0 AS inertia
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
    _, cents = kmeans_assign(
        e, k=_KMEANS_K, iters=_KMEANS_ITERS, return_centroids=True
    )
    # one-scan scoring (r10, the q107 fix applied here too): the
    # assignment map folds the distance to every centroid and the
    # own-centroid d2 is its minimum — same double as re-folding
    # against the joined centroid, so the join back to the embeddings
    # and its second corpus scan are dropped. The dropped inner join
    # also used to discard NULL-vec_id rows; keep that semantics with
    # an explicit pushed filter (free at the scan) rather than relying
    # on the generator never emitting NULL ids (ADVICE r10).
    e = e.filter(F.col("vec_id").isNotNull())
    cents_lit = vector.array_lit(cents)
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"), c,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cid = (
        F.array_position(F.col("__dists"), F.array_min(F.col("__dists"))) - 1
    ).cast("int")
    return (
        e.withColumn("__dists", dists)
        .select(cid.alias("cluster"), F.array_min("__dists").alias("d2"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            # 2^49 floor fixed-point (the fixed_point_mean discipline):
            # the DECIMAL(28,12) cast is a half-up round of the double
            # and flipped one 1e-12 quantum cross-engine at sf0.1 (r11
            # window pre-validation); floor of the power-of-two scaling
            # is exact for bit-identical d2
            (
                F.sum(
                    F.floor(F.col("d2") * F.lit(vector.FIXED_POINT_SCALE)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(vector.FIXED_POINT_SCALE)
            ).alias("inertia"),
        )
    )

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
        persist_fn=hold,
    )

    # eager hold, not lazy pin: `a` feeds both the broadcast `leaky`
    # build and the final fold aggregate — cold-cache racing re-runs
    # the whole neardup pipeline per branch (the q304/q292 pattern)
    a = hold(
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
    cents_lit = vector.array_lit(cents)
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
                vector.array_lit(books[s]),
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
    cents_lit = vector.array_lit(cents)
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
                vector.array_lit(books[s]),
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
        F.zip_with(F.col("x"), vector.array_lit(v), lambda a, b: a * b),
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
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -12% (0.56->0.49)
    norms = hold(e.select("vec_id", nrm.alias("nrm")))
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

    # r12 (guide §2.6 + the q305 one-job fusion): the three method
    # tables (brute truth, IVF candidate distances, LSH ranking) are
    # independent — their eager holds build overlapped — and the five
    # serialized driver .count() jobs fuse into ONE union-of-aggregates
    # action whose branch DAGs schedule concurrently.
    from pyspark.sql.window import Window as W

    def _ivf_chain():
        # IVF: distances = centroid scans (tiny, excluded on both
        # sides) + candidates inside the probed cells
        cents = sim.label_centroids(cands)
        probe = q.crossJoin(F.broadcast(cents)).withColumn(
            "cent_sim",
            vector.cosine_similarity(F.col("qvec"), F.col("centroid")),
        )
        wp = W.partitionBy("qid").orderBy(F.desc("cent_sim"), F.asc("label"))
        probed = (
            probe.withColumn("cell_rank", F.row_number().over(wp))
            .filter(F.col("cell_rank") <= 2)
            .select("qid", "qvec", "label")
        )
        return hold(
            cands.join(F.broadcast(probed), "label").select(
                "qid",
                F.col("vec_id").alias("cid"),
                vector.cosine_similarity(
                    F.col("qvec"), F.col("embedding")
                ).alias("sim"),
            )
        )

    # brute force: every (q, cand) pair is a distance computation
    exact, ipairs, lsh_all = overlap(
        lambda: hold(sim.cosine_topk(q, cv, k=10).select("qid", "cid")),
        _ivf_chain,
        lambda: hold(sim.lsh_topk(q, cv, dim=_LSH_DIM, nbits=_LSH_NBITS, k=10**9)),
    )
    wr = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    itop = ipairs.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= 10
    )
    ltop = lsh_all.filter(F.col("rank") <= 10)

    def ledger_row(method, nd_agg, top):
        hits = top.join(exact, ["qid", "cid"]).agg(
            F.count("*").cast("long").alias("n_hits")
        )
        return hits.crossJoin(F.broadcast(nd_agg)).select(
            F.lit(method).alias("method"), "n_distances", "n_hits"
        )

    n_brute_agg = cands.agg(
        (F.count("*") * F.lit(nq)).cast("long").alias("n_distances")
    )
    fused = (
        ledger_row("brute", n_brute_agg, exact)
        .unionAll(
            ledger_row(
                "ivf_nprobe2",
                ipairs.agg(F.count("*").cast("long").alias("n_distances")),
                itop,
            )
        )
        .unionAll(
            ledger_row(
                "lsh_4bit",
                lsh_all.agg(F.count("*").cast("long").alias("n_distances")),
                ltop,
            )
        )
    )
    rows = [(r["method"], r["n_distances"], r["n_hits"]) for r in fused.collect()]
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
    tfx = hold(
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
    # norms once per VECTOR, not per pair (q38's discipline): the pair
    # join then pays ONE fold (the dot) instead of three — same doubles,
    # same division, bit-identical d. Eager holds throughout (not lazy
    # pins): cl/knn/kd/lrd each fan out to 2+ branches of the single
    # final action, and cold lazy caches race (the q292/q304 pattern)
    cl = hold(
        e.join(assign, "vec_id").select(
            "vec_id",
            "embedding",
            "cluster",
            vector.l2_norm(F.col("embedding")).alias("nrm"),
        )
    )
    a = cl.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("cluster").alias("ca"),
        F.col("nrm").alias("na"),
    )
    b = cl.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        F.col("cluster").alias("cb"),
        F.col("nrm").alias("nb"),
    )
    d = 1.0 - vector.dot_product(F.col("ea"), F.col("eb")) / (
        F.col("na") * F.col("nb")
    )
    pairs = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("ida") != F.col("idb"))
    ).select("ida", "idb", d.alias("d"))
    knn = hold(
        pairs.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("ida").orderBy("d", "idb")),
        )
        .filter(F.col("rn") <= _LOF_K)
        .select("ida", "idb", "d")
    )
    kd = hold(knn.groupBy(F.col("ida").alias("v")).agg(F.max("d").alias("kdist")))
    reach = knn.join(kd, knn["idb"] == kd["v"]).select(
        "ida", "idb", F.greatest(F.col("kdist"), F.col("d")).alias("rd")
    )
    lrd = hold(
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
             FLOOR((n_common * 1.0 / (sa.set_size + sb.set_size - n_common))
                   * 1000000e0) / 1000000e0 AS j
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
    # The pair table is consumed exactly ONCE (by the tagged hold's
    # eager build), so checkpointing it separately was a pure extra
    # materialization round-trip: 6.64 -> 5.90 s min-of-3 without it,
    # rows identical. Only the tagged edge set (multi-consumed by the
    # star rounds and the edge-count aggregate) is held.
    jac = dd.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=_SL_PREFILTER, max_df=_MAX_DF
    )
    taus = spark.createDataFrame([(float(t),) for t in _SL_TAUS], "tau double")
    # all four thresholded edge sets contract in ONE tagged star loop:
    # max(rounds over cuts) driver iterations instead of their sum
    tagged = (
        jac.crossJoin(F.broadcast(taus))
        .filter(F.col("jaccard") >= F.col("tau"))
        .select("tau", "id_a", "id_b")
    )
    tagged = hold(tagged)
    comp = dd.connected_components_star(tagged, tag_cols=("tau",))
    csz = comp.groupBy("tau", "component").agg(
        F.count("*").cast("long").alias("cnt")
    )
    stats = csz.groupBy("tau").agg(
        F.sum("cnt").cast("long").alias("n_nodes"),
        F.count("*").cast("long").alias("n_components"),
        F.max("cnt").cast("long").alias("max_comp_size"),
    )
    ne = tagged.groupBy("tau").agg(F.count("*").cast("long").alias("n_edges"))
    # left joins from the tau list so an edgeless cut still emits its row
    return (
        taus.join(ne, "tau", "left")
        .join(stats, "tau", "left")
        .select(
            "tau",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce("n_nodes", F.lit(0)).cast("long").alias("n_nodes"),
            F.coalesce("n_components", F.lit(0)).cast("long").alias("n_components"),
            F.coalesce("max_comp_size", F.lit(0)).cast("long").alias("max_comp_size"),
        )
        .orderBy("tau")
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

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"), "doc_id")
    grp = dd.neardup_groups(
        d, "doc_id", "text",
        threshold=_JACCARD_THRESHOLD, max_df=_MAX_DF, iters=_LP_ITERS,
        persist_fn=hold,
    )
    mem = grp.join(d.select("doc_id", "lang"), "doc_id")
    # two-level aggregate, not a window: groupBy(group, lang) counts are
    # the per-language tallies, then per group sum = n_docs, row count =
    # n_langs (exactly count_distinct), max = majority — same integers,
    # no window sort, no count_distinct expand
    bylang = mem.groupBy("group_id", "lang").agg(F.count("*").alias("cnt"))
    # n_langs: count(lang), not count(*) — a NULL lang still forms a bylang
    # row (and feeds n_docs/majority, matching the oracle's window tally),
    # but COUNT(DISTINCT lang) excludes NULLs, so the row count must too
    multi = (
        bylang.groupBy("group_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.count("lang").cast("long").alias("n_langs"),
            F.max("cnt").cast("long").alias("majority"),
        )
        .filter(F.col("n_docs") > 1)
    )
    # eager hold, not lazy pin: the broadcast build for `tot` and the
    # main output branch otherwise race to populate the cold cache and
    # each re-run the whole neardup pipeline (measured ~1.7x on this
    # query; the q187 lesson applied to a broadcast-total shape)
    multi = hold(multi)
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
# q319 — Mann-Kendall trend test: the nonparametric THAT-a-trend-
# exists test paired with q252's Theil-Sen HOW-steep estimator — S is
# the exact integer sum of pairwise signs over the gap-filled daily
# series, the variance carries the full tie correction as an exact
# integer numerator (var = V18/18), and the only doubles are the
# final normal approximation Z = (S -/+ 1)/sqrt(V18/18). The pairwise
# pass is an O(days^2) self-join on the bounded day axis — the same
# honest-plan call as q279's search space.
# ---------------------------------------------------------------------------
@register(
    "q319_mann_kendall",
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
      SELECT a.event_type, a.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY a.event_type
                                     ORDER BY a.day) AS BIGINT) AS k
      FROM axis a LEFT JOIN daily d
        ON d.event_type = a.event_type AND d.day = a.day
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.n > a.n THEN 1
                           WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM filled a JOIN filled b
        ON b.event_type = a.event_type AND b.k > a.k
      GROUP BY 1
    ),
    nt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd
           FROM filled GROUP BY 1),
    ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
            FROM filled GROUP BY 1, 2)
      WHERE t > 1 GROUP BY 1
    ),
    v AS (
      SELECT n.event_type, n.nd,
             n.nd * (n.nd - 1) * (2 * n.nd + 5)
               - COALESCE(t.tie_term, 0) AS v18
      FROM nt n LEFT JOIN ties t USING (event_type)
    )
    SELECT s.event_type, CAST(v.nd AS INT) AS n_days, s.s_stat, v.v18,
           ROUND(CASE WHEN s.s_stat > 0
                        THEN (CAST(s.s_stat AS DOUBLE) - 1)
                             / sqrt(CAST(v.v18 AS DOUBLE) / 18e0)
                      WHEN s.s_stat < 0
                        THEN (CAST(s.s_stat AS DOUBLE) + 1)
                             / sqrt(CAST(v.v18 AS DOUBLE) / 18e0)
                      ELSE 0e0 END, 6) AS z_stat,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'none' END AS direction,
           CAST(ABS(CASE WHEN s.s_stat > 0
                           THEN (CAST(s.s_stat AS DOUBLE) - 1)
                                / sqrt(CAST(v.v18 AS DOUBLE) / 18e0)
                         WHEN s.s_stat < 0
                           THEN (CAST(s.s_stat AS DOUBLE) + 1)
                                / sqrt(CAST(v.v18 AS DOUBLE) / 18e0)
                         ELSE 0e0 END) > 1.959964e0 AS INT) AS significant
    FROM s JOIN v USING (event_type)
    ORDER BY s.event_type
    """,
    doc="Mann-Kendall monotone-trend test per event type: S = exact "
    "integer sum of pairwise sign(y_j - y_i) over the gap-filled "
    "daily series (O(days^2) self-join on the bounded axis — the "
    "q279 honest-plan call), tie-corrected variance kept as the exact "
    "integer numerator V18 = n(n-1)(2n+5) - sum t(t-1)(2t+5), and the "
    "continuity-corrected Z = (S -/+ 1)/sqrt(V18/18) as the one "
    "double chain (sqrt is IEEE-correctly-rounded, the q103 "
    "discipline). The distribution-free companion to q252's Theil-Sen "
    "slope: q252 says how steep, this says whether at all, with ties "
    "(gap-filled zero days) handled exactly",
)
def q319_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # r10 ADR-0007 tail sweep: the gap-filled series self-joins for the
    # pairwise sign sum — both sides of one action's join were cold;
    # eager hold probed -18% (0.80->0.65 min-of-3)
    filled = hold(
        axis.join(daily, ["event_type", "day"], "left").select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("day"))
            .cast("long")
            .alias("k"),
        )
    )
    b = filled.select(
        F.col("event_type").alias("et"),
        F.col("n").alias("bn"),
        F.col("k").alias("bk"),
    )
    s = (
        filled.join(
            b,
            (F.col("et") == F.col("event_type")) & (F.col("bk") > F.col("k")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("bn") > F.col("n"), 1)
                .when(F.col("bn") < F.col("n"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nt = filled.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nd")
    )
    ties = (
        filled.groupBy("event_type", "n")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = nt.join(ties, "event_type", "left").select(
        "event_type",
        "nd",
        (
            F.col("nd") * (F.col("nd") - 1) * (2 * F.col("nd") + 5)
            - F.coalesce("tie_term", F.lit(0))
        ).alias("v18"),
    )
    sd = F.sqrt(F.col("v18").cast("double") / 18.0)
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat").cast("double") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat").cast("double") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(v, "event_type")
        .select(
            "event_type",
            F.col("nd").cast("int").alias("n_days"),
            "s_stat",
            "v18",
            F.round(z, 6).alias("z_stat"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("none")
            .alias("direction"),
            (F.abs(z) > 1.959964).cast("int").alias("significant"),
        )
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# q325 — Matryoshka dimension-truncation recall: how much of the full
# 64-dim cosine top-10 survives when embeddings are truncated to their
# first 4/8/16/32 dimensions — the eval behind MRL-style adaptive
# retrieval (store one vector, serve many precision tiers) and the
# sibling of q64's int8 and q99's PQ compression sweeps: those shrink
# BITS per dimension, this shrinks DIMENSIONS, and the recall matrix
# says which budget knob costs less accuracy.
# ---------------------------------------------------------------------------
_MRL_DIMS = [4, 8, 16, 32]

_MRL_QMOD = 100

_MRL_TOPK = 10

def _mrl_sql() -> str:
    def topk_cte(name: str, vec_q: str, vec_c: str) -> str:
        return f"""{name} AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                 ORDER BY {_duck_cos(vec_q, vec_c)} DESC, c.cid) AS rnk
        FROM q, c
      ) WHERE rnk <= {_MRL_TOPK}
    )"""

    ctes = [
        f"q AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv "
        f"FROM embeddings WHERE vec_id % {_MRL_QMOD} = 0)",
        f"c AS MATERIALIZED (SELECT vec_id AS cid, embedding AS cv "
        f"FROM embeddings WHERE vec_id % {_MRL_QMOD} <> 0)",
        topk_cte("truth", "q.qv", "c.cv"),
    ]
    unions = []
    for d in _MRL_DIMS:
        ctes.append(topk_cte(f"t{d}", f"(q.qv[1:{d}])", f"(c.cv[1:{d}])"))
        unions.append(
            f"SELECT {d} AS dim, t.qid, "
            f"CAST(COUNT(tr.cid) AS INT) AS hits "
            f"FROM t{d} t LEFT JOIN truth tr "
            f"ON tr.qid = t.qid AND tr.cid = t.cid GROUP BY 1, 2"
        )
    ctes_sql = ",\n    ".join(ctes)
    unions_sql = " UNION ALL ".join(unions)
    return f"""
    WITH {ctes_sql},
    r AS ({unions_sql})
    SELECT dim, qid, hits,
           ROUND(CAST(hits AS DOUBLE) / {_MRL_TOPK}, 6) AS recall_at_10
    FROM r
    ORDER BY dim, qid
    """


@register(
    "q325_matryoshka_recall",
    _mrl_sql(),
    doc="Matryoshka truncation recall matrix: cosine top-10 recomputed "
    "with embeddings truncated to their first 4/8/16/32 dimensions and "
    "scored against the full-64-dim top-10 (recall@10 per query per "
    "tier) — the MRL adaptive-retrieval eval: one stored vector, many "
    "precision tiers, and this matrix prices each tier. Completes the "
    "compression-sweep family: q64 shrinks bits/dim (int8), q99/q178 "
    "shrink via codebooks (PQ), this shrinks the dimension axis. Same "
    "broadcast-queries/scan-once/rank plan as q36 per tier; the "
    "truncated passes reuse the same scan",
)
def q325_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = pin(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") % _MRL_QMOD == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = e.filter(F.col("vec_id") % _MRL_QMOD != 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )

    def topk(qd, cd):
        return sim.cosine_topk(
            qd, cd, k=_MRL_TOPK, query_vec="qv", cand_vec="cv"
        ).select("qid", "cid")

    truth = pin(topk(q, c))
    out = None
    for dd_ in _MRL_DIMS:
        qs = q.select("qid", F.slice("qv", 1, dd_).alias("qv"))
        cs = c.select("cid", F.slice("cv", 1, dd_).alias("cv"))
        t = topk(qs, cs)
        hits = (
            t.join(
                truth.select(
                    F.col("qid").alias("tq"), F.col("cid").alias("tc")
                ),
                (F.col("tq") == F.col("qid")) & (F.col("tc") == F.col("cid")),
                "left",
            )
            .groupBy("qid")
            .agg(F.count("tc").cast("int").alias("hits"))
            .select(F.lit(dd_).alias("dim"), "qid", "hits")
        )
        out = hits if out is None else out.unionByName(hits)
    return out.select(
        "dim",
        "qid",
        "hits",
        F.round(F.col("hits").cast("double") / _MRL_TOPK, 6).alias(
            "recall_at_10"
        ),
    ).orderBy("dim", "qid")

# ---------------------------------------------------------------------------
# q339 — linear CKA between the full embedding space and its 32-dim
# Matryoshka prefix: the representational-similarity number behind
# q325's behavioral recall — CKA = ||Cxy||_F^2 / (||Cxx||_F ||Cyy||_F)
# on CENTERED features, with every cross-moment an order-independent
# DECIMAL-exact sum (exact_dot_product discipline) and the Frobenius
# sums DECIMAL-quantized per term (q94 discipline). One (vec, dim)
# explode + one self-join on the row key; Gram matrices are
# dim^2-bounded, never n^2.
# ---------------------------------------------------------------------------
_CKA_PREFIX = 32


@register(
    "q339_linear_cka",
    f"""
    WITH dims AS MATERIALIZED (
      SELECT vec_id, i AS p, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mom AS (
      SELECT a.p AS p, b.p AS q,
             CAST(SUM(CAST(FLOOR((a.v * b.v) * 562949953421312e0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 562949953421312e0 AS sxy,
             CAST(SUM(CAST(FLOOR(a.v * 562949953421312e0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 562949953421312e0 AS sx,
             CAST(SUM(CAST(FLOOR(b.v * 562949953421312e0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 562949953421312e0 AS sy
      FROM dims a JOIN dims b ON b.vec_id = a.vec_id
      GROUP BY 1, 2
    ),
    g AS (
      SELECT p, q, sxy - sx * sy / n.n AS c
      FROM mom CROSS JOIN n
    ),
    fro AS (
      SELECT
        CAST(list_sum(list_sort(list(c * c)
               FILTER (WHERE p <= {_CKA_PREFIX} AND q <= {_CKA_PREFIX})))
             AS DOUBLE) AS yy,
        CAST(list_sum(list_sort(list(c * c))) AS DOUBLE) AS xx,
        CAST(list_sum(list_sort(list(c * c)
               FILTER (WHERE q <= {_CKA_PREFIX}))) AS DOUBLE) AS xy
      FROM g
    )
    SELECT {_CKA_PREFIX} AS prefix_dims,
           ROUND(xy / (sqrt(xx) * sqrt(yy)), 6) AS linear_cka,
           ROUND(sqrt(xx), 4) AS fro_xx,
           ROUND(sqrt(yy), 4) AS fro_yy,
           ROUND(sqrt(xy), 4) AS fro_xy
    FROM fro
    """,
    doc="linear CKA between the full 64-dim embedding space and its "
    "32-dim Matryoshka prefix: cross-covariance computed feature-side "
    "(Gram matrices are dim^2-bounded — 64x64 — never n^2), every "
    "raw moment an order-independent DECIMAL-exact sum, centering via "
    "Sxy - SxSy/n, Frobenius sums DECIMAL-quantized per term, one "
    "final sqrt/divide chain. The geometry-preservation number that "
    "explains q325's recall: high CKA with low recall means ranking "
    "sits in the tail dims; low CKA flags a prefix that is not a "
    "usable sub-embedding. JOIN-FREE plan (VERDICT r07 #3): each "
    "vector flat-maps its d^2 outer-product terms inside the scan "
    "stage and map-side partial aggregation collapses them to d^2 "
    "groups per partition before the only exchange — the oracle's "
    "row-key self-join expresses the same moments relationally, but "
    "on Spark the narrow map ships O(partitions x d^2) rows instead "
    "of shuffling 2 x n x d join inputs; terms and DECIMAL "
    "quantization are per-(vec,p,q) identical to the join "
    "formulation, so the sums match bit-for-bit",
)
def q339_linear_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    # Upper-triangle outer product via two chained generates (posexplode
    # of the array, then posexplode of its p..d suffix slice) — no struct
    # arrays materialized, and symmetry halves the DECIMAL-sum volume:
    # sxy(p,q) == sxy(q,p) bit-for-bit (double multiply is commutative,
    # decimal sums are order-independent), so the lower triangle is
    # mirrored back AFTER aggregation on the 64x64 result, never carried
    # through the n-scale pipeline.
    d1 = e.select(F.posexplode(arr).alias("i0", "v"), arr.alias("a"))
    half = d1.select(
        (F.col("i0") + 1).cast("int").alias("p"),
        "v",
        F.posexplode(
            F.slice("a", F.col("i0") + 1, F.size("a") - F.col("i0"))
        ).alias("j0", "w"),
    ).select(
        "p",
        (F.col("p") + F.col("j0")).cast("int").alias("q"),
        (F.col("v") * F.col("w")).alias("vw"),
    )
    S = vector.FIXED_POINT_SCALE
    # 2^49 floor fixed-point per term (r11): float32-origin values land
    # EXACTLY on 1e-12 half-quanta (the boundary audit measured 128
    # exact hits on the old DECIMAL(30,12) casts), where the two
    # engines' double->DECIMAL rounders may disagree; floor of the
    # power-of-two scaling is exact for bit-identical terms
    mom = half.groupBy("p", "q").agg(
        (
            F.sum(F.floor(F.col("vw") * F.lit(S)).cast("decimal(38,0)"))
            .cast("double")
            / F.lit(S)
        ).alias("sxy")
    )
    # marginal dim sums: the per-(p,q) sx/sy of the relational phrasing
    # are q-independent, so one d-group aggregate over n x d terms
    # replaces two n x d^2 DECIMAL sums; values are the same exact sums
    marg = (
        e.select(F.posexplode(arr).alias("i0", "v"))
        .groupBy((F.col("i0") + 1).cast("int").alias("p"))
        .agg(
            (
                F.sum(F.floor(F.col("v") * F.lit(S)).cast("decimal(38,0)"))
                .cast("double")
                / F.lit(S)
            ).alias("s")
        )
    )
    n = e.agg(F.count("*").cast("long").alias("n"))
    c_half = (
        mom.join(F.broadcast(marg.select("p", F.col("s").alias("sx"))), "p")
        .join(
            F.broadcast(marg.select(F.col("p").alias("q"), F.col("s").alias("sy"))),
            "q",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p",
            "q",
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")).alias("c"),
        )
    )
    # mirror the strict upper triangle: c(q,p) == c(p,q) exactly (see
    # above), restoring the full d^2 term set the Frobenius sums expect
    g = c_half.unionByName(
        c_half.filter(F.col("p") != F.col("q")).select(
            F.col("q").alias("p"), F.col("p").alias("q"), "c"
        )
    )
    pfx = _CKA_PREFIX
    # the Frobenius layer is d^2-bounded (64x64 = 4096 rows at ANY
    # corpus scale), so no quantization is needed at all: an exact
    # sorted sequential fold over the bit-identical c*c terms (the q64
    # list_sum(list_sort(...)) idiom) is order-independent and carries
    # zero rounding-boundary exposure
    cc = F.col("c") * F.col("c")

    def _sorted_sum(col):
        # Degenerate-edge pin: an empty F.when-filtered fold returns the
        # 0.0 init while the oracle's list_sum(list(...) FILTER ...)
        # returns NULL. The edge is unreachable BY INVARIANT — the
        # filters keep dims p,q <= pfx (or all), and pfx = _CKA_PREFIX
        # (32) < d = 64 guarantees every filter admits >= pfx^2 >= 1
        # rows of the dense d x d covariance grid. Keep d >= pfx if
        # either constant ever changes, or wrap the fold to NULL on
        # empty arrays.
        return F.aggregate(
            F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, x: a + x
        )

    fro = g.agg(
        _sorted_sum(
            F.when((F.col("p") <= pfx) & (F.col("q") <= pfx), cc)
        ).alias("yy"),
        _sorted_sum(cc).alias("xx"),
        _sorted_sum(F.when(F.col("q") <= pfx, cc)).alias("xy"),
    )
    return fro.select(
        F.lit(pfx).alias("prefix_dims"),
        F.round(
            F.col("xy") / (F.sqrt("xx") * F.sqrt("yy")), 6
        ).alias("linear_cka"),
        F.round(F.sqrt("xx"), 4).alias("fro_xx"),
        F.round(F.sqrt("yy"), 4).alias("fro_yy"),
        F.round(F.sqrt("xy"), 4).alias("fro_xy"),
    )

# ---------------------------------------------------------------------------
# q340 — contrastive embedding quality (Wang & Isola alignment /
# uniformity): alignment = mean squared distance between normalized
# same-label embeddings (how tight the positives), uniformity =
# ln mean exp(-2 d^2) over all pairs (how spread the whole space) —
# the two numbers that diagnose a collapsed or clumped embedding
# space before any retrieval eval. Pairs are computed on the
# md5-designated 10% sample (q170/q306 discipline — all-pairs on the
# corpus is the n^2 this query exists to avoid); every pair term is
# floored into 2^30 fixed point so the sums are exact BIGINTs (the
# q134 ln/floor convention applied to exp).
# ---------------------------------------------------------------------------
_AU_FX = 1 << 30

def _align_uniform_sql() -> str:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    bucket = hash_bucket_sql("vec_id", 100)
    d2 = f"(2e0 - 2e0 * {_duck_cos('a.embedding', 'b.embedding')})"
    return f"""
    WITH s AS MATERIALIZED (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE {bucket} < 10
    ),
    pairs AS (
      SELECT a.label = b.label AS pos,
             CAST(FLOOR({d2} * {_AU_FX}) AS BIGINT) AS d2_fx,
             CAST(FLOOR(exp(-2e0 * {d2}) * {_AU_FX}) AS BIGINT) AS u_fx
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos_pairs,
             CAST(SUM(CASE WHEN pos THEN d2_fx END) AS BIGINT) AS pos_sum,
             CAST(SUM(u_fx) AS BIGINT) AS u_sum
      FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sampled,
           n_pos_pairs, n_pairs,
           ROUND(CAST(pos_sum AS DOUBLE) / n_pos_pairs / {_AU_FX}, 6)
             AS alignment,
           ROUND(ln(CAST(u_sum AS DOUBLE) / n_pairs / {_AU_FX}), 6)
             AS uniformity
    FROM agg
    """


@register(
    "q340_alignment_uniformity",
    _align_uniform_sql(),
    doc="Wang-Isola contrastive-quality metrics on the md5-designated "
    "10% embedding sample: alignment = mean normalized squared "
    "distance over same-label pairs (lower = tighter positives), "
    "uniformity = ln mean exp(-2 d^2) over all pairs (lower = better "
    "spread; near 0 flags collapse). d^2 = 2 - 2cos on the shared "
    "sequential-fold cosine; every pair term floored into 2^30 fixed "
    "point so both sums are exact BIGINTs (q134's ln/floor convention "
    "applied to exp), one double chain each at the end. The "
    "embedding-space health check that precedes q325's recall and "
    "q180's isotropy audit. Sampled all-pairs is the plan: the "
    "corpus-scale version runs per k-means cell (q109's blocking)",
)
def q340_alignment_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "embeddings")
    # r10 ADR-0007 tail sweep: cold multi-consumer pin -> eager
    # hold; bracketed min-of-3 probe -13% (0.82->0.72)
    s = hold(
        e.filter(hash_bucket(F.col("vec_id"), 100) < 10).select(
            "vec_id", "label", "embedding"
        )
    )
    b = s.select(
        F.col("vec_id").alias("bvid"),
        F.col("label").alias("blabel"),
        F.col("embedding").alias("bemb"),
    )
    cos = vector.cosine_similarity(F.col("embedding"), F.col("bemb"))
    d2 = F.lit(2.0) - 2.0 * cos
    pairs = (
        s.join(F.broadcast(b), F.col("vec_id") < F.col("bvid"))
        .select(
            (F.col("label") == F.col("blabel")).alias("pos"),
            F.floor(d2 * _AU_FX).cast("long").alias("d2_fx"),
            F.floor(F.exp(-2.0 * d2) * _AU_FX).cast("long").alias("u_fx"),
        )
    )
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.col("pos").cast("int")).cast("long").alias("n_pos_pairs"),
        F.sum(F.when(F.col("pos"), F.col("d2_fx"))).cast("long").alias(
            "pos_sum"
        ),
        F.sum("u_fx").cast("long").alias("u_sum"),
    )
    ns = s.agg(F.count("*").cast("long").alias("n_sampled"))
    return agg.crossJoin(F.broadcast(ns)).select(
        "n_sampled",
        "n_pos_pairs",
        "n_pairs",
        F.round(
            F.col("pos_sum").cast("double") / F.col("n_pos_pairs") / _AU_FX, 6
        ).alias("alignment"),
        F.round(
            F.log(F.col("u_sum").cast("double") / F.col("n_pairs") / _AU_FX), 6
        ).alias("uniformity"),
    )
