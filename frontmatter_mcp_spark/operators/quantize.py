"""Embedding compression: per-dimension int8 scalar quantization.

The standard trick for shrinking a vector index 4x before ANN serving:
per dimension d, code = floor((x_d - min_d) * 255 / (max_d - min_d)),
clamped to [0, 255]. The dimension stats are one tiny aggregate (dims x
2 doubles), shipped back into a narrow map as literals — the same
broadcast-as-literal shape as the k-means assignment (see
operators.clustering), so the encode pass is shuffle-free.

Deterministic: every emitted double is a chain of IEEE-754 ops in a
fixed order, codes are exact integers, and the reconstruction error is
a sorted sequential fold (the engine-portable summation used throughout
this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from frontmatter_mcp_spark.functions.vector import array_lit


def dim_stats(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(pos, dmin, dmax) over the corpus — one explode + tiny aggregate."""
    return (
        embeddings.select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("pos")
        .agg(F.min("col").alias("dmin"), F.max("col").alias("dmax"))
    )


def int8_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to int8 codes; returns per-vector
    (id, n_dims, codes_fp, recon_err) where codes_fp is the md5 of the
    comma-joined code sequence and recon_err the summed squared
    dequantization error.
    """
    stats = dim_stats(embeddings, vec_col).orderBy("pos").collect()
    mins = [r.dmin for r in stats]
    maxs = [r.dmax for r in stats]
    lo = F.lit(mins)
    hi = F.lit(maxs)

    v = F.col(vec_col).cast("array<double>")
    # zip the vector against the per-dim ranges: scaled = (x-min)*255/(max-min)
    scaled = F.zip_with(
        F.zip_with(v, lo, lambda x, mn: x - mn),
        F.zip_with(hi, lo, lambda mx, mn: mx - mn),
        lambda num, rng: F.when(rng > 0, F.floor(num * F.lit(255.0) / rng)).otherwise(
            F.lit(0)
        ),
    )
    codes = F.transform(
        scaled, lambda c: F.greatest(F.least(c, F.lit(255)), F.lit(0)).cast("int")
    )
    dequant = F.zip_with(
        codes.cast("array<double>"),
        F.zip_with(hi, lo, lambda mx, mn: mx - mn),
        lambda c, rng: c * rng / F.lit(255.0),
    )
    xhat = F.zip_with(dequant, lo, lambda d, mn: d + mn)
    err_terms = F.zip_with(v, xhat, lambda x, y: (x - y) * (x - y))
    recon_err = F.aggregate(
        F.array_sort(err_terms), F.lit(0.0), lambda a, x: a + x
    )
    return embeddings.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.md5(F.array_join(codes.cast("array<string>"), ",")).alias("codes_fp"),
        F.round(recon_err, 12).alias("recon_err"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011): split the vector into M subspaces, learn a
# K-code codebook per subspace (Lloyd's, the same deterministic k-means as
# operators.clustering), store each vector as M small codes, and answer
# queries with an ADC (asymmetric distance computation) table — M x K
# query-to-centroid distances computed once per query, after which every
# candidate distance is M table lookups instead of a D-dim scan.
# ---------------------------------------------------------------------------


def _subspace_sqdist(vec_slice: Column):
    """Closure factory (PySpark higher-order fns dispatch on lambda
    arity): squared L2 between a sliced vector and one centroid, as the
    engine-portable sequential fold."""
    return lambda c: F.aggregate(
        F.zip_with(vec_slice, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def pq_train_codebooks(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Train the M per-subspace codebooks: deterministic Lloyd's over
    the sliced vectors, ALL subspaces jointly — the corpus explodes
    into (subspace, slice) rows once and every iteration runs ONE
    update job whose aggregate keys on (subspace, cluster, dim) instead
    of M separate driver loops. Centroids are bit-identical to
    per-subspace runs (same init rows, and the fixed-point means are
    exact integer sums — group-partitioning-independent), so the SQL
    oracle replays per-subspace CTEs unchanged; what the joint plan
    buys is M-fold fewer driver-coordinated jobs (the dominant cost of
    small-k training). Returns [m][k][dim/m] centroid values
    (driver-held — K*dim doubles, tiny).

    At 100 TB codebook training runs on a deterministic sample (e.g.
    hash_bucket(id) < r); the encode/ADC passes below are the stages
    that must scale, and they are narrow codegen maps.
    """
    from pyspark.storagelevel import StorageLevel

    from frontmatter_mcp_spark.functions.vector import fixed_point_mean

    # init + dim discovery in one collect: the k smallest ids, in order
    v = F.col(vec_col).cast("array<double>")
    init_rows = (
        embeddings.select(F.col(id_col), v.alias("v")).orderBy(id_col).limit(k).collect()
    )
    dim = len(init_rows[0].v)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    books: list[list[list[float]]] = [
        [list(r.v[s * sub : (s + 1) * sub]) for r in init_rows] for s in range(m)
    ]

    slices = F.array(*[F.slice(v, s * sub + 1, sub) for s in range(m)])
    sliced = embeddings.select(
        F.col(id_col), F.posexplode(slices).alias("sub", "sv")
    )
    vecs = sliced.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters - 1):
            cents_lit = array_lit(books)
            dists = F.transform(
                F.element_at(cents_lit, F.col("sub") + 1),
                _subspace_sqdist(F.col("sv")),
            )
            assigned = vecs.withColumn("__d", dists).select(
                "sub",
                (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1)
                .cast("int")
                .alias("cid"),
                "sv",
            )
            means = (
                assigned.select("sub", "cid", F.posexplode("sv").alias("pos", "val"))
                .groupBy("sub", "cid", "pos")
                .agg(fixed_point_mean(F.col("val")).alias("mv"))
                .collect()
            )
            by_key: dict[tuple[int, int], dict[int, float]] = {}
            for r in means:
                by_key.setdefault((r.sub, r.cid), {})[r.pos] = r.mv
            books = [
                [
                    [by_key[(s, c)][p] for p in range(sub)]
                    if (s, c) in by_key
                    else books[s][c]  # empty cluster keeps its centroid
                    for c in range(k)
                ]
                for s in range(m)
            ]
    finally:
        vecs.unpersist()
    return books


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per subspace, the nearest codebook entry
    (ties to the smaller code via array_position-of-exact-min, the
    k-means rule). Centroids travel as plan literals — the encode is a
    zero-shuffle whole-stage-codegen map, the same shape as the k-means
    assignment and int8 encode."""
    m = len(books)
    sub = len(books[0][0])
    df = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    for s in range(m):
        cl = array_lit(books[s])
        sl = F.slice(F.col("__v"), s * sub + 1, sub)
        df = df.withColumn(f"__d{s}", F.transform(cl, _subspace_sqdist(sl)))
    codes = F.array(
        *[
            (
                F.array_position(F.col(f"__d{s}"), F.array_min(F.col(f"__d{s}"))) - 1
            ).cast("int")
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    books: list[list[list[float]]],
    top_k: int = 10,
    q_id: str = "qid",
    q_vec: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: each query precomputes its M x K distance table in a
    narrow map (centroid literals again), the (tiny) query side
    broadcasts against the encoded corpus, and a candidate's approximate
    distance is M array lookups summed in subspace order (a fixed-order
    fold, so the doubles are bit-identical across engines). Ranking ties
    break on the candidate id. The corpus side never touches the
    original vectors — the scan reads M ints per row instead of D
    doubles, which is the point of PQ at 100 TB."""
    from pyspark.sql.window import Window as W

    m = len(books)
    sub = len(books[0][0])
    qv = F.col(q_vec).cast("array<double>")
    dtab = F.array(
        *[
            F.transform(
                array_lit(books[s]),
                _subspace_sqdist(F.slice(qv, s * sub + 1, sub)),
            )
            for s in range(m)
        ]
    )
    qd = queries.select(F.col(q_id), dtab.alias("__dtab"))
    approx = F.aggregate(
        F.zip_with(
            F.col("__dtab"), F.col("codes"), lambda t, c: F.element_at(t, c + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = W.partitionBy(q_id).orderBy(F.asc("approx_dist"), F.asc(id_col))
    return (
        F.broadcast(qd)
        .crossJoin(encoded)
        .select(F.col(q_id), F.col(id_col), approx.alias("approx_dist"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
    )
