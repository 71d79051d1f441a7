"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:
- **brute-force cosine top-k** — exact; query side is broadcast, the
  candidate scan is embarrassingly parallel, per-partition top-k via a
  ranking window on the (small) query key.
- **IVF-style partitioned top-k** — a coarse quantizer (here: per-label
  centroids, computed exactly in-engine; swap in k-means centroids at
  scale) prunes the candidate scan to the `nprobe` nearest partitions.
  On a real cluster the embedding table is bucketed/partitioned by the
  coarse cell id so pruning becomes partition pruning at the source.

Kernels are Catalyst higher-order functions (functions.vector) — JVM
codegen, no Python. Cross-engine note: Spark's `aggregate` and DuckDB's
`list_sum` are both sequential left folds, measured bit-identical on this
data, so oracles can compare unrounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from frontmatter_mcp_spark.functions.vector import (
    array_lit,
    cosine_similarity,
    fixed_point_mean,
)


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    cand_id: str = "cid",
    query_vec: str = "qvec",
    cand_vec: str = "cvec",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the query side, scan candidates
    once, rank per query. Ties broken by candidate id for determinism."""
    pairs = candidates.crossJoin(F.broadcast(queries)).withColumn(
        "sim", cosine_similarity(F.col(query_vec), F.col(cand_vec))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(cand_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "sim", "rank")
    )


def label_centroids(embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Exact per-label centroid: posexplode -> order-independent mean per
    dimension -> reassemble ordered array. Acts as the IVF coarse
    quantizer. The mean is a 2^49 fixed-point integer sum
    (functions.vector.fixed_point_mean): deterministic under any
    partitioning, map-side combined (one partial per task, never a
    per-group array — a popular label at 100 TB would OOM a collect_list
    buffer), and bit-replayable by an external SQL oracle. Double->DECIMAL
    casts are avoided: Spark rounds the exact value HALF_UP while DuckDB
    double-rounds via fl(v*10^s), so float32-dyadic inputs can land on
    rounding ties the engines break differently."""
    dims = embeddings.select(
        label_col, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v")
    )
    means = dims.groupBy(label_col, "pos").agg(
        fixed_point_mean(F.col("v")).alias("mean_v")
    )
    return (
        means.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_v"))),
                lambda s: s["mean_v"],
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "qid",
    query_vec: str = "qvec",
    cand_id: str = "vec_id",
    cand_vec: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-pruned top-k: rank coarse cells (label centroids) per query,
    keep `nprobe`, then exact cosine only within those cells.

    The probe-set join key is the cell id; with the embedding table
    bucketed by cell this is a co-located join with no candidate shuffle.
    """
    cents = label_centroids(embeddings, label_col, cand_vec)
    probe = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", cosine_similarity(F.col(query_vec), F.col("centroid")))
    )
    wp = W.partitionBy(query_id).orderBy(F.desc("cent_sim"), F.asc(label_col))
    probed = (
        probe.withColumn("cell_rank", F.row_number().over(wp))
        .filter(F.col("cell_rank") <= nprobe)
        .select(query_id, query_vec, label_col)
    )
    pairs = embeddings.join(F.broadcast(probed), label_col).withColumn(
        "sim", cosine_similarity(F.col(query_vec), F.col(cand_vec))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(cand_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, "sim", "rank")
    )


def hyperplanes(dim: int, nbits: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, i) is the
    first md5 hex digit of "p|i" shifted to [-7.5, 7.5]. Generated
    driver-side in plain Python so an external oracle can inline the very
    same constants — no RNG state to ship."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[0], 16) - 7.5
            for i in range(dim)
        ]
        for p in range(nbits)
    ]


def hyperplane_bucket(vec: Column, dim: int, nbits: int = 4) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane,
    concatenated to a bit string. Cosine-similar vectors collide with
    probability 1 - theta/pi per bit."""
    v = vec.cast("array<double>")
    bits = []
    for plane in hyperplanes(dim, nbits):
        arr = array_lit(plane)
        dot = F.aggregate(
            F.zip_with(v, arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def probe_buckets(bucket: Column, nbits: int, radius: int) -> Column:
    """All bucket ids within Hamming distance ``radius`` of ``bucket``
    (inclusive), as an array — the multi-probe set. Generated as a
    static expression over ``itertools.combinations`` of bit positions,
    so it is replayable verbatim by an external SQL oracle. Intended for
    the small nbits of a bucketing code (probe count is
    sum_{r<=radius} C(nbits, r))."""
    from itertools import combinations

    def flipped(positions: tuple[int, ...]) -> Column:
        chars = []
        for j in range(nbits):
            ch = F.substring(bucket, j + 1, 1)
            if j in positions:
                ch = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
            chars.append(ch)
        return F.concat(*chars)

    variants: list[Column] = [bucket]
    for r in range(1, radius + 1):
        variants.extend(flipped(c) for c in combinations(range(nbits), r))
    return F.array(*variants)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    nbits: int = 4,
    k: int = 10,
    query_id: str = "qid",
    query_vec: str = "qvec",
    cand_id: str = "cid",
    cand_vec: str = "cvec",
    probe_radius: int = 0,
) -> DataFrame:
    """Bucketed ANN: exact cosine ranking *within* the query's LSH
    bucket(s). The candidate scan shuffles on the bucket key once; at
    scale the candidate table is written bucketed by this key, making the
    probe a partition-pruned read instead of a join.

    ``probe_radius`` > 0 enables multi-probe: each query also probes
    every bucket within that Hamming distance — the standard recall
    rescue for single-band hyperplane LSH (a near neighbor differing in
    one sign bit lands one bucket over). The probe fan-out multiplies
    only the broadcast-side rows (queries x probe count), never the
    candidate scan, so the plan shape is unchanged at scale. Each
    candidate still owns exactly ONE bucket, so probing distinct buckets
    can never duplicate a (query, candidate) pair."""
    q = queries.withColumn("_home", hyperplane_bucket(F.col(query_vec), dim, nbits))
    if probe_radius > 0:
        q = q.select(
            query_id,
            query_vec,
            "_home",
            F.explode(probe_buckets(F.col("_home"), nbits, probe_radius)).alias("bucket"),
        )
    else:
        q = q.withColumn("bucket", F.col("_home"))
    c = candidates.withColumn("bucket", hyperplane_bucket(F.col(cand_vec), dim, nbits))
    pairs = c.join(F.broadcast(q), "bucket").withColumn(
        "sim", cosine_similarity(F.col(query_vec), F.col(cand_vec))
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(cand_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "bucket", cand_id, "sim", "rank")
    )


def neardup_pairs_by_cosine(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs within a blocking key
    with cosine >= threshold. Blocking (here the IVF cell / label) keeps
    the join from being all-pairs; at scale the block is the LSH or IVF
    cell id.

    The norms are computed once per VECTOR before the self-join, not
    once per pair: cosine as dot/(norm_a*norm_b) over precomputed norms
    does one fold per pair instead of three (measured ~2x on the pair
    stage), and the arithmetic — same folds over the same values, same
    division shape — is bit-identical to the inline form the oracles
    replay."""
    from frontmatter_mcp_spark.functions.vector import dot_product, l2_norm

    a = embeddings.select(
        F.col(block_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        l2_norm(F.col(vec_col)).alias("__norm_a"),
    )
    b = embeddings.select(
        F.col(block_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        l2_norm(F.col(vec_col)).alias("__norm_b"),
    )
    return (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            dot_product(F.col("vec_a"), F.col("vec_b"))
            / (F.col("__norm_a") * F.col("__norm_b")),
        )
        .filter(F.col("sim") >= threshold)
        .select(block_col, "id_a", "id_b", "sim")
    )


def ann_ndcg(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    cand_id: str = "cid",
    query_vec: str = "qvec",
    cand_vec: str = "cvec",
    query_label: str = "qlabel",
    cand_label: str = "clabel",
) -> DataFrame:
    """Ranking-quality evaluation for a retrieval run: NDCG@k of the
    exact cosine top-k per query, with a candidate counted relevant when
    its label matches the query's. The per-label relevant totals come
    from one map-side-combined count broadcast back to the (tiny) query
    side, so the corpus is scanned once for ranking and once for the
    label histogram — nothing else shuffles.

    Determinism: every DCG/IDCG term (rel / log2(rank+1)) is quantized
    to DECIMAL(28,12) before summation — partial sums stay on the same
    1e-12 grid, so the aggregate is order-independent and the oracle's
    list_sum replays it exactly; log2's 1-ulp engine divergence is
    absorbed by the quantization and the final 6-decimal rounding.
    Queries whose label has no relevant candidates get a NULL idcg/ndcg
    (nothing to rank against), mirrored by the oracle's empty list_sum.
    """
    top = cosine_topk(
        queries.select(query_id, query_vec),
        candidates.select(cand_id, cand_vec),
        k=k,
        query_id=query_id,
        cand_id=cand_id,
        query_vec=query_vec,
        cand_vec=cand_vec,
    )
    qlab = queries.select(query_id, query_label)
    clab = candidates.select(cand_id, cand_label)
    rels = (
        clab.join(F.broadcast(top), cand_id)
        .join(F.broadcast(qlab), query_id)
        .select(
            query_id,
            "rank",
            F.when(F.col(cand_label) == F.col(query_label), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    dec = "decimal(28,12)"
    dcg = rels.groupBy(query_id).agg(
        F.sum((F.col("rel") / F.log2(F.col("rank") + F.lit(1.0))).cast(dec)).alias(
            "_dcg"
        )
    )
    label_counts = candidates.groupBy(cand_label).agg(F.count("*").alias("_n"))
    nrel = (
        queries.select(query_id, query_label)
        .join(
            F.broadcast(label_counts),
            F.col(query_label) == F.col(cand_label),
            "left",
        )
        .select(query_id, F.coalesce(F.col("_n"), F.lit(0)).alias("n_rel"))
    )
    n_cap = F.least(F.lit(k), F.col("n_rel")).cast("int")
    idcg_dec = F.when(
        n_cap >= 1,
        F.aggregate(
            F.sequence(F.lit(1), n_cap),
            F.lit(0).cast(dec),
            lambda a, i: (
                a + (F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0))).cast(dec)
            ).cast(dec),
        ),
    )
    scored = nrel.join(dcg, query_id).select(
        query_id,
        F.col("n_rel").cast("int").alias("n_rel"),
        F.round(F.col("_dcg").cast("double"), 6).alias("dcg"),
        F.round(idcg_dec.cast("double"), 6).alias("idcg"),
    )
    # the ratio divides the ROUNDED values: both operands are then
    # bit-identical across engines, so the quotient is too
    return scored.select(
        query_id,
        "n_rel",
        "dcg",
        "idcg",
        F.round(
            F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0)), 6
        ).alias("ndcg"),
    )


def bitext_margin_pairs(
    clustered: DataFrame,
    side_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "cluster",
    min_cos: float = 0.1,
    k_nn: int = 4,
    top_k: int = 50,
    persist_fn=None,
) -> DataFrame:
    """CCMatrix-style bitext mining (Artetxe & Schwenk 2019): candidate
    translation pairs are CROSS-side pairs (side 0 x side 1) within a
    learned blocking cell, scored by the MARGIN criterion — cosine
    normalized by the mean of each endpoint's k-NN cosines — which
    suppresses hub vectors that are spuriously close to everything. The
    mining step that builds parallel corpora from monolingual crawls.

    Shape at 100 TB: the pair join is within-block only (k-means cells,
    the q90 discipline — never all-pairs); per-vector norms are computed
    once before the join; the pair table feeds three consumers (both
    k-NN averages and the final margin scoring), so the caller passes
    persist_fn (workload pins it). The k-NN averages are top-k windows
    over each endpoint's OWN pairs (bounded by its block), and the
    output is a TakeOrderedAndProject.

    Determinism: cosines are the portable fold; each k-NN mean sums
    DECIMAL(28,12)-quantized cosines (order-free) divided by the count;
    the margin divides bit-identical operands and rounds to 6; ranks
    and the final ordering carry (id_a, id_b) tiebreakers.
    """
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.functions.vector import dot_product, l2_norm

    a = clustered.filter(F.col(side_col) == 0).select(
        F.col(block_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = clustered.filter(F.col(side_col) == 1).select(
        F.col(block_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    pairs = (
        a.join(b, block_col)
        .withColumn(
            "cos",
            dot_product(F.col("vec_a"), F.col("vec_b"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cos") >= min_cos)
        .select("id_a", "id_b", "cos")
    )
    if persist_fn is not None:
        pairs = persist_fn(pairs)

    dec = "decimal(28,12)"

    def knn_avg(key: str, other: str, out: str) -> DataFrame:
        w = W.partitionBy(key).orderBy(F.desc("cos"), F.col(other))
        return (
            pairs.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k_nn)
            .groupBy(key)
            .agg(
                (F.sum(F.col("cos").cast(dec)).cast("double") / F.count("*")).alias(
                    out
                )
            )
        )

    avg_a = knn_avg("id_a", "id_b", "avg_a")
    avg_b = knn_avg("id_b", "id_a", "avg_b")
    scored = (
        pairs.join(avg_a, "id_a")
        .join(avg_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round("cos", 6).alias("cos"),
            F.round(
                F.col("cos") / ((F.col("avg_a") + F.col("avg_b")) / F.lit(2.0)), 6
            ).alias("margin"),
        )
    )
    return scored.orderBy(F.desc("margin"), "id_a", "id_b").limit(top_k)
