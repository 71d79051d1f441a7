"""Deterministic k-means (Lloyd) for IVF coarse quantization.

The classic Spark k-means shape: centroids live on the driver (k x dim
doubles — tiny), each iteration is one assignment pass (a NARROW map
against the centroids shipped as a literal array — no crossJoin, no
shuffle) and one update job (per-cluster per-dimension means, whose
shuffle carries one (cluster, dim) partial per task — independent of
row count). The candidate scan is never collected; the scanned vectors
are persisted across the iteration jobs so the parquet read happens
once, and released before returning.

Everything is bit-deterministic so an external SQL oracle can replay the
exact iterations:
- init: the k smallest ids, in id order;
- distances: sequential double folds (engine-portable, see
  operators.similarity);
- means: 2^49 fixed-point integer sums (functions.vector.fixed_point_mean)
  -- order/partition independent, one map-side partial per task, no
  per-group array;
- argmin ties break on the smaller centroid id (array_position returns
  the FIRST index holding the exact minimum);
- empty clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from frontmatter_mcp_spark.functions.vector import array_lit, fixed_point_mean


def _assign_cid(df: DataFrame, cents: list[list[float]], id_col: str) -> DataFrame:
    """(id, v, cid) with cid = index of the nearest centroid.

    The centroids travel inside the plan as one array<array<double>>
    literal — the assignment is whole-stage-codegen'd per row with zero
    shuffle, the distributed analogue of a broadcast variable. Ties take
    the FIRST exact minimum (array_position), i.e. the smaller cid.
    """
    cents_lit = array_lit(cents)
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    cid = (F.array_position(F.col("__dists"), F.array_min(F.col("__dists"))) - 1).cast(
        "int"
    )
    return df.withColumn("__dists", dists).select(id_col, "v", cid.alias("cid"))


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    return_centroids: bool = False,
):
    """Run `iters` Lloyd iterations; returns (id_col, cluster INT) — or,
    with return_centroids, a (DataFrame, centroids) pair where centroids
    are the k x dim values the final assignment used (for downstream
    quality metrics like inertia)."""
    raw = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    vecs = raw.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        init = vecs.orderBy(id_col).limit(k).collect()
        cents: list[list[float]] = [list(r.v) for r in init]

        # iters-1 centroid updates: assignment vs the current centroids,
        # then per-(cluster, dim) means. The final assignment needs no
        # update job, and is built over `raw` (not the persisted handle)
        # so the returned lazy plan doesn't pin the cache.
        for _ in range(iters - 1):
            dims = _assign_cid(vecs, cents, id_col).select(
                "cid", F.posexplode("v").alias("pos", "val")
            )
            means = (
                dims.groupBy("cid", "pos")
                .agg(fixed_point_mean(F.col("val")).alias("mean_v"))
                .collect()
            )
            by_cid: dict[int, dict[int, float]] = {}
            for r in means:
                by_cid.setdefault(r.cid, {})[r.pos] = r.mean_v
            cents = [
                [by_cid[i][p] for p in range(len(cents[i]))] if i in by_cid else cents[i]
                for i in range(k)
            ]
    finally:
        vecs.unpersist()
    out = _assign_cid(raw, cents, id_col).select(
        F.col(id_col), F.col("cid").cast("int").alias("cluster")
    )
    if return_centroids:
        return out, cents
    return out


def power_iteration(
    embeddings: DataFrame,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[float]:
    """Dominant eigenvector of X^T X (the top principal direction of the
    un-centered embedding cloud) by power iteration — the second
    iterative-algorithm shape next to Lloyd's (kmeans_assign): a tiny
    driver-held state vector, one aggregate job per iteration.

    v_{t+1} = normalize( sum_i x_i (x_i . v_t) ). The per-row dot is the
    usual sequential fold; the row sum per dimension is a DECIMAL-exact
    aggregate, so it is independent of partitioning and row order — the
    property that makes the iteration replayable by a SQL oracle and
    reproducible run-to-run on a cluster. The normalization fold runs in
    dimension order on the driver.
    """
    import math

    x = F.col(vec_col).cast("array<double>")
    vecs = embeddings.select(x.alias("_x")).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        first = vecs.select(F.size("_x").alias("n")).limit(1).collect()
        dim = first[0].n
        v = [1.0 / math.sqrt(dim)] * dim
        for _ in range(iters):
            dot = F.aggregate(
                F.zip_with(F.col("_x"), array_lit(v), lambda a, b: a * b),
                F.lit(0.0),
                lambda s, t: s + t,
            )
            sums = (
                # dot is projected BEFORE the explode: Catalyst does no CSE
                # around generators, so putting the fold in the same select
                # as posexplode would re-evaluate it for every exploded row
                vecs.select(F.col("_x"), dot.alias("dot"))
                .select(F.posexplode("_x").alias("pos", "xd"), F.col("dot"))
                .groupBy("pos")
                .agg(
                    F.sum((F.col("xd") * F.col("dot")).cast("decimal(28,12)"))
                    .cast("double")
                    .alias("s")
                )
                .orderBy("pos")
                .collect()
            )
            s = [r.s for r in sums]
            norm = math.sqrt(sum(t * t for t in s))  # sequential, dimension order
            v = [t / norm for t in s]
        return v
    finally:
        vecs.unpersist()


def prototype_pruning(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al., "Beyond neural
    scaling laws", NeurIPS 2022): cluster the embedding cloud, score
    each example by its squared L2 distance to its own cluster
    prototype, and keep the HARDEST half of every cluster (rank by
    distance descending) — easy, prototype-near examples are the ones
    large-data regimes can drop. Returns
    (id, cluster, proto_dist, hardness_rank, kept).

    The distance pass is the same zero-shuffle literal-centroid map as
    the assignment; the per-cluster ranking windows on the cluster key
    (k partitions — bounded), and the keep rule is integer math
    (rank <= floor(n_cluster / 2)). proto_dist is the portable
    sequential fold rounded to 6; ranks break ties on the id, so the
    kept set is reproducible across engines and reruns.
    """
    from pyspark.sql.window import Window as W

    _, cents = kmeans_assign(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        return_centroids=True,
    )
    # one-scan scoring (r10): the assignment map already folds the
    # distance to EVERY centroid, and the own-prototype distance is by
    # definition the minimum of those folds — bit-identical to re-folding
    # against the joined centroid (same left-associative chain over the
    # same values), so the join back to the embeddings and the second
    # corpus scan it forced are pure waste. One narrow codegen pass:
    # id, argmin cid, min fold. The dropped inner join also used to
    # discard NULL-id rows; keep that semantics with an explicit pushed
    # filter rather than relying on the source never emitting NULL ids
    # (ADVICE r10).
    raw = embeddings.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents_lit = array_lit(cents)
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    cid = (
        F.array_position(F.col("__dists"), F.array_min(F.col("__dists"))) - 1
    ).cast("int")
    scored = raw.withColumn("__dists", dists).select(
        F.col(id_col),
        cid.alias("cluster"),
        F.array_min(F.col("__dists")).alias("_d"),
    )
    w = W.partitionBy("cluster").orderBy(F.desc("_d"), F.col(id_col))
    wc = W.partitionBy("cluster")
    return (
        scored.withColumn("hardness_rank", F.row_number().over(w).cast("int"))
        .withColumn("_n", F.count("*").over(wc))
        .select(
            id_col,
            "cluster",
            F.round("_d", 6).alias("proto_dist"),
            "hardness_rank",
            (
                F.col("hardness_rank")
                <= F.floor(F.col("_n").cast("double") / F.lit(2.0))
            ).alias("kept"),
        )
    )


def pagerank_fixed_point(
    edges,
    nodes,
    id_col: str = "doc_id",
    iters: int = 3,
    scale: int = 2**40,
    damp_num: int = 85,
    damp_den: int = 100,
    persist_fn=lambda d: d,
):
    """PageRank over an (src, dst) edge table in exact fixed-point
    integer arithmetic — the graph-centrality quality signal web-corpus
    curation uses (rank hosts/documents by link or similarity structure).

    All math is scaled-integer with floor division (`div`), so every
    iteration is bit-identical across engines and replayable in SQL:

        pr_0      = S div N
        contrib_u = pr_u div outdeg_u
        pr_{t+1}  = (S * (den-num)) div (den * N)
                    + (num * sum_incoming(contrib)) div den

    Dangling nodes (no out-edges) contribute nothing (their mass is not
    redistributed — the truncated variant, same formula both engines).

    Shape at 100 TB: edges/outdeg are pinned once (reused every
    iteration); each iteration is one shuffle on the dst key with
    map-side combine plus a node-table left join; the plan chain is
    linear in `iters` (no exponential nesting — contribs feed forward
    only). Magnitudes: pr <= S = 2^40, so num * sum(contrib) stays
    inside int64 for in-degrees to ~8000 * N/|in| … documented bound:
    num * indeg * S < 2^63, i.e. in-degree < ~10^5 at S = 2^40.
    """
    from pyspark.sql import functions as F

    e0 = edges.select(F.col("src"), F.col("dst"))
    outdeg = persist_fn(e0.groupBy("src").agg(F.count("*").cast("long").alias("odeg")))
    # fold the out-degree onto the edge rows ONCE — each iteration then
    # needs a single join (pr onto the pinned annotated edges) instead
    # of two
    e = persist_fn(e0.join(outdeg, "src"))
    n_row = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n")))

    base = scale * (damp_den - damp_num)
    pr = nodes.crossJoin(n_row).select(
        id_col, F.expr(f"CAST({scale} AS BIGINT) div n").alias("pr"), "n"
    )
    for _ in range(iters):
        contrib = (
            e.join(pr.select(F.col(id_col).alias("src"), "pr"), "src")
            .select(F.col("dst"), F.expr("pr div odeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("csum"))
        )
        pr = (
            pr.select(id_col, "n")
            .join(contrib, F.col(id_col) == F.col("dst"), "left")
            .select(
                id_col,
                "n",
                F.coalesce(F.col("csum"), F.lit(0)).alias("csum"),
            )
            .select(
                id_col,
                "n",
                (
                    F.expr(f"CAST({base} AS BIGINT) div (CAST({damp_den} AS BIGINT) * n)")
                    + F.expr(f"(CAST({damp_num} AS BIGINT) * csum) div {damp_den}")
                ).alias("pr"),
            )
            .select(id_col, "pr", "n")
        )
    out = pr.select(id_col, F.col("pr").alias("pr_fx")).join(
        outdeg.select(F.col("src").alias(id_col), "odeg"), id_col, "left"
    )
    return out.select(
        id_col,
        F.coalesce(F.col("odeg"), F.lit(0)).cast("int").alias("out_degree"),
        F.col("pr_fx"),
    )


def ppr_fixed_point(
    edges,
    nodes,
    seeds,
    id_col: str = "doc_id",
    iters: int = 3,
    scale: int = 2**40,
    damp_num: int = 85,
    damp_den: int = 100,
    persist_fn=lambda d: d,
):
    """Personalized (topic-sensitive) PageRank: identical exact
    fixed-point arithmetic to ``pagerank_fixed_point``, but ALL
    teleport mass lands on the seed set — rank means "centrality as
    seen from the seeds", the trust-propagation signal (TrustRank) a
    curation pipeline uses to score documents by their similarity-graph
    proximity to a vetted subset.

        pr_0      = S div |seeds|          on seeds, else 0
        pr_{t+1}  = [seed] * (S*(den-num)) div (den*|seeds|)
                    + (num * sum_incoming(pr div outdeg)) div den

    Same scale shape as the uniform variant: pinned annotated edges,
    one dst-key shuffle per iteration, linear plan chain.
    """
    from pyspark.sql import functions as F

    e0 = edges.select(F.col("src"), F.col("dst"))
    outdeg = persist_fn(e0.groupBy("src").agg(F.count("*").cast("long").alias("odeg")))
    e = persist_fn(e0.join(outdeg, "src"))
    seed_flag = persist_fn(
        nodes.join(
            seeds.select(F.col(id_col), F.lit(1).alias("is_seed")), id_col, "left"
        ).select(id_col, F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
    )
    ns_row = F.broadcast(
        seed_flag.agg(F.sum("is_seed").cast("long").alias("ns"))
    )
    base = scale * (damp_den - damp_num)
    pr = seed_flag.crossJoin(ns_row).select(
        id_col,
        "is_seed",
        "ns",
        F.expr(f"CASE WHEN is_seed = 1 THEN CAST({scale} AS BIGINT) div ns "
               "ELSE CAST(0 AS BIGINT) END").alias("pr"),
    )
    for _ in range(iters):
        contrib = (
            e.join(pr.select(F.col(id_col).alias("src"), "pr"), "src")
            .select(F.col("dst"), F.expr("pr div odeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("csum"))
        )
        pr = (
            pr.select(id_col, "is_seed", "ns")
            .join(contrib, F.col(id_col) == F.col("dst"), "left")
            .select(
                id_col,
                "is_seed",
                "ns",
                F.coalesce(F.col("csum"), F.lit(0)).alias("csum"),
            )
            .select(
                id_col,
                "is_seed",
                "ns",
                (
                    F.expr(
                        f"CASE WHEN is_seed = 1 THEN CAST({base} AS BIGINT)"
                        f" div (CAST({damp_den} AS BIGINT) * ns)"
                        " ELSE CAST(0 AS BIGINT) END"
                    )
                    + F.expr(f"(CAST({damp_num} AS BIGINT) * csum) div {damp_den}")
                ).alias("pr"),
            )
        )
    out = pr.select(id_col, "is_seed", F.col("pr").alias("pr_fx")).join(
        outdeg.select(F.col("src").alias(id_col), "odeg"), id_col, "left"
    )
    return out.select(
        id_col,
        F.col("is_seed").cast("int").alias("is_seed"),
        F.coalesce(F.col("odeg"), F.lit(0)).cast("int").alias("out_degree"),
        F.col("pr_fx"),
    )
