"""Deterministic k-means (Lloyd) for IVF coarse quantization.

The classic Spark k-means shape: centroids live on the driver (k x dim
doubles — tiny), each iteration is one assignment job (cross join against
broadcast centroids + per-key rank) and one update job (per-cluster
per-dimension means). The candidate scan is never collected.

Everything is bit-deterministic so an external SQL oracle can replay the
exact iterations:
- init: the k smallest ids, in id order;
- distances: sequential double folds (engine-portable, see
  operators.similarity);
- means: sorted sequential folds (no decimal-tie or order hazards);
- argmin ties break on the smaller centroid id;
- empty clusters keep their previous centroid.

At 100 TB the update job's shuffle carries one (cluster, dim) partial
per task — independent of row count; assignment is a narrow map against
broadcast centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def _sorted_fold_mean() -> F.Column:
    return (
        F.aggregate(F.array_sort(F.collect_list("val")), F.lit(0.0), lambda a, x: a + x)
        / F.count("*")
    ).alias("mean_v")


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` Lloyd iterations; returns (id_col, cluster INT)."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    init = vecs.orderBy(id_col).limit(k).collect()
    cents: list[list[float]] = [list(r.v) for r in init]

    assigned = None
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)], "cid int, cent array<double>"
            )
        )
        dist = F.aggregate(
            F.zip_with(F.col("v"), F.col("cent"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        w = W.partitionBy(id_col).orderBy(F.asc("dist"), F.asc("cid"))
        assigned = (
            vecs.crossJoin(cdf)
            .withColumn("dist", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "cid")
        )
        dims = assigned.join(vecs, id_col).select(
            "cid", F.posexplode("v").alias("pos", "val")
        )
        means = dims.groupBy("cid", "pos").agg(_sorted_fold_mean()).collect()
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r.cid, {})[r.pos] = r.mean_v
        cents = [
            [by_cid[i][p] for p in range(len(cents[i]))] if i in by_cid else cents[i]
            for i in range(k)
        ]
    return assigned.select(F.col(id_col), F.col("cid").cast("int").alias("cluster"))
