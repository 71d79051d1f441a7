"""k-means operator tests: separation and determinism."""

from __future__ import annotations

from frontmatter_mcp_spark.operators.clustering import kmeans_assign


def test_kmeans_separates_obvious_clusters(spark):
    rows = []
    for i in range(20):  # cluster around (10, 0)
        rows.append((i, [10.0 + (i % 5) * 0.01, 0.0]))
    for i in range(20, 40):  # cluster around (0, 10)
        rows.append((i, [0.0, 10.0 + (i % 5) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.cluster for r in kmeans_assign(df, k=2, iters=3).collect()}
    left = {out[i] for i in range(20)}
    right = {out[i] for i in range(20, 40)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_kmeans_deterministic_across_runs(spark):
    from frontmatter_mcp_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {r.vec_id: r.cluster for r in kmeans_assign(e, k=4, iters=2).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_assign(e, k=4, iters=2).collect()}
    assert a == b
    assert len(set(a.values())) > 1  # actually uses multiple clusters


def test_power_iteration_finds_dominant_direction(spark):
    from frontmatter_mcp_spark.operators.clustering import power_iteration

    # strongly anisotropic cloud: variance along axis 0 dominates
    rows = [(i, [float(3 * (1 if i % 2 else -1)), 0.1 * (i % 3)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = power_iteration(df, iters=5)
    assert len(v) == 2
    assert abs(abs(v[0]) - 1.0) < 0.05  # aligned with axis 0
    assert abs(v[1]) < 0.3
    # deterministic: second run identical bit-for-bit
    assert power_iteration(df, iters=5) == v


def test_pq_encode_and_adc_separate_clusters(spark):
    from frontmatter_mcp_spark.operators import quantize as pq
    from pyspark.sql import functions as F

    # two tight groups in 8 dims: ids 0-3 near the origin, 4-7 near 10.0
    rows = [(i, [0.0 + i * 0.01] * 8) for i in range(4)] + [
        (i, [10.0 + i * 0.01] * 8) for i in range(4, 8)
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq.pq_train_codebooks(e, m=2, k=2, iters=3)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    enc = {r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(e, books).collect()}
    # codes are in range and the two groups land in different cells
    assert all(0 <= c < 2 for cs in enc.values() for c in cs)
    assert enc[0] != enc[7] and enc[0] == enc[1] and enc[6] == enc[7]

    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = pq.pq_adc_topk(q, pq.pq_encode(e, books), books, top_k=4).collect()
    assert [r["vec_id"] for r in top] == [0, 1, 2, 3]  # own group first
    assert [r["rank"] for r in top] == [1, 2, 3, 4]


def test_pq_recall_is_perfect_on_separable_data(spark):
    """With clearly separated groups and a codebook per group, ADC
    ranking must agree with exact L2 on the group membership — q101's
    property in miniature."""
    from frontmatter_mcp_spark.operators import quantize as pq
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    rows = [(i, [0.0 + i * 0.01] * 8) for i in range(4)] + [
        (i, [10.0 + i * 0.01] * 8) for i in range(4, 8)
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq.pq_train_codebooks(e, m=2, k=2, iters=3)
    q = e.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = pq.pq_adc_topk(q, pq.pq_encode(e, books), books, top_k=4).collect()
    assert sorted(r["vec_id"] for r in top) == [4, 5, 6, 7]


def test_prototype_pruning_keeps_hardest_half(spark):
    from frontmatter_mcp_spark.operators.clustering import prototype_pruning
    rows = [(i, [0.0 + i * 0.1] * 4) for i in range(6)] + [
        (i, [50.0 + (i - 6) * 0.1] * 4) for i in range(6, 12)
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = prototype_pruning(e, k=2, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 2
    for rows_c in by_cluster.values():
        n = len(rows_c)
        kept = [r for r in rows_c if r["kept"]]
        assert len(kept) == n // 2
        # kept examples are exactly the top-ranked (hardest) ones
        assert {r["hardness_rank"] for r in kept} == set(range(1, n // 2 + 1))
        # hardness order matches distance order up to the 6-decimal
        # output rounding (ranking uses the unrounded fold)
        by_rank = sorted(rows_c, key=lambda r: r["hardness_rank"])
        for a, b in zip(by_rank, by_rank[1:]):
            assert a["proto_dist"] >= b["proto_dist"] - 1e-6
