from __future__ import annotations

from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import sampling as sp


def test_split_proportions_and_stability(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = df.select("k", sp.assign_split(F.col("k")).alias("split"))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.03
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    assert abs(counts["test"] / 10_000 - 0.1) < 0.02
    # repartition-invariance: the hash decides, not the partition layout
    out2 = df.repartition(17).select("k", sp.assign_split(F.col("k")).alias("split"))
    assert {(r.k, r.split) for r in out.collect()} == {(r.k, r.split) for r in out2.collect()}


def test_stratified_keep_rates(spark):
    df = spark.range(0, 6_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "common").otherwise("rare").alias("stratum"),
    )
    kept = df.filter(
        sp.stratified_keep(F.col("k"), F.col("stratum"), {"common": 0.25, "rare": 1.0})
    )
    counts = {r.stratum: r.n for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 3_000  # rate 1.0 keeps everything
    assert abs(counts["common"] / 3_000 - 0.25) < 0.05


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(0, 1_000).select(sp.hash_bucket(F.col("id")).alias("b"))
    stats = df.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).collect()[0]
    assert 0 <= stats.lo and stats.hi <= 999


def test_quota_sample_exact_counts_and_stability(spark):
    df = spark.range(0, 600).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("stratum"),
    )
    out = sp.quota_sample(df, "k", "stratum", {"s0": 10, "s1": 5}, default_quota=2)
    counts = {r.stratum: r.n for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 10, "s1": 5, "s2": 2}
    assert out.agg(F.max("mix_rank")).collect()[0][0] == 10
    # deterministic: same selection under a different partitioning
    again = sp.quota_sample(df.repartition(13), "k", "stratum", {"s0": 10, "s1": 5}, 2)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # quota larger than the stratum keeps the whole stratum
    big = sp.quota_sample(df, "k", "stratum", {"s0": 10_000}, default_quota=0)
    assert big.count() == 200
