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


def test_quota_sample_two_phase_equals_single_window(spark):
    """Randomized equivalence: the two-phase rank (local rank within
    (stratum, md5-prefix) + broadcast offsets) must reproduce the naive
    single-window row_number byte-for-byte — including mix_rank — on
    arbitrary key/stratum distributions, skew included."""
    import random

    from pyspark.sql.window import Window as W

    rng = random.Random(11)
    rows = []
    # heavy skew on one stratum + singleton strata + colliding keys
    for i in range(400):
        rows.append((f"k{rng.randrange(350)}", "dominant"))
    for i in range(40):
        rows.append((f"r{i}", rng.choice(["a", "b", "c"])))
    rows.append(("only", "singleton"))
    df = spark.createDataFrame(rows, ["key", "stratum"]).distinct()
    quotas = {"dominant": 37, "a": 5, "b": 0, "singleton": 3}

    got = sp.quota_sample(df, "key", "stratum", quotas, default_quota=2)

    order_key = F.md5(F.col("key").cast("string"))
    w = W.partitionBy("stratum").orderBy(order_key, F.col("key"))
    quota = F.lit(2)
    for name, n in sorted(quotas.items()):
        quota = F.when(F.col("stratum") == name, F.lit(n)).otherwise(quota)
    expect = (
        df.withColumn("mix_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("mix_rank") <= quota)
    )

    a = {(r.key, r.stratum, r.mix_rank) for r in got.collect()}
    b = {(r.key, r.stratum, r.mix_rank) for r in expect.collect()}
    assert a == b
    assert got.columns == expect.columns


def test_sqrt_temperature_mixture_flattens_shares(spark):
    """A dominant stratum's sampled share must shrink and a rare one's
    grow relative to raw shares; kept counts respect the bucket rates
    and the whole decision is reproducible (hash-based, not RNG)."""
    import pytest

    from frontmatter_mcp_spark.operators.sampling import sqrt_temperature_mixture

    rows = [(i, "big") for i in range(90)] + [(i + 1000, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in sqrt_temperature_mixture(
        df, "doc_id", "source", target_total=50
    ).collect()}
    big, small = out["big"], out["small"]
    import math

    denom = math.sqrt(90) + math.sqrt(10)
    assert big["q_share"] == pytest.approx(math.sqrt(90) / denom, abs=1e-6)
    # flattening: big's sampled share (0.75) < raw share (0.9);
    # small's (0.25) > raw (0.1)
    assert big["q_share"] < 0.9 and small["q_share"] > 0.1
    # keep-rate ceiling: small wants 50*0.25=12.5 docs of its 10 -> all kept
    assert small["keep_bucket"] == 1000 and small["n_kept"] == 10
    assert 0 < big["n_kept"] < 90
    # determinism: a second run keeps the exact same counts
    again = {r["source"]: r["n_kept"] for r in sqrt_temperature_mixture(
        df, "doc_id", "source", target_total=50
    ).collect()}
    assert again == {s: r["n_kept"] for s, r in out.items()}


def test_token_budget_mixture_matches_single_window(spark):
    """The two-phase cumsum must be byte-identical to one straight
    window over the stratum, and the keep set must respect the budget
    boundary exactly."""
    from pyspark.sql.window import Window as W

    from frontmatter_mcp_spark.operators.sampling import token_budget_mixture

    rows = [(i, "s" if i % 3 else "t", 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "n_tok"])
    got = {
        r["doc_id"]: (r["cum_tokens"], r["kept"])
        for r in token_budget_mixture(df, "doc_id", "src", "n_tok", budget=300).collect()
    }
    w = (
        W.partitionBy("src")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    expect = {
        r["doc_id"]: (r["cum"], r["cum"] <= 300)
        for r in df.withColumn("cum", F.sum("n_tok").over(w).cast("int")).collect()
    }
    assert got == expect
    assert any(k for _, k in got.values()) and not all(k for _, k in got.values())


def test_shard_manifest_invariants(spark):
    df = spark.range(0, 530).select(
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).cast("int").alias("toks"),
        (F.col("id") % 11 + 1).cast("int").alias("byts"),
    )
    out = sp.shard_manifest(df, "k", "toks", "byts", shard_size=64).collect()
    rows = sorted(out, key=lambda r: r.shard_id)
    # 530 docs / capacity 64 -> 9 shards, all full but the last
    assert [r.shard_id for r in rows] == list(range(9))
    assert [r.n_docs for r in rows] == [64] * 8 + [18]
    # shards partition the corpus and the totals add up
    assert sum(r.n_docs for r in rows) == 530
    assert sum(r.n_tokens for r in rows) == sum((i % 7 + 1) for i in range(530))
    assert sum(r.n_bytes for r in rows) == sum((i % 11 + 1) for i in range(530))
    # key ranges are disjoint and ordered: the global rank was correct
    for a, b in zip(rows, rows[1:]):
        assert a.last_key < b.first_key
    # checksums are distinct and stable under repartitioning
    assert len({r.checksum for r in rows}) == 9
    again = sp.shard_manifest(
        df.repartition(13), "k", "toks", "byts", shard_size=64
    ).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}
