"""Deterministic sampling / splitting for training-data pipelines.

Hash-based, not RNG-based: the decision for a document is a pure
function of its content/id, so reruns, backfills, and cross-engine
replays agree exactly — the property that matters when a 100 TB corpus
is sampled incrementally. (Spark's df.sample is seeded per-partition —
NOT stable under repartitioning; these are.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX = "0123456789abcdef"


def hash_bucket(col: Column, buckets: int = 1000) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of a key column —
    built from instr/substr so any SQL engine reproduces it."""
    h = F.md5(col.cast("string"))
    val = F.lit(0).cast("long")
    for i in range(1, 8):  # 7 hex digits: 28 bits, plenty for 1e3 buckets
        val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return (val % buckets).cast("int")


def assign_split(
    key: Column,
    train: float = 0.8,
    val: float = 0.1,
    buckets: int = 1000,
) -> Column:
    """Stable train/val/test assignment by hash bucket."""
    b = hash_bucket(key, buckets)
    return (
        F.when(b < int(train * buckets), F.lit("train"))
        .when(b < int((train + val) * buckets), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_keep(
    key: Column, stratum: Column, rates: dict[str, float], buckets: int = 1000
) -> Column:
    """Deterministic per-stratum downsampling: keep iff the key's hash
    bucket falls under the stratum's rate. The mixing knob of a training
    mix (e.g. upweight rare languages by keeping 100%, downsample the
    dominant one)."""
    b = hash_bucket(key, buckets)
    expr = F.lit(False)
    for name, rate in sorted(rates.items()):
        expr = F.when(stratum == name, b < int(rate * buckets)).otherwise(expr)
    return expr


def quota_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
) -> DataFrame:
    """Absolute-count mixture construction: keep the first
    ``quotas[stratum]`` documents of each stratum in a deterministic
    pseudo-random order (md5 of the key, key as tiebreaker). This is the
    quota complement of ``stratified_keep``'s rates — how a training mix
    hits '2M docs of src A, 500k of src B' targets exactly.

    One shuffle on the stratum key + a rank window per stratum. A
    dominant stratum at extreme scale funnels through one partition's
    sort; the skew fix is a two-phase pre-rank by (stratum, hash-prefix)
    — not needed while strata are O(file-count) sized. Output keeps
    ``mix_rank`` so downstream can tighten a quota without resampling."""
    order_key = F.md5(F.col(key_col).cast("string"))
    from pyspark.sql.window import Window as W

    w = W.partitionBy(stratum_col).orderBy(order_key, F.col(key_col))
    quota = F.lit(default_quota)
    for name, n in sorted(quotas.items()):
        quota = F.when(F.col(stratum_col) == name, F.lit(n)).otherwise(quota)
    return (
        df.withColumn("mix_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("mix_rank") <= quota)
    )
