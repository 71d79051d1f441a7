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
