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


def hash_bucket_sql(col: str, buckets: int = 1000) -> str:
    """The exact same bucket computation as ``hash_bucket``, as an ANSI
    SQL string a DuckDB oracle can run (strpos/substr digit folds)."""
    expr = "CAST(0 AS BIGINT)"
    for i in range(1, 8):
        expr = (
            f"({expr}) * 16 + (strpos('{_HEX}', "
            f"substr(md5(CAST({col} AS VARCHAR)), {i}, 1)) - 1)"
        )
    return f"CAST(({expr}) % {buckets} AS INT)"


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


def _two_phase_prefix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    value: Column,
    prefix_chars: int,
) -> tuple[DataFrame, DataFrame]:
    """The shared two-phase scaffolding of quota_sample and
    token_budget_mixture: a deterministic md5 order key + its
    ``prefix_chars``-hex sub-partition prefix on every row, plus the
    per-(stratum, prefix) offset table — the running total of ``value``
    over all lexicographically EARLIER prefixes in the stratum (a
    map-side-combined aggregate whose shuffle moves one row per
    (stratum, prefix), broadcast back by the callers). Because the md5
    key is fixed-width hex, ordering by (prefix, key-within-prefix) IS
    ordering by the key, so offset + any local accumulation equals the
    single-window global value byte-for-byte."""
    from pyspark.sql.window import Window as W

    keyed = df.withColumn("_ok", F.md5(F.col(key_col).cast("string"))).withColumn(
        "_pfx", F.substring("_ok", 1, prefix_chars)
    )
    totals = keyed.groupBy(stratum_col, "_pfx").agg(F.sum(value).alias("_pv"))
    cum_w = (
        W.partitionBy(stratum_col)
        .orderBy("_pfx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_pv").over(cum_w), F.lit(0))
    ).drop("_pv")
    return keyed, offsets


def quota_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    prefix_chars: int = 2,
) -> DataFrame:
    """Absolute-count mixture construction: keep the first
    ``quotas[stratum]`` documents of each stratum in a deterministic
    pseudo-random order (md5 of the key, key as tiebreaker). This is the
    quota complement of ``stratified_keep``'s rates — how a training mix
    hits '2M docs of src A, 500k of src B' targets exactly.

    Two-phase rank so no stratum ever sorts in a single task (a dominant
    stratum at 100 TB would otherwise funnel through one partition):

    1. rank locally within (stratum, first ``prefix_chars`` hex chars of
       the md5 order key) — 16^prefix_chars sub-sorts per stratum, each
       bounded at stratum_size/256 rows for the default 2;
    2. global rank = local rank + the total count of lexicographically
       earlier prefixes in the same stratum, a 16^prefix_chars-per-
       stratum offset table built by a map-side-partial count (its
       shuffle moves one row per (stratum, prefix), not data) and
       broadcast back.

    Because the md5 key is fixed-width hex, ordering by (prefix, then
    order key within prefix) IS ordering by the order key, so
    ``mix_rank`` is byte-identical to a single `row_number` over the
    whole stratum. Rows whose LOCAL rank already exceeds the quota are
    dropped before the join (offsets are non-negative, so local rank is
    a lower bound on global rank). Output keeps ``mix_rank`` so
    downstream can tighten a quota without resampling."""
    from pyspark.sql.window import Window as W

    quota = F.lit(default_quota)
    for name, n in sorted(quotas.items()):
        quota = F.when(F.col(stratum_col) == name, F.lit(n)).otherwise(quota)

    keyed, offsets = _two_phase_prefix(
        df, key_col, stratum_col, F.lit(1), prefix_chars
    )
    local_w = W.partitionBy(stratum_col, "_pfx").orderBy("_ok", F.col(key_col))
    ranked = keyed.withColumn("_lrank", F.row_number().over(local_w))

    return (
        ranked.filter(F.col("_lrank") <= quota)
        .join(F.broadcast(offsets), [stratum_col, "_pfx"])
        .withColumn("mix_rank", (F.col("_off") + F.col("_lrank")).cast("int"))
        .filter(F.col("mix_rank") <= quota)
        .select(*df.columns, "mix_rank")
    )


def sqrt_temperature_mixture(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    target_total: int,
    buckets: int = 1000,
) -> DataFrame:
    """Temperature-flattened mixture construction (the mT5/XLM-R trick
    at alpha = 0.5): a stratum with raw share p gets sampled share
    q = sqrt(p) / sum(sqrt(p)) — dominant sources are downsampled, rare
    ones upweighted — and each stratum keeps its first
    floor(buckets * min(1, target_total * q / n)) hash buckets.

    alpha is FIXED at 0.5 deliberately: IEEE-754 requires sqrt to be
    correctly rounded, so both engines compute bit-identical shares,
    whereas a general pow(p, alpha) is only faithfully rounded and may
    differ by 1 ulp right where a bucket threshold floors. The sqrt
    values enter the normalizing sum as FLOOR(sqrt(n) * 2^30) exact
    integers — floor of a power-of-two scaling is bit-identical in any
    IEEE engine and the integer sum is order-independent, whereas a
    double->DECIMAL(_,s) cast is NOT portable (Spark rounds HALF_UP,
    DuckDB rounds fl(v*10^s) — the repo-wide _fx_mean rationale). The
    2^-30 quantization cancels out of the share ratio to ~1e-9, far
    inside the 6-decimal output rounding.

    Shape at 100 TB: the stratum histogram is one map-side-combined
    aggregate (|strata| rows), the rate table broadcasts back, and the
    keep decision is a narrow hash map per row — the corpus shuffles
    zero times. Returns the per-stratum audit summary
    (n_docs, sampled share, keep_bucket, n_kept); the same rate table
    joined to the corpus IS the filter a production run applies.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    sq = counts.withColumn(
        "_sqrtp",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(float(2**30))).cast(
            "decimal(38,0)"
        ),
    )
    denom = sq.agg(F.sum("_sqrtp").alias("_denom"))
    rates = (
        sq.crossJoin(F.broadcast(denom))
        .withColumn(
            "q_share",
            (F.col("_sqrtp").cast("double") / F.col("_denom").cast("double")),
        )
        .withColumn(
            "keep_bucket",
            F.floor(
                F.lit(buckets)
                * F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * F.col("q_share")
                    / F.col("n_docs").cast("double"),
                )
            ).cast("int"),
        )
    )
    kept = (
        df.join(F.broadcast(rates), stratum_col)
        .withColumn(
            "_keep", hash_bucket(F.col(key_col), buckets) < F.col("keep_bucket")
        )
        .groupBy(stratum_col)
        .agg(F.sum(F.col("_keep").cast("int")).cast("int").alias("n_kept"))
    )
    return (
        rates.join(kept, stratum_col)
        .select(
            stratum_col,
            F.col("n_docs").cast("int").alias("n_docs"),
            F.round("q_share", 6).alias("q_share"),
            "keep_bucket",
            "n_kept",
        )
    )


def token_budget_mixture(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    tokens_col: str,
    budget: int,
    prefix_chars: int = 2,
) -> DataFrame:
    """Token-budget mixture construction: training mixes are budgeted in
    TOKENS, not documents — each stratum keeps its first documents (in
    the deterministic md5 order of quota_sample) whose running token
    total stays within ``budget``. Returns every input row with its
    in-stratum cumulative token count and the keep verdict, so a
    tightened budget re-filters without recomputation.

    Same two-phase discipline as quota_sample (the shared
    _two_phase_prefix scaffolding), with SUMS instead of counts: the
    running total windows within (stratum, md5-prefix) sub-partitions,
    and per-prefix token-total offsets (a tiny map-side-combined table,
    broadcast back) reconstruct the exact global cumsum — because the
    md5 key is fixed-width hex, prefix-then-key order IS the global
    order, so ``cum_tokens`` is byte-identical to one window over the
    whole stratum and no stratum ever sorts in a single task.
    ``cum_tokens`` stays LONG: a stratum passes 2^31 cumulative tokens
    at ~10 GB of text, far below this operator's design scale, and an
    int cast there would wrap negative and re-admit every later doc.
    """
    from pyspark.sql.window import Window as W

    keyed, offsets = _two_phase_prefix(
        df, key_col, stratum_col, F.col(tokens_col), prefix_chars
    )
    local_w = (
        W.partitionBy(stratum_col, "_pfx")
        .orderBy("_ok", F.col(key_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = keyed.withColumn("_lcum", F.sum(tokens_col).over(local_w))

    return (
        local.join(F.broadcast(offsets), [stratum_col, "_pfx"])
        .withColumn("cum_tokens", (F.col("_off") + F.col("_lcum")).cast("long"))
        .withColumn("kept", F.col("cum_tokens") <= budget)
        .select(*df.columns, "cum_tokens", "kept")
    )


def shard_manifest(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    bytes_col: str,
    shard_size: int,
    prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest — the
    LAST stage of a cleaning pipeline, where the kept corpus is written
    out as fixed-capacity, globally-shuffled shards a trainer streams.

    Documents are ordered by (md5(key), key) — a deterministic global
    shuffle, so adjacent source documents land in different shards — and
    shard i holds positions [i*shard_size, (i+1)*shard_size). The global
    position comes from the same two-phase rank as quota_sample (local
    row_number within a 2-hex md5 prefix + broadcast per-prefix count
    offsets), so NO single task ever sorts the corpus: the only
    corpus-sized exchange is the final shard_id aggregation, and each
    shard's checksum concatenation is bounded by shard_size rows.

    Emits one manifest row per shard: doc/token/byte totals, the first
    and last order keys (the shard's key range — ranges of different
    shards never overlap, which doubles as an audit that the rank was
    correct), and an order-sensitive md5 checksum over the member keys a
    re-export can verify byte-for-byte.
    """
    keyed, offsets = _two_phase_prefix(
        df.withColumn("_all", F.lit(0)), key_col, "_all", F.lit(1), prefix_chars
    )
    from pyspark.sql.window import Window as W

    local_w = W.partitionBy("_pfx").orderBy("_ok", F.col(key_col))
    ranked = (
        keyed.withColumn("_lrank", F.row_number().over(local_w))
        .join(F.broadcast(offsets), ["_all", "_pfx"])
        .withColumn(
            "shard_id",
            F.floor((F.col("_off") + F.col("_lrank") - 1) / F.lit(float(shard_size))).cast(
                "int"
            ),
        )
    )
    member = F.sort_array(
        F.collect_list(F.struct(F.col("_ok").alias("ok"), F.col(key_col).alias("k")))
    )
    return (
        ranked.groupBy("shard_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("n_tokens"),
            F.sum(bytes_col).cast("long").alias("n_bytes"),
            F.min("_ok").alias("first_key"),
            F.max("_ok").alias("last_key"),
            F.md5(F.concat_ws("", F.transform(member, lambda s: s["ok"]))).alias(
                "checksum"
            ),
        )
        .select(
            "shard_id", "n_docs", "n_tokens", "n_bytes",
            "first_key", "last_key", "checksum",
        )
    )
