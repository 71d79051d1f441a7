"""Two-phase total-order ranking (guide §2: no corpus-scale
single-partition windows).

A window function with an ORDER BY and no PARTITION BY — RANK() /
ROW_NUMBER() / NTILE() over a whole table — plans as an Exchange
SinglePartition: every row funnels through ONE task, which is fine for
a 5k-row table and dead at 100 TB. The scalable form is the classic
two-phase rank:

1. bucket every row by a MONOTONE function of the leading order column
   (linear interpolation between the column's min and max, from a
   one-row broadcast aggregate — ties share a value, so they share a
   bucket by construction);
2. rank locally inside each bucket (Window PARTITION BY bucket — a
   parallel, spillable sort);
3. global position = local position + the total count of earlier
   buckets (a bucket-count offset table, tiny, cumulated in one
   sub-second window over <= `parts` rows and broadcast back).

Because the bucket function is monotone along the requested order,
offset + local row_number is byte-identical to the single-window
global row_number; RANK and per-value tie counts are recovered with a
(bucket, value)-keyed window that reuses the same exchange and sort.

Cost shape: ONE corpus exchange (hash by bucket) + one parallel sort —
the same exchange count as the single-partition form, minus the
serialization. Bucket balance follows the value distribution (a
uniform split of the [min, max] span); a pathological distribution
degrades balance but never correctness, and a single hot VALUE sits in
one bucket exactly like it sits in one partition today — WindowExec
buffers key groups spillably either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W

# Buckets scale with the session's core count (a cluster gets more,
# local[8] fewer) — never with a constant tuned to this sandbox. The
# conf override exists for production tuning; the default keeps the
# bench comparable across the driver's core-count runs.
_BUCKETS_CONF = "spark.frontmatter.totalOrder.buckets"


def _n_buckets(df: DataFrame) -> int:
    sc = df.sparkSession.sparkContext
    conf = df.sparkSession.conf.get(_BUCKETS_CONF, None)
    if conf:
        return max(1, int(conf))
    return max(64, sc.defaultParallelism * 8)


def hex_prefix_bucket(key: Column, chars: int = 2) -> Column:
    """Monotone bucket for an ORDER BY over a fixed-width lowercase hex
    key (md5): the integer value of the first ``chars`` hex digits.

    Hex digits sort identically as characters and as numbers ('0'-'9'
    precede 'a'-'f' in ASCII), so the prefix integer is non-decreasing
    along the string order and constant on equal keys — the explicit-
    bucket contract of ``with_global_row_number``. 2 chars = 256
    uniformly-loaded buckets (md5 is uniform), the same prefix split the
    sampling operators' _two_phase_prefix uses.
    """
    return F.conv(F.substring(key, 1, chars), 16, 10).cast("long")


def _bucket_expr(
    v: Column, mn: Column, mx: Column, parts: int, ascending: bool
) -> Column:
    """Monotone [0, parts) bucket of v between mn and mx.

    Double math: (v - mn) / (mx - mn) is non-decreasing in v for a
    fixed positive divisor (IEEE division is monotone in the dividend),
    so floor(frac * parts) is non-decreasing and equal values always
    share a bucket. Descending order flips the bucket index so bucket
    order follows the requested sort order.
    """
    span = mx.cast("double") - mn.cast("double")
    frac = F.when(span > 0, (v.cast("double") - mn.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    b = F.greatest(
        F.lit(0), F.least(F.lit(parts - 1), F.floor(frac * parts).cast("int"))
    )
    return b if ascending else (F.lit(parts - 1) - b)


def _with_bucket(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    bkt: str,
    bucket: Column | None,
    bucket_bounds: tuple[str, str] | None,
    parts: int,
) -> DataFrame:
    """Attach the monotone bucket column.

    ``bucket``: an explicit integer expression the caller guarantees is
    monotone NON-DECREASING along the requested order and constant on
    order-tuple ties of its inputs (e.g. a hex-prefix of an md5 order
    key, or stage * 256 + prefix for a composite order). Default:
    linear interpolation of the leading order column between its min
    and max from a one-row broadcast aggregate.
    """
    if bucket is not None:
        return df.withColumn(bkt, bucket.cast("long"))
    first, first_asc = order_cols[0]
    if bucket_bounds is None:
        mm = df.agg(F.min(first).alias("__mn"), F.max(first).alias("__mx"))
        df = df.crossJoin(F.broadcast(mm))
        mn_c, mx_c = F.col("__mn"), F.col("__mx")
    else:
        mn_c, mx_c = F.col(bucket_bounds[0]), F.col(bucket_bounds[1])
    df = df.withColumn(
        bkt,
        _bucket_expr(F.col(first), mn_c, mx_c, parts, first_asc).cast("long"),
    )
    return df.drop("__mn", "__mx") if bucket_bounds is None else df


def _order_exprs(order_cols: list[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols]


def with_global_row_number(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    out: str = "_rn",
    bucket: Column | None = None,
    bucket_bounds: tuple[str, str] | None = None,
    parts: int | None = None,
    keep_bucket: str | None = None,
    total_out: str | None = None,
) -> DataFrame:
    """Add ``out`` = ROW_NUMBER() OVER (ORDER BY order_cols), two-phase.

    order_cols: [(column name, ascending)], the first column drives the
    default bucketing and must be non-null. When ``order_cols`` is a
    total order the numbering is deterministic; under ties it is
    tie-arbitrary exactly like the single-window form (consumers that
    need tie-invariant outputs derive RANK/counts from it).

    bucket: explicit monotone bucket expression (see _with_bucket).
    bucket_bounds: optional (min_col, max_col) names ALREADY on df
    (from one shared broadcast one-row aggregate) so several passes
    can share a single aggregate; default computes its own.
    keep_bucket: optional name to retain the bucket column under (for
    tie windows that must reuse the exchange).
    total_out: optional name for a COUNT(*) OVER () column. The total
    is the last bucket's offset + count, read off the (<= parts)-row
    offset table for free — callers cutting NTILEs need it and would
    otherwise pay a separate aggregate + broadcast join.
    """
    parts = parts or _n_buckets(df)
    bkt = "__bkt_" + out
    df = _with_bucket(df, order_cols, bkt, bucket, bucket_bounds, parts)
    # phase 1: local row_number inside each bucket
    w_loc = W.partitionBy(bkt).orderBy(*_order_exprs(order_cols))
    local = df.withColumn("__lrn", F.row_number().over(w_loc))
    # phase 2: per-bucket counts -> running offset of earlier buckets.
    # The offset table has <= parts rows; its cumulative window is the
    # ONLY single-partition window left and it is bounded by `parts`,
    # not by the data.
    counts = df.groupBy(bkt).agg(F.count("*").alias("__bc"))
    w_off = W.orderBy(bkt).rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__bc").over(w_off), F.lit(0))
    )
    if total_out:
        w_all = W.orderBy(bkt).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        offsets = offsets.withColumn(
            total_out, F.sum("__bc").over(w_all).cast("long")
        )
    offsets = offsets.drop("__bc")
    joined = local.join(F.broadcast(offsets), bkt).withColumn(
        out, (F.col("__off") + F.col("__lrn")).cast("long")
    )
    drop = ["__lrn", "__off"] + ([] if keep_bucket else [bkt])
    if keep_bucket and keep_bucket != bkt:
        joined = joined.withColumnRenamed(bkt, keep_bucket)
    return joined.drop(*drop)


def with_global_cumagg(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    value: Column,
    agg: str = "sum",
    out: str = "_cum",
    include_current: bool = True,
    bucket: Column | None = None,
    bucket_bounds: tuple[str, str] | None = None,
    parts: int | None = None,
) -> DataFrame:
    """Two-phase running SUM/MAX over a global order.

    out = AGG(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND {CURRENT ROW | 1 PRECEDING}) without a
    single-partition window: local running agg inside each bucket +
    the total agg of all earlier buckets (offset table <= parts rows),
    combined null-exactly (an empty frame stays NULL, matching the
    window semantics). Requires a TOTAL order (the running value of a
    ROWS frame under ties is tie-arbitrary otherwise — same caveat as
    the single-window form).
    """
    assert agg in ("sum", "max")
    fagg = F.sum if agg == "sum" else F.max
    parts = parts or _n_buckets(df)
    bkt = "__bkt_" + out
    df = _with_bucket(df, order_cols, bkt, bucket, bucket_bounds, parts)
    end = 0 if include_current else -1
    w_loc = (
        W.partitionBy(bkt)
        .orderBy(*_order_exprs(order_cols))
        .rowsBetween(W.unboundedPreceding, end)
    )
    local = df.withColumn("__lc", fagg(value).over(w_loc))
    totals = df.groupBy(bkt).agg(fagg(value).alias("__bt"))
    w_off = W.orderBy(bkt).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn("__off", fagg("__bt").over(w_off)).drop("__bt")
    joined = local.join(F.broadcast(offsets), bkt)
    off, lc = F.col("__off"), F.col("__lc")
    if agg == "max":
        combined = F.greatest(off, lc)  # greatest skips NULLs; both-NULL -> NULL
    else:
        combined = (
            F.when(lc.isNull(), off).when(off.isNull(), lc).otherwise(off + lc)
        )
    return joined.withColumn(out, combined).drop("__lc", "__off", bkt)


def with_global_rank_ties(
    df: DataFrame,
    order_col: str,
    rank_out: str = "rk",
    ties_out: str = "nt",
    parts: int | None = None,
) -> DataFrame:
    """RANK() OVER (ORDER BY order_col) and COUNT(*) PARTITION BY value.

    rank = min global row_number among equal values (ties share a
    bucket, so the recovery window keys on (bucket, value) and reuses
    the two-phase exchange and sort — no extra shuffle); nt = the tie
    count from the same window. Both are tie-invariant even though the
    underlying row_number is tie-arbitrary.
    """
    bkt = "__bkt_tmp"
    out = with_global_row_number(
        df,
        [(order_col, True)],
        out="__grn",
        parts=parts,
        keep_bucket=bkt,
    )
    wt = W.partitionBy(bkt, order_col)
    return (
        out.withColumn(rank_out, F.min("__grn").over(wt))
        .withColumn(ties_out, F.count("*").over(wt))
        .drop("__grn", bkt)
    )


def ntile_from_rn(rn: Column, total: Column, n: int) -> Column:
    """Exact NTILE(n) bucket from a global row_number and total count.

    Standard SQL NTILE: q = total div n buckets of size q+1 for the
    first (total mod n) buckets, size q after. Matches Spark's and
    DuckDB's NTILE bit-for-bit (property-tested); the greatest() guard
    keeps the second branch's divisor positive when total < n (that
    branch is never selected then, but Spark may still evaluate it).
    """
    q = (total / F.lit(n)).cast("long")
    r = total % F.lit(n)
    head = (rn - 1) / (q + 1)
    tail = r + (rn - 1 - r * (q + 1)) / F.greatest(q, F.lit(1))
    return (
        F.when(rn <= (q + 1) * r, head.cast("long")).otherwise(tail.cast("long"))
        + 1
    ).cast("int")
