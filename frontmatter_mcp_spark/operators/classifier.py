"""Model-based quality filtering: a trained hashed-feature linear classifier.

The DCLM/CCNet recipe scores every document with a cheap linear model
trained to separate a curated "positive" corpus from the raw pool, then
keeps the top-scoring documents. This module trains that model INSIDE the
engine — batch gradient descent over hashed bag-of-words features,
expressed as a declarative DataFrame plan (aggregate -> broadcast-joined
weight table per iteration), so the same physical shape that scores 100 TB
also trains on it: one corpus-sized shuffle per iteration (the gradient
aggregate groups by the 64-entry bucket key with map-side combine), and
every weight table is a <=``buckets``-row broadcast.

Every quantity is a scaled INTEGER (fixed point at ``SCALE`` = 2^14), so
training is bit-identical across engines and replayable in plain SQL:

- features: per-doc token counts hashed into ``buckets`` buckets
  (md5-fold — `operators.sampling.hash_bucket`);
- prediction: hard-sigmoid ``p = clamp(S/2 + fdiv(z, PDIV), 0, S)`` —
  piecewise-linear, so no exp()/ulp portability concerns;
- update: ``w -= fdiv(gradient, n_docs * LRINV)`` with ``fdiv`` an exact
  floor division (the numerator is made exactly divisible first, so the
  double division is exact while |gradient| < 2^53 — at S = 2^14 that
  holds beyond 10^11 documents).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from frontmatter_mcp_spark.operators.sampling import hash_bucket

SCALE = 2**14  # fixed-point one
LRINV = 8  # learning rate 1/LRINV (per mean-gradient unit)
PDIV = 8  # hard-sigmoid slope: p moves by z/PDIV around S/2


def _fdiv(a: Column, m: Column) -> Column:
    """Exact floor division of longs: subtract the positive remainder,
    then divide (exactly). Floor, not truncation, so negative gradients
    round the same way on every engine."""
    return ((a - F.pmod(a, m)) / m).cast("long")


def _clamp(x: Column) -> Column:
    return F.least(F.lit(SCALE).cast("long"), F.greatest(F.lit(0).cast("long"), x))


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1), lambda t: t != ""
    )


def _features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    buckets: int,
    persist_fn: Callable[[DataFrame], DataFrame],
) -> tuple[DataFrame, DataFrame, Column]:
    """The shared training inputs: the pinned (doc, bucket, tf, y)
    feature table, the label projection, and the n*LRINV one-row
    broadcast."""
    tf = (
        df.select(id_col, F.explode(_tokens(text_col)).alias("t"))
        .groupBy(id_col, hash_bucket(F.col("t"), buckets).alias("b"))
        .agg(F.count("*").alias("tf"))
    )
    lab = df.select(id_col, label.cast("long").alias("y"))
    tfy = persist_fn(tf.join(lab, id_col))
    d_row = F.broadcast(
        df.agg((F.count("*") * F.lit(LRINV)).cast("long")).toDF("d")
    )
    return tfy, lab, d_row


def _train(
    tfy: DataFrame, id_col: str, d_row: DataFrame, iters: int
) -> DataFrame:
    """Run ``iters`` batch-GD steps over the feature table; returns the
    (b, w) weight table (<= buckets rows)."""
    half = F.lit(SCALE // 2).cast("long")
    weights: DataFrame | None = None  # (b, w); None means all-zero
    for _ in range(iters):
        if weights is None:
            resid = tfy.select(id_col, "b", "tf", (half - SCALE * F.col("y")).alias("r"))
        else:
            # y is functionally dependent on the doc key, so grouping by
            # (doc, y) is the per-doc margin with the label carried along
            p = (
                tfy.join(F.broadcast(weights), "b")
                .groupBy(id_col, "y")
                .agg(F.sum(F.col("w") * F.col("tf")).cast("long").alias("z"))
                .select(
                    id_col,
                    "y",
                    _clamp(half + _fdiv(F.col("z"), F.lit(PDIV))).alias("p"),
                )
            )
            resid = tfy.drop("y").join(p, id_col).select(
                id_col, "b", "tf", (F.col("p") - SCALE * F.col("y")).alias("r")
            )
        grad = resid.groupBy("b").agg(
            F.sum(F.col("r") * F.col("tf")).cast("long").alias("g")
        )
        step = grad.crossJoin(d_row).select(
            "b", _fdiv(F.col("g"), F.col("d")).alias("dw")
        )
        if weights is None:
            weights = step.select("b", (-F.col("dw")).alias("w"))
        else:
            weights = weights.join(step, "b").select(
                "b", (F.col("w") - F.col("dw")).alias("w")
            )
    return weights


def train_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    buckets: int = 64,
    iters: int = 2,
    persist_fn: Callable[[DataFrame], DataFrame] = lambda d: d,
) -> DataFrame:
    """Train the classifier and return just the (b, w) weight table —
    the artifact a serving path broadcasts (see ``literal_score_expr``)."""
    tfy, _lab, d_row = _features(df, id_col, text_col, label, buckets, persist_fn)
    return _train(tfy, id_col, d_row, iters)


def hashed_linear_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    buckets: int = 64,
    iters: int = 2,
    persist_fn: Callable[[DataFrame], DataFrame] = lambda d: d,
) -> DataFrame:
    """Train ``iters`` batch-GD steps of the hashed linear classifier on
    (df, label) and score every document with the final weights.

    Returns (id_col, label, score_fx, prob): ``score_fx`` is the raw
    fixed-point margin under the trained weights, ``prob`` the
    hard-sigmoid probability (an exact dyadic rational — bit-identical
    across engines, no rounding step needed).

    The feature table (doc, bucket, tf) feeds every iteration's gradient
    and margin — pass ``persist_fn`` (e.g. workload.registry.pin) so it
    materializes once instead of re-tokenizing the corpus 2*iters times.
    """
    tfy, lab, d_row = _features(df, id_col, text_col, label, buckets, persist_fn)
    weights = _train(tfy, id_col, d_row, iters)
    half = F.lit(SCALE // 2).cast("long")
    z_fin = (
        tfy.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("tf")).cast("long").alias("z"))
    )
    return lab.join(z_fin, id_col, "left").select(
        id_col,
        F.col("y").cast("int").alias("label"),
        F.coalesce(F.col("z"), F.lit(0)).cast("long").alias("score_fx"),
        (
            _clamp(half + _fdiv(F.coalesce(F.col("z"), F.lit(0)), F.lit(PDIV))).cast(
                "double"
            )
            / F.lit(float(SCALE))
        ).alias("prob"),
    )


def literal_score_expr(
    text_col: str, weights: dict[int, int], buckets: int = 64
) -> Column:
    """The serving-side margin: score a document with TRAINED weights
    carried as a plan-literal map — a narrow, zero-shuffle, zero-join
    codegen expression (the k-means literal-centroid discipline applied
    to model inference). Works identically on batch and streaming
    DataFrames; sequential integer adds are order-independent, so the
    fold is exact. Returns the fixed-point margin z (long)."""
    from frontmatter_mcp_spark.functions.vector import array_lit_int

    # one py4j call per array (vector.array_lit discipline): same int /
    # long literal trees as the per-element F.lit loop, ~1% of its
    # driver build cost at 64 buckets
    wmap = F.map_from_arrays(
        array_lit_int(sorted(weights)),
        array_lit_int([weights[b] for b in sorted(weights)], suffix="L"),
    )
    return F.aggregate(
        _tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(wmap, hash_bucket(t, buckets)), F.lit(0).cast("long")
        ),
    )
