"""Embedding compression: per-dimension int8 scalar quantization.

The standard trick for shrinking a vector index 4x before ANN serving:
per dimension d, code = floor((x_d - min_d) * 255 / (max_d - min_d)),
clamped to [0, 255]. The dimension stats are one tiny aggregate (dims x
2 doubles), shipped back into a narrow map as literals — the same
broadcast-as-literal shape as the k-means assignment (see
operators.clustering), so the encode pass is shuffle-free.

Deterministic: every emitted double is a chain of IEEE-754 ops in a
fixed order, codes are exact integers, and the reconstruction error is
a sorted sequential fold (the engine-portable summation used throughout
this repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dim_stats(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(pos, dmin, dmax) over the corpus — one explode + tiny aggregate."""
    return (
        embeddings.select(F.posexplode(F.col(vec_col).cast("array<double>")))
        .groupBy("pos")
        .agg(F.min("col").alias("dmin"), F.max("col").alias("dmax"))
    )


def int8_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to int8 codes; returns per-vector
    (id, n_dims, codes_fp, recon_err) where codes_fp is the md5 of the
    comma-joined code sequence and recon_err the summed squared
    dequantization error.
    """
    stats = dim_stats(embeddings, vec_col).orderBy("pos").collect()
    mins = [r.dmin for r in stats]
    maxs = [r.dmax for r in stats]
    lo = F.lit(mins)
    hi = F.lit(maxs)

    v = F.col(vec_col).cast("array<double>")
    # zip the vector against the per-dim ranges: scaled = (x-min)*255/(max-min)
    scaled = F.zip_with(
        F.zip_with(v, lo, lambda x, mn: x - mn),
        F.zip_with(hi, lo, lambda mx, mn: mx - mn),
        lambda num, rng: F.when(rng > 0, F.floor(num * F.lit(255.0) / rng)).otherwise(
            F.lit(0)
        ),
    )
    codes = F.transform(
        scaled, lambda c: F.greatest(F.least(c, F.lit(255)), F.lit(0)).cast("int")
    )
    dequant = F.zip_with(
        codes.cast("array<double>"),
        F.zip_with(hi, lo, lambda mx, mn: mx - mn),
        lambda c, rng: c * rng / F.lit(255.0),
    )
    xhat = F.zip_with(dequant, lo, lambda d, mn: d + mn)
    err_terms = F.zip_with(v, xhat, lambda x, y: (x - y) * (x - y))
    recon_err = F.aggregate(
        F.array_sort(err_terms), F.lit(0.0), lambda a, x: a + x
    )
    return embeddings.select(
        F.col(id_col),
        F.size(v).alias("n_dims"),
        F.md5(F.array_join(codes.cast("array<string>"), ",")).alias("codes_fp"),
        F.round(recon_err, 12).alias("recon_err"),
    )
