"""Vector kernels as Catalyst column expressions (JVM-side, no Python UDF).

The reference exposes DuckDB's VSS functions ``array_cosine_similarity``
and ``array_cosine_distance`` inside user SQL
(reference: src/frontmatter_mcp/semantic/query.py:24-25, README.md:320-333).
Spark has no vector builtin, so we build the kernels from higher-order
functions — ``zip_with`` + ``aggregate`` stay inside whole-stage codegen
and vectorize fine at 100 TB scale, unlike a row-at-a-time Python UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def _to_double(col: Column) -> Column:
    return col.cast("array<double>")


def _double_sql(x: float) -> str:
    """One SQL double literal, bit-exact: repr() is the shortest string
    that round-trips the IEEE value, and Spark's parser reads the 'D'
    suffix through Java's Double semantics — the same bits F.lit sends."""
    x = float(x)
    if math.isnan(x):
        return "double('NaN')"
    if math.isinf(x):
        return "double('Infinity')" if x > 0 else "double('-Infinity')"
    return repr(x) + "D"


def array_lit(values) -> Column:
    """array<double> (or array<array<double>>) literal in ONE py4j call.

    ``F.lit`` on a Python list recurses into one JVM round-trip PER
    ELEMENT (pyspark builtin.py), so a k x dim centroid literal costs
    k*dim socket round trips — measured 8.4 s of py4j chatter out of
    q178's 9.9 s build (r12 profile). Rendering the same doubles as one
    SQL ``array(...)`` expression ships one string and parses to the
    IDENTICAL Literal tree (CreateArray of double Literals), so plans
    and results are bit-equal; only driver-side build time changes.
    """
    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        return _double_sql(v)

    return F.expr(render(list(values)))


def array_lit_int(values, suffix: str = "") -> Column:
    """array<int> (or, with suffix="L", array<bigint>) literal in one
    py4j call — the integer twin of array_lit."""
    return F.expr(
        "array(" + ",".join(str(int(x)) + suffix for x in values) + ")"
    )


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise dot product of two numeric array columns (double)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; NULL if either side is NULL."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# Fixed-point grid for cross-engine-exact means: floor(v * 2^49) is
# bit-identical in any IEEE-754 engine (power-of-two scaling is exact,
# floor is exact), unlike double->DECIMAL casts, whose rounding path is
# engine-specific (Spark rounds the exact value HALF_UP; DuckDB rounds
# fl(v * 10^s), a double-rounding).  2^49 keeps |v| < 16 inside 2^53,
# so the scaled value is integer-exact for every float32-derived input.
FIXED_POINT_POW2 = 49
FIXED_POINT_SCALE = float(2**FIXED_POINT_POW2)  # 562949953421312.0


def fixed_point_mean(col: Column) -> Column:
    """Scale-safe, order/partition-independent, cross-engine-deterministic
    mean of a double column: sum exact 2^49 fixed-point integers in
    DECIMAL(38,0) (one partial per task -- a map-side-combined aggregate,
    never a per-group array), then a single int->double rounding.

    Replaces the collect_list sorted-fold mean, whose per-group array is
    an executor memory bomb for popular groups at 100 TB scale.

    DuckDB replay: CAST(SUM(CAST(FLOOR(v * 2^49) AS DECIMAL(38,0)))
                        AS DOUBLE) / COUNT(*) / 2^49
    """
    fx = F.floor(col * F.lit(FIXED_POINT_SCALE)).cast("decimal(38,0)")
    return F.sum(fx).cast("double") / F.count(F.lit(1)) / F.lit(FIXED_POINT_SCALE)


def floor_quant(col: Column, digits: int = 6) -> Column:
    """Engine-independent decimal quantization: FLOOR(x*10^d)/10^d.

    Replaces F.round for hash-significant output: Spark round (BigDecimal
    HALF_UP, decimal-correct) and DuckDB ROUND (scaled-double) are
    different algorithms that disagree whenever x*10^d lands on or within
    ~1 ulp of a half-integer — the r10 q273/q279 driver-red class, and
    the r11 boundary audit found ratio-of-small-integer scores (Jaccard,
    readability, utilization) hitting EXACT halves routinely. For a
    bit-identical input, FLOOR is exact in IEEE and dividing the exact
    integer by 10^d is one correctly-rounded op, so this form cannot
    diverge across engines or builds.

    DuckDB replay: FLOOR((expr) * 1000000e0) / 1000000e0
    """
    s = float(10**digits)
    return F.floor(col * s) / s


def exact_dot_product(a: Column, b: Column, scale: int = 12) -> Column:
    """Order-independent dot product: per-element double products are cast
    to DECIMAL before the exact decimal sum, so the result is bit-identical
    regardless of parallelism/accumulation order (needed when an external
    oracle must hash-match us; double fold order is engine-dependent).
    """
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    dec = F.transform(prods, lambda x: x.cast(f"decimal(30,{scale})"))
    zero = F.lit(0).cast(f"decimal(38,{scale})")
    return F.aggregate(dec, zero, lambda acc, x: acc + x)


def exact_cosine_similarity(a: Column, b: Column, scale: int = 12) -> Column:
    """Cross-engine-deterministic cosine similarity (see exact_dot_product)."""
    dot = exact_dot_product(a, b, scale).cast("double")
    na = F.sqrt(exact_dot_product(a, a, scale).cast("double"))
    nb = F.sqrt(exact_dot_product(b, b, scale).cast("double"))
    return dot / (na * nb)
