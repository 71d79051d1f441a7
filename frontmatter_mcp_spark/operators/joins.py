"""Join strategies Spark lacks as builtins, expressed scale-first.

- ``asof_join``: point-in-time join (last right-side row at-or-before
  each left row per key). Spark has no ASOF JOIN; the scalable pattern
  is union + ordered window — ONE shuffle on (key), no per-key loops,
  no range-condition BroadcastNestedLoopJoin blowup. (Used by workload
  q18 against DuckDB's native ASOF JOIN as the oracle.)
- ``salted_join``: equi-join with key salting for skewed distributions:
  the hot side fans out to N salt buckets, the small side replicates N
  ways. AQE's skew-join handles moderate skew automatically; salting is
  the explicit tool when one key dominates (the classic null-key / power-
  law case at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (or < when strict) within the same `on` key.

    Implementation: tag both sides, union, sort within key by
    (ts, side, order), and carry the last-seen right values forward with
    an ignore-nulls window. Cost: one shuffle + one sort — identical
    asymptotics to a windowed aggregation, regardless of key skew between
    the two sides.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]
    lcols = left.columns

    lt = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lcols, "_ts", "_is_left", *[f"_r_{c}" for c in value_cols])

    unioned = lt.unionByName(rt)
    # rows at equal ts: right first (non-strict) so the left row sees it;
    # strict mode puts right rows after left rows at the same instant
    order = [F.col("_ts"), F.col("_is_left").asc() if not strict else F.col("_is_left").desc()]
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a dominant hot key: the skewed side gets a
    random-ish (hash-derived, deterministic) salt in [0, num_salts);
    the other side is replicated num_salts ways; the join key becomes
    (on, salt), spreading the hot key over num_salts tasks."""
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[c for c in skewed.columns]), F.lit(num_salts))
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")
