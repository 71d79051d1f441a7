"""Deterministic KLL-style mergeable quantile sketch.

The fifth member of the mergeable-summary family (MG heavy hitters, HLL,
KMV, CountMin already exist as workload queries): a compactor hierarchy
in the KLL/Manku-Rajagopalan tradition (Karnin, Lang, Liberty, "Optimal
quantile approximation in streams", FOCS 2016), derandomized so a SQL
oracle reproduces it bit-for-bit:

- every item starts at level 0 with weight 1; a level holding more than
  ``k`` items is FULLY compacted: sort by (value, id), drop the odd
  remainder to "done", keep the even- or odd-indexed half of the pairs
  and promote it one level up with doubled weight;
- the even/odd coin is an md5 bit of (bucket, level, count) — the
  pin-the-fold-order discipline (ADR-0004) applied to the only
  randomness KLL needs, so any engine replays the identical sketch;
- the classic per-insert compaction CASCADE (a data-dependent while
  loop SQL cannot express) becomes a FIXED unroll: one batch-level
  sweep per level, bottom-up — depth <= log2(n/k), so ``levels``
  bounds the supported input size at k * 2**levels rows per bucket.

Mergeability is the point: per-bucket sketches (bucket = md5 hash of
the row key, standing in for "per executor partition" at cluster
scale) are unioned AT THEIR LEVELS and the same compactor runs again
with one global bucket — the merged summary is again O(k * levels)
items whose total weight exactly equals the input count (compaction
preserves weight: pairs/2 promoted at 2w replace pairs at w, the odd
remainder keeps w).

At 100 TB: phase 1 shuffles once per level keyed by bucket (volume
n + n/2 + ... <= 2n total, each level map-side prunable), phase 2
touches only buckets * k * levels summary rows. No driver loop, no
collect; the unrolled depth is a compile-time constant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

KLL_K = 128
KLL_LEVELS = 12


def kll_compact(
    df: DataFrame,
    k: int = KLL_K,
    levels: int = KLL_LEVELS,
    bucket_col: str = "bucket",
    value_col: str = "value",
    id_col: str = "id",
    level_col: str = "lvl",
) -> DataFrame:
    """Run the fixed-depth compactor over (bucket, value, id, lvl) rows.

    Input rows may sit at any level (that is what makes merge = union +
    recompact). Output: the surviving items with their final ``lvl``;
    weight of an item is 2**lvl. Single linear plan: one pass per level,
    each pass two window functions over the same (bucket, lvl, done)
    partitioning — no branching unions, so Catalyst sees a chain, not a
    tree, and shuffle volume is geometric in the level number.
    """
    cur = df.withColumn("_done", F.lit(False))
    for lv in range(levels):
        w = Window.partitionBy(bucket_col, level_col, "_done")
        rn = F.row_number().over(w.orderBy(value_col, id_col))
        c = F.count("*").over(w)
        t = cur.withColumn("_rn", rn).withColumn("_c", c)
        active = (F.col(level_col) == lv) & ~F.col("_done")
        pairs = F.col("_c") - F.col("_c") % 2
        parity = (
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col(bucket_col).cast("string"),
                        F.lit(str(lv)),
                        F.col("_c").cast("string"),
                    )
                ),
                1,
                1,
            )
            >= "8"
        ).cast("int")
        compacting = active & (F.col("_c") > k) & (F.col("_rn") <= pairs)
        dropped = compacting & (F.col("_rn") % 2 != parity)
        cur = (
            t.filter(~dropped)
            .withColumn(
                level_col,
                F.when(compacting, F.lit(lv + 1)).otherwise(F.col(level_col)),
            )
            .withColumn("_done", F.col("_done") | (active & ~compacting))
            .drop("_rn", "_c")
        )
    return cur.drop("_done")


def _compact_arrays(
    bucket: int,
    vals: np.ndarray,
    ids: np.ndarray,
    lvls: np.ndarray,
    k: int,
    levels: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The identical compactor as a local numpy loop (same sweep order,
    same md5 parity coin, same drop rule as ``kll_compact`` — property-
    tested equal). Used by ``kll_compact_grouped``."""
    done = np.zeros(len(vals), dtype=bool)
    for lv in range(levels):
        active = (lvls == lv) & ~done
        c = int(active.sum())
        if c == 0:
            continue
        if c <= k:
            done[active] = True
            continue
        idx = np.flatnonzero(active)
        idx = idx[np.lexsort((ids[idx], vals[idx]))]
        pairs = c - c % 2
        coin = hashlib.md5(f"{bucket}|{lv}|{c}".encode()).hexdigest()[0]
        parity = 1 if coin >= "8" else 0
        rn = np.arange(1, c + 1)
        compacting = rn <= pairs
        dropped = compacting & ((rn % 2) != parity)
        lvls[idx[compacting & ~dropped]] = lv + 1
        done[idx[~compacting]] = True
        keep = np.ones(len(vals), dtype=bool)
        keep[idx[dropped]] = False
        vals, ids, lvls, done = vals[keep], ids[keep], lvls[keep], done[keep]
    return vals, ids, lvls


def kll_compact_grouped(
    df: DataFrame, k: int = KLL_K, levels: int = KLL_LEVELS
) -> DataFrame:
    """The execution-shape twin of ``kll_compact``: ONE shuffle keyed by
    the content-derived bucket, then the whole compactor hierarchy runs
    as a local numpy loop per bucket (Arrow batch in, summary out).
    Output summaries are bit-identical to ``kll_compact``'s (and to the
    SQL twin's) because the only coin is the shared md5 parity bit.

    This is the 100 TB plan: shuffle volume is the (bucket, value, id)
    triple once — not once per level — and per-bucket memory is the
    bucket's slice, which the bucket count is sized to bound (the same
    contract every applyInPandas operator in this repo documents). A
    pure map-side-partial variant (per-partition sketches, shuffle only
    O(k*levels) summaries) would cut the shuffle to near zero but makes
    the summary depend on partition boundaries — rejected here because
    cross-engine replay (ADR-0004) requires content-defined state.
    Columns: bucket int, value long, id long, lvl int."""

    def compact(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        vals, ids, lvls = _compact_arrays(
            bucket,
            pdf["value"].to_numpy(np.int64),
            pdf["id"].to_numpy(np.int64),
            pdf["lvl"].to_numpy(np.int64).copy(),
            k,
            levels,
        )
        return pd.DataFrame(
            {"bucket": bucket, "value": vals, "id": ids, "lvl": lvls}
        )

    return df.groupBy("bucket").applyInPandas(
        compact, "bucket int, value long, id long, lvl int"
    )


def kll_level_sql(lv: int, k: int, src: str, out: str) -> str:
    """One compactor sweep as a SQL CTE pair — the exact relational twin
    of one ``kll_compact`` loop iteration (same partitioning, same md5
    parity bit, same drop rule)."""
    parity = (
        f"CASE WHEN substr(md5(CAST(bucket AS VARCHAR) || '|{lv}|' || "
        f"CAST(c AS VARCHAR)), 1, 1) >= '8' THEN 1 ELSE 0 END"
    )
    return f"""
    {out}_w AS (
      SELECT bucket, value, id, lvl, done,
             ROW_NUMBER() OVER (PARTITION BY bucket, lvl, done
                                ORDER BY value, id) AS rn,
             COUNT(*) OVER (PARTITION BY bucket, lvl, done) AS c
      FROM {src}
    ),
    {out} AS (
      SELECT bucket, value, id,
             CASE WHEN lvl = {lv} AND NOT done AND c > {k}
                       AND rn <= c - c % 2
                  THEN lvl + 1 ELSE lvl END AS lvl,
             CASE WHEN lvl = {lv} AND NOT done
                       AND (c <= {k} OR rn > c - c % 2)
                  THEN TRUE ELSE done END AS done
      FROM {out}_w
      WHERE NOT (lvl = {lv} AND NOT done AND c > {k}
                 AND rn <= c - c % 2 AND rn % 2 <> ({parity}))
    )"""


def kll_compact_sql(
    k: int, levels: int, src: str, prefix: str, final: str
) -> str:
    """Chain ``levels`` compactor sweeps: CTE text from ``src`` (columns
    bucket, value, id, lvl, done) to a final CTE named ``final``."""
    parts = []
    cur = src
    for lv in range(levels):
        out = f"{prefix}{lv}" if lv < levels - 1 else final
        parts.append(kll_level_sql(lv, k, cur, out))
        cur = out
    return ",".join(parts)
