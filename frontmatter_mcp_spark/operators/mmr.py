"""Maximal-marginal-relevance greedy selection as a grouped-local operator.

MMR's greedy loop (pick argmax of lam*relevance - lam2*max-sim-to-
selected, k times) is a data-dependent iteration that a declarative plan
can only express by unrolling — and the unrolled form references the
previous selection on three sides of every step's joins, so the plan
grows geometrically while the DATA stays k^2-bounded per query (<= 20
candidates, <= 380 pair similarities here). That inversion — huge plan,
tiny state — is exactly the applyInPandas escape hatch's job: ONE
shuffle co-partitioning candidates and pair-sims by query id, then the
loop runs as local Python per group.

Determinism contract (the oracle replays the selection in SQL CTEs):
the inputs r and s are doubles BOTH engines already compute
bit-identically (functions.vector sequential-fold discipline); the loop
itself only does lam*r - lam2*ms (two IEEE-754 multiplies and a
subtract, identical in Python and SQL), max() over a set (order-
independent), and argmax under the (score DESC, cid ASC) total order —
so the Python replica picks the identical sequence.

At 100 TB the candidate fetch (ANN probe / brute-force top-k) is the
corpus-facing part; this operator only ever touches queries x k^2 rows.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame


def mmr_greedy(
    candidates: DataFrame,
    pair_sims: DataFrame,
    lambdas: Iterable[tuple[float, float]],
    k: int,
) -> DataFrame:
    """Greedy MMR selection per query, one row per (lam, qid, step).

    candidates: (qid, cid, r)  — relevance-scored candidate set
    pair_sims:  (qid, ca, cb, s) — pairwise sims among candidates (both
                directions present, ca != cb)
    Returns (lam double, qid, cid, step int): for each lambda pair, the
    k greedy picks in order. Step 1 is argmax r; step t>1 is
    argmax lam*r - lam2*max(s to selected), ties to the smallest cid.
    """
    lambdas = list(lambdas)

    def select(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"lam": [], "qid": [], "cid": [], "step": []}
            ).astype({"lam": "f8", "qid": "i8", "cid": "i8", "step": "i4"})
        qid = int(left["qid"].iloc[0])
        rel = dict(zip(left["cid"].astype(int), left["r"].astype(float)))
        sim: dict[int, dict[int, float]] = {}
        for ca, cb, s in zip(
            right["ca"].astype(int), right["cb"].astype(int), right["s"].astype(float)
        ):
            sim.setdefault(ca, {})[cb] = s
        out_lam, out_cid, out_step = [], [], []
        for lam, lam2 in lambdas:
            first = min(rel.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            selected = [first]
            remaining = set(rel) - {first}
            for _ in range(2, k + 1):
                # the SQL twin INNER-joins candidates to their max sim
                # over the selected set — a candidate with no pair to
                # any selected doc is excluded from the argmax, and a
                # step with no scorable candidate selects nothing
                scored = []
                for c in remaining:
                    sims_c = sim.get(c)
                    if not sims_c:
                        continue
                    vals = [sims_c[s] for s in selected if s in sims_c]
                    if not vals:
                        continue
                    scored.append((-(lam * rel[c] - lam2 * max(vals)), c))
                if not scored:
                    break
                best = min(scored)[1]
                selected.append(best)
                remaining.discard(best)
            out_lam.extend([lam] * len(selected))
            out_cid.extend(selected)
            out_step.extend(range(1, len(selected) + 1))
        return pd.DataFrame(
            {
                "lam": pd.Series(out_lam, dtype="f8"),
                "qid": pd.Series([qid] * len(out_cid), dtype="i8"),
                "cid": pd.Series(out_cid, dtype="i8"),
                "step": pd.Series(out_step, dtype="i4"),
            }
        )

    from pyspark.sql import functions as F

    # fresh Alias exprIds on both sides: candidates and pair_sims usually
    # share lineage (pairs are a self-join of the candidate table), and
    # cogroup rejects plans where both children carry the same attribute
    left = candidates.select(
        F.col("qid").alias("qid"), F.col("cid").alias("cid"), F.col("r").alias("r")
    )
    right = pair_sims.select(
        F.col("qid").alias("pqid"),
        F.col("ca").alias("ca"),
        F.col("cb").alias("cb"),
        F.col("s").alias("s"),
    )
    return (
        left.groupBy("qid")
        .cogroup(right.groupBy("pqid"))
        .applyInPandas(select, "lam double, qid long, cid long, step int")
    )
