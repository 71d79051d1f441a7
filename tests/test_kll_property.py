"""Hypothesis property tests for the KLL compactor's local numpy core
(_compact_arrays) against an independent pure-Python replica of the
derandomized compaction rule — no Spark session needed, so the search
space is cheap to cover. The Spark/SQL twins are asserted equal to this
core in tests/test_round8_ops.py; together the chain closes:
pure-Python rule == numpy core == window-chain plan == DuckDB oracle."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings, strategies as st

from frontmatter_mcp_spark.operators.kll import _compact_arrays


def _python_compact(bucket, items, k, levels):
    """Reference implementation: list-of-(value, id, lvl), same sweep
    order, same md5 coin, same drop rule — written independently of the
    numpy vectorization."""
    items = [list(t) for t in items]
    done = [False] * len(items)
    for lv in range(levels):
        idx = [i for i, it in enumerate(items) if it[2] == lv and not done[i]]
        c = len(idx)
        if c == 0:
            continue
        if c <= k:
            for i in idx:
                done[i] = True
            continue
        idx.sort(key=lambda i: (items[i][0], items[i][1]))
        pairs = c - c % 2
        coin = hashlib.md5(f"{bucket}|{lv}|{c}".encode()).hexdigest()[0]
        parity = 1 if coin >= "8" else 0
        drop = set()
        for rn, i in enumerate(idx, 1):
            if rn <= pairs:
                if rn % 2 != parity:
                    drop.add(i)
                else:
                    items[i][2] = lv + 1
            else:
                done[i] = True
        keep = [i for i in range(len(items)) if i not in drop]
        items = [items[i] for i in keep]
        done = [done[i] for i in keep]
    return sorted((v, i, l) for v, i, l in items)


@st.composite
def kll_inputs(draw):
    n = draw(st.integers(min_value=0, max_value=400))
    ids = list(range(n))
    values = draw(
        st.lists(
            st.integers(min_value=-50, max_value=50), min_size=n, max_size=n
        )
    )
    lvls = draw(
        st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n)
    )
    bucket = draw(st.integers(min_value=0, max_value=7))
    k = draw(st.integers(min_value=2, max_value=16))
    return bucket, values, ids, lvls, k


@settings(max_examples=200, deadline=None)
@given(kll_inputs())
def test_numpy_core_matches_python_reference(inp):
    bucket, values, ids, lvls, k = inp
    levels = 12
    vals, out_ids, out_lvls = _compact_arrays(
        bucket,
        np.array(values, dtype=np.int64),
        np.array(ids, dtype=np.int64),
        np.array(lvls, dtype=np.int64),
        k,
        levels,
    )
    got = sorted(zip(vals.tolist(), out_ids.tolist(), out_lvls.tolist()))
    want = _python_compact(bucket, list(zip(values, ids, lvls)), k, levels)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(kll_inputs())
def test_weight_preserved_and_size_bounded(inp):
    bucket, values, ids, lvls, k = inp
    levels = 12
    vals, out_ids, out_lvls = _compact_arrays(
        bucket,
        np.array(values, dtype=np.int64),
        np.array(ids, dtype=np.int64),
        np.array(lvls, dtype=np.int64),
        k,
        levels,
    )
    # compaction preserves total weight exactly
    assert sum(2 ** int(l) for l in out_lvls) == sum(2 ** int(l) for l in lvls)
    # each level ends a sweep with <= k kept items plus the odd remainder
    by_level: dict[int, int] = {}
    for l in out_lvls.tolist():
        by_level[l] = by_level.get(l, 0) + 1
    for lvl, cnt in by_level.items():
        if lvl < levels:  # the top level has no sweep above it
            assert cnt <= k + 1, (lvl, cnt)
