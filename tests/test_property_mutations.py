"""Property-based tests (hypothesis) for the mutation semantics, plus a
randomized batch parity check: the Catalyst array expressions
(operators/arrays.py) must agree with the Python per-file semantics
(mutations.py) on arbitrary inputs — the two implementations of the same
reference contract cross-validate each other."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from frontmatter_mcp_spark import mutations as mut
from frontmatter_mcp_spark.operators import arrays as ax

vals = st.text(alphabet="abcxyz", min_size=1, max_size=3)
arrays = st.lists(vals, max_size=8)


@given(arrays, vals, st.booleans())
@settings(max_examples=200, deadline=None)
def test_add_properties(arr, v, allow_dup):
    out, changed, warning = mut.add_value(
        list(arr), v, path="p", prop="t", allow_duplicates=allow_dup
    )
    assert warning is None
    if allow_dup or v not in arr:
        assert changed and out == arr + [v]
    else:
        assert not changed and out == arr


@given(arrays, vals)
@settings(max_examples=200, deadline=None)
def test_remove_first_occurrence_property(arr, v):
    out, changed, warning = mut.remove_value(list(arr), v, path="p", prop="t")
    assert warning is None
    if v in arr:
        i = arr.index(v)
        assert changed and out == arr[:i] + arr[i + 1 :]
    else:
        assert not changed and out == arr


@given(arrays, vals, vals)
@settings(max_examples=200, deadline=None)
def test_replace_first_occurrence_property(arr, old, new):
    out, changed, _ = mut.replace_value(list(arr), old, new, path="p", prop="t")
    if old in arr:
        i = arr.index(old)
        assert changed == (True) and out[:i] == arr[:i] and out[i] == new and out[i + 1 :] == arr[i + 1 :]
    else:
        assert out == arr


@given(arrays)
@settings(max_examples=200, deadline=None)
def test_unique_preserves_first_occurrence_property(arr):
    out, changed, _ = mut.unique_values(list(arr), path="p", prop="t")
    assert out == list(dict.fromkeys(arr))
    assert changed == (out != arr)


@given(arrays, st.booleans())
@settings(max_examples=200, deadline=None)
def test_sort_property(arr, reverse):
    out, changed, _ = mut.sort_values(list(arr), path="p", prop="t", reverse=reverse)
    if len(arr) > 1 and sorted(arr, reverse=reverse) != arr:
        assert changed and out == sorted(arr, reverse=reverse)
    else:
        assert not changed and out == arr


def test_expressions_match_python_semantics_randomized(spark):
    """One Spark job over 300 random arrays: column expressions vs the
    Python reference semantics for every operator."""
    rng = random.Random(42)
    alphabet = ["a", "b", "c", "x", "y"]
    cases = []
    for i in range(300):
        n = rng.randint(0, 8)
        arr = [rng.choice(alphabet) for _ in range(n)] if n else []
        cases.append((i, arr if rng.random() > 0.05 else None))
    df = spark.createDataFrame(cases, "id int, arr array<string>")
    v, old, new = "a", "b", "z"
    got = {
        r.id: r
        for r in df.select(
            "id",
            ax.array_add(F.col("arr"), F.lit(v)).alias("added"),
            ax.array_add(F.col("arr"), F.lit(v), allow_duplicates=True).alias("added_dup"),
            ax.array_remove_first(F.col("arr"), F.lit(v)).alias("removed"),
            ax.array_replace_first(F.col("arr"), F.lit(old), F.lit(new)).alias("replaced"),
            ax.array_sorted(F.col("arr")).alias("sorted_asc"),
            ax.array_unique(F.col("arr")).alias("uniq"),
        ).collect()
    }
    for i, arr in cases:
        r = got[i]
        if arr is None:
            # NULL column: add creates [v] (reference: missing prop), the
            # rest pass NULL through
            assert r.added == [v] and r.added_dup == [v]
            assert r.removed is None and r.replaced is None
            continue
        assert r.added == mut.add_value(arr, v, path="p", prop="t")[0]
        assert r.added_dup == mut.add_value(arr, v, path="p", prop="t", allow_duplicates=True)[0]
        assert r.removed == mut.remove_value(arr, v, path="p", prop="t")[0]
        assert r.replaced == mut.replace_value(arr, old, new, path="p", prop="t")[0]
        assert r.sorted_asc == (sorted(arr) if arr else [])
        assert r.uniq == list(dict.fromkeys(arr))
