"""Column-expression array ops (operators/arrays.py) must match the
reference's Python list semantics (mutations.py) on edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import arrays as ax

CASES = [
    ["a", "b", "a", "c", "b"],
    ["a"],
    [],
    ["b", "a", "c"],
    None,
]


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, v) for i, v in enumerate(CASES)]
    return spark.createDataFrame(rows, "id int, arr array<string>")


def collect(df, col):
    return {r.id: r.out for r in df.select("id", col.alias("out")).collect()}


def test_array_add(df):
    got = collect(df, ax.array_add(F.col("arr"), F.lit("a")))
    assert got[0] == ["a", "b", "a", "c", "b"]  # dup skipped
    assert got[1] == ["a"]
    assert got[2] == ["a"]  # empty -> appended
    assert got[4] == ["a"]  # NULL -> created
    got_dup = collect(df, ax.array_add(F.col("arr"), F.lit("a"), allow_duplicates=True))
    assert got_dup[0] == ["a", "b", "a", "c", "b", "a"]


def test_array_remove_first(df):
    got = collect(df, ax.array_remove_first(F.col("arr"), F.lit("a")))
    assert got[0] == ["b", "a", "c", "b"]  # only first 'a' removed
    assert got[1] == []
    assert got[2] == []
    assert got[3] == ["b", "c"]
    assert got[4] is None


def test_array_replace_first(df):
    got = collect(df, ax.array_replace_first(F.col("arr"), F.lit("a"), F.lit("z")))
    assert got[0] == ["z", "b", "a", "c", "b"]
    assert got[3] == ["b", "z", "c"]
    assert got[2] == []
    assert got[4] is None


def test_array_sorted_and_unique(df):
    got = collect(df, ax.array_sorted(F.col("arr")))
    assert got[0] == ["a", "a", "b", "b", "c"]
    got_desc = collect(df, ax.array_sorted(F.col("arr"), reverse=True))
    assert got_desc[0] == ["c", "b", "b", "a", "a"]
    got_u = collect(df, ax.array_unique(F.col("arr")))
    assert got_u[0] == ["a", "b", "c"]  # first-occurrence order
