"""as-of join + salted join operator tests, incl. plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators.joins import asof_join, salted_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, "t1"),
            ("A", 20, "t2"),
            ("A", 5, "t0"),  # before any quote
            ("B", 15, "t3"),
        ],
        "sym string, ts long, trade_id string",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 100.0),
            ("A", 10, 101.0),  # equal-ts with trade t1
            ("A", 18, 102.0),
            ("B", 11, 50.0),
        ],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_join_non_strict(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.asof_px
        for r in asof_join(trades, quotes, on="sym", value_cols=["px"]).collect()
    }
    assert out == {"t0": None, "t1": 101.0, "t2": 102.0, "t3": 50.0}


def test_asof_join_strict(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.asof_px
        for r in asof_join(trades, quotes, on="sym", value_cols=["px"], strict=True).collect()
    }
    # strict: the equal-ts quote (ts=10) must NOT be visible to t1
    assert out["t1"] == 100.0
    assert out["t2"] == 102.0


def test_asof_join_single_shuffle(spark, trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="sym", value_cols=["px"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    # union + window: exactly one exchange node (on the key), no join node
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert re.search(r"Arguments: hashpartitioning\(sym", plan)
    assert "Join" not in plan


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1), (3, 2)], "k long, v long"
    )  # key 1 is hot
    dim = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")], "k long, name string")
    plain = {(r.k, r.v, r.name) for r in facts.join(dim, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(facts, dim, "k", num_salts=8).collect()}
    assert salted == plain
    assert len(salted) == 502
