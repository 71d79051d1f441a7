"""Query registry shared by __spark_entry__, bench.py and the tests."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    name: str
    spark: SparkFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None -> rows-only check
    doc: str = ""


QUERIES: dict[str, Q] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkFn], SparkFn]:
    def wrap(fn: SparkFn) -> SparkFn:
        QUERIES[name] = Q(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap
