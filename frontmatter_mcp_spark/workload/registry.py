"""Query registry shared by __spark_entry__, bench.py and the tests."""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    name: str
    spark: SparkFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None -> rows-only check
    doc: str = ""


QUERIES: dict[str, Q] = {}

# Persisted inputs shared by several consumers inside one query plan
# (q75/q90/q91). The query builder returns a LAZY DataFrame that the caller
# materializes later, so the builder itself cannot unpersist — instead
# pin() tracks the handle and the NEXT query invocation releases it
# (by then the previous result has been collected). This bounds executor
# storage to one query's working set across a 92-query bench session
# instead of pinning every cached block until the session dies.
_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist df and track it for release at the next query invocation."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    return df


def release_pinned() -> None:
    from frontmatter_mcp_spark.operators.holds import release_held

    while _PINNED:
        _PINNED.pop().unpersist()
    release_held()  # operator-internal checkpoints share the lifecycle


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkFn], SparkFn]:
    def wrap(fn: SparkFn) -> SparkFn:
        @functools.wraps(fn)
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_pinned()
            return fn(spark, sf_dir)

        QUERIES[name] = Q(name=name, spark=run, oracle=oracle, doc=doc)
        return run

    return wrap
