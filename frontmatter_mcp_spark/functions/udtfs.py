"""Python UDTFs (user-defined TABLE functions, Spark 3.5+/4).

The reference exposes exactly one scalar UDF and no UDTFs (SURVEY §2.B);
these demonstrate the table-function extension path a pipeline needs when
one input row fans out to many structured rows — sentence segmentation
for chunked embedding, and key=value property exploding.

UDTFs are row-at-a-time Python — the slow path. They belong in
preparation stages over text columns, never in the relational hot path
(which tests/test_plan_quality.py keeps Python-free).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="sentence: string, n_words: int, idx: int")
class SplitSentences:
    """Segment text into sentences: one output row per sentence."""

    def eval(self, text: str):  # noqa: D102
        for i, s in enumerate(re.split(r"[.!?]+\s*", text or "")):
            s = s.strip()
            if s:
                yield s, len(s.split()), i


@udtf(returnType="key: string, value: string")
class ExplodeKeyValues:
    """Explode 'k1=v1;k2=v2' property strings into (key, value) rows."""

    def eval(self, props: str):  # noqa: D102
        for part in (props or "").split(";"):
            if "=" in part:
                k, _, v = part.partition("=")
                yield k.strip(), v.strip()


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("explode_key_values", ExplodeKeyValues)
