"""Semantic SQL extension (reference: semantic/query.py:11-65).

Adds to the ``files`` surface, exactly as the reference does inside
DuckDB, but Spark-native:

- ``embed(text)`` scalar UDF -> pandas_udf (Arrow-batched; the model
  instance lives executor-local inside the closure);
- ``embedding`` column -> left join against the store snapshot
  (broadcast — the embedding side is one row per file); NULL for
  unindexed paths (tested behavior, reference tests/test_query.py:305-326);
- cosine similarity under the DuckDB names is registered by
  functions.sqlfuncs as pure Catalyst SQL UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from frontmatter_mcp_spark.semantic.model import EmbeddingModel
from frontmatter_mcp_spark.semantic.store import EmbeddingStore


def register_embed_udf(spark: SparkSession, model: EmbeddingModel) -> None:
    """Register ``embed(text) -> array<float>`` (reference's only UDF,
    semantic/query.py:31-39)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return pd.Series(model.encode(list(texts.fillna(""))))

    spark.udf.register("embed", embed)


def attach_embeddings(files_df: DataFrame, store: EmbeddingStore) -> DataFrame:
    """Left-join the embedding column onto the files table (reference's
    ALTER TABLE + UPDATE...FROM, semantic/query.py:42-65). Broadcast the
    embedding side when it fits; unindexed files get NULL."""
    emb = store.read().select("path", F.col("vector").alias("embedding"))
    return files_df.join(F.broadcast(emb), "path", "left")
