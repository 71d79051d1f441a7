"""frontmatter_mcp_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference `kzmshx/frontmatter-mcp` (an MCP server that runs DuckDB SQL
over markdown YAML frontmatter), re-expressed Spark-first:

- the ``files`` table model (glob scan -> frontmatter parse -> all-strings
  normalize -> temp view -> arbitrary SQL) runs on Spark SQL / Catalyst
  instead of an embedded DuckDB (reference: src/frontmatter_mcp/query.py:23-83);
- the mutation tool surface (set/unset + five array operators) keeps the
  reference's warnings/partial-success contract
  (reference: src/frontmatter_mcp/server.py:237-660);
- the semantic-search pillar (embed() UDF, embedding column, cosine
  similarity) becomes a parquet-backed embedding store + pandas_udf
  (reference: src/frontmatter_mcp/semantic/);
- plus scale-out operators a 100 TB training-data pipeline needs:
  dedup (exact/MinHash-LSH/SimHash/n-gram), similarity search, text
  analysis, multimodal plumbing, and Structured Streaming over events.
"""

__version__ = "0.1.0"
