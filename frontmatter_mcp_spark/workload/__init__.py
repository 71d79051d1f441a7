"""The engine's headline workload: named queries with DuckDB oracles.

Each entry is a Spark-first implementation (DataFrame API or Spark SQL
passthrough — both produce the same Catalyst plan) paired with an ANSI-SQL
oracle string that DuckDB runs over the same parquet tables. The driver
hash-compares both sides at sf0.01 (CORRECTNESS gate), and bench.py times
the Spark side at sf0.1.

Determinism conventions (so the value-hash matches across engines):
- double aggregations go through DECIMAL (exact, order-independent) and
  are cast back to DOUBLE — see functions.vector.exact_dot_product;
- every LIMIT has a total-order ORDER BY (unique tiebreaker);
- timestamps are output as formatted strings;
- column names are identical on both sides.
"""

from __future__ import annotations

from frontmatter_mcp_spark.workload.registry import QUERIES, Q

# importing the modules populates QUERIES
from frontmatter_mcp_spark.workload import relational  # noqa: E402,F401
from frontmatter_mcp_spark.workload import datapipe  # noqa: E402,F401
from frontmatter_mcp_spark.workload import streaming  # noqa: E402,F401

__all__ = ["QUERIES", "Q"]
