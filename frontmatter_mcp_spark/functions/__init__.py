from frontmatter_mcp_spark.functions.sqlfuncs import register_sql_functions
from frontmatter_mcp_spark.functions.vector import cosine_similarity, dot_product, l2_norm

__all__ = [
    "register_sql_functions",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
