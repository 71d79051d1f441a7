"""SQL-function registration: the reference's DuckDB-dialect surface.

The reference forwards user SQL verbatim to DuckDB, so queries use DuckDB
names: ``list_contains`` (tests/test_query.py:87-104),
``array_cosine_similarity`` / ``1 - array_cosine_distance``
(README.md:320-333), and ``embed(text)`` (semantic/query.py:31-39).
We register the same names in Spark so those queries run unchanged.

All but ``embed`` are Spark *SQL scalar UDFs* (CREATE FUNCTION ... RETURN
expr, Spark 4) — they inline into the Catalyst plan and stay inside
whole-stage codegen; no Python round-trip, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_COSINE_BODY = """
  aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)
  / (sqrt(aggregate(CAST(a AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x))
     * sqrt(aggregate(CAST(b AS ARRAY<DOUBLE>), 0D, (acc, x) -> acc + x * x)))
"""

_SQL_FUNCTIONS: dict[str, str] = {
    # DuckDB list_* aliases over Spark array builtins
    "list_contains": (
        "CREATE OR REPLACE TEMPORARY FUNCTION list_contains(arr ARRAY<STRING>, v STRING) "
        "RETURNS BOOLEAN RETURN array_contains(arr, v)"
    ),
    "list_has": (
        "CREATE OR REPLACE TEMPORARY FUNCTION list_has(arr ARRAY<STRING>, v STRING) "
        "RETURNS BOOLEAN RETURN array_contains(arr, v)"
    ),
    # (no `len` alias needed: Spark 4 ships `len` natively)
    "array_to_string": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_to_string(arr ARRAY<STRING>, sep STRING) "
        "RETURNS STRING RETURN array_join(arr, sep)"
    ),
    # vector kernels (reference exposes DuckDB VSS names)
    "array_cosine_similarity": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_cosine_similarity(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
        f"RETURNS DOUBLE RETURN {_COSINE_BODY}"
    ),
    "array_cosine_distance": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_cosine_distance(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
        f"RETURNS DOUBLE RETURN 1D - ({_COSINE_BODY})"
    ),
    "array_dot_product": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_dot_product(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
        "RETURNS DOUBLE RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Register the DuckDB-compat scalar functions into the session."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)
