"""Every workload query must hash-match its DuckDB oracle at sf0.001.

This replicates the driver's CORRECTNESS gate locally (row count, column
names, order-insensitive value comparison).
"""

from __future__ import annotations

import pytest

from frontmatter_mcp_spark.workload import QUERIES
from tests.oracle_check import compare_query, duck_connection

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    if q.oracle is None:
        df = q.spark(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    problems = compare_query(spark, duck, name, q.spark, q.oracle, SF_DIR)
    assert not problems, "\n".join(problems)
