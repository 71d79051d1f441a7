from __future__ import annotations

import tempfile

import pytest

from frontmatter_mcp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="frontmatter_mcp_spark_tests",
        cpus=8,
        shuffle_partitions=8,
        # keep managed tables (bucketing tests) out of the repo tree
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")},
    )
    yield s
