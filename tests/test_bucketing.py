"""Bucketed co-located join: the 100 TB shuffle-elimination pattern.

Writing both join sides bucketed by the join key lets Spark plan the join
with NO Exchange on either side — at scale this is the difference between
a full-network shuffle of the fact table and a local merge. This test
proves the engine's bucketing path produces that plan.
"""

from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    facts = spark.range(0, 10_000).selectExpr("id % 100 AS k", "id AS v")
    dims = spark.range(0, 100).selectExpr("id AS k", "concat('name_', id) AS name")
    facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_facts")
    dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bk_dims")
    yield "bk_facts", "bk_dims"
    spark.sql("DROP TABLE IF EXISTS bk_facts")
    spark.sql("DROP TABLE IF EXISTS bk_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    fa, di = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the only shuffle-free strategy is bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(fa).join(spark.table(di), "k")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0  # co-located
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_embeddings_prune_at_source(spark, tmp_path):
    """The IVF scale path: embeddings written partitioned by the coarse
    cell id (label) make a cell probe a partition-pruned read — the
    query never touches the other cells' files."""
    from frontmatter_mcp_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = str(tmp_path / "emb_by_label")
    e.write.partitionBy("label").parquet(out)
    probe = spark.read.parquet(out).filter("label IN (2, 5)")
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "label" in pf  # pruning happens at the file index, not post-scan
    assert probe.count() == e.filter("label IN (2, 5)").count()


def test_unbucketed_join_needs_exchanges(spark, bucketed_tables):
    # control: the same join over plain parquet shuffles both sides
    facts = spark.range(0, 10_000).selectExpr("id % 100 AS k", "id AS v")
    dims = spark.range(0, 100).selectExpr("id AS k", "concat('name_', id) AS name")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = facts.join(dims, "k")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert len(re.findall(r"\(\d+\) Exchange", plan)) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
