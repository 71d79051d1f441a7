"""Streaming operator tests beyond the oracle workload: the custom
stateful operator and distributed mutation path."""

from __future__ import annotations

import pytest

from frontmatter_mcp_spark.engine import FrontmatterEngine
from frontmatter_mcp_spark.files import parse_file
from frontmatter_mcp_spark.streaming import events as ev
from frontmatter_mcp_spark.workload import QUERIES

SF = "/root/testdata/sf0.001"


def test_stateful_counters_match_batch_aggregate(spark):
    got = {
        r.user_id: (r.n_events, r.first_event_id, r.last_event_id)
        for r in QUERIES["q54_stream_stateful_counters"].spark(spark, SF).collect()
    }
    from frontmatter_mcp_spark.tables import load_table
    from pyspark.sql import functions as F

    expect = {
        r.user_id: (r.n, r.lo, r.hi)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        )
        .collect()
    }
    assert got == expect


def test_batch_update_distributed_matches_driver_path(spark, tmp_path):
    for i in range(20):
        (tmp_path / f"f{i:02d}.md").write_text(f"---\nn: {i}\n---\nbody {i}\n")
    (tmp_path / "bad.md").write_text("---\nbroken: [oops\n---\n")
    eng = FrontmatterEngine(spark, tmp_path)
    out = eng.batch_update_distributed("*.md", set={"stage": "done"})
    assert out["updated_count"] == 20
    assert len(out["warnings"]) == 1 and "bad.md" in out["warnings"][0]
    meta = parse_file(tmp_path / "f07.md", tmp_path).metadata
    assert meta == {"n": 7, "stage": "done"}
    # idempotent second run: nothing changes
    out2 = eng.batch_update_distributed("*.md", set={"stage": "done"})
    assert out2["updated_count"] == 0
