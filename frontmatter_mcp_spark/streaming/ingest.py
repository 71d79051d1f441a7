"""Streaming ingestion gate: per-source dedup + quality monitoring in
one continuous pass over a document stream.

The batch quality gate (workload q88) runs over a finished corpus; an
ingestion pipeline sees documents ARRIVE and wants, per source, the
running count of unique contents and how many of those pass the gate —
without a second pass. This composes two stateful operators in one
streaming query: content-fingerprint dedup in front of a per-source
aggregation.

The dedup state is BOUNDED by a retention watermark on the arrival
timestamp (``dropDuplicatesWithinWatermark``): a fingerprint is
remembered only until the watermark passes its arrival time + the
retention delay, then evicted — on a 100 TB/day feed the state is
O(docs per retention window), not O(corpus). A duplicate arriving
after its original's state expired is re-admitted; that is the
documented contract (dedup-within-horizon), the same trade every
at-scale ingest gate makes. Locally the stream is the parquet
documents table via the file source (processAllAvailable drives it to
completion); on a cluster the same code points at Kafka.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table. Schema comes from a
    driver-side batch footer read (no job), exactly like the events
    stream reader — never hardcode what the writer may change."""
    path = os.path.join(sf_dir, "documents.parquet")
    batch_schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def unique_content_stats(
    docs: DataFrame,
    keep: Column,
    source_col: str = "source",
    text_col: str = "text",
    ts_col: str | None = None,
    retention: str = "24 hours",
) -> DataFrame:
    """Per-source running (n_unique, n_kept) over first-seen contents.

    Dedup key is (source, md5(text)): the keep verdict is a pure
    function of the text, so whichever duplicate arrives first carries
    the same verdict — the output is deterministic even though the
    surviving ROW is not. The fp state lives in the dedup operator; the
    aggregation state is one row per source.

    With ``ts_col`` (an arrival/ingest TimestampType column) the dedup
    runs under a watermark and ``dropDuplicatesWithinWatermark``: state
    per fingerprint is evicted once the watermark passes arrival +
    retention, so it is bounded by the retention window instead of
    growing with the corpus — the form a real deployment must use.
    Without it (no arrival time in the data) the state is corpus-bounded
    and documented as the local-harness fallback.
    """
    if ts_col is not None:
        u = (
            docs.select(
                F.col(source_col).alias("source"),
                F.md5(F.col(text_col)).alias("fp"),
                keep.alias("keep"),
                F.col(ts_col).alias("__arrival_ts"),
            )
            .withWatermark("__arrival_ts", retention)
            .dropDuplicatesWithinWatermark(["source", "fp"])
        )
    else:
        u = docs.select(
            F.col(source_col).alias("source"),
            F.md5(F.col(text_col)).alias("fp"),
            keep.alias("keep"),
        ).dropDuplicates(["source", "fp"])
    return u.groupBy("source").agg(
        F.count("*").cast("int").alias("n_unique"),
        F.sum(F.col("keep").cast("int")).cast("int").alias("n_kept"),
    )
