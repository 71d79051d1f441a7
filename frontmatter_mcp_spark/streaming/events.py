"""Structured Streaming operators over the events stream.

The reference has no streaming at all (its only async component is a
batch indexer thread, SURVEY §3.4); these are the scale-out extension:
watermarked tumbling / sliding / session windows over an event stream.

Locally the stream is driven from the parquet events table (file source
+ ``processAllAvailable`` makes a streaming query complete synchronously);
on a cluster the same code points at Kafka. Events.ts is written as
TIMESTAMP(NANOS) which Spark reads as long — the explicit schema +
nanos->micros conversion below handles that identically to the batch
loader (tables.load_table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) under nanosAsLong
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with normalized timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source wants a directory; glob-filter to the one table.
    # ts div 1000: integer nanos->micros (double division would lose precision)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts + exact value sums per type."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


def sliding_counts(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide windows)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n"))
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: merge events within `gap` inactivity."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )


def run_stream_to_batch(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming aggregation to completion against the file source
    and return the final result as a batch DataFrame (memory sink,
    complete mode — the local smoke/oracle harness; a cluster deploy uses
    a real sink + append mode with the watermark bounding state)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name)
