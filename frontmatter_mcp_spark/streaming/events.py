"""Structured Streaming operators over the events stream.

The reference has no streaming at all (its only async component is a
batch indexer thread, SURVEY §3.4); these are the scale-out extension:
watermarked tumbling / sliding / session windows over an event stream.

Locally the stream is driven from the parquet events table (file source
+ ``processAllAvailable`` makes a streaming query complete synchronously);
on a cluster the same code points at Kafka. Events.ts normalization
mirrors the batch loader (tables.load_table) exactly: the stream schema
is taken from a batch footer read of the same file, and the
nanos-as-long -> micros conversion is applied only when the file really
stores TIMESTAMP(NANOS) — hardcoding either representation silently
compresses/expands every event time when the writer changes (that bug
shipped in round 3: ts was timestamp[us], the forced long schema read
micros, and ``div 1000`` collapsed a month of events into 43 minutes).
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with normalized timestamps.

    The schema comes from a driver-side batch footer read (cheap — no
    job) so the stream decodes the file exactly as the batch loader
    does. Production note: on a real deployment pass a pinned schema
    instead of inferring per-start, and point at Kafka.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    from frontmatter_mcp_spark.tables import _table_schema

    batch_schema = _table_schema(spark, path)
    # the file stream source wants a directory; glob-filter to the one table
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        # TIMESTAMP(NANOS) read as long: integer nanos->micros
        # (double division would lose precision above 2^53)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # watermarks demand TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # on ntz); the session tz is pinned to UTC (session.py) so the cast
    # from the file's ntz wall clock is lossless
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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


def stateful_user_counters(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event counters persisted in the state store across
    micro-batches (the arbitrary-state API — what windowed aggregations
    can't express: bespoke per-key state machines).

    Emits (user_id, n_events, first_event_id, last_event_id) on every
    update; integer-only outputs keep the operator deterministic under
    any batch/arrival order.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, lo, hi = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_lo = int(pdf["event_id"].min())
            batch_hi = int(pdf["event_id"].max())
            lo = batch_lo if lo is None else min(lo, batch_lo)
            hi = batch_hi if hi is None else max(hi, batch_hi)
        state.update((n, lo, hi))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_event_id": [lo],
                "last_event_id": [hi],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, first_event_id long, last_event_id long",
        stateStructType="n long, lo long, hi long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_purchase_interval_join(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks in the preceding `horizon`.

    Both sides carry watermarks and the join condition bounds event time
    on both ends, so Spark can expire buffered state — the canonical
    watermarked interval join. Locally both branches read the same file
    source; on a cluster they'd be two Kafka topics.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""c_user_id = user_id
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {horizon}"""
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id")


@contextlib.contextmanager
def rocksdb_state_store(spark, changelog_checkpointing: bool = False):
    """Run streaming queries under the RocksDB state store provider —
    the production choice when stateful-operator state (dedup
    fingerprints, open windows, join buffers) exceeds executor heap:
    state lives off-heap in a per-partition local RocksDB instead of an
    in-memory map, so a 100 TB/day ingest gate's retention window is
    bounded by local disk, not heap. The provider is picked up at query
    START (per-query, not sticky in the checkpoint), so wrapping the
    harness call is enough. Local default stays the HDFS-backed
    in-memory provider — cheaper for bounded test state.

    ``changelog_checkpointing=True`` additionally turns on RocksDB
    changelog checkpointing: each micro-batch uploads only the state
    CHANGES since the last checkpoint instead of a full RocksDB
    snapshot, with periodic snapshots in the background. For a
    long-running deployment with large state this takes checkpoint
    upload off the micro-batch critical path (commit latency stops
    scaling with state size); the cost is a replay chain on restart
    (snapshot + changelogs), bounded by the snapshot interval. The
    setting is per-QUERY and sticky in the checkpoint: a query started
    with it keeps it across restarts (Spark reads the lineage from the
    checkpoint), so flipping it for an existing query requires the
    provider's forward-compat support (Spark 4.x handles both
    directions).

    Every streaming operator here is provider-agnostic by construction;
    tests assert identical results under both providers (and under
    changelog checkpointing)."""
    keys = {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
    if changelog_checkpointing:
        keys[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # unset — Spark raises on missing conf
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, prev in old.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)


@contextlib.contextmanager
def _stream_state_partitions(spark, n: int = 8):
    """Stateful streaming spawns one state store per shuffle partition;
    for bounded local key cardinalities the batch-oriented partition
    count just multiplies per-partition overhead. Size it down for the
    stream, restore after. (In production: set once before the first
    run of a query — the count is sticky in the checkpoint.)"""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_stream_to_batch(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming aggregation to completion against the file source
    and return the final result as a batch DataFrame (memory sink,
    complete mode — the local smoke/oracle harness; a cluster deploy uses
    a real sink + append mode with the watermark bounding state)."""
    spark = stream_df.sparkSession
    with _stream_state_partitions(spark):
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


def enriched_segment_counts(
    events: DataFrame, dim: DataFrame, width: str = "1 hour"
) -> DataFrame:
    """Stream-STATIC enrichment: join each event against a broadcast
    dimension table (stateless — no watermark or join state involved;
    the static side is planned like any batch broadcast), then a
    watermarked tumbling aggregation per (window, dimension attribute).
    This is the standard production shape for attaching slowly-changing
    reference data (user segment, device class, geo) to a stream before
    aggregating; at 100 TB/day the dimension broadcast is what keeps the
    join off the shuffle path. ``dim`` columns: (user_id, segment).
    """
    enriched = events.join(F.broadcast(dim), "user_id")
    return (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width), "segment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def session_assembly_tws(events: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """Custom session assembly on the Spark 4 ``transformWithState``
    API (StatefulProcessor + ValueState + event-time timers) — the
    successor of ``applyInPandasWithState`` (q54) and the
    arbitrary-payload upgrade over ``session_window`` (q52): the
    per-user state is a typed ValueState row, sessions carry whatever
    payload the fold computes (here first/last event time and count;
    production adds entry/exit pages, funnels, value sums), and an
    event-time TIMER fires after the inactivity gap to evict the closed
    session's state — bounding state to open sessions only.

    ENVIRONMENT NOTE: transformWithState's Python<->JVM state protocol
    needs the ``protobuf`` package, absent from this container — so the
    oracle-gated workload entry (q139) runs :func:`session_assembly`,
    the applyInPandasWithState twin with identical semantics, and this
    variant is exercised by an opt-in test that skips where the
    protocol cannot initialize (the sentence-transformers discipline).
    On a cluster with protobuf this is the preferred API: typed state,
    timers, TTL, and RocksDB-native layout.

    Emission contract: every batch emits a SNAPSHOT row per touched
    session (closed sessions final, the open session in-progress);
    the caller keeps the maximal row per (user, session_start) — the
    same update-mode fold q54 uses, which makes the stream-end result
    equal to batch gap-sessionization regardless of batch boundaries.
    A session is new when ts - prev_ts > gap STRICTLY (q52's rule, so
    the two sessionizers agree to the microsecond).

    Output: (user_id, start_us, last_us, n_events) — integer
    microseconds; the workload formats them for the oracle compare.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = gap_us // 1000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.sess = handle.getValueState(
                "sess", "start long, last long, n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            evs: list[tuple[int, int]] = []
            for pdf in rows:
                ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
                evs.extend(zip(ts_us, (int(e) for e in pdf["event_id"])))
            evs.sort()
            if self.sess.exists():
                start, last, n = self.sess.get()
            else:
                start = last = None
                n = 0
            out = []
            for ts, _eid in evs:
                if last is not None and ts - last > gap_us:
                    out.append((int(key[0]), start, last, n))  # closed
                    start, n = ts, 0
                if start is None:
                    start = ts
                last = ts
                n += 1
            if start is not None:
                self.sess.update((start, last, n))
                out.append((int(key[0]), start, last, n))  # open snapshot
                # evict the open session's state once the watermark
                # passes its gap horizon
                self.handle.registerTimer(last // 1000 + gap_ms)
            yield pd.DataFrame(
                out, columns=["user_id", "start_us", "last_us", "n_events"]
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # only clear if the timer really covers the stored session
            # (a stale timer from an earlier, longer-ago batch may fire
            # after the session was extended)
            if self.sess.exists():
                _start, last, _n = self.sess.get()
                if expiredTimerInfo.getExpiryTimeInMs() >= last // 1000 + gap_ms:
                    self.sess.clear()
            return iter(())

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType="user_id long, start_us long, last_us long, n_events long",
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def session_assembly(events: DataFrame, gap_us: int = 1_800_000_000) -> DataFrame:
    """The ``applyInPandasWithState`` twin of :func:`session_assembly_tws`
    — identical fold, emission contract, and output schema (see that
    docstring); state is the same (start, last, n) triple held as the
    operator's state tuple, evicted via the event-time timeout once the
    watermark passes the open session's gap horizon."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        evs: list[tuple[int, int]] = []
        for pdf in pdfs:
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            evs.extend(zip(ts_us, (int(e) for e in pdf["event_id"])))
        evs.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        for ts, _eid in evs:
            if last is not None and ts - last > gap_us:
                out.append((int(key[0]), start, last, n))  # closed session
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        if start is not None:
            state.update((start, last, n))
            out.append((int(key[0]), start, last, n))  # open-session snapshot
            state.setTimeoutTimestamp(
                max(last // 1000 + gap_us // 1000, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            out, columns=["user_id", "start_us", "last_us", "n_events"]
        )

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, start_us long, last_us long, n_events long",
            stateStructType="start long, last long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
