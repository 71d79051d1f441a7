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
    from frontmatter_mcp_spark.tables import _table_schema

    path = os.path.join(sf_dir, "documents.parquet")
    batch_schema = _table_schema(spark, path)
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


def neardup_band_hits(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    retention: str = "24 hours",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    prefix_chars: int = 2,
) -> DataFrame:
    """Streaming NEAR-duplicate gate: banded MinHash-LSH state under a
    watermark (the fuzzy counterpart of the exact-fingerprint dedup in
    :func:`unique_content_stats` — q92 catches byte-identical re-posts,
    this catches paraphrases/boilerplate variants AS THEY ARRIVE).

    Per arriving document the MinHash signature (identical definition
    to the batch operators: ``sig_h = min over word-shingles of
    substr(md5('h|'||shingle), 1, 16)``, dedup.py) is computed PER ROW
    in one Arrow-batched ``mapInPandas`` stage — no explode/groupBy,
    because a doc-level aggregation would be a second stateful operator
    the stream cannot chain in front of the keyed state. The batch
    operators stay pure-codegen (explode + map-side MIN aggregation);
    per-row the codegen route would need nested higher-order functions
    (transform/aggregate/zip_with), which are CodegenFallback —
    interpreted per element — and measured 4-7x SLOWER than hashlib in
    an Arrow batch (5.4s vs 0.8s for 5k docs), so Python is the honest
    choice here, as it already is for the state machine itself.
    Signature parity with the batch operator is pinned by a test.

    The signature is banded exactly like batch LSH (bucket = md5 of the
    band's concatenated minhashes). The state is keyed NOT per bucket
    but per SUPER-bucket — (band, first ``prefix_chars`` hex chars of
    the bucket) — and each super-bucket's state row is an owner
    DIRECTORY (bucket -> first-arrived doc id + expiry). Per-bucket
    keying would be the textbook formulation, but nearly every LSH
    bucket holds exactly one document (that is the point of banding),
    and a Python state operator pays per-GROUP overhead: pandas frame
    assembly + state (de)serialization per key. Measured here: ~19k
    singleton groups cost ~10s; 4 x 256 coarse groups amortize the same
    work to ~1s. The directory sharding is the standard state-coarsening
    trade, and ``prefix_chars`` is the shard-count knob a 100 TB deploy
    turns up (3-4 chars) to keep individual state rows small.

    Every arriving row is emitted as (doc_id, band, hit) where hit ==
    "this bucket was already claimed by an earlier doc" — exactly the
    LSH candidate rule (shares >= 1 band bucket with an earlier
    document) evaluated incrementally. Rows inside one micro-batch are
    processed in id order, so the verdict is deterministic and equals
    the batch rule ``doc_id > MIN(doc_id) over its bucket`` whenever
    arrival order follows doc ids (the local harness derives arrival
    from the id; a real feed gets first-arrival-wins, the streaming
    contract).

    State is BOUNDED: with ``ts_col`` each directory entry carries its
    expiry (owner arrival + ``retention``); entries are pruned the
    moment the watermark passes them, and an idle super-bucket whose
    earliest expiry times out is invoked via event-time timeout and
    removes itself once empty — state is O(buckets per retention
    window), not O(corpus); a near-dup of an expired original is
    re-admitted as novel (dedup-within-horizon, the same trade q92
    documents). Without ``ts_col`` state is corpus-bounded
    (local-harness fallback).

    Downstream the caller folds hits per doc (novel iff zero band
    hits). Output schema: (doc_id long, band int, hit boolean).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timed = ts_col is not None
    in_cols = [F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")]
    if timed:
        in_cols.append(F.col(ts_col).alias("__arrival_ts"))
    sig_fields = ", ".join(f"sig_{h} string" for h in range(num_hashes))
    out_schema = "doc_id long, " + sig_fields + (
        ", __arrival_ts timestamp" if timed else ""
    )

    def sign(it):
        for pdf in it:
            rows: list[list] = []
            for idx in range(len(pdf)):
                text = pdf["__text"].iloc[idx]
                sigs = _row_minhash(text, num_hashes, shingle_n)
                if sigs is None:  # fewer than shingle_n tokens: no signal
                    continue
                row = [int(pdf["doc_id"].iloc[idx]), *sigs]
                if timed:
                    row.append(pdf["__arrival_ts"].iloc[idx])
                rows.append(row)
            cols = ["doc_id"] + [f"sig_{h}" for h in range(num_hashes)] + (
                ["__arrival_ts"] if timed else []
            )
            yield pd.DataFrame(rows, columns=cols)

    signed = docs.select(*in_cols).mapInPandas(sign, out_schema)

    rows_per_band = num_hashes // bands
    bucket_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    carry = ["doc_id"] + (["__arrival_ts"] if ts_col is not None else [])
    banded = (
        signed.select(*carry, F.explode(F.array(*bucket_structs)).alias("bb"))
        .select(
            *carry, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        .withColumn("shard", F.substring("bucket", 1, prefix_chars))
    )

    if timed:
        banded = banded.withWatermark("__arrival_ts", retention)
        # event-time timeout needs the retention as milliseconds
        retention_ms = _interval_ms(docs.sparkSession, retention)

    def update(key, pdfs, state: GroupState):
        # directory state: parallel arrays (bucket, owner, expiry-ms)
        if state.exists:
            st_buckets, st_owners, st_exp = state.get
            directory = dict(zip(st_buckets, zip(st_owners, st_exp)))
        else:
            directory = {}
        wm = state.getCurrentWatermarkMs() if timed else 0
        if timed and directory:
            directory = {b: v for b, v in directory.items() if v[1] > wm}
        if timed and state.hasTimedOut:
            # idle shard invoked by its earliest expiry: prune, keep or die
            if directory:
                bs = list(directory)
                state.update(
                    (bs, [directory[b][0] for b in bs], [directory[b][1] for b in bs])
                )
                state.setTimeoutTimestamp(
                    max(min(v[1] for v in directory.values()), wm + 1)
                )
            else:
                state.remove()
            return
        rows = []
        for pdf in pdfs:
            if timed:
                rows.extend(
                    zip(
                        (int(x) for x in pdf["doc_id"]),
                        pdf["bucket"],
                        (int(t.timestamp() * 1000) for t in pdf["__arrival_ts"]),
                    )
                )
            else:
                rows.extend(
                    zip((int(x) for x in pdf["doc_id"]), pdf["bucket"], (0,) * len(pdf))
                )
        rows.sort()  # doc-id order => deterministic first-claim inside a batch
        out_ids, out_hits = [], []
        for did, bucket, arr_ms in rows:
            entry = directory.get(bucket)
            if entry is None:
                directory[bucket] = (did, arr_ms + retention_ms if timed else 0)
                out_ids.append(did)
                out_hits.append(False)
            else:
                out_ids.append(did)
                out_hits.append(True)
        if directory:
            bs = list(directory)
            state.update(
                (bs, [directory[b][0] for b in bs], [directory[b][1] for b in bs])
            )
            if timed:
                # wake at the earliest expiry (clamped past the watermark —
                # Spark rejects timeouts at/behind it) so stale entries are
                # pruned and an empty shard frees its state row
                state.setTimeoutTimestamp(
                    max(min(v[1] for v in directory.values()), wm + 1)
                )
        else:
            state.remove()
        yield pd.DataFrame(
            {"doc_id": out_ids, "band": [int(key[0])] * len(out_ids), "hit": out_hits}
        )

    return banded.groupBy("band", "shard").applyInPandasWithState(
        update,
        outputStructType="doc_id long, band int, hit boolean",
        stateStructType="buckets array<string>, owners array<long>, expires array<long>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if timed
            else GroupStateTimeout.NoTimeout
        ),
    )


def _row_minhash(
    text, num_hashes: int, shingle_n: int
) -> list[str] | None:
    """Driver/worker-side replica of the batch MinHash definition
    (operators.dedup.word_shingles + minhash_signatures): tokens =
    Java-style trim (spaces only) then split on ``\\s+`` — a leading
    non-space separator yields an empty first token, exactly like
    Spark's ``split`` — shingles = distinct space-joined n-grams,
    ``sig_h = min over shingles of md5('h|'||shingle) hex prefix``.
    Returns None when the doc has fewer than ``shingle_n`` tokens
    (the batch explode drops such docs). Parity with the batch
    operator is pinned by tests/test_streaming_ops.py."""
    import hashlib
    import re

    if text is None:
        return None
    # Java \s is ASCII [ \t\n\x0B\f\r]; Python \s also matches unicode
    # whitespace (\xa0 etc.) — spell the class out so a NBSP tokenizes
    # exactly like the JVM operator
    toks = re.split("[ \t\n\x0b\f\r]+", str(text).strip(" "))
    if len(toks) < shingle_n:
        return None
    joined = [" ".join(toks[i : i + shingle_n]) for i in range(len(toks) - shingle_n + 1)]
    shingles = list(dict.fromkeys(joined))
    return [
        min(
            hashlib.md5((f"{h}|" + s).encode("utf-8")).hexdigest()[:16]
            for s in shingles
        )
        for h in range(num_hashes)
    ]


def _interval_ms(spark: SparkSession, interval: str) -> int:
    """Milliseconds in a SQL interval string ('24 hours') — delegated to
    the engine's own interval parser so the two agree."""
    row = spark.sql(
        "SELECT unix_micros(TIMESTAMP '1970-01-01 00:00:00' "
        f"+ INTERVAL '{interval}') AS us"
    ).collect()
    return int(row[0].us // 1000)


def misra_gries_summaries(
    docs: DataFrame,
    k: int = 16,
    shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Streaming Misra-Gries frequent-bigram summaries: per gram-hash
    shard, a bounded (<= k entries) MG summary maintained in
    ``applyInPandasWithState`` — the streaming twin of the batch q259
    operator, and the one sketch family whose summary CONTENTS depend
    on processing order (HLL/CMS/KMV merge order-independently).

    The determinism discipline q259 established for batch extends to
    the stream: within every micro-batch the shard's rows are first
    aggregated to a (gram -> count) histogram and folded into the
    carried summary in GRAM ORDER with the exact weighted insert the
    batch operator and the DuckDB oracle use (bump on match, append
    under capacity, else subtract the (k+1)-entry minimum and drop
    zeros). With a deterministic arrival schedule the whole fold
    sequence — and therefore the summary — is bit-identical across
    engines; under arbitrary re-batching the summary contents may
    differ but the MG guarantee (est <= true <= est + N_shard/(k+1)
    per level) holds for ANY fold sequence, which the q314 bound
    booleans check (and a multi-batch pytest exercises).

    State is bounded BY CONSTRUCTION: <= k (term, count) entries per
    shard regardless of stream length — no watermark needed; this is
    the entire point of a mergeable summary at 100 TB (the shard count
    spreads the per-key Python state overhead exactly like
    :func:`neardup_band_hits`' super-buckets).

    Emits the full post-fold summary per (shard, micro-batch) tagged
    with the fold ordinal; the caller keeps each shard's max-ordinal
    rows and merges them in (shard, gram) order — the same two-level
    merge as q259, so the merged error budget doubles to 2N/(k+1)
    (Agarwal et al., Mergeable Summaries).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    w = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1),
        lambda x: x != F.lit(""),
    )
    grams = (
        docs.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("w"), i.cast("int")),
                        F.lit(" "),
                        F.element_at(F.col("w"), (i + 1).cast("int")),
                    ),
                )
            ).alias("t")
        )
        .withColumn("shard", hash_bucket(F.col("t"), shards))
    )

    def update(key, pdfs, state: GroupState):
        from collections import Counter

        if state.exists:
            terms, counts, n_folds = state.get
            S = list(zip(terms, counts))
        else:
            S, n_folds = [], 0
        hist: Counter = Counter()
        for pdf in pdfs:
            hist.update(pdf["t"])
        for t in sorted(hist):  # pinned fold order inside the batch
            c = int(hist[t])
            for i, (st, sc) in enumerate(S):
                if st == t:
                    S[i] = (st, sc + c)
                    break
            else:
                S.append((t, c))
                if len(S) > k:
                    delta = min(sc for _, sc in S)
                    S = [(st, sc - delta) for st, sc in S if sc - delta > 0]
        n_folds += 1
        state.update(
            ([t for t, _ in S], [int(c) for _, c in S], n_folds)
        )
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(S),
                "n_folds": [n_folds] * len(S),
                "t": [t for t, _ in S],
                "c": [int(c) for _, c in S],
            }
        )

    return grams.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard int, n_folds long, t string, c long",
        stateStructType="terms array<string>, counts array<long>, n_folds long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def misra_gries_windowed(
    df: DataFrame,
    ts_col: str = "ts",
    item_col: str = "user_id",
    k: int = 16,
    shards: int = 4,
    retention: str = "1 day",
) -> DataFrame:
    """Windowed streaming Misra-Gries: per (event-time DAY, item-hash
    shard) a bounded (<= k entries) MG summary in
    ``applyInPandasWithState`` — :func:`misra_gries_summaries` with a
    time axis, which is what turns the sketch into a live heavy-hitter
    DASHBOARD (per-day heads, diffable day-over-day at O(k) cost).

    State is <= k entries per open (day, shard) AND bounded in the
    window dimension: the watermark on the day column arms an
    event-time timeout at day end + retention, after which a closed
    window's state row removes itself (its final summary was already
    emitted with the max fold ordinal). Fold order is pinned in item
    order per micro-batch (ADR-0004); under the harness's
    deterministic single-batch arrival each (day, shard) fold equals
    the batch histogram fold the oracle replays.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    retention_ms = _interval_ms(df.sparkSession, retention)
    rows = (
        df.select(
            F.date_trunc("day", F.col(ts_col).cast("timestamp")).alias("win"),
            F.col(item_col).cast("string").alias("t"),
        )
        .withColumn("shard", hash_bucket(F.col("t"), shards))
        .withWatermark("win", retention)
    )

    def update(key, pdfs, state: GroupState):
        from collections import Counter

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            terms, counts, n_folds = state.get
            S = list(zip(terms, counts))
        else:
            S, n_folds = [], 0
        hist: Counter = Counter()
        for pdf in pdfs:
            hist.update(pdf["t"])
        for t in sorted(hist):
            c = int(hist[t])
            for i, (st, sc) in enumerate(S):
                if st == t:
                    S[i] = (st, sc + c)
                    break
            else:
                S.append((t, c))
                if len(S) > k:
                    delta = min(sc for _, sc in S)
                    S = [(st, sc - delta) for st, sc in S if sc - delta > 0]
        n_folds += 1
        state.update(([t for t, _ in S], [int(c) for _, c in S], n_folds))
        win_ms = int(key[0].timestamp() * 1000)
        wm = state.getCurrentWatermarkMs()
        # day end + retention, clamped past the watermark (Spark rejects
        # timers at/behind it)
        state.setTimeoutTimestamp(
            max(win_ms + 86_400_000 + retention_ms, wm + 1)
        )
        yield pd.DataFrame(
            {
                "win": [key[0]] * len(S),
                "shard": [int(key[1])] * len(S),
                "n_folds": [n_folds] * len(S),
                "t": [t for t, _ in S],
                "c": [int(c) for _, c in S],
            }
        )

    return rows.groupBy("win", "shard").applyInPandasWithState(
        update,
        outputStructType="win timestamp, shard int, n_folds long, t string, c long",
        stateStructType="terms array<string>, counts array<long>, n_folds long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
