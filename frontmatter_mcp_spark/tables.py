"""Loaders for the driver's synthetic sf tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under an sf dir.

Scale notes (100 TB design):
- loads are plain ``spark.read.parquet`` scans so Catalyst keeps filter
  pushdown / column pruning / partition pruning;
- the only normalization is events.ts (written as TIMESTAMP(NANOS),
  which Spark reads as long under ``nanosAsLong``) — a narrow map, no
  shuffle;
- ``register_views`` exposes the tables as temp views so arbitrary
  Spark SQL (the engine's passthrough contract, reference query.py:72)
  works against them.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Per-file schema cache (r12, guide §6): schema INFERENCE is ~80% of
# spark.read.parquet's per-call cost (measured 104 ms inferred vs 24 ms
# with an explicit schema on this host — a footer-read job per call),
# and the workload re-opens the same static tables ~700 times per bench
# session. Production pins schemas through a catalog for exactly this
# reason; locally the cache infers once per (path, mtime) and replays
# the explicit schema. Metadata only — every query still scans parquet;
# the mtime key drops the entry if a fixture is ever rewritten.
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}

# Scan partition-count cache (r12, same class as _SCHEMA_CACHE): the
# ensure_parallelism probe below costs ~25-35 ms per call in physical
# planning of the scan (df.rdd forces a QueryExecution.toRdd), and the
# workload probes the same static scans ~140 times per bench session.
# The split count of a parquet scan is a pure function of the file
# layout and the split-planning confs, so it is cached per
# (path, mtime, defaultParallelism, split confs) and replayed. A conf
# change lands in the key, so there is no stale-entry hazard; a wrong
# count could anyway only flip WHETHER a repartition is added, never
# any query result.
_SCAN_PARTS_CACHE: dict[tuple, int] = {}

# sessions (by id) that already had the nanosAsLong conf applied — the
# per-call conf.set was a py4j round trip on every one of ~700
# load_table calls per bench session
_NANOS_SET: set[int] = set()


def _table_schema(spark: SparkSession, path: str):
    key = (path, os.path.getmtime(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one sf table; normalizes events.ts nanos->timestamp_ntz."""
    if id(spark) not in _NANOS_SET:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _NANOS_SET.add(id(spark))
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(_table_schema(spark, path)).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros (truncating), matching how DuckDB/Arrow read
        # TIMESTAMP(NANOS) into microsecond timestamps
        # integer division — ts/1000 in double would lose precision above 2^53
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    # narrow ops (the events withColumn) preserve the scan's split count,
    # so the cache key is valid for the returned DF as a whole
    df._fm_scan_key = (path, os.path.getmtime(path))
    return df


# ---------------------------------------------------------------------------
# ingestion-batch fixture shape (incremental-dedup operators q70/q86)
# ---------------------------------------------------------------------------
# In a production pipeline every document row arrives stamped with the
# ingestion batch that delivered it; the synthetic fixtures are read-only
# and carry no such column, so the loading layer derives a deterministic
# one (md5 hash bucket of doc_id — engine-portable) and serves it WITH the
# table. Consumers split on the column like they would in production,
# instead of re-deriving ad-hoc filters per query.
INGEST_EXISTING_BUCKETS = 900  # of 1000 -> ~90% existing corpus, 10% incoming


def ingest_batch_col(doc_id: Column) -> Column:
    """'existing' | 'incoming' ingestion-batch stamp for a document id."""
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    return F.when(
        hash_bucket(doc_id) < INGEST_EXISTING_BUCKETS, F.lit("existing")
    ).otherwise(F.lit("incoming"))


def ingest_batch_sql(col: str = "doc_id") -> str:
    """The same stamp as ``ingest_batch_col`` in DuckDB-runnable SQL."""
    from frontmatter_mcp_spark.operators.sampling import hash_bucket_sql

    return (
        f"CASE WHEN {hash_bucket_sql(col)} < {INGEST_EXISTING_BUCKETS} "
        "THEN 'existing' ELSE 'incoming' END"
    )


def load_documents_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table with its ``ingest_batch`` column attached —
    the fixture shape incremental operators consume."""
    d = load_table(spark, sf_dir, "documents")
    out = d.withColumn("ingest_batch", ingest_batch_col(F.col("doc_id")))
    out._fm_scan_key = d._fm_scan_key  # narrow op: split count unchanged
    return out


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition to cluster parallelism — but ONLY when the scan
    yields fewer partitions than the cluster has slots.

    CPU-heavy per-row pipelines (tokenize -> shingle -> md5) inherit the
    scan's partitioning. A 100 TB table arrives as thousands of splits and
    this is a no-op; the single-small-file test datasets arrive as ONE
    split (one row group), which would serialize the whole pipeline on one
    core. The repartition keys on the id column, so a following
    groupBy(id) reuses the partitioning instead of adding a shuffle.

    The partition-count probe is driver-side planning overhead, paid per
    call: ``QueryExecution.toRdd`` (the probe) replans the scan each time
    (~20 ms), and the legacy ``df.rdd`` form additionally built the
    javaToPython conversion (~30 ms). For the static sf tables the count
    is replayed from _SCAN_PARTS_CACHE instead (keyed on file mtime plus
    every conf that feeds split planning), probing once per layout.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    scan_key = getattr(df, "_fm_scan_key", None)
    if scan_key is not None:
        conf = df.sparkSession.conf

        def _conf(key: str) -> str:
            try:  # optional confs (minPartitionNum) raise when unset
                return conf.get(key)
            except Exception:
                return ""

        full_key = scan_key + (
            target,
            _conf("spark.sql.files.maxPartitionBytes"),
            _conf("spark.sql.files.openCostInBytes"),
            _conf("spark.sql.files.minPartitionNum"),
        )
        n = _SCAN_PARTS_CACHE.get(full_key)
        if n is None:
            n = df._jdf.queryExecution().toRdd().getNumPartitions()
            _SCAN_PARTS_CACHE[full_key] = n
    else:
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every sf table as a temp view of the same name."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
