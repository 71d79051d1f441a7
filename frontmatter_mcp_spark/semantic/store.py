"""Parquet-backed embedding store (reference: semantic/cache.py:14-240).

The reference persists embeddings in a DuckDB file DB
``embeddings(path PK, mtime, vector FLOAT[dim])`` plus model metadata;
the Spark-native equivalent is an immutable parquet layout, hash-
bucketed by path::

    store_dir/embeddings.parquet/bucket=NN/part-*.parquet

Upsert/delete are **bucket-incremental**: only the buckets containing
touched paths are rewritten (merge-on-write per bucket), so a refresh
that re-embeds k files rewrites O(k/N_BUCKETS) of the store instead of
all of it — the parquet-native approximation of a Delta/Iceberg MERGE,
and the property that keeps refresh cost flat as the corpus grows.
Bucket membership is a Hive partition (``bucket=NN`` dirs), so the
merge's read of the affected buckets is partition-pruned at the source.

Each bucket directory is replaced via a write-aside swap that tolerates
every crash-strandable state (stale staging, stranded ``.old``, missing
dir with complete ``.old``); readers see each bucket either old or new.
Cross-bucket atomicity is deliberately NOT promised (the reference's
single-file DB transaction has it; a real lakehouse table format would
restore it) — a reader during a multi-bucket refresh may see bucket A
new and bucket B old, which the indexer's mtime reconciliation already
tolerates.

The bucket id is the first 4 md5 hex digits of the path mod N_BUCKETS —
engine-portable and stable across Spark versions (no reliance on
internal hash functions).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

STORE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("mtime", T.DoubleType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

READ_SCHEMA = T.StructType(
    list(STORE_SCHEMA.fields) + [T.StructField("bucket", T.IntegerType(), True)]
)

N_BUCKETS = 64


def path_bucket(col: Column) -> Column:
    """Stable, engine-portable bucket id for a path."""
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int") % N_BUCKETS


class EmbeddingStore:
    def __init__(self, spark: SparkSession, store_dir: str | Path, model_name: str, dim: int) -> None:
        self.spark = spark
        self.store_dir = Path(store_dir)
        self.data_dir = self.store_dir / "embeddings.parquet"
        self.meta_path = self.store_dir / "metadata.json"
        self.model_name = model_name
        self.dim = dim
        self.store_dir.mkdir(parents=True, exist_ok=True)
        self._check_model_metadata()

    # -- model-change invalidation (reference cache.py metadata tables) ----
    def _check_model_metadata(self) -> None:
        if self.meta_path.exists():
            meta = json.loads(self.meta_path.read_text())
            if meta.get("model") != self.model_name or meta.get("dim") != self.dim:
                self.clear()
        self.meta_path.write_text(json.dumps({"model": self.model_name, "dim": self.dim}))

    # -- crash recovery ----------------------------------------------------
    def _bucket_dir(self, bucket: int) -> Path:
        return self.data_dir / f"bucket={bucket}"

    def _recover(self) -> None:
        """Heal per-bucket swap crash windows: a bucket dir renamed aside
        whose replacement never landed is restored from its complete
        '.old'; an '.old' whose live dir DOES exist is a completed swap's
        leftover and is removed (it would otherwise pollute partition
        discovery and wedge the next swap of that bucket)."""
        if not self.data_dir.exists():
            return
        for old in self.data_dir.glob("bucket=*.old"):
            live = Path(str(old)[: -len(".old")])
            if live.exists():
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.replace(old, live)

    # -- reads -------------------------------------------------------------
    def _read_with_bucket(self) -> DataFrame | None:
        """Snapshot including the bucket partition column, or None when
        the store is empty. Filters on ``bucket`` partition-prune."""
        self._recover()
        if self.data_dir.exists() and any(self.data_dir.glob("bucket=*")):
            return (
                self.spark.read.schema(READ_SCHEMA)
                .option("basePath", str(self.data_dir))
                .parquet(str(self.data_dir))
            )
        return None

    def read(self) -> DataFrame:
        """Current snapshot; empty (schema-stable) when nothing indexed."""
        df = self._read_with_bucket()
        if df is None:
            return self.spark.createDataFrame([], STORE_SCHEMA)
        return df.select("path", "mtime", "vector")

    def count(self) -> int:
        return self.read().count()

    # -- writes ------------------------------------------------------------
    def _affected_buckets(self, paths_df: DataFrame) -> list[int]:
        rows = paths_df.select(path_bucket(F.col("path")).alias("b")).distinct().collect()
        return sorted(r.b for r in rows)

    def _rewrite_buckets(self, merged: DataFrame, buckets: list[int]) -> None:
        """Materialize the merged rows of ``buckets`` to a staging dir
        (partitioned by bucket — the staging write executes the full
        merge plan while the live bucket dirs it reads are untouched),
        then swap each bucket dir in. A bucket with no surviving rows
        ends up absent, which IS its new state."""
        if not buckets:
            return
        staging = Path(str(self.data_dir) + ".staging")
        shutil.rmtree(staging, ignore_errors=True)
        (
            merged.withColumn("bucket", path_bucket(F.col("path")))
            .repartition("bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(str(staging))
        )
        self.data_dir.mkdir(parents=True, exist_ok=True)
        for b in buckets:
            live = self._bucket_dir(b)
            new = staging / f"bucket={b}"
            old = Path(str(live) + ".old")
            shutil.rmtree(old, ignore_errors=True)
            if live.exists():
                os.replace(live, old)
            if new.exists():
                os.replace(new, live)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)

    def upsert(self, records: DataFrame) -> None:
        """Insert-or-replace by path (reference cache.py:127-141): new
        records win over existing rows with the same path. Only the hash
        buckets containing the new paths are read and rewritten."""
        records = records.select("path", "mtime", "vector")
        buckets = self._affected_buckets(records)
        if not buckets:
            return
        current = self._read_with_bucket()
        if current is None:
            merged = records
        else:
            touched = current.filter(F.col("bucket").isin(buckets)).select(
                "path", "mtime", "vector"
            )
            merged = touched.join(
                records.select("path"), "path", "left_anti"
            ).unionByName(records)
        self._rewrite_buckets(merged, buckets)

    def delete(self, paths: list[str]) -> None:
        if not paths:
            return
        current = self._read_with_bucket()
        if current is None:
            return
        paths_df = self.spark.createDataFrame([(p,) for p in paths], "path string")
        buckets = self._affected_buckets(paths_df)
        survivors = (
            current.filter(F.col("bucket").isin(buckets))
            .select("path", "mtime", "vector")
            .filter(~F.col("path").isin(paths))
        )
        self._rewrite_buckets(survivors, buckets)

    def clear(self) -> None:
        shutil.rmtree(self.data_dir, ignore_errors=True)
        shutil.rmtree(str(self.data_dir) + ".staging", ignore_errors=True)
