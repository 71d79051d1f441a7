"""Parquet-backed embedding store (reference: semantic/cache.py:14-240).

The reference persists embeddings in a DuckDB file DB
``embeddings(path PK, mtime, vector FLOAT[dim])`` plus model metadata;
the Spark-native equivalent is an immutable parquet snapshot + a JSON
sidecar. Upserts rewrite the snapshot atomically (write-new-then-swap),
which also gives the reference's "read-only, never blocks the indexer"
read behavior for free — readers see either the old or the new snapshot.

At 100 TB scale this store is a Delta/Iceberg table and upsert becomes
MERGE; the interface here is shaped so only this module changes.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

STORE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("mtime", T.DoubleType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)


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
    def _recover(self) -> None:
        """Heal the swap's crash window: if a previous process died after
        renaming data_dir aside but before renaming tmp in, the '.old'
        snapshot is still complete — restore it instead of reading empty
        (and instead of letting the stranded dir wedge the next swap)."""
        old = Path(str(self.data_dir) + ".old")
        if not self.data_dir.exists() and old.exists():
            os.replace(old, self.data_dir)

    # -- reads -------------------------------------------------------------
    def read(self) -> DataFrame:
        """Current snapshot; empty (schema-stable) when nothing indexed."""
        self._recover()
        if self.data_dir.exists():
            return self.spark.read.schema(STORE_SCHEMA).parquet(str(self.data_dir))
        return self.spark.createDataFrame([], STORE_SCHEMA)

    def count(self) -> int:
        return self.read().count()

    # -- writes ------------------------------------------------------------
    def _swap_in(self, df: DataFrame) -> None:
        """Atomic-enough snapshot swap that tolerates every leftover
        state a crash can strand: stale '.tmp' (overwritten), stranded
        non-empty '.old' (removed before the rename that would otherwise
        raise ENOTEMPTY and wedge all future swaps), and a missing
        data_dir with a complete '.old' (recovered first). data_dir is
        renamed aside only after tmp is fully written, so the
        no-current-snapshot window is two renames wide and _recover
        closes it."""
        self._recover()
        tmp = str(self.data_dir) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        old = str(self.data_dir) + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if self.data_dir.exists():
            os.replace(self.data_dir, old)
        os.replace(tmp, self.data_dir)
        shutil.rmtree(old, ignore_errors=True)

    def upsert(self, records: DataFrame) -> None:
        """Insert-or-replace by path (reference cache.py:127-141):
        new records win over existing rows with the same path."""
        current = self.read()
        merged = current.join(records.select("path"), "path", "left_anti").unionByName(
            records.select("path", "mtime", "vector")
        )
        self._swap_in(merged)

    def delete(self, paths: list[str]) -> None:
        if not paths:
            return
        current = self.read()
        self._swap_in(current.filter(~F.col("path").isin(paths)))

    def clear(self) -> None:
        shutil.rmtree(self.data_dir, ignore_errors=True)
