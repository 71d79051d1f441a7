"""`frontmatter` Python DataSource: the vault as a first-class Spark source.

Spark 4's Python DataSource API (pyspark.sql.datasource) lets the
markdown-with-frontmatter vault plug into the normal reader path:

    spark.dataSource.register(FrontmatterDataSource)
    df = (spark.read.format("frontmatter")
          .option("glob", "**/*.md")
          .load("/path/to/vault"))

Mirrors the reference's scan semantics (glob scan server.py:32-36,
parse files.py:52-67, all-strings normalization query.py:10-20, union
schema query.py:41-43, relative `path` column ADR-0007) but as a real
source: the driver only LISTS paths and infers the key-union schema;
file content I/O and YAML parsing happen executor-side, one input
partition per path chunk, so the scan parallelizes like any other
Spark source. Arrow-batched output (RecordBatch per chunk) keeps rows
columnar end to end.

Compared to sources/markdown.files_dataframe (the mapInPandas pipeline
the engine uses), this source trades the engine's snapshot cache for
standard reader ergonomics — `.format()` composability, user-supplied
schemas to skip inference, and catalog registration via
`CREATE TABLE ... USING frontmatter`.
"""

from __future__ import annotations

from pathlib import Path

from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
    WriterCommitMessage,
)

from frontmatter_mcp_spark.files import collect_files, parse_document, serialize_value

_DEFAULT_GLOB = "**/*.md"
_DEFAULT_PARTITIONS = 8


class _PathChunk(InputPartition):
    def __init__(self, base_dir: str, paths: list[str]):
        self.base_dir = base_dir
        self.paths = paths


class FrontmatterDataSource(DataSource):
    """DataSource entry point; options: `glob` (default `**/*.md`),
    `numPartitions` (default 8), `includeBody` ('true'/'false'),
    `sampleFiles` (schema-inference cap, default 1000 — pass an explicit
    schema to `.schema(...)` to skip inference entirely at scale)."""

    @classmethod
    def name(cls) -> str:
        return "frontmatter"

    def schema(self) -> T.StructType:
        base = Path(self.options["path"])
        glob = self.options.get("glob", _DEFAULT_GLOB)
        cap = int(self.options.get("sampleFiles", "1000"))
        keys: set[str] = set()
        for p in collect_files(base, glob)[:cap]:
            try:
                parsed = parse_document(p.read_text(encoding="utf-8"))
                keys.update(parsed["metadata"].keys())
            except Exception:
                continue  # unreadable files surface as _error rows at read time
        fields = [T.StructField("path", T.StringType(), False)]
        fields += [T.StructField(k, T.StringType(), True) for k in sorted(keys)]
        fields.append(T.StructField("_mtime", T.DoubleType(), True))
        if self.options.get("includeBody", "false").lower() == "true":
            fields.append(T.StructField("_body", T.StringType(), True))
        fields.append(T.StructField("_error", T.StringType(), True))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return FrontmatterReader(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType) -> "FrontmatterStreamReader":
        return FrontmatterStreamReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> "FrontmatterWriter":
        return FrontmatterWriter(self.options, schema, overwrite)


class FrontmatterReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        if "path" not in options:
            raise ValueError(
                "frontmatter: 'path' option is required. Persistent catalog "
                "tables (CREATE TABLE ... USING frontmatter) do not forward "
                "OPTIONS to the scan in Spark's Python DataSource API — use "
                "CREATE TEMPORARY VIEW ... USING frontmatter OPTIONS "
                "(path '...') or spark.read.format('frontmatter') instead."
            )
        self.base_dir = options["path"]
        self.glob = options.get("glob", _DEFAULT_GLOB)
        self.num_partitions = int(options.get("numPartitions", str(_DEFAULT_PARTITIONS)))
        self.schema = schema
        self.path_filters: list = []
        self.mtime_filters: list = []

    def pushFilters(self, filters):
        """Filter pushdown (Spark 4.1 Python DataSource API): predicates
        on `path` prune the FILE LISTING before any I/O (the dominant
        scan cost is read+YAML-parse per file, so skipping a file is the
        whole win), and range predicates on `_mtime` are applied from
        the stat alone, before the file is opened — the
        changed-since-X incremental-scan shape. Everything else stays
        with Spark. Accepted filters are fully enforced by the source
        (Spark drops them from the post-scan plan)."""
        for f in filters:
            if isinstance(
                f, (EqualTo, In, StringStartsWith, StringContains, StringEndsWith)
            ) and f.attribute == ("path",):
                self.path_filters.append(f)
            elif isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and f.attribute == ("_mtime",):
                self.mtime_filters.append(f)
            else:
                yield f

    def _path_ok(self, rel: str) -> bool:
        for f in self.path_filters:
            if isinstance(f, EqualTo):
                if rel != f.value:
                    return False
            elif isinstance(f, In):
                if rel not in f.value:
                    return False
            elif isinstance(f, StringStartsWith):
                if not rel.startswith(f.value):
                    return False
            elif isinstance(f, StringContains):
                if f.value not in rel:
                    return False
            elif isinstance(f, StringEndsWith):
                if not rel.endswith(f.value):
                    return False
        return True

    def _mtime_ok(self, mtime: float | None) -> bool:
        if mtime is None:  # SQL semantics: NULL fails every comparison
            return not self.mtime_filters
        for f in self.mtime_filters:
            if isinstance(f, EqualTo):
                if mtime != f.value:
                    return False
            elif isinstance(f, GreaterThan):
                if not mtime > f.value:
                    return False
            elif isinstance(f, GreaterThanOrEqual):
                if not mtime >= f.value:
                    return False
            elif isinstance(f, LessThan):
                if not mtime < f.value:
                    return False
            elif isinstance(f, LessThanOrEqual):
                if not mtime <= f.value:
                    return False
        return True

    def partitions(self) -> list[_PathChunk]:
        base = Path(self.base_dir)
        paths = [
            str(p)
            for p in collect_files(base, self.glob)
            if self._path_ok(p.relative_to(base).as_posix())
        ]
        n = max(1, min(self.num_partitions, len(paths) or 1))
        # strided chunks over the sorted listing: deterministic
        # path->partition mapping (idempotent task retries) and balanced
        # sizes without knowing file sizes
        chunks = [paths[i::n] for i in range(n)]
        return [_PathChunk(self.base_dir, c) for c in chunks if c]

    def read(self, partition: _PathChunk):
        base = Path(partition.base_dir)
        cols = [f.name for f in self.schema.fields]
        want_body = "_body" in cols
        for path_str in partition.paths:
            p = Path(path_str)
            rel = p.relative_to(base).as_posix()
            mtime = None
            record: dict[str, object] = {}
            body = None
            error = None
            try:
                mtime = p.stat().st_mtime
                if not self._mtime_ok(mtime):
                    continue  # pushed mtime filter: pruned before open
                parsed = parse_document(p.read_text(encoding="utf-8"))
                record = parsed["metadata"]
                body = parsed["body"]
            except Exception as exc:  # the reference's warnings-not-errors contract
                if not self._mtime_ok(mtime):
                    continue  # NULL mtime fails any pushed comparison
                error = f"{rel}: {exc}"
            row = []
            for c in cols:
                if c == "path":
                    row.append(rel)
                elif c == "_mtime":
                    row.append(mtime)
                elif c == "_body":
                    row.append(body if want_body else None)
                elif c == "_error":
                    row.append(error)
                else:
                    row.append(serialize_value(record.get(c)))
            yield tuple(row)


class FrontmatterStreamReader(SimpleDataSourceStreamReader):
    """Vault-watch micro-batch source: each batch emits the files whose
    mtime advanced past the last committed offset — the reference's
    differential indexer (semantic/indexer.py:97-132, diff vs cached
    mtimes) recast as a Structured Streaming source:

        spark.readStream.format("frontmatter").load(vault)

    The offset is `{"watermark": <max mtime emitted>, "boundary":
    [relative paths emitted at exactly that mtime]}`. A bare max-mtime
    watermark is ambiguous at filesystem mtime granularity: with
    strictly-greater a file created in the same tick as the watermark is
    missed forever, with greater-or-equal every boundary file re-emits
    each batch (the round-2/3 flake). The boundary set resolves the tie
    exactly — a file at the watermark emits only if it is not already in
    the boundary — and stays bounded by the number of files sharing one
    mtime tick, unlike a full per-path offset map which would grow the
    checkpointed offset with vault size. A file edit bumps its mtime
    above the watermark so it re-emits (the stale-path rule of
    cache.py:160-177). Listing runs on the driver per micro-batch —
    cheap relative to parse — and rows carry the same schema as the
    batch reader. Deletions, which the indexer handles via the cache
    diff, are out of scope for an append-only stream; downstream dedup
    by (path, _mtime) keeps the latest version.
    """

    def __init__(self, options, schema: T.StructType):
        self.base_dir = options["path"]
        self.glob = options.get("glob", _DEFAULT_GLOB)
        self.schema_cols = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"watermark": 0.0, "boundary": []}

    def _rel(self, p: Path) -> str:
        return p.relative_to(Path(self.base_dir)).as_posix()

    def _snapshot(self, start: dict):
        """Files newer than `start`, plus the advanced offset."""
        w = start["watermark"]
        seen = set(start.get("boundary", []))
        out = []
        hi = w
        for p in collect_files(Path(self.base_dir), self.glob):
            m = p.stat().st_mtime
            if m > w or (m == w and self._rel(p) not in seen):
                out.append((p, m))
                hi = max(hi, m)
        boundary = sorted(self._rel(p) for p, m in out if m == hi)
        if hi == w:
            boundary = sorted(set(boundary) | seen)
        return out, {"watermark": hi, "boundary": boundary}

    def _rows(self, files):
        chunk = _PathChunk(self.base_dir, [str(p) for p, _ in files])
        reader = FrontmatterReader(
            {"path": self.base_dir, "glob": self.glob},
            T.StructType(_batch_like_schema(self.schema_cols)),
        )
        # materialized: Spark replays/copies the prefetched entries, so the
        # return value must be a picklable sequence, not a generator
        return list(reader.read(chunk))

    def read(self, start: dict):
        files, end = self._snapshot(start)
        return iter(self._rows(files)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files, _ = self._snapshot(start)
        w_end = end["watermark"]
        end_boundary = set(end.get("boundary", []))
        files = [
            (p, m)
            for p, m in files
            if m < w_end or (m == w_end and self._rel(p) in end_boundary)
        ]
        return iter(self._rows(files))

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _WriteDone(WriterCommitMessage):
    n_files: int


class FrontmatterWriter(DataSourceWriter):
    """Distributed markdown write-back: `df.write.format("frontmatter")
    .mode("overwrite"|"append").save(vault_dir)`.

    Each row becomes one markdown file: `path` (required, relative,
    escape-checked) names the file, `_body` (optional) the content, and
    every other non-null, non-underscore column a frontmatter property.
    JSON-encoded array strings round-trip back to YAML lists, inverting
    the reader's serialization (ADR-0006) — a frontmatter->frontmatter
    copy pipeline is lossless. This is the reference's file-rewrite sink
    (files.py:143-145) as a task-parallel write: each task writes its
    partition's files independently; append mode refuses to clobber.
    """

    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.base_dir = options["path"]
        self.overwrite = overwrite
        self.cols = [f.name for f in schema.fields]
        if "path" not in self.cols:
            raise ValueError("frontmatter writer requires a 'path' column")

    def write(self, iterator):
        import json

        from frontmatter_mcp_spark.files import dump_document, resolve_write_path

        base = Path(self.base_dir)
        base.mkdir(parents=True, exist_ok=True)
        n = 0
        for row in iterator:
            d = row.asDict()
            target = resolve_write_path(base, d["path"])
            if target.exists() and not self.overwrite:
                raise FileExistsError(
                    f"{d['path']} exists; use mode('overwrite') to replace"
                )
            meta = {}
            for k in self.cols:
                if k == "path" or k.startswith("_") or d.get(k) is None:
                    continue
                v = d[k]
                if isinstance(v, str) and v.startswith("[") and v.endswith("]"):
                    try:
                        parsed = json.loads(v)
                        v = parsed if isinstance(parsed, list) else v
                    except ValueError:
                        pass
                meta[k] = v
            body = d.get("_body") or ""
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_text(dump_document(meta, body), encoding="utf-8")
            n += 1
        return _WriteDone(n)

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


def _batch_like_schema(cols: list[str]) -> list[T.StructField]:
    fields = []
    for c in cols:
        if c == "_mtime":
            fields.append(T.StructField(c, T.DoubleType(), True))
        else:
            fields.append(T.StructField(c, T.StringType(), c != "path"))
    return fields


def register(spark) -> None:
    """Idempotent registration of the `frontmatter` format."""
    spark.dataSource.register(FrontmatterDataSource)
