"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extraction / resize / frame-sampling stages as
Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, binary columns, UDF signatures, batch
shapes, partitioning — is real and tested; the *decoders* are stubs:
image/audio libraries aren't in this container, so each decode tries the
real library (PIL) and otherwise falls back to a DETERMINISTIC FAKE
derived from the payload's md5. The fake is clearly marked and keeps
every downstream stage testable and oracle-checkable.

At 100 TB: payloads live in parquet binary columns (or object-store URIs
resolved inside the map stage); the feature extraction is a narrow map —
no shuffle — so it scales with executors, and column pruning means
queries that don't touch `payload` never read those bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sampled_frames", T.ArrayType(T.IntegerType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Build a media table from the documents table: the text bytes stand
    in for an encoded payload; media_type cycles deterministically."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Image decode. Real path: PIL (absent in this container). Fake
    path: DETERMINISTIC dimensions from the payload md5 — the marked
    stub for environments without codec libraries."""
    try:
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height
    except ImportError:
        h = hashlib.md5(payload).hexdigest()
        b0, b1 = int(h[0:2], 16), int(h[2:4], 16)
        return 160 + (b0 % 12) * 160, 120 + (b1 % 12) * 120


def _extract_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k.name: [] for k in FEATURES_SCHEMA.fields}
        for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
            data = bytes(payload)
            checksum = hashlib.md5(data).hexdigest()
            width = height = n_frames = None
            duration = None
            frames = None
            if mtype == "image":
                width, height = _decode_image_stub(data)
            elif mtype == "audio":
                # stub: pretend 16 kB/s mono PCM
                duration = len(data) / 16000.0
            elif mtype == "video":
                width, height = _decode_image_stub(data)
                n_frames = 1 + int(checksum[4:6], 16) % 240
                frames = list(range(0, n_frames, 30))  # sample every 30th
            rows["media_id"].append(mid)
            rows["media_type"].append(mtype)
            rows["n_bytes"].append(len(data))
            rows["checksum"].append(checksum)
            rows["width"].append(width)
            rows["height"].append(height)
            rows["duration_s"].append(duration)
            rows["n_frames"].append(n_frames)
            rows["sampled_frames"].append(frames)
        yield pd.DataFrame(rows)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/probe every payload -> typed feature columns. Narrow map
    over Arrow batches; payload bytes never cross a shuffle."""
    return media.select("media_id", "media_type", "payload").mapInPandas(
        _extract_partition, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage. Real path uses PIL; the stub passes the payload
    through with the target dimensions recorded (deterministic no-op
    resize) so the pipeline shape is exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image  # type: ignore

            def do(data: bytes) -> bytes:
                img = Image.open(io.BytesIO(data)).resize((width, height))
                out = io.BytesIO()
                img.save(out, format="PNG")
                return out.getvalue()

        except ImportError:

            def do(data: bytes) -> bytes:  # deterministic stub: passthrough
                return data

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": [do(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("media_type") == "image").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=RESIZED_SCHEMA)
