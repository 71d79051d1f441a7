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


def _is_bmp(payload: bytes) -> bool:
    """Strict BMP sniff: magic, full header present, and the declared
    file size matching the payload length — so arbitrary bytes that
    happen to start with 'BM' (e.g. text) never take this branch."""
    return (
        len(payload) >= 54
        and payload[:2] == b"BM"
        and int.from_bytes(payload[2:6], "little") == len(payload)
    )


def decode_bmp(payload: bytes):
    """REAL decode of a 24-bit uncompressed BMP into an (h, w, 3) RGB
    numpy array — pure stdlib+numpy, no codec library needed. Raises
    ValueError on unsupported BMP variants."""
    import numpy as np

    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    off = int.from_bytes(payload[10:14], "little")
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=off
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


def encode_bmp(img) -> bytes:
    """REAL encode of an (h, w, 3) RGB numpy array as a bottom-up
    24-bit BMP (the inverse of decode_bmp, byte-exact round-trip)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data = rows.tobytes()
    size = 54 + len(data)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def _is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 44
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and int.from_bytes(payload[4:8], "little") == len(payload) - 8
    )


def probe_wav_duration(payload: bytes) -> float:
    """REAL duration probe of a PCM WAV from its RIFF header (byte rate
    at offset 28, data chunk scan) — pure stdlib."""
    byte_rate = int.from_bytes(payload[28:32], "little")
    i = 12
    while i + 8 <= len(payload):
        chunk, size = payload[i : i + 4], int.from_bytes(
            payload[i + 4 : i + 8], "little"
        )
        if chunk == b"data":
            return size / byte_rate
        i += 8 + size + (size & 1)
    raise ValueError("WAV without a data chunk")


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Image decode, real-first: 24-bit BMP decodes with the built-in
    pure-numpy codec (no library needed); other formats try PIL (absent
    in this container); the remaining fallback is the DETERMINISTIC
    md5 fake — the clearly-marked stub for payloads with no decodable
    codec."""
    if _is_bmp(payload):
        img = decode_bmp(payload)
        return img.shape[1], img.shape[0]
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
                if _is_wav(data):
                    duration = probe_wav_duration(data)  # real RIFF probe
                else:
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


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit BMP — decode with the
    pure-numpy codec, index-resample, re-encode. Deterministic
    (nearest-neighbor has no filtering choices to diverge on)."""
    import numpy as np

    img = decode_bmp(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_bmp(img[ys][:, xs])


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage, real-first: BMP payloads resize for real
    (pure-numpy nearest-neighbor); other formats use PIL when present;
    the remaining stub passes the payload through with the target
    dimensions recorded so the pipeline shape is exercised end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image  # type: ignore

            def pil_do(data: bytes) -> bytes:
                img = Image.open(io.BytesIO(data)).resize((width, height))
                out = io.BytesIO()
                img.save(out, format="PNG")
                return out.getvalue()

        except ImportError:

            def pil_do(data: bytes) -> bytes:  # deterministic stub
                return data

        def do(data: bytes) -> bytes:
            if _is_bmp(data):
                return resize_bmp(data, width, height)
            return pil_do(data)

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


def synthetic_image_ahash(
    df: DataFrame, id_col: str, text_col: str, codec: str = "bmp", tag: str = ""
) -> DataFrame:
    """REAL-codec image fingerprinting, verifiable without a codec on
    the oracle side: each document's text seeds a deterministic 8x8 RGB
    image (12 chained md5 digests = 192 pixel bytes), which is encoded
    to a REAL 24-bit BMP, decoded back with the built-in codec, and
    average-hashed (64-bit aHash, packbits bit order, hex string).

    Because the pixel recipe is pure hash math, an engine with no image
    stack can compute the EXPECTED aHash directly from the md5 chain —
    so a cross-engine compare certifies the encode->decode path is
    byte-exact (any BGR/stride/flip mistake changes the hash), while
    this side actually runs the codec. Identical texts yield identical
    images, so grouping by aHash is image-level exact dedup.

    Runs as one Arrow-batched mapInPandas stage (no shuffle); the
    aHash share-count is a window over the bounded hash key.
    """
    import pandas as pd

    def run(batches):
        import hashlib

        import numpy as np

        for pdf in batches:
            out_rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hx = "".join(
                    hashlib.md5(f"{text}{tag}|{k}".encode()).hexdigest()
                    for k in range(12)
                )
                img = np.frombuffer(bytes.fromhex(hx), dtype=np.uint8).reshape(8, 8, 3)
                if codec == "png":
                    payload = encode_png(img)
                    dec = decode_png(payload)  # the REAL codec round trip
                else:
                    payload = encode_bmp(img)
                    dec = decode_bmp(payload)  # the REAL codec round trip
                h, w, _ = dec.shape
                gs = dec.astype(np.int64).sum(axis=2).reshape(-1)  # row-major
                bits = (gs * gs.size > gs.sum()).astype(np.uint8)
                ahash = np.packbits(bits).tobytes().hex()
                out_rows.append((doc_id, w, h, ahash))
            yield pd.DataFrame(
                out_rows, columns=[id_col, "width", "height", "ahash"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, width int, height int, ahash string"
    )


def synthetic_wav_probe(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """REAL-parser audio probing, verifiable without an audio stack on
    the oracle side (the q122/aHash discipline for WAV): each document
    seeds a genuine PCM WAV — 16-bit mono, sample rate 8000 + (id%8)*1000,
    (len(text)*16 + 100) samples, plus a LIST chunk of (id%7) bytes
    before the data chunk so the probe's chunk-scan loop (including
    odd-size padding) actually executes — and the duration comes from
    ``probe_wav_duration`` parsing those bytes. The oracle recomputes
    the expected duration from the recipe arithmetic alone, so a parser
    defect (wrong byte-rate offset, broken chunk walk, padding bug)
    breaks the hash compare."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                rate = 8000 + (int(doc_id) % 8) * 1000
                n_samples = len(text) * 16 + 100
                byte_rate = rate * 2
                data = bytes(n_samples * 2)
                lst = bytes(int(doc_id) % 7)
                chunks = (
                    b"fmt " + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little")  # PCM
                    + (1).to_bytes(2, "little")  # mono
                    + rate.to_bytes(4, "little")
                    + byte_rate.to_bytes(4, "little")
                    + (2).to_bytes(2, "little")
                    + (16).to_bytes(2, "little")
                    + b"LIST" + len(lst).to_bytes(4, "little") + lst
                    + (b"\x00" if len(lst) % 2 else b"")  # odd-size pad
                    + b"data" + len(data).to_bytes(4, "little") + data
                )
                payload = (
                    b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
                )
                assert _is_wav(payload)
                rows.append(
                    (doc_id, rate, n_samples, probe_wav_duration(payload))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "n_samples", "duration_s"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, sample_rate int, n_samples int, duration_s double"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def encode_png(img) -> bytes:
    """REAL encode of an (h, w, 3) RGB array as a non-interlaced 8-bit
    truecolor PNG — pure stdlib (zlib for DEFLATE and CRC32). Each
    scanline uses filter type row%5, so every PNG filter (None, Sub,
    Up, Average, Paeth) is exercised on round trips."""
    import struct
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    raw = bytearray()
    prev = bytes(w * 3)
    for r in range(h):
        cur = img[r].reshape(-1).tobytes()
        ft = r % 5
        raw.append(ft)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            pred = (
                0 if ft == 0
                else a if ft == 1
                else b if ft == 2
                else (a + b) // 2 if ft == 3
                else _paeth(a, b, c)
            )
            raw.append((cur[i] - pred) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL decode of a non-interlaced 8-bit truecolor PNG into an
    (h, w, 3) RGB numpy array: chunk walk with CRC verification, DEFLATE
    inflate, and full scanline unfiltering (all five filter types).
    Raises ValueError on other PNG flavors."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, b"", None
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + size
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(f"unsupported PNG: {ihdr}")
    raw = zlib.decompress(idat)
    stride = w * 3
    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            pred = (
                0 if ft == 0
                else a if ft == 1
                else b if ft == 2
                else (a + b) // 2 if ft == 3
                else _paeth(a, b, c)
            )
            cur[i] = (line[i] + pred) & 0xFF
        out += cur
        prev = bytes(cur)
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)


_JPEG_AC_POS = [1, 5, 9, 17, 33, 62]  # zigzag indices; 17->33 and 33->62
# gaps exceed 15 zeros, so ZRL (the 16-zero run symbol) is exercised on
# every document, not just probabilistically


def synthetic_jpeg_coeff_fp(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """REAL-JPEG certification stage (the q122/q123 discipline applied
    to the entropy layer): each document seeds four 8x8 blocks of
    QUANTIZED coefficients from chained md5s (DC + six fixed-position
    ACs per block, everything else zero), the blocks are written as a
    genuine baseline JFIF bytestream (markers, standard Huffman tables,
    DC DPCM across blocks, ZRL runs, 0xFF stuffing) and decoded back by
    the built-in parser; the output fingerprint is the md5 of all 256
    decoded values in zigzag order.

    The coefficient layer of JPEG is bijective, so an oracle with no
    codec derives the expected fingerprint from the md5 recipe alone —
    any defect in Huffman code construction, bit packing, magnitude
    coding, run/EOB logic, DPCM, or stuffing changes a decoded value
    and breaks the hash compare. (The lossy pixel path — float DCT +
    quantization — is certified by unit tests instead; see
    sources/jpeg.py.)"""
    import pandas as pd

    from frontmatter_mcp_spark.sources import jpeg as J

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                blocks = []
                for k in range(4):
                    h = hashlib.md5(f"{text}#jpeg{k}".encode()).hexdigest()
                    zz = [0] * 64
                    zz[0] = int(h[0:2], 16) - 128
                    for j, p in enumerate(_JPEG_AC_POS):
                        zz[p] = int(h[2 + 2 * j : 4 + 2 * j], 16) - 128
                    blocks.append(zz)
                payload = J.encode_jpeg_coeffs(blocks, 16, 16)
                w, hgt, dec = J.decode_jpeg_coeffs(payload)
                flat = [v for blk in dec for v in blk]
                fp = hashlib.md5("|".join(str(v) for v in flat).encode()).hexdigest()
                rows.append(
                    (doc_id, w, hgt, sum(1 for v in flat if v != 0), fp)
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "n_nonzero", "coeff_fp"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, width int, height int, n_nonzero int, coeff_fp string"
    )


def wav_pcm16_samples(payload: bytes) -> tuple[int, list[int]]:
    """REAL PCM decode: walk the RIFF chunks (odd-size padding included)
    to the data chunk and decode little-endian signed 16-bit mono
    samples — the sample-level counterpart of :func:`probe_wav_duration`.
    Pure stdlib."""
    rate = int.from_bytes(payload[24:28], "little")
    i = 12
    while i + 8 <= len(payload):
        chunk = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if chunk == b"data":
            data = payload[i + 8 : i + 8 + size]
            samples = [
                int.from_bytes(data[j : j + 2], "little", signed=True)
                for j in range(0, len(data) - 1, 2)
            ]
            return rate, samples
        i += 8 + size + (size & 1)
    raise ValueError("WAV without a data chunk")


def synthetic_wav_frames(
    df: DataFrame, id_col: str, text_col: str, frame: int = 16
) -> DataFrame:
    """REAL-parser audio FRAME features (the q122/q123 discipline taken
    to the sample level): each document seeds 64 deterministic PCM
    samples (8 chained md5 digests = 128 bytes = 64 little-endian
    signed int16s), written as a genuine mono WAV (LIST chunk before
    data so the chunk walk executes), decoded back with
    :func:`wav_pcm16_samples`, and reduced to per-frame zero-crossing
    counts and exact integer energy — the first two features every
    audio pipeline computes. The oracle recomputes both from the md5
    recipe alone, so a decode defect (byte order, sign, chunk walk,
    padding) breaks the hash compare. One Arrow-batched mapInPandas
    stage, no shuffle."""
    import pandas as pd

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hx = "".join(
                    hashlib.md5(f"{text}|wav{k}".encode()).hexdigest()
                    for k in range(8)
                )
                data = bytes.fromhex(hx)  # 128 bytes = 64 int16 samples
                rate = 8000
                lst = bytes(int(doc_id) % 5)
                chunks = (
                    b"fmt " + (16).to_bytes(4, "little")
                    + (1).to_bytes(2, "little")
                    + (1).to_bytes(2, "little")
                    + rate.to_bytes(4, "little")
                    + (rate * 2).to_bytes(4, "little")
                    + (2).to_bytes(2, "little")
                    + (16).to_bytes(2, "little")
                    + b"LIST" + len(lst).to_bytes(4, "little") + lst
                    + (b"\x00" if len(lst) % 2 else b"")
                    + b"data" + len(data).to_bytes(4, "little") + data
                )
                payload = (
                    b"RIFF"
                    + (4 + len(chunks)).to_bytes(4, "little")
                    + b"WAVE"
                    + chunks
                )
                assert _is_wav(payload)
                _, samples = wav_pcm16_samples(payload)
                for f in range(len(samples) // frame):
                    seg = samples[f * frame : (f + 1) * frame]
                    zcr = sum(
                        1 for a, b in zip(seg, seg[1:]) if (a < 0) != (b < 0)
                    )
                    energy = sum(v * v for v in seg)
                    rows.append((doc_id, f, zcr, energy))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame", "zcr", "energy"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, frame int, zcr int, energy long"
    )


# Integer 8-point DCT-II basis for the perceptual hash: floor(cos(pi*
# (2x+1)u/16) * 2^20) for u in 0..3 (the low-frequency rows pHash
# keeps). Both the worker and the SQL oracle consume these INTEGER
# literals, so libm cos() portability never enters the compare.
_PHASH_POW = 1 << 20
_PHASH_C = [
    [
        __import__("math").floor(
            __import__("math").cos(__import__("math").pi * (2 * x + 1) * u / 16)
            * _PHASH_POW
        )
        for x in range(8)
    ]
    for u in range(4)
]


def synthetic_image_phash(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """REAL-codec perceptual hashing (pHash) — q122's aHash sibling
    that survives brightness shifts: the md5-seeded 8x8 RGB image
    round-trips through the genuine BMP encoder/decoder, grayscale =
    channel sum, then a 4x4 low-frequency INTEGER DCT block (basis
    floored into 2^20 fixed point, products exact BIGINTs), bits =
    coefficient > median of the 15 non-DC coefficients (8th order
    statistic — deterministic), packed as a 16-bit hex hash. The
    oracle recomputes the DCT from the pixel recipe and the same
    integer basis. One Arrow-batched mapInPandas stage."""
    import pandas as pd

    def run(batches):
        import hashlib

        import numpy as np

        C = np.array(_PHASH_C, dtype=np.int64)  # 4x8
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hx = "".join(
                    hashlib.md5(f"{text}|ph|{k}".encode()).hexdigest()
                    for k in range(12)
                )
                img = np.frombuffer(bytes.fromhex(hx), dtype=np.uint8).reshape(
                    8, 8, 3
                )
                payload = encode_bmp(img)
                dec = decode_bmp(payload)  # the REAL codec round trip
                g = dec.astype(np.int64).sum(axis=2)  # 8x8 grayscale
                D = C @ g @ C.T  # 4x4 integer DCT block
                vals = sorted(
                    int(D[u, v])
                    for u in range(4)
                    for v in range(4)
                    if not (u == 0 and v == 0)
                )
                med = vals[7]
                hh = 0
                for u in range(4):
                    for v in range(4):
                        if (u, v) != (0, 0) and int(D[u, v]) > med:
                            hh |= 1 << (15 - (u * 4 + v))
                rows.append((doc_id, f"{hh:04x}"))
            yield pd.DataFrame(rows, columns=[id_col, "phash"])

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, phash string"
    )


def synthetic_video_frame_sample(
    df: DataFrame, id_col: str, text_col: str, every: int = 2, n_frames: int = 4
) -> DataFrame:
    """REAL-container video frame sampling (the q122 discipline for the
    video modality): each document seeds an n_frames-frame "video" —
    a genuine length-prefixed container (magic 'VID0', frame count,
    then [length][24-bit BMP] records) whose frames are md5-seeded 8x8
    images — and the sampler WALKS THE CONTAINER for real: parse the
    header, hop the length prefixes, decode every `every`-th frame
    with the genuine BMP codec, average-hash it. The oracle recomputes
    each sampled frame's expected aHash from the per-frame md5 recipe,
    so a container-walk or codec defect breaks the hash. One
    Arrow-batched mapInPandas stage."""
    import pandas as pd

    def run(batches):
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                frames = []
                for fidx in range(n_frames):
                    hx = "".join(
                        hashlib.md5(
                            f"{text}|vf{fidx}|{k}".encode()
                        ).hexdigest()
                        for k in range(12)
                    )
                    img = np.frombuffer(
                        bytes.fromhex(hx), dtype=np.uint8
                    ).reshape(8, 8, 3)
                    frames.append(encode_bmp(img))
                payload = b"VID0" + n_frames.to_bytes(4, "little") + b"".join(
                    len(f).to_bytes(4, "little") + f for f in frames
                )
                # REAL container walk
                assert payload[:4] == b"VID0"
                nf = int.from_bytes(payload[4:8], "little")
                off = 8
                for fidx in range(nf):
                    ln = int.from_bytes(payload[off : off + 4], "little")
                    frame = payload[off + 4 : off + 4 + ln]
                    off += 4 + ln
                    if fidx % every != 0:
                        continue
                    dec = decode_bmp(frame)  # the REAL codec
                    gs = dec.astype(np.int64).sum(axis=2).reshape(-1)
                    bits = (gs * gs.size > gs.sum()).astype(np.uint8)
                    ahash = np.packbits(bits).tobytes().hex()
                    rows.append((doc_id, fidx, nf, ahash))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "n_frames", "ahash"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, frame_idx int, n_frames int, ahash string"
    )


def synthetic_image_resize_ahash(
    df: DataFrame, id_col: str, text_col: str, out_size: int = 4
) -> DataFrame:
    """REAL resize certification: the md5-seeded 8x8 BMP goes through
    :func:`resize_bmp` (decode -> nearest-neighbor index resample ->
    re-encode) and the RESIZED bytes are decoded and average-hashed.
    Nearest-neighbor picks rows/cols floor(arange(out)*in/out), so the
    oracle recomputes the expected hash from the sampled recipe pixels
    alone — any stride/index/re-encode defect breaks it."""
    import pandas as pd

    def run(batches):
        import hashlib

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                hx = "".join(
                    hashlib.md5(f"{text}|rz|{k}".encode()).hexdigest()
                    for k in range(12)
                )
                img = np.frombuffer(bytes.fromhex(hx), dtype=np.uint8).reshape(
                    8, 8, 3
                )
                resized = resize_bmp(encode_bmp(img), out_size, out_size)
                dec = decode_bmp(resized)
                gs = dec.astype(np.int64).sum(axis=2).reshape(-1)
                bits = (gs * gs.size > gs.sum()).astype(np.uint8)
                ahash = np.packbits(bits).tobytes().hex()
                rows.append((doc_id, out_size, out_size, ahash))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "ahash"]
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, width int, height int, ahash string"
    )
