"""Multimodal plumbing + tokenization operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from frontmatter_mcp_spark.operators import similarity as sim
from frontmatter_mcp_spark.operators import tokenize as tk
from frontmatter_mcp_spark.sources import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s0"),
        (1, "numbers 123 and punctuation!!! don't split wrong", "s1"),
        (2, "short doc", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_synthesize_media_schema_and_types(docs):
    media = mm.synthesize_media(docs, "doc_id", "text", "source")
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    rows = {r.media_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    assert bytes(rows[0].payload).decode() == "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert rows[0].meta.n_bytes == len(bytes(rows[0].payload))


def test_extract_features_deterministic_stub(docs):
    media = mm.synthesize_media(docs, "doc_id", "text", "source")
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    img = feats[0]
    payload = "alpha beta gamma delta epsilon zeta eta theta iota kappa".encode()
    h = hashlib.md5(payload).hexdigest()
    assert img.checksum == h
    assert img.width == 160 + (int(h[0:2], 16) % 12) * 160
    assert img.height == 120 + (int(h[2:4], 16) % 12) * 120
    assert img.duration_s is None
    audio = feats[1]
    assert audio.duration_s == pytest.approx(audio.n_bytes / 16000.0)
    video = feats[2]
    assert video.n_frames >= 1
    assert video.sampled_frames == list(range(0, video.n_frames, 30))


def test_resize_stub_passthrough(docs):
    media = mm.synthesize_media(docs, "doc_id", "text", "source")
    out = mm.resize_images(media, 64, 48).collect()
    assert len(out) == 1  # only the image row
    assert out[0].width == 64 and out[0].height == 48


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "don't!!! 1234 x"), (3, "")], "id int, text string"
    )
    got = {
        r.id: r.n
        for r in df.select("id", tk.bpe_ish_token_count(F.col("text")).alias("n")).collect()
    }
    assert got[1] == 2
    # don't -> 1, !!! -> 1, 1234 -> 123|4 -> 2, x -> 1
    assert got[2] == 5
    assert got[3] == 0


def test_rolling_hash_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], "id int, text string"
    )
    got = {r.id: r.h for r in df.select("id", tk.rolling_hash(F.col("text")).alias("h")).collect()}
    assert got[1] == got[3]
    assert got[1] != got[2]  # order matters, unlike bow_fingerprint
    assert 0 <= got[1] < tk.MOD


def test_window_fingerprints_shift_resistant(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    shifted = "PREFIX " + base  # same 8-token runs, shifted by one
    df = spark.createDataFrame([(1, base), (2, shifted)], "id int, text string")
    fps = df.select("id", F.explode(tk.window_fingerprints(F.col("text"), 8)).alias("fp"))
    a = {r.fp for r in fps.filter("id=1").collect()}
    b = {r.fp for r in fps.filter("id=2").collect()}
    assert a & b  # shared verbatim runs detected despite the shift


def test_hyperplane_lsh_similar_vectors_collide(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),  # nearly identical to 0
        (2, [-1.0, 0.0, 0.0, 0.0]),  # opposite: every bit flips
    ]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", sim.hyperplane_bucket(F.col("v"), dim=4, nbits=4).alias("b")
        ).collect()
    }
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert len(got[0]) == 4 and set(got[0]) <= {"0", "1"}


def test_real_bmp_and_wav_payloads_decode_for_real(spark):
    """The decode/resize stages are no longer stubs for BMP and WAV:
    real payloads built in-test must yield their true dimensions and
    duration through the Spark pipeline, and the resize stage must
    produce a decodable BMP of the requested size with exact
    nearest-neighbor pixels."""
    import numpy as np

    from frontmatter_mcp_spark.sources import multimodal as mm

    img = (np.arange(8 * 6 * 3, dtype=np.uint8) % 251).reshape(8, 6, 3)
    bmp = mm.encode_bmp(img)
    import struct

    sr, ch, bits = 8000, 1, 16
    data = b"\x00\x01" * 2000  # 0.25 s at 16 kB/s
    wav = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + struct.pack("<HHIIHH", 1, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp), (len(bmp), "t")),
            (2, "audio", bytearray(wav), (len(wav), "t")),
        ],
        mm.MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (6, 8)  # true dims
    assert feats[2]["duration_s"] == 0.25  # true RIFF duration

    out = mm.resize_images(media, 3, 4).collect()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (3, 4)
    rimg = mm.decode_bmp(bytes(out[0]["payload"]))
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(3) * 6) // 3
    assert np.array_equal(rimg, img[ys][:, xs])


def test_bpe_merge_steps_exact_loop(spark):
    from frontmatter_mcp_spark.operators.tokenize import bpe_merge_steps

    words = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("aaa", 1)], "w string, wc long"
    )
    rows = sorted(
        bpe_merge_steps(words, "w", "wc", iters=3).collect(), key=lambda r: r.step
    )
    # step 1: 'a b' dominates (3*2 from abab + 2 from ab); both occurrences
    # inside 'abab' merge (the two-pass replace catches the second one)
    assert tuple(rows[0]) == (1, "a b", "ab", 8, 2)
    # step 2: 'ab ab' (count 3) beats 'a a' (count 2)
    assert tuple(rows[1]) == (2, "ab ab", "abab", 3, 3)
    # step 3: only 'a a' remains; the self-overlapping run 'a a a' merges
    # greedily left-to-right to 'aa a'
    assert tuple(rows[2]) == (3, "a a", "aa", 2, 4)


def test_image_ahash_matches_pixel_recipe(spark):
    """The codec round trip must reproduce the aHash computed straight
    from the pixel recipe (no codec) — the local twin of q122's oracle."""
    import hashlib

    import numpy as np

    from frontmatter_mcp_spark.sources.multimodal import synthetic_image_ahash

    docs = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "other text")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in synthetic_image_ahash(df, "doc_id", "text").collect()}

    for doc_id, text in docs:
        hx = "".join(
            hashlib.md5(f"{text}|{k}".encode()).hexdigest() for k in range(12)
        )
        gs = (
            np.frombuffer(bytes.fromhex(hx), dtype=np.uint8)
            .reshape(64, 3)
            .astype(np.int64)
            .sum(axis=1)
        )
        expect = np.packbits((gs * 64 > gs.sum()).astype(np.uint8)).tobytes().hex()
        assert got[doc_id].ahash == expect
        assert (got[doc_id].width, got[doc_id].height) == (8, 8)
    # identical texts -> identical images -> same hash
    assert got[1].ahash == got[2].ahash and got[1].ahash != got[3].ahash


def test_wav_probe_duration_matches_recipe(spark):
    from frontmatter_mcp_spark.sources.multimodal import synthetic_wav_probe

    docs = [(0, "x" * 10), (5, "y" * 33)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in synthetic_wav_probe(df, "doc_id", "text").collect()}
    for doc_id, text in docs:
        rate = 8000 + (doc_id % 8) * 1000
        n = len(text) * 16 + 100
        assert got[doc_id].sample_rate == rate
        assert got[doc_id].n_samples == n
        assert got[doc_id].duration_s == (n * 2) / (rate * 2)


def test_png_codec_round_trip_and_crc():
    import numpy as np

    from frontmatter_mcp_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(8, 8, 3), (6, 1, 3), (1, 7, 3), (11, 4, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        payload = encode_png(img)
        assert (decode_png(payload) == img).all()
    # a flipped payload byte must be caught by the chunk CRC
    corrupt = bytearray(encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
    corrupt[40] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_png(bytes(corrupt))
