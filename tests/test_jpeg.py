"""Baseline-JPEG codec certification (sources/jpeg.py): the entropy
layer must be bijective (that is what q138's cross-engine hash compare
relies on) and the lossy pixel path must round-trip within quality
bounds. The reference repo has no media handling; these mirror the
BMP/PNG codec tests (q122/q128 discipline)."""

from __future__ import annotations

import numpy as np
import pytest

from frontmatter_mcp_spark.sources import jpeg as J


def _random_blocks(rng, n_blocks: int, density: int = 20):
    blocks = []
    for _ in range(n_blocks):
        zz = [0] * 64
        zz[0] = int(rng.randint(-255, 256))
        for _ in range(rng.randint(0, density)):
            zz[rng.randint(1, 64)] = int(rng.randint(-255, 256))
        blocks.append(zz)
    return blocks


def test_coeff_layer_is_bijective_over_random_blocks():
    rng = np.random.RandomState(11)
    for trial in range(100):
        nb_w = rng.randint(1, 5)
        nb_h = rng.randint(1, 5)
        blocks = _random_blocks(rng, nb_w * nb_h)
        payload = J.encode_jpeg_coeffs(blocks, nb_w * 8, nb_h * 8)
        assert J.is_jpeg(payload)
        w, h, dec = J.decode_jpeg_coeffs(payload)
        assert (w, h) == (nb_w * 8, nb_h * 8)
        assert dec == blocks, f"trial {trial}"


def test_byte_stuffing_and_zrl_paths_execute():
    """Dense saturated blocks force 0xFF bytes (stuffing) and the q138
    recipe's coefficient spacing forces ZRL (16-zero run) symbols; both
    must decode back exactly."""
    # all-max block: long runs of 1-bits => stuffed 0xFF bytes
    zz = [255] * 64
    zz[0] = 100
    payload = J.encode_jpeg_coeffs([zz], 8, 8)
    entropy = payload[payload.find(b"\xff\xda") :]
    assert b"\xff\x00" in entropy, "no stuffed byte produced"
    assert J.decode_jpeg_coeffs(payload)[2] == [zz]
    # isolated coefficient at zigzag 40: run of 39 zeros => 2 ZRLs
    zz2 = [0] * 64
    zz2[0] = -5
    zz2[40] = 7
    payload2 = J.encode_jpeg_coeffs([zz2], 8, 8)
    assert J.decode_jpeg_coeffs(payload2)[2] == [zz2]


def test_dc_dpcm_prediction_across_blocks():
    blocks = [[0] * 64 for _ in range(4)]
    for i, dc in enumerate([100, -100, 0, 255]):
        blocks[i][0] = dc
    payload = J.encode_jpeg_coeffs(blocks, 32, 8)
    assert [b[0] for b in J.decode_jpeg_coeffs(payload)[2]] == [100, -100, 0, 255]


def test_pixel_round_trip_quality():
    yy, xx = np.mgrid[0:24, 0:40]
    img = ((yy * 6 + xx * 3) % 256).astype(np.uint8)
    for quality, floor in [(95, 40.0), (85, 32.0), (50, 24.0)]:
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=quality))
        assert dec.shape == img.shape
        mse = float(np.mean((dec.astype(float) - img.astype(float)) ** 2))
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        assert psnr > floor, (quality, psnr)
    # higher quality must not be worse
    flat = np.full((8, 8), 77, dtype=np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(flat, 95)), flat)


def test_non_multiple_of_8_dimensions_pad_and_crop():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 21)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert dec.shape == (13, 21)


def test_rgb_input_takes_bt601_luma():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[..., 1] = 200  # pure green
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert abs(int(dec.mean()) - int(0.587 * 200)) <= 2


def test_dct_matrix_is_orthonormal():
    m = J._DCT_M
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_malformed_streams_raise():
    good = J.encode_jpeg_coeffs([[1] + [0] * 63], 8, 8)
    with pytest.raises(ValueError):
        J.decode_jpeg_coeffs(b"\x00\x01" + good[2:])  # no SOI
    with pytest.raises(ValueError):
        J.decode_jpeg_coeffs(good[:-2])  # EOI stripped
    # progressive SOF2 must be rejected, not mis-decoded
    bad = bytearray(good)
    sof = bytes(bad).find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        J.decode_jpeg_coeffs(bytes(bad))


def test_block_count_must_match_dimensions():
    with pytest.raises(ValueError):
        J.encode_jpeg_coeffs([[0] * 64], 16, 16)


def test_cert_recipe_matches_codec(spark):
    """The q138 mapInPandas stage must produce the fingerprint the
    oracle recipe predicts — spot-checked here without DuckDB."""
    import hashlib

    from frontmatter_mcp_spark.sources import multimodal as mm

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_nonzero, r.coeff_fp) for r in
           mm.synthetic_jpeg_coeff_fp(df, "doc_id", "text").collect()}
    for doc_id, text in [(1, "alpha beta"), (2, "")]:
        flat = []
        nz = 0
        for k in range(4):
            h = hashlib.md5(f"{text}#jpeg{k}".encode()).hexdigest()
            zz = [0] * 64
            zz[0] = int(h[0:2], 16) - 128
            for j, p in enumerate(mm._JPEG_AC_POS):
                zz[p] = int(h[2 + 2 * j : 4 + 2 * j], 16) - 128
            nz += sum(1 for v in zz if v != 0)
            flat.extend(zz)
        fp = hashlib.md5("|".join(str(v) for v in flat).encode()).hexdigest()
        assert got[doc_id] == (nz, fp)


def test_coeff_layer_full_baseline_value_range():
    """Baseline JPEG allows AC magnitudes up to 1023 (size 10) and DC
    differences up to +-2047 (category 11); the entropy layer must stay
    bijective at the extremes, not just the q138 recipe's +-127."""
    rng = np.random.RandomState(42)
    for trial in range(50):
        blocks = []
        for _ in range(4):
            zz = [0] * 64
            zz[0] = int(rng.randint(-1024, 1024))
            for _ in range(rng.randint(1, 30)):
                zz[rng.randint(1, 64)] = int(rng.randint(-1023, 1024))
            blocks.append(zz)
        payload = J.encode_jpeg_coeffs(blocks, 16, 16)
        assert J.decode_jpeg_coeffs(payload)[2] == blocks, trial
    # the exact extremes
    zz = [0] * 64
    zz[0] = 1023
    zz[1] = -1023
    zz[63] = 1023
    p2 = J.encode_jpeg_coeffs([zz, [0] * 64], 16, 8)
    assert J.decode_jpeg_coeffs(p2)[2] == [zz, [0] * 64]
