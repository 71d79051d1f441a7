"""Pure-numpy/stdlib baseline JPEG (ITU-T T.81) codec — greyscale
sequential DCT, standard Annex K tables.

The reference repo has no media handling at all; this closes the last
"genuinely hard codec" gap flagged in STATUS (BMP and PNG shipped in
round 5): a REAL JFIF bytestream — SOI/APP0/DQT/SOF0/DHT/SOS/EOI
markers, canonical Huffman codes built from the spec's BITS/HUFFVAL
lists, zigzag ordering, DC DPCM prediction, magnitude/ones-complement
value bits, ZRL/EOB run coding, and 0xFF byte stuffing — written and
parsed with no image library.

Two API levels:

- the PIXEL path (``encode_jpeg``/``decode_jpeg``): level shift ->
  8x8 float DCT -> quantization (Annex K table scaled by quality) ->
  entropy coding, and the inverse. Lossy by design, so it is certified
  by unit tests (round-trip PSNR, reference DCT identity), not by the
  cross-engine oracle.
- the COEFFICIENT path (``encode_jpeg_coeffs``/``decode_jpeg_coeffs``):
  enters/exits at the quantized-coefficient layer (zigzag order). This
  layer is BIJECTIVE, which is what makes a hash-exact cross-engine
  certification possible (workload q138): an oracle with no codec can
  derive the expected coefficients from the seeding recipe and any
  defect in the Huffman tables, bit packing, DPCM, run coding, or
  stuffing changes the decoded values.

Only baseline greyscale (one component, no subsampling) is implemented;
that is the honest scope a container without libjpeg can verify, and
the entropy machinery — the hard part — is identical for color scans.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> natural (row-major) index, per T.81 Figure A.6
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K Table K.1 — luminance quantization (natural order)
STD_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3.3.1 — standard DC luminance Huffman spec (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.3.2 — standard AC luminance Huffman spec
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code generation."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # T.81 B.1.1.5: stuff a zero byte
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, length: int) -> int:
        while self._nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("jpeg: unexpected marker in entropy data")
                self.pos += 1  # skip stuffed zero
            self._acc = (self._acc << 8) | byte
            self._nbits += 8
        self._nbits -= length
        return (self._acc >> self._nbits) & ((1 << length) - 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits): T.81 F.1.2.1 — negatives in ones
    complement of the magnitude."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else (v + (1 << size) - 1)
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _encode_block(wr: _BitWriter, zz: list[int], prev_dc: int) -> int:
    size, bits = _magnitude(zz[0] - prev_dc)
    code, length = _DC_CODES[size]
    wr.put(code, length)
    if size:
        wr.put(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL: 16 zeros
            wr.put(code, length)
            run -= 16
        size, bits = _magnitude(zz[i])
        code, length = _AC_CODES[(run << 4) | size]
        wr.put(code, length)
        wr.put(bits, size)
        run = 0
    if last_nz < 63:
        code, length = _AC_CODES[0x00]  # EOB
        wr.put(code, length)
    return zz[0]


def _build_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol for a bit-walking decoder."""
    return {cl: sym for sym, cl in _canonical_codes(bits, vals).items()}


def _decode_symbol(rd: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.read(1)
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _decode_block(rd: _BitReader, dc_tab, ac_tab, prev_dc: int) -> list[int]:
    zz = [0] * 64
    size = _decode_symbol(rd, dc_tab)
    zz[0] = prev_dc + _extend(rd.read(size), size) if size else prev_dc
    i = 1
    while i < 64:
        sym = _decode_symbol(rd, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i > 63:
            raise ValueError("jpeg: AC run past block end")
        zz[i] = _extend(rd.read(size), size)
        i += 1
    return zz


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _headers(width: int, height: int, quant_zz: list[int]) -> bytes:
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(quant_zz))  # DQT, 8-bit, id 0
    out += _seg(
        0xFFC0,  # SOF0: baseline, 8-bit, 1 component, no subsampling
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    return bytes(out)


def encode_jpeg_coeffs(
    blocks: list[list[int]], width: int, height: int
) -> bytes:
    """Real JFIF bytestream from QUANTIZED coefficient blocks (zigzag
    order, raster block order). ``width``/``height`` are the pixel dims
    the stream declares; len(blocks) must equal the MCU count."""
    if len(blocks) != ((height + 7) // 8) * ((width + 7) // 8):
        raise ValueError("jpeg: block count does not match dimensions")
    out = bytearray(_headers(width, height, [int(STD_QUANT[ZIGZAG[i]]) for i in range(64)]))
    wr = _BitWriter()
    prev_dc = 0
    for zz in blocks:
        prev_dc = _encode_block(wr, list(map(int, zz)), prev_dc)
    out += wr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _parse(payload: bytes):
    """Walk markers; return (width, height, quant_zz, dc_tab, ac_tab,
    entropy_bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    width = height = None
    quant: list[int] | None = None
    dc_spec = ac_spec = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:  # EOI
            raise ValueError("jpeg: no scan data")
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xFFDB:
            if body[0] != 0x00:
                raise ValueError("jpeg: only 8-bit quant table 0 supported")
            quant = list(body[1:65])
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("jpeg: only 8-bit greyscale supported")
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("jpeg: only baseline (SOF0) supported")
        elif marker == 0xFFC4:
            cls, tid = body[0] >> 4, body[0] & 0x0F
            bits = list(body[1:17])
            vals = list(body[17 : 17 + sum(bits)])
            if tid == 0 and cls == 0:
                dc_spec = (bits, vals)
            elif tid == 0 and cls == 1:
                ac_spec = (bits, vals)
        elif marker == 0xFFDA:
            scan = payload[pos + ln :]
            end = scan.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("jpeg: missing EOI")
            if None in (width, height) or quant is None or not dc_spec or not ac_spec:
                raise ValueError("jpeg: incomplete headers before SOS")
            return (
                width,
                height,
                quant,
                _build_decode_table(*dc_spec),
                _build_decode_table(*ac_spec),
                scan[:end],
            )
        pos += ln
    raise ValueError("jpeg: no SOS marker")


def decode_jpeg_coeffs(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """(width, height, quantized coefficient blocks in zigzag order) —
    the exact inverse of encode_jpeg_coeffs."""
    width, height, _quant, dc_tab, ac_tab, data = _parse(payload)
    rd = _BitReader(data)
    n_blocks = ((height + 7) // 8) * ((width + 7) // 8)
    blocks = []
    prev_dc = 0
    for _ in range(n_blocks):
        zz = _decode_block(rd, dc_tab, ac_tab, prev_dc)
        prev_dc = zz[0]
        blocks.append(zz)
    return width, height, blocks


# ---------------------------------------------------------------------------
# pixel path: float DCT + quantization on top of the entropy layer
# ---------------------------------------------------------------------------
def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c = np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
            m[k, n] = c * np.cos(np.pi * (2 * n + 1) * k / 16)
    return m


_DCT_M = _dct_matrix()


def _quality_table(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (STD_QUANT * scale + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode a greyscale uint8 image (HxW) as baseline JFIF."""
    if img.ndim == 3:  # accept RGB input: BT.601 luma, the JFIF convention
        img = np.clip(
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2],
            0,
            255,
        ).astype(np.uint8)
    h, w = img.shape
    q = _quality_table(quality)
    qb = q.reshape(8, 8).astype(np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            blk = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _DCT_M @ blk @ _DCT_M.T
            zq = np.round(coef / qb).astype(np.int64).reshape(-1)
            blocks.append([int(zq[ZIGZAG[i]]) for i in range(64)])
    out = bytearray(_headers(w, h, [int(q[ZIGZAG[i]]) for i in range(64)]))
    wr = _BitWriter()
    prev_dc = 0
    for zz in blocks:
        prev_dc = _encode_block(wr, zz, prev_dc)
    out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline greyscale JFIF to a uint8 HxW array."""
    width, height, quant, dc_tab, ac_tab, data = _parse(payload)
    rd = _BitReader(data)
    ph, pw = (height + 7) // 8 * 8, (width + 7) // 8 * 8
    img = np.empty((ph, pw), dtype=np.float64)
    qn = np.empty(64, dtype=np.float64)
    for i in range(64):
        qn[ZIGZAG[i]] = quant[i]
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = _decode_block(rd, dc_tab, ac_tab, prev_dc)
            prev_dc = zz[0]
            nat = np.zeros(64, dtype=np.float64)
            for i in range(64):
                nat[ZIGZAG[i]] = zz[i]
            coef = (nat * qn).reshape(8, 8)
            blk = _DCT_M.T @ coef @ _DCT_M + 128.0
            img[by : by + 8, bx : bx + 8] = blk
    return np.clip(np.round(img[:height, :width]), 0, 255).astype(np.uint8)


def is_jpeg(payload: bytes) -> bool:
    return payload[:3] == b"\xff\xd8\xff"
