"""Pure-numpy baseline-sequential JPEG (JFIF) codec — no codec libraries.

Closes the last honest stub in :mod:`raysketch.ops.multimodal`: the
container has no libjpeg/PIL, so ``DecodeImage(real=True)`` previously
raised ``NotImplementedError`` for ``image/jpeg``. This module implements
the baseline-sequential subset of ITU-T T.81 (the public JPEG standard)
from the spec:

- **Encoder** (:func:`encode_jpeg`): RGB → JFIF bytes. 4:4:4 sampling
  (every baseline decoder must accept it), Annex K quantization tables
  scaled by the usual IJG quality curve, Annex K "typical" Huffman
  tables, byte-stuffed entropy stream. Exists so tests and the media
  synthesizer can produce *genuine* JPEG payloads deterministically.
- **Decoder** (:func:`decode_jpeg`): JFIF/EXIF bytes → uint8 (h, w, 3).
  Marker parse (DQT/DHT/SOF0/DRI/SOS, APPn skipped), canonical Huffman
  decode, dequantize + dezigzag, vectorized 8×8 IDCT (one einsum over
  all blocks per component), sampling-factor upsample (4:4:4, 4:2:2,
  4:2:0), YCbCr → RGB. Restart markers honored. Progressive (SOF2),
  arithmetic coding and 12-bit precision raise ``NotImplementedError``
  (they are outside baseline).

Scale note: decode cost is per-payload and embarrassingly parallel —
the multimodal actor-pool stages call this per row inside
``map_batches``; the DCT/IDCT and color transforms are numpy-vectorized
over all 8×8 blocks of an image at once, only the entropy (Huffman)
layer is a Python loop, bounded by the number of nonzero coefficients.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# constants from the public JPEG standard (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTABLE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8-point DCT-II basis (orthonormal): B[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_X = np.arange(8)
_DCT_BASIS = np.cos((2 * _X[None, :] + 1) * _X[:, None] * np.pi / 16) / 2.0
_DCT_BASIS[0, :] /= np.sqrt(2.0)


def _blocks_dct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT coefficients (type-II, ortho)."""
    return np.einsum("ux,nxy,vy->nuv", _DCT_BASIS, blocks, _DCT_BASIS,
                     optimize=True)


def _blocks_idct(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients → (n, 8, 8) spatial (inverse, ortho)."""
    return np.einsum("ux,nuv,vy->nxy", _DCT_BASIS, coef, _DCT_BASIS,
                     optimize=True)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the common IJG quality curve (public)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    ql = np.clip((QTABLE_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QTABLE_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical construction."""
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


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol — inverse of :func:`_build_codes`."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (category/size, size-bit payload)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    payload = v if v > 0 else v + (1 << size) - 1
    return size, payload


def _extend(payload: int, size: int) -> int:
    """Inverse magnitude coding (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if payload < (1 << (size - 1)):
        return payload - (1 << size) + 1
    return payload


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment with byte-unstuffing; stops at any
    non-RST marker (leaves position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                raise _AtMarker()
            else:
                raise _AtMarker()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Discard bits to the byte boundary and consume one RSTn."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _AtMarker(Exception):
    pass


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Padded float plane → (by, bx, 64) quantized zigzag coefficients."""
    ph, pw = plane.shape
    blocks = (plane.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coef = _blocks_dct(blocks)
    zz = np.rint(coef / q.reshape(8, 8).astype(np.float64))
    return zz.astype(np.int64).reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]


def _write_block(bw: _BitWriter, blk: np.ndarray, pred: list[int], c: int,
                 dc_tab, ac_tab) -> None:
    diff = int(blk[0]) - pred[c]
    pred[c] = int(blk[0])
    size, payload = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(payload, size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, payload = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(payload, size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(rgb: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB → baseline JFIF bytes (Annex K tables).

    ``subsampling``: ``"444"`` (every component full-resolution) or
    ``"420"`` (chroma 2×2 box-downsampled; MCU = 4 Y + Cb + Cr blocks).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    that many MCUs (resumable entropy stream, the error-recovery feature
    real encoders use)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = rgb.shape[:2]
    ql, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(rgb.astype(np.float64))

    if subsampling == "444":
        hv = [(1, 1), (1, 1), (1, 1)]
        mcu_px = 8
    else:
        hv = [(2, 2), (1, 1), (1, 1)]
        mcu_px = 16
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    comp_q = [ql, qc, qc]
    grids: list[np.ndarray] = []
    for c in range(3):
        plane = padded[..., c]
        if subsampling == "420" and c > 0:
            plane = plane.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        grids.append(_quantize_plane(plane - 128.0, comp_q[c]))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    comp_tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcus_y, mcus_x = ph // mcu_px, pw // mcu_px
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.out = bytearray(bw.flush())  # pad to byte boundary
                bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                pred = [0, 0, 0]
            mcu_count += 1
            for c in range(3):
                hi, vi = hv[c]
                dc_tab, ac_tab = comp_tables[c]
                for by in range(vi):
                    for bx in range(hi):
                        blk = grids[c][my * vi + by, mx * hi + bx]
                        _write_block(bw, blk, pred, c, dc_tab, ac_tab)
    scan = bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    out += _marker(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for c, (cid, tq) in enumerate(((1, 0), (2, 1), (3, 1))):
        sof += bytes([cid, (hv[c][0] << 4) | hv[c][1], tq])
    out += _marker(0xC0, sof)
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    for cls_id, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += _marker(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tabs])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def encode_jpeg_gray(gray: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) luminance → single-component baseline JFIF bytes."""
    if gray.dtype != np.uint8 or gray.ndim != 2:
        raise ValueError("expected uint8 (h, w) grayscale")
    h, w = gray.shape
    ql, _ = _quality_tables(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(gray.astype(np.float64), ((0, ph - h), (0, pw - w)),
                   mode="edge")
    grid = _quantize_plane(plane - 128.0, ql)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = [0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            _write_block(bw, grid[by, bx], pred, 0, dc_l, ac_l)
    scan = bw.flush()

    out = bytearray(b"\xFF\xD8")
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    out += _marker(0xC0, bytes([8]) + h.to_bytes(2, "big")
                   + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += _marker(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
                   + bytes(DC_LUMA_VALS))
    out += _marker(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
                   + bytes(AC_LUMA_VALS))
    out += _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xFF\xD9"
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JFIF/EXIF bytes → uint8 (h, w, 3) RGB.

    Supports 1- or 3-component baseline scans, sampling factors up to
    2×2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, multi-table DQT/DHT
    segments. Progressive (SOF2), arithmetic (SOF9+) and lossless modes
    raise ``NotImplementedError``.
    """
    d = payload
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    try:
        return _decode_markers(d)
    except IndexError:
        raise ValueError("truncated JPEG stream") from None


def _decode_markers(d: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]

    while True:
        if d[pos] != 0xFF:
            raise ValueError("marker expected in JPEG stream")
        tag = d[pos + 1]
        pos += 2
        if tag == 0xD9:  # EOI
            raise ValueError("JPEG stream ended before scan data")
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:
            continue
        seg_len = int.from_bytes(d[pos:pos + 2], "big")
        body = d[pos + 2:pos + seg_len]
        if tag == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                qtables[tq] = tbl.astype(np.int64)[UNZIGZAG]  # natural order
                i += 65
        elif tag == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                htables[tc_th] = _build_decode_table(bits, vals)
                i += 17 + n
        elif tag == 0xC0 or tag == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline-sequential JPEG is supported")
        elif tag == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif tag == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            pos += seg_len
            return _decode_scan(d, pos, frame, scan_tabs, qtables,
                                htables, restart_interval)
        # all other segments (APPn, COM, ...) are skipped
        pos += seg_len


def _decode_scan(d, pos, frame, scan_tabs, qtables, htables,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component coefficient stores, MCU-padded
    planes: list[np.ndarray] = []
    for cid, hi, vi, tq in comps:
        planes.append(np.zeros((mcus_y * vi, mcus_x * hi, 64),
                               dtype=np.float64))

    r = _BitReader(d, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.sync_restart()
                pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_id, ac_id = scan_tabs[cid]
                dc_tab = htables[dc_id]           # class 0
                ac_tab = htables[0x10 | ac_id]    # class 1
                for by in range(vi):
                    for bx in range(hi):
                        blk = _decode_block(r, dc_tab, ac_tab, pred, cid)
                        planes[ci][my * vi + by, mx * hi + bx] = blk

    # dequantize + dezigzag + IDCT per component (vectorized)
    out_comps = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        zz = planes[ci].reshape(-1, 64)
        q = qtables[tq].astype(np.float64)  # natural order
        natural = np.empty_like(zz)
        natural[:, ZIGZAG] = zz             # zigzag index k → natural pos
        coef = (natural * q).reshape(-1, 8, 8)
        spatial = _blocks_idct(coef) + 128.0
        by, bx = planes[ci].shape[:2]
        plane = (spatial.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        # upsample to full resolution if subsampled
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_comps.append(plane[:h, :w])

    if len(out_comps) == 1:
        y = np.clip(out_comps[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(out_comps[:3], axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_block(r, dc_tab, ac_tab, pred, cid) -> np.ndarray:
    blk = np.zeros(64, dtype=np.float64)
    size = _decode_symbol(r, dc_tab)
    diff = _extend(r.read_bits(size), size) if size else 0
    pred[cid] += diff
    blk[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(r.read_bits(size), size)
        k += 1
    return blk
