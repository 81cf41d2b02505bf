"""Pure-numpy + stdlib-zlib PNG codec (RFC 2083 / W3C PNG spec subset):
8-bit RGB and grayscale, non-interlaced. No image libraries — DEFLATE
comes from python's built-in ``zlib``, everything else is numpy.

Encoder writes filter-0 (None) rows — one vectorized pass. Decoder
handles ALL five standard row filters: None/Sub/Up are fully
vectorized (Sub is a modular cumsum along the pixel stride; Up is one
addition against the prior row); Average and Paeth are inherently
sequential in x (each byte depends on the RECONSTRUCTED left
neighbor), so those rows fall back to a per-byte loop — the same
honest trade the baseline-JPEG codec makes for entropy coding
(``ops/jpeg.py``). Interlaced (Adam7), 16-bit, palette, and alpha
images refuse with a clear error rather than decoding wrongly.

Plugged into ``ops/multimodal.DecodeImage`` for ``image/png`` payloads
— real pixel work end to end, closing the png half of the r2 stub
(the remaining honest stub is video/mp3)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _crc_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """RGB (h, w, 3) or grayscale (h, w) uint8 → PNG bytes (filter 0
    rows, one vectorized hstack + zlib.compress)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_png expects (h, w), (h, w, 1) or (h, w, 3)")
    h, w, c = img.shape
    color_type = 0 if c == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.hstack([np.zeros((h, 1), np.uint8),
                     img.reshape(h, w * c)]).tobytes()
    return (_SIG + _crc_chunk(b"IHDR", ihdr)
            + _crc_chunk(b"IDAT", zlib.compress(raw, level))
            + _crc_chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-row filter bytes; returns (h, stride) uint8."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)  # headroom for mod-256 sums
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, r = int(ftypes[y]), data[y]
        if f == 0:
            rec = r
        elif f == 1:  # Sub: modular cumsum along each byte lane mod bpp
            rec = r.copy()
            # lanes are independent: rec[x] = (rec[x-bpp] + r[x]) % 256
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif f == 2:  # Up
            rec = (r + prior) % 256
        elif f == 3:  # Average — sequential (left is reconstructed)
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (r[x] + (a + prior[x]) // 2) % 256
        elif f == 4:  # Paeth — sequential
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                cc = prior[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
                rec[x] = (r[x] + pred) % 256
        else:
            raise ValueError(f"png: unknown filter type {f} in row {y}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) RGB or (h, w, 1) grayscale uint8. Supports
    8-bit color types 0 (gray) and 2 (RGB), non-interlaced; anything
    else refuses (no wrong pixels)."""
    if buf[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("png: truncated chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2):
        raise ValueError(
            f"png: only 8-bit gray/RGB supported (depth={depth}, "
            f"color_type={color_type}); palette/alpha/16-bit refuse")
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("png: Adam7 interlace not supported")
    c = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if raw.size != h * (stride + 1):
        raise ValueError("png: decompressed size mismatch")
    return _unfilter(raw, h, stride, c).reshape(h, w, c)
