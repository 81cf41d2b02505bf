"""Pure-numpy PNG codec (ops/png.py): encode/decode round-trip, all
five row filters against a forward-filter reference, grayscale,
refusals, and the DecodeImage integration. No Ray needed."""

import struct
import zlib

import numpy as np
import pytest

from raysketch.ops.png import _SIG, _crc_chunk, decode_png, encode_png


def _img(h=23, w=17, c=3, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c) if c else (h, w)).astype(np.uint8)


def test_roundtrip_rgb_and_gray():
    img = _img()
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)
    g = _img(c=0)
    out = decode_png(encode_png(g))
    np.testing.assert_array_equal(out[:, :, 0], g)
    assert out.shape == (23, 17, 1)


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Reference forward filter per the PNG spec (per-byte python)."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = flat[y]
        out.append(ftype)
        for x in range(stride):
            a = int(row[x - c]) if x >= c else 0
            b = int(prior[x])
            cc = int(flat[y - 1][x - c]) if (x >= c and y >= 1) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else cc)
            out.append((int(row[x]) - pred) % 256)
        prior = row
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_each_filter_type(ftype):
    img = _img(h=9, w=7, seed=ftype + 1)
    ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0)
    raw = _forward_filter(img, ftype)
    buf = (_SIG + _crc_chunk(b"IHDR", ihdr)
           + _crc_chunk(b"IDAT", zlib.compress(raw))
           + _crc_chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(buf), img)


def test_decode_mixed_filters_per_row():
    img = _img(h=10, w=5, seed=9)
    # alternate filter types row by row: re-filter each row independently
    # using the reference, stitching with correct priors
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    for y in range(h):
        ftype = y % 5
        sub = _forward_filter(img[max(0, y - 1):y + 1], ftype)
        # take only the LAST row's filtered bytes (prior row included
        # above so Up/Average/Paeth see the true prior)
        last = sub[-(stride + 1):]
        if y == 0:
            last = sub[:stride + 1]
        out += last
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (_SIG + _crc_chunk(b"IHDR", ihdr)
           + _crc_chunk(b"IDAT", zlib.compress(bytes(out)))
           + _crc_chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(buf), img)


def test_refusals():
    img = _img(h=4, w=4)
    buf = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + bytes(buf[4:]))
    # 16-bit depth refuses
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (_SIG + _crc_chunk(b"IHDR", ihdr)
           + _crc_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _crc_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bad)
    # interlace refuses
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    bad = (_SIG + _crc_chunk(b"IHDR", ihdr)
           + _crc_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _crc_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 2), np.uint8))


def test_decode_image_stage_handles_png():
    from raysketch.ops.multimodal import (MIME_PNG, DecodeImage,
                                          synthesize_media_batch)

    t = synthesize_media_batch(list(range(6)), kind="png")
    assert set(t["mime"].to_pylist()) == {MIME_PNG}
    out = DecodeImage(real=True)(t)
    pix = out["pixels"].to_pylist()
    for row, w, h in zip(pix, t["width"].to_pylist(),
                         t["height"].to_pylist()):
        assert len(row) == w * h * 3
    # png payload decodes to the SAME pixels the ppm path carries
    ppm = synthesize_media_batch(list(range(6)), kind="image")
    ppm_pix = DecodeImage(real=True)(ppm)["pixels"].to_pylist()
    assert pix == ppm_pix  # png is lossless; same synthesized source
