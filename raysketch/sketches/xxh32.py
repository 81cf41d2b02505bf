"""XXH32 — pure-Python scalar and numpy-vectorized implementations.

Implemented from the public xxHash specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
The reference engine hashes count-min-sketch keys with XXH32 seeds 1 and 2
and the Kirsch–Mitzenmacher index formula ``(h1 + i*h2 + i*i) % width``
(reference: library/src/cm_sketch.c:66-78); bit-identical hashes are required
so CMS cell contents can be cross-checked against the reference.

Two entry points:

- ``xxh32(data: bytes, seed: int) -> int`` — scalar, exact, any length.
- ``xxh32_batch(keys, seed)`` — vectorized over a sequence/array of byte
  strings using a padded uint8 matrix; loops over 16-byte stripes (python
  loop length = ceil(maxlen/16), vectorized across all keys per stripe).
  Intended for short keys (tokens, paths, repo names). Falls back to the
  scalar path when maxlen is large enough that the stripe loop would
  dominate.
"""

from __future__ import annotations

import numpy as np

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """Scalar XXH32 of ``data`` with ``seed`` (exact, any length)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while i <= limit:
            lane1 = int.from_bytes(data[i : i + 4], "little")
            lane2 = int.from_bytes(data[i + 4 : i + 8], "little")
            lane3 = int.from_bytes(data[i + 8 : i + 12], "little")
            lane4 = int.from_bytes(data[i + 12 : i + 16], "little")
            v1 = (_rotl((v1 + lane1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + lane2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + lane3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + lane4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        word = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl((h + word * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# Vectorized variant
# ---------------------------------------------------------------------------

def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _pad_matrix(keys) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list/array of bytes objects into (N, maxlen) uint8 + lengths."""
    lens = np.fromiter((len(k) for k in keys), dtype=np.int64, count=len(keys))
    maxlen = int(lens.max()) if len(lens) else 0
    # pad to a multiple of 4 so word reads never run off the end
    pad = ((maxlen + 3) // 4) * 4 + 4
    buf = np.zeros((len(keys), pad), dtype=np.uint8)
    for row, k in enumerate(keys):
        buf[row, : len(k)] = np.frombuffer(k, dtype=np.uint8)
    return buf, lens


def xxh32_batch(keys, seed: int = 0) -> np.ndarray:
    """Vectorized XXH32 over a sequence of ``bytes`` objects.

    Returns uint32 array of hashes, bit-identical to :func:`xxh32`.
    """
    n_keys = len(keys)
    if n_keys == 0:
        return np.zeros(0, dtype=np.uint32)
    buf, lens = _pad_matrix(keys)
    if buf.shape[1] > 4096:
        # long keys: stripe loop would dominate — scalar path is simpler
        return np.fromiter(
            (xxh32(k, seed) for k in keys), dtype=np.uint32, count=n_keys
        )
    with np.errstate(over="ignore"):
        return _xxh32_matrix(buf, lens, seed)


def _xxh32_matrix(buf: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    n = buf.shape[0]
    words = buf.reshape(n, -1, 4).astype(np.uint32)
    # little-endian 32-bit words at every 4-byte offset
    w4 = (
        words[:, :, 0]
        | (words[:, :, 1] << np.uint32(8))
        | (words[:, :, 2] << np.uint32(16))
        | (words[:, :, 3] << np.uint32(24))
    )  # (n, pad/4)
    lens32 = lens.astype(np.uint32)
    P1, P2, P3, P4, P5 = (
        np.uint32(_P1), np.uint32(_P2), np.uint32(_P3), np.uint32(_P4), np.uint32(_P5),
    )
    s = np.uint32(seed & _M32)

    h = np.full(n, (seed + _P5) & _M32, dtype=np.uint32)
    long_mask = lens >= 16
    stripe_pos = np.zeros(n, dtype=np.int64)  # consumed byte offset per key
    if long_mask.any():
        v1 = np.full(n, (seed + _P1 + _P2) & _M32, dtype=np.uint32)
        v2 = np.full(n, (seed + _P2) & _M32, dtype=np.uint32)
        v3 = np.full(n, s, dtype=np.uint32)
        v4 = np.full(n, (seed - _P1) & _M32, dtype=np.uint32)
        max_stripes = int((lens.max()) // 16)
        for j in range(max_stripes):
            base = j * 16
            m = lens - base >= 16  # stripe j fully available
            if not m.any():
                break
            wi = base // 4
            l1, l2, l3, l4 = w4[:, wi], w4[:, wi + 1], w4[:, wi + 2], w4[:, wi + 3]
            nv1 = _rotl_v(v1 + l1 * P2, 13) * P1
            nv2 = _rotl_v(v2 + l2 * P2, 13) * P1
            nv3 = _rotl_v(v3 + l3 * P2, 13) * P1
            nv4 = _rotl_v(v4 + l4 * P2, 13) * P1
            v1 = np.where(m, nv1, v1)
            v2 = np.where(m, nv2, v2)
            v3 = np.where(m, nv3, v3)
            v4 = np.where(m, nv4, v4)
            stripe_pos = np.where(m, base + 16, stripe_pos)
        h_long = _rotl_v(v1, 1) + _rotl_v(v2, 7) + _rotl_v(v3, 12) + _rotl_v(v4, 18)
        h = np.where(long_mask, h_long, h)
    h = h + lens32

    # tail: 4-byte words then single bytes, per-key variable position
    rem = lens - stripe_pos
    max_words = int(rem.max() // 4) if n else 0
    pos = stripe_pos.copy()
    for _ in range(max_words):
        m = lens - pos >= 4
        if not m.any():
            break
        wi = np.where(m, pos // 4, 0)
        word = w4[np.arange(n), wi]
        nh = _rotl_v(h + word * P3, 17) * P4
        h = np.where(m, nh, h)
        pos = np.where(m, pos + 4, pos)
    max_bytes = int((lens - pos).max()) if n else 0
    for _ in range(max_bytes):
        m = lens - pos >= 1
        if not m.any():
            break
        bi = np.where(m, pos, 0)
        byte = buf[np.arange(n), bi].astype(np.uint32)
        nh = _rotl_v(h + byte * P5, 11) * P1
        h = np.where(m, nh, h)
        pos = np.where(m, pos + 1, pos)

    h ^= h >> np.uint32(15)
    h *= P2
    h ^= h >> np.uint32(13)
    h *= P3
    h ^= h >> np.uint32(16)
    return h
