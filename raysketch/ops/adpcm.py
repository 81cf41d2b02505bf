"""IMA ADPCM — real compressed-audio codec (4 bits/sample), pure numpy.

Built from the published IMA/DVI ADPCM specification (the algorithm in
IMA's 1992 "Recommended Practices for Enhancing Digital Audio
Compatibility", as carried in WAV format tag 0x0011 and countless
telephony stacks): a 4-bit code per sample drives an 89-entry step-size
table through an index adaptation table; the decoder reconstructs
PCM16 by accumulating adaptive deltas. 4:1 compression vs PCM16 with
~1-2% RMS error on speech/tones.

The state recurrence (predictor, step index) is inherently sequential —
this is a per-sample scan, not a matmul — so the codec runs a tight
Python loop over samples. Media rows here are short clips (the decode
cost is the honest work a compressed-audio curation stage pays);
inter-frame psychoacoustic codecs (MP3/AAC) remain the documented stub.

Payload layout (this repo's container): ``b"ADP1" + <u32 n_samples> +
<u32 sample_rate> + <i16 first_sample> + <u8 first_index> + packed
4-bit codes`` (low nibble first; the first sample is stored verbatim,
codes encode samples 1..n-1).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"ADP1"

_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int64)

_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                         -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def encode_adpcm(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 mono → IMA ADPCM payload (4 bits/sample)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim != 1 or s.size < 1:
        raise ValueError("encode_adpcm: need a non-empty 1-D PCM16 array")
    if s.max() > 32767 or s.min() < -32768:
        raise ValueError("encode_adpcm: samples must fit int16")
    pred = int(s[0])
    index = 0
    codes = []
    for x in s[1:].tolist():
        step = int(_STEP_TABLE[index])
        diff = x - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        # standard 3-bit magnitude quantization against step/4,2,1
        delta = step >> 3
        if diff >= step:
            code |= 4
            diff -= step
            delta += step
        step >>= 1
        if diff >= step:
            code |= 2
            diff -= step
            delta += step
        step >>= 1
        if diff >= step:
            code |= 1
            delta += step
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_INDEX_TABLE[code])))
        codes.append(code)
    c = np.asarray(codes, dtype=np.uint8)
    if c.size % 2:
        c = np.concatenate([c, np.zeros(1, np.uint8)])
    packed = (c[0::2] | (c[1::2] << 4)).tobytes()
    return (_MAGIC
            + struct.pack("<IIhB", s.size, int(sample_rate), int(s[0]), 0)
            + packed)


def decode_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """IMA ADPCM payload → (PCM16 mono samples, sample_rate)."""
    if len(payload) < 15 or payload[:4] != _MAGIC:
        raise ValueError("decode_adpcm: bad payload")
    n, rate, first, index0 = struct.unpack_from("<IIhB", payload, 4)
    # validate the header count against the bytes actually present
    # BEFORE any allocation: a corrupt n must not drive np.empty(n)
    if n < 1:
        raise ValueError("decode_adpcm: bad payload (zero samples)")
    if index0 > 88:
        raise ValueError("decode_adpcm: bad payload (step index > 88)")
    if len(payload) - 15 != (n - 1 + 1) // 2:
        raise ValueError("decode_adpcm: truncated payload")
    packed = np.frombuffer(payload, np.uint8, offset=15)
    codes = np.empty(packed.size * 2, np.uint8)
    codes[0::2] = packed & 0x0F
    codes[1::2] = packed >> 4
    codes = codes[:n - 1]
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    pred = int(first)
    index = int(index0)
    step_t = _STEP_TABLE.tolist()
    idx_t = _INDEX_TABLE.tolist()
    for i, code in enumerate(codes.tolist()):
        step = step_t[index]
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred += -delta if code & 8 else delta
        pred = max(-32768, min(32767, pred))
        out[i + 1] = pred
        index = max(0, min(88, index + idx_t[code]))
    return out.astype(np.int16), int(rate)
