"""Motion-JPEG (MJPEG) — REAL compressed-video decode, pure numpy.

MJPEG is the simplest widely-deployed compressed video format: a
stream of independently-coded baseline JPEG frames back to back (the
format IP cameras and AVI 'MJPG' tracks carry). Every frame decodes
with this repo's own baseline JPEG codec (:mod:`raysketch.ops.jpeg`,
built from ITU-T T.81), so the video path exercises genuine
entropy-decode + IDCT work per frame — no external codec libraries.

Frame splitting walks the JPEG marker structure properly (segment
length fields; entropy-coded data scanned honoring 0xFF00 byte
stuffing and RST markers) rather than grepping for EOI bytes, which
can legally appear inside table payloads.

Inter-frame prediction formats (MPEG/H.264) remain honest stubs —
their arithmetic/CABAC entropy layers are out of scope here; MJPEG is
the real compressed-video member of the media suite alongside
uncompressed Y4M.
"""

from __future__ import annotations

import numpy as np

_SOI = 0xD8
_EOI = 0xD9
_SOS = 0xDA
_RST0, _RST7 = 0xD0, 0xD7
_TEM = 0x01
# standalone markers (no length field) besides SOI/EOI/RSTn/TEM


def _frame_end(buf: bytes, start: int) -> int:
    """Index one past the EOI of the JPEG frame starting at ``start``
    (which must point at an SOI marker). Walks segments by their length
    fields and entropy-coded scans by 0xFF dispatch."""
    n = len(buf)
    if start + 2 > n or buf[start] != 0xFF or buf[start + 1] != _SOI:
        raise ValueError("mjpeg: frame does not start with SOI")
    pos = start + 2
    in_scan = False
    while pos < n:
        if not in_scan:
            if buf[pos] != 0xFF:
                raise ValueError("mjpeg: marker expected")
            if pos + 2 > n:
                raise ValueError("mjpeg: truncated marker")
            tag = buf[pos + 1]
            if tag == 0xFF:  # fill byte (T.81 B.1.1.2): skip padding
                pos += 1
                continue
            if tag == _EOI:
                return pos + 2
            if tag == _TEM or _RST0 <= tag <= _RST7:
                pos += 2
                continue
            if pos + 4 > n:
                raise ValueError("mjpeg: truncated segment header")
            seglen = int.from_bytes(buf[pos + 2:pos + 4], "big")
            if tag == _SOS:
                in_scan = True
            pos += 2 + seglen
        else:
            # entropy-coded data: 0xFF00 is a stuffed byte, RSTn
            # continues the scan, anything else ends it
            nxt = buf.find(b"\xff", pos)
            if nxt < 0 or nxt + 1 >= n:
                raise ValueError("mjpeg: truncated scan")
            tag = buf[nxt + 1]
            pos = nxt + 2
            if tag == 0x00 or _RST0 <= tag <= _RST7:
                continue
            if tag == 0xFF:  # fill byte inside/after scan data: stay
                pos = nxt + 1  # in scan, consume ONE pad byte
                continue
            if tag == _EOI:
                return pos
            in_scan = False
            pos = nxt  # re-dispatch the marker with a length field
    raise ValueError("mjpeg: no EOI found")


def split_frames(buf: bytes) -> list[bytes]:
    """Split an MJPEG stream into its per-frame JPEG payloads."""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        end = _frame_end(buf, pos)
        out.append(buf[pos:end])
        pos = end
    if not out:
        raise ValueError("mjpeg: empty stream")
    return out


def encode_mjpeg(frames: np.ndarray, quality: int = 90,
                 subsampling: str = "444") -> bytes:
    """Encode (n, h, w, 3) uint8 frames as an MJPEG stream (one
    baseline JPEG per frame, concatenated)."""
    from .jpeg import encode_jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_mjpeg: need (n, h, w, 3) uint8")
    return b"".join(encode_jpeg(f, quality=quality, subsampling=subsampling)
                    for f in frames)


def decode_mjpeg(buf: bytes) -> np.ndarray:
    """Decode an MJPEG stream to (n, h, w, 3) uint8 frames."""
    from .jpeg import decode_jpeg

    frames = [decode_jpeg(p) for p in split_frames(buf)]
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"mjpeg: inconsistent frame shapes {shapes}")
    return np.stack(frames)
