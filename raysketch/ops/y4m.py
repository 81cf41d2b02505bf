"""Pure-numpy YUV4MPEG2 (.y4m) video codec — the standard UNCOMPRESSED
video interchange format (mjpegtools/ffmpeg's `yuv4mpegpipe`): a text
stream header, then one `FRAME\\n` marker + raw planar YCbCr per frame.
No entropy coding at all, so a full real decode needs nothing beyond
numpy — this closes the video half of the multimodal stub honestly
(compressed codecs like H.264 remain out of scope; mp3 stays the one
remaining stub).

Supported colorspaces: C444 (full-resolution planes, written by
:func:`encode_y4m` via the same BT.601 full-range RGB↔YCbCr the JPEG
codec uses) and Cmono (grayscale, bit-exact round-trip). C420 and
friends refuse cleanly rather than resample wrongly.

Frame sampling (`ops/multimodal.SampleFrames`) is the Ray-side point:
a video payload decodes once per batch inside the actor/task and emits
every k-th frame as an image row for the downstream resize/feature
stages."""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(t, h, w, 3) uint8 RGB or (t, h, w) grayscale → .y4m bytes
    (C444 / Cmono planar, BT.601 full-range conversion for color)."""
    frames = np.asarray(frames, dtype=np.uint8)
    mono = frames.ndim == 3
    if not mono and (frames.ndim != 4 or frames.shape[3] != 3):
        raise ValueError("encode_y4m expects (t, h, w, 3) or (t, h, w)")
    t, h, w = frames.shape[:3]
    cs = "Cmono" if mono else "C444"
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {cs}\n"
            .encode())
    out = [head]
    if mono:
        for f in frames:
            out.append(b"FRAME\n")
            out.append(f.tobytes())
    else:
        from .jpeg import _rgb_to_ycbcr

        for f in frames:
            ycc = np.clip(_rgb_to_ycbcr(f.astype(np.float64)) + 0.5,
                          0, 255).astype(np.uint8)
            out.append(b"FRAME\n")
            out.append(ycc[..., 0].tobytes())
            out.append(ycc[..., 1].tobytes())
            out.append(ycc[..., 2].tobytes())
    return b"".join(out)


def decode_y4m(buf: bytes) -> np.ndarray:
    """.y4m bytes → (t, h, w, 3) uint8 RGB (C444, BT.601 inverse) or
    (t, h, w, 1) grayscale (Cmono, bit-exact). Subsampled colorspaces
    (C420 variants, C422) refuse with a clear error."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(_MAGIC):
        raise ValueError("y4m: bad stream header")
    tags = buf[:nl].decode("ascii", "replace").split()[1:]
    w = h = None
    cs = "C420jpeg"  # spec default when absent
    for tg in tags:
        if tg.startswith("W"):
            w = int(tg[1:])
        elif tg.startswith("H"):
            h = int(tg[1:])
        elif tg.startswith("C"):
            cs = tg
    if not w or not h:
        raise ValueError("y4m: missing W/H in stream header")
    if cs not in ("C444", "Cmono"):
        raise ValueError(
            f"y4m: colorspace {cs} not supported (C444/Cmono only; "
            "subsampled streams refuse rather than resample wrongly)")
    mono = cs == "Cmono"
    fsize = h * w * (1 if mono else 3)
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or not buf[pos:fnl].startswith(b"FRAME"):
            raise ValueError("y4m: bad FRAME marker")
        pos = fnl + 1
        raw = buf[pos:pos + fsize]
        if len(raw) != fsize:
            raise ValueError("y4m: truncated frame payload")
        pos += fsize
        a = np.frombuffer(raw, dtype=np.uint8)
        if mono:
            frames.append(a.reshape(h, w, 1))
        else:
            from .jpeg import _ycbcr_to_rgb

            ycc = a.reshape(3, h, w).transpose(1, 2, 0).astype(np.float64)
            frames.append(np.clip(_ycbcr_to_rgb(ycc) + 0.5, 0, 255)
                          .astype(np.uint8))
    if not frames:
        raise ValueError("y4m: no frames")
    return np.stack(frames)


def sample_frames(frames: np.ndarray, every: int = 4,
                  max_frames: int | None = None) -> np.ndarray:
    """Every ``every``-th frame (0, every, 2·every, …), optionally
    capped — the standard decimation before per-frame feature
    extraction."""
    if every < 1:
        raise ValueError("every must be >= 1")
    out = frames[::every]
    return out[:max_frames] if max_frames is not None else out
