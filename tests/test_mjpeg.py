"""ops/mjpeg — real Motion-JPEG: marker-walk frame split + per-frame
baseline JPEG decode, and the SampleVideoFrames mime dispatch."""
import numpy as np
import pytest

from raysketch.ops.jpeg import decode_jpeg, encode_jpeg
from raysketch.ops.mjpeg import decode_mjpeg, encode_mjpeg, split_frames


def _smooth_frames(n=5, h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([
        np.stack([(x * 4 + i * 5) % 256, (y * 6) % 256,
                  ((x + y) * 3) % 256], axis=2)
        for i in range(n)]).astype(np.uint8)


def test_split_yields_standalone_decodable_frames():
    frames = _smooth_frames()
    buf = encode_mjpeg(frames, quality=92)
    parts = split_frames(buf)
    assert len(parts) == 5
    for p, f in zip(parts, frames):
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
        ref = decode_jpeg(encode_jpeg(f, quality=92))
        assert np.array_equal(decode_jpeg(p), ref)


@pytest.mark.parametrize("subsampling,ri", [("444", 0), ("420", 0),
                                            ("420", 4)])
def test_roundtrip_quality(subsampling, ri):
    frames = _smooth_frames()
    buf = b"".join(encode_jpeg(f, quality=92, subsampling=subsampling,
                               restart_interval=ri) for f in frames)
    dec = decode_mjpeg(buf)
    assert dec.shape == frames.shape
    err = np.abs(dec.astype(np.float64) - frames.astype(np.float64)).mean()
    assert err < 8  # lossy codec; smooth content stays close


def test_split_survives_eoi_bytes_inside_table_segments():
    # an APP0-style segment whose PAYLOAD contains 0xFFD9: a naive EOI
    # byte-grep would split inside it; the marker walk must not
    frames = _smooth_frames(2)
    f0 = encode_jpeg(frames[0], quality=92)
    payload = b"\x01\xff\xd9\x02"
    seg = b"\xff\xee" + (len(payload) + 2).to_bytes(2, "big") + payload
    doctored = f0[:2] + seg + f0[2:]
    buf = doctored + encode_jpeg(frames[1], quality=92)
    parts = split_frames(buf)
    assert len(parts) == 2
    assert np.array_equal(decode_jpeg(parts[0]), decode_jpeg(f0))


def test_invalid_streams_refused():
    with pytest.raises(ValueError, match="SOI"):
        split_frames(b"\x00\x01")
    frames = _smooth_frames(1)
    buf = encode_mjpeg(frames)
    with pytest.raises(ValueError):
        split_frames(buf[:-2])  # EOI chopped off
    with pytest.raises(ValueError, match="uint8"):
        encode_mjpeg(np.zeros((2, 8, 8), np.uint8))


def test_sample_video_frames_dispatches_both_mimes(ray_session):
    from raysketch.ops import multimodal as mm

    t = mm.synthesize_media_batch(list(range(6)), kind="video")
    mimes = set(t["mime"].to_pylist())
    assert mimes == {mm.MIME_Y4M, mm.MIME_MJPEG}
    out = mm.SampleVideoFrames(every_k=2)(t)
    feats = out["features"].to_pylist()
    assert len(feats) == 6
    for f, nf in zip(feats, t["n_frames"].to_pylist()):
        assert f[0] == float(len(range(0, nf, 2)))
        assert 0 < f[1] < 255  # mean luma
        assert f[3] > 0  # drifting gradient: real motion detected


def test_fill_bytes_before_rst_inside_scan():
    # legal per T.81: 0xFF padding may precede an RST marker INSIDE the
    # entropy-coded scan; the walk must stay in scan state
    frames = _smooth_frames(2)
    enc = encode_jpeg(frames[0], quality=92, restart_interval=2)
    rst = enc.find(b"\xff\xd0")
    assert rst > 0  # stream really contains an RST0
    doctored = enc[:rst] + b"\xff\xff" + enc[rst:]
    buf = doctored + encode_jpeg(frames[1], quality=92)
    parts = split_frames(buf)
    assert len(parts) == 2
    assert np.array_equal(decode_jpeg(parts[1]),
                          decode_jpeg(encode_jpeg(frames[1], quality=92)))
