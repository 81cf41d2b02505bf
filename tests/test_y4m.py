"""YUV4MPEG2 codec (ops/y4m.py): mono bit-exact round-trip, C444
tolerance, refusals, frame sampling, and the real video feature stage."""

import numpy as np
import pytest

from raysketch.ops.y4m import decode_y4m, encode_y4m, sample_frames


def _vid(t=6, h=12, w=10, mono=False, seed=3):
    rng = np.random.default_rng(seed)
    shape = (t, h, w) if mono else (t, h, w, 3)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_mono_roundtrip_bit_exact():
    v = _vid(mono=True)
    out = decode_y4m(encode_y4m(v))
    assert out.shape == (6, 12, 10, 1)
    np.testing.assert_array_equal(out[..., 0], v)


def test_c444_roundtrip_close():
    v = _vid()
    out = decode_y4m(encode_y4m(v))
    assert out.shape == v.shape
    # BT.601 forward+inverse with uint8 quantization: small error
    assert np.abs(out.astype(int) - v.astype(int)).max() <= 3
    assert np.abs(out.astype(float) - v.astype(float)).mean() < 1.0


def test_header_and_refusals():
    buf = encode_y4m(_vid())
    head = buf[:buf.index(b"\n")].decode()
    assert head.startswith("YUV4MPEG2 W10 H12 F25:1")
    assert "C444" in head
    with pytest.raises(ValueError, match="stream header"):
        decode_y4m(b"RIFFnot a y4m")
    # subsampled colorspace refuses
    bad = buf.replace(b"C444", b"C420")
    with pytest.raises(ValueError, match="C420"):
        decode_y4m(bad)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(buf[:-5])
    with pytest.raises(ValueError):
        encode_y4m(np.zeros((4, 4), np.uint8))  # 2-D: not a video
    with pytest.raises(ValueError):
        sample_frames(_vid(), every=0)


def test_sample_frames_rule():
    v = _vid(t=10)
    s = sample_frames(v, every=3)
    np.testing.assert_array_equal(s, v[[0, 3, 6, 9]])
    s2 = sample_frames(v, every=3, max_frames=2)
    assert s2.shape[0] == 2


def test_video_feature_stage_real_motion():
    from raysketch.ops.multimodal import (MIME_Y4M, SampleVideoFrames,
                                          synthesize_media_batch)

    t = synthesize_media_batch(list(range(5)), kind="video")
    # even ids are uncompressed y4m; odd ids are MJPEG (test_mjpeg.py)
    mimes = t["mime"].to_pylist()
    assert all(m == MIME_Y4M for i, m in enumerate(mimes) if i % 2 == 0)
    assert all(p[:9] == b"YUV4MPEG2"
               for p, m in zip(t["payload"].to_pylist(), mimes)
               if m == MIME_Y4M)
    out = SampleVideoFrames(every_k=4)(t)
    feats = out["features"].to_pylist()
    for f in feats:
        assert len(f) == 4
        assert f[0] >= 1  # sampled frames
        assert f[3] > 0   # the synthesized drift is real motion
