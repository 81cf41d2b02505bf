"""ops/adpcm — real IMA ADPCM compressed audio (4 bits/sample)."""
import numpy as np
import pytest

from raysketch.ops.adpcm import decode_adpcm, encode_adpcm


def _tone(n=4000, rate=16000, f=440.0):
    t = np.arange(n) / rate
    return (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)


def test_roundtrip_tone_under_2pct_rms():
    pcm = _tone()
    buf = encode_adpcm(pcm, 16000)
    # 4:1 vs PCM16 (4 bits/sample + 15-byte header)
    assert len(buf) < pcm.size * 2 / 3.8
    dec, rate = decode_adpcm(buf)
    assert rate == 16000 and dec.dtype == np.int16
    assert dec.shape == pcm.shape
    rms = np.sqrt(np.mean((dec.astype(np.float64)
                           - pcm.astype(np.float64)) ** 2))
    assert rms / 32767 < 0.02


def test_decoder_is_deterministic_and_exact_state_replay():
    rng = np.random.default_rng(4)
    pcm = rng.normal(0, 8000, 1001).clip(-32768, 32767).astype(np.int16)
    buf = encode_adpcm(pcm, 8000)
    a, _ = decode_adpcm(buf)
    b, _ = decode_adpcm(buf)
    assert np.array_equal(a, b)
    # first sample is stored verbatim
    assert a[0] == pcm[0]


def test_odd_sample_counts_and_tiny_inputs():
    for n in (1, 2, 3, 10, 11):
        pcm = _tone(n)
        dec, _ = decode_adpcm(encode_adpcm(pcm, 16000))
        assert dec.shape == (n,)


def test_refusals():
    with pytest.raises(ValueError, match="bad payload"):
        decode_adpcm(b"XXXX123")
    with pytest.raises(ValueError, match="truncated"):
        buf = encode_adpcm(_tone(1000), 16000)
        decode_adpcm(buf[:40])
    with pytest.raises(ValueError, match="non-empty"):
        encode_adpcm(np.array([], np.int16), 8000)
    with pytest.raises(ValueError, match="int16"):
        encode_adpcm(np.array([40000]), 8000)


def test_decode_audio_stage_handles_both_mimes(ray_session):
    from raysketch.ops import multimodal as mm

    t = mm.synthesize_media_batch(list(range(8)), kind="audio")
    assert set(t["mime"].to_pylist()) == {mm.MIME_WAV, mm.MIME_ADPCM}
    out = mm.DecodeAudio()(t)
    feats = out["features"].to_pylist()
    # every row decodes to a real tone: same synthesis, so WAV and
    # ADPCM rows land on near-identical RMS
    rms = [f[1] for f in feats]
    assert all(0.2 < r < 1.0 for r in rms)
    assert max(rms) - min(rms) < 0.05


def test_rejects_bad_step_index():
    import struct

    with pytest.raises(ValueError, match="step index"):
        decode_adpcm(b"ADP1" + struct.pack("<IIhB", 2, 8000, 0, 200)
                     + b"\x00")
