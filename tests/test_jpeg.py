"""Baseline JPEG codec (ops/jpeg.py): analytic DC-only goldens, PSNR
roundtrips across quality/subsampling/restart paths, structural marker
checks, mode refusals, and the DecodeImage(real) integration that closes
the round-2/3 multimodal stub."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.ops.jpeg import (
    _build_codes,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)


def _test_image(h=45, w=61, seed=7, noise=15):
    rng = np.random.default_rng(seed)
    gx = np.linspace(0, 255, w)
    gy = np.linspace(0, 255, h)
    base = (gy[:, None] + gx[None, :]) / 2
    px = np.stack([base, base[::-1], 255 - base], axis=2)
    return np.clip(px + rng.normal(0, noise, (h, w, 3)), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255**2 / mse)


# -- analytic / golden ------------------------------------------------------

def test_solid_color_is_dc_only_and_near_exact():
    # a constant image has zero AC energy: the only loss is DC
    # quantization (and the chroma transform rounding), bounded by a
    # couple of levels at quality 90 — analytic, not roundtrip-trusting
    for color in ([90, 160, 220], [0, 0, 0], [255, 255, 255], [17, 203, 84]):
        img = np.full((24, 40, 3), color, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 2, (color, err)
        # and the decoded plane is CONSTANT (no block artifacts possible)
        assert (dec == dec[0, 0]).all()


def test_huffman_canonical_construction_matches_spec_example():
    # T.81 Annex C: the DC-luma table's first codes are 00, 010, 011,
    # 100, 101, 110, 1110, 11110, ... (category 0 gets length-2 code 0)
    codes = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_marker_structure():
    enc = encode_jpeg(_test_image(16, 16), quality=80)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in enc[:32]
    # two DQT, one SOF0, four DHT, one SOS
    assert enc.count(b"\xff\xdb") >= 2
    assert b"\xff\xc0" in enc and b"\xff\xda" in enc
    assert enc.count(b"\xff\xc4") == 4


# -- roundtrip quality ------------------------------------------------------

def test_roundtrip_psnr_and_quality_monotonicity():
    px = _test_image()
    psnrs, sizes = [], []
    for q in (30, 60, 90, 95):
        enc = encode_jpeg(px, quality=q)
        dec = decode_jpeg(enc)
        assert dec.shape == px.shape
        psnrs.append(_psnr(dec, px))
        sizes.append(len(enc))
    assert psnrs[-1] > 33 and psnrs[2] > 28  # q95 / q90 floors
    assert sizes == sorted(sizes)            # more quality, more bytes
    assert psnrs == sorted(psnrs)
    assert sizes[-1] < px.nbytes             # still compressed at q95


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("rst", [0, 3])
def test_subsampling_and_restart_paths(sub, rst):
    px = _test_image(37, 50, seed=11)
    enc = encode_jpeg(px, quality=90, subsampling=sub, restart_interval=rst)
    dec = decode_jpeg(enc)
    assert dec.shape == px.shape
    floor = 28 if sub == "444" else 24  # chroma is nearest-upsampled
    assert _psnr(dec, px) > floor
    if rst:
        assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
        assert b"\xff\xdd" in enc  # DRI present


def test_non_multiple_of_8_and_tiny_dims():
    for h, w in ((1, 1), (7, 9), (8, 8), (17, 33)):
        px = _test_image(h, w, seed=h * 31 + w, noise=5)
        dec = decode_jpeg(encode_jpeg(px, quality=95))
        assert dec.shape == (h, w, 3)
        assert _psnr(dec, px) > 25


def test_grayscale_single_component_scan():
    # a genuine 1-component stream: the decoder must run the nc==1 path
    # and replicate luma into all 3 output channels
    from raysketch.ops.jpeg import encode_jpeg_gray

    rng = np.random.default_rng(3)
    g = np.clip(rng.normal(120, 30, (21, 34)), 0, 255).astype(np.uint8)
    enc = encode_jpeg_gray(g, quality=92)
    dec = decode_jpeg(enc)
    assert dec.shape == (21, 34, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and \
        (dec[..., 1] == dec[..., 2]).all()
    assert _psnr(dec[..., 0], g) > 30
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((4, 4, 3), dtype=np.uint8))


# -- refusals ---------------------------------------------------------------

def test_rejects_progressive_and_garbage():
    enc = bytearray(encode_jpeg(_test_image(16, 16)))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    whole = encode_jpeg(_test_image(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(whole[: len(whole) // 2])  # truncated scan
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), dtype=np.uint8))  # not (h, w, 3)
    with pytest.raises(ValueError):
        encode_jpeg(_test_image(8, 8), subsampling="422x")


# -- DecodeImage integration ------------------------------------------------

def test_decode_image_stage_decodes_real_jpeg(ray_session):
    import ray.data as rd

    from raysketch.ops.multimodal import (
        DecodeImage,
        media_feature_pipeline,
        synthesize_media_batch,
    )

    tbl = synthesize_media_batch(list(range(12)), kind="jpeg")
    assert all(m == "image/jpeg" for m in tbl["mime"].to_pylist())
    # payloads are genuine JFIF
    assert all(p[:2] == b"\xff\xd8" for p in tbl["payload"].to_pylist())

    ds = rd.from_arrow(tbl)
    feats = media_feature_pipeline(ds, batch_size=4).to_pandas()
    assert len(feats) == 12 and feats["features"].map(len).eq(14).all()

    # the decoded pixels must be CLOSE to the same synth's PPM pixels
    # (identical source image, JPEG is lossy): feature-level agreement
    ppm = synthesize_media_batch(list(range(12)), kind="image")
    ppm_feats = media_feature_pipeline(rd.from_arrow(ppm), batch_size=4) \
        .to_pandas()
    a = np.stack(feats.sort_values("media_id")["features"].to_numpy())
    b = np.stack(ppm_feats.sort_values("media_id")["features"].to_numpy())
    assert np.abs(a[:, :6] - b[:, :6]).max() < 0.02  # mean/std per channel

    # real=True no longer raises for jpeg/png payloads (closed stubs) —
    # garbage png bytes are a CODEC error now, and mimes with no codec
    # (video) still refuse honestly
    stage = DecodeImage(real=True)
    out = stage(tbl.slice(0, 2))
    assert "pixels" in out.column_names
    with pytest.raises(ValueError):
        stage._decode_one(b"\x89PNG....", "image/png", 8, 8)
    with pytest.raises(NotImplementedError):
        stage._decode_one(b"frames", "video/x-fake", 8, 8)
