"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / resize / feature-extract / frame-sample are ``map_batches``
stages (actor pools when ``concurrency`` is set).

Codec status — REAL where the container allows, stubbed where it can't:

- **PPM (P6) images** — decoded and encoded for real (pure numpy header
  parse + frombuffer; no codec library needed). The synthesized corpus
  writes genuine P6 payloads, so decode → resize → features is a true
  end-to-end pixel path.
- **WAV (PCM16) audio** — decoded and encoded for real via the stdlib
  ``wave`` module + numpy; RMS/ZCR/frame-energy features run on actual
  samples.
- **JPEG (baseline sequential)** — decoded and encoded for real by the
  pure-numpy codec in :mod:`raysketch.ops.jpeg` (ITU-T T.81 baseline
  subset built from the public spec; Annex K tables). Lossy by nature:
  tests gate on PSNR and the analytic DC-only path, not bit equality.
- **PNG** — decoded and encoded for real by :mod:`raysketch.ops.png`
  (stdlib zlib + numpy, all five row filters; lossless round-trip).
- **Video (uncompressed YUV4MPEG2)** — decoded for real by
  :mod:`raysketch.ops.y4m` (`SampleVideoFrames`: decode → frame
  sample → luma/motion features).
- **Video (Motion-JPEG)** — REAL compressed-video decode via
  :mod:`raysketch.ops.mjpeg` (marker-walk frame split + the in-repo
  baseline JPEG decoder per frame); `SampleVideoFrames` handles both
  video mimes.
- **Audio (IMA ADPCM)** — REAL compressed-audio decode via
  :mod:`raysketch.ops.adpcm` (published IMA/DVI 4-bit adaptive codec);
  `DecodeAudio` handles PCM WAV and ADPCM rows alike.
- **MP3 / inter-frame video codecs (MPEG, H.264)** — NOT in this
  container; the remaining honest stub. ``DecodeImage(real=True)``
  raises ``NotImplementedError`` exactly where ffmpeg would run; the
  default deterministic fake derives pixels from the payload hash so
  downstream stages still exercise real array plumbing.

Scale notes: binary payloads are wide — callers should cap ``batch_size``
(e.g. 64–256 rows) and let ``concurrency × num_cpus`` match the node; the
stages never hold more than one batch of decoded arrays.
"""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)

MIME_PPM = "image/x-portable-pixmap"
MIME_WAV = "audio/wav"
MIME_JPEG = "image/jpeg"
MIME_PNG = "image/png"
MIME_Y4M = "video/x-yuv4mpeg"
MIME_MJPEG = "video/x-motion-jpeg"
MIME_ADPCM = "audio/x-ima-adpcm"


# ---------------------------------------------------------------------------
# real codecs (no external libraries)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary PPM (P6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (h, w, 3). Pure numpy; handles comments
    and arbitrary whitespace in the header per the PPM spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # parse three header tokens (width, height, maxval) after the magic
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i)
    return arr.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = f.readframes(n)
        width = f.getsampwidth()
        ch = f.getnchannels()
    if width != 2:
        raise ValueError("only PCM16 WAV supported")
    s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    return s, sr


# ---------------------------------------------------------------------------
# synthesis (deterministic; REAL formats for ppm/wav)
# ---------------------------------------------------------------------------

def synthesize_media_batch(ids: list[int], kind: str = "image") -> pa.Table:
    """Deterministic media rows. ``image`` rows carry genuine binary PPM
    payloads, ``jpeg`` rows genuine baseline JFIF (ops/jpeg.py codec),
    ``png`` rows genuine PNG (ops/png.py codec), ``audio`` rows genuine
    PCM16 WAV, and ``video`` rows genuine uncompressed YUV4MPEG2
    (ops/y4m.py) — all decodable by any standard tool."""
    payloads, w, h, nf, sr, mime = [], [], [], [], [], []
    for i in ids:
        seed = hashlib.sha256(f"media{i}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
        wi = 32 + (i % 7) * 16
        hi = 32 + (i % 5) * 16
        if kind in ("image", "jpeg", "png"):
            # gradient + seeded noise: realistic-ish pixels, deterministic
            gx = np.linspace(0, 255, wi, dtype=np.float64)
            gy = np.linspace(0, 255, hi, dtype=np.float64)
            base = (gy[:, None] + gx[None, :]) / 2
            px = np.stack([base, base[::-1], 255 - base], axis=2)
            px = np.clip(px + rng.normal(0, 20, (hi, wi, 3)), 0, 255).astype(np.uint8)
            if kind == "jpeg":
                from .jpeg import encode_jpeg

                payloads.append(encode_jpeg(px, quality=90))
                mime.append(MIME_JPEG)
            elif kind == "png":
                from .png import encode_png

                payloads.append(encode_png(px))
                mime.append(MIME_PNG)
            else:
                payloads.append(encode_ppm(px))
                mime.append(MIME_PPM)
            nf.append(1)
            sr.append(0)
        elif kind == "audio":
            rate = 16000
            t = np.arange(rate // 4) / rate  # 250 ms
            freq = 200 + (i % 20) * 50
            s = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.normal(0, 1, t.size)
            pcm = (s * 32767).astype(np.int16)
            if i % 2:  # alternate containers: PCM WAV / IMA ADPCM
                from .adpcm import encode_adpcm

                payloads.append(encode_adpcm(pcm, rate))
                mime.append(MIME_ADPCM)
            else:
                payloads.append(encode_wav(pcm, rate))
                mime.append(MIME_WAV)
            nf.append(1)
            sr.append(rate)
        elif kind == "video":
            from .mjpeg import encode_mjpeg
            from .y4m import encode_y4m

            n_frames = 8 + i % 8
            gx = np.linspace(0, 255, wi, dtype=np.float64)
            gy = np.linspace(0, 255, hi, dtype=np.float64)
            base = (gy[:, None] + gx[None, :]) / 2
            fr = []
            for f in range(n_frames):  # horizontal drift = real motion
                sh = np.roll(base, f * 2, axis=1)
                px = np.stack([sh, sh[::-1], 255 - sh], axis=2)
                fr.append(np.clip(px, 0, 255).astype(np.uint8))
            if i % 2:  # alternate containers: uncompressed / MJPEG
                payloads.append(encode_mjpeg(np.stack(fr), quality=92))
                mime.append(MIME_MJPEG)
            else:
                payloads.append(encode_y4m(np.stack(fr)))
                mime.append(MIME_Y4M)
            nf.append(n_frames)
            sr.append(0)
        else:
            payloads.append(seed * (64 + (i % 17)))
            mime.append(f"{kind}/x-fake")
            nf.append(8 + i % 8)
            sr.append(0)
        w.append(wi)
        h.append(hi)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array([kind] * len(ids), pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(mime, pa.string()),
            pa.array(w, pa.int32()),
            pa.array(h, pa.int32()),
            pa.array(nf, pa.int32()),
            pa.array(sr, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

class DecodeImage:
    """Actor stage: payload → pixel tensor.

    PPM, baseline JPEG, and PNG payloads decode FOR REAL (pure-numpy
    codecs + stdlib zlib, no libraries); other mimes use the
    deterministic fake (payload-hash pixels) unless ``real=True``,
    which raises ``NotImplementedError`` exactly where ffmpeg would
    plug in.
    """

    def __init__(self, real: bool = False) -> None:
        self.real = real

    def _decode_one(self, payload: bytes, mime: str, w: int, h: int) -> np.ndarray:
        if mime == MIME_PPM:
            return decode_ppm(payload)
        if mime == MIME_JPEG:
            from .jpeg import decode_jpeg

            return decode_jpeg(payload)
        if mime == MIME_PNG:
            from .png import decode_png

            px = decode_png(payload)
            if px.shape[2] == 1:  # grayscale -> RGB for the feature stages
                px = np.repeat(px, 3, axis=2)
            return px
        if self.real:
            raise NotImplementedError(
                "mp3 / inter-frame video codecs (MPEG, H.264) are not "
                "available in this environment; jpeg/png/ppm/wav are "
                "real here, and y4m + MJPEG video decode for real via "
                "SampleVideoFrames"
            )
        seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        reps = int(np.ceil(h * w * 3 / seed.size))
        return np.tile(seed, reps)[: h * w * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for payload, mime, w, h in zip(
            batch["payload"].to_pylist(),
            batch["mime"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            try:
                px = self._decode_one(payload, mime, w, h).ravel()
            except NotImplementedError:
                if self.real and mime not in (MIME_PPM, MIME_JPEG,
                                              MIME_PNG):
                    raise  # real=True unsupported-mime stub: loud
                # a CORRUPT payload can masquerade as an unsupported
                # subformat (bit-flipped SOF/DQT) -> quarantine it
                seed = np.frombuffer(hashlib.sha256(payload).digest(),
                                     dtype=np.uint8)
                reps = int(np.ceil(h * w * 3 / seed.size))
                px = np.tile(seed, reps)[: h * w * 3]
            except Exception:
                # corrupt row -> deterministic fake pixels (same
                # convention as unknown mimes); never raise from an
                # actor-pool stage (CLAUDE.md round-4)
                seed = np.frombuffer(hashlib.sha256(payload).digest(),
                                     dtype=np.uint8)
                reps = int(np.ceil(h * w * 3 / seed.size))
                px = np.tile(seed, reps)[: h * w * 3]
            pixels.append(px)
        return batch.append_column(
            "pixels", pa.array([p.tolist() for p in pixels], pa.list_(pa.uint8()))
        )


class ResizeImage:
    """Actor stage: nearest-neighbor resize to (out_h, out_w) — real
    pixel work (numpy index grids), fixed-size output for model input."""

    def __init__(self, out_w: int = 32, out_h: int = 32) -> None:
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        ow, oh = self.out_w, self.out_h
        for pix, w, h in zip(
            batch["pixels"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            a = np.asarray(pix, dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(oh) * h // oh)
            xi = (np.arange(ow) * w // ow)
            out.append(a[yi[:, None], xi[None, :]].ravel().tolist())
        batch = batch.drop_columns(["pixels"])
        batch = batch.append_column("pixels", pa.array(out, pa.list_(pa.uint8())))
        batch = batch.set_column(batch.schema.get_field_index("width"), "width",
                                 pa.array([ow] * batch.num_rows, pa.int32()))
        return batch.set_column(batch.schema.get_field_index("height"), "height",
                                pa.array([oh] * batch.num_rows, pa.int32()))


class ImageFeatures:
    """Actor stage: pixel tensor → small feature vector (mean/std per
    channel + 8-bin luminance histogram). Pure numpy; real either way."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for pix, w, h in zip(
            batch["pixels"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            a = np.asarray(pix, dtype=np.float64).reshape(h, w, 3)
            lum = a.mean(axis=2)
            hist, _ = np.histogram(lum, bins=8, range=(0, 255))
            f = np.concatenate(
                [a.mean(axis=(0, 1)) / 255, a.std(axis=(0, 1)) / 255, hist / lum.size]
            )
            feats.append(f.tolist())
        return batch.drop_columns(["pixels"]).append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


class DecodeAudio:
    """Actor stage: audio payload → real sample array + per-row
    features: duration, RMS energy, zero-crossing rate, peak,
    dominant-bin of an 8-point frame-energy profile. PCM WAV and IMA
    ADPCM (ops/adpcm.py, real compressed-audio decode) both decode for
    real; other mimes emit a zero vector."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .adpcm import decode_adpcm

        feats = []
        for payload, mime in zip(batch["payload"].to_pylist(),
                                 batch["mime"].to_pylist()):
            # corrupt rows emit the zero vector instead of raising:
            # an exception from an actor-pool map_batches stage makes
            # Ray 2.49 respawn the actor and retry the poisoned batch
            # forever (CLAUDE.md round-4) — quarantine, don't raise
            try:
                if mime == MIME_WAV:
                    s, sr = decode_wav(payload)
                elif mime == MIME_ADPCM:
                    pcm, sr = decode_adpcm(payload)
                    s = pcm.astype(np.float64) / 32768.0
                else:
                    feats.append([0.0] * 12)
                    continue
                if sr <= 0 or s.size == 0:
                    raise ValueError("empty or rate-less audio")
                rms = float(np.sqrt(np.mean(s**2)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(s)))))
                peak = float(np.abs(s).max(initial=0.0))
                n8 = (s.size // 8) * 8
                frames = s[:n8].reshape(8, -1)
                energy = np.sqrt((frames**2).mean(axis=1))
                feats.append([s.size / sr, rms, zcr, peak]
                             + energy.tolist())
            except Exception:
                # ANY per-row decode/feature failure quarantines as the
                # zero vector — corrupt external media raises arbitrary
                # error types (KeyError/ZeroDivisionError/struct.error,
                # not just ValueError), and an exception from an
                # actor-pool stage hangs the pipeline (CLAUDE.md r4)
                feats.append([0.0] * 12)
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


class SampleVideoFrames:
    """Actor stage for video rows: REAL decode — y4m (ops/y4m.py) or
    Motion-JPEG (ops/mjpeg.py, per-frame baseline JPEG entropy-decode +
    IDCT) by mime — then sample every ``every_k``-th frame and reduce
    each video to a feature vector [n_frames_sampled, mean luma, std
    luma, mean |frame diff| (motion)] — the decode→frame-sample→
    featurize shape of a video curation stage. One decode per row,
    all-numpy."""

    def __init__(self, every_k: int = 4) -> None:
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .mjpeg import decode_mjpeg
        from .y4m import decode_y4m, sample_frames

        feats = []
        for payload, mime in zip(batch["payload"].to_pylist(),
                                 batch["mime"].to_pylist()):
            dec = decode_mjpeg if mime == MIME_MJPEG else decode_y4m
            try:
                fr = sample_frames(dec(payload), self.every_k)
            except Exception:
                # corrupt row -> zero vector; never raise from an
                # actor-pool stage (CLAUDE.md round-4: Ray retries the
                # poisoned batch forever). Corrupt JPEG streams raise
                # KeyError/ZeroDivisionError/NotImplementedError, not
                # just ValueError -> catch everything per row.
                feats.append([0.0, 0.0, 0.0, 0.0])
                continue
            luma = fr.astype(np.float64).mean(axis=3) if fr.shape[3] == 3 \
                else fr[..., 0].astype(np.float64)
            motion = 0.0 if fr.shape[0] < 2 else float(
                np.abs(np.diff(luma, axis=0)).mean())
            feats.append([float(fr.shape[0]), float(luma.mean()),
                          float(luma.std()), motion])
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64())))


class FrameSampler:
    """Actor stage for video rows: pick ``every_k``-th frame index up to
    n_frames (metadata-level sampling — the video decode itself is
    stubbed)."""

    def __init__(self, every_k: int = 4) -> None:
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        samples = [
            list(range(0, int(nf), self.every_k)) for nf in batch["n_frames"].to_pylist()
        ]
        return batch.append_column(
            "frame_indices", pa.array(samples, pa.list_(pa.int32()))
        )


def media_feature_pipeline(ds, batch_size: int = 128, concurrency: int | None = None):
    """payload → decode (REAL for ppm) → features, wide-row-safe batches."""
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
    decoded = ds.map_batches(DecodeImage, **kwargs) if concurrency else ds.map_batches(
        DecodeImage(), batch_format="pyarrow", batch_size=batch_size
    )
    return decoded.map_batches(ImageFeatures(), batch_format="pyarrow", batch_size=batch_size)


def audio_feature_pipeline(ds, batch_size: int = 128, concurrency: int | None = None):
    """WAV payload → real decode + signal features."""
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(DecodeAudio, **kwargs)
    return ds.map_batches(DecodeAudio(), batch_format="pyarrow", batch_size=batch_size)
