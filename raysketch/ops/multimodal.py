"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The image/audio codec libraries are NOT in this
container, so the decode kernels are STUBS: ``DecodeImage(real=True)``
raises ``NotImplementedError`` exactly where a codec would run, and the
default deterministic fake derives pixels from the payload hash — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested either way.

Scale notes: binary payloads are wide — callers should cap ``batch_size``
(e.g. 64–256 rows) and let ``concurrency × num_cpus`` match the node; the
stages never hold more than one batch of decoded arrays.
"""

from __future__ import annotations

import hashlib

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


def synthesize_media_batch(ids: list[int], kind: str = "image") -> pa.Table:
    """Deterministic fake media rows for plumbing tests (payload bytes are
    seeded by media_id; sizes vary deterministically)."""
    payloads, w, h, nf, sr = [], [], [], [], []
    for i in ids:
        seed = hashlib.sha256(f"media{i}".encode()).digest()
        payloads.append(seed * (64 + (i % 17)))
        w.append(32 + (i % 7) * 16)
        h.append(32 + (i % 5) * 16)
        nf.append(1 if kind == "image" else 8 + i % 8)
        sr.append(0 if kind != "audio" else 16000)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array([kind] * len(ids), pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array([f"{kind}/x-fake"] * len(ids), pa.string()),
            pa.array(w, pa.int32()),
            pa.array(h, pa.int32()),
            pa.array(nf, pa.int32()),
            pa.array(sr, pa.int32()),
        ],
        schema=MEDIA_SCHEMA,
    )


class DecodeImage:
    """Actor stage: payload → pixel tensor (stubbed decode).

    real=True marks where a libjpeg/libpng/PIL call would go; the fake
    path derives a deterministic uint8 (h, w, 3) tensor from the payload
    sha256 so downstream stages exercise real array plumbing.
    """

    def __init__(self, real: bool = False) -> None:
        self.real = real

    def _decode_one(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if self.real:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "plug PIL/turbojpeg here"
            )
        seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        reps = int(np.ceil(h * w * 3 / seed.size))
        return np.tile(seed, reps)[: h * w * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for payload, w, h in zip(
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            pixels.append(self._decode_one(payload, w, h).ravel())
        return batch.append_column(
            "pixels", pa.array([p.tolist() for p in pixels], pa.list_(pa.uint8()))
        )


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


class FrameSampler:
    """Actor stage for video rows: pick ``every_k``-th frame index up to
    n_frames (metadata-level sampling — the decode itself is stubbed)."""

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
    """payload → decode(stub) → features, with wide-row-safe batch sizing."""
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": batch_size}
    if concurrency:
        kwargs["concurrency"] = concurrency
    decoded = ds.map_batches(DecodeImage, **kwargs) if concurrency else ds.map_batches(
        DecodeImage(), batch_format="pyarrow", batch_size=batch_size
    )
    return decoded.map_batches(ImageFeatures(), batch_format="pyarrow", batch_size=batch_size)
