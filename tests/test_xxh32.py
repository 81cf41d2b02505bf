"""XXH32 parity: golden vectors frozen from the reference build
(library/src/xxhash.c run via ctypes; see tests/golden_xxh32.json)."""

import json
import os

import numpy as np

from raysketch.sketches.xxh32 import xxh32, xxh32_batch

_HERE = os.path.dirname(__file__)


def _vectors():
    with open(os.path.join(_HERE, "golden_xxh32.json")) as f:
        return json.load(f)


def test_scalar_matches_reference_goldens():
    for v in _vectors():
        assert xxh32(bytes.fromhex(v["key_hex"]), v["seed"]) == v["h"]


def test_batch_matches_scalar():
    vecs = _vectors()
    for seed in (0, 1, 2):
        keys = [bytes.fromhex(v["key_hex"]) for v in vecs if v["seed"] == seed]
        want = np.array([v["h"] for v in vecs if v["seed"] == seed], dtype=np.uint64)
        got = xxh32_batch(keys, seed).astype(np.uint64)
        assert (got == want).all()


def test_batch_long_key_fallback():
    keys = [b"x" * 5000, b"y" * 10]
    got = xxh32_batch(keys, 1)
    assert got[0] == xxh32(keys[0], 1)
    assert got[1] == xxh32(keys[1], 1)


def test_empty():
    assert xxh32_batch([], 1).size == 0
    assert xxh32(b"", 0) == 0x02CC5D05  # public xxHash test vector
