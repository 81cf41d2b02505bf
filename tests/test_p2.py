"""P² parity with the reference's canonical goldens
(library/tests/test_p2.c:47-205, FIXTURES.md F2)."""

import math

import pytest

from raysketch.sketches.base import CodecError
from raysketch.sketches.p2 import P2Histogram, P2Quantile

OBS = [0.02, 0.15, 0.74, 3.39, 0.83, 22.37, 10.15, 15.43, 38.62, 15.92,
       34.60, 10.28, 1.47, 0.40, 0.05, 11.39, 0.27, 0.42, 0.09, 11.37]
MARKERS = [0.02, 0.493895, 4.44063, 17.2039, 38.62]
COUNTS = [1, 6, 10, 16, 20]


def test_quantile_canonical_dataset():
    q = P2Quantile(0.5)
    for i, x in enumerate(OBS):
        r = q.add(x)
        if i < 4:
            assert math.isnan(r)
    assert abs(q.estimate(2) - 4.44063) < 1e-5
    for i, (m, c) in enumerate(zip(MARKERS, COUNTS)):
        assert abs(q.estimate(i) - m) < 1e-5
        assert q.count(i) == c
    # out-of-range marker
    assert math.isnan(q.estimate(5))
    assert q.count(5) == 0


def test_quantile_underfilled_returns_nan():
    q = P2Quantile(0.5)
    q.add(1.0)
    assert math.isnan(q.estimate(2))
    assert q.count(2) == 0


def test_quantile_param_validation():
    for p in (-0.1, 1.1):
        with pytest.raises(ValueError):
            P2Quantile(p)


def test_histogram_canonical_dataset():
    h = P2Histogram(4)
    for x in OBS:
        h.add(x)
    for i, (m, c) in enumerate(zip(MARKERS, COUNTS)):
        assert abs(h.estimate(i) - m) < 1e-5
        assert h.count(i) == c


def test_histogram_param_validation():
    for b in (3, 65535):
        with pytest.raises(ValueError):
            P2Histogram(b)


def test_quantile_codec_error_taxonomy():
    q = P2Quantile(0.5)
    for x in OBS:
        q.add(x)
    blob = q.to_bytes()
    rt = P2Quantile.from_bytes(blob, 0.5)
    assert rt.estimate(2) == q.estimate(2)
    assert rt.to_bytes() == blob
    with pytest.raises(CodecError, match="bad length"):      # rv 1
        P2Quantile.from_bytes(blob[:-1], 0.5)
    bad_cnt = b"\xff\xff" + blob[2:]
    with pytest.raises(CodecError, match="bad count"):        # rv 2
        P2Quantile.from_bytes(bad_cnt, 0.5)
    with pytest.raises(CodecError, match="percentile"):       # rv 3
        P2Quantile.from_bytes(blob, 0.9)


def test_histogram_codec_roundtrip():
    h = P2Histogram(4)
    for x in OBS:
        h.add(x)
    rt = P2Histogram.from_bytes(h.to_bytes(), 4)
    assert rt.to_bytes() == h.to_bytes()
    with pytest.raises(CodecError):
        P2Histogram.from_bytes(h.to_bytes()[:-3], 4)
