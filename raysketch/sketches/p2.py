"""P² (piecewise-parabolic) quantile and histogram — reference-parity oracle.

Implements the Jain & Chlamtac (1985) P² algorithm with the exact behavioral
quirks of the reference (library/src/p2.c), because this sketch exists here
as the *single-stream parity oracle* for validating the mergeable quantile
sketches (t-digest, KLL) — P² itself is order-dependent and NOT mergeable,
so it is never distributed (SURVEY.md §7.3).

Parity-relevant reference behaviors preserved:

- the first 5 (or b+1) observations fill the marker array in reverse and are
  sorted on the last one (p2.c:91-98, 281-287);
- ``add`` returns NaN until the buffer fills; on the fill it returns
  ``n[2]`` (== 3.0), afterwards the current p-estimate ``q[2]`` (p2.c:95-97,141);
- cell-search inequality chain incl. both-closed last cell (p2.c:103-117);
- desired positions: quantile keeps running ``n1`` increments
  (p2.c:123-126); histogram computes ``n1 = 1 + i*(n[b]-1)/b`` on the fly
  (p2.c:317);
- parabolic adjustment with linear fallback when out of order (p2.c:25-40).

Serialization mirrors the reference layouts (p2.c:164-244, 358-407) with the
same error taxonomy: bad length / bad count / mismatched percentile.
"""

from __future__ import annotations

import math
import struct
from typing import Any

from .base import CodecError

_NAN = float("nan")


def _parabolic(i: int, d: float, q: list[float], n: list[float]) -> float:
    return q[i] + d / (n[i + 1] - n[i - 1]) * (
        (n[i] - n[i - 1] + d) * (q[i + 1] - q[i]) / (n[i + 1] - n[i])
        + (n[i + 1] - n[i] - d) * (q[i] - q[i - 1]) / (n[i] - n[i - 1])
    )


def _linear(i: int, d: float, q: list[float], n: list[float]) -> float:
    di = int(d)
    return q[i] + d * (q[i + di] - q[i]) / (n[i + di] - n[i])


class P2Quantile:
    """Streaming p-quantile with 5 markers (reference sa_p2_quantile)."""

    kind = "p2_quantile"
    MARKERS = 5

    def __init__(self, p: float) -> None:
        if not (0.0 < p < 1.0):
            raise ValueError("0 < quantile < 1")  # lua_binding/p2.c:36 (exclusive)
        # the reference stores p as C float; keep that precision for parity
        self.p = struct.unpack("<f", struct.pack("<f", p))[0]
        self._init()

    def _init(self) -> None:
        self.cnt = self.MARKERS
        self.q = [0.0] * 5
        self.n = [1.0, 2.0, 3.0, 4.0, 5.0]
        # the reference stores p as a C float, so every n1 expression
        # mixing ints with p (init: 1+2p, 1+4p, 3+2p, p2.c:79-82; add:
        # (1+p)/2, p2.c:125) evaluates in FLOAT32 before widening to the
        # double n1 array — the rounding must happen at float32 here too,
        # or desired marker positions drift ~1e-8/obs and the d>=1
        # adjustment eventually fires on a different observation
        # (found by the live compiled-C fuzz, not by fixed goldens)
        import numpy as np

        p32 = np.float32(self.p)
        f = np.float32
        self.n1 = [1.0, float(f(1) + f(2) * p32), float(f(1) + f(4) * p32),
                   float(f(3) + f(2) * p32), 5.0]
        self._inc3 = float(f(1) + p32) / 2.0

    def add(self, x: float) -> float:
        x = float(x)
        if self.cnt:
            self.cnt -= 1
            self.q[self.cnt] = x
            if self.cnt == 0:
                self.q.sort()
                return self.n[2]
            return _NAN

        q, n = self.q, self.n
        k = 0
        if x < q[0]:
            q[0] = x
            k = 1
        elif q[0] <= x < q[1]:
            k = 1
        elif q[1] <= x < q[2]:
            k = 2
        elif q[2] <= x < q[3]:
            k = 3
        elif q[3] <= x <= q[4]:
            k = 4
        elif q[4] < x:
            q[4] = x
            k = 4

        for i in range(k, self.MARKERS):
            n[i] += 1

        p = self.p
        self.n1[1] += p / 2
        self.n1[2] += p
        self.n1[3] += self._inc3  # float32 (1+p)/2, see _init
        self.n1[4] += 1

        for i in range(1, self.MARKERS - 1):
            d = self.n1[i] - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) or (d <= -1 and n[i - 1] - n[i] < -1):
                d = 1.0 if d > 0 else -1.0
                q1 = _parabolic(i, d, q, n)
                if q[i - 1] < q1 < q[i + 1]:
                    q[i] = q1
                else:
                    q[i] = _linear(i, d, q, n)
                n[i] += d
        return q[2]

    def estimate(self, marker: int) -> float:
        if marker >= self.MARKERS or self.cnt != 0:
            return _NAN
        return self.q[marker]

    def count(self, marker: int) -> int:
        if marker >= self.MARKERS or self.cnt != 0:
            return 0
        return int(self.n[marker])

    def clear(self) -> None:
        self._init()

    def result(self) -> dict[str, Any]:
        return {"estimate": self.estimate(2), "p": self.p,
                "markers": [self.estimate(i) for i in range(5)]}

    # codec: cnt u16, p f32, q[5] n[5] n1[5] doubles (p2.c:164-202)
    def to_bytes(self) -> bytes:
        return struct.pack("<Hf15d", self.cnt, self.p, *self.q, *self.n, *self.n1)

    @classmethod
    def from_bytes(cls, buf: bytes, p: float) -> "P2Quantile":
        obj = cls(p)
        if len(buf) != struct.calcsize("<Hf15d"):
            raise CodecError("p2_quantile: bad length")  # rv 1
        vals = struct.unpack("<Hf15d", buf)
        if vals[0] > cls.MARKERS:
            raise CodecError("p2_quantile: bad count")  # rv 2
        if vals[1] != obj.p:
            raise CodecError("p2_quantile: percentile mismatch")  # rv 3
        obj.cnt = vals[0]
        obj.q = list(vals[2:7])
        obj.n = list(vals[7:12])
        obj.n1 = list(vals[12:17])
        return obj


class P2Histogram:
    """Equal-probability b-bucket streaming histogram (sa_p2_histogram)."""

    kind = "p2_histogram"

    def __init__(self, buckets: int) -> None:
        if buckets < 4 or buckets > 65534:
            raise ValueError("4 <= buckets < 65535")  # lua_binding/p2.c:131
        self.b = int(buckets)
        self._init()

    def _init(self) -> None:
        self.cnt = self.b + 1
        self.q = [0.0] * (self.b + 1)
        self.n = [float(i + 1) for i in range(self.b + 1)]

    def add(self, x: float) -> None:
        x = float(x)
        if self.cnt:
            self.cnt -= 1
            self.q[self.cnt] = x
            if self.cnt == 0:
                self.q.sort()
            return

        q, n, b = self.q, self.n, self.b
        k = 0
        if x < q[0]:
            q[0] = x
            k = 1
        else:
            for i in range(b - 1):
                if q[i] <= x < q[i + 1]:
                    k = i + 1
                    break
        if k == 0:
            if q[b - 1] <= x <= q[b]:
                k = b
            elif q[b] < x:
                q[b] = x
                k = b

        for i in range(k, b + 1):
            n[i] += 1

        for i in range(1, b):
            n1 = 1 + i * (n[b] - 1) / b
            d = n1 - n[i]
            if (d >= 1 and n[i + 1] - n[i] > 1) or (d <= -1 and n[i - 1] - n[i] < -1):
                d = 1.0 if d > 0 else -1.0
                q1 = _parabolic(i, d, q, n)
                if q[i - 1] < q1 < q[i + 1]:
                    q[i] = q1
                else:
                    q[i] = _linear(i, d, q, n)
                n[i] += d

    def estimate(self, marker: int) -> float:
        if marker > self.b or self.cnt != 0:
            return _NAN
        return self.q[marker]

    def count(self, marker: int) -> int:
        if marker > self.b or self.cnt != 0:
            return 0
        return int(self.n[marker])

    def clear(self) -> None:
        self._init()

    def result(self) -> dict[str, Any]:
        return {"buckets": self.b, "markers": [self.estimate(i) for i in range(self.b + 1)]}

    # codec: cnt u16, q[b+1] doubles, n[b+1] doubles (p2.c:358-407)
    def to_bytes(self) -> bytes:
        m = self.b + 1
        return struct.pack(f"<H{2*m}d", self.cnt, *self.q, *self.n)

    @classmethod
    def from_bytes(cls, buf: bytes, buckets: int) -> "P2Histogram":
        obj = cls(buckets)
        m = obj.b + 1
        if len(buf) != struct.calcsize(f"<H{2*m}d"):
            raise CodecError("p2_histogram: bad length")  # rv 1
        vals = struct.unpack(f"<H{2*m}d", buf)
        if vals[0] > m:
            raise CodecError("p2_histogram: bad count")  # rv 2
        obj.cnt = vals[0]
        obj.q = list(vals[1 : 1 + m])
        obj.n = list(vals[1 + m : 1 + 2 * m])
        return obj
