"""Time-series circular buffer (int) — reference-parity kernel + UDAF.

Semantics follow library/src/time_series.c and lua_binding/time_series.c:

- ``rows >= 2`` slots of ``ns_per_row`` each; initial ``current_time =
  (rows-1) * ns_per_row`` (time_series.c:61-86).
- writes ADVANCE the window; advancing zeroes every skipped slot
  (time_series.c:38-53). Reads never advance.
- observations older than the window, or reads into the future, return
  None (INT_MIN → Lua nil in the reference, time_series.c:54-56).
- ``add`` saturates at int32 bounds (time_series.c:89-102); ``set``
  overwrites (:105-112).
- ``merge(other, op)``: replays the source's window into self by
  timestamp; requires ``self.ns_per_row <= other.ns_per_row``
  (lua_binding/time_series.c:120-153).
- ``get_range(ns, n)``: n values from ns (None → window start)
  (lua_binding/time_series.c:156-199).
- ``stats(ns, n, stat, include_zero)``: range aggregate where zeros are
  missing data unless include_zero (lua_binding/time_series.c:198-345).
- ``matrix_profile``: SCRIMP over the window (ops.matrixprofile).
- serialization: LE ``current_time:u64 ns_per_row:u64 rows:i32
  v:i32[rows]`` — byte-identical to sa_serialize_time_series_int
  (time_series.c:308-340) via :meth:`to_reference_bytes`; the engine
  envelope adds a 4-byte magic. Restore validates ns_per_row/rows
  (rv 2/3 → CodecError here; engine policy recomputes).

Batch/UDAF path: ``update_batch`` absorbs (ns, v) pairs vectorized — the
final state equals sequential monotonic replay because a bucket inside
the final window was never evicted, and one outside it contributes
nothing (proof sketch in the method docstring).
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1
_MAGIC = b"TSI1"


class TimeSeriesInt:
    kind = "time_series_int"

    def __init__(self, rows: int, ns_per_row: int) -> None:
        if rows < 2:
            raise ValueError("rows must be >= 2")  # time_series.c:63
        if ns_per_row < 1:
            raise ValueError("ns_per_row must be >= 1")
        self.rows = int(rows)
        self.ns_per_row = int(ns_per_row)
        self.current_time = self.ns_per_row * (self.rows - 1)
        self.v = np.zeros(self.rows, dtype=np.int32)

    # -- indexing (time_series.c:34-58) ------------------------------------
    def _find_index(self, ns: int, advance: bool) -> int:
        current_row = self.current_time // self.ns_per_row
        requested_row = ns // self.ns_per_row
        delta = requested_row - current_row
        if delta > 0 and advance:
            if delta >= self.rows:
                self.v[:] = 0
            else:
                oidx = current_row % self.rows + 1
                if oidx == self.rows:
                    oidx = 0
                if oidx + delta <= self.rows:
                    self.v[oidx:oidx + delta] = 0
                else:
                    self.v[oidx:] = 0
                    self.v[: oidx + delta - self.rows] = 0
            self.current_time = ns - (ns % self.ns_per_row)
        elif requested_row > current_row or abs(delta) >= self.rows:
            return -1
        return requested_row % self.rows

    # -- scalar ops ---------------------------------------------------------
    def add(self, ns: int, v: int) -> int | None:
        idx = self._find_index(ns, True)
        if idx == -1:
            return None
        nv = int(self.v[idx]) + int(v)
        nv = min(max(nv, _I32_MIN), _I32_MAX)
        self.v[idx] = nv
        return nv

    def set(self, ns: int, v: int) -> int | None:
        idx = self._find_index(ns, True)
        if idx == -1:
            return None
        self.v[idx] = v
        return int(v)

    def get(self, ns: int) -> int | None:
        idx = self._find_index(ns, False)
        return None if idx == -1 else int(self.v[idx])

    def timestamp(self) -> int:
        return self.current_time

    def get_configuration(self) -> tuple[int, int]:
        return self.rows, self.ns_per_row

    def _window_start(self) -> int:
        return self.current_time - self.ns_per_row * (self.rows - 1)

    # -- batch / UDAF path ---------------------------------------------------
    def update_batch(self, values: Any) -> None:
        """Absorb (ns, v) pairs vectorized.

        Equivalent to sequential replay in ns order: monotonic advance only
        moves the window forward, so a bucket > final_max - rows was never
        evicted (every intermediate eviction horizon is lower), and a
        bucket <= final_max - rows ends up zeroed/dropped either way.
        """
        import pyarrow as pa

        if isinstance(values, (pa.Table, pa.RecordBatch)):
            ns = np.asarray(values["ns"], dtype=np.int64)
            v = np.asarray(values["v"], dtype=np.int64)
        elif isinstance(values, dict):
            ns = np.asarray(values["ns"], dtype=np.int64)
            v = np.asarray(values["v"], dtype=np.int64)
        else:
            arr = np.asarray(list(values), dtype=np.int64).reshape(-1, 2)
            ns, v = arr[:, 0], arr[:, 1]
        if ns.size == 0:
            return
        bucket = ns // self.ns_per_row
        cur = int(bucket.max())
        if cur > self.current_time // self.ns_per_row:
            self._find_index(int(ns.max()), True)  # advance + zero skipped
        lo = self.current_time // self.ns_per_row - self.rows + 1
        keep = bucket >= lo
        bucket = bucket[keep]
        acc = np.zeros(self.rows, dtype=np.int64)
        np.add.at(acc, (bucket % self.rows).astype(np.int64), v[keep])
        merged = np.clip(self.v.astype(np.int64) + acc, _I32_MIN, _I32_MAX)
        self.v = merged.astype(np.int32)

    def merge(self, other: "TimeSeriesInt", op: str = "add") -> "TimeSeriesInt":
        """Replay other's window into self by timestamp
        (lua_binding/time_series.c:120-153)."""
        if self.ns_per_row > other.ns_per_row:
            raise ValueError(
                "the resolution of the time series being merged must be "
                "greater than or equal to the destination"
            )
        if op not in ("add", "set"):
            raise ValueError("op must be 'add' or 'set'")
        fn = self.add if op == "add" else self.set
        start = other._window_start()
        idx = other.current_time // other.ns_per_row % other.rows + 1
        src = other.v.copy()  # self-merge must read a stable snapshot
        for i in range(other.rows):
            if idx == other.rows:
                idx = 0
            fn(start + i * other.ns_per_row, int(src[idx]))
            idx += 1
        return self

    def get_range(self, ns: int | None, n: int) -> list[int] | None:
        if n > self.rows:
            raise ValueError("invalid sequence length")
        if ns is None:
            ns = self._window_start()
        else:
            ns = ns - (ns % self.ns_per_row)
        idx = self._find_index(ns, False)
        if idx == -1:
            return None
        out = []
        for i in range(n):
            if idx == self.rows:
                idx = 0
            out.append(int(self.v[idx]))
            idx += 1
        return out

    def stats(
        self, ns: int | None, n: int, stat: str = "sum", include_zero: bool = False
    ) -> tuple[float, int]:
        from ..ops.window import window_stats

        rng = self.get_range(ns, n)
        if rng is None:
            return (math.nan, 0)
        vals = np.asarray(rng, dtype=np.float64)
        if stat == "sd":
            # reference sd = sample sd via running stats (running_stats.c:42)
            v = vals if include_zero else vals[vals != 0]
            if v.size == 0:
                return (math.nan, 0)
            return (float(np.std(v, ddof=1)) if v.size > 1 else 0.0, int(v.size))
        return window_stats(vals, stat, include_zero)

    def matrix_profile(
        self, ns: int | None, n: int, m: int, percent: float = 100.0,
        result: str = "anomaly", seed: int = 42,
    ):
        """SCRIMP over [ns, ns + n rows) (lua_binding/time_series.c:348-427)."""
        from ..ops.matrixprofile import matrix_profile, mp_anomaly

        if n > self.rows or n // 4 < m:
            raise ValueError("invalid sequence length")
        if ns is None:
            ns = self._window_start()
        rng = self.get_range(ns, n)
        if rng is None:
            return None
        mp, mpi = matrix_profile(np.asarray(rng, dtype=np.float64), m, percent, seed)
        if result == "mp":
            return mp
        if result == "mpi":
            return mpi
        an = mp_anomaly(mp, m, current_only=result == "anomaly_current")
        if an is None:
            return None
        idx, pct, dist = an
        return (ns + idx * self.ns_per_row, pct, dist)

    def result(self) -> dict[str, Any]:
        return {"current_time": self.current_time, "rows": self.rows,
                "ns_per_row": self.ns_per_row,
                "values": self.get_range(None, self.rows)}

    # -- codec --------------------------------------------------------------
    def to_reference_bytes(self) -> bytes:
        """Byte-identical to sa_serialize_time_series_int
        (time_series.c:308-340)."""
        return (struct.pack("<QQi", self.current_time, self.ns_per_row, self.rows)
                + self.v.astype("<i4").tobytes())

    def to_bytes(self) -> bytes:
        return _MAGIC + self.to_reference_bytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TimeSeriesInt":
        hdr = 4 + struct.calcsize("<QQi")
        if len(buf) < hdr or buf[:4] != _MAGIC:
            raise CodecError("time_series: bad header")
        current_time, ns_per_row, rows = struct.unpack_from("<QQi", buf, 4)
        body = buf[hdr:]
        if rows < 2 or ns_per_row < 1:
            raise CodecError("time_series: bad dims")
        if len(body) != 4 * rows:
            raise CodecError("time_series: bad length")  # rv 1
        obj = cls(rows, ns_per_row)
        obj.current_time = current_time
        obj.v = np.frombuffer(body, dtype="<i4").astype(np.int32)
        return obj
