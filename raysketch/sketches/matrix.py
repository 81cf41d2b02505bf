"""Dense 2-D matrix state (int and float) — the reference's per-group
matrix aggregate re-expressed as a mergeable UDAF.

Semantics follow library/src/matrix.c and lua_binding/matrix.c:

- int matrix initializes to 0 (matrix.c:95-100); float to NaN = "no data"
  (matrix.c:102-108). rows, cols >= 1 (matrix.c:35-60).
- ``add``: int saturates at INT32_MIN/MAX (matrix.c:111-122); float adds,
  treating a NaN cell as assignment (matrix.c:125-135).
- ``set``/``get``: plain cell ops, bounds-checked (here: IndexError; the C
  API returns INT_MIN/FLT_MIN sentinels, matrix.c:24-32).
- ``clear_row``: int zeros / float NaNs one row (matrix.c:63-80).
- ``merge(other, op)``: cell-wise over min(rows) x min(cols); float "add"
  skips NaN SOURCE cells so merged data never clobbers real values
  (lua_binding/matrix.c:561-621).
- ``sum(row)``: float skips NaN (lua_binding/matrix.c:624-658).
- ``pcc(row, match)``: Pearson correlation of ``row`` against every other
  row — ``(sum(xy) - cols*mean1*mean2) / (cols*usd1*usd2)`` with
  population sd, NaN cells counted as 0 for the stats and NaN *products*
  skipped; rows with zero sd give -inf; returns (pcc, row_idx) of the
  best match or None if nothing finite (lua_binding/matrix.c:402-558).
  Goldens: lua_binding/tests/test.lua:504-531 (0.90765069670774,
  0.95831484749991).
- serialize: rows:i32 cols:i32 + row-major cells LE, restore validates
  dims (matrix.c:173-305); our envelope adds a 4-byte magic.

UDAF shape: ``update_batch`` scatters (row, col, value) observation
triples — the engine's grouped aggregation builds one matrix per group
key from columnar triples, partials merge cell-wise.
"""

from __future__ import annotations

import math
import struct
from typing import Any

import numpy as np

from .base import CodecError

_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


class _MatrixBase:
    dtype: Any = None
    _magic: bytes = b""

    def __init__(self, rows: int, cols: int) -> None:
        if rows < 1 or cols < 1:
            raise ValueError("rows and cols must be >= 1")
        self.rows, self.cols = int(rows), int(cols)
        self.v = self._init_cells(self.rows, self.cols)

    # -- construction helpers ---------------------------------------------
    @staticmethod
    def _init_cells(rows: int, cols: int) -> np.ndarray:
        raise NotImplementedError

    def get_configuration(self) -> tuple[int, int]:
        return self.rows, self.cols

    def _check(self, row: int, col: int) -> None:
        if not (0 <= row < self.rows and 0 <= col < self.cols):
            raise IndexError(f"cell ({row},{col}) out of range")

    def get(self, row: int, col: int) -> float:
        self._check(row, col)
        return self.v[row, col].item()

    def set(self, row: int, col: int, value) -> None:
        self._check(row, col)
        self.v[row, col] = value

    def get_row(self, row: int) -> np.ndarray:
        if not (0 <= row < self.rows):
            raise IndexError("row out of range")
        return self.v[row].copy()

    # -- UDAF protocol -----------------------------------------------------
    def update_batch(self, values: Any) -> None:
        """Absorb a chunk of (row, col, value) triples.

        Accepts an Arrow Table/StructArray/dict with 'row', 'col', 'value'
        fields; applies vectorized scatter-ADD with the type's semantics.
        """
        import pyarrow as pa

        if isinstance(values, (pa.Table, pa.RecordBatch)):
            r = np.asarray(values["row"], dtype=np.int64)
            c = np.asarray(values["col"], dtype=np.int64)
            x = np.asarray(values["value"], dtype=np.float64)
        elif isinstance(values, dict):
            r = np.asarray(values["row"], dtype=np.int64)
            c = np.asarray(values["col"], dtype=np.int64)
            x = np.asarray(values["value"], dtype=np.float64)
        else:  # sequence of triples
            arr = np.asarray(list(values), dtype=np.float64).reshape(-1, 3)
            r, c = arr[:, 0].astype(np.int64), arr[:, 1].astype(np.int64)
            x = arr[:, 2]
        if ((r < 0) | (r >= self.rows) | (c < 0) | (c >= self.cols)).any():
            raise IndexError("matrix update_batch: cell out of range")
        self._scatter_add(r, c, x)

    def result(self) -> dict[str, Any]:
        return {"rows": self.rows, "cols": self.cols,
                "row_sums": [self.sum(i) for i in range(self.rows)]}

    # -- analytics ---------------------------------------------------------
    def _stats_rows(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-row (mean, population sd) with NaN counted as 0
        (lua_binding/matrix.c:445-470 getrs_flt)."""
        data = np.nan_to_num(self.v.astype(np.float64), nan=0.0)
        mean = data.mean(axis=1)
        usd = data.std(axis=1)  # population sd == usd
        return mean, usd

    def pcc(self, row: int, match: str = "max") -> tuple[float, int] | None:
        if not (0 <= row < self.rows):
            raise IndexError("row out of range")
        if match not in ("max", "min"):
            raise ValueError("match must be 'max' or 'min'")
        if self.rows < 2:
            return None
        mean, usd = self._stats_rows()
        M = self.v.astype(np.float64)
        # NaN products are skipped, not treated as 0-valued cells
        prods = np.nan_to_num(M * M[row], nan=0.0)
        dsum = prods.sum(axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = (dsum - self.cols * mean * mean[row]) / (
                self.cols * usd * usd[row]
            )
        d = np.where((usd == 0) | (usd[row] == 0), -math.inf, d)
        d[row] = math.nan
        cand = np.delete(np.arange(self.rows), row)
        vals = d[cand]
        pick = int(np.argmax(vals)) if match == "max" else int(np.argmin(vals))
        best = float(vals[pick])
        if not math.isfinite(best):
            return None
        return best, int(cand[pick])

    # -- codec -------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = self._magic + struct.pack("<2i", self.rows, self.cols)
        return head + self.v.astype(self.v.dtype.newbyteorder("<")).tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "_MatrixBase":
        hdr = 4 + 8
        if len(buf) < hdr or buf[:4] != cls._magic:
            raise CodecError("matrix: bad header")
        rows, cols = struct.unpack_from("<2i", buf, 4)
        body = buf[hdr:]
        obj = cls(rows, cols)
        expect = rows * cols * obj.v.dtype.itemsize
        if len(body) != expect:
            raise CodecError("matrix: bad length")
        obj.v = np.frombuffer(body, dtype=obj.v.dtype.newbyteorder("<")).astype(
            obj.v.dtype
        ).reshape(rows, cols)
        return obj


class MatrixInt(_MatrixBase):
    kind = "matrix_int"
    _magic = b"MXI1"

    @staticmethod
    def _init_cells(rows: int, cols: int) -> np.ndarray:
        return np.zeros((rows, cols), dtype=np.int32)

    def add(self, row: int, col: int, v: int) -> int:
        self._check(row, col)
        nv = int(self.v[row, col]) + int(v)
        nv = min(max(nv, _I32_MIN), _I32_MAX)  # matrix.c:115-120 saturation
        self.v[row, col] = nv
        return nv

    def _scatter_add(self, r: np.ndarray, c: np.ndarray, x: np.ndarray) -> None:
        acc = self.v.astype(np.int64)
        np.add.at(acc, (r, c), x.astype(np.int64))
        self.v = np.clip(acc, _I32_MIN, _I32_MAX).astype(np.int32)

    def clear_row(self, row: int) -> None:
        if 0 <= row < self.rows:
            self.v[row] = 0

    def sum(self, row: int) -> float:
        if not (0 <= row < self.rows):
            raise IndexError("row out of range")
        return float(self.v[row].astype(np.float64).sum())

    def merge(self, other: "MatrixInt", op: str = "add") -> "MatrixInt":
        if getattr(other, "kind", None) != self.kind:
            # mismatched matrix types refuse to merge (test.lua:459-463)
            raise TypeError("matrix merge: mismatched matrix types")
        rows = min(self.rows, other.rows)
        cols = min(self.cols, other.cols)
        src = other.v[:rows, :cols]
        if op == "add":
            acc = self.v[:rows, :cols].astype(np.int64) + src.astype(np.int64)
            self.v[:rows, :cols] = np.clip(acc, _I32_MIN, _I32_MAX).astype(np.int32)
        elif op == "set":
            self.v[:rows, :cols] = src
        else:
            raise ValueError("op must be 'add' or 'set'")
        return self


class MatrixFlt(_MatrixBase):
    kind = "matrix_flt"
    _magic = b"MXF1"

    @staticmethod
    def _init_cells(rows: int, cols: int) -> np.ndarray:
        return np.full((rows, cols), np.nan, dtype=np.float32)

    def add(self, row: int, col: int, v: float) -> float:
        self._check(row, col)
        cur = self.v[row, col]
        self.v[row, col] = v if np.isnan(cur) else cur + np.float32(v)
        return float(self.v[row, col])

    def _scatter_add(self, r: np.ndarray, c: np.ndarray, x: np.ndarray) -> None:
        acc = np.nan_to_num(self.v.astype(np.float64), nan=0.0)
        touched = np.zeros_like(acc, dtype=bool)
        touched[r, c] = True
        np.add.at(acc, (r, c), x)
        keep_nan = np.isnan(self.v) & ~touched
        out = acc.astype(np.float32)
        out[keep_nan] = np.nan
        self.v = out

    def clear_row(self, row: int) -> None:
        if 0 <= row < self.rows:
            self.v[row] = np.nan

    def sum(self, row: int) -> float:
        if not (0 <= row < self.rows):
            raise IndexError("row out of range")
        return float(np.nansum(self.v[row].astype(np.float64)))

    def merge(self, other: "MatrixFlt", op: str = "add") -> "MatrixFlt":
        if getattr(other, "kind", None) != self.kind:
            # mismatched matrix types refuse to merge (test.lua:602-606)
            raise TypeError("matrix merge: mismatched matrix types")
        rows = min(self.rows, other.rows)
        cols = min(self.cols, other.cols)
        src = other.v[:rows, :cols]
        dst = self.v[:rows, :cols]
        if op == "add":
            # NaN source cells are skipped; NaN dest + real source = assign
            both = ~np.isnan(src) & ~np.isnan(dst)
            assign = ~np.isnan(src) & np.isnan(dst)
            out = dst.copy()
            out[both] = dst[both] + src[both]
            out[assign] = src[assign]
            self.v[:rows, :cols] = out
        elif op == "set":
            self.v[:rows, :cols] = src  # unconditional, NaN included
        else:
            raise ValueError("op must be 'add' or 'set'")
        return self
