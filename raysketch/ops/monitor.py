"""Schema monitor — the reference's production composite, Ray-Data-first.

Faithful recast of heka_message_monitor (lua_binding/luasandbox/sandboxes/
heka/analysis/heka_message_monitor.lua), the reference ecosystem's only
production application: every (hierarchy key, field) gets a SUBTYPE STATE
MACHINE

    unknown → set | sparse | range | unique       (lua :472-614)

with per-interval rotation into matrix rows, P2-histogram snapshots, HLL
duplicate-percentage tracking, and Pearson-correlation-vs-history
alerting (lua :280-412).

Distribution model: the reference processes a sampled stream
single-threaded; here the stream is PARTITIONED BY HIERARCHY KEY
(coarse-bucket groupby) and each key's state machine replays its rows in
deterministic timestamp order inside one reduce task. Per-key results
are identical to the reference's sequential semantics; keys run in
parallel, and per-entry state is bounded (``max_set_size`` values,
``samples × buckets`` matrices) regardless of stream length — the reduce
task's transient input is one key's rows, which at very hot keys is the
same per-key sequentiality the reference itself requires.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches import HyperLogLog
from ..sketches.matrix import MatrixFlt, MatrixInt
from ..sketches.p2 import P2Histogram

# reference value_type codes (lua get_type, :108-121)
TYPE_STRING = 0
TYPE_BINARY = 1
TYPE_INTEGER = 2
TYPE_DOUBLE = 3
TYPE_BOOL = 4
TYPE_MISMATCH = -1

_TYPE_NAMES = {TYPE_MISMATCH: "mismatch", TYPE_BINARY: "binary",
               TYPE_INTEGER: "integer", TYPE_DOUBLE: "double",
               TYPE_BOOL: "bool"}


def type_name(t: int) -> str:
    return _TYPE_NAMES.get(t, "string")


@dataclass(frozen=True)
class MonitorConfig:
    """Reference defaults (lua :70-88)."""

    max_set_size: int = 255
    samples: int = 25
    sample_interval_ns: int = 3600 * 10**9
    histogram_buckets: int = 25
    alert_pcc: float = 0.3
    alert_submissions: int = 1000
    alert_dc: float | None = None  # duplicate_change threshold, fraction
    hll_threshold: int = 50000
    hll_p: int = 14

    def __post_init__(self) -> None:
        if self.samples <= 4:
            raise ValueError("samples must be > 4")  # lua :76

    @property
    def alert_active_ns(self) -> int:
        return self.sample_interval_ns * self.samples  # lua :86

    @property
    def alert_samples(self) -> int:
        return self.samples // 2  # lua :87


class FieldEntry:
    """One (key, field) monitored entry — a direct port of the reference
    ``process_entry`` state machine (lua :472-614). Intervals are the lua
    1-based ``cint``; matrix rows use ``cint - 1``."""

    def __init__(self, created_ns: int, value_type: int, cfg: MonitorConfig) -> None:
        self.cfg = cfg
        self.cnt = 0
        self.created = created_ns
        self.updated = 0
        self.type = value_type
        self.values_cnt = 0
        self.values: dict[Any, Any] = {}
        self.subtype = "unknown"
        self.alerted = 0
        self.cint = 0
        self.p2: P2Histogram | None = None
        self.hll: HyperLogLog | None = None
        self.data: MatrixInt | MatrixFlt | None = None
        self.counts: MatrixInt | None = None

    # -- helpers -----------------------------------------------------------
    def _interval(self, ns: int) -> int:
        c = self.cfg
        return int(ns // c.sample_interval_ns) % c.samples + 1  # lua :475

    def _to_range(self) -> None:
        c = self.cfg
        self.subtype = "range"
        self.p2 = P2Histogram(c.histogram_buckets)
        self.data = MatrixFlt(c.samples, c.histogram_buckets)
        self.counts = MatrixInt(c.samples, 1)

    def _to_unique(self) -> None:
        c = self.cfg
        self.subtype = "unique"
        self.hll = HyperLogLog(c.hll_p)
        self.data = MatrixInt(c.samples, 2)  # cols: total, unique

    # -- the state machine (lua :472-614) ----------------------------------
    def process(self, ns: int, value: Any, value_type: int) -> None:
        c = self.cfg
        interval = self._interval(ns)
        if ns > self.updated:
            self.updated = ns
        self.cnt += 1
        if value_type != self.type:
            self.type = TYPE_MISMATCH  # lua :479-481

        if self.subtype == "unknown":
            v = self.values.get(value)
            if v is not None:
                v["cnt"] += 1
            else:
                self.values_cnt += 1
                self.values[value] = {"idx": self.values_cnt, "cnt": 1}
            if self.cnt == c.max_set_size:  # promotion decision, lua :492-521
                ratio = self.cnt / self.values_cnt
                if self.type in (TYPE_INTEGER, TYPE_DOUBLE):
                    if ratio < 2:
                        self._to_range()  # old data folds into current interval
                    else:
                        self.subtype = "set"
                else:
                    if ratio == 1:
                        self._to_unique()
                    else:
                        self.subtype = "set"
                if self.subtype == "set":
                    self.data = MatrixInt(c.samples, self.values_cnt)
                else:
                    self.values = {}
                    self.values_cnt = 0
                self.cint = interval

        elif self.subtype == "set":  # lua :524-560
            v = self.values.get(value)
            if ns == self.updated and self.cint != interval:
                self.cint = interval
                self.data.clear_row(interval - 1)  # skipped intervals ignored
            if v is not None:
                self.data.add(interval - 1, v["idx"] - 1, 1)
                v["cnt"] += 1
            else:
                if self.values_cnt < c.max_set_size:
                    self.values_cnt += 1
                    m = MatrixInt(c.samples, self.values_cnt)
                    m.merge(self.data)  # grow-by-one copy, lua :536-539
                    m.add(interval - 1, self.values_cnt - 1, 1)
                    self.data = m
                    self.values[value] = {"idx": self.values_cnt, "cnt": 1}
                else:
                    if self.type in (TYPE_INTEGER, TYPE_DOUBLE):
                        # set overflow, numeric → range: replay the set's
                        # value counts into the histogram (lua :543-551)
                        counts_now = {k: t["cnt"] for k, t in self.values.items()}
                        self._to_range()
                        for k, n in counts_now.items():
                            self.counts.add(self.cint - 1, 0, n)
                            for _ in range(n):
                                self.p2.add(float(k))
                    else:
                        # set overflow, non-numeric → sparse weights
                        self.subtype = "sparse"
                        self.values = {k: t["cnt"] for k, t in self.values.items()}
                        self.data = None

        elif self.subtype == "sparse":  # frequency decay, lua :563-589
            w = self.values.get(value)
            if w is not None:
                self.values[value] = w + 1
            else:
                if self.values_cnt == c.max_set_size:
                    for k in list(self.values):
                        if self.values[k] == 1:
                            del self.values[k]
                            self.values_cnt -= 1
                        else:
                            self.values[k] -= 1
                    if self.values_cnt == 0:
                        self._to_unique()
                        self.cint = interval
                        self.values = {}
                else:
                    self.values[value] = 1
                    self.values_cnt += 1

        elif self.subtype == "unique":  # lua :591-600
            if ns == self.updated and self.cint != interval:
                self.data.set(self.cint - 1, 1, int(round(self.hll.estimate())))
                self.data.set(interval - 1, 0, 0)
                self.data.set(interval - 1, 1, 0)
                self.hll = HyperLogLog(c.hll_p)  # hll:clear()
                self.cint = interval
            self.data.add(self.cint - 1, 0, 1)
            self.hll.update_batch([str(value)])

        elif self.subtype == "range" and isinstance(
            value, (int, float, np.integer, np.floating)
        ):
            if ns == self.updated and self.cint != interval:  # lua :602-611
                for i in range(c.histogram_buckets):
                    self.data.set(self.cint - 1, i, self.p2.estimate(i))
                self.counts.set(self.cint - 1, 0,
                                self.p2.count(c.histogram_buckets - 1))
                self.counts.set(interval - 1, 0, 0)
                self.data.clear_row(interval - 1)
                self.p2.clear()
                self.cint = interval
            self.p2.add(float(value))

    # -- reporting (lua output_subtype, :280-412) --------------------------
    def finalize(self) -> dict[str, Any]:
        c = self.cfg
        out: dict[str, Any] = {
            "cnt": self.cnt,
            "type": type_name(self.type),
            "subtype": self.subtype,
            "values_cnt": self.values_cnt if self.subtype in ("unknown", "set", "sparse") else 0,
            "pcc": math.nan, "closest_row": 0,
            "duplicate_pct": math.nan,
            "duplicate_min": math.nan, "duplicate_max": math.nan,
            "range_min": math.nan, "range_max": math.nan,
            "alerted": 0, "alert": "",
        }
        if self.subtype == "set":
            if self.values_cnt > 1:
                r = self.data.pcc(self.cint - 1)
                if r is not None:
                    out["pcc"], out["closest_row"] = r[0], r[1] + 1
                    self._pcc_alert(out, self.data.sum(self.cint - 1),
                                    [self.data.sum(i) for i in range(c.samples)])
        elif self.subtype == "range":
            # snapshot the live histogram into the current row (lua :317-321)
            for i in range(c.histogram_buckets):
                self.data.set(self.cint - 1, i, self.p2.estimate(i))
            self.counts.set(self.cint - 1, 0, self.p2.count(c.histogram_buckets - 1))
            mn = self.p2.estimate(0)
            mx = self.p2.estimate(c.histogram_buckets - 1)
            out["range_min"] = 0.0 if math.isnan(mn) else mn  # lua :322-325
            out["range_max"] = 0.0 if math.isnan(mx) else mx
            r = self.data.pcc(self.cint - 1)
            if r is not None:
                out["pcc"], out["closest_row"] = r[0], r[1] + 1
                self._pcc_alert(out, self.counts.get(self.cint - 1, 0),
                                [self.counts.get(i, 0) for i in range(c.samples)])
        elif self.subtype == "unique":
            self.data.set(self.cint - 1, 1, int(round(self.hll.estimate())))
            self._unique_report(out)
        return out

    def _pcc_alert(self, out: dict, submissions: float, all_sums: list) -> None:
        """set/range pcc alert rule (lua :300-312, :330-345)."""
        c = self.cfg
        if not (submissions >= c.alert_submissions and out["pcc"] <= c.alert_pcc):
            return
        active = sum(
            1 for i in range(c.samples)
            if i != self.cint - 1 and all_sums[i] >= c.alert_submissions
        )
        frac = (self.updated % c.sample_interval_ns) / c.sample_interval_ns
        if (active > c.alert_samples
                and self.updated - self.created >= c.alert_active_ns
                and frac > 0.25):
            self.alerted += 1
            out["alerted"] = self.alerted
            out["alert"] = f"pcc {out['pcc']:.6g} <= {c.alert_pcc}"

    def _unique_report(self, out: dict) -> None:
        """duplicate-percentage rollup + range alert (lua :347-395)."""
        c = self.cfg
        cdupes = pdupes = ptotal = 0.0
        mn, mx, active = 100.0, 0.0, 0
        pint = self.cint - 1 or c.samples  # previous interval, 1-based
        for i in range(1, c.samples + 1):
            unique = self.data.get(i - 1, 1)
            total = self.data.get(i - 1, 0)
            if total == 0:
                continue  # lua nan/inf rows are skipped or clamp to 0 dupes
            dupes = unique / total
            if dupes > 1:
                dupes = 1.0
            dupes = (1 - dupes) * 100
            if i == self.cint:
                cdupes = dupes
            elif i == pint:
                pdupes, ptotal = dupes, total
            elif total >= c.hll_threshold:
                mx = max(mx, dupes)
                mn = min(mn, dupes)
                active += 1
        out["duplicate_pct"] = cdupes
        if active > 1:
            out["duplicate_min"], out["duplicate_max"] = mn, mx
        if (c.alert_dc is not None and ptotal >= c.hll_threshold
                and active > c.alert_samples
                and self.updated - self.created >= c.alert_active_ns):
            delta = (mx - mn) * c.alert_dc * (self.alerted + 1)  # lua :385-391
            if pdupes > mx + delta or pdupes < mn - delta:
                self.alerted += 1
                out["alerted"] = self.alerted
                out["alert"] = (f"duplicate percentage out of range "
                                f"min:{mn:.4g} max:{mx:.4g} previous_hour:{pdupes:.4g}")


def replay_key(rows: pd.DataFrame, ts_col: str, fields: list[tuple[str, int]],
               cfg: MonitorConfig) -> list[dict[str, Any]]:
    """Run one key's rows (already ts-ordered) through per-field entries."""
    entries: dict[str, FieldEntry] = {}
    ts = rows[ts_col].to_numpy(np.int64)
    cols = {name: rows[name].to_numpy() for name, _ in fields}
    for j in range(len(rows)):
        ns = int(ts[j])
        for name, vtype in fields:
            value = cols[name][j]
            if value is None or (isinstance(value, float) and math.isnan(value)):
                continue
            e = entries.get(name)
            if e is None:
                e = FieldEntry(ns, vtype, cfg)
                entries[name] = e
            e.process(ns, value, vtype)
    out = []
    for name, _ in fields:
        if name in entries:
            out.append({"field": name, **entries[name].finalize()})
    return out


def schema_monitor(
    ds,
    key_col: str | list[str],
    ts_col: str,
    fields: list[tuple[str, int]],
    cfg: MonitorConfig | None = None,
    coarse_buckets: int = 64,
):
    """Distributed monitor: coarse-bucket shuffle on the hierarchy key,
    per-key sequential replay in the reduce task.

    ``key_col`` may be one column or a LIST of columns — the reference's
    multi-level ``hierarchy`` config (lua :71-73, e.g. ``{"Logger",
    "Type"}``): each distinct key combination gets its own independent
    field entries, and the output carries one column per hierarchy level.
    ``fields`` is [(column, value_type)] with the reference's type codes;
    ``ts_col`` must be int64 nanoseconds. Returns a Dataset with one row
    per (key..., field). Null key levels report as "NIL" (lua :625)."""
    cfg = cfg or MonitorConfig()
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    needed = key_cols + [ts_col] + [f for f, _ in fields]

    def bucket(batch: pa.Table) -> pa.Table:
        from ..engine.hashing import combine_hash64, hash64_batch_aligned

        h, _ = hash64_batch_aligned(batch[key_cols[0]])
        for kc in key_cols[1:]:
            h2, _ = hash64_batch_aligned(batch[kc])
            h = combine_hash64(h, h2)
        return batch.append_column(
            "kb", pa.array((h % np.uint64(coarse_buckets)).astype(np.int64),
                           pa.int64())
        )

    _OUT_COLS = key_cols + [
        "field", "cnt", "type", "subtype", "values_cnt", "pcc", "closest_row",
        "duplicate_pct", "duplicate_min", "duplicate_max", "range_min",
        "range_max", "alerted", "alert",
    ]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        for kc in key_cols:
            df[kc] = df[kc].fillna("NIL")
        rows = []
        for key, sub in df.groupby(key_cols, sort=True):
            key_tuple = key if isinstance(key, tuple) else (key,)
            # deterministic replay order: ts, then field values break ties
            sub = sub.sort_values([ts_col] + [f for f, _ in fields],
                                  kind="mergesort")
            for r in replay_key(sub, ts_col, fields, cfg):
                rows.append({**dict(zip(key_cols, key_tuple)), **r})
        # schema-stable even when every field value in the bucket was null
        return pd.DataFrame(rows, columns=_OUT_COLS)

    return ds.select_columns(needed).map_batches(
        bucket, batch_format="pyarrow"
    ).groupby("kb").map_groups(
        lambda df: fold(df.drop(columns=["kb"])), batch_format="pandas"
    )
