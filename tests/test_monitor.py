"""Golden tests for the schema monitor composite — the subtype state
machine, interval rotation, snapshots, and alert rules of
heka_message_monitor.lua:472-614 (process_entry) and :280-412
(output_subtype), replayed on deterministic fixtures.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.ops.monitor import (TYPE_DOUBLE, TYPE_INTEGER, TYPE_STRING,
                                   FieldEntry, MonitorConfig, schema_monitor)

H = 3600 * 10**9  # 1h in ns


def feed(entry, obs):
    for ns, value, vtype in obs:
        entry.process(ns, value, vtype)
    return entry


def make(vtype, cfg=None):
    cfg = cfg or MonitorConfig()
    return FieldEntry(0, vtype, cfg)


class TestSubtypePromotion:
    """lua :492-521 — the decision at cnt == max_set_size."""

    def test_numeric_low_ratio_becomes_range(self):
        # 255 obs over 200 distinct values: ratio 255/200 < 2
        e = make(TYPE_DOUBLE)
        feed(e, [(i, float(i % 200), TYPE_DOUBLE) for i in range(255)])
        assert e.subtype == "range"
        assert e.p2 is not None and e.data is not None and e.counts is not None
        assert e.values == {}  # collected values dropped, lua :516-519

    def test_numeric_high_ratio_becomes_set(self):
        # 255 obs over 50 distinct: ratio > 2
        e = make(TYPE_INTEGER)
        feed(e, [(i, i % 50, TYPE_INTEGER) for i in range(255)])
        assert e.subtype == "set"
        assert e.values_cnt == 50
        assert e.data.get_configuration() == (25, 50)

    def test_all_distinct_strings_become_unique(self):
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i}", TYPE_STRING) for i in range(255)])
        assert e.subtype == "unique"
        assert e.hll is not None
        assert e.data.get_configuration() == (25, 2)

    def test_repeating_strings_become_set(self):
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i % 10}", TYPE_STRING) for i in range(255)])
        assert e.subtype == "set"
        assert e.values_cnt == 10

    def test_below_threshold_stays_unknown(self):
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i}", TYPE_STRING) for i in range(254)])
        assert e.subtype == "unknown"
        assert e.values_cnt == 254

    def test_type_mismatch_flag(self):
        e = make(TYPE_INTEGER)
        e.process(0, 1, TYPE_INTEGER)
        e.process(1, "x", TYPE_STRING)
        assert e.type == -1  # lua :479-481


class TestSetTransitions:
    def test_set_grows_then_numeric_overflow_to_range(self):
        """lua :536-551 — grow by one column per new value; on the 256th
        distinct numeric value replay the set counts into the P2."""
        e = make(TYPE_INTEGER)
        feed(e, [(i, i % 50, TYPE_INTEGER) for i in range(255)])
        assert e.subtype == "set"
        # add new distinct values up to the 255-value cap
        t = 255
        for v in range(50, 255):
            e.process(t, v, TYPE_INTEGER)
            t += 1
        assert e.subtype == "set" and e.values_cnt == 255
        total_before = sum(tt["cnt"] for tt in e.values.values())
        e.process(t, 999, TYPE_INTEGER)  # 256th distinct → convert
        assert e.subtype == "range"
        # the replay pushed every collected count into the interval counter
        assert e.counts.get(e.cint - 1, 0) == total_before

    def test_set_string_overflow_to_sparse(self):
        """lua :552-557 — non-numeric overflow converts values to weights."""
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i % 10}", TYPE_STRING) for i in range(255)])
        t = 255
        for v in range(10, 255):
            e.process(t, f"v{v}", TYPE_STRING)
            t += 1
        assert e.subtype == "set" and e.values_cnt == 255
        e.process(t, "overflow", TYPE_STRING)
        assert e.subtype == "sparse"
        assert e.data is None
        assert all(isinstance(w, int) for w in e.values.values())

    def test_set_interval_rotation_clears_row(self):
        """lua :526-529 — advancing the newest-ns interval clears the new
        row; out-of-order old data does NOT rotate."""
        cfg = MonitorConfig()
        e = make(TYPE_STRING, cfg)
        feed(e, [(i, f"v{i % 10}", TYPE_STRING) for i in range(255)])
        int0 = e.cint
        # out-of-order OLD observation: no rotation
        e.process(100, "v0", TYPE_STRING)
        assert e.cint == int0
        # newest obs in the next interval: rotation
        e.process(H + 1, "v1", TYPE_STRING)
        assert e.cint == int0 + 1
        row = e.data.get_row(e.cint - 1)
        assert row.sum() == 1  # cleared then one add


class TestSparse:
    def test_sparse_decay_and_eviction(self):
        """lua :567-580 — at the cap, every weight decays by 1 and
        weight-1 values evict."""
        cfg = MonitorConfig(max_set_size=5)
        e = make(TYPE_STRING, cfg)
        # 5 obs of 3 distinct → cnt==max_set_size(5), ratio 5/3 < 2... but
        # strings: ratio != 1 → set. Overflow the 5-value set to sparse.
        feed(e, [(i, f"v{i % 3}", TYPE_STRING) for i in range(5)])
        assert e.subtype == "set"
        e.process(5, "v3", TYPE_STRING)
        e.process(6, "v4", TYPE_STRING)
        assert e.values_cnt == 5
        e.process(7, "v5", TYPE_STRING)  # overflow → sparse
        assert e.subtype == "sparse"
        # now at cap (5 values); a new value triggers decay
        before = dict(e.values)
        e.process(8, "fresh", TYPE_STRING)
        assert all(e.values[k] == w - 1 for k, w in before.items() if w > 1)
        assert all(k in e.values or w == 1 for k, w in before.items())

    def test_sparse_full_decay_to_unique(self):
        """lua :581-588 — when decay empties the table, become unique."""
        cfg = MonitorConfig(max_set_size=5)
        e = make(TYPE_STRING, cfg)
        feed(e, [(i, f"v{i}", TYPE_STRING) for i in range(4)])
        e.process(4, "w", TYPE_STRING)  # 5 obs, 5 distinct → unique
        # ratio == 1 → unique immediately, so craft the sparse path instead
        e2 = make(TYPE_STRING, cfg)
        feed(e2, [(0, "a", TYPE_STRING), (1, "a", TYPE_STRING),
                  (2, "b", TYPE_STRING), (3, "c", TYPE_STRING),
                  (4, "d", TYPE_STRING)])
        assert e2.subtype == "set"
        e2.process(5, "e", TYPE_STRING)
        e2.process(6, "f", TYPE_STRING)  # grows to cap (5 values)
        e2.process(7, "g", TYPE_STRING)  # overflow → sparse, weights
        assert e2.subtype == "sparse"
        # decay repeatedly with fresh values until empty → unique
        t = 8
        while e2.subtype == "sparse":
            e2.process(t, f"fresh{t}", TYPE_STRING)
            t += 1
            if t > 100:
                break
        assert e2.subtype == "unique"


class TestUniqueRotation:
    def test_hll_snapshot_on_interval_advance(self):
        """lua :591-600 — rotation stores the HLL count in col 2 and
        resets; duplicate_pct = (1 - unique/total) * 100."""
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i}", TYPE_STRING) for i in range(255)])
        assert e.subtype == "unique"
        # interval 1: 100 obs of 50 distinct
        base = 255
        for i in range(100):
            e.process(base + i, f"u{i % 50}", TYPE_STRING)
        int0 = e.cint
        # next interval forces the snapshot
        e.process(H + 1000, "next", TYPE_STRING)
        assert e.cint != int0
        assert e.data.get(int0 - 1, 0) == 100  # total
        assert e.data.get(int0 - 1, 1) == 50   # sparse-exact HLL distinct
        out = e.finalize()
        assert out["subtype"] == "unique"

    def test_duplicate_pct_current_interval(self):
        e = make(TYPE_STRING)
        feed(e, [(i, f"v{i}", TYPE_STRING) for i in range(255)])
        for i in range(100):
            e.process(300 + i, f"u{i % 25}", TYPE_STRING)
        out = e.finalize()
        # current interval: 100 totals, 25 distinct → 75% duplicates
        assert out["duplicate_pct"] == pytest.approx(75.0)


class TestRangeRotation:
    def test_histogram_snapshot_and_counts(self):
        """lua :602-611 — rotation snapshots all bucket estimates and the
        marker count, then clears the histogram."""
        cfg = MonitorConfig(histogram_buckets=25)
        e = make(TYPE_DOUBLE, cfg)
        feed(e, [(i, float(i % 200), TYPE_DOUBLE) for i in range(255)])
        assert e.subtype == "range"
        rng = np.random.default_rng(7)
        for i, x in enumerate(rng.normal(50, 10, 500)):
            e.process(1000 + i, float(x), TYPE_DOUBLE)
        int0 = e.cint
        e.process(H + 1, 50.0, TYPE_DOUBLE)
        assert e.cint != int0
        row = e.data.get_row(int0 - 1)
        assert np.isfinite(row).all() and (np.diff(row) >= 0).all()
        # count snapshot = marker buckets-1 counter (lua uses b-1, not b)
        assert e.counts.get(int0 - 1, 0) > 0
        # new histogram cleared: estimates NaN until it refills
        assert math.isnan(e.p2.estimate(0))

    def test_finalize_min_max(self):
        cfg = MonitorConfig(histogram_buckets=25)
        e = make(TYPE_DOUBLE, cfg)
        feed(e, [(i, float(i % 200), TYPE_DOUBLE) for i in range(255)])
        for i, x in enumerate(np.linspace(10, 90, 200)):
            e.process(1000 + i, float(x), TYPE_DOUBLE)
        out = e.finalize()
        assert out["range_min"] == pytest.approx(10.0)
        # lua reads estimate(buckets-1), the second-to-last marker
        assert 80 <= out["range_max"] <= 90


class TestPccAlert:
    def _build_set_history(self, flip_last: bool):
        """25 six-hour... (1h) intervals of set data, ≥1000 obs each; the
        current interval's distribution optionally flipped."""
        cfg = MonitorConfig()
        e = make(TYPE_STRING, cfg)
        vals = ["a", "b", "c"]
        feed(e, [(i, vals[i % 3], TYPE_STRING) for i in range(255)])
        assert e.subtype == "set"
        t = 0
        for interval in range(26):
            base = (interval + 1) * H + 1
            if flip_last and interval == 25:
                dist = [10, 100, 1200]
            else:
                dist = [1200, 100, 10]
            n = 0
            for v, k in zip(vals, dist):
                for _ in range(k):
                    # land the final obs > 0.25 into the interval
                    e.process(base + n * 1000 + H // 3, v, TYPE_STRING)
                    n += 1
            t = base
        return e

    def test_anticorrelated_current_interval_alerts(self):
        e = self._build_set_history(flip_last=True)
        out = e.finalize()
        assert out["pcc"] <= 0.3
        assert out["alerted"] == 1
        assert "pcc" in out["alert"]

    def test_correlated_history_does_not_alert(self):
        e = self._build_set_history(flip_last=False)
        out = e.finalize()
        assert out["pcc"] > 0.3
        assert out["alerted"] == 0


class TestDistributedMonitor:
    def test_schema_monitor_deterministic_and_parallel(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        n = 3000
        t = pa.table({
            "k": pa.array(rng.choice(["x", "y", "z"], n)),
            "ns": pa.array((rng.integers(0, 10, n) * H
                            + rng.integers(0, H, n)).astype(np.int64), pa.int64()),
            "s": pa.array([f"s{v}" for v in rng.integers(0, 40, n)], pa.string()),
            "d": pa.array(rng.normal(0, 1, n), pa.float64()),
        })
        fields = [("s", TYPE_STRING), ("d", TYPE_DOUBLE)]
        a = schema_monitor(rd.from_arrow(t), "k", "ns", fields).to_pandas()
        b = schema_monitor(rd.from_arrow(t).repartition(7), "k", "ns",
                           fields).to_pandas()
        a = a.sort_values(["k", "field"]).reset_index(drop=True)
        b = b.sort_values(["k", "field"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert set(a["field"]) == {"s", "d"}
        assert len(a) == 6

    def test_multi_level_hierarchy(self, ray_session):
        """A two-level hierarchy monitors each (level1, level2) key
        combination independently, matching the reference's nested
        hierarchy tables (lua :71-73, :627-632); null keys read "NIL"."""
        import ray.data as rd

        rng = np.random.default_rng(9)
        n = 1200
        t = pa.table({
            "logger": pa.array(rng.choice(["app", "web"], n)),
            "typ": pa.array([None if i % 97 == 0 else v for i, v in
                             enumerate(rng.choice(["err", "ok"], n))],
                            pa.string()),
            "ns": pa.array((rng.integers(0, 5, n) * H
                            + rng.integers(0, H, n)).astype(np.int64)),
            "s": pa.array([f"s{v}" for v in rng.integers(0, 20, n)], pa.string()),
        })
        out = schema_monitor(rd.from_arrow(t), ["logger", "typ"], "ns",
                             [("s", TYPE_STRING)]).to_pandas()
        assert set(out.columns) >= {"logger", "typ", "field", "subtype"}
        assert "NIL" in set(out["typ"])
        # every observed (logger, typ) combination has its own entry
        assert len(out) == out[["logger", "typ"]].drop_duplicates().shape[0]
        # determinism under repartition
        out2 = schema_monitor(rd.from_arrow(t).repartition(5), ["logger", "typ"],
                              "ns", [("s", TYPE_STRING)]).to_pandas()
        a = out.sort_values(["logger", "typ"]).reset_index(drop=True)
        b = out2.sort_values(["logger", "typ"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_matches_sequential_replay(self, ray_session):
        """Distributed result == single-process sequential replay."""
        import ray.data as rd

        from raysketch.ops.monitor import replay_key

        rng = np.random.default_rng(5)
        n = 2000
        t = pa.table({
            "k": pa.array(["only"] * n),
            "ns": pa.array(np.sort(rng.integers(0, 5 * H, n)).astype(np.int64)),
            "s": pa.array([f"s{v}" for v in rng.integers(0, 30, n)], pa.string()),
        })
        fields = [("s", TYPE_STRING)]
        dist = schema_monitor(rd.from_arrow(t), "k", "ns", fields).to_pandas()
        df = t.to_pandas().sort_values(["ns", "s"], kind="mergesort")
        seq = replay_key(df, "ns", fields, MonitorConfig())
        assert len(dist) == 1 and len(seq) == 1
        d, s = dist.iloc[0], seq[0]
        for col in ("cnt", "subtype", "values_cnt", "closest_row"):
            assert d[col] == s[col], col
        assert d["pcc"] == pytest.approx(s["pcc"], nan_ok=True)
