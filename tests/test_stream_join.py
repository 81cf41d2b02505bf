"""as-of join, interval (range) join, and sessionization tests.

Covers both as-of routes (broadcast vs partitioned — identity-pinned),
tie determinism, unmatched-row semantics, the interval join against a
brute-force reference, and sessionize against a pure-pandas reference.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk_ds(df: pd.DataFrame, parallelism: int = 4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


def _asof_brute(l: pd.DataFrame, r: pd.DataFrame, lk, rk, lt, rt, vals, tiebreak):
    """Per-left-row brute force: latest right at or before left ts,
    ties -> max tiebreak."""
    out = []
    for _, row in l.iterrows():
        cand = r[(r[rk] == row[lk]) & (r[rt] <= row[lt])]
        if len(cand) == 0:
            out.append({**row.to_dict(), **{c: None for c in vals}})
            continue
        best_t = cand[rt].max()
        cand = cand[cand[rt] == best_t]
        best = cand.sort_values(tiebreak).iloc[-1]
        out.append({**row.to_dict(), **{c: best[c] for c in vals}})
    return pd.DataFrame(out)


@pytest.fixture()
def asof_frames():
    rng = np.random.default_rng(7)
    n_l, n_r, n_keys = 400, 300, 12
    l = pd.DataFrame(
        {
            "lid": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_l).astype(np.int64),
            "t": rng.integers(0, 10_000, n_l).astype(np.int64),
        }
    )
    r = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 3, n_r).astype(np.int64),  # some keys missing
            "rt": rng.integers(-500, 9_000, n_r).astype(np.int64),
            "rid": np.arange(n_r, dtype=np.int64),
            "val": rng.normal(size=n_r),
        }
    )
    # force (key, ts) ties so the tiebreak rule is actually exercised
    r.loc[:25, "rt"] = 1000
    r.loc[:25, "k"] = 3
    return l, r


class TestAsofJoin:
    def test_broadcast_matches_brute_force(self, ray_session, asof_frames):
        from raysketch.ops.stream_join import asof_join

        l, r = asof_frames
        got = (
            asof_join(
                _mk_ds(l), _mk_ds(r), "k", "k", "t", "rt",
                ["rid", "val"], tiebreak="rid", how="left",
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = (
            _asof_brute(l, r, "k", "k", "t", "rt", ["rid", "val"], "rid")
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert len(got) == len(l)
        g_rid = got["rid"].astype("float64").to_numpy()
        e_rid = exp["rid"].astype("float64").to_numpy()
        assert ((g_rid == e_rid) | (np.isnan(g_rid) & np.isnan(e_rid))).all()
        g_v, e_v = got["val"].to_numpy(), exp["val"].astype("float64").to_numpy()
        assert ((g_v == e_v) | (np.isnan(g_v) & np.isnan(e_v))).all()

    def test_partitioned_route_identical(self, ray_session, asof_frames):
        from raysketch.ops.stream_join import asof_join

        l, r = asof_frames
        kw = dict(right_vals=["rid", "val"], tiebreak="rid", how="left")
        a = (
            asof_join(_mk_ds(l), _mk_ds(r), "k", "k", "t", "rt", **kw)
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        b = (
            asof_join(
                _mk_ds(l), _mk_ds(r), "k", "k", "t", "rt",
                broadcast_rows_limit=0, num_buckets=16, **kw,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        for c in ["lid", "k", "t"]:
            assert (a[c].to_numpy() == b[c].to_numpy()).all()
        ar, br = a["rid"].to_numpy(), b["rid"].to_numpy()
        assert ((ar == br) | (np.isnan(ar) & np.isnan(br))).all()

    def test_routes_pinned(self, ray_session, asof_frames, monkeypatch):
        """Default routes broadcast under the limit; 0-limit forces the
        partitioned plan (identity checked above — here we pin WHICH
        plan runs by observing the right-side ray.put broadcast)."""
        import ray

        from raysketch.ops import stream_join

        l, r = asof_frames
        ds_l, ds_r = _mk_ds(l), _mk_ds(r)  # build BEFORE patching ray.put
        puts = []
        orig_put = ray.put

        def spy_put(o, **kw):
            # the broadcast right side is the only put carrying __t_us
            # (Ray Data internals also put raw Table blocks)
            if isinstance(o, pa.Table) and "__t_us" in o.column_names:
                puts.append("broadcast")
            return orig_put(o, **kw)

        monkeypatch.setattr(ray, "put", spy_put)
        stream_join.asof_join(ds_l, ds_r, "k", "k", "t", "rt", ["rid"], how="inner")
        assert "broadcast" in puts, "broadcast plan should ray.put the right side"
        puts.clear()
        stream_join.asof_join(
            ds_l, ds_r, "k", "k", "t", "rt", ["rid"], how="inner",
            broadcast_rows_limit=0,
        )
        assert "broadcast" not in puts, "partitioned plan must not broadcast"

    def test_inner_drops_unmatched(self, ray_session, asof_frames):
        from raysketch.ops.stream_join import asof_join

        l, r = asof_frames
        got = asof_join(
            _mk_ds(l), _mk_ds(r), "k", "k", "t", "rt", ["rid"], how="inner"
        ).to_pandas()
        exp = _asof_brute(l, r, "k", "k", "t", "rt", ["rid"], "rid")
        assert len(got) == int(exp["rid"].notna().sum())
        assert got["rid"].notna().all()

    def test_empty_right_side(self, ray_session, asof_frames):
        import ray.data as rd

        from raysketch.ops.stream_join import asof_join

        l, _ = asof_frames
        # schema survives only via from_arrow for an EMPTY side (a
        # repartitioned empty from_pandas dataset is fully schema-less,
        # which asof_join rejects with a clear error — also pinned here)
        empty = pa.table(
            {"k": pa.array([], pa.int64()), "rt": pa.array([], pa.int64()),
             "rid": pa.array([], pa.int64())}
        )
        r_ds = rd.from_arrow(empty)
        out = asof_join(
            _mk_ds(l), r_ds, "k", "k", "t", "rt", ["rid"], how="left"
        ).to_pandas()
        assert len(out) == len(l)
        assert out["rid"].isna().all()
        inner = asof_join(
            _mk_ds(l), r_ds, "k", "k", "t", "rt", ["rid"], how="inner"
        ).to_pandas()
        assert len(inner) == 0
        schemaless = rd.from_pandas(
            pd.DataFrame({"k": [], "rt": [], "rid": []})
        ).repartition(1)
        if schemaless.schema(fetch_if_missing=True) is None:
            with pytest.raises(ValueError, match="no schema"):
                asof_join(_mk_ds(l), schemaless, "k", "k", "t", "rt", ["rid"])

    def test_int64_ids_survive_partitioned_left_join(self, ray_session):
        """ids above 2^53 must come back exact even with unmatched rows
        in the same bucket (the nullable-int float-widening trap)."""
        from raysketch.ops.stream_join import asof_join

        big = (1 << 60) + 12345
        l = pd.DataFrame({"k": [1, 2], "t": [10, 10]})
        r = pd.DataFrame({"k": [1], "rt": [5], "rid": [big]})
        out = (
            asof_join(
                _mk_ds(l, 1), _mk_ds(r, 1), "k", "k", "t", "rt", ["rid"],
                how="left", broadcast_rows_limit=0, num_buckets=4,
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert out.loc[0, "rid"] == big
        assert pd.isna(out.loc[1, "rid"])

    @pytest.mark.parametrize("limit", [10**6, 0], ids=["broadcast", "partitioned"])
    def test_null_keys_never_match(self, ray_session, limit):
        """Null int64 keys must not float-widen the match frame (merge_asof
        dtype check) and must come back unmatched on both routes."""
        import ray.data as rd

        from raysketch.ops.stream_join import asof_join

        lt = pa.table(
            {"lid": pa.array([1, 2, 3], pa.int64()),
             "k": pa.array([1, None, 2], pa.int64()),
             "t": pa.array([10, 10, 10], pa.int64())}
        )
        r = pd.DataFrame({"k": [1, 2], "rt": [5, 50], "rid": [100, 200]})
        out = (
            asof_join(
                rd.from_arrow(lt), rd.from_pandas(r), "k", "k", "t", "rt",
                ["rid"], how="left", broadcast_rows_limit=limit, num_buckets=4,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        assert len(out) == 3
        assert out.loc[0, "rid"] == 100
        assert pd.isna(out.loc[1, "rid"])  # null key: unmatched
        assert pd.isna(out.loc[2, "rid"])  # rt=50 is after t=10

    def test_validation(self, ray_session, asof_frames):
        from raysketch.ops.stream_join import asof_join

        l, r = asof_frames
        with pytest.raises(ValueError, match="right_vals"):
            asof_join(_mk_ds(l), _mk_ds(r), "k", "k", "t", "rt", [])
        with pytest.raises(ValueError, match="how"):
            asof_join(_mk_ds(l), _mk_ds(r), "k", "k", "t", "rt", ["rid"], how="outer")
        with pytest.raises(ValueError, match="collide"):
            asof_join(_mk_ds(l), _mk_ds(r), "k", "k", "t", "rt", ["t"])


class TestIntervalJoin:
    def test_overlapping_matches_brute_force(self, ray_session):
        from raysketch.ops.stream_join import interval_join

        rng = np.random.default_rng(11)
        pts = pd.DataFrame(
            {"pid": np.arange(500, dtype=np.int64),
             "t": rng.integers(0, 5000, 500).astype(np.int64)}
        )
        lo = rng.integers(0, 4800, 40).astype(np.int64)
        ln = rng.integers(1, 900, 40).astype(np.int64)
        iv = pd.DataFrame({"lo": lo, "hi": lo + ln,
                           "interval_id": np.arange(40, dtype=np.int64)})
        got = (
            interval_join(_mk_ds(pts), iv, "t")
            .to_pandas().sort_values(["pid", "interval_id"]).reset_index(drop=True)
        )
        exp = []
        for _, p in pts.iterrows():
            m = iv[(iv["lo"] <= p["t"]) & (p["t"] < iv["hi"])]
            exp += [(p["pid"], i) for i in m["interval_id"]]
        exp = pd.DataFrame(exp, columns=["pid", "interval_id"]).sort_values(
            ["pid", "interval_id"]).reset_index(drop=True)
        assert len(got) == len(exp)
        assert (got["pid"].to_numpy() == exp["pid"].to_numpy()).all()
        assert (got["interval_id"].to_numpy() == exp["interval_id"].to_numpy()).all()

    def test_no_match_batch_and_carry_cols(self, ray_session):
        from raysketch.ops.stream_join import interval_join

        pts = pd.DataFrame({"pid": [1, 2], "t": [100, 200], "x": ["a", "b"]})
        iv = pd.DataFrame({"lo": [1000], "hi": [2000], "interval_id": [0]})
        out = interval_join(_mk_ds(pts, 1), iv, "t", carry_cols=["x"]).to_pandas()
        assert len(out) == 0
        # an all-empty Dataset may lose its schema on to_pandas (same Ray
        # quirk _pairs_df documents) — accept either shape
        assert set(out.columns) in (set(), {"x", "t", "interval_id"})

    def test_validation(self, ray_session):
        from raysketch.ops.stream_join import interval_join

        pts = _mk_ds(pd.DataFrame({"t": [1]}), 1)
        with pytest.raises(ValueError, match="empty"):
            interval_join(pts, pd.DataFrame({"lo": [], "hi": [], "interval_id": []}), "t")
        with pytest.raises(ValueError, match="hi > lo"):
            interval_join(
                pts, pd.DataFrame({"lo": [5], "hi": [5], "interval_id": [0]}), "t"
            )


def _sess_brute(df: pd.DataFrame, gap: int) -> pd.DataFrame:
    rows = []
    for k, g in df.sort_values(["k", "t"]).groupby("k"):
        sid, start, last, n, vs = 0, None, None, 0, 0
        for _, e in g.iterrows():
            if last is None or e["t"] - last > gap:
                if last is not None:
                    rows.append((k, sid, start, last, n, vs))
                sid += 1
                start, n, vs = e["t"], 0, 0
            last = e["t"]
            n += 1
            vs += e["v"]
        rows.append((k, sid, start, last, n, vs))
    return pd.DataFrame(
        rows, columns=["k", "session_id", "session_start_us",
                       "session_end_us", "n_events", "sum_value"]
    )


class TestSessionize:
    def test_matches_brute_force(self, ray_session):
        from raysketch.ops.window import sessionize

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 20, 800).astype(np.int64),
                "t": rng.integers(0, 100_000, 800).astype(np.int64),
                "v": rng.integers(0, 50, 800).astype(np.int64),
            }
        ).drop_duplicates(["k", "t"])
        got = (
            sessionize(_mk_ds(df), "k", "t", gap_us=500, value_col="v")
            .to_pandas().sort_values(["k", "session_id"]).reset_index(drop=True)
        )
        exp = _sess_brute(df, 500).sort_values(["k", "session_id"]).reset_index(
            drop=True)
        assert len(got) == len(exp)
        for c in exp.columns:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_gap_boundary_is_strict(self, ray_session):
        """gap == gap_us continues the session; gap_us + 1 splits."""
        from raysketch.ops.window import sessionize

        df = pd.DataFrame({"k": [1, 1, 1], "t": [0, 100, 201]})
        out = sessionize(_mk_ds(df, 1), "k", "t", gap_us=100).to_pandas()
        assert len(out) == 2  # 0→100 same session, 201 splits (101 > 100)
        assert sorted(out["n_events"]) == [1, 2]

    def test_no_value_col_and_validation(self, ray_session):
        from raysketch.ops.window import sessionize

        df = pd.DataFrame({"k": [1], "t": [0]})
        out = sessionize(_mk_ds(df, 1), "k", "t", gap_us=10).to_pandas()
        assert list(out.columns) == [
            "k", "session_id", "session_start_us", "session_end_us", "n_events"]
        with pytest.raises(ValueError, match="positive"):
            sessionize(_mk_ds(df, 1), "k", "t", gap_us=0)


class TestStreamJoinQueries:
    """The three oracle-gated query surfaces at test scale."""

    def test_asof_query_runs(self, ray_session, sf_dir):
        from raysketch.queries import q_asof_join_orders

        out = q_asof_join_orders(sf_dir)
        assert out.num_rows > 0
        assert out.column_names == ["event_id", "o_orderkey", "o_totalprice"]

    def test_session_query_runs(self, ray_session, sf_dir):
        from raysketch.queries import q_sessionized_stats

        out = q_sessionized_stats(sf_dir)
        assert out.num_rows > 0
        assert (
            pd.Series(out["n_events"].to_numpy(zero_copy_only=False)) >= 1
        ).all()

    def test_interval_query_runs(self, ray_session, sf_dir):
        from raysketch.queries import q_interval_join_windows

        out = q_interval_join_windows(sf_dir)
        assert out.num_rows > 0


class TestGroupedTopN:
    def test_matches_brute_force_across_blocks(self, ray_session):
        from raysketch.ops.topk import grouped_topn

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 15, 600).astype(np.int64),
                "v": rng.integers(0, 40, 600).astype(np.int64),  # many ties
                "id": np.arange(600, dtype=np.int64),
            }
        )
        got = (
            grouped_topn(_mk_ds(df, 8), "g", "v", 3, tiebreak_col="id")
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
        )
        exp = (
            df.sort_values(["g", "v", "id"], ascending=[True, False, True])
            .groupby("g").head(3).reset_index(drop=True)
        )
        exp["rank"] = exp.groupby("g").cumcount() + 1
        assert len(got) == len(exp)
        for c in ["g", "v", "id", "rank"]:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c

    def test_ascending_and_small_groups(self, ray_session):
        from raysketch.ops.topk import grouped_topn

        df = pd.DataFrame({"g": [1, 1, 2], "v": [5, 3, 9],
                           "id": [10, 11, 12]})
        got = (
            grouped_topn(_mk_ds(df, 2), "g", "v", 5, tiebreak_col="id",
                         ascending=True)
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
        )
        # n > group size keeps everything; ascending ranks smallest first
        assert got["v"].tolist() == [3, 5, 9]
        assert got["rank"].tolist() == [1, 2, 1]

    def test_validation(self, ray_session):
        from raysketch.ops.topk import grouped_topn

        with pytest.raises(ValueError, match="n must be"):
            grouped_topn(_mk_ds(pd.DataFrame({"g": [1], "v": [1], "id": [1]})),
                         "g", "v", 0, tiebreak_col="id")

    def test_query_runs(self, ray_session, sf_dir):
        from raysketch.queries import q_grouped_topn

        out = q_grouped_topn(sf_dir)
        assert out.num_rows > 0
        assert out.column_names == ["event_type", "rank", "event_id", "value"]
