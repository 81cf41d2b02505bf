"""Matrix profile (SCRIMP) + anomaly scoring over windowed series.

Re-implements the reference's z-normalized Euclidean-distance matrix
profile (library/src/time_series.c:124-298, SCRIMP random-diagonal order)
with numpy-vectorized diagonals:

- exclusion zone ``m // 4``; diagonals ``exclude+1 .. mp_len-1``.
- ``percent < 100`` processes ``percent/100*mp_len + 1`` diagonals in a
  SEEDED shuffled order (the reference uses unseeded ``rand()``,
  time_series.c:124-132 — we fix the seed for retry determinism,
  SURVEY.md §7.3).
- distance ``d = 2*(m - (z - m·μ_j·μ_i)/(σ_j·σ_i))``, profile
  ``sqrt(|d|)``; sliding μ/σ are population stats of each m-window.
- anomaly post-processing (lua_binding/time_series.c:348-427): feed the
  profile through P2 q95/q50, discord = max; returns
  ``(discord_idx, (discord-e95)/(discord-e50)*100, discord-e50)``;
  ``anomaly_current`` restricts to the last m profile points.

Goldens: library/tests/test_time_series.c:783-808 (17-point series, 13
mp/mpi values) and lua_binding/tests/test.lua:297-329 (anomaly triple).

Distributed shape: per-group windowed series are small dense states;
``matrix_profile_per_group`` runs the kernel inside
``groupby(key).map_groups`` — the per-key series must fit one task,
which holds by construction (window ``rows`` is a config constant).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _sliding_stats(v: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Population mean/sd of every length-m window (one cumsum pass)."""
    cs = np.concatenate([[0.0], np.cumsum(v, dtype=np.float64)])
    cs2 = np.concatenate([[0.0], np.cumsum(v.astype(np.float64) ** 2)])
    s = cs[m:] - cs[:-m]
    s2 = cs2[m:] - cs2[:-m]
    mu = s / m
    var = np.maximum(s2 / m - mu * mu, 0.0)
    return mu, np.sqrt(var)


def matrix_profile(
    values: np.ndarray, m: int, percent: float = 100.0, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """SCRIMP matrix profile of a 1-D series. Returns (mp, mpi).

    Validation mirrors sa_mp_time_series_int (time_series.c:267-275):
    m >= 4, n/4 >= m, 0 < percent <= 100.
    """
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    if m < 4:
        raise ValueError("m must be >= 4")
    if n // 4 < m:
        raise ValueError("m must be <= n/4")
    if not (0 < percent <= 100):
        raise ValueError("percent must be in (0, 100]")
    mp_len = n - m + 1
    mu, sd = _sliding_stats(v, m)
    mp = np.full(mp_len, np.inf)
    mpi = np.zeros(mp_len, dtype=np.int64)

    exclude = m // 4
    diags = np.arange(exclude + 1, mp_len)
    rng = np.random.default_rng(seed)
    rng.shuffle(diags)
    stop = int(percent / 100 * mp_len + 1)

    with np.errstate(divide="ignore", invalid="ignore"):
        for ri, diag in enumerate(diags):
            # everything on a diagonal is contiguous: slices, not gathers
            i_len = mp_len - diag
            prod = v[diag:] * v[: n - diag]
            cs = np.cumsum(prod)
            z = np.empty(i_len)
            z[0] = cs[m - 1]
            z[1:] = cs[m:m + i_len - 1] - cs[:i_len - 1]
            d = 2 * (m - (z - m * mu[diag:] * mu[:i_len])
                     / (sd[diag:] * sd[:i_len]))
            mp_j = mp[diag:]
            upd = d < mp_j
            mp_j[upd] = d[upd]
            mpi[diag:][upd] = np.flatnonzero(upd)
            mp_i = mp[:i_len]
            upd = d < mp_i
            mp_i[upd] = d[upd]
            mpi[:i_len][upd] = np.flatnonzero(upd) + diag
            if ri == stop:
                break
    return np.sqrt(np.abs(mp)), mpi


def mp_anomaly(
    mp: np.ndarray, m: int, current_only: bool = False
) -> tuple[int, float, float] | None:
    """The reference's anomaly reduction of a profile
    (lua_binding/time_series.c:376-407): sequential P2 q95/q50 over the
    profile values, discord = running max. Returns
    (discord_idx, pct_of_range, discord - e50); the floats are NaN when
    fewer than 5 profile points were folded (P2 warm-up), matching the
    reference's nil/NaN behavior for ``anomaly_current`` on short tails.
    """
    from ..sketches.p2 import P2Quantile

    q95, q50 = P2Quantile(0.95), P2Quantile(0.50)
    e95 = e50 = math.nan
    discord, idx = -math.inf, 0
    lo = max(0, mp.size - m) if current_only else 0
    for i in range(lo, mp.size):
        e95 = q95.add(float(mp[i]))
        e50 = q50.add(float(mp[i]))
        if mp[i] > discord:
            discord = float(mp[i])
            idx = i
    if math.isinf(discord):
        return None
    p = (discord - e95) / (discord - e50) * 100
    return idx, p, discord - e50


def matrix_profile_per_group(
    windowed_ds,
    key_col: str,
    values_col: str = "values",
    m: int = 4,
    percent: float = 100.0,
    result: str = "anomaly",
):
    """Per-key matrix profile over a windowed-series Dataset (the output
    shape of ops.window.time_series_window): one numpy SCRIMP kernel per
    group inside map_groups."""
    if result not in ("anomaly", "anomaly_current", "mp", "mpi"):
        raise ValueError(f"unknown result {result!r}")

    def _empty() -> pd.DataFrame:
        # schema-stable empty frame (a group with no finite profile must
        # not drop columns, or an all-empty result loses its schema)
        if result in ("mp", "mpi"):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 result: pd.Series([], dtype=object)})
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "discord_idx": pd.Series([], dtype="int64"),
                             "pct": pd.Series([], dtype="float64"),
                             "dist": pd.Series([], dtype="float64")})

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_col].iloc[0]
        v = np.asarray(df[values_col].iloc[0], dtype=np.float64)
        try:
            mp, mpi = matrix_profile(v, m, percent)
        except ValueError:
            return _empty()
        if result == "mp":
            return pd.DataFrame({key_col: [key], "mp": [mp.tolist()]})
        if result == "mpi":
            return pd.DataFrame({key_col: [key], "mpi": [mpi.tolist()]})
        an = mp_anomaly(mp, m, current_only=result == "anomaly_current")
        if an is None:
            return _empty()
        idx, pct, dist = an
        return pd.DataFrame(
            {key_col: [key], "discord_idx": [idx], "pct": [pct], "dist": [dist]}
        )

    return windowed_ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
