"""Driver-style oracle parity: run each oracle-gated query via Ray AND its
SQL via DuckDB, compare row count + column names + order-insensitive
values (the CORRECTNESS_r{N}.json gate, reproduced locally)."""

import os

import duckdb
import pandas as pd
import pytest

from raysketch.queries import ORACLE_SQL, QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(ray_session, con, sf_dir, name):
    got = QUERIES[name](sf_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(ORACLE_SQL[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            assert (abs(gc.astype(float) - wc.astype(float)) < 1e-9).all(), (name, col)
        else:
            assert (gc.astype(str) == wc.astype(str)).all(), (
                name, col, gc.head(), wc.head()
            )
