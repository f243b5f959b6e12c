"""Driver-contract conformance at sf0.001 (fast subset of what
scripts/driver_check.py runs at sf0.01): each sampled queries() entry
must match its oracle_sql() via DuckDB after column-sorted,
order-insensitive comparison."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "rollup_1h",
    "latency_rollup_1h",
    "cadence_stats",
    "max_slope",
    "gapfill_1h_locf",
    "union_backfill",
    "distinct_users",
    "dedup_exact",
    "event_type_agg",
]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as E

    return E.queries(), E.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents", "embeddings"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(name, contract, con):
    queries, sql = contract
    got = queries[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(sql[name]).df()
    g, w = _norm(got), _norm(want)
    assert g.shape == w.shape, (g.shape, w.shape)
    assert list(g.columns) == list(w.columns)
    for c in g.columns:
        a, b = g[c], w[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # exact: the driver's gate hashes values bit-for-bit
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True,
                err_msg=f"{name}.{c}",
            )
        else:
            eq = (a == b) | (pd.isna(a) & pd.isna(b))
            assert np.asarray(eq).all(), f"{name}.{c}"


def test_entry_smoke():
    import __ray_entry__ as E

    m = E.entry()
    assert len(m) > 0
    assert m.rows_in.sum() > 0
    assert m.rollup_rows.sum() > 0
