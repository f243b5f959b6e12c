"""Property-based tests (hypothesis) — beyond the reference's
known-answer style (SURVEY.md §5.1 notes cesium has none): codec
roundtrip over adversarial float bit patterns, rollup kernel vs
DuckDB's own aggregation on arbitrary grouped data, duck_quantile vs
quantile_cont.  Bounded example counts keep the suite fast."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cesium_ray.oracle.codec import decode_chunk, encode_chunk
from cesium_ray.oracle.rollup import duck_quantile, rollup_pandas


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["bits", "quantized", "constant", "repeat"]),
)
def test_codec_roundtrip_property(n, seed, mode):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10**15, n)).astype(np.int64)
    if mode == "bits":
        vals = rng.integers(0, 2**64, n, dtype=np.uint64).view(np.float64)
    elif mode == "quantized":
        vals = np.round(rng.normal(50, 20, n), 2)
    elif mode == "constant":
        vals = np.full(n, rng.normal())
    else:
        vals = np.repeat(rng.normal(size=max(1, n // 7 + 1)), 7)[:n]
    payload = encode_chunk(ts, vals)
    dt, dv = decode_chunk(payload, n)
    np.testing.assert_array_equal(dt, ts)
    assert np.array_equal(dv.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    p=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99]),
)
def test_duck_quantile_matches_duckdb(n, seed, p):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 1000, n)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": v}))
    want = con.execute(f"SELECT quantile_cont(x, {p}) FROM t").fetchone()[0]
    assert duck_quantile(np.sort(v), p) == want


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    n_keys=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    null_frac=st.floats(min_value=0.0, max_value=0.5),
)
def test_rollup_kernel_vs_duckdb_property(n, n_keys, seed, null_frac):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "conv_id": rng.integers(0, n_keys, n).astype(str),
            "channel": "v",
            "ts": np.array(
                rng.integers(0, 10**13, n), dtype="datetime64[us]"
            ),
            "value": np.where(
                rng.random(n) < null_frac, np.nan, np.round(rng.normal(50, 20, n), 2)
            ),
        }
    )
    got = rollup_pandas(df, "1h", value_scale=100).reset_index(drop=True)
    con = duckdb.connect()
    con.register("pts", df)
    want = con.sql(
        """
        SELECT conv_id, channel, date_trunc('hour', ts) AS bucket,
               count(value) AS cnt, count(*) - count(value) AS count_null,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS vsum,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0
                 / count(value) AS vmean,
               min(value) AS vmin, max(value) AS vmax,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.99) AS p99
        FROM pts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """
    ).df()
    assert len(got) == len(want)
    for col in ["cnt", "count_null"]:
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())
    for col in ["vsum", "vmean", "vmin", "vmax", "p50", "p99"]:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        assert np.all((g == w) | (np.isnan(g) & np.isnan(w))), col
