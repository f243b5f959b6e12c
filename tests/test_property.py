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


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    nkeys=st.integers(min_value=1, max_value=12),
    window_s=st.integers(min_value=1, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_window_agg_vs_bruteforce_property(n, nkeys, window_s, seed):
    """RANGE-window kernel vs a literal O(n²) per-row definition, with
    duplicate timestamps and planted nulls."""
    from cesium_ray.stages.window import window_range_agg_pandas

    rng = np.random.default_rng(seed)
    t_us = rng.integers(0, 10**9, n) * 1000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, nkeys, n),
        "ts": pd.to_datetime(t_us, unit="us").astype("datetime64[us]"),
        "value": np.where(rng.random(n) < 0.15, np.nan,
                          np.round(rng.normal(0, 10, n), 2)),
    })
    got = window_range_agg_pandas(df, window_s=window_s, value_scale=100)
    got = got.sort_values("event_id").reset_index(drop=True)
    w_us = window_s * 1_000_000
    for i in range(0, n, max(1, n // 17)):  # spot rows, incl. first/last
        row = df.iloc[i]
        t0 = t_us[i]
        m = (df.user_id == row.user_id) & (t_us >= t0 - w_us) & (t_us <= t0)
        g = got[got.event_id == i].iloc[0]
        assert g.w_cnt == int(m.sum())
        vals = df.value[m]
        assert g.w_vcnt == int(vals.notna().sum())
        if vals.notna().any():
            want = int(np.round(vals.dropna() * 100).sum()) / 100.0
            assert g.w_vsum == want


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=300),
    nkeys=st.integers(min_value=1, max_value=10),
    gap_s=st.integers(min_value=1, max_value=1000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sessionize_vs_bruteforce_property(n, nkeys, gap_s, seed):
    from cesium_ray.stages.window import sessionize_pandas

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, nkeys, n),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n) * 1000,
                             unit="us").astype("datetime64[us]"),
    })
    got = sessionize_pandas(df, gap_s=gap_s)
    gap_us = gap_s * 1_000_000
    total_sessions = 0
    total_events = 0
    for u, grp in df.groupby("user_id"):
        t = np.sort(grp.ts.to_numpy("datetime64[us]").astype(np.int64))
        breaks = 1 + int(((t[1:] - t[:-1]) > gap_us).sum()) if len(t) else 0
        total_sessions += breaks
        total_events += len(t)
    assert len(got) == total_sessions
    assert got.n_events.sum() == total_events
    assert (got.duration_us >= 0).all()
    # every session's span never exceeds (n_events-1)·gap is NOT an
    # invariant; but within-session consecutive gaps are ≤ gap_us,
    # so duration ≤ (n_events−1)·gap_us holds
    assert (got.duration_us <= (got.n_events - 1) * gap_us).all()


@settings(max_examples=20, deadline=None)
@given(
    ne=st.integers(min_value=0, max_value=300),
    nn=st.integers(min_value=2, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_cc_numpy_vs_union_find_property(ne, nn, seed):
    from cesium_ray.stages.components import _cc_numpy

    rng = np.random.default_rng(seed)
    a = rng.integers(0, nn, ne)
    b = rng.integers(0, nn, ne)
    keep = a != b
    a, b = a[keep], b[keep]
    par = {}

    def find(x):
        while par.get(x, x) != x:
            par[x] = par.get(par[x], par[x])
            x = par[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            par[max(rx, ry)] = min(rx, ry)
    if not len(a):
        return
    got = _cc_numpy(a.astype(np.int64), b.astype(np.int64))
    comp = {}
    for n_ in got.node:
        comp.setdefault(find(int(n_)), []).append(int(n_))
    want = {n_: min(comp[find(int(n_))]) for n_ in got.node}
    assert all(int(c) == want[int(n_)] for n_, c in zip(got.node, got.cluster))


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=60000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["random", "runs", "cycle", "sparse"]),
)
def test_gif_lzw_roundtrip_property(n, seed, mode):
    """Variable-width GIF-LZW roundtrips any byte sequence, including
    ones that force dictionary growth to 12 bits and CLEAR resets."""
    from cesium_ray.stages.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(seed)
    if mode == "random":
        data = rng.integers(0, 256, n).astype(np.uint8)
    elif mode == "runs":
        data = np.repeat(rng.integers(0, 256, max(1, n // 9 + 1)), 9)[:n]
    elif mode == "cycle":
        data = np.tile(np.arange(rng.integers(1, 300) % 256 + 1,
                                 dtype=np.uint8), n)[:n]
    else:
        data = np.zeros(n, np.uint8)
        if n:
            hot = rng.integers(0, n, max(1, n // 20))
            data[hot] = rng.integers(0, 256, len(hot))
    got = _lzw_decode(_lzw_encode(data.astype(np.uint8)), 8)
    np.testing.assert_array_equal(got, data)


@settings(max_examples=20, deadline=None)
@given(
    nf=st.integers(min_value=1, max_value=4),
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_container_roundtrip_property(nf, h, w, seed):
    """Animated-GIF container roundtrip at arbitrary (F, H, W)."""
    from cesium_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames = rng.integers(0, 256, (nf, h, w)).astype(np.uint8)
    got, gp = decode_gif(encode_gif(frames, pal))
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_array_equal(gp, pal)


@settings(max_examples=15, deadline=None)
@given(
    th=st.integers(min_value=1, max_value=5),
    tw=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    gray=st.booleans(),
)
def test_jpeg_blocky_q100_exact_property(th, tw, seed, gray):
    """The oracle contract holds for ANY tile colors/shape: blocky
    q=100 JPEG decodes byte-exactly (gray and RGB)."""
    from cesium_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    shape = (th, tw) if gray else (th, tw, 3)
    tiles = rng.integers(0, 256, shape).astype(np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg(img, quality=100))
    np.testing.assert_array_equal(got, img)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_content_hash_polynomial_property(n, seed):
    """content_hash64 equals the direct per-doc polynomial definition
    sum(byte_i * 31^(L-1-i)) mod 2^64 + splitmix64 (the contract the
    SQL mirrors rely on), for arbitrary byte strings incl. empty."""
    from cesium_ray.stages.dedup import _splitmix64, content_hash64

    rng = np.random.default_rng(seed)
    docs = [bytes(rng.integers(0, 256, rng.integers(0, 200)).astype(np.uint8))
            for _ in range(n)]
    got = content_hash64(docs)
    for i, d in enumerate(docs):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in d:
                acc = acc * np.uint64(31) + np.uint64(b)
        assert got[i] == _splitmix64(np.array([acc], np.uint64))[0]
