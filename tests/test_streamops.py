"""Unit tests for the batch-6 stream operators: Markov transition
counts / user growth (stages/analytics.py), silence-gap detection
(stages/window.py), inter-arrival quantiles (stages/tsmath.py) — each
vs brute-force pandas truth."""

import numpy as np
import pandas as pd
import ray.data


def _events(seed=17, n=4000, nusers=25):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, nusers, n),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
        "ts": pd.to_datetime(
            rng.integers(0, 6 * 86400, n) * 10**6, unit="us"
        ).astype("datetime64[us]"),
    })


def test_transition_matrix_bruteforce(ray_session):
    from cesium_ray.stages.analytics import transition_matrix

    ev = _events()
    got = transition_matrix(
        ray.data.from_pandas(ev).repartition(6), num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    d = pd.DataFrame({"type_from": s["event_type"], "type_to": nxt}).dropna()
    want = (d.groupby(["type_from", "type_to"], as_index=False).size()
            .rename(columns={"size": "n"})
            .sort_values(["type_from", "type_to"]).reset_index(drop=True))
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every user's last event contributes no transition
    assert int(got["n"].sum()) == len(ev) - ev["user_id"].nunique()


def test_user_growth_bruteforce(ray_session):
    from cesium_ray.stages.analytics import user_growth

    ev = _events(seed=29)
    got = user_growth(ray.data.from_pandas(ev).repartition(5),
                      num_partitions=3)
    day = (ev["ts"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000) * 86_400_000_000
    first = pd.DataFrame({"u": ev["user_id"], "d": day}).groupby("u")["d"].min()
    want = (first.value_counts().sort_index().rename("new_users")
            .reset_index().rename(columns={"d": "bucket_us"}))
    assert got["bucket_us"].tolist() == want["bucket_us"].tolist()
    assert got["new_users"].tolist() == want["new_users"].tolist()
    assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()
    assert (np.diff(got["cum_users"]) == got["new_users"].iloc[1:]).all()


def test_gap_report_bruteforce(ray_session):
    from cesium_ray.stages.window import gap_report

    ev = _events(seed=37, n=1500, nusers=10)
    thr = 3 * 3600 * 10**6
    got = (gap_report(ray.data.from_pandas(ev).repartition(4),
                      gap_us_threshold=thr, num_partitions=3)
           .to_pandas().sort_values(["user_id", "gap_start"])
           .reset_index(drop=True))
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    tus = s["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = s["user_id"].to_numpy()
    same = u[1:] == u[:-1]
    delta = tus[1:] - tus[:-1]
    hit = same & (delta > thr)
    want = (pd.DataFrame({
        "user_id": u[:-1][hit],
        "gap_start": tus[:-1][hit].view("datetime64[us]"),
        "gap_end": tus[1:][hit].view("datetime64[us]"),
        "gap_us": delta[hit],
    }).sort_values(["user_id", "gap_start"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_interarrival_quantiles_bruteforce(ray_session):
    from cesium_ray.oracle.rollup import duck_quantile
    from cesium_ray.stages.tsmath import interarrival_quantiles

    ev = _events(seed=43)
    got = (interarrival_quantiles(ray.data.from_pandas(ev).repartition(6),
                                  num_partitions=4)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    s = ev.sort_values(["user_id", "event_type", "ts", "event_id"],
                       kind="mergesort")
    tus = s["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u, a = s["user_id"].to_numpy(), s["event_type"].to_numpy()
    same = (u[1:] == u[:-1]) & (a[1:] == a[:-1])
    d = pd.DataFrame({"t": a[:-1][same],
                      "dt": (tus[1:] - tus[:-1])[same].astype(np.float64)})
    for _, row in got.iterrows():
        v = np.sort(d[d["t"] == row["event_type"]]["dt"].to_numpy())
        assert row["n_gaps"] == len(v)
        assert row["p50_us"] == round(duck_quantile(v, 0.5), 6)
        assert row["p99_us"] == round(duck_quantile(v, 0.99), 6)
    assert set(got["event_type"]) == set(d["t"].unique())


def test_rolling_rows_std_bruteforce(ray_session):
    from cesium_ray.stages.window import rolling_rows_std

    ev = _events(seed=53, n=2000, nusers=15)
    rng = np.random.default_rng(7)
    ev["value"] = np.where(rng.random(len(ev)) < 0.1, np.nan,
                           np.round(rng.random(len(ev)) * 50, 2))
    got = (rolling_rows_std(ray.data.from_pandas(ev).repartition(5),
                            n=5, num_partitions=3)
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True))
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cnt = (s.groupby("user_id")["value"]
           .rolling(5, min_periods=1).count().to_numpy(np.int64))
    std = (s.groupby("user_id")["value"]
           .rolling(5, min_periods=1).std().to_numpy())
    want = (pd.DataFrame({
        "user_id": s["user_id"].to_numpy(),
        "event_id": s["event_id"].to_numpy(),
        "cnt": cnt, "std": np.where(cnt > 1, std, np.nan),
    }).sort_values(["user_id", "event_id"]).reset_index(drop=True))
    assert (got["roll_cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    a, w = got["roll_std"].to_numpy(), want["std"].to_numpy()
    ok = ~np.isnan(w)
    assert (np.isnan(a) == ~ok).all()
    # pandas rolling.std is the same sample variance up to fp noise
    assert np.allclose(a[ok], w[ok], atol=1e-9)


def test_dwell_time_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import dwell_time

    ev = _events(seed=59)
    got = dwell_time(ray.data.from_pandas(ev).repartition(6),
                     num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    tus = s["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = s["user_id"].to_numpy()
    same = u[1:] == u[:-1]
    d = pd.DataFrame({"t": s["event_type"].to_numpy()[:-1][same],
                      "dt": (tus[1:] - tus[:-1])[same]})
    want = (d.groupby("t", as_index=False)
            .agg(n=("dt", "size"), total_us=("dt", "sum"))
            .rename(columns={"t": "event_type"})
            .sort_values("event_type").reset_index(drop=True))
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert got["total_us"].tolist() == want["total_us"].tolist()


def test_weekly_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import weekly_profile

    ev = _events(seed=61, n=5000)
    rng = np.random.default_rng(3)
    ev["value"] = np.where(rng.random(len(ev)) < 0.05, np.nan,
                           np.round(rng.random(len(ev)) * 80 - 10, 2))
    got = weekly_profile(ray.data.from_pandas(ev).repartition(5))
    d = ev[ev["value"].notna()].copy()
    tus = d["ts"].astype("datetime64[us]").astype(np.int64)
    d["dow"] = ((tus // 86_400_000_000) + 4) % 7
    d["hour"] = (tus // 3_600_000_000) % 24
    d["k"] = np.round(d["value"].to_numpy() * 100).astype(np.int64)
    want = (d.groupby(["event_type", "dow", "hour"], as_index=False)
            .agg(n=("k", "size"), sk=("k", "sum")))
    want["mean_value"] = want["sk"] / (want["n"] * 100.0)
    want = (want.drop(columns="sk")
            .sort_values(["event_type", "dow", "hour"])
            .reset_index(drop=True))
    assert got.shape == want.shape
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["mean_value"], want["mean_value"], atol=1e-12)
    # 1970-01-01 is a Thursday: dow arithmetic sanity
    assert set(got["dow"]) <= set(range(7))


def test_type_variety_bruteforce(ray_session):
    from cesium_ray.stages.analytics import type_variety

    ev = _events(seed=67, n=300, nusers=40)
    got = type_variety(ray.data.from_pandas(ev).repartition(4),
                       num_partitions=3)
    k = ev.groupby("user_id")["event_type"].nunique()
    want = (k.value_counts().sort_index().rename("n_users")
            .reset_index().rename(columns={"event_type": "n_types"}))
    assert got["n_types"].tolist() == want["n_types"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()
    assert int(got["n_users"].sum()) == ev["user_id"].nunique()


def test_grouped_rank_quantiles_bruteforce(ray_session):
    from cesium_ray.oracle.rollup import duck_quantile
    from cesium_ray.stages.selection import grouped_rank_quantiles

    rng = np.random.default_rng(71)
    # adversarial mix: heavy duplicates, zipf tail, negatives, a
    # single-element group, and a two-element group
    parts = [
        pd.DataFrame({"g": "dup", "v": np.repeat([5, 5, 5, 9], 500)}),
        pd.DataFrame({"g": "zipf",
                      "v": (rng.zipf(1.7, 3000) * 1000).astype(np.int64)}),
        pd.DataFrame({"g": "neg",
                      "v": rng.integers(-10**12, 10**12, 2000)}),
        pd.DataFrame({"g": "one", "v": [42]}),
        pd.DataFrame({"g": "two", "v": [7, 100]}),
    ]
    df = pd.concat(parts, ignore_index=True).sample(frac=1, random_state=3)
    ds = ray.data.from_pandas(df).repartition(7).materialize()
    got = grouped_rank_quantiles(ds, "g", "v", ps=(0.5, 0.99),
                                 n_bins=16, max_exact=64)
    for _, row in got.iterrows():
        v = np.sort(df[df["g"] == row["g"]]["v"].to_numpy(np.float64))
        assert row["n"] == len(v)
        assert row["q_0"] == duck_quantile(v, 0.5), row["g"]
        assert row["q_1"] == duck_quantile(v, 0.99), row["g"]
    assert set(got["g"]) == {"dup", "zipf", "neg", "one", "two"}


def test_interarrival_scan_matches_exchange_path(ray_session):
    from cesium_ray.stages.tsmath import (
        interarrival_quantiles, interarrival_quantiles_scan)

    ev = _events(seed=73, n=3000)
    ds = ray.data.from_pandas(ev).repartition(6)
    a = (interarrival_quantiles(ds, num_partitions=4).to_pandas()
         .sort_values("event_type").reset_index(drop=True))
    b = (interarrival_quantiles_scan(ds, num_partitions=4)
         .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_shipping_priority_smoke(ray_session):
    """Q3-style composite at sf0.001: row contract + descending
    revenue + oracle recomputation via DuckDB."""
    import duckdb

    from cesium_ray.pipelines.extra_queries import (
        SHIPPING_SQL, q_shipping_priority)

    sf = "/root/testdata/sf0.001"
    got = q_shipping_priority(sf)
    assert list(got.columns) == ["l_orderkey", "revenue", "o_orderdate",
                                 "o_orderpriority"]
    assert (np.diff(got["revenue"].to_numpy()) <= 1e-12).all()
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
    want = con.sql(SHIPPING_SQL).df()
    assert got["l_orderkey"].tolist() == want["l_orderkey"].tolist()
    assert np.allclose(got["revenue"], want["revenue"], atol=0)


def test_dataset_diff_bruteforce(ray_session):
    from cesium_ray.stages.diff import dataset_diff

    rng = np.random.default_rng(79)
    a = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                      "v": np.round(rng.random(500), 2),
                      "w": rng.integers(0, 9, 500)})
    b = a.copy()
    b = b[b["k"] % 7 != 0]                      # only_a
    b.loc[b["k"] % 5 == 0, "v"] += 0.5          # mismatch (v)
    b.loc[b["k"] % 11 == 3, "w"] += 1           # mismatch (w)
    extra = pd.DataFrame({"k": [1000, 1001], "v": [0.1, 0.2],
                          "w": [1, 2]})         # only_b
    b = pd.concat([b, extra], ignore_index=True)
    got = (dataset_diff(ray.data.from_pandas(a).repartition(4),
                        ray.data.from_pandas(b).repartition(3),
                        key="k", vals=["v", "w"], num_partitions=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    m = a.merge(b, on="k", how="outer", suffixes=("_a", "_b"),
                indicator=True)
    st = np.where(m["_merge"] == "left_only", "only_a",
                  np.where(m["_merge"] == "right_only", "only_b",
                           np.where((m["v_a"] != m["v_b"])
                                    | (m["w_a"] != m["w_b"]),
                                    "mismatch", "match")))
    want = (pd.DataFrame({"k": m["k"], "status": st})
            [st != "match"].sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == want["k"].tolist()
    assert got["status"].tolist() == want["status"].tolist()
    # identical inputs diff to empty
    same = dataset_diff(ray.data.from_pandas(a),
                        ray.data.from_pandas(a.sample(frac=1,
                                                      random_state=1)),
                        key="k", vals=["v", "w"],
                        num_partitions=3).to_pandas()
    assert len(same) == 0


def test_rank_quantiles_property(ray_session):
    """Bounded property sweep: random sizes/shapes/duplicates vs
    duck_quantile, exercising multi-pass refinement (n_bins=8) and
    the exact tail (max_exact=32)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cesium_ray.oracle.rollup import duck_quantile
    from cesium_ray.stages.selection import grouped_rank_quantiles

    @settings(max_examples=8, deadline=None)
    @given(n=st.integers(min_value=1, max_value=400),
           seed=st.integers(min_value=0, max_value=2**31 - 1),
           mode=st.sampled_from(["wide", "dups", "tight"]))
    def check(n, seed, mode):
        rng = np.random.default_rng(seed)
        if mode == "wide":
            v = rng.integers(-10**15, 10**15, n)
        elif mode == "dups":
            v = rng.integers(0, max(2, n // 10), n)
        else:
            v = rng.integers(1000, 1010, n)
        df = pd.DataFrame({"g": np.zeros(n, np.int64), "v": v})
        ds = ray.data.from_pandas(df).repartition(3).materialize()
        got = grouped_rank_quantiles(ds, "g", "v", ps=(0.25, 0.5, 0.99),
                                     n_bins=8, max_exact=32)
        sv = np.sort(v.astype(np.float64))
        for i, p in enumerate((0.25, 0.5, 0.99)):
            assert got[f"q_{i}"].iloc[0] == duck_quantile(sv, p), (
                n, seed, mode, p)

    check()


def test_sliding_distinct_bruteforce(ray_session):
    from cesium_ray.stages.window import sliding_distinct

    ev = _events(seed=83, n=2500, nusers=20)
    W = 6
    got = sliding_distinct(ray.data.from_pandas(ev).repartition(5),
                           window_h=W, num_partitions=3)
    h = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 3_600_000_000).to_numpy()
    cells = pd.DataFrame({"u": ev["user_id"], "h": h}).drop_duplicates()
    want = []
    for hb in sorted(cells["h"].unique()):
        m = (cells["h"] >= hb - (W - 1)) & (cells["h"] <= hb)
        want.append((hb * 3_600_000_000, cells[m]["u"].nunique()))
    want = pd.DataFrame(want, columns=["bucket_us", "n_users"])
    assert got["bucket_us"].tolist() == want["bucket_us"].tolist()
    assert got["n_users"].tolist() == want["n_users"].tolist()


def test_edit1_pairs_planted(ray_session):
    from cesium_ray.stages.dedup import edit1_pairs

    base = ["alpha beta gamma", "delta epsilon zz", "one two three xy",
            "qrs tuv wxyz abc"]
    texts = list(base)
    texts.append("alpha beta gamm")     # deletion of base[0]   (4)
    texts.append("delta epsilon zzq")   # insertion into base[1] (5)
    texts.append("one twX three xy")    # substitution of base[2] (6)
    texts.append("alpha beta gamma")    # exact dup of base[0]  (7)
    texts.append("totally different")   # no pair              (8)
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = edit1_pairs(ray.data.from_pandas(df).repartition(3),
                      prefix_len=16, num_partitions=3)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (0, 4) in pairs   # deletion
    assert (1, 5) in pairs   # insertion (prefix-truncated is still +1)
    assert (2, 6) in pairs   # substitution
    assert (0, 7) in pairs and (4, 7) in pairs  # exact dup cluster
    assert not any(8 in p for p in pairs)
    d = dict(zip(zip(got["id_a"], got["id_b"]), got["dist"]))
    assert d[(0, 7)] == 0 and d[(2, 6)] == 1


def test_run_stats_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import run_stats

    ev = _events(seed=73)
    got = run_stats(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in s.groupby("user_id"):
        t = g["event_type"].to_numpy()
        brk = np.r_[True, t[1:] != t[:-1]]
        lens = np.diff(np.r_[np.flatnonzero(brk), len(t)])
        rows.append({"user_id": uid, "n_events": len(t),
                     "n_runs": len(lens), "max_run": int(lens.max()),
                     "first_type": t[0], "last_type": t[-1],
                     "mean_run_len": round(len(t) / len(lens), 6)})
    want = pd.DataFrame(rows)
    assert got.shape == want.shape
    for c in want.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if c == "mean_run_len":
            assert np.allclose(g, w)
        else:
            assert (g == w).all(), c
    # run counts are consistent: every key has 1 ≤ max_run ≤ n_events
    assert (got["max_run"] >= 1).all()
    assert (got["max_run"] <= got["n_events"]).all()
    assert (got["n_runs"] + got["max_run"] <= got["n_events"] + 1).all()


def test_run_stats_single_and_empty(ray_session):
    from cesium_ray.stages.tsmath import run_stats

    one = pd.DataFrame({
        "event_id": np.array([5], dtype=np.int64),
        "user_id": np.array([9], dtype=np.int64),
        "event_type": ["x"],
        "ts": pd.to_datetime([10**6], unit="us").astype("datetime64[us]"),
    })
    got = run_stats(ray.data.from_pandas(one), num_partitions=2)
    assert got.iloc[0].tolist() == [9, 1, 1, 1, "x", "x", 1.0]


def test_time_since_event_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import time_since_event

    ev = _events(seed=97)
    got = time_since_event(
        ray.data.from_pandas(ev).repartition(6), marker="b",
        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in s.groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        eid = g["event_id"].to_numpy()
        is_b = (g["event_type"] == "b").to_numpy()
        last = -1
        for i in range(len(g)):
            rows.append((uid, eid[i],
                         float(t[i] - t[last]) if last >= 0 else np.nan))
            if is_b[i]:
                last = i
    want = (pd.DataFrame(rows, columns=["user_id", "event_id", "w"])
            .sort_values(["user_id", "event_id"])["w"].to_numpy())
    got_s = got["since_us"].to_numpy()
    assert len(got_s) == len(want)
    assert (np.isnan(got_s) == np.isnan(want)).all()
    ok = ~np.isnan(want)
    assert (got_s[ok] == want[ok]).all()
    # every user's temporally-first event has no preceding marker
    assert got["since_us"].isna().groupby(got["user_id"]).any().all()


def test_new_ops_partition_count_invariance(ray_session):
    """run_stats / time_since_event must be bit-identical across
    partition counts (keys are whole per partition by construction)."""
    from cesium_ray.stages.tsmath import run_stats, time_since_event

    ev = _events(seed=101)
    ds = ray.data.from_pandas(ev).repartition(7)
    a = run_stats(ds, num_partitions=3)
    b = run_stats(ds, num_partitions=11)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    c = time_since_event(ds, marker="c", num_partitions=3)
    d = time_since_event(ds, marker="c", num_partitions=11)
    pd.testing.assert_frame_equal(c, d, check_exact=True)


def test_cooldown_dedup_bruteforce(ray_session):
    from cesium_ray.stages.window import cooldown_dedup

    ev = _events(seed=113, n=3000, nusers=12)
    cd = 6 * 3600
    got = (cooldown_dedup(ray.data.from_pandas(ev).repartition(6),
                          cooldown_s=cd, num_partitions=4)
           .to_pandas()
           .sort_values(["user_id", "event_type", "ts_us", "event_id"])
           .reset_index(drop=True))
    s = ev.sort_values(["user_id", "event_type", "ts", "event_id"],
                       kind="mergesort")
    rows = []
    for (uid, et), g in s.groupby(["user_id", "event_type"]):
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        eid = g["event_id"].to_numpy()
        prev = None
        for i in range(len(g)):
            gap = float(t[i] - prev) if prev is not None else np.nan
            if prev is None or gap > cd * 10**6:
                rows.append((uid, eid[i], et, t[i], gap))
            prev = t[i]  # raw predecessor, not surviving one
    want = pd.DataFrame(rows, columns=["user_id", "event_id",
                                       "event_type", "ts_us",
                                       "since_prev_us"])
    assert got.shape == want.shape
    for c in ["user_id", "event_id", "event_type", "ts_us"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    a, w = got["since_prev_us"].to_numpy(), want["since_prev_us"].to_numpy()
    ok = ~np.isnan(w)
    assert (np.isnan(a) == ~ok).all()
    assert (a[ok] == w[ok]).all()
    # each (key, type) stream's temporally-first event always survives
    assert got.groupby(["user_id", "event_type"]).size().gt(0).all()


def test_share_of_bucket_sums_to_one(ray_session):
    from cesium_ray.stages.analytics import share_of_bucket

    ev = _events(seed=127)
    got = share_of_bucket(ray.data.from_pandas(ev).repartition(5),
                          bucket_s=86400)
    d = ev.copy()
    d["b"] = (d["ts"].astype("datetime64[us]").astype(np.int64)
              // 86_400_000_000) * 86_400_000_000
    want = (d.groupby(["event_type", "b"], as_index=False).size()
            .rename(columns={"size": "cnt", "b": "bucket_us"}))
    m = got.merge(want, on=["event_type", "bucket_us"],
                  suffixes=("", "_w"))
    assert len(m) == len(got) == len(want)
    assert (m["cnt"] == m["cnt_w"]).all()
    per_bucket = got.groupby("bucket_us")["share"].sum()
    assert np.allclose(per_bucket.to_numpy(), 1.0)


def test_sequence_pattern_count_bruteforce(ray_session):
    import re

    from cesium_ray.stages.analytics import sequence_pattern_count

    ev = _events(seed=131)  # types a/b/c/d -> distinct first chars
    pat = "a[bc]*d"
    got = sequence_pattern_count(
        ray.data.from_pandas(ev).repartition(6), pattern=pat,
        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rx = re.compile(pat)
    want = (s.groupby("user_id")["event_type"]
            .agg(lambda g: "".join(v[0] for v in g)))
    assert got["user_id"].tolist() == want.index.tolist()
    assert got["seq_len"].tolist() == [len(x) for x in want]
    assert got["n_matches"].tolist() == [len(rx.findall(x)) for x in want]
    assert got["n_matches"].sum() > 0  # the motif occurs in this corpus


def test_lttb_downsample_bruteforce(ray_session):
    """LTTB vs a straight per-series reference loop (same bucket
    arithmetic, same count-scaled score); covers the keep-all path
    for short series and first/last retention."""
    from cesium_ray.stages.tsmath import lttb_downsample

    rng = np.random.default_rng(137)
    frames = []
    eid = 0
    for uid, n in [(1, 5), (2, 11), (3, 40), (4, 200), (5, 10)]:
        t = np.sort(rng.choice(10**7, size=n, replace=False))
        frames.append(pd.DataFrame({
            "user_id": np.full(n, uid, dtype=np.int64),
            "event_id": np.arange(eid, eid + n, dtype=np.int64),
            "ts": t.astype("datetime64[us]"),
            "value": np.round(rng.random(n) * 100, 2),
        }))
        eid += n
    ev = pd.concat(frames, ignore_index=True)
    n_out = 10
    got = lttb_downsample(ray.data.from_pandas(ev).repartition(4),
                          n_out=n_out, num_partitions=3)

    def ref(x, y):
        n = len(x)
        if n <= n_out:
            return list(range(n))
        M = n_out - 2
        rn_mid = np.arange(1, n - 1)
        b = (rn_mid * M - 1) // (n - 2)
        sel = [0]
        for bb in range(M):
            rns = rn_mid[b == bb]
            if bb + 1 < M:
                nx = rn_mid[b == bb + 1]
                SX, SY, c = x[nx].sum(), y[nx].sum(), float(len(nx))
            else:
                SX, SY, c = x[n - 1], y[n - 1], 1.0
            xs, ys = x[sel[-1]], y[sel[-1]]
            sc = np.abs((x[rns] - xs) * (SY - c * ys)
                        - (SX - c * xs) * (y[rns] - ys))
            sel.append(int(rns[np.argmax(sc)]))
        sel.append(n - 1)
        return sel

    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        x = (t - t[0]).astype(np.float64)
        y = np.rint(g["value"].to_numpy() * 100).astype(np.int64) \
            .astype(np.float64)
        want = ref(x, y)
        rows = got[got["user_id"] == uid]
        assert rows["rn"].tolist() == want, uid
        assert rows["rn"].iloc[0] == 0 and rows["rn"].iloc[-1] == len(g) - 1
        assert len(rows) == min(len(g), n_out)


def test_linear_trend_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import linear_trend_per_key

    ev = _events(seed=139)
    rng = np.random.default_rng(9)
    ev["value"] = np.round(rng.random(len(ev)) * 80 - 10, 2)
    got = linear_trend_per_key(
        ray.data.from_pandas(ev).repartition(5), num_partitions=3)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        x = ((t - t[0]) // 1_000_000).astype(np.float64)
        y = g["value"].to_numpy()
        sl, ic = np.polyfit(x, y, 1)
        row = got[got["user_id"] == uid].iloc[0]
        assert row["n"] == len(g)
        assert abs(row["slope_per_s"] - sl) < 1e-9 * max(1, abs(sl))
        assert abs(row["intercept"] - ic) < 1e-6 * max(1, abs(ic))


def test_weighted_quantiles_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import weighted_value_quantiles

    ev = _events(seed=149)
    rng = np.random.default_rng(11)
    ev["value"] = np.round(rng.random(len(ev)) * 40, 2)
    got = weighted_value_quantiles(
        ray.data.from_pandas(ev).repartition(6), num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    t = s["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = s["user_id"].to_numpy()
    same = u[1:] == u[:-1]
    d = pd.DataFrame({
        "et": s["event_type"].to_numpy()[:-1][same],
        "y": np.rint(s["value"].to_numpy()[:-1][same] * 100)
               .astype(np.int64),
        "w": (t[1:] - t[:-1])[same],
    })
    for _, row in got.iterrows():
        g = (d[d["et"] == row["event_type"]]
             .groupby("y", as_index=False)["w"].sum().sort_values("y"))
        cw = np.cumsum(g["w"].to_numpy())
        W = cw[-1]
        assert row["n"] == (d["et"] == row["event_type"]).sum()
        assert row["total_w_us"] == W
        assert row["w_p50"] == g["y"].to_numpy()[
            np.argmax(2 * cw >= W)] / 100.0
        assert row["w_p90"] == g["y"].to_numpy()[
            np.argmax(10 * cw >= 9 * W)] / 100.0
    # weighted median lies within the value domain
    assert (got["w_p50"] <= got["w_p90"]).all()


def test_lateness_report_bruteforce(ray_session):
    from cesium_ray.stages.analytics import lateness_report

    ev = _events(seed=151)  # event_id = arrival order; ts random -> late
    got = lateness_report(ray.data.from_pandas(ev).repartition(6),
                          num_partitions=4)
    for uid, g in ev.sort_values("event_id").groupby("user_id"):
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        mx = np.maximum.accumulate(t)
        prev = np.r_[np.int64(-1), mx[:-1]]
        late = np.r_[False, t[1:] < prev[1:]]
        row = got[got["user_id"] == uid].iloc[0]
        assert row["n"] == len(t)
        assert row["n_late"] == int(late.sum())
        worst = int((prev - t)[late].max()) if late.any() else 0
        assert row["max_late_us"] == worst
    assert got["n_late"].sum() > 0  # random ts vs arange arrival: late exists


def test_profile_columns_bruteforce(ray_session):
    from cesium_ray.stages.analytics import profile_columns

    ev = _events(seed=157)
    rng = np.random.default_rng(13)
    ev["value"] = np.where(rng.random(len(ev)) < 0.07, np.nan,
                           np.round(rng.random(len(ev)) * 50, 2))
    got = profile_columns(
        ray.data.from_pandas(ev).repartition(6),
        {"user_id": "num", "event_type": "str",
         "value": "num", "ts": "time"},
        num_partitions=4)
    got = got.set_index("col_name")
    assert (got["n"] == len(ev)).all()
    assert got.loc["value", "n_null"] == int(ev["value"].isna().sum())
    assert got.loc["event_type", "n_null"] == 0
    assert got.loc["user_id", "n_distinct"] == ev["user_id"].nunique()
    assert got.loc["value", "n_distinct"] == ev["value"].nunique()
    assert got.loc["event_type", "n_distinct"] == 4
    assert got.loc["value", "min_v"] == np.nanmin(ev["value"])
    assert got.loc["value", "max_v"] == np.nanmax(ev["value"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64)
    assert got.loc["ts", "min_v"] == float(t.min())
    assert got.loc["ts", "max_v"] == float(t.max())
    assert np.isnan(got.loc["event_type", "min_v"])


def _valued(seed=41, n=3000, nusers=20):
    ev = _events(seed=seed, n=n, nusers=nusers)
    rng = np.random.default_rng(seed + 1)
    ev["value"] = np.round(rng.uniform(-50, 50, n), 2)
    return ev


def test_max_drawdown_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import max_drawdown

    ev = _valued(seed=83)
    got = max_drawdown(ray.data.from_pandas(ev).repartition(6),
                       num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    rows = []
    for uid, g in s.groupby("user_id"):
        v = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        dd = np.maximum.accumulate(v) - v
        rows.append({"user_id": uid,
                     "max_drawdown": dd.max() / 100.0,
                     "peak_value": v.max() / 100.0,
                     "n_events": len(v)})
    want = pd.DataFrame(rows)
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # drawdown can never exceed the full value range
    rng_span = got["peak_value"] - ev.groupby("user_id")["value"].min().sort_index().to_numpy()
    assert (got["max_drawdown"].to_numpy() <= rng_span.to_numpy() + 1e-9).all()


def test_longest_streak_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import longest_streak

    ev = _events(seed=91, n=2500, nusers=18)
    got = longest_streak(ray.data.from_pandas(ev).repartition(5),
                         num_partitions=4)
    day = (ev["ts"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    rows = []
    for uid, g in pd.DataFrame({"u": ev["user_id"], "d": day}).groupby("u"):
        d = np.unique(g["d"].to_numpy())
        brk = np.r_[True, np.diff(d) != 1]
        lens = np.diff(np.r_[np.flatnonzero(brk), len(d)])
        rows.append({"user_id": uid, "n_active_days": len(d),
                     "n_streaks": len(lens),
                     "longest_streak": int(lens.max()),
                     "first_day": int(d[0]), "last_day": int(d[-1])})
    want = pd.DataFrame(rows)
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # a streak of length L needs L active days within the span
    assert (got["longest_streak"] <= got["n_active_days"]).all()
    assert (got["last_day"] - got["first_day"] + 1
            >= got["n_active_days"]).all()


def test_burst_detect_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import burst_detect

    ev = _events(seed=97, n=2000, nusers=12)
    # force heavy ts ties to exercise RANGE-frame peer semantics
    ev["ts"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
                // 600_000_000 * 600_000_000).astype("datetime64[us]")
    W = 300
    got = burst_detect(ray.data.from_pandas(ev).repartition(6),
                       window_s=W, num_partitions=4)
    tus = ev["ts"].astype("datetime64[us]").astype(np.int64)
    rows = []
    for uid, g in pd.DataFrame({"u": ev["user_id"], "t": tus}).groupby("u"):
        t = np.sort(g["t"].to_numpy())
        cnt = np.array([((t >= x - W * 10**6) & (t <= x)).sum() for x in t])
        mx = cnt.max()
        rows.append({"user_id": uid, "max_burst": int(mx),
                     "burst_ts_us": int(t[cnt == mx].min()),
                     "n_events": len(t)})
    want = pd.DataFrame(rows)
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # with full ties a burst includes every peer at the max ts
    assert (got["max_burst"] >= 1).all()


def test_new_stream_ops_empty_and_single(ray_session):
    from cesium_ray.stages.tsmath import (burst_detect, longest_streak,
                                          max_drawdown)

    one = pd.DataFrame({
        "event_id": np.array([3], dtype=np.int64),
        "user_id": np.array([7], dtype=np.int64),
        "event_type": np.array(["a"], dtype=object),
        "ts": pd.to_datetime([10**6], unit="us").astype("datetime64[us]"),
        "value": np.array([2.5]),
    })
    ds = ray.data.from_pandas(one)
    dd = max_drawdown(ds, num_partitions=2)
    assert dd.iloc[0].to_dict() == {
        "user_id": 7, "max_drawdown": 0.0, "peak_value": 2.5, "n_events": 1}
    st = longest_streak(ds, num_partitions=2)
    assert (st.iloc[0][["n_active_days", "n_streaks", "longest_streak"]]
            == 1).all()
    bu = burst_detect(ds, num_partitions=2)
    assert bu.iloc[0]["max_burst"] == 1
    assert bu.iloc[0]["burst_ts_us"] == 10**6


def test_acf_lags_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import acf_lags

    ev = _valued(seed=107, n=2500, nusers=15)
    got = acf_lags(ray.data.from_pandas(ev).repartition(6),
                   max_lag=3, num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        mu = x.mean()
        den = ((x - mu) ** 2).sum()
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == len(x)
        for L in (1, 2, 3):
            want = ((x[L:] - mu) * (x[:-L] - mu)).sum() / den
            assert abs(row[f"acf{L}"].iloc[0] - want) < 1e-9, (uid, L)
    # a constant series must be filtered out (zero variance)
    const = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": np.full(6, 999, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(6) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.full(6, 3.0),
    })
    out = acf_lags(ray.data.from_pandas(const), num_partitions=2)
    assert len(out) == 0


def test_local_supplier_volume_smoke(ray_session):
    """Q5-style composite at sf0.001: schema + DuckDB recomputation."""
    import duckdb

    from cesium_ray.pipelines.extra_queries import (
        Q5_SQL, q_local_supplier_volume)

    sf = "/root/testdata/sf0.001"
    got = q_local_supplier_volume(sf)
    assert list(got.columns) == ["n_name", "revenue"]
    assert (np.diff(got["revenue"].to_numpy()) <= 1e-12).all()
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "region"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    want = con.sql(Q5_SQL).df().sort_values("n_name").reset_index(drop=True)
    g = got.sort_values("n_name").reset_index(drop=True)
    assert g.shape == want.shape
    assert (g["n_name"] == want["n_name"]).all()
    assert (g["revenue"].to_numpy() == want["revenue"].to_numpy()).all()


def test_rolling_window_median_bruteforce(ray_session):
    from cesium_ray.stages.window import rolling_window_median

    ev = _valued(seed=113, n=1500, nusers=10)
    W = 3
    got = rolling_window_median(ray.data.from_pandas(ev).repartition(5),
                                window_days=W, num_partitions=4)
    day = (ev["ts"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    df = pd.DataFrame({"u": ev["user_id"], "d": day, "v": ev["value"]})
    rows = []
    for (u, d), _ in df.groupby(["u", "d"]):
        win = df[(df["u"] == u) & (df["d"] >= d - W + 1) & (df["d"] <= d)]
        v = np.sort(win["v"].to_numpy())
        pos = (len(v) - 1) * 0.5
        fl = int(np.floor(pos))
        frac = pos - fl
        med = v[fl] * (1 - frac) + v[min(fl + 1, len(v) - 1)] * frac
        rows.append((u, d, med, len(v)))
    want = pd.DataFrame(rows, columns=["user_id", "day", "p50_7d",
                                       "n_window"]).sort_values(
        ["user_id", "day"]).reset_index(drop=True)
    assert got.shape == want.shape
    for c in ["user_id", "day", "n_window"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["p50_7d"].to_numpy() == want["p50_7d"].to_numpy()).all()


def test_changepoint_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import changepoint_split

    ev = _valued(seed=211, n=2200, nusers=18)
    got = changepoint_split(ray.data.from_pandas(ev).repartition(6),
                            num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        sl = np.cumsum(x)
        t = np.arange(1, n + 1)
        score = np.abs(sl * (n - t) - (sl[-1] - sl) * t)
        score[-1] = -1
        best = int(np.argmax(score))          # first max
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert int(row["split_t"].iloc[0]) == best + 1
        assert int(row["score"].iloc[0]) == score[best]
        ml = sl[best] / (best + 1) / 100.0
        mr = (sl[-1] - sl[best]) / (n - best - 1) / 100.0
        assert abs(row["mean_left"].iloc[0] - ml) < 1e-9
        assert abs(row["mean_right"].iloc[0] - mr) < 1e-9
        assert abs(row["delta"].iloc[0] - (mr - ml)) < 1e-9
    # single-row keys are dropped
    one = pd.DataFrame({
        "event_id": np.array([0], dtype=np.int64),
        "user_id": np.array([777], dtype=np.int64),
        "ts": pd.to_datetime([10**6], unit="us").astype("datetime64[us]"),
        "value": np.array([5.0]),
    })
    assert len(changepoint_split(ray.data.from_pandas(one),
                                 num_partitions=2)) == 0


def test_priority_sample_bruteforce(ray_session):
    """Priority sampling must select the exact top-k by w*2^32/h and
    its w_est must be max(w, tau); inclusion probability must favor
    heavy rows."""
    from cesium_ray.stages.sample import priority_sample

    ev = _valued(seed=307, n=3000, nusers=30)
    k = 40
    got = priority_sample(ray.data.from_pandas(ev).repartition(7), k=k)
    ids = ev["event_id"].to_numpy(np.int64)
    h = ((ids.astype(np.uint64) * np.uint64(2654435761))
         % np.uint64(1 << 32) + np.uint64(1)).astype(np.float64)
    w = np.abs(np.rint(ev["value"].to_numpy() * 100).astype(np.int64)) + 1
    pri = w.astype(np.float64) * 4294967296.0 / h
    order = np.lexsort((ids, -pri))
    want_ids = ids[order[:k]]
    tau = pri[order[k]]
    assert (got["event_id"].to_numpy() == want_ids).all()
    assert np.array_equal(
        got["w_est"].to_numpy(),
        np.maximum(w[order[:k]].astype(np.float64), tau))
    # estimator sanity: sum of w_est over the sample approximates sum(w)
    assert 0.5 < got["w_est"].sum() / w.sum() < 2.0


def test_pagerank_bruteforce(ray_session):
    from cesium_ray.stages.analytics import pagerank_types

    ev = _events(seed=401, n=3000, nusers=25)
    got = pagerank_types(ray.data.from_pandas(ev).repartition(6),
                         iters=10, num_partitions=4)
    # reference: build edges by brute force, run the same update
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    d = pd.DataFrame({"a": s["event_type"], "b": nxt}).dropna()
    e = d.groupby(["a", "b"], as_index=False).size()
    nodes = np.sort(ev["event_type"].unique())
    ix = {t: i for i, t in enumerate(nodes)}
    N = len(nodes)
    W = np.zeros((N, N))
    for _, r_ in e.iterrows():
        W[ix[r_["a"]], ix[r_["b"]]] = r_["size"]
    w = W.sum(axis=1)
    r = np.full(N, 1.0 / N)
    for _ in range(10):
        inflow = np.zeros(N)
        for i in range(N):
            if w[i] > 0:
                inflow += r[i] * W[i] / w[i]
        dang = r[w == 0].sum()
        r = 0.15 / N + 0.85 * (inflow + dang / N)
    assert (got["event_type"].to_numpy() == nodes).all()
    assert np.allclose(got["pagerank"], r, rtol=1e-9)
    assert abs(got["pagerank"].sum() - 1.0) < 1e-9
    assert (got["out_n"].to_numpy() == w.astype(np.int64)).all()


def test_zorder_locality(ray_session):
    """zorder_sort: output is nondecreasing in zkey, the key matches a
    bit-interleave recompute, and every bit-aligned 2^j x 2^j box maps
    to ONE contiguous z range (the Morton locality property)."""
    from cesium_ray.stages.partition import zorder_key, zorder_sort

    ev = _events(seed=503, n=2000, nusers=64)
    out = zorder_sort(ray.data.from_pandas(ev), bits=4).to_pandas()
    z = out["zkey"].to_numpy(np.int64)
    assert (np.diff(z) >= 0).all()
    # recompute
    tus = out["ts"].to_numpy("datetime64[us]").view(np.int64)
    want = zorder_key(out["user_id"].to_numpy(np.int64), tus, bits=4)
    assert (z == want).all()
    # aligned-box property: fixing the high (4-j) bits of both dims
    # confines the box to exactly one contiguous z interval
    a = out["user_id"].to_numpy(np.int64) % 16
    b = (tus // 86_400_000_000) % 16
    for j in (1, 2):
        for abox in range(0, 16, 1 << j):
            for bbox in range(0, 16, 1 << j):
                m = ((a >> j) == (abox >> j)) & ((b >> j) == (bbox >> j))
                if not m.any():
                    continue
                zs = z[m]
                lo, hi = zs.min(), zs.max()
                assert hi - lo < (1 << (2 * j)), (j, abox, bbox)
    assert len(out) == len(ev)


def test_kmv_distinct_accuracy(ray_session):
    from cesium_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(601)
    n_true = 5000
    ids = rng.choice(rng.integers(0, 10**9, n_true), 40000)
    df = pd.DataFrame({"user_id": ids.astype(np.int64)})
    got = kmv_distinct(ray.data.from_pandas(df).repartition(8), k=256)
    true_d = len(np.unique(ids))
    est = float(got["est_distinct"].iloc[0])
    # KMV relative error ~ 1/sqrt(k-2) ~= 6%; allow 4 sigma
    assert abs(est - true_d) / true_d < 0.25, (est, true_d)
    # sketch content matches a single-process recompute exactly
    h = np.unique((np.unique(ids).astype(np.uint64)
                   * np.uint64(2654435761)) % np.uint64(1 << 32))
    assert int(got["kth_hash"].iloc[0]) == int(h[255])
    assert int(got["n_hashes"].iloc[0]) == 256
    # under-k case is exact
    small = pd.DataFrame({"user_id": np.arange(30, dtype=np.int64)})
    g2 = kmv_distinct(ray.data.from_pandas(small).repartition(3), k=256)
    assert float(g2["est_distinct"].iloc[0]) == 30.0


def test_finalize_windows_bruteforce(ray_session):
    """Watermark finalize vs a sequential replay: late iff the
    exclusive running max of event time had passed window end +
    delay at arrival."""
    from cesium_ray.stages.window import finalize_windows

    ev = _valued(seed=701, n=2500, nusers=20)
    # scramble arrival order so event-time and arrival order disagree
    rng = np.random.default_rng(702)
    ev["event_id"] = rng.permutation(len(ev)).astype(np.int64)
    got = finalize_windows(ray.data.from_pandas(ev).repartition(6),
                           bucket_s=3600, delay_s=300,
                           n_arrival_buckets=8)
    s = ev.sort_values("event_id", kind="mergesort")
    tus = s["ts"].to_numpy("datetime64[us]").view(np.int64)
    x = np.rint(s["value"].to_numpy() * 100).astype(np.int64)
    w = tus // 3_600_000_000
    wm = np.r_[np.int64(np.iinfo(np.int64).min),
               np.maximum.accumulate(tus)[:-1]]
    late = wm >= (w + 1) * 3_600_000_000 + 300_000_000
    want = (pd.DataFrame({"bucket": w,
                          "late": late.astype(np.int64),
                          "x_on": np.where(late, 0, x)})
            .groupby("bucket", as_index=False)
            .agg(n=("late", "size"), n_late=("late", "sum"),
                 sum_on_time_k=("x_on", "sum"))
            .sort_values("bucket").reset_index(drop=True))
    assert got.shape == want.shape
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert int(got["n_late"].sum()) > 0  # scrambling must produce lates


def test_upsert_bruteforce(ray_session):
    from cesium_ray.stages.joins import upsert

    ev = _valued(seed=811, n=1500, nusers=25)
    delta = ev[ev["user_id"] % 5 == 0].copy()
    delta["value"] = -1.0
    got = (upsert(ray.data.from_pandas(ev).repartition(4),
                  ray.data.from_pandas(delta).repartition(3),
                  key="event_id", num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(got) == len(ev)  # keys unchanged, rows replaced
    m = got["user_id"] % 5 == 0
    assert (got.loc[m, "value"] == -1.0).all()
    assert (got.loc[m, "_src"] == 1).all()
    base_keep = got[~m].set_index("event_id")["value"]
    want = ev[ev["user_id"] % 5 != 0].set_index("event_id")["value"]
    assert (base_keep.sort_index() == want.sort_index()).all()
    # delta with a brand-new key is inserted
    new = pd.DataFrame({
        "event_id": np.array([10**6], dtype=np.int64),
        "user_id": np.array([1], dtype=np.int64),
        "event_type": ["a"], "value": np.array([9.0]),
        "ts": pd.to_datetime([0], unit="us").astype("datetime64[us]")})
    got2 = upsert(ray.data.from_pandas(ev),
                  ray.data.from_pandas(new[ev.columns]),
                  key="event_id", num_partitions=3).to_pandas()
    assert len(got2) == len(ev) + 1


def test_seasonal_anomaly_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import seasonal_anomaly

    ev = _valued(seed=919, n=3000, nusers=20)
    got = seasonal_anomaly(ray.data.from_pandas(ev).repartition(6),
                           sigma=2.0)
    tus = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    h = (tus // 3_600_000_000) % 24
    x = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    for hr in np.unique(h):
        m = h == hr
        xs = x[m]
        mean = (xs.sum() / len(xs)) / 100.0
        sd = np.sqrt((xs * xs).sum() / len(xs)
                     - (xs.sum() / len(xs)) ** 2) / 100.0
        xf = xs / 100.0
        n_anom = int(((xf < mean - 2.0 * sd)
                      | (xf > mean + 2.0 * sd)).sum())
        row = got[got["hour"] == hr]
        assert len(row) == 1
        assert int(row["n"].iloc[0]) == len(xs)
        assert abs(row["mean"].iloc[0] - mean) < 1e-9
        assert abs(row["sd"].iloc[0] - sd) < 1e-9
        assert int(row["n_anomalies"].iloc[0]) == n_anom, hr


def test_cms_sketch_properties(ray_session):
    """CM sketch: never underestimates, exact when collision-free,
    and mergeable (sketch of union == elementwise sum)."""
    from cesium_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(1009)
    ids = rng.choice(np.arange(200, dtype=np.int64), 30000,
                     p=np.r_[np.full(10, 0.05), np.full(190, 0.5 / 190)])
    df = pd.DataFrame({"user_id": ids})
    sk = cms_build(ray.data.from_pandas(df).repartition(6),
                   width=2048, depth=4)
    true = pd.Series(ids).value_counts()
    keys = true.index.to_numpy(np.int64)
    est = cms_estimate(sk, keys)
    assert (est >= true.to_numpy()).all()
    # with 200 keys over 2048 buckets x 4 rows, most estimates exact
    assert (est == true.to_numpy()).mean() > 0.9
    assert sk.sum() == 4 * len(ids)
    # mergeability
    a, b = df.iloc[:15000], df.iloc[15000:]
    ska = cms_build(ray.data.from_pandas(a), width=2048, depth=4)
    skb = cms_build(ray.data.from_pandas(b), width=2048, depth=4)
    assert (ska + skb == sk).all()


def test_decayed_topk_bruteforce(ray_session):
    from cesium_ray.stages.analytics import decayed_topk

    ev = _events(seed=1101, n=3000, nusers=40)
    got = decayed_topk(ray.data.from_pandas(ev).repartition(6),
                       half_life_days=2.0, top=10, num_partitions=4)
    tus = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    tmax = tus.max()
    w = 0.5 ** ((tmax - tus) / 86_400_000_000.0 / 2.0)
    agg = (pd.DataFrame({"u": ev["user_id"], "w": w})
           .groupby("u")["w"].sum())
    n = ev.groupby("user_id").size()
    want = (pd.DataFrame({"user_id": agg.index, "decayed": agg.values,
                          "n": n.loc[agg.index].values})
            .sort_values(["decayed", "user_id"],
                         ascending=[False, True]).head(10))
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(got["decayed"], want["decayed"], rtol=1e-12)
    # a key active only long ago ranks below an equally-counted
    # recently-active key
    assert (np.diff(got["decayed"].to_numpy()) <= 1e-12).all()


def test_session6_ops_partition_count_invariance(ray_session):
    """The session-6 batch must be bit-identical across partition
    counts and input block counts."""
    from cesium_ray.stages.analytics import decayed_topk, pagerank_types
    from cesium_ray.stages.tsmath import changepoint_split, seasonal_anomaly
    from cesium_ray.stages.window import finalize_windows

    ev = _valued(seed=1301, n=2500, nusers=18)
    d1 = ray.data.from_pandas(ev).repartition(3)
    d2 = ray.data.from_pandas(ev).repartition(13)
    pd.testing.assert_frame_equal(
        changepoint_split(d1, num_partitions=3),
        changepoint_split(d2, num_partitions=11), check_exact=True)
    pd.testing.assert_frame_equal(
        pagerank_types(d1, num_partitions=3),
        pagerank_types(d2, num_partitions=11), check_exact=True)
    pd.testing.assert_frame_equal(
        seasonal_anomaly(d1), seasonal_anomaly(d2), check_exact=True)
    pd.testing.assert_frame_equal(
        finalize_windows(d1, n_arrival_buckets=4),
        finalize_windows(d2, n_arrival_buckets=9), check_exact=True)
    # decayed sums are float partials: identical key set/order, exact
    # int columns, sums equal to ~1e-13 (blocking changes sum order)
    a = decayed_topk(d1, num_partitions=3)
    b = decayed_topk(d2, num_partitions=11)
    assert (a["user_id"].to_numpy() == b["user_id"].to_numpy()).all()
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    assert np.allclose(a["decayed"], b["decayed"], rtol=1e-12)


def test_transition_pmi_bruteforce(ray_session):
    import math

    from cesium_ray.stages.analytics import transition_pmi

    ev = _events(seed=1409, n=2500, nusers=20)
    got = transition_pmi(ray.data.from_pandas(ev).repartition(5),
                         num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    d = pd.DataFrame({"a": s["event_type"], "b": nxt}).dropna()
    e = d.groupby(["a", "b"]).size()
    N = e.sum()
    ra = e.groupby(level=0).sum()
    cb = e.groupby(level=1).sum()
    assert len(got) == len(e)
    for (a, b), n in e.items():
        row = got[(got["type_from"] == a) & (got["type_to"] == b)]
        assert int(row["n"].iloc[0]) == n
        want = math.log((n * N) / (ra[a] * cb[b]))
        assert abs(row["pmi"].iloc[0] - want) < 1e-12, (a, b)


def test_cms_join_cardinality_bound(ray_session):
    """Inner-product estimate must upper-bound the exact join size
    and be close when the sketch is sparse."""
    from cesium_ray.stages.sketch import cms_join_cardinality

    rng = np.random.default_rng(1511)
    a = pd.DataFrame({"user_id": rng.integers(0, 300, 20000)})
    b = pd.DataFrame({"user_id": rng.integers(0, 300, 5000)})
    got = cms_join_cardinality(ray.data.from_pandas(a).repartition(5),
                               ray.data.from_pandas(b).repartition(3),
                               width=4096, depth=4)
    ca = a["user_id"].value_counts()
    cb = b["user_id"].value_counts()
    exact = int((ca * cb).dropna().sum())
    est = int(got["est_join_rows"].iloc[0])
    assert est >= exact
    assert est <= exact * 1.5          # sparse sketch: tight bound
    assert int(got["n_left"].iloc[0]) == len(a)
    assert int(got["n_right"].iloc[0]) == len(b)


def test_expectations_bruteforce(ray_session):
    from cesium_ray.stages.validate import run_expectations

    df = pd.DataFrame({
        "k": np.array([1, 2, 2, 3, 4, 4, 4], dtype=np.int64),
        "v": [1.0, np.nan, 3.0, 700.0, -2.0, 5.0, np.nan],
    })
    ref = pd.DataFrame({"rk": np.array([1, 3, 4], dtype=np.int64)})
    got = run_expectations(
        ray.data.from_pandas(df).repartition(3),
        [{"kind": "not_null", "col": "v"},
         {"kind": "unique", "col": "k"},
         {"kind": "in_range", "col": "v", "lo": 0.0, "hi": 500.0},
         {"kind": "references", "col": "k", "ref": "r",
          "ref_col": "rk"}],
        refs={"r": ray.data.from_pandas(ref)})
    m = got.set_index("rule")
    assert m.loc["not_null:v", "n_violations"] == 2
    assert m.loc["unique:k", "n_checked"] == 7
    assert m.loc["unique:k", "n_violations"] == 3   # 7 rows, 4 keys
    assert m.loc["in_range:v", "n_checked"] == 5    # non-null only
    assert m.loc["in_range:v", "n_violations"] == 2  # 700, -2
    assert m.loc["references:k", "n_violations"] == 2  # the two 2s
    assert (m["passed"] == 0).all()
    clean = run_expectations(
        ray.data.from_pandas(ref), [{"kind": "unique", "col": "rk"}])
    assert int(clean["passed"].iloc[0]) == 1


def test_union_by_name_bruteforce(ray_session):
    from cesium_ray.stages.normalize import union_by_name

    a = pd.DataFrame({"x": np.array([1, 2], np.int64),
                      "y": [1.0, 2.0]})
    b = pd.DataFrame({"x": np.array([3], np.int64),
                      "z": ["s"]})
    u = union_by_name(ray.data.from_pandas(a),
                      ray.data.from_pandas(b)).to_pandas()
    assert list(u.columns) == ["x", "y", "z"]
    assert len(u) == 3
    assert u["y"].isna().sum() == 1 and u["z"].isna().sum() == 2
    assert set(u["x"]) == {1, 2, 3}


def test_melt_bruteforce(ray_session):
    from cesium_ray.stages.pivot import melt

    df = pd.DataFrame({
        "k": np.array([1, 2, 3], np.int64),
        "a": [1.5, np.nan, 2.25],
        "b": [0.5, 0.75, np.nan],
    })
    got = (melt(ray.data.from_pandas(df).repartition(2),
                id_cols=["k"], value_cols=["a", "b"])
           .to_pandas().sort_values(["k", "measure"])
           .reset_index(drop=True))
    assert len(got) == 4          # two NaNs dropped
    assert got["measure"].tolist() == ["a", "b", "b", "a"]
    assert got["value_k"].tolist() == [150, 50, 75, 225]


def test_priority_sample_per_key_bruteforce(ray_session):
    from cesium_ray.stages.sample import priority_sample_per_key

    ev = _valued(seed=1701, n=2000, nusers=15)
    got = priority_sample_per_key(
        ray.data.from_pandas(ev).repartition(6), k=2, num_partitions=4)
    ids = ev["event_id"].to_numpy(np.int64)
    h = ((ids.astype(np.uint64) * np.uint64(2654435761))
         % np.uint64(1 << 32) + np.uint64(1)).astype(np.float64)
    w = np.abs(np.rint(ev["value"].to_numpy() * 100).astype(np.int64)) + 1
    pri = w.astype(np.float64) * 4294967296.0 / h
    t = ev.assign(pri=pri)
    for uid, g in t.groupby("user_id"):
        want = (g.sort_values(["pri", "event_id"],
                              ascending=[False, True]).head(2))
        row = got[got["user_id"] == uid]
        assert len(row) == min(2, len(g))
        assert (row["event_id"].to_numpy()
                == want["event_id"].to_numpy()).all(), uid
    assert (got.groupby("user_id")["rank"].min() == 1).all()


def test_corr_matrix_bruteforce(ray_session):
    from cesium_ray.stages.analytics import corr_matrix

    rng = np.random.default_rng(1801)
    n = 3000
    a = np.round(rng.uniform(0, 50, n), 2)
    b = np.round(a * 2 + rng.normal(0, 5, n), 2)   # strongly corr
    c = np.round(rng.uniform(0, 1, n), 4)          # independent
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    got = corr_matrix(ray.data.from_pandas(df).repartition(5),
                      cols=("a", "b", "c"), scales=(100, 100, 10000))
    qa = np.rint(a * 100); qb = np.rint(b * 100); qc = np.rint(c * 10000)
    for ca, cb, x, y in [("a", "b", qa, qb), ("a", "c", qa, qc),
                         ("b", "c", qb, qc)]:
        row = got[(got["col_a"] == ca) & (got["col_b"] == cb)]
        want = np.corrcoef(x, y)[0, 1]
        assert abs(row["r"].iloc[0] - want) < 1e-9, (ca, cb)
    ab = got[(got["col_a"] == "a") & (got["col_b"] == "b")]["r"].iloc[0]
    ac = got[(got["col_a"] == "a") & (got["col_b"] == "c")]["r"].iloc[0]
    assert ab > 0.95 and abs(ac) < 0.1


def test_minmax_scale_bruteforce(ray_session):
    from cesium_ray.stages.normalize import minmax_scale_per_key

    ev = _valued(seed=1901, n=1500, nusers=12)
    # one constant key to exercise NULLIF
    const = pd.DataFrame({
        "event_id": np.arange(10**5, 10**5 + 4, dtype=np.int64),
        "user_id": np.full(4, 999, dtype=np.int64),
        "event_type": ["a"] * 4,
        "ts": pd.to_datetime(np.arange(4) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.full(4, 7.0),
    })
    ev = pd.concat([ev, const], ignore_index=True)
    got = (minmax_scale_per_key(
        ray.data.from_pandas(ev).repartition(5), num_partitions=4)
        .to_pandas().sort_values(["user_id", "event_id"])
        .reset_index(drop=True))
    k = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    t = ev.assign(k=k)
    lo = t.groupby("user_id")["k"].transform("min")
    hi = t.groupby("user_id")["k"].transform("max")
    want = np.where(hi > lo, (k - lo) / (hi - lo).astype(float), np.nan)
    w = (t.assign(w=want).sort_values(["user_id", "event_id"])
         .reset_index(drop=True))
    a = got["scaled"].to_numpy()
    b = w["w"].to_numpy()
    ok = ~np.isnan(b)
    assert (np.isnan(a) == ~ok).all()
    assert np.allclose(a[ok], b[ok], rtol=1e-12)
    assert got[got["user_id"] == 999]["scaled"].isna().all()
    assert (a[ok] >= 0).all() and (a[ok] <= 1).all()


def test_quantile_transform_bruteforce(ray_session):
    from cesium_ray.stages.normalize import quantile_transform_global

    ev = _valued(seed=2003, n=2000, nusers=10)
    got = (quantile_transform_global(
        ray.data.from_pandas(ev).repartition(5), num_partitions=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True))
    k = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    order = pd.Series(k).rank(method="min").to_numpy() - 1
    want = order / (len(k) - 1)
    s = ev.assign(w=want).sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["pct_rank"], s["w"], rtol=1e-12)
    assert got["pct_rank"].min() == 0.0
    assert got["pct_rank"].max() <= 1.0


def test_target_encode_loo_bruteforce(ray_session):
    from cesium_ray.stages.normalize import target_encode_loo

    ev = _valued(seed=2111, n=1200, nusers=10)
    single = pd.DataFrame({
        "event_id": np.array([10**6], dtype=np.int64),
        "user_id": np.array([1], dtype=np.int64),
        "event_type": ["zzz"], "value": np.array([4.0]),
        "ts": pd.to_datetime([0], unit="us").astype("datetime64[us]")})
    ev = pd.concat([ev, single], ignore_index=True)
    got = (target_encode_loo(ray.data.from_pandas(ev).repartition(5),
                             num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    k = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    t = ev.assign(k=k)
    s = t.groupby("event_type")["k"].transform("sum")
    n = t.groupby("event_type")["k"].transform("size")
    want = np.where(n > 1, ((s - k) / (n - 1)) / 100.0, np.nan)
    w = (t.assign(w=want).sort_values("event_id")
         .reset_index(drop=True))
    a, b = got["loo_mean"].to_numpy(), w["w"].to_numpy()
    ok = ~np.isnan(b)
    assert (np.isnan(a) == ~ok).all()
    assert np.allclose(a[ok], b[ok], rtol=1e-12)
    assert got[got["event_type"] == "zzz"]["loo_mean"].isna().all()


def test_zscore_scale_bruteforce(ray_session):
    from cesium_ray.stages.normalize import zscore_scale_per_key

    ev = _valued(seed=2203, n=1500, nusers=12)
    got = (zscore_scale_per_key(
        ray.data.from_pandas(ev).repartition(5), num_partitions=4)
        .to_pandas().sort_values(["user_id", "event_id"])
        .reset_index(drop=True))
    k = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    t = ev.assign(x=k / 100.0)
    mu = t.groupby("user_id")["x"].transform("mean")
    sd = t.groupby("user_id")["x"].transform(lambda s: s.std(ddof=0))
    want = ((t["x"] - mu) / sd)
    w = (t.assign(w=want).sort_values(["user_id", "event_id"])
         .reset_index(drop=True))
    assert np.allclose(got["z"], w["w"], rtol=1e-9)
    # per-key z-scores are centered with unit population variance
    g = got.groupby("user_id")["z"]
    assert np.allclose(g.mean(), 0.0, atol=1e-9)
    assert np.allclose(g.apply(lambda s: s.std(ddof=0)), 1.0,
                       atol=1e-9)


def test_one_hot_encode_bruteforce(ray_session):
    import pytest as _pytest

    from cesium_ray.stages.normalize import one_hot_encode

    ev = _events(seed=2301, n=800, nusers=10)
    got = (one_hot_encode(ray.data.from_pandas(ev).repartition(4))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    cats = sorted(ev["event_type"].unique())
    assert list(got.columns) == ["event_id"] + [f"oh_{c}" for c in cats]
    s = ev.sort_values("event_id").reset_index(drop=True)
    for c in cats:
        assert (got[f"oh_{c}"].to_numpy()
                == (s["event_type"] == c).to_numpy().astype(int)).all()
    assert (got[[f"oh_{c}" for c in cats]].sum(axis=1) == 1).all()
    # oversized alphabets are refused
    wide = pd.DataFrame({
        "event_id": np.arange(300, dtype=np.int64),
        "event_type": [f"t{i}" for i in range(300)]})
    with _pytest.raises(ValueError):
        one_hot_encode(ray.data.from_pandas(wide))


def test_expectations_empty_reference_set(ray_session):
    """ADVICE r03: an EMPTY referenced key set must report every row
    as a violation, not raise IndexError from the searchsorted guard."""
    import pandas as pd
    import ray.data

    from cesium_ray.stages.validate import run_expectations

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]}))
    empty_ref = ray.data.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64")}))
    out = run_expectations(
        ds,
        [{"name": "references:k", "kind": "references", "col": "k",
          "ref": "r", "ref_col": "k"}],
        refs={"r": empty_ref},
    ).set_index("rule")
    assert out.loc["references:k", "n_violations"] == 3
    assert out.loc["references:k", "passed"] == 0


def test_quantile_transform_single_row(ray_session):
    """ADVICE r03: a single-row input yields pct_rank 0.0 (SQL
    percent_rank semantics), not NaN from 0/0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cesium_ray.stages.normalize import quantile_transform_global

    ds = ray.data.from_pandas(pd.DataFrame(
        {"event_id": np.array([7], dtype=np.int64), "value": [3.25]}))
    out = quantile_transform_global(ds).to_pandas()
    assert len(out) == 1 and out["pct_rank"].iloc[0] == 0.0


def test_variance_ratio_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import variance_ratio

    ev = _valued(seed=211, n=2500, nusers=15)
    got = variance_ratio(ray.data.from_pandas(ev).repartition(6),
                         ks=(2, 4), num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == len(x)
        d1 = x[1:] - x[:-1]
        v1 = d1.var()                       # population
        for L in (2, 4):
            dk = x[L:] - x[:-L]
            want = dk.var() / (L * v1)
            assert abs(row[f"vr{L}"].iloc[0] - want) < 1e-9, (uid, L)
    # random walk sanity: VR ~ 1
    rng = np.random.default_rng(5)
    walk = np.cumsum(rng.normal(0, 1, 4000))
    rw = pd.DataFrame({
        "event_id": np.arange(4000, dtype=np.int64),
        "user_id": np.full(4000, 7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(4000) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(walk, 2)})
    out = variance_ratio(ray.data.from_pandas(rw), num_partitions=2)
    assert 0.8 < out["vr2"].iloc[0] < 1.2


def test_xcorr_gap_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import xcorr_gap

    ev = _valued(seed=223, n=2500, nusers=15)
    got = xcorr_gap(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        tus = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        gap = (tus[1:] - tus[:-1]) // 1_000_000
        row = got[got["user_id"] == uid]
        if gap.var() == 0 or len(x) < 3:
            assert len(row) == 0
            continue
        assert len(row) == 1
        assert int(row["n_pairs"].iloc[0]) == len(x) - 1
        want0 = np.corrcoef(x[1:], gap)[0, 1]
        want1 = np.corrcoef(x[:-1], gap)[0, 1]
        assert abs(row["r0"].iloc[0] - want0) < 1e-9, uid
        assert abs(row["r1"].iloc[0] - want1) < 1e-9, uid


def test_perm_entropy_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import perm_entropy

    ev = _valued(seed=227, n=2000, nusers=12)
    got = perm_entropy(ray.data.from_pandas(ev).repartition(6),
                       num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        cnt = {}
        for i in range(len(x) - 2):
            w = x[i:i + 3]
            ranks = []
            for j in range(3):
                r = sum(1 for q in range(3) if w[q] < w[j])
                r += sum(1 for q in range(j) if w[q] == w[j])
                ranks.append(r)
            cnt[tuple(ranks)] = cnt.get(tuple(ranks), 0) + 1
        npat = sum(cnt.values())
        h = -sum((c / npat) * np.log(c / npat) for c in cnt.values())
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_pat"].iloc[0]) == npat
        assert abs(row["pe"].iloc[0] - h / np.log(6.0)) < 1e-9, uid
    # monotone series → single pattern → entropy 0
    mono = pd.DataFrame({
        "event_id": np.arange(10, dtype=np.int64),
        "user_id": np.full(10, 3, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(10) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(10, dtype=np.float64)})
    out = perm_entropy(ray.data.from_pandas(mono), num_partitions=2)
    assert out["pe"].iloc[0] == 0.0


def test_hurst_rs_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import hurst_rs

    ev = _valued(seed=229, n=3000, nusers=10)
    got = hurst_rs(ray.data.from_pandas(ev).repartition(6),
                   num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        if len(x) < 32:
            assert len(got[got["user_id"] == uid]) == 0
            continue
        pts = []
        per_size = {}
        for w in (8, 16, 32):
            rss = []
            for ws in range(0, (len(x) // w) * w, w):
                seg = x[ws:ws + w]
                if seg.var() == 0:
                    continue
                z = np.cumsum(seg - seg.mean())
                r = max(0.0, z.max()) - min(0.0, z.min())
                rss.append(r / np.sqrt(seg.var()))
            per_size[w] = np.mean(rss)
            pts.append((np.log(w), np.log(np.mean(rss))))
        slope = np.polyfit([p[0] for p in pts],
                           [p[1] for p in pts], 1)[0]
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        for w in (8, 16, 32):
            assert abs(row[f"rs{w}"].iloc[0] - per_size[w]) < 1e-9
        assert abs(row["hurst"].iloc[0] - slope) < 1e-9, uid
    # a pure random walk's INCREMENTS have H ~ 0.5
    rng = np.random.default_rng(11)
    n = 4096
    inc = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 1, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(rng.normal(0, 10, n), 2)})
    out = hurst_rs(ray.data.from_pandas(inc), num_partitions=2)
    assert 0.35 < out["hurst"].iloc[0] < 0.72


def test_ljung_box_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import ljung_box

    ev = _valued(seed=233, n=2500, nusers=15)
    got = ljung_box(ray.data.from_pandas(ev).repartition(6),
                    max_lag=3, num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        n, mu = len(x), x.mean()
        den = ((x - mu) ** 2).sum()
        q = 0.0
        for L in (1, 2, 3):
            a = ((x[L:] - mu) * (x[:-L] - mu)).sum() / den
            q += a * a / (n - L)
        q *= n * (n + 2)
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and abs(row["q_lb"].iloc[0] - q) < 1e-7, uid
    # white noise: Q should be small (χ²₃ 99th pct ≈ 11.3) for most
    assert (got["q_lb"] < 11.3).mean() > 0.6


def test_trend_seasonal_strength_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import trend_seasonal_strength

    ev = _valued(seed=239, n=3000, nusers=12)
    got = trend_seasonal_strength(
        ray.data.from_pandas(ev).repartition(6), num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        tus = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        tau = ((tus - tus.min()) // 1_000_000).astype(np.float64)
        h = ((tus // 3_600_000_000) % 24).astype(np.int64)
        beta, alpha = np.polyfit(tau, x, 1)
        r = x - (alpha + beta * tau)
        mh = {hh: r[h == hh].mean() for hh in np.unique(h)}
        rem = r - np.array([mh[hh] for hh in h])
        s2h = {hh: x[h == hh].mean() for hh in np.unique(h)}
        deseas = x - np.array([s2h[hh] for hh in h])
        fs = max(0.0, 1.0 - rem.var() / r.var())
        ft = max(0.0, 1.0 - rem.var() / deseas.var())
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert abs(row["seasonal_strength"].iloc[0] - fs) < 1e-7, uid
        assert abs(row["trend_strength"].iloc[0] - ft) < 1e-7, uid
    # planted signals: a pure ramp → trend ~1; a pure hour-wave → seas ~1
    n = 2000
    tus = np.arange(n, dtype=np.int64) * 900_000_000  # 15-min grid
    base = {
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(tus, unit="us").astype("datetime64[us]")}
    ramp = pd.DataFrame({**base,
                         "user_id": np.full(n, 1, dtype=np.int64),
                         "value": np.round(np.linspace(0, 400, n), 2)})
    hour = ((tus // 3_600_000_000) % 24).astype(np.float64)
    rng = np.random.default_rng(13)
    wave = pd.DataFrame({**base,
                         "user_id": np.full(n, 2, dtype=np.int64),
                         "value": np.round(
                             50 + 40 * np.sin(hour / 24 * 2 * np.pi)
                             + rng.normal(0, 1, n), 2)})
    out = trend_seasonal_strength(
        ray.data.from_pandas(pd.concat([ramp, wave], ignore_index=True)),
        num_partitions=2)
    assert out[out["user_id"] == 1]["trend_strength"].iloc[0] > 0.95
    assert out[out["user_id"] == 2]["seasonal_strength"].iloc[0] > 0.95


def test_turning_points_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import turning_points

    ev = _valued(seed=241, n=2500, nusers=15)
    got = turning_points(ray.data.from_pandas(ev).repartition(6),
                         num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        t = sum(1 for i in range(1, n - 1)
                if (x[i - 1] < x[i] > x[i + 1])
                or (x[i - 1] > x[i] < x[i + 1]))
        z = (t - 2.0 * (n - 2.0) / 3.0) / np.sqrt((16.0 * n - 29.0) / 90.0)
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_turns"].iloc[0]) == t
        assert abs(row["z_tp"].iloc[0] - z) < 1e-9, uid
    # i.i.d. values: |z| should be small for most keys
    assert (got["z_tp"].abs() < 3).mean() > 0.8
    # a monotone ramp has zero turning points and very negative z
    mono = pd.DataFrame({
        "event_id": np.arange(200, dtype=np.int64),
        "user_id": np.full(200, 9, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(200) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(200, dtype=np.float64)})
    out = turning_points(ray.data.from_pandas(mono), num_partitions=2)
    assert int(out["n_turns"].iloc[0]) == 0 and out["z_tp"].iloc[0] < -10


def test_ar1_fit_bruteforce_and_recovery(ray_session):
    from cesium_ray.stages.tsmath import ar1_fit

    ev = _valued(seed=251, n=2500, nusers=15)
    got = ar1_fit(ray.data.from_pandas(ev).repartition(6),
                  num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        mu = x.mean()
        den = ((x - mu) ** 2).sum()
        phi = ((x[1:] - mu) * (x[:-1] - mu)).sum() / den
        sig2 = den / len(x) * (1 - phi * phi) / 1e4
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert abs(row["phi"].iloc[0] - phi) < 1e-9, uid
        assert abs(row["sigma2_eps"].iloc[0] - sig2) < 1e-9, uid
        if 0 < phi < 1:
            assert abs(row["half_life"].iloc[0]
                       - (-np.log(2) / np.log(phi))) < 1e-9
        else:
            assert np.isnan(row["half_life"].iloc[0])
    # planted AR(1): phi recovery within sampling error
    rng = np.random.default_rng(17)
    n, true_phi = 6000, 0.7
    z = np.zeros(n)
    for i in range(1, n):
        z[i] = true_phi * z[i - 1] + rng.normal(0, 5)
    ar = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 1, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(z, 2)})
    out = ar1_fit(ray.data.from_pandas(ar), num_partitions=2)
    assert abs(out["phi"].iloc[0] - true_phi) < 0.05
    assert 1.5 < out["half_life"].iloc[0] < 2.5  # -ln2/ln(0.7) ≈ 1.94


def test_burstiness_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import burstiness

    ev = _valued(seed=261, n=2500, nusers=15)
    got = burstiness(ray.data.from_pandas(ev).repartition(6),
                     num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        t = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        d = (t[1:] - t[:-1]) // 1_000_000
        if len(d) < 3:
            assert uid not in got["user_id"].values
            continue
        mu, sig = d.mean(), d.std()
        b = (sig - mu) / (sig + mu) if sig + mu > 0 else np.nan
        a, bb = d[:-1].astype(float), d[1:].astype(float)
        m = np.corrcoef(a, bb)[0, 1] if a.std() > 0 and bb.std() > 0 \
            else np.nan
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert int(row["n_gaps"].iloc[0]) == len(d)
        assert abs(row["b_burst"].iloc[0] - b) < 1e-9, uid
        if not np.isnan(m):
            assert abs(row["m_memory"].iloc[0] - m) < 1e-9, uid
    # a metronome (constant gaps) has B = -1 and undefined M
    n = 50
    metro = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 60 * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.zeros(n)})
    out = burstiness(ray.data.from_pandas(metro), num_partitions=2)
    assert abs(out["b_burst"].iloc[0] + 1.0) < 1e-12
    assert np.isnan(out["m_memory"].iloc[0])


def test_kendall_tau_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import kendall_tau

    ev = _valued(seed=271, n=2000, nusers=12)
    got = kendall_tau(ray.data.from_pandas(ev).repartition(6),
                      num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        t = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        # brute-force tau-b over all unordered pairs
        n = len(t)
        cc = dd = t1 = t2 = 0
        for i in range(n):
            for j in range(i + 1, n):
                dt = t[j] - t[i]
                dx = x[j] - x[i]
                if dx == 0:
                    t1 += 1
                if dt == 0:
                    t2 += 1
                if dt * dx > 0:
                    cc += 1
                elif dt != 0 and dx != 0:
                    dd += 1
        n0 = n * (n - 1) // 2
        want = (cc - dd) / np.sqrt(float(n0 - t1) * float(n0 - t2))
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_events"].iloc[0]) == len(g)
        assert abs(row["tau_b"].iloc[0] - want) < 1e-9, uid
    # perfect monotone ramp: tau_b = 1
    n = 40
    mono = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 3, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n, dtype=np.float64)})
    out = kendall_tau(ray.data.from_pandas(mono), num_partitions=2)
    assert abs(out["tau_b"].iloc[0] - 1.0) < 1e-12


def test_seasonal_naive_mase_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import seasonal_naive_mase

    ev = _events(seed=281, n=3000, nusers=15)
    got = seasonal_naive_mase(ray.data.from_pandas(ev).repartition(6),
                              num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        if span <= 24:
            assert uid not in got["user_id"].values
            continue
        cnt = np.bincount(hb - mn, minlength=span)
        sae = np.abs(cnt[24:] - cnt[:-24]).sum()
        nae = np.abs(cnt[1:] - cnt[:-1]).sum()
        if nae == 0:
            continue
        want = (sae / (span - 24)) / (nae / (span - 1))
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_hours"].iloc[0]) == span
        assert abs(row["mase"].iloc[0] - want) < 1e-12, uid
    # perfectly daily-periodic activity: seasonal-naive is exact, MASE=0
    reps = 10 * 24
    per = pd.DataFrame({
        "event_id": np.arange(reps, dtype=np.int64),
        "user_id": np.full(reps, 5, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(reps) * 3_600 * 10**6, unit="us"
                             ).astype("datetime64[us]")})
    # one event every hour -> flat; make it periodic instead: 2 events
    # at hour%24==0 via duplicated midnight rows
    extra = per[np.arange(reps) % 24 == 0].copy()
    extra["event_id"] += 10_000
    out = seasonal_naive_mase(
        ray.data.from_pandas(pd.concat([per, extra], ignore_index=True)),
        num_partitions=2)
    assert out["mase"].iloc[0] == 0.0


def test_pacf_bruteforce_and_ar1_cutoff(ray_session):
    from cesium_ray.stages.tsmath import pacf_lags

    ev = _valued(seed=291, n=2500, nusers=15)
    got = pacf_lags(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        n = len(x)
        if n <= 3:
            assert uid not in got["user_id"].values
            continue
        mu = x.mean()
        den = ((x - mu) ** 2).sum()
        r = [((x[L:] - mu) * (x[:-L] - mu)).sum() / den
             for L in (1, 2, 3)]
        p2 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
        phi21 = r[0] - p2 * r[0]
        p3 = (r[2] - phi21 * r[1] - p2 * r[0]) \
            / (1 - phi21 * r[0] - p2 * r[1])
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert abs(row["pacf1"].iloc[0] - r[0]) < 1e-9, uid
        assert abs(row["pacf2"].iloc[0] - p2) < 1e-9, uid
        assert abs(row["pacf3"].iloc[0] - p3) < 1e-9, uid
    # AR(1) cutoff: pacf1 ~= phi, pacf2/pacf3 ~= 0
    rng = np.random.default_rng(5)
    n, phi = 4000, 0.6
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + rng.normal()
    ar = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 1, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(x, 2)})
    out = pacf_lags(ray.data.from_pandas(ar), num_partitions=2)
    assert abs(out["pacf1"].iloc[0] - phi) < 0.05
    assert abs(out["pacf2"].iloc[0]) < 0.06
    assert abs(out["pacf3"].iloc[0]) < 0.06


def test_durbin_watson_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import durbin_watson

    ev = _valued(seed=301, n=2500, nusers=15)
    got = durbin_watson(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        n = len(x)
        dw = (np.diff(x) ** 2).sum() / ((x - x.mean()) ** 2).sum()
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert abs(row["dw"].iloc[0] - dw) < 1e-9, uid
        assert abs(row["vn"].iloc[0] - dw * n / (n - 1)) < 1e-9, uid
    # alternating +1/-1 stream: maximal negative serial corr, DW -> 4
    n = 200
    alt = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 2, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.where(np.arange(n) % 2 == 0, 1.0, -1.0)})
    out = durbin_watson(ray.data.from_pandas(alt), num_partitions=2)
    assert out["dw"].iloc[0] > 3.9


def test_count_dispersion_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import count_dispersion

    ev = _events(seed=311, n=3000, nusers=15)
    got = count_dispersion(ray.data.from_pandas(ev).repartition(6),
                           num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        if span < 2:
            assert uid not in got["user_id"].values
            continue
        cnt = np.bincount(hb - mn, minlength=span).astype(np.float64)
        fano = cnt.var() / cnt.mean()
        allan = (np.diff(cnt) ** 2).mean() / (2 * cnt.mean())
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_hours"].iloc[0]) == span
        assert abs(row["fano"].iloc[0] - fano) < 1e-9, uid
        assert abs(row["allan"].iloc[0] - allan) < 1e-9, uid
    # deterministic 1-event-per-hour stream: zero variance, F = AF = 0
    n = 100
    per = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 4, dtype=np.int64),
        "event_type": ["a"] * n,
        "ts": pd.to_datetime(np.arange(n) * 3_600 * 10**6, unit="us"
                             ).astype("datetime64[us]")})
    out = count_dispersion(ray.data.from_pandas(per), num_partitions=2)
    assert out["fano"].iloc[0] == 0.0 and out["allan"].iloc[0] == 0.0


def test_sample_entropy_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import sample_entropy

    ev = _valued(seed=321, n=1500, nusers=10)
    got = sample_entropy(ray.data.from_pandas(ev).repartition(6),
                         tolerance=800, num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        nk = len(x)
        bp = ap = 0
        for i in range(nk - 1):
            for j in range(i + 1, nk - 1):
                if abs(x[i] - x[j]) <= 800:
                    bp += 1
                    if abs(x[i + 1] - x[j + 1]) <= 800:
                        ap += 1
        row = got[got["user_id"] == uid]
        if nk < 3 or bp == 0 or ap == 0:
            assert len(row) == 0
            continue
        assert len(row) == 1
        assert int(row["b_pairs"].iloc[0]) == bp
        assert int(row["a_pairs"].iloc[0]) == ap
        assert abs(row["sampen"].iloc[0] + np.log(ap / bp)) < 1e-9, uid
    # a constant stream is perfectly regular: every pair matches at
    # both template lengths, SampEn = -ln(1) = 0
    n = 60
    const = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 9, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.full(n, 3.0)})
    out = sample_entropy(ray.data.from_pandas(const), num_partitions=2)
    assert out["sampen"].iloc[0] == 0.0
    # regular alternation scores lower than a shuffled copy
    ab = np.where(np.arange(200) % 2 == 0, 10.0, -10.0)
    sh = ab.copy()
    np.random.default_rng(3).shuffle(sh)
    both = pd.DataFrame({
        "event_id": np.arange(400, dtype=np.int64),
        "user_id": np.r_[np.full(200, 1), np.full(200, 2)].astype(np.int64),
        "ts": pd.to_datetime(np.r_[np.arange(200), np.arange(200)] * 10**6,
                             unit="us").astype("datetime64[us]"),
        "value": np.r_[ab, sh]})
    out = sample_entropy(ray.data.from_pandas(both), tolerance=100,
                         num_partitions=2)
    o = out.set_index("user_id")["sampen"]
    assert o[1] < o[2]


def test_peak_rate_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import peak_rate

    ev = _events(seed=331, n=3000, nusers=15)
    got = peak_rate(ray.data.from_pandas(ev).repartition(6),
                    window_s=86400, num_partitions=4)
    w = 86400 * 10**6
    for uid, g in ev.groupby("user_id"):
        t = np.sort(g["ts"].to_numpy("datetime64[us]").view(np.int64))
        want = max(int(((t >= ti) & (t < ti + w)).sum()) for ti in t)
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_events"].iloc[0]) == len(t)
        assert int(row["peak_cnt"].iloc[0]) == want, uid
    # planted burst straddling a day boundary: fixed buckets would
    # split it, the sliding window must see all 30 events
    base = 86_399 * 10**6  # one second before day 1 ends
    burst = pd.DataFrame({
        "event_id": np.arange(30, dtype=np.int64),
        "user_id": np.full(30, 77, dtype=np.int64),
        "event_type": ["a"] * 30,
        "ts": pd.to_datetime(base + np.arange(30) * 10**5, unit="us"
                             ).astype("datetime64[us]")})
    out = peak_rate(ray.data.from_pandas(burst), window_s=60,
                    num_partitions=2)
    assert int(out["peak_cnt"].iloc[0]) == 30


def test_markov_entropy_rate_bruteforce(ray_session):
    from cesium_ray.stages.analytics import markov_entropy_rate

    ev = _events(seed=341, n=2500, nusers=15)
    got = markov_entropy_rate(ray.data.from_pandas(ev).repartition(6),
                              num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        a = g["event_type"].to_numpy(object)
        if len(a) < 2:
            assert uid not in got["user_id"].values
            continue
        pairs = pd.DataFrame({"f": a[:-1], "t": a[1:]})
        c = pairs.groupby(["f", "t"]).size()
        ca = pairs.groupby("f").size()
        tot = len(pairs)
        h = -sum(cv * np.log(cv / ca[f]) for (f, _), cv in c.items()) / tot
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_trans"].iloc[0]) == tot
        assert abs(row["entropy_rate"].iloc[0] - h) < 1e-9, uid
    # deterministic cycle a->b->a->b: next type is certain, H = 0
    n = 40
    cyc = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 8, dtype=np.int64),
        "event_type": np.where(np.arange(n) % 2 == 0, "a", "b"),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]")})
    out = markov_entropy_rate(ray.data.from_pandas(cyc),
                              num_partitions=2)
    assert out["entropy_rate"].iloc[0] == 0.0


def test_exp_gap_fit_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import exp_gap_fit

    ev = _events(seed=351, n=2500, nusers=15)
    got = exp_gap_fit(ray.data.from_pandas(ev).repartition(6),
                      num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        t = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        d = np.sort((t[1:] - t[:-1]) // 1_000_000)
        n = len(d)
        if n < 3 or d.sum() <= 0:
            assert uid not in got["user_id"].values
            continue
        lam = n / d.sum()
        f = 1.0 - np.exp(-lam * d)
        i = np.arange(1, n + 1)
        want = max((i / n - f).max(), (f - (i - 1) / n).max())
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_gaps"].iloc[0]) == n
        assert abs(row["lam_per_s"].iloc[0] - lam) < 1e-12, uid
        assert abs(row["ks_exp"].iloc[0] - want) < 1e-9, uid
    # planted signals: exponential-quantile gaps fit tightly; a
    # metronome's one-point CDF is maximally far (D = 1 - 1/e)
    n = 400
    u = (np.arange(n) + 0.5) / n
    gaps = np.rint(-np.log(1.0 - u) * 600).astype(np.int64)
    rng = np.random.default_rng(7)
    rng.shuffle(gaps)
    t_exp = np.cumsum(np.r_[0, gaps]) * 10**6
    t_met = np.arange(n + 1, dtype=np.int64) * 600 * 10**6
    both = pd.DataFrame({
        "event_id": np.arange(2 * (n + 1), dtype=np.int64),
        "user_id": np.r_[np.full(n + 1, 1), np.full(n + 1, 2)
                         ].astype(np.int64),
        "ts": pd.to_datetime(np.r_[t_exp, t_met], unit="us"
                             ).astype("datetime64[us]")})
    out = exp_gap_fit(ray.data.from_pandas(both), num_partitions=2)
    o = out.set_index("user_id")["ks_exp"]
    assert o[1] < 0.05
    assert abs(o[2] - (1.0 - np.exp(-1.0))) < 1e-9


def test_promo_share_smoke(ray_session):
    """Q14-style at sf0.001: schema + DuckDB recomputation."""
    import duckdb

    from cesium_ray.pipelines.extra_queries import (
        PROMO_SHARE_SQL, q_promo_share)

    sf = "/root/testdata/sf0.001"
    got = q_promo_share(sf)
    assert list(got.columns) == ["ym", "promo_rev", "total_rev",
                                 "promo_share"]
    assert (got["promo_rev"] <= got["total_rev"]).all()
    assert got["ym"].is_monotonic_increasing
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    want = (con.sql(PROMO_SHARE_SQL).df()
            .sort_values("ym").reset_index(drop=True))
    assert got.shape == want.shape
    assert (got["ym"].to_numpy() == want["ym"].to_numpy()).all()
    assert (got["promo_rev"].to_numpy()
            == want["promo_rev"].to_numpy()).all()
    assert np.allclose(got["promo_share"].to_numpy(),
                       want["promo_share"].to_numpy(), atol=1e-6)


def test_day_streak_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import day_streak

    ev = _events(seed=361, n=3000, nusers=15)
    got = day_streak(ray.data.from_pandas(ev).repartition(6),
                     num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        days = np.unique(g["ts"].to_numpy("datetime64[us]")
                         .view(np.int64) // 86_400_000_000)
        best = cur = 1
        for i in range(1, len(days)):
            cur = cur + 1 if days[i] - days[i - 1] == 1 else 1
            best = max(best, cur)
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert int(row["n_active_days"].iloc[0]) == len(days)
        assert int(row["max_streak"].iloc[0]) == best, uid
    # planted: days 0,1,2, 5, 9,10 -> 6 active days, streak 3
    d = np.array([0, 1, 2, 5, 9, 10], dtype=np.int64)
    pl = pd.DataFrame({
        "event_id": np.arange(len(d), dtype=np.int64),
        "user_id": np.full(len(d), 3, dtype=np.int64),
        "ts": pd.to_datetime(d * 86_400 * 10**6 + 5, unit="us"
                             ).astype("datetime64[us]")})
    out = day_streak(ray.data.from_pandas(pl), num_partitions=2)
    assert int(out["n_active_days"].iloc[0]) == 6
    assert int(out["max_streak"].iloc[0]) == 3


def test_seasonal_power_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import seasonal_power

    ev = _events(seed=371, n=3000, nusers=15)
    got = seasonal_power(ray.data.from_pandas(ev).repartition(6),
                         num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        if span <= 24:
            assert uid not in got["user_id"].values
            continue
        cnt = np.bincount(hb - mn, minlength=span).astype(np.float64)
        mu = cnt.mean()
        ss = ((cnt - mu) ** 2).sum()
        row = got[got["user_id"] == uid]
        if ss <= 0:
            assert len(row) == 0
            continue
        t = np.arange(span)
        for p, col in ((24, "r2_24h"), (12, "r2_12h")):
            ph = 2 * np.pi * (t % p) / p
            cq = ((cnt - mu) * np.cos(ph)).sum()
            sq = ((cnt - mu) * np.sin(ph)).sum()
            want = 2 * (cq * cq + sq * sq) / (span * ss)
            assert abs(row[col].iloc[0] - want) < 1e-9, (uid, p)
    # planted pure daily sinusoid over 10 whole days:
    # r2_24h ~ 1 (one count unit of quantization), r2_12h ~ 0
    hours = np.arange(240)
    lam = 5.0 + 4.0 * np.cos(2 * np.pi * (hours % 24) / 24.0)
    counts = np.rint(lam).astype(np.int64)
    ts = np.repeat(hours * 3_600 * 10**6, counts)
    pl = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.full(len(ts), 6, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = seasonal_power(ray.data.from_pandas(pl), num_partitions=2)
    assert out["r2_24h"].iloc[0] > 0.98
    assert out["r2_12h"].iloc[0] < 0.02


def test_haar_energy_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import haar_energy

    ev = _events(seed=381, n=3000, nusers=15)
    got = haar_energy(ray.data.from_pandas(ev).repartition(6),
                      num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        row = got[got["user_id"] == uid]
        if span < 8:
            assert len(row) == 0
            continue
        a = np.bincount(hb - mn, minlength=span)
        want = []
        for _ in range(3):
            m = len(a) // 2
            d = a[:2 * m:2] - a[1:2 * m:2]
            want.append(int((d * d).sum()))
            a = a[:2 * m:2] + a[1:2 * m:2]
        assert len(row) == 1 and int(row["n_hours"].iloc[0]) == span
        assert [int(row[f"e{i}"].iloc[0]) for i in (1, 2, 3)] == want
    # planted: pure hour-to-hour alternation 4,0,4,0,... -> all the
    # energy at level 1, none deeper (pairs sum to a constant)
    n = 64
    cnts = np.where(np.arange(n) % 2 == 0, 4, 0)
    ts = np.repeat(np.arange(n) * 3_600 * 10**6, cnts)
    pl = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.full(len(ts), 5, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = haar_energy(ray.data.from_pandas(pl), num_partitions=2)
    # note: the grid only spans hours that contain events (odd hours
    # at the tail are empty), so span = 63 and the last lone hour of
    # each level is truncated
    assert int(out["e1"].iloc[0]) == 31 * 16
    assert int(out["e2"].iloc[0]) == 0
    assert int(out["e3"].iloc[0]) == 0


def test_gumbel_maxima_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import gumbel_maxima

    ev = _events(seed=391, n=3000, nusers=15)
    got = gumbel_maxima(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        dmn, dmx = int(hb.min() // 24), int(hb.max() // 24)
        nd = dmx - dmn + 1
        hc = np.bincount(hb - dmn * 24, minlength=nd * 24)
        mx = hc[:nd * 24].reshape(nd, 24).max(axis=1).astype(np.float64)
        row = got[got["user_id"] == uid]
        if nd < 2 or mx.var() <= 0:
            assert len(row) == 0
            continue
        beta = mx.std() * np.sqrt(6.0) / np.pi
        mu = mx.mean() - 0.5772156649015329 * beta
        assert len(row) == 1 and int(row["n_days"].iloc[0]) == nd
        assert abs(row["gum_mu"].iloc[0] - mu) < 1e-9, uid
        assert abs(row["gum_beta"].iloc[0] - beta) < 1e-9, uid
    # recovery: draw true-Gumbel block maxima, the moment fit must
    # land near the generating parameters
    rng = np.random.default_rng(11)
    nd = 365
    mx = np.rint(50.0 - 8.0 * np.log(-np.log(rng.uniform(size=nd)))
                 ).astype(np.int64)
    ts = []
    for d, m in enumerate(mx):
        ts.extend([d * 86_400 * 10**6] * int(m))  # all in hour 0
    ts = np.asarray(ts, dtype=np.int64)
    pl = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.full(len(ts), 1, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = gumbel_maxima(ray.data.from_pandas(pl), num_partitions=2)
    assert abs(out["gum_mu"].iloc[0] - 50.0) < 2.0
    assert abs(out["gum_beta"].iloc[0] - 8.0) < 1.5


def test_gini_values_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import gini_values

    ev = _valued(seed=401, n=1200, nusers=10)
    got = gini_values(ray.data.from_pandas(ev).repartition(5),
                      num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        want = (np.abs(x[:, None] - x[None, :]).sum() / 2
                / (n * (n - 1) / 2))
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert abs(row["gmd"].iloc[0] - want) < 1e-9, uid
    # two-point distribution {0, 10}: GMD = 2*p*(1-p)*n^2/(n(n-1))*10
    x = np.r_[np.zeros(30), np.full(10, 10.0)]
    pl = pd.DataFrame({
        "event_id": np.arange(40, dtype=np.int64),
        "user_id": np.full(40, 1, dtype=np.int64),
        "value": x})
    out = gini_values(ray.data.from_pandas(pl), num_partitions=2)
    want = 30 * 10 * 1000 / (40 * 39 / 2)  # pairs across the groups
    assert abs(out["gmd"].iloc[0] - want) < 1e-9


def test_quartile_cv_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import quartile_cv

    ev = _valued(seed=411, n=1500, nusers=12)
    got = quartile_cv(ray.data.from_pandas(ev).repartition(5),
                      num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.sort(np.rint(g["value"].to_numpy() * 100)
                    .astype(np.int64))
        n = len(x)
        q1 = x[(n + 3) // 4 - 1]
        q3 = x[(3 * n + 3) // 4 - 1]
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["iqr"].iloc[0]) == q3 - q1
        if q3 + q1 != 0:
            assert abs(row["cqv"].iloc[0] - (q3 - q1) / (q3 + q1)) \
                < 1e-12, uid
    # known order stats: values 1..8 -> Q1 = x_(2) = 2, Q3 = x_(6) = 6
    pl = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "user_id": np.full(8, 2, dtype=np.int64),
        "value": np.arange(1, 9, dtype=np.float64)})
    out = quartile_cv(ray.data.from_pandas(pl), num_partitions=2)
    assert int(out["iqr"].iloc[0]) == 400
    assert abs(out["cqv"].iloc[0] - 400 / 800) < 1e-12


def test_daily_profile_drift_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import daily_profile_drift

    ev = _events(seed=421, n=3000, nusers=15)
    got = daily_profile_drift(ray.data.from_pandas(ev).repartition(6),
                              num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        day, hod = hb // 24, hb % 24
        prof = np.bincount(hod, minlength=24).astype(np.float64)
        tot = prof.sum()
        kls = []
        for d in np.unique(day):
            c = np.bincount(hod[day == d], minlength=24
                            ).astype(np.float64)
            cd = c.sum()
            m = c > 0
            kls.append(((c[m] / cd)
                        * np.log((c[m] / cd) / (prof[m] / tot))).sum())
        row = got[got["user_id"] == uid]
        if len(kls) < 2:
            assert len(row) == 0
            continue
        assert len(row) == 1 and int(row["n_days"].iloc[0]) == len(kls)
        assert abs(row["max_kl"].iloc[0] - max(kls)) < 1e-9, uid
        assert abs(row["mean_kl"].iloc[0] - np.mean(kls)) < 1e-9, uid
    # planted routine break: 9 days at hour 9, one day at hour 21 —
    # the odd day must dominate max_kl
    days = np.r_[np.arange(9), [9]]
    hours = np.r_[np.full(9, 9), [21]]
    ts = (days * 24 + hours) * 3_600 * 10**6
    pl = pd.DataFrame({
        "event_id": np.arange(10, dtype=np.int64),
        "user_id": np.full(10, 4, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = daily_profile_drift(ray.data.from_pandas(pl),
                              num_partitions=2)
    # odd day: KL = ln(1/(1/10)) = ln 10; routine days: ln(10/9)
    assert abs(out["max_kl"].iloc[0] - np.log(10.0)) < 1e-12


def test_count_acf_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import count_acf

    ev = _events(seed=441, n=3000, nusers=15)
    got = count_acf(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        row = got[got["user_id"] == uid]
        if span <= 24:
            assert len(row) == 0
            continue
        c = np.bincount(hb - mn, minlength=span).astype(np.float64)
        mu = c.mean()
        den = ((c - mu) ** 2).sum()
        if den == 0:
            assert len(row) == 0
            continue
        assert len(row) == 1 and int(row["n_hours"].iloc[0]) == span
        for lg, col in ((1, "cacf1"), (24, "cacf24")):
            want = ((c[lg:] - mu) * (c[:-lg] - mu)).sum() / den
            assert abs(row[col].iloc[0] - want) < 1e-9, (uid, lg)
    # planted perfect 24h repetition: cacf24 near 1, cacf1 low
    hours = np.arange(24 * 12)
    counts = np.where(hours % 24 == 9, 5, np.where(hours % 24 == 15,
                                                   3, 0))
    ts = np.repeat(hours * 3_600 * 10**6, counts)
    pl = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.full(len(ts), 2, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = count_acf(ray.data.from_pandas(pl), num_partitions=2)
    assert out["cacf24"].iloc[0] > 0.9
    assert out["cacf1"].iloc[0] < 0.3


def test_circadian_phase_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import circadian_phase

    ev = _events(seed=451, n=2500, nusers=15)
    got = circadian_phase(ray.data.from_pandas(ev).repartition(6),
                          num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        tod = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            % 86_400_000_000
        ang = 2 * np.pi * tod / 86_400_000_000
        cs, sn = np.cos(ang).sum(), np.sin(ang).sum()
        n = len(ang)
        r = np.sqrt(cs * cs + sn * sn) / n
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert abs(row["resultant"].iloc[0] - r) < 1e-9, uid
        if r > 0.01:
            ph = np.arctan2(sn, cs) * 24 / (2 * np.pi)
            if ph < 0:
                ph += 24
            assert abs(row["mean_hour"].iloc[0] - ph) < 1e-9, uid
    # planted: events at 23:00 and 01:00 average to midnight (0h),
    # NOT to the arithmetic mean 12h — the circular-mean acid test
    ts = np.array([23 * 3600, 25 * 3600, 23 * 3600 + 86400,
                   25 * 3600 + 86400], dtype=np.int64) * 10**6
    pl = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.full(4, 3, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = circadian_phase(ray.data.from_pandas(pl), num_partitions=2)
    mh = out["mean_hour"].iloc[0]
    assert min(mh, 24 - mh) < 1e-6
    assert abs(out["resultant"].iloc[0]
               - np.cos(2 * np.pi * 3600 / 86400)) < 1e-9


def test_hour_runs_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import hour_runs

    ev = _events(seed=471, n=3000, nusers=15)
    got = hour_runs(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        hb = g["ts"].to_numpy("datetime64[us]").view(np.int64) \
            // 3_600_000_000
        mn, mx = int(hb.min()), int(hb.max())
        span = mx - mn + 1
        act = np.bincount(hb - mn, minlength=span) > 0
        runs, cur, st = [], 1, act[0]
        for i in range(1, span):
            if act[i] == st:
                cur += 1
            else:
                runs.append((st, cur))
                st, cur = act[i], 1
        runs.append((st, cur))
        alen = [l for s, l in runs if s]
        ilen = [l for s, l in runs if not s]
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n_hours"].iloc[0]) == span
        assert int(row["active_runs"].iloc[0]) == len(alen)
        assert int(row["max_active_run"].iloc[0]) == max(alen)
        assert abs(row["mean_active_run"].iloc[0]
                   - np.mean(alen)) < 1e-12, uid
        if ilen:
            assert abs(row["mean_idle_run"].iloc[0]
                       - np.mean(ilen)) < 1e-12, uid
        else:
            assert np.isnan(row["mean_idle_run"].iloc[0])
    # planted duty cycle: 3 h on / 5 h off, 8 cycles + final on-block
    on = []
    for c in range(8):
        on.extend(range(c * 8, c * 8 + 3))
    on.extend(range(64, 67))
    ts = np.asarray(on, dtype=np.int64) * 3_600 * 10**6
    pl = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.full(len(ts), 9, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us").astype("datetime64[us]")})
    out = hour_runs(ray.data.from_pandas(pl), num_partitions=2)
    assert int(out["active_runs"].iloc[0]) == 9
    assert int(out["max_active_run"].iloc[0]) == 3
    assert abs(out["mean_active_run"].iloc[0] - 3.0) < 1e-12
    assert abs(out["mean_idle_run"].iloc[0] - 5.0) < 1e-12


def test_revenue_leak_smoke(ray_session):
    """Q6-style at sf0.001: pushdown read + DuckDB recomputation."""
    import duckdb

    from cesium_ray.pipelines.extra_queries import (
        REVENUE_LEAK_SQL, q_revenue_leak)

    sf = "/root/testdata/sf0.001"
    got = q_revenue_leak(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{sf}/lineitem.parquet')")
    want = con.sql(REVENUE_LEAK_SQL).df()
    assert int(got["n_rows"].iloc[0]) == int(want["n_rows"].iloc[0])
    assert int(got["leak_units"].iloc[0]) \
        == int(want["leak_units"].iloc[0])
    assert got["n_rows"].iloc[0] > 0


def test_lmoments_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import lmoments

    ev = _valued(seed=481, n=1500, nusers=12)
    got = lmoments(ray.data.from_pandas(ev).repartition(5),
                   num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.sort(np.rint(g["value"].to_numpy() * 100)
                    .astype(np.int64)).astype(np.float64)
        n = len(x)
        i = np.arange(n)
        b0 = x.mean()
        b1 = (i * x).sum() / (n * (n - 1))
        b2 = (i * (i - 1) / 2 * x).sum() / (n * (n - 1) * (n - 2) / 2)
        b3 = (i * (i - 1) * (i - 2) / 6 * x).sum() \
            / (n * (n - 1) * (n - 2) * (n - 3) / 6)
        l2 = 2 * b1 - b0
        l3 = 6 * b2 - 6 * b1 + b0
        l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
        row = got[got["user_id"] == uid]
        assert len(row) == 1 and int(row["n"].iloc[0]) == n
        assert abs(row["l2"].iloc[0] - l2) < 1e-9, uid
        assert abs(row["t3"].iloc[0] - l3 / l2) < 1e-9, uid
        assert abs(row["t4"].iloc[0] - l4 / l2) < 1e-9, uid
    # known-answer gates: a symmetric uniform sample has t3 ~ 0 and
    # t4 ~ 0 (uniform L-kurtosis is exactly 0); an exponential-shaped
    # sample has t3 ~ 1/3
    rng = np.random.default_rng(13)
    n = 4000
    uni = np.round(rng.uniform(-40, 40, n), 2)
    expo = np.round(rng.exponential(20.0, n), 2)
    df = pd.DataFrame({
        "event_id": np.arange(2 * n, dtype=np.int64),
        "user_id": np.r_[np.full(n, 1), np.full(n, 2)].astype(np.int64),
        "value": np.r_[uni, expo]})
    out = lmoments(ray.data.from_pandas(df), num_partitions=2
                   ).set_index("user_id")
    assert abs(out.loc[1, "t3"]) < 0.02
    assert abs(out.loc[1, "t4"]) < 0.02
    assert abs(out.loc[2, "t3"] - 1.0 / 3.0) < 0.03


def test_hjorth_params_bruteforce_and_sine(ray_session):
    from cesium_ray.stages.tsmath import hjorth_params

    ev = _valued(seed=301, n=2600, nusers=15)
    got = hjorth_params(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        vx = x.var()
        d = np.diff(x)
        vd = d.var()
        dd = np.diff(d)
        vdd = dd.var()
        row = got[got["user_id"] == uid]
        if len(x) < 3 or vx == 0 or vd == 0:
            assert len(row) == 0
            continue
        assert len(row) == 1
        assert abs(row["activity"].iloc[0] - vx / 1e4) < 1e-6 * max(vx, 1)
        assert abs(row["mobility"].iloc[0] - np.sqrt(vd / vx)) < 1e-9
        assert abs(row["complexity"].iloc[0]
                   - np.sqrt(vdd / vd) / np.sqrt(vd / vx)) < 1e-9
    # planted sine: mobility -> 2 sin(w/2), complexity -> ~1
    w, A, n = 0.3, 40.0, 5000
    sine = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(A * np.sin(w * np.arange(n)), 2)})
    out = hjorth_params(ray.data.from_pandas(sine), num_partitions=2)
    assert abs(out["mobility"].iloc[0] - 2 * np.sin(w / 2)) < 0.01
    assert abs(out["complexity"].iloc[0] - 1.0) < 0.02


def test_teager_energy_bruteforce_and_sine(ray_session):
    from cesium_ray.stages.tsmath import teager_energy

    ev = _valued(seed=307, n=2400, nusers=15)
    got = teager_energy(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        row = got[got["user_id"] == uid]
        if len(x) < 3:
            assert len(row) == 0
            continue
        psi = x[1:-1] * x[1:-1] - x[:-2] * x[2:]
        assert len(row) == 1
        assert row["n_psi"].iloc[0] == len(psi)
        assert abs(row["mean_psi"].iloc[0]
                   - psi.sum() / len(psi) / 1e4) < 1e-9 * max(
                       abs(psi.sum()), 1)
        assert abs(row["neg_share"].iloc[0]
                   - (psi < 0).mean()) < 1e-12
    # planted sine: psi = A^2 sin^2(w) everywhere, no negatives
    w, A, n = 0.3, 40.0, 4000
    sine = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 3, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(A * np.sin(w * np.arange(n)), 2)})
    out = teager_energy(ray.data.from_pandas(sine), num_partitions=2)
    expect = A * A * np.sin(w) ** 2
    assert abs(out["mean_psi"].iloc[0] - expect) < 0.05 * expect
    assert out["neg_share"].iloc[0] < 0.02


def test_fractal_dims_bruteforce_and_shapes(ray_session):
    from cesium_ray.stages.tsmath import fractal_dims

    ev = _valued(seed=311, n=2400, nusers=15)
    got = fractal_dims(ray.data.from_pandas(ev).repartition(6),
                       num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        d = np.diff(x)
        L = int(np.abs(d).sum())
        D = int(np.abs(x - x[0]).max())
        nd = int((d[1:] * d[:-1] < 0).sum())
        row = got[got["user_id"] == uid]
        if n < 3 or L == 0 or D == 0:
            assert len(row) == 0
            continue
        assert len(row) == 1
        assert row["n_delta"].iloc[0] == nd
        lg = np.log10(n)
        pfd = lg / (lg + np.log10(n / (n + 0.4 * nd)))
        assert abs(row["pfd"].iloc[0] - pfd) < 1e-9
        katz = np.log10(n - 1.0) / (np.log10(n - 1.0)
                                    + np.log10(D / L))
        assert abs(row["katz_fd"].iloc[0] - katz) < 1e-9
    # shape separation: a monotone ramp has pfd ~= 1 (nd = 0) and a
    # sign-alternating sawtooth maximal nd = n - 2
    n = 1000
    base = {"event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                                 ).astype("datetime64[us]")}
    ramp = pd.DataFrame({**base,
                         "user_id": np.full(n, 1, dtype=np.int64),
                         "value": np.arange(n) * 0.5})
    saw = pd.DataFrame({**base,
                        "user_id": np.full(n, 2, dtype=np.int64),
                        "value": np.where(np.arange(n) % 2, 10.0,
                                          -10.0)})
    out = fractal_dims(
        ray.data.from_pandas(pd.concat([ramp, saw],
                                       ignore_index=True)),
        num_partitions=2)
    r = out[out["user_id"] == 1].iloc[0]
    z = out[out["user_id"] == 2].iloc[0]
    assert r["n_delta"] == 0 and abs(r["pfd"] - 1.0) < 1e-12
    assert z["n_delta"] == n - 2
    assert z["pfd"] > r["pfd"]


def test_page_hinkley_bruteforce_and_shift(ray_session):
    from cesium_ray.stages.tsmath import page_hinkley

    ev = _valued(seed=313, n=2200, nusers=15)
    got = page_hinkley(ray.data.from_pandas(ev).repartition(6),
                       num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        row = got[got["user_id"] == uid]
        if n < 2:
            assert len(row) == 0
            continue
        c = np.cumsum(n * x - x.sum())
        up = max(c[i] - c[:i + 1].min() for i in range(n))
        dn = max(c[:i + 1].max() - c[i] for i in range(n))
        assert len(row) == 1
        assert abs(row["ph_up"].iloc[0] - up / (n * 100.0)) < 1e-9
        assert abs(row["ph_down"].iloc[0] - dn / (n * 100.0)) < 1e-9
    # planted upward step: ph_up >> ph_down, magnitude ~ shift*n/4
    n, shift = 2000, 8.0
    step = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 5, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.where(np.arange(n) < n // 2, 0.0, shift)})
    out = page_hinkley(ray.data.from_pandas(step), num_partitions=2)
    # the step makes a V-shaped cumsum: full ascent n·shift/4 on the
    # up side, the same descent less the first step on the down side
    expect = shift * n / 4.0
    assert abs(out["ph_up"].iloc[0] - expect) < 1e-6
    assert abs(out["ph_down"].iloc[0] - (expect - shift / 2)) < 1e-6


def test_grubbs_stat_bruteforce_and_outlier(ray_session):
    from cesium_ray.stages.tsmath import grubbs_stat

    ev = _valued(seed=317, n=2000, nusers=15)
    got = grubbs_stat(ray.data.from_pandas(ev).repartition(6),
                      num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.float64)
        n = len(x)
        row = got[got["user_id"] == uid]
        if n < 3 or x.var() == 0:
            assert len(row) == 0
            continue
        mu = x.mean()
        mx = np.abs(x - mu).max()
        s = np.sqrt(((x - mu) ** 2).sum() / (n - 1))
        assert len(row) == 1
        assert abs(row["max_dev"].iloc[0] - mx / 100.0) < 1e-9
        assert abs(row["grubbs_g"].iloc[0] - mx / s) < 1e-9
    # planted gross outlier dominates G
    base = np.full(500, 10.0)
    base[250] = 500.0
    pl = pd.DataFrame({"user_id": np.full(500, 1, dtype=np.int64),
                       "value": base + np.round(
                           np.random.default_rng(3).uniform(
                               -0.5, 0.5, 500), 2)})
    out = grubbs_stat(ray.data.from_pandas(pl), num_partitions=2)
    assert out["grubbs_g"].iloc[0] > 20.0
    assert abs(out["max_dev"].iloc[0] - (500.0 - out["max_dev"].iloc[0]
               * 0 - 10.0)) < 2.0


def test_rfm_segmentation_bruteforce(ray_session):
    from cesium_ray.stages.analytics import rfm_segmentation

    ev = _valued(seed=331, n=2500, nusers=20)
    got = rfm_segmentation(ray.data.from_pandas(ev).repartition(6),
                           num_partitions=4)
    agg = ev.assign(k=np.rint(ev["value"] * 100).astype(np.int64),
                    t=ev["ts"].astype("datetime64[us]").astype(
                        np.int64)) \
        .groupby("user_id").agg(last_t=("t", "max"),
                                freq=("t", "size"), mon=("k", "sum"))
    hi = agg["last_t"].max()
    agg["rec"] = hi - agg["last_t"]
    n = len(agg)
    assert len(got) == n

    def scores(series, asc):
        o = series.sort_values(ascending=asc).index \
            if asc else None
        df = series.reset_index()
        df = df.sort_values([series.name, "user_id"],
                            ascending=[asc, True])
        df["rn"] = np.arange(1, n + 1)
        return dict(zip(df["user_id"], 5 - (df["rn"] - 1) * 5 // n))

    rs = scores(agg["rec"], True)
    fs = scores(agg["freq"], False)
    ms = scores(agg["mon"], False)
    for _, row in got.iterrows():
        uid = row["user_id"]
        assert row["recency_us"] == agg.loc[uid, "rec"]
        assert row["freq"] == agg.loc[uid, "freq"]
        assert abs(row["monetary"] - agg.loc[uid, "mon"] / 100.0) \
            < 1e-9
        assert row["r_score"] == rs[uid], uid
        assert row["f_score"] == fs[uid], uid
        assert row["m_score"] == ms[uid], uid
        assert row["rfm"] == 100 * rs[uid] + 10 * fs[uid] + ms[uid]


def test_monotone_runs_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import monotone_runs

    ev = _valued(seed=337, n=2400, nusers=15)
    got = monotone_runs(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        row = got[got["user_id"] == uid]
        if n < 2:
            assert len(row) == 0
            continue
        sg = np.sign(np.diff(x))
        runs = []
        cur, ln = sg[0], 1
        for v in sg[1:]:
            if v == cur:
                ln += 1
            else:
                runs.append((cur, ln))
                cur, ln = v, 1
        runs.append((cur, ln))
        assert len(row) == 1
        assert row["n"].iloc[0] == n
        assert row["n_runs"].iloc[0] == len(runs)
        for sgn, col in [(1, "longest_up"), (-1, "longest_down"),
                         (0, "longest_flat")]:
            want = max([l for s_, l in runs if s_ == sgn],
                       default=0)
            assert row[col].iloc[0] == want, (uid, col)
    # planted: strictly increasing ramp = one run of n-1 ups
    n = 300
    ramp = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 9, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n) * 0.25})
    out = monotone_runs(ray.data.from_pandas(ramp), num_partitions=2)
    assert out["longest_up"].iloc[0] == n - 1
    assert out["n_runs"].iloc[0] == 1
    assert out["longest_down"].iloc[0] == 0


def test_variogram_bruteforce_and_walk(ray_session):
    from cesium_ray.stages.tsmath import variogram

    ev = _valued(seed=347, n=2400, nusers=15)
    got = variogram(ray.data.from_pandas(ev).repartition(6),
                    num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for h in (1, 2, 4, 8):
        ss, npair = 0, 0
        for uid, g in s.groupby("user_id"):
            x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
            if len(x) > h:
                d = x[h:] - x[:-h]
                ss += int((d * d).sum())
                npair += len(d)
        row = got[got["lag"] == h]
        assert len(row) == 1
        assert row["n_pairs"].iloc[0] == npair
        assert row["ss"].iloc[0] == ss
        assert abs(row["gamma"].iloc[0]
                   - ss / (2.0 * npair) / 1e4) < 1e-9
    # random walk: gamma grows ~linearly in lag; white noise: flat
    rng = np.random.default_rng(23)
    n = 4000
    walk = np.cumsum(rng.choice([-1.0, 1.0], n))
    wdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 1, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": walk})
    out = variogram(ray.data.from_pandas(wdf), num_partitions=2)
    g1 = out[out["lag"] == 1]["gamma"].iloc[0]
    g8 = out[out["lag"] == 8]["gamma"].iloc[0]
    assert 5.0 < g8 / g1 < 11.0       # ideal random walk: ratio 8


def test_late_fulfillment_consistency(ray_session):
    from cesium_ray.pipelines.extra_queries import q_late_fulfillment
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = q_late_fulfillment(sf)
    con = duckdb.connect()
    want = con.sql(f"""
        WITH m AS (SELECT l_orderkey, max(l_shipdate) AS mx
                   FROM read_parquet('{sf}/lineitem.parquet')
                   GROUP BY 1)
        SELECT count(*) FROM read_parquet('{sf}/orders.parquet') o
        JOIN m ON m.l_orderkey = o.o_orderkey
        WHERE m.mx > o.o_orderdate + INTERVAL 90 DAY
    """).fetchone()[0]
    assert int(out["n_late"].sum()) == int(want)
    assert ((out["late_share"] >= 0) & (out["late_share"] <= 1)).all()


def test_load_factor_bruteforce_and_spike(ray_session):
    from cesium_ray.stages.tsmath import load_factor

    ev = _events(seed=353, n=3000, nusers=20)
    got = load_factor(ray.data.from_pandas(ev).repartition(6))
    tus = ev["ts"].astype("datetime64[us]").astype(np.int64)
    d = pd.DataFrame({"day": tus // 86_400_000_000,
                      "hour": (tus // 3_600_000_000) % 24})
    per = d.groupby(["day", "hour"]).size().reset_index(name="c")
    for day, g in per.groupby("day"):
        row = got[got["day"] == day]
        assert len(row) == 1
        assert row["n_events"].iloc[0] == g["c"].sum()
        assert row["peak_hour_cnt"].iloc[0] == g["c"].max()
        assert abs(row["load_factor"].iloc[0]
                   - g["c"].max() * 24.0 / g["c"].sum()) < 1e-12
    # planted: all of a day's events in one hour -> load factor 24
    ts = pd.to_datetime(np.full(120, 13) * 3_600_000_000
                        + np.arange(120) * 10**6, unit="us")
    pl = pd.DataFrame({"ts": ts.astype("datetime64[us]")})
    out = load_factor(ray.data.from_pandas(pl))
    assert abs(out["load_factor"].iloc[0] - 24.0) < 1e-12


def test_banded_revenue_consistency(ray_session):
    from cesium_ray.pipelines.extra_queries import q_banded_revenue
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = q_banded_revenue(sf)
    assert len(out) == 3
    con = duckdb.connect()
    n = con.sql(f"""
        SELECT count(*) FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/part.parquet') p
          ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity BETWEEN 1 AND 11
    """).fetchone()[0]
    assert int(out[out["p_brand"] == "Brand#11"]["n_items"]
               .iloc[0]) == int(n)
    assert (out["rev_units"] >= 0).all()


def test_time_reversal_bruteforce_and_sawtooth(ray_session):
    from cesium_ray.stages.tsmath import time_reversal

    ev = _valued(seed=359, n=2200, nusers=15)
    got = time_reversal(ray.data.from_pandas(ev).repartition(6),
                        num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        d = np.diff(x)
        row = got[got["user_id"] == uid]
        if len(x) < 2 or (d * d).sum() == 0:
            assert len(row) == 0
            continue
        nd = len(d)
        m2 = (d * d).sum() / nd
        m3 = (d.astype(np.float64) ** 3).sum() / nd
        assert len(row) == 1
        assert row["d3_sum"].iloc[0] == int((d ** 3).sum())
        assert abs(row["trev"].iloc[0] - m3 / (m2 * np.sqrt(m2))) \
            < 1e-9
    # asymmetric sawtooth: slow rise, sharp crash -> trev < 0
    n = 1200
    saw = np.tile(np.r_[np.arange(9, dtype=float), 0.0], n // 10)
    pl = pd.DataFrame({
        "event_id": np.arange(len(saw), dtype=np.int64),
        "user_id": np.full(len(saw), 2, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(len(saw)) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": saw})
    out = time_reversal(ray.data.from_pandas(pl), num_partitions=2)
    assert out["trev"].iloc[0] < -1.0


def test_c3_nonlinearity_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import c3_nonlinearity

    ev = _valued(seed=367, n=2000, nusers=15)
    got = c3_nonlinearity(ray.data.from_pandas(ev).repartition(6),
                          lag=1, num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        row = got[got["user_id"] == uid]
        if len(x) <= 2:
            assert len(row) == 0
            continue
        prod = x[2:] * x[1:-1] * x[:-2]
        assert len(row) == 1
        assert row["n_terms"].iloc[0] == len(prod)
        assert row["c3_sum"].iloc[0] == int(prod.sum())
        assert abs(row["c3"].iloc[0]
                   - prod.sum() / len(prod) / 1e6) < 1e-9
    # constant positive level: c3 = level^3 exactly
    pl = pd.DataFrame({
        "event_id": np.arange(100, dtype=np.int64),
        "user_id": np.full(100, 1, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(100) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.full(100, 7.0)})
    out = c3_nonlinearity(ray.data.from_pandas(pl), lag=1,
                          num_partitions=2)
    assert abs(out["c3"].iloc[0] - 343.0) < 1e-9


def test_energy_chunks_bruteforce_and_ramp(ray_session):
    from cesium_ray.stages.tsmath import energy_chunks

    ev = _valued(seed=373, n=2000, nusers=12)
    got = energy_chunks(ray.data.from_pandas(ev).repartition(6),
                        n_chunks=8, num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        tot = int((x * x).sum())
        ch = np.arange(n) * 8 // n
        sub = got[got["user_id"] == uid]
        for c in range(8):
            m = ch == c
            row = sub[sub["chunk"] == c]
            if not m.any() or tot == 0:
                assert len(row) == 0
                continue
            assert len(row) == 1
            e = int((x[m] * x[m]).sum())
            assert row["n_c"].iloc[0] == int(m.sum())
            assert row["e_sum"].iloc[0] == e
            assert abs(row["share"].iloc[0] - e / tot) < 1e-12
    # ramp: energy concentrates in the last chunk
    n = 800
    ramp = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 4, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n) * 0.1})
    out = energy_chunks(ray.data.from_pandas(ramp), n_chunks=8,
                        num_partitions=2)
    sh = out.sort_values("chunk")["share"].to_numpy()
    assert sh[-1] > 0.3 and sh[0] < 0.01
    assert (np.diff(sh) > 0).all()


def test_binned_entropy_bruteforce_and_levels(ray_session):
    from cesium_ray.stages.tsmath import binned_entropy

    ev = _valued(seed=379, n=2000, nusers=12)
    got = binned_entropy(ray.data.from_pandas(ev).repartition(6),
                         n_bins=10, num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        mn, mx = x.min(), x.max()
        b = (x - mn) * 10 // (mx - mn + 1)
        c = np.bincount(b, minlength=10)
        c = c[c > 0]
        h = np.log(n) - (c * np.log(c)).sum() / n
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert row["bins_used"].iloc[0] == len(c)
        assert abs(row["entropy"].iloc[0] - h) < 1e-9
    # constant stream: single bin, zero entropy; uniform: ~ln(10)
    rng = np.random.default_rng(31)
    pl = pd.DataFrame({
        "user_id": np.r_[np.full(500, 1, dtype=np.int64),
                         np.full(5000, 2, dtype=np.int64)],
        "value": np.r_[np.full(500, 3.14),
                       np.round(rng.uniform(0, 100, 5000), 2)]})
    out = binned_entropy(ray.data.from_pandas(pl), n_bins=10,
                         num_partitions=2)
    r1 = out[out["user_id"] == 1].iloc[0]
    r2 = out[out["user_id"] == 2].iloc[0]
    assert r1["bins_used"] == 1 and abs(r1["entropy"]) < 1e-12
    assert abs(r2["entropy"] - np.log(10)) < 0.02


def test_psd_profile_bruteforce_and_tone(ray_session):
    from cesium_ray.stages.tsmath import psd_profile

    ev = _events(seed=383, n=3000, nusers=12)
    got = psd_profile(ray.data.from_pandas(ev).repartition(6),
                      n_freqs=8, num_partitions=4)
    hb = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 3_600_000_000
    for uid, g in pd.DataFrame({"u": ev["user_id"], "hb": hb}) \
            .groupby("u"):
        mn, mx = g["hb"].min(), g["hb"].max()
        n = int(mx - mn + 1)
        sub = got[got["user_id"] == uid]
        if n < 17:
            assert len(sub) == 0
            continue
        c = np.bincount(g["hb"] - mn, minlength=n).astype(float)
        mu = c.sum() / n
        t = np.arange(n)
        pw = []
        for j in range(1, 9):
            ang = 2 * np.pi * ((t * j) % n) / n
            cj = (c * np.cos(ang)).sum() - mu * np.cos(ang).sum()
            sj = (c * np.sin(ang)).sum() - mu * np.sin(ang).sum()
            pw.append(cj * cj + sj * sj)
        pw = np.array(pw)
        if pw.min() <= 0:
            assert len(sub) == 0
            continue
        assert len(sub) == 8
        for j in range(1, 9):
            row = sub[sub["j"] == j]
            assert abs(row["power"].iloc[0] - pw[j - 1]) \
                < 1e-6 * max(pw[j - 1], 1)
            assert abs(row["share"].iloc[0]
                       - pw[j - 1] / pw.sum()) < 1e-9
    # planted tone at Fourier bin 4 of a 64-hour grid dominates
    hours = []
    for t_ in range(64):
        reps = 2 + int(10 * (1 + np.cos(2 * np.pi * 4 * t_ / 64)))
        hours += [t_] * reps
    pl = pd.DataFrame({
        "user_id": np.full(len(hours), 9, dtype=np.int64),
        "ts": pd.to_datetime(np.array(hours) * 3_600_000_000
                             + np.arange(len(hours)), unit="us"
                             ).astype("datetime64[us]")})
    out = psd_profile(ray.data.from_pandas(pl), n_freqs=8,
                      num_partitions=2)
    assert out[out["j"] == 4]["share"].iloc[0] > 0.9


def test_extreme_locations_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import extreme_locations

    ev = _valued(seed=389, n=2200, nusers=15)
    got = extreme_locations(ray.data.from_pandas(ev).repartition(6),
                            num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        idx_max = np.flatnonzero(x == x.max())
        idx_min = np.flatnonzero(x == x.min())
        assert row["first_max"].iloc[0] == idx_max[0]
        assert row["last_max"].iloc[0] == idx_max[-1]
        assert row["first_min"].iloc[0] == idx_min[0]
        assert row["last_min"].iloc[0] == idx_min[-1]
        assert abs(row["first_max_rel"].iloc[0]
                   - idx_max[0] / len(x)) < 1e-12
        assert abs(row["last_min_rel"].iloc[0]
                   - idx_min[-1] / len(x)) < 1e-12


def test_weibull_gaps_bruteforce_and_shape(ray_session):
    from cesium_ray.stages.tsmath import weibull_gaps

    ev = _events(seed=397, n=2600, nusers=14)
    got = weibull_gaps(ray.data.from_pandas(ev).repartition(6),
                       num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        t = np.sort(g["ts"].astype("datetime64[us]")
                    .astype(np.int64).to_numpy())
        d = (t[1:] - t[:-1]) // 1_000_000
        row = got[got["user_id"] == uid]
        if len(d) < 2:
            assert len(row) == 0
            continue
        mu = d.sum() / len(d)
        var = (d * d).sum() / len(d) - mu * mu
        if var <= 0 or mu <= 0:
            assert len(row) == 0
            continue
        assert len(row) == 1
        cv = np.sqrt(var) / mu
        assert row["n_gaps"].iloc[0] == len(d)
        assert abs(row["mean_gap_s"].iloc[0] - mu) < 1e-9 * max(mu, 1)
        assert abs(row["gap_cv"].iloc[0] - cv) < 1e-12
        assert abs(row["weibull_k"].iloc[0]
                   - np.exp(-1.086 * np.log(cv))) < 1e-12
    # planted shapes: exponential gaps -> k ~ 1; Weibull k=0.6 bursty
    # stream -> k < 0.75; near-regular jittered metronome -> k >> 1
    rng = np.random.default_rng(401)
    frames = []
    for uid, gaps in [
            (1, rng.exponential(3600.0, 4000)),
            (2, 3600.0 * rng.weibull(0.6, 4000)),
            (3, 3600.0 + rng.uniform(-60, 60, 4000))]:
        t = np.cumsum(np.maximum(gaps, 1.0)).astype(np.int64)
        frames.append(pd.DataFrame({
            "user_id": np.full(len(t), uid, dtype=np.int64),
            "ts": pd.to_datetime(t * 10**6, unit="us"
                                 ).astype("datetime64[us]")}))
    out = weibull_gaps(
        ray.data.from_pandas(pd.concat(frames, ignore_index=True)),
        num_partitions=2)
    k1 = out[out["user_id"] == 1]["weibull_k"].iloc[0]
    k2 = out[out["user_id"] == 2]["weibull_k"].iloc[0]
    k3 = out[out["user_id"] == 3]["weibull_k"].iloc[0]
    assert abs(k1 - 1.0) < 0.08
    assert k2 < 0.75
    assert k3 > 5.0


def test_complexity_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import complexity_profile

    ev = _valued(seed=409, n=2400, nusers=16)
    got = complexity_profile(ray.data.from_pandas(ev)
                             .repartition(6), num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        row = got[got["user_id"] == uid]
        if len(x) < 3:
            assert len(row) == 0
            continue
        d = np.diff(x)
        assert len(row) == 1
        assert row["sum_abs_change"].iloc[0] == np.abs(d).sum()
        assert row["ce_sq"].iloc[0] == (d * d).sum()
        assert abs(row["cid"].iloc[0]
                   - np.sqrt(float((d * d).sum()))) < 1e-6
        assert abs(row["mean_abs_change"].iloc[0]
                   - np.abs(d).sum() / (len(x) - 1)) < 1e-9
        msd = (x[-1] - x[-2] - x[1] + x[0]) / (2.0 * (len(x) - 2))
        assert abs(row["msd"].iloc[0] - msd) < 1e-9
    # a straight line has zero second derivative and constant steps
    n = 100
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n) * 0.05})
    out = complexity_profile(ray.data.from_pandas(pl),
                             num_partitions=2)
    assert out["msd"].iloc[0] == 0.0
    assert out["sum_abs_change"].iloc[0] == 5 * (n - 1)


def test_strike_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import strike_profile

    ev = _valued(seed=419, n=2400, nusers=16)
    got = strike_profile(ray.data.from_pandas(ev).repartition(6),
                         num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")

    def longest_run(mask):
        best = cur = 0
        for b in mask:
            cur = cur + 1 if b else 0
            best = max(best, cur)
        return best

    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n, S = len(x), x.sum()
        above = x * n > S
        below = x * n < S
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert row["n_above"].iloc[0] == above.sum()
        assert row["longest_above"].iloc[0] == longest_run(above)
        assert row["longest_below"].iloc[0] == longest_run(below)
        assert row["n_cross"].iloc[0] == \
            int((above[1:] != above[:-1]).sum())
    # alternating square wave: strikes of 1, crossings everywhere
    n = 80
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 3, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.where(np.arange(n) % 2 == 0, 1.0, -1.0)})
    out = strike_profile(ray.data.from_pandas(pl),
                         num_partitions=2)
    assert out["longest_above"].iloc[0] == 1
    assert out["longest_below"].iloc[0] == 1
    assert out["n_cross"].iloc[0] == n - 1


def test_index_mass_quantile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import index_mass_quantile

    ev = _valued(seed=421, n=2400, nusers=16)
    got = index_mass_quantile(ray.data.from_pandas(ev)
                              .repartition(6), num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    for uid, g in s.groupby("user_id"):
        a = np.abs(np.rint(g["value"].to_numpy() * 100)
                   .astype(np.int64))
        tot = a.sum()
        row = got[got["user_id"] == uid]
        if tot == 0:
            assert len(row) == 0
            continue
        assert len(row) == 1
        cs = np.cumsum(a)
        for q, col in [(25, "idx_25"), (50, "idx_50"),
                       (75, "idx_75")]:
            i = int(np.argmax(100 * cs >= q * tot)) + 1
            assert row[col].iloc[0] == i
            assert abs(row["rel_" + col[4:]].iloc[0]
                       - i / len(a)) < 1e-12
    # front-loaded burst: one huge first value -> all indices = 1
    n = 50
    v = np.r_[1000.0, np.full(n - 1, 0.01)]
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 5, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": v})
    out = index_mass_quantile(ray.data.from_pandas(pl),
                              num_partitions=2)
    assert (out[["idx_25", "idx_50", "idx_75"]].iloc[0] == 1).all()


def test_ratio_beyond_sigma_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import ratio_beyond_sigma

    ev = _valued(seed=433, n=2400, nusers=16)
    got = ratio_beyond_sigma(ray.data.from_pandas(ev)
                             .repartition(6), num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        mu, sd = x.mean(), x.std()  # population sigma
        c1 = int((np.abs(x - mu) > sd).sum())
        c2 = int((np.abs(x - mu) > 2 * sd).sum())
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert row["n"].iloc[0] == n
        assert row["n_beyond_1s"].iloc[0] == c1
        assert row["n_beyond_2s"].iloc[0] == c2
        assert abs(row["ratio_1s"].iloc[0] - c1 / n) < 1e-12
        assert abs(row["ratio_2s"].iloc[0] - c2 / n) < 1e-12
    # constant series: sigma = 0, nothing is beyond it
    n = 40
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 7, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.full(n, 3.5)})
    out = ratio_beyond_sigma(ray.data.from_pandas(pl),
                             num_partitions=2)
    assert out["n_beyond_1s"].iloc[0] == 0
    assert out["ratio_2s"].iloc[0] == 0.0


def test_reoccurrence_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import reoccurrence_profile

    ev = _valued(seed=434, n=2400, nusers=16)
    # force heavy reoccurrence: quantize values to integers
    ev["value"] = np.round(ev["value"])
    got = reoccurrence_profile(ray.data.from_pandas(ev)
                               .repartition(6), num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        k = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        vals, cnts = np.unique(k, return_counts=True)
        re = cnts > 1
        n = len(k)
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert row["n"].iloc[0] == n
        assert row["n_distinct"].iloc[0] == len(vals)
        assert row["n_reocc_vals"].iloc[0] == int(re.sum())
        assert row["sum_reocc_vals"].iloc[0] == int(vals[re].sum())
        assert row["sum_reocc_points"].iloc[0] == \
            int((vals[re] * cnts[re]).sum())
        assert abs(row["pct_reocc_points"].iloc[0]
                   - cnts[re].sum() / n) < 1e-12
        assert abs(row["distinct_ratio"].iloc[0]
                   - len(vals) / n) < 1e-12
    # all-unique series: zero reoccurrence, distinct_ratio = 1
    n = 30
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 9, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n, dtype=np.float64)})
    out = reoccurrence_profile(ray.data.from_pandas(pl),
                               num_partitions=2)
    assert out["n_reocc_vals"].iloc[0] == 0
    assert out["sum_reocc_points"].iloc[0] == 0
    assert out["distinct_ratio"].iloc[0] == 1.0


def test_abs_max_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import abs_max_profile

    ev = _valued(seed=435, n=2400, nusers=16)
    got = abs_max_profile(ray.data.from_pandas(ev)
                          .repartition(6), top_n=5,
                          num_partitions=4)
    for uid, g in ev.groupby("user_id"):
        a = np.abs(np.rint(g["value"].to_numpy() * 100)
                   .astype(np.int64))
        top = np.sort(a)[::-1][:5]
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        assert row["top_abs_sum"].iloc[0] == int(top.sum())
        assert abs(row["mean_abs_max"].iloc[0]
                   - top.sum() / (100.0 * min(len(a), 5))) < 1e-12
    # short series (n < top_n): mean over all n points
    pl = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "user_id": np.full(3, 2, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(3) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.array([-4.0, 1.0, 2.5])})
    out = abs_max_profile(ray.data.from_pandas(pl), top_n=5,
                          num_partitions=2)
    assert out["top_abs_sum"].iloc[0] == 750
    assert abs(out["mean_abs_max"].iloc[0] - 2.5) < 1e-12


def test_number_peaks_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import number_peaks

    ev = _valued(seed=437, n=2400, nusers=16)
    got = number_peaks(ray.data.from_pandas(ev).repartition(6),
                       max_support=3)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        nn = len(x)
        row = got[got["user_id"] == uid]
        assert len(row) == 1
        for sp in (1, 2, 3):
            cnt = 0
            for i in range(sp, nn - sp):
                if all(x[i] > x[i - j] and x[i] > x[i + j]
                       for j in range(1, sp + 1)):
                    cnt += 1
            assert row[f"n_peaks_{sp}"].iloc[0] == cnt
    # strict sawtooth: every interior odd point is a 1-peak, none
    # survive support 2 (equal-height neighbours at distance 2)
    n = 41
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 4, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.where(np.arange(n) % 2 == 1, 2.0, 1.0)})
    out = number_peaks(ray.data.from_pandas(pl))
    assert out["n_peaks_1"].iloc[0] == 20
    assert out["n_peaks_2"].iloc[0] == 0


def test_chunk_trend_profile_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import chunk_trend_profile

    ev = _valued(seed=438, n=2400, nusers=12)
    C = 16
    got = chunk_trend_profile(ray.data.from_pandas(ev)
                              .repartition(6), chunk_len=C,
                              num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    st = C * (C - 1) // 2
    den = C * (C - 1) * C * (2 * C - 1) // 6 - st * st
    for uid, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        nch = len(x) // C
        row = got[got["user_id"] == uid]
        if nch == 0:
            assert len(row) == 0
            continue
        t = np.arange(C, dtype=np.int64)
        nums = [C * int((t * x[i*C:(i+1)*C]).sum())
                - st * int(x[i*C:(i+1)*C].sum())
                for i in range(nch)]
        assert row["n_chunks"].iloc[0] == nch
        assert row["n_pos_slope"].iloc[0] == sum(v > 0 for v in nums)
        assert abs(row["slope_min"].iloc[0]
                   - min(nums) / (den * 100.0)) < 1e-9
        assert abs(row["slope_max"].iloc[0]
                   - max(nums) / (den * 100.0)) < 1e-9
    # pure ramp: every chunk slope = the ramp step
    n = 64
    pl = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.full(n, 8, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.arange(n, dtype=np.float64) * 0.5})
    out = chunk_trend_profile(ray.data.from_pandas(pl),
                              chunk_len=16, num_partitions=2)
    assert out["n_chunks"].iloc[0] == 4
    assert out["n_pos_slope"].iloc[0] == 4
    assert abs(out["slope_min"].iloc[0] - 0.5) < 1e-9
    assert abs(out["slope_max"].iloc[0] - 0.5) < 1e-9


def test_diebold_mariano_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import diebold_mariano

    ev = _valued(seed=440, n=2400, nusers=16)
    got = diebold_mariano(ray.data.from_pandas(ev).repartition(6),
                          num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    Ds = []
    for _, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        for t in range(2, len(x)):
            e1 = int(x[t] - x[t - 1])
            e2 = int(2 * x[t] - x[t - 1] - x[t - 2])
            Ds.append(4 * e1 * e1 - e2 * e2)
    n = len(Ds)
    S = sum(Ds)
    Q = sum(d * d for d in Ds)
    dbar = S / n
    g0 = Q / n - dbar * dbar
    z = dbar / np.sqrt(g0 / n)
    assert int(got["n_pairs"].iloc[0]) == n
    assert int(got["sum_d"].iloc[0]) == S
    assert np.isclose(got["dm_stat"].iloc[0], z)
    # iid noise: smoothing beats naive -> mean D > 0, z positive
    assert got["dm_stat"].iloc[0] > 3.0
    # AR-free ramp: naive is better (lag-2 forecaster lags the
    # trend twice as far) -> negative differential
    n2 = 400
    pl = pd.DataFrame({
        "event_id": np.arange(n2, dtype=np.int64),
        "user_id": np.full(n2, 5, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n2) * 10**6, unit="us"
                             ).astype("datetime64[us]"),
        "value": np.round(np.arange(n2, dtype=np.float64) * 0.2
                          + np.random.default_rng(7)
                          .normal(0, 0.05, n2), 2)})
    out = diebold_mariano(ray.data.from_pandas(pl),
                          num_partitions=2)
    assert out["sum_d"].iloc[0] < 0


def test_kmv_jaccard_bruteforce(ray_session):
    from cesium_ray.stages.sketch import kmv_jaccard

    rng = np.random.default_rng(441)
    ua = rng.choice(2000, 700, replace=False)
    ub = np.concatenate([ua[:350],
                         2000 + rng.choice(1000, 300,
                                           replace=False)])
    ev = pd.DataFrame({
        "event_type": ["click"] * len(ua) + ["view"] * len(ub),
        "user_id": np.concatenate([ua, ub]).astype(np.int64)})
    # duplicate some rows: set semantics must hold
    ev = pd.concat([ev, ev.iloc[::3]], ignore_index=True)
    got = kmv_jaccard(ray.data.from_pandas(ev).repartition(5),
                      k=256)
    inter = len(np.intersect1d(ua, ub))
    union = len(np.union1d(ua, ub))
    exact = inter / union
    assert np.isclose(got["jaccard_exact"].iloc[0], exact)
    assert int(got["n_a"].iloc[0]) == len(ua)
    assert int(got["n_b"].iloc[0]) == len(np.unique(ub))
    # sketch estimate within ±0.15 of truth at k=256
    assert abs(got["jaccard_kmv"].iloc[0] - exact) < 0.15
    # serial replay of the k-min-wise estimator
    h = lambda u: (u.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)
    ha, hb = np.unique(h(ua)), np.unique(h(np.unique(ub)))
    hu = np.union1d(ha, hb)
    kk = min(256, len(hu))
    both = np.intersect1d(hu[:kk], np.intersect1d(ha, hb))
    assert np.isclose(got["jaccard_kmv"].iloc[0], len(both) / kk)


def test_rrf_fuse_bruteforce(ray_session):
    from cesium_ray.stages.ann import rrf_fuse

    rng = np.random.default_rng(442)
    n, d = 300, 16
    X = rng.normal(0, 1, (n, d))
    emb = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float64) for row in X]})
    Q = X[:2].astype(np.float64)
    got = rrf_fuse(ray.data.from_pandas(emb).repartition(4),
                   Q, np.array([0, 1], np.int64),
                   k_retrieve=50, top=10, c=60)
    # serial replay
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Xn @ Qn.T
    score = {}
    ranks = {}
    for qi in range(2):
        order = np.lexsort((np.arange(n), -sims[:, qi]))[:50]
        for r, vid in enumerate(order, 1):
            score[vid] = score.get(vid, 0.0)
            ranks.setdefault(vid, [0, 0])[qi] = r
    for vid, (r0, r1) in ranks.items():
        score[vid] = (1.0 / (60.0 + r0) if r0 else 0.0) \
            + (1.0 / (60.0 + r1) if r1 else 0.0)
    want = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["vec_id"]) == [v for v, _ in want]
    for (vid, sc), (_, row) in zip(want, got.iterrows()):
        assert np.isclose(row["rrf_score"], sc)
    # each query's own vector leads its list: rank_0 of vec 0 is 1
    r0 = got[got["vec_id"] == 0]
    if len(r0):
        assert r0["rank_0"].iloc[0] == 1


def test_hbos_anomalies_bruteforce(ray_session):
    from cesium_ray.stages.analytics import hbos_anomalies

    ev = _valued(seed=443, n=3000, nusers=20)
    # plant one extreme-value, odd-hour outlier
    ev.loc[0, "value"] = 49.99
    ev.loc[0, "ts"] = pd.Timestamp("2024-01-01 03:00:01")
    got = hbos_anomalies(ray.data.from_pandas(ev)
                         .repartition(6), top=20)
    assert len(got) == 20
    # serial replay of the exact integer ordering
    k = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    vb = np.minimum(np.maximum(k + 5000, 0) // 500, 20)
    tus = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    hr = (tus // 3_600_000_000) % 24
    import collections
    cv = collections.Counter(vb)
    ch = collections.Counter(hr)
    prod = np.array([cv[v] * ch[h] for v, h in zip(vb, hr)],
                    np.int64)
    order = np.lexsort((ev["event_id"].to_numpy(), prod))[:20]
    assert list(got["event_id"]) == \
        list(ev["event_id"].to_numpy()[order])
    nf = float(len(ev))
    want0 = (np.log(nf) - np.log(float(cv[vb[order[0]]]))) \
        + (np.log(nf) - np.log(float(ch[hr[order[0]]])))
    assert np.isclose(got["hbos_score"].iloc[0], want0)
    # scores are non-increasing down the list
    assert (np.diff(got["hbos_score"].to_numpy()) <= 1e-12).all()


def test_conformal_interval_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import conformal_interval

    ev = _valued(seed=444, n=3000, nusers=20)
    got = conformal_interval(ray.data.from_pandas(ev)
                             .repartition(6), alpha_pct=10,
                             num_partitions=4)
    s = ev.sort_values(["user_id", "ts", "event_id"],
                       kind="mergesort")
    cal, tst = [], []
    for _, g in s.groupby("user_id"):
        x = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        for p in range(1, len(x)):
            r = abs(int(x[p]) - int(x[p - 1]))
            (cal if p % 2 == 1 else tst).append(r)
    n_cal, n_tst = len(cal), len(tst)
    num = (n_cal + 1) * 90
    q_rank = min(num // 100 + (1 if num % 100 else 0), n_cal)
    qhat = sorted(cal)[q_rank - 1]
    covered = sum(r <= qhat for r in tst)
    assert int(got["n_calib"].iloc[0]) == n_cal
    assert int(got["n_test"].iloc[0]) == n_tst
    assert int(got["q_rank"].iloc[0]) == q_rank
    assert int(got["qhat_k"].iloc[0]) == qhat
    assert int(got["n_covered"].iloc[0]) == covered
    assert np.isclose(got["coverage"].iloc[0], covered / n_tst)
    # conformal validity: coverage near the 90% target on iid data
    assert 0.85 < got["coverage"].iloc[0] < 0.96


def test_multi_regression_bruteforce(ray_session):
    from cesium_ray.stages.tsmath import multi_regression

    rng = np.random.default_rng(445)
    n = 3000
    h = rng.integers(0, 24, n)
    d = rng.integers(0, 7, n)
    # planted plane: value = 2 + 0.3*h - 0.5*d + noise
    v = np.round(2 + 0.3 * h - 0.5 * d + rng.normal(0, 0.5, n), 2)
    t = (d.astype(np.int64) - 4) % 7 * 86_400_000_000 \
        + h.astype(np.int64) * 3_600_000_000 \
        + rng.integers(0, 3.6e9, n).astype(np.int64)
    ev = pd.DataFrame({
        "ts": pd.to_datetime(t, unit="us")
        .astype("datetime64[us]"), "value": v})
    got = multi_regression(ray.data.from_pandas(ev)
                           .repartition(5))
    # numpy lstsq reference on the same integer design
    y = np.rint(v * 100).astype(np.int64)
    # recompute h, d exactly as the stage does (epoch arithmetic)
    tus = ev["ts"].to_numpy("datetime64[us]").view(np.int64)
    hh = (tus // 3_600_000_000) % 24
    dd = (tus // 86_400_000_000 + 4) % 7
    X = np.c_[np.ones(n), hh, dd]
    beta, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert np.isclose(got["beta0"].iloc[0], beta[0] / 100,
                      atol=1e-6)
    assert np.isclose(got["beta_hour"].iloc[0], beta[1] / 100,
                      atol=1e-6)
    assert np.isclose(got["beta_dow"].iloc[0], beta[2] / 100,
                      atol=1e-6)
    # planted coefficients recovered
    assert 0.27 < got["beta_hour"].iloc[0] < 0.33
    assert -0.56 < got["beta_dow"].iloc[0] < -0.44
    assert got["r2"].iloc[0] > 0.9


def test_cohen_kappa_langid_bruteforce(ray_session):
    from cesium_ray.stages.text import cohen_kappa_langid

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "lang": ["en", "en", "de", "fr", "es", "it"],
        "text": ["the quick brown fox and the lazy dog",
                 "this is the best of all the things",
                 "der hund und die katze sind nicht hier",
                 "le chat et le chien sont dans la maison",
                 "el perro y el gato no las casas son",
                 "il cane e il gatto sono nella casa"]})
    got = cohen_kappa_langid(ray.data.from_pandas(docs)
                             .repartition(2))
    assert int(got["n_docs"].iloc[0]) == 6
    po = got["accuracy"].iloc[0]
    # brute-force kappa from the engine's own predictions
    from cesium_ray.stages.text import language_id
    import ray as _r
    pred = language_id(_r.data.from_pandas(docs)).to_pandas() \
        .sort_values("doc_id")["lang_pred"].to_numpy(object)
    truth = docs["lang"].to_numpy(object)
    n = len(truth)
    agree = int((pred == truth).sum())
    import collections
    r = collections.Counter(truth)
    c = collections.Counter(pred)
    pe = sum(r[k] * c[k] for k in set(r) | set(c)) / (n * n)
    kappa = (agree / n - pe) / (1 - pe)
    assert np.isclose(po, agree / n)
    assert np.isclose(got["kappa"].iloc[0], kappa)
    # clean stopword-rich samples classify well above chance
    assert got["kappa"].iloc[0] > 0.5
