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
