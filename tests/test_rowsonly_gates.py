"""Mutation tests for the rows-only queries' in-query gates (VERDICT
round-4 next-step #6): each gate must FAIL LOUDLY when the engine
output is perturbed, so rows-only ≠ unverified."""

import numpy as np
import pandas as pd
import pytest

from cesium_ray.pipelines.extra_queries import (
    _LS_PLANT_PERIOD_S,
    _LS_PLANT_USER,
    _assert_kmeans_parity,
    _assert_pca_parity,
    _assert_planted_ls,
    _planted_ls_points,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------- LS planted


def _ls_out(freq=1.0 / _LS_PLANT_PERIOD_S, amp=1.0):
    return pd.DataFrame({
        "user_id": [7, _LS_PLANT_USER],
        "freq1_freq": [0.01, freq],
        "freq1_amplitude1": [0.5, amp],
    })


def test_planted_ls_gate_passes_and_strips():
    out = _assert_planted_ls(_ls_out())
    assert _LS_PLANT_USER not in out["user_id"].to_numpy()
    assert len(out) == 1


def test_planted_ls_gate_trips_on_wrong_freq():
    with pytest.raises(AssertionError, match="frequency"):
        _assert_planted_ls(_ls_out(freq=1.05 / _LS_PLANT_PERIOD_S))


def test_planted_ls_gate_trips_on_wrong_amp():
    with pytest.raises(AssertionError, match="amplitude"):
        _assert_planted_ls(_ls_out(amp=0.5))


def test_planted_ls_gate_trips_on_missing_row():
    with pytest.raises(AssertionError, match="missing"):
        _assert_planted_ls(_ls_out().iloc[:1])


def test_planted_points_recover_frequency_serially():
    """The planted series itself, through the real extractor kernel,
    recovers the planted frequency — the gate's premise."""
    from cesium_ray.oracle.lomb_scargle import lomb_scargle_model

    t = _planted_ls_points()
    ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) / 1e6
    v = t["value"].to_numpy()
    r = lomb_scargle_model(ts, v, np.ones(len(v)), day=86400.0)
    f = float(r["freq"][0])
    assert abs(f - 1.0 / _LS_PLANT_PERIOD_S) <= 0.02 / _LS_PLANT_PERIOD_S


# ------------------------------------------------- kmeans/pca parity


def _toy_corpus(n=120, d=6, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    X[: n // 2] += 3.0  # two blobs
    ids = rng.permutation(n).astype(np.int64)
    return ids, X


def _serial_kmeans_out(ids, X, k, n_iter):
    """Build the exact expected output frame via the gate's own replay
    math (independent second implementation lives in stages/ann.py —
    test_ann covers engine-vs-dense parity; here we test the GATE)."""
    order = np.argsort(ids, kind="stable")[:k]
    C = X[order].astype(np.float64).copy()
    for rnd in range(n_iter + 1):
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        inert = d2[np.arange(len(X)), a] + (X * X).sum(axis=1)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        per = np.zeros(k)
        np.add.at(per, a, inert)
        if rnd < n_iter:
            nz = cnt > 0
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            C = C.copy()
            C[nz] = sums[nz] / cnt[nz, None]
    return pd.DataFrame({
        "cluster_id": np.arange(k, dtype=np.int64),
        "size": cnt,
        "inertia": per,
        "centroid_norm": np.sqrt((C * C).sum(axis=1)),
    })


def test_kmeans_parity_gate_passes_on_faithful_output():
    ids, X = _toy_corpus()
    out = _serial_kmeans_out(ids, X, k=4, n_iter=3)
    _assert_kmeans_parity(out, ids, X, k=4, n_iter=3)


@pytest.mark.parametrize("mutate", ["size", "centroid_norm", "inertia"])
def test_kmeans_parity_gate_trips_on_mutation(mutate):
    ids, X = _toy_corpus()
    out = _serial_kmeans_out(ids, X, k=4, n_iter=3)
    bad = out.copy()
    bad.loc[1, mutate] = bad.loc[1, mutate] + (1 if mutate == "size"
                                               else 1e-3)
    with pytest.raises(AssertionError):
        _assert_kmeans_parity(bad, ids, X, k=4, n_iter=3)


def _serial_pca_out(X, n_iter):
    n, d = X.shape
    sx = X.sum(axis=0)
    mu = sx / n
    total_var = (float((X * X).sum()) - n * float(mu @ mu)) / (n - 1)
    v = np.zeros(d)
    v[0] = 1.0
    lam = 0.0
    for _ in range(n_iter):
        p = X @ v
        w = (X.T @ p) - mu * float(p.sum()) - sx * float(mu @ v) \
            + n * mu * float(mu @ v)
        lam = float(v @ w) / (n - 1)
        v = w / np.linalg.norm(w)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return pd.DataFrame({
        "dim": np.arange(d, dtype=np.int64),
        "loading": v,
        "eigenvalue": np.full(d, lam),
        "explained_ratio": np.full(d, lam / total_var),
    })


def test_pca_parity_gate_passes_and_trips():
    _, X = _toy_corpus(seed=5)
    out = _serial_pca_out(X, n_iter=12)
    _assert_pca_parity(out, X, n_iter=12)
    bad = out.copy()
    bad["loading"] = bad["loading"] + 1e-4
    with pytest.raises(AssertionError, match="loadings"):
        _assert_pca_parity(bad, X, n_iter=12)
    bad2 = out.copy()
    bad2["explained_ratio"] = bad2["explained_ratio"] * 1.001
    with pytest.raises(AssertionError, match="ratio"):
        _assert_pca_parity(bad2, X, n_iter=12)


# -------------------------------------- end-to-end mutation (monkeypatch)


def test_q_kmeans_trips_on_perturbed_engine(ray_session, monkeypatch):
    """q_kmeans must raise when the distributed stage returns a
    perturbed result — the full-query mutation demonstration."""
    import cesium_ray.stages.ann as ann
    from cesium_ray.pipelines.extra_queries import q_kmeans

    real = ann.kmeans_distributed

    def perturbed(*a, **kw):
        out = real(*a, **kw)
        out = out.copy()
        out.loc[0, "size"] += 1
        out.loc[1, "size"] -= 1  # keep the total-size check green
        return out

    monkeypatch.setattr(ann, "kmeans_distributed", perturbed)
    with pytest.raises(AssertionError, match="kmeans parity"):
        q_kmeans(SF)


def test_q_knn_lsh_trips_on_perturbed_sims(ray_session, monkeypatch):
    """The existing _verify_ann_sims gate: perturbing one returned
    similarity must raise."""
    import cesium_ray.stages.ann as ann
    from cesium_ray.pipelines.extra_queries import q_knn_lsh

    real = ann.lsh_topk

    def perturbed(*a, **kw):
        out = real(*a, **kw)
        out = out.copy()
        out.loc[out.index[0], "sim"] += 1e-3
        return out

    monkeypatch.setattr(ann, "lsh_topk", perturbed)
    with pytest.raises(AssertionError):
        q_knn_lsh(SF)
