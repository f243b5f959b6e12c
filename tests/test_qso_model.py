"""QSO damped-random-walk fit tests P5 (SURVEY.md §5.1 —
test_qso_model.py analogue: DRW-like series scores better under the
DRW model than white noise does)."""

import numpy as np
import pytest

from cesium_ray.oracle.qso_model import qso_fit
from cesium_ray.oracle.graphs import compute_features


def _drw_series(n=400, tau=10.0, sigma=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 200, n))
    x = np.empty(n)
    x[0] = rng.normal(0, sigma)
    for i in range(1, n):
        a = np.exp(-(t[i] - t[i - 1]) / tau)
        x[i] = a * x[i - 1] + rng.normal(0, sigma * np.sqrt(1 - a * a))
    e = np.full(n, 0.1)
    return t, x + rng.normal(0, 0.1, n), e


def test_drw_fits_drw_better_than_noise_does():
    t, m, e = _drw_series()
    drw = qso_fit(t, m, e)
    rng = np.random.default_rng(1)
    noise = rng.normal(0, m.std(), len(t))
    wn = qso_fit(t, noise, e)
    # correlated DRW data: big improvement of DRW model over null
    assert drw["qso_log_chi2nuNULL_chi2nu"] > wn["qso_log_chi2nuNULL_chi2nu"]
    assert np.isfinite(drw["qso_log_chi2_qsonu"])


def test_degenerate_inputs():
    out = qso_fit([0.0, 1.0], [1.0, 2.0], [0.1, 0.1])
    assert np.isnan(out["qso_log_chi2_qsonu"])
    out2 = qso_fit([0.0] * 5, [1.0] * 5, [0.1] * 5)  # zero variance / span
    assert np.isnan(out2["qso_log_chi2_qsonu"])


def test_graph_accessors():
    t, m, e = _drw_series(n=200)
    f = compute_features(t, m, e,
                         features_to_use=["qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu"])
    assert np.isfinite(f["qso_log_chi2_qsonu"])
    assert np.isfinite(f["qso_log_chi2nuNULL_chi2nu"])
