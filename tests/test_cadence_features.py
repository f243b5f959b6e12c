"""Cadence feature tests C1–C7 (SURVEY.md §5.1 — semantics of
cesium/features/tests/test_cadence_features.py)."""

import numpy as np
import pytest

from cesium_ray.oracle import cadence_features as cf


def test_basic_cadence_stats():
    t = np.array([0.0, 1.0, 3.0, 6.0])
    assert cf.n_epochs(t) == 4
    assert cf.total_time(t) == 6.0
    assert cf.avgt(t) == 2.5
    c = cf.cads(t)
    np.testing.assert_allclose(c, [1, 2, 3])
    assert cf.cads_avg(c) == 2.0
    assert cf.cads_med(c) == 2.0
    assert cf.cads_std(c) == pytest.approx(np.std([1, 2, 3]))


def test_cad_probs_constant_cadence_step_function():
    # FIXTURES.md F4: constant cadence of 25 → P(≤T) jumps 0→1 at T=25
    t = np.arange(0, 2500, 25.0)
    c = cf.cads(t)
    assert cf.cad_prob(c, 20) == 0.0
    assert cf.cad_prob(c, 30) == 1.0
    assert cf.cad_prob(c, 25) == 1.0  # inclusive


def test_cad_prob_fraction():
    c = np.array([1.0, 5.0, 50.0, 500.0])
    assert cf.cad_prob(c, 10) == 0.5


def test_err_stats():
    e = np.array([0.1, 0.2, 0.3])
    assert cf.avg_err(e) == pytest.approx(0.2)
    assert cf.med_err(e) == pytest.approx(0.2)
    assert cf.std_err(e) == pytest.approx(np.std(e))


def test_double_to_single_step():
    c = np.array([1.0, 2.0, 4.0])
    # (c[:-1]+c[1:])/c[1:] = [3/2, 6/4]
    np.testing.assert_allclose(cf.double_to_single_step(c), [1.5, 1.5])


def test_pairwise_hist_pair_count():
    # FIXTURES.md F4: pair count = N(N−1)/2 — density integrates to 1
    t = np.sort(np.random.default_rng(0).uniform(0, 100, 50))
    h, edges = cf.delta_t_hist(t)
    width = edges[1] - edges[0]
    assert h.sum() * width == pytest.approx(1.0)


def test_pairwise_hist_matches_bruteforce():
    t = np.sort(np.random.default_rng(1).uniform(0, 10, 40))
    h, edges = cf.delta_t_hist(t)
    brute = np.array([t[j] - t[i] for i in range(40) for j in range(i + 1, 40)])
    hb, _ = np.histogram(brute, bins=edges)
    width = edges[1] - edges[0]
    np.testing.assert_allclose(h, hb / (len(brute) * width))


def test_pairwise_cap_deterministic():
    t = np.sort(np.random.default_rng(2).uniform(0, 10, 5000))
    h1, e1 = cf.delta_t_hist(t)
    h2, e2 = cf.delta_t_hist(t)
    np.testing.assert_array_equal(h1, h2)
    # capped: uses the strided subset rule
    assert len(cf._strided(t)) <= cf.PAIRWISE_CAP


def test_find_sorted_peaks():
    h = np.array([0.0, 3.0, 1.0, 5.0, 2.0, 2.0])
    peaks = cf.find_sorted_peaks(h)
    assert peaks[0] == (3, 5.0)
    assert peaks[1] == (1, 3.0)


def test_nhist_peak_features_bimodal():
    # two cadence scales → at least 2 histogram peaks
    rng = np.random.default_rng(3)
    t = np.cumsum(np.where(rng.random(400) < 0.5, 1.0, 20.0))
    out = cf.nhist_peak_features(t)
    assert out["all_times_nhist_numpeaks"] >= 2
    assert np.isfinite(out["all_times_nhist_peak_val"])
    assert 0 < out["all_times_nhist_peak_1_to_2"] <= 1.0
