"""Closed-form known-answer tests for A1–A15 (SURVEY.md §5.1 —
semantics of cesium/features/tests/test_common_functions.py)."""

import numpy as np
import pytest

from cesium_ray.oracle import common_features as co


M5 = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
T5 = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
E5 = np.full(5, 0.5)


def test_minmax_median_mean():
    assert co.maximum(M5) == 10.0
    assert co.minimum(M5) == 1.0
    assert co.median(M5) == 3.0
    assert co.mean(M5) == 4.0


def test_amplitude():
    assert co.amplitude(M5) == 4.5


def test_percent_amplitude():
    # max(|10-3|, |1-3|)/|3|
    assert co.percent_amplitude(M5) == pytest.approx(7 / 3)


def test_mad():
    # |m - 3| = [2,1,0,1,7] → median 1
    assert co.median_absolute_deviation(M5) == 1.0


def test_weighted_average_constant_errors_is_mean():
    assert co.weighted_average(M5, E5) == pytest.approx(4.0)


def test_weighted_average_weights():
    m = np.array([0.0, 10.0])
    e = np.array([1.0, 2.0])  # weights 1, 1/4
    assert co.weighted_average(m, e) == pytest.approx(10 * 0.25 / 1.25)


def test_std_population():
    assert co.std(np.array([1.0, 3.0])) == 1.0  # ddof=0


def test_skew_symmetric_zero():
    assert co.skew(np.array([1.0, 2.0, 3.0])) == pytest.approx(0.0, abs=1e-12)


def test_skew_matches_moment_formula():
    rng = np.random.default_rng(3)
    x = rng.exponential(1, 1000)
    mu = x.mean()
    expected = np.mean((x - mu) ** 3) / np.mean((x - mu) ** 2) ** 1.5
    assert co.skew(x) == pytest.approx(expected)


def test_flux_percentile_ratio_uniform_ramp():
    # FIXTURES.md F4: on a uniform ramp percentiles are linear:
    # mid50 = (P75−P25)/(P95−P5) = 50/90
    m = np.linspace(0, 1, 10001)
    assert co.flux_percentile_ratio(m, 50) == pytest.approx(50 / 90, rel=1e-3)
    assert co.flux_percentile_ratio(m, 20) == pytest.approx(20 / 90, rel=1e-3)


def test_percent_difference_flux_percentile():
    m = np.linspace(0, 1, 10001)
    assert co.percent_difference_flux_percentile(m) == pytest.approx(0.9 / 0.5, rel=1e-3)


def test_max_slope():
    assert co.max_slope(T5, M5) == 6.0  # |10-4|/1


def test_percent_close_to_median():
    # range=9, window=0.9; |m-3|<0.9 → only m=3 → 1/5
    assert co.percent_close_to_median(M5) == pytest.approx(0.2)


def test_percent_beyond_1_std():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 100_000)
    e = np.full_like(x, 0.1)
    # Gaussian: P(|x-mean|>std) ≈ 0.3173
    assert co.percent_beyond_1_std(x, e) == pytest.approx(0.3173, abs=0.01)


def test_stetson_k_gaussian():
    # FIXTURES.md F4: K ≈ sqrt(2/π) ≈ 0.798 on a large Gaussian sample
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 200_000)
    e = np.full_like(x, 1.0)
    assert co.stetson_k(x, e) == pytest.approx(0.7979, abs=0.005)


def test_stetson_j_uncorrelated_near_zero():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 200_000)
    e = np.full_like(x, 1.0)
    assert abs(co.stetson_j(x, e)) < 0.02


def test_stetson_j_correlated_positive():
    # a smooth sinusoid has strongly correlated neighbors → J > 0
    t = np.linspace(0, 10, 1000)
    m = np.sin(t)
    e = np.full_like(m, 1.0)
    assert co.stetson_j(m, e) > 0.1
