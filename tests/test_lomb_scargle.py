"""Lomb-Scargle recovery tests (SURVEY.md §5.1 — semantics of
cesium/features/tests/test_lomb_scargle.py: recover injected frequency
on regular and irregular grids, amplitude/phase invariances)."""

import numpy as np
import pytest

from cesium_ray.oracle.lomb_scargle import lomb_scargle_model, period_fast
from cesium_ray.oracle.graphs import compute_features
from cesium_ray.synth import irregular_random, regular_periodic


def test_recover_frequency_regular():
    t, m, e = regular_periodic(freq=0.31, n=400, T=100)
    model = lomb_scargle_model(t, m, e)
    assert model["freq"][0] == pytest.approx(0.31, rel=1e-3)


def test_recover_frequency_irregular():
    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 100, 400))
    m = np.sin(2 * np.pi * 0.57 * t + 0.3) + 0.05 * rng.normal(size=400)
    e = np.full(400, 0.05)
    model = lomb_scargle_model(t, m, e)
    assert model["freq"][0] == pytest.approx(0.57, rel=1e-2)


def test_amplitude_recovery():
    t, m, e = regular_periodic(freq=0.2, n=500, T=100, amplitudes=(2.0,))
    model = lomb_scargle_model(t, m, e)
    assert model["amplitude"][0, 0] == pytest.approx(2.0, rel=5e-2)
    # higher harmonics ~ 0 for a pure sinusoid
    assert model["amplitude"][0, 1] < 0.1


def test_harmonic_amplitudes():
    t, m, e = regular_periodic(freq=0.2, n=500, T=100, amplitudes=(2.0, 0.8))
    model = lomb_scargle_model(t, m, e)
    assert model["amplitude"][0, 0] == pytest.approx(2.0, rel=0.1)
    assert model["amplitude"][0, 1] == pytest.approx(0.8, rel=0.2)


def test_period_fast():
    t, m, _ = regular_periodic(freq=0.25, n=400, T=100)
    assert period_fast(t, m) == pytest.approx(4.0, rel=1e-2)


def test_varrat_small_for_periodic():
    t, m, e = regular_periodic(freq=0.31, n=400, T=100)
    model = lomb_scargle_model(t, m, e)
    assert model["varrat"] < 0.05  # model explains nearly all variance


def test_signif_orders_noise_below_signal():
    t, m, e = regular_periodic(freq=0.31, n=300, T=100)
    sig = lomb_scargle_model(t, m, e)["signif"][0]
    tn, mn, en = irregular_random(seed=0, n=300, T=100)
    noise_sig = lomb_scargle_model(tn, mn, en)["signif"][0]
    assert sig > noise_sig


def test_degenerate_inputs_nan_not_raise():
    out = lomb_scargle_model(np.array([0.0]), np.array([1.0]), np.array([0.1]))
    assert np.isnan(out["freq"]).all()
    f = compute_features([0.0, 1.0], [1.0, 2.0], [0.1, 0.1],
                         features_to_use=["freq1_freq", "amplitude"])
    assert np.isnan(f["freq1_freq"])
    assert f["amplitude"] == 0.5


def test_feature_accessors():
    t, m, e = regular_periodic(freq=0.31, n=300, T=100)
    f = compute_features(
        t, m, e,
        features_to_use=["freq1_freq", "freq1_amplitude1", "freq_varrat",
                         "freq_frequency_ratio_21", "freq1_lambda", "linear_trend"],
    )
    assert f["freq1_freq"] == pytest.approx(0.31, rel=1e-3)
    assert f["freq1_amplitude1"] == pytest.approx(1.0, rel=0.05)
    assert f["freq1_lambda"] == 5.0
    assert abs(f["linear_trend"]) < 0.01


def test_subset_skips_expensive_nodes():
    """Requesting only cheap features must not trigger the LS fit
    (cesium graph-pruning semantics, test_graphs.py analogue)."""
    import cesium_ray.oracle.graphs as gr
    called = {"ls": False}
    orig = gr.FEATURE_GRAPH["_ls_model"]
    gr.FEATURE_GRAPH["_ls_model"] = (
        (lambda *a: called.__setitem__("ls", True) or orig[0](*a)),
        *orig[1:],
    )
    try:
        compute_features([0, 1, 2], [1.0, 2.0, 3.0], features_to_use=["median", "cads_avg"])
        assert not called["ls"]
    finally:
        gr.FEATURE_GRAPH["_ls_model"] = orig


def test_custom_functions_both_forms():
    f = compute_features(
        [0, 1, 2], [1.0, 2.0, 4.0],
        features_to_use=["my_range", "double_median"],
        custom_functions={
            "my_range": lambda t, m, e: float(np.ptp(m)),
            "double_median": ((lambda med: 2 * med), "median"),
        },
    )
    assert f["my_range"] == 3.0
    assert f["double_median"] == 4.0
