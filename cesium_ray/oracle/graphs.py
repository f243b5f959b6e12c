"""Feature dependency graph + executor (SURVEY.md §2.2 M3, §2.3 T1).

Semantics of cesium/features/graphs.py::generate_dask_graph +
cesium/featurize.py::featurize_single_ts: a plain dict keyed by node
name, values ``(fn, dep1, dep2, …)``, leaves ``'t'``, ``'m'``, ``'e'``.
Shared intermediates (the fitted LS model, cadence array, Δt-histogram
peaks) are computed once per series; requesting a subset of features
computes only its dependency closure (no dask needed — a 20-line
memoized topological evaluator replaces the synchronous dask.get).

Custom features (SURVEY §2.3 T2): pass ``custom_functions`` — either
``{name: fn(t, m, e) -> float}`` or dask-style ``{name: (fn, *deps)}``
tuples merged into the graph, exactly cesium's two accepted forms.
"""

from __future__ import annotations

import numpy as np

from . import cadence_features as cf
from . import common_features as co
from .lomb_scargle import lomb_scargle_model, period_fast
from .period_folding import period_folding_features
from .qso_model import qso_fit


def _build_graph():
    g = {
        # shared intermediates --------------------------------------
        "_cads": (cf.cads, "t"),
        "_ls_model": (lomb_scargle_model, "t", "m", "e"),
        "_nhist": (cf.nhist_peak_features, "t"),
        "_fold": (period_folding_features, "t", "m", "e", "_ls_model"),
        "_qso": (qso_fit, "t", "m", "e"),
        "_d2s": (cf.double_to_single_step, "_cads"),
        # A1–A15 general features -----------------------------------
        "maximum": (co.maximum, "m"),
        "minimum": (co.minimum, "m"),
        "median": (co.median, "m"),
        "mean": (co.mean, "m"),
        "weighted_average": (co.weighted_average, "m", "e"),
        "std": (co.std, "m"),
        "skew": (co.skew, "m"),
        "amplitude": (co.amplitude, "m"),
        "percent_amplitude": (co.percent_amplitude, "m"),
        "median_absolute_deviation": (co.median_absolute_deviation, "m"),
        "percent_close_to_median": (co.percent_close_to_median, "m"),
        "percent_beyond_1_std": (co.percent_beyond_1_std, "m", "e"),
        "max_slope": (co.max_slope, "t", "m"),
        "stetson_j": (co.stetson_j, "m", "e"),
        "stetson_k": (co.stetson_k, "m", "e"),
        # cadence C1–C6 ---------------------------------------------
        "n_epochs": (cf.n_epochs, "t"),
        "total_time": (cf.total_time, "t"),
        "avgt": (cf.avgt, "t"),
        "cads_avg": (cf.cads_avg, "_cads"),
        "cads_med": (cf.cads_med, "_cads"),
        "cads_std": (cf.cads_std, "_cads"),
        "avg_err": (cf.avg_err, "e"),
        "med_err": (cf.med_err, "e"),
        "std_err": (cf.std_err, "e"),
        "avg_double_to_single_step": (cf.cads_avg, "_d2s"),
        "med_double_to_single_step": (cf.cads_med, "_d2s"),
        "std_double_to_single_step": (cf.cads_std, "_d2s"),
        # P3 --------------------------------------------------------
        "period_fast": (period_fast, "t", "m"),
    }
    g["_flux_pcts"] = (co.flux_percentiles, "m")
    g["percent_difference_flux_percentile"] = (
        (lambda m, p: co.percent_difference_flux_percentile(m, pcts=p)),
        "m", "_flux_pcts",
    )
    for k in (20, 35, 50, 65, 80):
        g[f"flux_percentile_ratio_mid{k}"] = (
            (lambda m, p, kk=k: co.flux_percentile_ratio(m, kk, pcts=p)),
            "m", "_flux_pcts",
        )
    g["_cads_sorted"] = (np.sort, "_cads")
    for T in cf.CAD_PROB_THRESHOLDS:
        g[f"cad_probs_{T}"] = (
            (lambda c, cs, TT=T: cf.cad_prob(c, TT, c_sorted=cs)),
            "_cads", "_cads_sorted",
        )
    # C7 histogram-peak features ------------------------------------
    nhist_keys = (
        ["all_times_nhist_numpeaks", "all_times_nhist_peak_val"]
        + [f"all_times_nhist_peak{k}_bin" for k in range(1, 5)]
        + [f"all_times_nhist_peak_{i}_to_{j}" for i, j in cf.PEAK_PAIRS]
    )
    for key in nhist_keys:
        g[key] = ((lambda d, kk=key: d[kk]), "_nhist")
    # P1/P2 Lomb-Scargle accessor features --------------------------
    for i in range(1, 4):
        g[f"freq{i}_freq"] = ((lambda d, ii=i: float(d["freq"][ii - 1])), "_ls_model")
        g[f"freq{i}_signif"] = ((lambda d, ii=i: float(d["signif"][ii - 1])), "_ls_model")
        for h in range(1, 5):
            g[f"freq{i}_amplitude{h}"] = (
                (lambda d, ii=i, hh=h: float(d["amplitude"][ii - 1, hh - 1])),
                "_ls_model",
            )
        for h in range(2, 5):
            g[f"freq{i}_rel_phase{h}"] = (
                (lambda d, ii=i, hh=h: float(d["rel_phase"][ii - 1, hh - 1])),
                "_ls_model",
            )
    g["freq1_lambda"] = ((lambda d: float(d["lambda"])), "_ls_model")
    g["freq_varrat"] = ((lambda d: float(d["varrat"])), "_ls_model")
    g["freq_y_offset"] = ((lambda d: float(d["y_offset"])), "_ls_model")
    g["linear_trend"] = ((lambda d: float(d["trend"])), "_ls_model")
    g["freq_n_alias"] = ((lambda d: float(d["n_alias"])), "_ls_model")

    def _ratio(a, b):
        return float(a / b) if b not in (0.0,) and np.isfinite(b) else float("nan")

    for i in (2, 3):
        g[f"freq_amplitude_ratio_{i}1"] = (
            (lambda d, ii=i: _ratio(d["amplitude"][ii - 1, 0], d["amplitude"][0, 0])),
            "_ls_model",
        )
        g[f"freq_frequency_ratio_{i}1"] = (
            (lambda d, ii=i: _ratio(d["freq"][ii - 1], d["freq"][0])),
            "_ls_model",
        )
        g[f"freq_signif_ratio_{i}1"] = (
            (lambda d, ii=i: _ratio(d["signif"][ii - 1], d["signif"][0])),
            "_ls_model",
        )
    # P4 folding ----------------------------------------------------
    for key in [
        "fold2P_slope_10percentile", "fold2P_slope_90percentile", "medperc90_2p_p",
        "p2p_scatter_2praw", "p2p_scatter_over_mad", "p2p_scatter_pfold_over_mad",
        "p2p_ssqr_diff_over_var", "scatter_res_raw",
        "freq_model_max_delta_mags", "freq_model_min_delta_mags", "freq_model_phi1_phi2",
    ]:
        g[key] = ((lambda d, kk=key: d[kk]), "_fold")
    # P5 QSO --------------------------------------------------------
    for key in ["qso_log_chi2_qsonu", "qso_log_chi2nuNULL_chi2nu"]:
        g[key] = ((lambda d, kk=key: d[kk]), "_qso")
    return g


FEATURE_GRAPH = _build_graph()

# Cheap features that avoid the expensive LS / O(N²) intermediates —
# the default set for large-scale transcript runs.
GENERAL_FEATURES = [
    k for k, v in FEATURE_GRAPH.items()
    if not k.startswith("_")
    and not any(d in ("_ls_model", "_fold", "_qso", "_nhist") for d in v[1:])
    and k != "period_fast"
]
LS_FEATURES = [
    k for k, v in FEATURE_GRAPH.items()
    if not k.startswith("_") and any(d in ("_ls_model", "_fold") for d in v[1:])
] + ["period_fast"]
ALL_FEATURES = [k for k in FEATURE_GRAPH if not k.startswith("_")]


def feature_names(include_slow: bool = True) -> list[str]:
    return list(ALL_FEATURES) if include_slow else list(GENERAL_FEATURES)


def compute_features(
    t,
    m,
    e=None,
    features_to_use=None,
    custom_functions=None,
    raise_exceptions: bool = False,
    ls_kwargs=None,
) -> dict:
    """Evaluate the requested features for one series (one channel).

    Mirrors cesium/featurize.py::featurize_single_ts: memoized
    evaluation of the dependency closure only; a failing feature yields
    NaN unless ``raise_exceptions`` (cesium's NaN-on-failure semantic).
    ``e`` defaults to the constant DEFAULT_ERROR_VALUE fill (§1.1).
    """
    from ..constants import DEFAULT_ERROR_VALUE

    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    if e is None:
        e = np.full(len(m), DEFAULT_ERROR_VALUE)
    e = np.asarray(e, dtype=np.float64)

    graph = FEATURE_GRAPH if not (ls_kwargs or custom_functions) else dict(FEATURE_GRAPH)
    if ls_kwargs:
        graph["_ls_model"] = (
            (lambda t_, m_, e_: lomb_scargle_model(t_, m_, e_, **ls_kwargs)),
            "t", "m", "e",
        )
    if custom_functions:
        for name, fn in custom_functions.items():
            if isinstance(fn, tuple):  # dask-style (fn, *deps)
                graph[name] = fn
            else:
                graph[name] = (fn, "t", "m", "e")
    names = list(features_to_use) if features_to_use is not None else list(ALL_FEATURES)

    memo = {"t": t, "m": m, "e": e}

    def ev(node):
        if node in memo:
            return memo[node]
        fn, *deps = graph[node]
        val = fn(*[ev(d) for d in deps])
        memo[node] = val
        return val

    out = {}
    for name in names:
        try:
            out[name] = float(ev(name))
        except Exception:
            if raise_exceptions:
                raise
            out[name] = float("nan")
    return out
