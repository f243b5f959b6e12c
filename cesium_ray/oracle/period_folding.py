"""Period-folding statistics P4 (SURVEY.md §2.7).

Semantics of cesium/features/period_folding.py, re-specified precisely
here (reference checkout absent, SURVEY §0): all features consume the
freq1 result of ``lomb_scargle_model`` plus the raw (t, m) series.

Definitions (spec of record):
  * fold(P): phase_i = (t_i − t_0) mod P / P ∈ [0,1); points sorted by
    (phase, t) — stable.
  * fold2P_slope_{10,90}percentile: 10th/90th percentile of
    dm/dphase between consecutive points of the 2P-fold.
  * p2p_scatter_2praw: median|Δm| on the 2P-fold / median|Δm| on the
    time-sorted series.
  * p2p_scatter_over_mad: median|Δm| (time order) / MAD(m).
  * p2p_scatter_pfold_over_mad: median|Δm| on the P-fold / MAD(m).
  * p2p_ssqr_diff_over_var: Σ(Δm)² (time order) / ((n−1)·var(m)).
  * scatter_res_raw: MAD(LS model residuals) / MAD(raw m).
  * medperc90_2p_p: p90(|resid from 10-bin phase-median model, 2P fold|)
    / p90(|same, P fold|).
  * freq_model_{max,min}_delta_mags: |max(model)₁ − max(model)₂| (resp.
    min) where the freq1 harmonic model is evaluated on the 2P fold and
    split into its two period halves — eclipse-depth-difference
    semantics.
  * freq_model_phi1_phi2: phase separation between the model minima of
    the two halves of the 2P fold.
"""

from __future__ import annotations

import numpy as np

from .lomb_scargle import lomb_scargle_model  # noqa: F401  (re-export convenience)


def _fold(t, m, period):
    phase = ((t - t[0]) % period) / period
    order = np.lexsort((t, phase))
    return phase[order], m[order]


def _med_abs_diff(x):
    d = np.abs(np.diff(x))
    return float(np.median(d)) if len(d) else float("nan")


def _mad(x):
    return float(np.median(np.abs(x - np.median(x))))


def _phase_bin_median_model(phase, m, nbins=10):
    idx = np.minimum((phase * nbins).astype(np.int64), nbins - 1)
    med = np.full(nbins, np.median(m))
    for b in range(nbins):
        sel = idx == b
        if sel.any():
            med[b] = np.median(m[sel])
    return med[idx]


def _eval_freq1_model(model_freq1, phase, period):
    """Evaluate the freq1 harmonic model on fold phases (t ≡ phase·period)."""
    tt = phase * period
    om = 2 * np.pi * model_freq1["freq"]
    h = np.arange(1, len(model_freq1["s"]) + 1)
    ph = np.outer(tt, h) * om
    return model_freq1["c"] + np.sin(ph) @ model_freq1["s"] + np.cos(ph) @ model_freq1["k"]


def period_folding_features(t, m, e, ls_model) -> dict:
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    nan = float("nan")
    keys = [
        "fold2P_slope_10percentile", "fold2P_slope_90percentile", "medperc90_2p_p",
        "p2p_scatter_2praw", "p2p_scatter_over_mad", "p2p_scatter_pfold_over_mad",
        "p2p_ssqr_diff_over_var", "scatter_res_raw",
        "freq_model_max_delta_mags", "freq_model_min_delta_mags", "freq_model_phi1_phi2",
    ]
    out = {k: nan for k in keys}
    f1 = ls_model["freq"][0] if ls_model else np.nan
    if not np.isfinite(f1) or f1 <= 0 or len(t) < 3:
        return out
    P = 1.0 / f1

    ph2, m2 = _fold(t, m, 2 * P)
    ph1, m1 = _fold(t, m, P)

    dphase = np.diff(ph2)
    dm = np.diff(m2)
    ok = dphase > 0
    if ok.any():
        slopes = dm[ok] / dphase[ok]
        out["fold2P_slope_10percentile"] = float(np.percentile(slopes, 10, method="linear"))
        out["fold2P_slope_90percentile"] = float(np.percentile(slopes, 90, method="linear"))

    mad = _mad(m)
    p2p_raw = _med_abs_diff(m)
    p2p_2p = _med_abs_diff(m2)
    p2p_1p = _med_abs_diff(m1)
    out["p2p_scatter_2praw"] = p2p_2p / p2p_raw if p2p_raw else nan
    out["p2p_scatter_over_mad"] = p2p_raw / mad if mad else nan
    out["p2p_scatter_pfold_over_mad"] = p2p_1p / mad if mad else nan
    var = float(np.var(m))
    n = len(m)
    out["p2p_ssqr_diff_over_var"] = (
        float(np.sum(np.diff(m) ** 2)) / ((n - 1) * var) if var > 0 and n > 1 else nan
    )

    resid = ls_model.get("resid")
    if resid is not None and mad:
        out["scatter_res_raw"] = _mad(resid) / mad

    r2 = m2 - _phase_bin_median_model(ph2, m2)
    r1 = m1 - _phase_bin_median_model(ph1, m1)
    p90_1 = float(np.percentile(np.abs(r1), 90, method="linear"))
    if p90_1 > 0:
        out["medperc90_2p_p"] = float(np.percentile(np.abs(r2), 90, method="linear")) / p90_1

    mf = ls_model.get("model_freq1")
    if mf is not None:
        grid = np.linspace(0, 1, 200, endpoint=False)
        half1 = _eval_freq1_model(mf, grid, P)          # first period of the 2P fold
        half2 = _eval_freq1_model(mf, grid + 1.0, P)    # second period
        out["freq_model_max_delta_mags"] = float(abs(half1.max() - half2.max()))
        out["freq_model_min_delta_mags"] = float(abs(half1.min() - half2.min()))
        phi1 = grid[int(np.argmin(half1))]
        phi2 = grid[int(np.argmin(half2))]
        d = abs(phi1 - phi2)
        out["freq_model_phi1_phi2"] = float(min(d, 1 - d))
    return out
