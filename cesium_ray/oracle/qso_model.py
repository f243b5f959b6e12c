"""QSO damped-random-walk fit P5 (SURVEY.md §2.7).

Semantics of cesium/features/qso_model.py::qso_fit, re-specified (spec
of record, reference absent): fit a damped-random-walk (OU process)
Gaussian model with covariance  S_ij = σ² · exp(−|t_i − t_j|/τ)  plus
per-point measurement variance e², using the O(n) exponential-kernel
recursion; grid-search (σ, τ) over a fixed log grid; report

  * ``qso_log_chi2_qsonu``        = log10(χ²_QSO / ν)   (ν = n − 1)
  * ``qso_log_chi2nuNULL_chi2nu`` = log10(χ²_null/ν ÷ χ²_QSO/ν)

where χ²_null is the white-noise (constant weighted mean) chi-square.
"""

from __future__ import annotations

import numpy as np


def _drw_chi2(t, y, yvar, sigma2, tau):
    """χ² of the DRW interpolation: for each point, the conditional
    one-step prediction from the previous point under the OU kernel.

    One-step Kalman-style recursion (exact for the exponential kernel):
      a_i = exp(−Δt_i/τ)
      pred_i = a_i · x_{i−1};   var_i = sigma2·(1 − a_i²) + yvar_i
      x_i (posterior state) updated by the standard scalar filter.
    """
    n = len(y)
    x = y[0]
    P = sigma2
    chi2 = 0.0
    for i in range(1, n):
        a = np.exp(-(t[i] - t[i - 1]) / tau)
        xp = a * x
        Pp = a * a * P + sigma2 * (1 - a * a)
        S = Pp + yvar[i]
        r = y[i] - xp
        chi2 += r * r / S
        K = Pp / S
        x = xp + K * r
        P = (1 - K) * Pp
    return chi2


def qso_fit(t, m, e):
    t = np.asarray(t, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    e = np.asarray(e, dtype=np.float64)
    nan = float("nan")
    out = {"qso_log_chi2_qsonu": nan, "qso_log_chi2nuNULL_chi2nu": nan}
    n = len(m)
    if n < 3:
        return out
    yvar = e**2
    w = 1.0 / np.maximum(yvar, 1e-12)
    mu = (w * m).sum() / w.sum()
    y = m - mu
    nu = n - 1
    chi2_null = float((w * y**2).sum())

    var_y = float(np.var(y))
    if var_y <= 0:
        return out
    T = t[-1] - t[0]
    if T <= 0:
        return out
    best = np.inf
    for ls in np.linspace(np.log10(var_y) - 1, np.log10(var_y) + 1, 5):
        for lt in np.linspace(np.log10(T) - 3, np.log10(T), 6):
            c = _drw_chi2(t, y, yvar, 10.0**ls, 10.0**lt)
            if c < best:
                best = c
    if best <= 0 or not np.isfinite(best):
        return out
    out["qso_log_chi2_qsonu"] = float(np.log10(best / nu))
    if chi2_null > 0:
        out["qso_log_chi2nuNULL_chi2nu"] = float(np.log10(chi2_null / best))
    return out
