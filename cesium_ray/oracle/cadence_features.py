"""Cadence / sampling-statistics features C1–C7 (SURVEY.md §2.8).

Semantics follow cesium/features/cadence_features.py.  Inputs are the
time array ``t`` (sorted) and error array ``e``.

C7's all-pairs Δt histogram is O(N²) in series length — fine for light
curves, dangerous for long conversations.  Per SURVEY §2.8 ⚠ we cap it:
for n > PAIRWISE_CAP the series is deterministically strided down to
≤ PAIRWISE_CAP points (every k-th point, k = ceil(n / cap)).  The
oracle and the Ray engine share THIS function, so parity is preserved
by construction.
"""

from __future__ import annotations

import numpy as np

CAD_PROB_THRESHOLDS = [
    1, 10, 20, 30, 40, 50, 100, 500, 1000, 5000,
    10_000, 50_000, 100_000, 500_000, 1_000_000, 5_000_000, 10_000_000,
]

PAIRWISE_CAP = 1024
NHIST_BINS = 50
PEAK_PAIRS = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def n_epochs(t):  # cesium/features/cadence_features.py (C1)
    return float(len(t))


def total_time(t):
    return float(t[-1] - t[0]) if len(t) else float("nan")


def avgt(t):  # C2
    return float(np.mean(t)) if len(t) else float("nan")


def cads(t):
    return np.diff(np.asarray(t, dtype=np.float64))


def cads_avg(c):
    return float(np.mean(c)) if len(c) else float("nan")


def cads_med(c):
    return float(np.median(c)) if len(c) else float("nan")


def cads_std(c):
    return float(np.std(c)) if len(c) else float("nan")


def cad_prob(c, T, c_sorted=None):
    """Empirical P(next obs within T) = fraction of cadences ≤ T
    (SURVEY §2.8 C4 semantics of ::cad_prob).  With ``c_sorted``
    supplied, one binary search replaces a full-array comparison."""
    if len(c) == 0:
        return float("nan")
    if c_sorted is not None:
        return float(np.searchsorted(c_sorted, T, side="right") / len(c_sorted))
    return float(np.mean(c <= T))


def avg_err(e):  # C5
    return float(np.mean(e)) if len(e) else float("nan")


def med_err(e):
    return float(np.median(e)) if len(e) else float("nan")


def std_err(e):
    return float(np.std(e)) if len(e) else float("nan")


def double_to_single_step(c):
    """Ratios (cads[:-1] + cads[1:]) / cads[1:] — double-step over the
    later single step (SURVEY §2.8 C6; orientation fixed here as the
    single documented constant)."""
    if len(c) < 2:
        return np.array([], dtype=np.float64)
    single = c[1:]
    double = c[:-1] + c[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        r = double / single
    return r[np.isfinite(r)]


def _strided(t, cap=PAIRWISE_CAP):
    n = len(t)
    if n <= cap:
        return np.asarray(t, dtype=np.float64)
    k = int(np.ceil(n / cap))
    return np.asarray(t[::k], dtype=np.float64)


def delta_t_hist(t, nbins=NHIST_BINS, cap=PAIRWISE_CAP):
    """Normalized histogram of all pairwise Δt (N(N−1)/2 pairs), capped
    per the module docstring (semantics of ::delta_t_hist +
    ::normalize_hist).  Normalization: density (counts / (npairs·bin_width))."""
    ts = _strided(t, cap)
    n = len(ts)
    if n < 2:
        return np.array([]), np.array([])
    # chunked upper-triangle pairwise differences (no n×n allocation)
    diffs = []
    for i in range(0, n - 1, 256):
        block = ts[i : i + 256]
        d = ts[None, :] - block[:, None]  # (chunk, n)
        iu = np.arange(i, min(i + 256, n - 1))
        mask = np.arange(n)[None, :] > iu[: len(block), None]
        diffs.append(d[: len(iu)][mask[: len(iu)]])
    dts = np.concatenate(diffs)
    hist, edges = np.histogram(dts, bins=nbins)
    width = edges[1] - edges[0]
    if width == 0 or len(dts) == 0:
        return hist.astype(np.float64), edges
    return hist / (len(dts) * width), edges


def find_sorted_peaks(h):
    """Local maxima of h (strictly above both neighbors; array ends
    count with one neighbor), returned as [(bin_index, value)] sorted by
    value descending (semantics of cesium/features/cadence_features.py::
    find_sorted_peaks)."""
    n = len(h)
    peaks = []
    for i in range(n):
        left = h[i - 1] if i > 0 else -np.inf
        right = h[i + 1] if i < n - 1 else -np.inf
        if h[i] > left and h[i] > right:
            peaks.append((i, float(h[i])))
    peaks.sort(key=lambda p: (-p[1], p[0]))
    return peaks


def nhist_peak_features(t):
    """C7 feature dict: all_times_nhist_{numpeaks, peak_val,
    peak{1..4}_bin, peak_i_to_j}."""
    h, _ = delta_t_hist(t)
    out = {}
    if len(h) == 0:
        peaks = []
    else:
        peaks = find_sorted_peaks(h)
    out["all_times_nhist_numpeaks"] = float(len(peaks))
    out["all_times_nhist_peak_val"] = peaks[0][1] if peaks else float("nan")
    for k in range(1, 5):
        out[f"all_times_nhist_peak{k}_bin"] = (
            float(peaks[k - 1][0]) if len(peaks) >= k else float("nan")
        )
    for i, j in PEAK_PAIRS:
        key = f"all_times_nhist_peak_{i}_to_{j}"
        if len(peaks) >= j and peaks[i - 1][1] != 0:
            out[key] = peaks[j - 1][1] / peaks[i - 1][1]
        else:
            out[key] = float("nan")
    return out
