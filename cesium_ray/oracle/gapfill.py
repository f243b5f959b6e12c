"""Gap-fill kernel G2 (SURVEY.md §2.9) — shared by oracle + Ray stage.

Semantics (spec of record, FIXTURES.md F5): per (conv_id, channel),
bucket the series to the tier grid (bucket mean of non-null values =
the observed grid value), build the dense grid from the first to the
last observed bucket, and fill missing buckets with

  * ``locf``   — last observation carried forward, or
  * ``linear`` — linear interpolation between the neighboring observed
                 buckets (epoch-µs x-axis, np.interp semantics).

Output rows carry ``fill_method`` ∈ {observed, locf, linear} provenance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .rollup import TIER_SECONDS, bucket_floor_us


def gapfill_group(
    ts_us: np.ndarray, values: np.ndarray, tier: str, method: str = "locf"
):
    """One (conv, channel) series → (grid_bucket_us, filled, fill_method).

    ``values`` may contain NaN (null latency) — NaN points contribute no
    observation.  Vectorized NumPy; no Python per-bucket loop."""
    step = np.int64(TIER_SECONDS[tier]) * 1_000_000
    ok = ~np.isnan(values)
    if not ok.any():
        return (np.array([], dtype=np.int64), np.array([]), np.array([], dtype=object))
    b = bucket_floor_us(ts_us[ok], TIER_SECONDS[tier])
    df = pd.DataFrame({"b": b, "v": values[ok]})
    obs = df.groupby("b", sort=True)["v"].mean()
    ob = obs.index.to_numpy(dtype=np.int64)
    ov = obs.to_numpy(dtype=np.float64)
    grid = np.arange(ob[0], ob[-1] + step, step, dtype=np.int64)
    idx = np.searchsorted(ob, grid)
    observed = (idx < len(ob)) & (ob[np.minimum(idx, len(ob) - 1)] == grid)
    if method == "locf":
        carry = np.searchsorted(ob, grid, side="right") - 1
        filled = ov[carry]
    elif method == "linear":
        filled = np.interp(grid.astype(np.float64), ob.astype(np.float64), ov)
    else:
        raise ValueError(f"unknown gap-fill method: {method}")
    fm = np.where(observed, "observed", method).astype(object)
    return grid, filled, fm


def gapfill_pandas(
    points: pd.DataFrame, tier: str, method: str = "locf",
    keys=("conv_id", "channel"),
    value_scale: float | None = None,
) -> pd.DataFrame:
    """Gap-fill a whole points frame — fully vectorized across ALL
    (conv, channel) groups at once (no per-group Python; the per-group
    reference ``gapfill_group`` is kept for tests and single-series
    use; outputs are bit-identical: same bucket means — identical
    summation order — and the same LOCF/interp math).

    Trick: composite integer keys ``group_code · K + bucket_index``
    (K > max grid length) make one global searchsorted / np.interp
    behave per-group, because every grid point lies inside its own
    group's observed key range."""
    step = np.int64(TIER_SECONDS[tier]) * 1_000_000
    vals = points["value"].to_numpy(dtype=np.float64)
    ok = ~np.isnan(vals)
    if not ok.any():
        return pd.DataFrame(columns=[*keys, "bucket", "value", "fill_method"])
    ts_us = points["ts"].to_numpy(dtype="datetime64[us]").astype("int64")[ok]
    vals = vals[ok]
    key_codes = []
    key_uniques = []
    for k in keys:
        c, u = pd.factorize(points[k].to_numpy()[ok], sort=True)
        key_codes.append(c.astype(np.int64))
        key_uniques.append(u)
    # single group code (lexicographic over key columns)
    gcode = key_codes[0]
    for c in key_codes[1:]:
        gcode = gcode * (c.max() + 1) + c
    _, gcode = np.unique(gcode, return_inverse=True)
    bucket = (ts_us // step) * step

    # stable sort by (group, bucket) keeps original row order within a
    # bucket → bucket-mean summation order identical to groupby().mean()
    order = np.lexsort((np.arange(len(gcode)), bucket, gcode))
    g_s = gcode[order]
    b_s = bucket[order]
    v_s = vals[order]
    # per-(group,bucket) means
    gb_change = np.r_[True, (g_s[1:] != g_s[:-1]) | (b_s[1:] != b_s[:-1])]
    starts = np.flatnonzero(gb_change)
    obs_cnt = np.diff(np.r_[starts, len(v_s)])
    if value_scale is not None:
        # exact bucket means for 1/scale-quantized values (int64 sums
        # — order-independent, bit-identical to the SQL oracle's
        # CAST(sum(round(v·scale)) AS DOUBLE)/scale/count)
        k_s = np.round(v_s * value_scale).astype(np.int64)
        ov = np.add.reduceat(k_s, starts).astype(np.float64) / value_scale / obs_cnt
    else:
        ov = np.add.reduceat(v_s, starts) / obs_cnt
    og = g_s[starts]
    ob = b_s[starts]

    # per-group observed span → dense grid
    g_change = np.r_[True, og[1:] != og[:-1]]
    gstart = np.flatnonzero(g_change)
    gend = np.r_[gstart[1:], len(og)]
    b0 = ob[gstart]
    b1 = ob[gend - 1]
    L = ((b1 - b0) // step + 1).astype(np.int64)
    total = int(L.sum())
    goff = np.repeat(np.cumsum(np.r_[0, L[:-1]]), L)
    pos_in_g = np.arange(total) - goff
    grid_g = np.repeat(np.arange(len(L)), L)  # dense group index
    grid_b = np.repeat(b0, L) + pos_in_g * step

    K = int(L.max()) + 1
    obs_gdense = np.repeat(np.arange(len(L)), gend - gstart)
    obs_key = obs_gdense * K + (ob - np.repeat(b0, gend - gstart)) // step
    grid_key = grid_g * K + pos_in_g
    carry = np.searchsorted(obs_key, grid_key, side="right") - 1
    observed = obs_key[carry] == grid_key
    if method == "locf":
        filled = ov[carry]
    elif method == "linear":
        filled = np.interp(grid_key.astype(np.float64), obs_key.astype(np.float64), ov)
    else:
        raise ValueError(f"unknown gap-fill method: {method}")
    fm = np.where(observed, "observed", method).astype(object)

    # map dense group index back to key values (group codes are sorted,
    # so dense order == sorted (key…) order)
    rep_codes = [c[order][starts][gstart] for c in key_codes]
    out = {}
    for k, c, u in zip(keys, rep_codes, key_uniques):
        out[k] = np.asarray(u)[np.repeat(c, L)]
    out["bucket"] = grid_b.astype("datetime64[us]")
    out["value"] = filled
    out["fill_method"] = fm
    return pd.DataFrame(out)[[*keys, "bucket", "value", "fill_method"]]
