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
) -> pd.DataFrame:
    """Gap-fill a whole points frame (oracle path / per-partition stage
    body).  Returns GAPFILLED-schema frame sorted by (*keys, bucket)."""
    out_frames = []
    for kv, grp in points.groupby(list(keys), sort=True):
        ts_us = grp["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        grid, filled, fm = gapfill_group(
            ts_us, grp["value"].to_numpy(dtype=np.float64), tier, method
        )
        if len(grid) == 0:
            continue
        f = pd.DataFrame(
            {
                "bucket": grid.astype("datetime64[us]"),
                "value": filled,
                "fill_method": fm,
            }
        )
        for k, v in zip(keys, kv if isinstance(kv, tuple) else (kv,)):
            f.insert(0, k, v)
        out_frames.append(f)
    if not out_frames:
        return pd.DataFrame(
            columns=[*keys, "bucket", "value", "fill_method"]
        )
    return pd.concat(out_frames, ignore_index=True)[[*keys, "bucket", "value", "fill_method"]]
