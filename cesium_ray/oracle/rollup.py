"""Rollup kernel — continuous-aggregate tiers (SURVEY.md §2.5 A16, §2.9 G4).

One vectorized pandas/NumPy implementation shared by the single-node
oracle AND the Ray engine's per-partition ``map_groups`` stage, so tier
points are bit-equal by construction (BASELINE.json exact-parity gate).

Semantics (spec of record, FIXTURES.md F5):
  bucket   = floor(ts, tier)  (epoch-µs integer floor — identical to
             DuckDB date_trunc / time_bucket for 1m/1h/1d)
  cnt      = # non-null values in bucket
  count_null = # null values (turn-0 latency rows)
  vsum/vmean/vmin/vmax over non-null values
  p50/p99  = np.quantile(values, [.5, .99], method='linear') — exact,
             never sketched.  Under salting, per-salt value arrays are
             merged before the quantile (SURVEY §7 hard-part (a)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def bucket_floor_us(ts_us: np.ndarray, tier_s: int) -> np.ndarray:
    """Floor epoch-µs int64 timestamps to the tier boundary."""
    step = np.int64(tier_s) * 1_000_000
    return (ts_us // step) * step


def rollup_pandas(
    df: pd.DataFrame,
    tier: str,
    keys=("conv_id", "channel"),
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """Exact rollup of a points frame.  ``ts`` must be datetime64;
    ``value`` float64 (nullable via NaN).  Returns one row per
    (*keys, bucket), sorted by (*keys, bucket)."""
    tier_s = TIER_SECONDS[tier]
    ts_us = df[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
    bucket = bucket_floor_us(ts_us, tier_s).astype("datetime64[us]")
    vals = df[value_col].to_numpy(dtype=np.float64)

    g = pd.DataFrame({k: df[k].to_numpy() for k in keys})
    g["bucket"] = bucket
    g["value"] = vals

    keycols = list(keys) + ["bucket"]
    # count/sum/mean/min/max via pandas C groupby kernels
    gb = g.groupby(keycols, sort=True, dropna=False)["value"]
    base = gb.agg(cnt="count", vsum="sum", vmean="mean", vmin="min", vmax="max")
    base["count_null"] = gb.size() - base["cnt"]
    # exact quantiles, fully vectorized: sort once by (keys, value) with
    # NaN last, then index the np.quantile 'linear' positions per group
    order = g.sort_values(keycols + ["value"], kind="mergesort", na_position="last")
    codes = order.groupby(keycols, sort=True, dropna=False).ngroup().to_numpy()
    vals_sorted = order["value"].to_numpy(dtype=np.float64)
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    cnt = base["cnt"].to_numpy(dtype=np.int64)  # aligned: both key-sorted

    def _vq(p):
        q = np.full(len(starts), np.nan)
        ok = cnt > 0
        pos = (cnt[ok] - 1) * p
        lo = starts[ok] + np.floor(pos).astype(np.int64)
        hi = starts[ok] + np.ceil(pos).astype(np.int64)
        frac = pos - np.floor(pos)
        a, b = vals_sorted[lo], vals_sorted[hi]
        # replicate np.quantile(method='linear') _lerp exactly (it
        # switches formula at t>=0.5 for FP symmetry)
        diff = b - a
        q[ok] = np.where(frac >= 0.5, b - diff * (1 - frac), a + diff * frac)
        return q

    out = base.reset_index()
    out["p50"] = _vq(0.5)
    out["p99"] = _vq(0.99)
    out["cnt"] = out["cnt"].astype("int64")
    out["count_null"] = out["count_null"].astype("int64")
    # empty-value groups: sums of all-NaN are 0.0 under pandas — force NaN
    allnull = out["cnt"] == 0
    out.loc[allnull, ["vsum", "vmean", "vmin", "vmax"]] = np.nan
    return out[keycols + ["cnt", "count_null", "vsum", "vmean", "vmin", "vmax", "p50", "p99"]]


def derive_channels_pandas(
    turns: pd.DataFrame,
    by: str = "conv_id",
    order=("turn_idx",),
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Turns → long-format series points (SURVEY §1.2):
    channels ``turn_latency`` (Δts seconds within conversation, NaN at
    turn 0) and ``text_len`` (utf8 length).  Vectorized over all
    conversations in the frame at once (no per-conv Python)."""
    df = turns.sort_values([by, *order], kind="mergesort").reset_index(drop=True)
    ts_us = df[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
    conv = df[by].to_numpy()
    new_conv = np.r_[True, conv[1:] != conv[:-1]]
    lat = np.empty(len(df), dtype=np.float64)
    lat[0] = np.nan
    lat[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
    lat[new_conv] = np.nan
    if "text_len" in df:
        tlen = df["text_len"].to_numpy(dtype=np.float64)
    elif "text" in df:
        tlen = df["text"].str.len().to_numpy(dtype=np.float64)
    else:
        tlen = None

    frames = [
        pd.DataFrame(
            {
                "conv_id": df[by],
                "channel": "turn_latency",
                "ts": df[ts_col],
                "value": lat,
                "turn_idx": df[order[0]] if order[0] in df else np.arange(len(df)),
            }
        )
    ]
    if tlen is not None:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": df[by],
                    "channel": "text_len",
                    "ts": df[ts_col],
                    "value": tlen,
                    "turn_idx": df[order[0]] if order[0] in df else np.arange(len(df)),
                }
            )
        )
    if "value" in df.columns:  # extra numeric channel (events adapter)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": df[by],
                    "channel": "value",
                    "ts": df[ts_col],
                    "value": df["value"].to_numpy(dtype=np.float64),
                    "turn_idx": df[order[0]] if order[0] in df else np.arange(len(df)),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    out["conv_id"] = out["conv_id"].astype(str)
    return out
