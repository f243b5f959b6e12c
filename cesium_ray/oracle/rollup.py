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

    # Pure-NumPy group kernel: factorize keys → one lexsort by
    # (keys, bucket, value-with-NaN-last) → reduceat aggregates +
    # positional exact quantiles.  No per-group Python, no pandas
    # groupby hashing of string keys in the hot path.
    keycols = list(keys) + ["bucket"]
    key_codes = []
    key_uniques = []
    for k in keys:
        c, u = pd.factorize(df[k].to_numpy(), sort=True)
        key_codes.append(c.astype(np.int64))
        key_uniques.append(u)
    bcodes, buniq = pd.factorize(bucket, sort=True)
    key_codes.append(bcodes.astype(np.int64))
    key_uniques.append(buniq)

    # lexsort: last key is primary → order (keys…, bucket, value)
    order = np.lexsort((vals,) + tuple(reversed(key_codes)))
    sc = [c[order] for c in key_codes]
    sv = vals[order]
    starts, stats = _grouped_stats(sv, sc)

    out = {}
    for k, c, u in zip(keycols, sc, key_uniques):
        out[k] = np.asarray(u)[c[starts]]
    out.update(stats)
    res = pd.DataFrame(out)
    res["bucket"] = res["bucket"].astype("datetime64[us]")
    return res[keycols + ["cnt", "count_null", "vsum", "vmean", "vmin", "vmax", "p50", "p99"]]


def _grouped_stats(sv: np.ndarray, group_key_arrays) -> tuple[np.ndarray, dict]:
    """Shared group-stats kernel: ``sv`` = values sorted by
    (*group_key_arrays, value-with-NaN-last); ``group_key_arrays`` =
    the key arrays in the SAME sorted order.  Returns (group start
    positions, stats dict).  Every rollup path (pandas wrapper AND the
    fused per-partition array path) runs through this one function —
    identical within-group value ordering → bit-identical sums and
    quantiles (exact-parity gate)."""
    n = len(sv)
    changed = np.zeros(n, dtype=bool)
    changed[0] = True
    for c in group_key_arrays:
        changed[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(changed)
    ends = np.r_[starts[1:], n]
    total = ends - starts

    isnan = np.isnan(sv)
    nn_cum = np.r_[0, np.cumsum(~isnan)]
    cnt = nn_cum[ends] - nn_cum[starts]
    count_null = total - cnt

    sv0 = np.where(isnan, 0.0, sv)
    vsum = np.add.reduceat(sv0, starts)  # per-group sums (no cumsum cancellation)
    with np.errstate(invalid="ignore", divide="ignore"):
        vmean = np.where(cnt > 0, vsum / cnt, np.nan)
    vsum = np.where(cnt > 0, vsum, np.nan)
    # values are ascending within each group with NaN last → min/max by position
    has = cnt > 0
    vmin = np.full(len(starts), np.nan)
    vmax = np.full(len(starts), np.nan)
    vmin[has] = sv[starts[has]]
    vmax[has] = sv[starts[has] + cnt[has] - 1]

    def _vq(p):
        q = np.full(len(starts), np.nan)
        pos = (cnt[has] - 1) * p
        lo = starts[has] + np.floor(pos).astype(np.int64)
        hi = starts[has] + np.ceil(pos).astype(np.int64)
        frac = pos - np.floor(pos)
        a, b = sv[lo], sv[hi]
        # replicate np.quantile(method='linear') _lerp exactly (it
        # switches formula at t>=0.5 for FP symmetry)
        diff = b - a
        q[has] = np.where(frac >= 0.5, b - diff * (1 - frac), a + diff * frac)
        return q

    stats = {
        "cnt": cnt.astype(np.int64),
        "count_null": count_null.astype(np.int64),
        "vsum": vsum,
        "vmean": vmean,
        "vmin": vmin,
        "vmax": vmax,
        "p50": _vq(0.5),
        "p99": _vq(0.99),
    }
    return starts, stats


def reaggregate_pandas(
    rollup: pd.DataFrame,
    tier: str,
    keys=("conv_id", "channel"),
) -> pd.DataFrame:
    """Continuous-aggregate cascade (SURVEY §2.9 G4): re-aggregate a
    finer tier into a coarser one WITHOUT touching raw data.  Only the
    re-aggregable stats survive — cnt/count_null/vsum/vmin/vmax summed
    or min/maxed, vmean = vsum/cnt; exact p50/p99 are NOT re-aggregable
    and are intentionally absent (recompute from raw when quantiles are
    needed — the flagship default)."""
    tier_s = TIER_SECONDS[tier]
    b_us = rollup["bucket"].to_numpy("datetime64[us]").astype("int64")
    df = rollup.copy()
    df["bucket"] = bucket_floor_us(b_us, tier_s).astype("datetime64[us]")
    keycols = list(keys) + ["bucket"]
    g = df.groupby(keycols, sort=True, dropna=False)
    out = g.agg(
        cnt=("cnt", "sum"),
        count_null=("count_null", "sum"),
        vsum=("vsum", "sum"),
        vmin=("vmin", "min"),
        vmax=("vmax", "max"),
    ).reset_index()
    with np.errstate(invalid="ignore", divide="ignore"):
        out["vmean"] = np.where(out["cnt"] > 0, out["vsum"] / out["cnt"], np.nan)
    out.loc[out["cnt"] == 0, ["vsum", "vmin", "vmax"]] = np.nan
    return out[keycols + ["cnt", "count_null", "vsum", "vmean", "vmin", "vmax"]]


def derive_channel_arrays(
    turns: pd.DataFrame,
    by: str = "conv_id",
    order=("turn_idx",),
    ts_col: str = "ts",
):
    """Array-level channel derivation (fused hot path): factorize the
    conversation key ONCE, integer lexsort, derive latency/text_len as
    bare arrays.  Returns (codes, uniques, ts_us, turn_idx, channels)
    with rows sorted by (conv, *order)."""
    codes, uniques = pd.factorize(turns[by].to_numpy(), sort=False)
    sort_keys = [turns[c].to_numpy() for c in reversed(order)] + [codes]
    pos = np.lexsort(tuple(sort_keys))
    sc = codes[pos]
    ts_us = turns[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")[pos]
    new_conv = np.r_[True, sc[1:] != sc[:-1]]
    lat = np.empty(len(sc), dtype=np.float64)
    lat[0] = np.nan
    lat[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
    lat[new_conv] = np.nan
    channels = {"turn_latency": lat}
    if "text_len" in turns:
        channels["text_len"] = turns["text_len"].to_numpy(dtype=np.float64)[pos]
    elif "text" in turns:
        channels["text_len"] = turns["text"].str.len().to_numpy(dtype=np.float64)[pos]
    if "value" in turns.columns:
        channels["value"] = turns["value"].to_numpy(dtype=np.float64)[pos]
    tidx = (
        turns[order[0]].to_numpy()[pos]
        if order[0] in turns.columns
        else np.arange(len(sc))
    )
    return sc, uniques, ts_us, tidx, channels


def rollup_arrays(
    conv_codes: np.ndarray,
    conv_uniques,
    ts_us: np.ndarray,
    channels: dict,
    tier: str,
    key_name: str = "conv_id",
) -> pd.DataFrame:
    """Fused rollup over derived channel arrays — one row per
    (conv, channel, bucket), stats bit-identical to
    ``rollup_pandas(derive_channels_pandas(...), tier)`` (same
    ``_grouped_stats`` kernel, same within-group value ordering);
    only row order differs."""
    bucket = bucket_floor_us(ts_us, TIER_SECONDS[tier])
    frames = []
    uniq = np.asarray(conv_uniques)
    for name, vals in channels.items():
        order = np.lexsort((vals, bucket, conv_codes))
        sc = conv_codes[order]
        sb = bucket[order]
        starts, stats = _grouped_stats(vals[order], (sc, sb))
        out = {
            key_name: uniq[sc[starts]],
            "channel": name,
            "bucket": sb[starts].astype("datetime64[us]"),
        }
        out.update(stats)
        frames.append(pd.DataFrame(out))
    res = pd.concat(frames, ignore_index=True)
    return res[
        [key_name, "channel", "bucket", "cnt", "count_null", "vsum", "vmean",
         "vmin", "vmax", "p50", "p99"]
    ]


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
    # factorize the conversation key once, then integer lexsort — avoids
    # repeated object-string comparisons in the per-partition hot path
    codes, _ = pd.factorize(turns[by].to_numpy(), sort=False)
    sort_keys = [turns[c].to_numpy() for c in reversed(order)] + [codes]
    pos = np.lexsort(tuple(sort_keys))
    df = turns.iloc[pos].reset_index(drop=True)
    ts_us = df[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
    sc = codes[pos]
    new_conv = np.r_[True, sc[1:] != sc[:-1]]
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
