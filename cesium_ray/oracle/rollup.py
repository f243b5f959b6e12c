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
  p50/p99  = exact linear-interpolated quantiles (``duck_quantile``
             formula below — bit-identical to DuckDB quantile_cont,
             empirically verified; equal to np.quantile at p=0.5),
             never sketched.  Under salting, per-salt value arrays are
             merged before the quantile (SURVEY §7 hard-part (a)).

``value_scale``: when the input values are exact multiples of
1/scale (2-decimal event values → 100, integer-µs latencies → 1e6),
vsum/vmean are computed by EXACT int64 arithmetic on round(v·scale),
so they are bit-identical to any other exact implementation (e.g. a
DuckDB oracle using sum(CAST(round(value*scale) AS BIGINT))) —
independent of summation order.  Quantiles/min/max are unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def bucket_floor_us(ts_us: np.ndarray, tier_s: int) -> np.ndarray:
    """Floor epoch-µs int64 timestamps to the tier boundary."""
    step = np.int64(tier_s) * 1_000_000
    return (ts_us // step) * step


def duck_quantile(sorted_vals: np.ndarray, p: float) -> float:
    """Linear-interpolated quantile of an ASCENDING array, bit-exact to
    DuckDB ``quantile_cont`` (verified empirically vs duckdb 1.0.0:
    ``a*(1-frac) + b*frac`` at pos=(n-1)·p; plain ``a+(b-a)·frac`` and
    np.quantile's symmetric-switch lerp differ in the last ulp).
    At p=0.5 this equals np.median bitwise (scaling by powers of two
    commutes with rounding)."""
    n = len(sorted_vals)
    if n == 0:
        return np.nan
    pos = (n - 1) * p
    fl = np.floor(pos)
    lo, hi = int(fl), int(np.ceil(pos))
    frac = pos - fl
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def rollup_pandas(
    df: pd.DataFrame,
    tier: str,
    keys=("conv_id", "channel"),
    ts_col: str = "ts",
    value_col: str = "value",
    value_scale: float | None = None,
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
    starts, stats = _grouped_stats(sv, sc, value_scale=value_scale)

    out = {}
    for k, c, u in zip(keycols, sc, key_uniques):
        out[k] = np.asarray(u)[c[starts]]
    out.update(stats)
    res = pd.DataFrame(out)
    res["bucket"] = res["bucket"].astype("datetime64[us]")
    return res[keycols + ["cnt", "count_null", "vsum", "vmean", "vmin", "vmax", "p50", "p99"]]


def _grouped_stats(
    sv: np.ndarray, group_key_arrays, value_scale: float | None = None
) -> tuple[np.ndarray, dict]:
    """Shared group-stats kernel: ``sv`` = values sorted by
    (*group_key_arrays, value-with-NaN-last); ``group_key_arrays`` =
    the key arrays in the SAME sorted order.  Returns (group start
    positions, stats dict).  Every rollup path (pandas wrapper AND the
    fused per-partition array path) runs through this one function —
    identical within-group value ordering → bit-identical sums and
    quantiles (exact-parity gate).  ``value_scale`` → exact int64
    sums (see module docstring)."""
    n = len(sv)
    if n == 0:  # ADVICE: empty partition must not IndexError
        z = np.array([], dtype=np.int64)
        f = np.array([], dtype=np.float64)
        return z, {"cnt": z, "count_null": z, "vsum": f, "vmean": f,
                   "vmin": f, "vmax": f, "p50": f, "p99": f}
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
    if value_scale is not None:
        # exact path: round(v·scale) are integers by precondition →
        # int64 reduceat is exact regardless of order; the only float
        # ops (int→double, ÷scale, ÷cnt) match the SQL oracle's
        # CAST(sum(BIGINT) AS DOUBLE)/scale[/cnt] bit-for-bit
        k = np.round(sv0 * value_scale).astype(np.int64)
        vsum = np.add.reduceat(k, starts).astype(np.float64) / value_scale
    else:
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
        fl = np.floor(pos)
        lo = starts[has] + fl.astype(np.int64)
        hi = starts[has] + np.ceil(pos).astype(np.int64)
        frac = pos - fl
        a, b = sv[lo], sv[hi]
        # DuckDB quantile_cont's exact lerp (a·(1−f) + b·f) — see
        # duck_quantile; one shared formula engine/oracle/SQL so
        # round-to-6 comparisons can never flip on a last-ulp diff
        q[has] = a * (1 - frac) + b * frac
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
    value_scale: float | None = None,
) -> pd.DataFrame:
    """Continuous-aggregate cascade (SURVEY §2.9 G4): re-aggregate a
    finer tier into a coarser one WITHOUT touching raw data.  Only the
    re-aggregable stats survive — cnt/count_null/vsum/vmin/vmax summed
    or min/maxed, vmean = vsum/cnt; exact p50/p99 are NOT re-aggregable
    and are intentionally absent (recompute from raw when quantiles are
    needed — the flagship default).  With ``value_scale`` (and a finer
    tier built with the same scale) the cascade sums are exact int64
    arithmetic — bit-identical to a from-raw SQL oracle."""
    tier_s = TIER_SECONDS[tier]
    b_us = rollup["bucket"].to_numpy("datetime64[us]").astype("int64")
    df = rollup.copy()
    df["bucket"] = bucket_floor_us(b_us, tier_s).astype("datetime64[us]")
    keycols = list(keys) + ["bucket"]
    if value_scale is not None:
        # the finer tier's vsum is float(k)/scale with k exactly
        # recoverable → cascade in integers
        df["_ks"] = np.round(
            np.nan_to_num(df["vsum"].to_numpy(np.float64)) * value_scale
        ).astype(np.int64)
    g = df.groupby(keycols, sort=True, dropna=False)
    agg_spec = dict(
        cnt=("cnt", "sum"),
        count_null=("count_null", "sum"),
        vsum=("vsum", "sum"),
        vmin=("vmin", "min"),
        vmax=("vmax", "max"),
    )
    if value_scale is not None:
        agg_spec["_ks"] = ("_ks", "sum")
    out = g.agg(**agg_spec).reset_index()
    if value_scale is not None:
        out["vsum"] = out.pop("_ks").to_numpy(np.float64) / value_scale
    with np.errstate(invalid="ignore", divide="ignore"):
        out["vmean"] = np.where(out["cnt"] > 0, out["vsum"] / out["cnt"], np.nan)
    out.loc[out["cnt"] == 0, ["vsum", "vmin", "vmax"]] = np.nan
    return out[keycols + ["cnt", "count_null", "vsum", "vmean", "vmin", "vmax"]]


def _key_codes(col: pd.Series):
    """(codes, uniques) for a key column — Categorical codes when the
    column rode the exchange dictionary-encoded, factorize otherwise."""
    if isinstance(col.dtype, pd.CategoricalDtype):
        return col.cat.codes.to_numpy().astype(np.int64), col.cat.categories.to_numpy()
    return pd.factorize(col.to_numpy(), sort=False)


def _fused_sort(codes: np.ndarray, minor: np.ndarray) -> np.ndarray | None:
    """Stable argsort by (codes, minor) via ONE fused int64 key — one
    stable sort pass instead of lexsort's two.  Both arrays must be
    integer; returns None when the fused key could overflow int64
    (caller falls back to lexsort).  Order is IDENTICAL to
    ``np.lexsort((minor, codes))``: gid = codes·span + (minor−min) is
    strictly monotone in (codes, minor) lexicographic order, and
    numpy's stable mergesort preserves tie order exactly as lexsort
    does."""
    if not (np.issubdtype(minor.dtype, np.integer)
            and np.issubdtype(codes.dtype, np.integer)):
        return None
    if len(minor) == 0:
        return np.array([], dtype=np.int64)
    mmin = minor.min()
    span = int(minor.max()) - int(mmin) + 1
    ncode = int(codes.max()) + 1 if len(codes) else 1
    if ncode * span >= (1 << 62):
        return None
    # subtract BEFORE casting: a uint64 minor above 2^63 would wrap in
    # astype(int64); the difference is always < span < 2^62 so it fits
    gid = codes.astype(np.int64) * np.int64(span) + (
        minor - mmin).astype(np.int64)
    return np.argsort(gid, kind="stable")


def derive_channel_arrays(
    turns: pd.DataFrame,
    by: str = "conv_id",
    order=("turn_idx",),
    ts_col: str = "ts",
):
    """Array-level channel derivation (fused hot path): factorize the
    conversation key ONCE, integer lexsort, derive latency/text_len as
    bare arrays.  Returns (codes, uniques, ts_us, turn_idx, channels)
    with rows sorted by (conv, *order).  Categorical input (the
    dictionary-encoded exchange path) short-circuits factorize — codes
    come straight off the Categorical."""
    codes, uniques = _key_codes(turns[by])
    pos = None
    if len(order) == 1:
        pos = _fused_sort(codes, turns[order[0]].to_numpy())
    if pos is None:
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
    step = np.int64(TIER_SECONDS[tier]) * 1_000_000
    bucket = (ts_us // step) * step
    frames = []
    uniq = np.asarray(conv_uniques)
    # fused (conv, bucket) int64 group id: the per-channel sort drops
    # from a 3-key lexsort to (vals, gid) — one fewer full stable-sort
    # pass per channel per tier (9 passes saved on the default 3-tier
    # 3-channel flagship partition); ordering and therefore every stat
    # is bit-identical (gid is monotone in (conv, bucket) lex order)
    gid = None
    if len(bucket):
        rel = ts_us // step
        rmin = rel.min()
        span = int(rel.max()) - int(rmin) + 1
        ncode = int(conv_codes.max()) + 1
        if ncode * span < (1 << 62):
            gid = conv_codes * np.int64(span) + (rel - np.int64(rmin))
    for name, vals in channels.items():
        if gid is not None:
            order = np.lexsort((vals, gid))
            idx = order  # rows sorted by (conv, bucket, val)
            starts, stats = _grouped_stats(vals[order], (gid[order],))
        else:
            order = np.lexsort((vals, bucket, conv_codes))
            idx = order
            starts, stats = _grouped_stats(
                vals[order], (conv_codes[order], bucket[order]))
        first = idx[starts]
        out = {
            key_name: uniq[conv_codes[first]],
            "channel": name,
            "bucket": bucket[first].astype("datetime64[us]"),
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
    codes, _ = _key_codes(turns[by])
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
