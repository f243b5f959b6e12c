"""Mergeable quantile sketch: fixed-bin histogram quantiles.

At 100 TB an exact global quantile needs the grouped values
co-located; this sketch needs ONE streaming pass and ships only
``n_bins`` int64 partial counts per batch — error is bounded by the
bin width, and the result is a deterministic function of the bin
counts, so (unlike t-digest/KLL) the SQL oracle reproduces it bit-for-
bit with the same binning arithmetic.

Semantics (both sides): non-null values clamp into
``bin = min(max(floor((v − lo)/w), 0), n_bins − 1)`` with
``w = (hi − lo)/n_bins``; the q-quantile is the LOWER EDGE of the bin
containing the ``ceil(q · total)``-th smallest value (1-based).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def histogram_quantile(
    ds: ray.data.Dataset,
    value: str = "value",
    lo: float = 0.0,
    hi: float = 200.0,
    n_bins: int = 4000,
    qs: tuple = (0.5, 0.99),
) -> pd.DataFrame:
    """One-row frame: ``total_cnt``, ``bin_width``, and one
    ``p<q>_edge`` column per requested quantile."""
    w = (hi - lo) / n_bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(np.floor((v - lo) / w).astype(np.int64), 0, n_bins - 1)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)  # sparse partials: nonzero bins only
        return pd.DataFrame({"bin": nz.astype(np.int64),
                             "cnt": counts[nz].astype(np.int64)})

    # per-batch sparse partials merge through ONE bin-keyed hash
    # exchange (group_apply — Ray's own groupby stalls on tens of
    # thousands of groups in 2.49), so the driver only ever reads the
    # ≤ n_bins merged rows, independent of batch count
    from .partition import group_apply

    merged = group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("bin", as_index=False)["cnt"].sum(),
        num_partitions=8, key="bin",
    ).to_pandas()
    agg = merged.set_index("bin")["cnt"]
    counts = agg.reindex(np.arange(n_bins), fill_value=0).to_numpy(np.int64)
    total = int(counts.sum())
    cum = np.cumsum(counts)
    out = {"total_cnt": np.array([total], dtype=np.int64),
           "bin_width": np.array([w], dtype=np.float64)}
    for q in qs:
        if total:
            r = max(int(np.ceil(q * total)), 1)
            b = int(np.searchsorted(cum, r, side="left"))
            edge = lo + b * w
        else:
            # empty input: SQL oracle's min(bin) subquery yields NULL —
            # emit NaN (pandas' NULL) so engine and oracle hash-match
            edge = np.nan
        out[f"p{int(round(q * 100))}_edge"] = np.array(
            [edge], dtype=np.float64)
    return pd.DataFrame(out)
