"""Featureset imputation M4 (SURVEY.md §2.2).

Semantics of cesium/featurize.py::impute_featureset: values with
|x| > max_value and ±inf are clipped to NaN, then NaN is filled per
strategy:

  * ``constant``      — fill with ``value`` (default 0.0); stateless
                        map_batches, no shuffle.
  * ``mean``          — global per-column mean, computed with one small
                        Dataset.mean aggregate, broadcast into the fill
                        map_batches (no per-batch re-shipping).
  * ``median``        — exact global per-column median via sorted
                        column pull (features tables are one row per
                        series — small relative to the input; documented
                        as the only driver-materializing strategy).
  * ``most_frequent`` — per-column mode via groupby().count().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _clip(df: pd.DataFrame, cols, max_value: float) -> pd.DataFrame:
    for c in cols:
        v = df[c].to_numpy(dtype=np.float64, copy=True)
        v[~np.isfinite(v)] = np.nan
        v[np.abs(v) > max_value] = np.nan
        df[c] = v
    return df


def impute_featureset(
    fset: ray.data.Dataset,
    strategy: str = "constant",
    value: float = 0.0,
    max_value: float = 1e20,
    exclude=("conv_id", "channel", "series_id", "label"),
) -> ray.data.Dataset:
    cols = [c for c in fset.columns() if c not in exclude]

    if strategy == "constant":
        fills = {c: value for c in cols}
    elif strategy == "mean":
        clipped = fset.map_batches(
            lambda df: _clip(df, cols, max_value), batch_format="pandas"
        )
        means = clipped.mean(cols)  # small driver-side dict
        fills = {c: means[f"mean({c})"] for c in cols}
        fset = clipped
        return fset.map_batches(
            lambda df: df.fillna(fills), batch_format="pandas"
        )
    elif strategy == "median":
        clipped = fset.map_batches(
            lambda df: _clip(df, cols, max_value), batch_format="pandas"
        )
        pdf = clipped.select_columns(cols).to_pandas()
        fills = {c: float(np.nanmedian(pdf[c].to_numpy(dtype=np.float64))) for c in cols}
        fset = clipped
        return fset.map_batches(lambda df: df.fillna(fills), batch_format="pandas")
    elif strategy == "most_frequent":
        clipped = fset.map_batches(
            lambda df: _clip(df, cols, max_value), batch_format="pandas"
        )
        pdf = clipped.select_columns(cols).to_pandas()
        fills = {}
        for c in cols:
            m = pdf[c].mode(dropna=True)
            fills[c] = float(m.iloc[0]) if len(m) else value
        fset = clipped
        return fset.map_batches(lambda df: df.fillna(fills), batch_format="pandas")
    else:
        raise ValueError(f"unknown impute strategy: {strategy}")

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return _clip(df, cols, max_value).fillna(fills)

    return fset.map_batches(fill, batch_format="pandas")
