"""cesium-compatible featurize API (SURVEY.md §3 E1/E2).

Distributed re-expression of cesium/featurize.py::featurize_time_series
and ::featurize_ts_files: each series is one row of a Ray Dataset
(arrays as Arrow lists); feature extraction runs as an actor-pool
``map_batches`` (one batch = many series; per-series kernel =
oracle/graphs.py::compute_features).  The result mirrors
::assemble_featureset — one row per (series, channel), flat float64
feature columns, label/meta-features carried alongside (M5).

Multichannel: ``values`` may be a list of per-channel arrays per
series (possibly ragged); shared ``times``/``errors`` broadcast across
channels (cesium/time_series.py::TimeSeries broadcast rules).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..oracle.graphs import ALL_FEATURES, compute_features
from ..sources.timeseries_io import normalize_series, parse_ts_data


def _as_channels(values):
    """Return list of per-channel 1-D arrays for one series."""
    if isinstance(values, np.ndarray):
        if values.ndim == 2:
            return [np.asarray(v, dtype=np.float64) for v in values]
        if values.ndim == 1 and values.dtype == object:  # ragged
            return [np.asarray(v, dtype=np.float64) for v in values]
        return [np.asarray(values, dtype=np.float64)]
    if isinstance(values, (list, tuple)) and len(values) and not np.isscalar(values[0]):
        return [np.asarray(v, dtype=np.float64) for v in values]
    return [np.asarray(values, dtype=np.float64)]


class _SeriesFeaturizer:
    def __init__(self, features_to_use=None, custom_functions=None, ls_kwargs=None,
                 raise_exceptions=False):
        self.features = list(features_to_use) if features_to_use else list(ALL_FEATURES)
        self.custom = custom_functions
        self.ls_kwargs = ls_kwargs
        self.raise_exceptions = raise_exceptions

    def featurize_one(self, name, t, channels, e, extra):
        rows = []
        for ci, m in enumerate(channels):
            tc = t if t is None or np.ndim(t) == 1 else t[ci]
            ec = e if e is None or np.ndim(e) <= 1 else e[ci]
            # broadcast rule (cesium/time_series.py::TimeSeries): shared
            # t/e apply to every channel; a ragged channel that the
            # shared axis can't cover falls back to the M1 defaults
            if tc is not None and len(tc) != len(m):
                tc = None
            if ec is not None and np.ndim(ec) == 1 and len(ec) != len(m):
                ec = None
            tt, mm, ee = normalize_series(tc, m, ec)
            vals = compute_features(
                tt, mm, ee,
                features_to_use=self.features,
                custom_functions=self.custom,
                raise_exceptions=self.raise_exceptions,
                ls_kwargs=self.ls_kwargs,
            )
            rows.append({"series_id": str(name), "channel": ci, **extra, **vals})
        return rows

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in batch.itertuples(index=False):
            d = row._asdict()
            extra = {
                k: d[k]
                for k in d
                if k not in ("series_id", "t", "m", "e") and d[k] is not None
            }
            out.extend(
                self.featurize_one(
                    d["series_id"], d.get("t"), _as_channels(d["m"]), d.get("e"), extra
                )
            )
        return pd.DataFrame(out)


def featurize_time_series(
    times=None,
    values=None,
    errors=None,
    features_to_use=None,
    labels=None,
    meta_features=None,
    names=None,
    custom_functions=None,
    ls_kwargs=None,
    concurrency: int | tuple | None = None,
    batch_size: int = 8,
) -> pd.DataFrame:
    """E1 — in-memory arrays → featureset DataFrame.

    Accepts a single series or lists of series, mirroring
    cesium/featurize.py::featurize_time_series argument shapes."""
    if values is None:
        raise ValueError("values is required")
    if isinstance(values, np.ndarray):
        single = values.ndim == 1
    else:  # ragged nested lists can't go through np.ndim
        single = bool(len(values)) and np.isscalar(values[0])
    if single:
        values = [values]
        times = [times] if times is not None else None
        errors = [errors] if errors is not None else None
        labels = [labels] if labels is not None else None
        meta_features = [meta_features] if meta_features is not None else None
    n = len(values)
    names = names if names is not None else [str(i) for i in range(n)]

    items = []
    for i in range(n):
        # store channels as list-of-lists so ragged multichannel rides
        # through Arrow as list<list<double>>
        chans = [
            [float(x) for x in ch]
            for ch in (
                values[i]
                if (isinstance(values[i], (list, tuple)) and len(values[i])
                    and not np.isscalar(values[i][0]))
                or (isinstance(values[i], np.ndarray) and values[i].ndim == 2)
                else [values[i]]
            )
        ]
        item = {
            "series_id": str(names[i]),
            "t": None if times is None or times[i] is None else np.asarray(times[i], np.float64),
            "m": chans,
            "e": None if errors is None or errors[i] is None else np.asarray(errors[i], np.float64),
        }
        if labels is not None and labels[i] is not None:
            item["label"] = labels[i]
        if meta_features is not None and meta_features[i] is not None:
            item.update({str(k): float(v) for k, v in dict(meta_features[i]).items()})
        items.append(item)

    ds = ray.data.from_items(items)
    kw = {"concurrency": concurrency if concurrency is not None else (1, 8)}
    out = ds.map_batches(
        _SeriesFeaturizer,
        batch_format="pandas",
        batch_size=batch_size,
        fn_constructor_kwargs={
            "features_to_use": features_to_use,
            "custom_functions": custom_functions,
            "ls_kwargs": ls_kwargs,
        },
        **kw,
    ).to_pandas()
    return out.sort_values(["series_id", "channel"], kind="mergesort").reset_index(drop=True)


def featurize_ts_files(
    ts_paths,
    features_to_use=None,
    header_df: pd.DataFrame | None = None,
    sep: str = ",",
    **kw,
) -> pd.DataFrame:
    """E2 — delimited series files on disk → featureset.  Labels/meta
    attached by broadcast lookup from ``header_df`` (J1: small side is
    a dict in the closure, no shuffle)."""
    meta_map = {}
    label_map = {}
    if header_df is not None:
        for r in header_df.itertuples(index=False):
            d = r._asdict()
            sid = str(d.pop("series_id"))
            label_map[sid] = d.pop("label", d.pop("target", None))
            meta_map[sid] = {k: v for k, v in d.items() if isinstance(v, (int, float))}

    times, vals, errs, names, labels, metas = [], [], [], [], [], []
    import os

    for p in ts_paths:
        arr = parse_ts_data(p, sep=sep)
        name = os.path.splitext(os.path.basename(p))[0]
        ncol = arr.shape[1] if arr.ndim == 2 else 1
        t = arr[:, 0] if ncol >= 2 else None
        m = arr[:, 1] if ncol >= 2 else arr[:, 0]
        e = arr[:, 2] if ncol >= 3 else None
        times.append(t)
        vals.append(m)
        errs.append(e)
        names.append(name)
        labels.append(label_map.get(name))
        metas.append(meta_map.get(name))
    return featurize_time_series(
        times=times, values=vals, errors=errs, names=names,
        labels=None if header_df is None else labels,
        meta_features=None if header_df is None else metas,
        features_to_use=features_to_use, **kw,
    )


def featurize_npz_files(paths, features_to_use=None, **kw):
    """E3 (SURVEY.md §3): persisted ``TimeSeries`` .npz archives →
    featureset — the cesium ``time_series.load → featurize_single_ts``
    workflow (cesium/time_series.py::load) on the distributed
    featurizer."""
    import os

    from ..timeseries import load

    times, vals, errs, names, labels, metas = [], [], [], [], [], []
    for p in paths:
        ts = load(p)
        single = ts.n_channels == 1
        times.append(ts.t[0] if single else ts.t)
        vals.append(ts.m[0] if single else ts.m)
        errs.append(ts.e[0] if single else ts.e)
        names.append(ts.name or os.path.splitext(os.path.basename(p))[0])
        labels.append(ts.label)
        metas.append(ts.meta_features or None)
    return featurize_time_series(
        times=times, values=vals, errors=errs, names=names,
        labels=labels if any(l is not None for l in labels) else None,
        meta_features=metas if any(metas) else None,
        features_to_use=features_to_use, **kw,
    )


def to_cesium_frame(fset: pd.DataFrame) -> pd.DataFrame:
    """Reshape the flat featureset into cesium's assemble_featureset
    layout: one row per series, MultiIndex columns (feature, channel),
    row index = series name (cesium/featurize.py::assemble_featureset).
    Non-feature columns (label, meta) are carried with channel ''."""
    meta_cols = [
        c for c in fset.columns
        if c not in ("series_id", "channel") and fset[c].dtype == object
        or c == "label"
    ]
    feat_cols = [c for c in fset.columns if c not in ("series_id", "channel", *meta_cols)]
    wide = fset.pivot(index="series_id", columns="channel", values=feat_cols)
    wide.columns = pd.MultiIndex.from_tuples(
        [(f, ch) for f, ch in wide.columns], names=["feature", "channel"]
    )
    if meta_cols:
        meta = fset.drop_duplicates("series_id").set_index("series_id")[meta_cols]
        for c in meta_cols:
            wide[(c, "")] = meta[c]
    wide.index.name = "name"
    return wide


def save_featureset(fset: pd.DataFrame, path: str):
    """S6 — parquet replaces cesium's joblib dump
    (cesium/featurize.py::save_featureset)."""
    fset.to_parquet(path, index=False)


def load_featureset(path: str) -> pd.DataFrame:
    return pd.read_parquet(path)
