"""Raw-series I/O + defaulting (SURVEY.md §2.1 S1/S2, §2.2 M1).

Semantics of cesium/data_management.py::parse_ts_data /
::parse_headerfile and cesium/time_series.py::TimeSeries.__init__
defaulting: a series is defined by up to three columns (time,
measurement, error); missing time → uniform grid on
[0, DEFAULT_MAX_TIME]; missing error → constant DEFAULT_ERROR_VALUE.
Every feature is therefore defined even without timestamps/errors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..constants import DEFAULT_ERROR_VALUE, DEFAULT_MAX_TIME  # noqa: F401


def parse_ts_data(filepath: str, sep: str = ",") -> np.ndarray:
    """Load a delimited .dat/.csv series file, keeping the first ≤3
    numeric columns as (t, m, e) (cesium/data_management.py::parse_ts_data)."""
    arr = np.genfromtxt(filepath, delimiter=sep, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]  # single-column file → (n, 1)
    if arr.shape[1] > 3:
        arr = arr[:, :3]
    bad = np.isnan(arr).all(axis=1)
    return arr[~bad]


def normalize_series(t=None, m=None, e=None):
    """Apply cesium's defaulting/broadcast rules to one (t, m, e) triple
    (cesium/time_series.py::TimeSeries.__init__, SURVEY §2.2 M1):
    sorted time returned; t defaults to linspace(0, DEFAULT_MAX_TIME, n);
    e defaults to constant DEFAULT_ERROR_VALUE."""
    m = np.asarray(m, dtype=np.float64)
    n = len(m)
    if t is None:
        t = np.linspace(0.0, DEFAULT_MAX_TIME, n)
    else:
        t = np.asarray(t, dtype=np.float64)
    if e is None:
        e = np.full(n, DEFAULT_ERROR_VALUE)
    else:
        e = np.asarray(e, dtype=np.float64)
        if e.ndim == 0 or len(e) == 1:
            e = np.full(n, float(e))
    order = np.argsort(t, kind="stable")
    return t[order], m[order], e[order]


def parse_headerfile(path: str, files_to_include=None) -> pd.DataFrame:
    """Read a header CSV mapping series name → label + meta-features
    (cesium/data_management.py::parse_headerfile).  First column is the
    key (filename/series id), ``label``/``target`` column if present is
    the class label, remaining numeric columns are meta-features."""
    df = pd.read_csv(path)
    key = df.columns[0]
    df = df.rename(columns={key: "series_id"})
    df["series_id"] = df["series_id"].astype(str)
    if files_to_include is not None:
        keep = {str(f) for f in files_to_include}
        df = df[df["series_id"].isin(keep)].reset_index(drop=True)
    return df
