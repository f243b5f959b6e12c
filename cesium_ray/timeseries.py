"""TimeSeries container — API parity with cesium/time_series.py.

A thin, single-node convenience wrapper (the distributed engine works
on tables, not TimeSeries objects): holds (t, m, e) with cesium's
defaulting/broadcast rules, multichannel support, ``channels()``
iterator, ``sort()``, and an ``.npz`` save/load round-trip
(cesium/time_series.py::TimeSeries.save / ::load semantics).
"""

from __future__ import annotations

import json

import numpy as np

from .sources.timeseries_io import DEFAULT_ERROR_VALUE, DEFAULT_MAX_TIME


class TimeSeries:
    def __init__(
        self,
        t=None,
        m=None,
        e=None,
        label=None,
        meta_features=None,
        name=None,
        channel_names=None,
    ):
        if m is None:
            raise ValueError("measurement values are required")
        if isinstance(m, (list, tuple)) and len(m) and not np.isscalar(m[0]):
            self.m = [np.asarray(c, dtype=np.float64) for c in m]
        elif isinstance(m, np.ndarray) and m.ndim == 2:
            # (n_channels, n) array input — channels along axis 0
            self.m = [np.asarray(c, dtype=np.float64) for c in m]
        else:
            self.m = [np.asarray(m, dtype=np.float64)]
        self.n_channels = len(self.m)

        def _per_channel(x, default_fn):
            if x is None:
                return [default_fn(c) for c in self.m]
            if isinstance(x, (list, tuple)) and len(x) and not np.isscalar(x[0]):
                return [np.asarray(c, dtype=np.float64) for c in x]
            arr = np.asarray(x, dtype=np.float64)
            if arr.ndim == 2:  # list-of-channels given as a 2-D array
                return [np.asarray(c, dtype=np.float64) for c in arr]
            # broadcast shared axis where it fits; default otherwise
            return [
                arr if len(arr) == len(c) else default_fn(c) for c in self.m
            ]

        self.t = _per_channel(t, lambda c: np.linspace(0.0, DEFAULT_MAX_TIME, len(c)))
        self.e = _per_channel(e, lambda c: np.full(len(c), DEFAULT_ERROR_VALUE))
        self.label = label
        self.meta_features = dict(meta_features or {})
        self.name = name
        self.channel_names = list(channel_names) if channel_names else [
            str(i) for i in range(self.n_channels)
        ]

    def channels(self):
        """Yield (t, m, e) per channel (cesium TimeSeries.channels)."""
        yield from zip(self.t, self.m, self.e)

    def sort(self):
        """Stable in-place sort of every channel by time (M2)."""
        for i in range(self.n_channels):
            order = np.argsort(self.t[i], kind="stable")
            self.t[i] = self.t[i][order]
            self.m[i] = self.m[i][order]
            self.e[i] = self.e[i][order]
        return self

    def save(self, path: str):
        arrays = {}
        for i in range(self.n_channels):
            arrays[f"t{i}"] = self.t[i]
            arrays[f"m{i}"] = self.m[i]
            arrays[f"e{i}"] = self.e[i]
        meta = json.dumps(
            {
                "label": self.label,
                "meta_features": self.meta_features,
                "name": self.name,
                "channel_names": self.channel_names,
                "n_channels": self.n_channels,
            }
        )
        np.savez(path, _meta=np.array(meta), **arrays)


def load(path: str) -> TimeSeries:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["_meta"]))
        n = meta["n_channels"]
        ts = TimeSeries(
            t=[z[f"t{i}"] for i in range(n)],
            m=[z[f"m{i}"] for i in range(n)],
            e=[z[f"e{i}"] for i in range(n)],
            label=meta["label"],
            meta_features=meta["meta_features"],
            name=meta["name"],
            channel_names=meta["channel_names"],
        )
    return ts
