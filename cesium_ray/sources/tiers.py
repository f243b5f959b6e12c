"""Pruned tier reader — the default way flagship tier output is
consumed (VERDICT r03 #6: wire state/zonemap pruning into the read
path instead of leaving it an opt-in utility).

Flagship tiers live at ``out_root/tier=<t>/date=<YYYY-MM-DD>/
part-<pid>.parquet`` (pipelines/flagship.py::_write_dated).  A
time-range read composes three prune levels, cheapest first:

1. **Directory prune** — ``date=`` is derivable from the path alone,
   so whole days drop without touching a footer.  At 100 TB this is
   the "scan the day, not the year" step and costs one listdir.
2. **Zonemap prune** — Parquet footers of the surviving files carry
   per-row-group min/max for the time column; files whose range
   misses the box drop without reading a data page
   (state/zonemap.py::file_zonemaps).  Within a day this skips
   partitions whose conversations never spoke in the window.
3. **Row filter** — an exact vectorized predicate inside
   ``map_batches`` guarantees correctness never depends on pruning
   (kept-but-irrelevant rows are dropped here; wrongly dropping a
   file is impossible because both prunes are conservative).

Returns ``(Dataset | None, report)`` where report counts
``days_total/days_read`` and ``files_total/files_read`` so callers
(bench.py ``tier_read`` entry) can assert the pruning actually bit.
"""

from __future__ import annotations

import datetime
import glob
import os

import numpy as np
import pandas as pd
import ray.data

from ..state.zonemap import file_zonemaps


def _to_us(t) -> int:
    """Timestamp-ish → int64 µs since epoch."""
    if isinstance(t, (int, np.integer)):
        return int(t)
    return int(pd.Timestamp(t).value) // 1000


def read_tier(
    out_root: str,
    tier: str,
    start=None,
    end=None,
    columns: list | None = None,
) -> tuple[ray.data.Dataset | None, dict]:
    """Read one rollup tier (``1m``/``1h``/``1d`` → time column
    ``bucket``; ``raw`` → ``ts``) with directory + zonemap pruning for
    the inclusive time window [start, end] and an exact row-level
    filter on top.  ``start``/``end`` accept anything
    ``pd.Timestamp`` accepts, or raw int64 µs; None leaves that side
    unbounded (None/None = full scan, still via the same code path).
    """
    time_col = "ts" if tier == "raw" else "bucket"
    lo = _to_us(start) if start is not None else None
    hi = _to_us(end) if end is not None else None

    date_dirs = sorted(glob.glob(os.path.join(out_root, f"tier={tier}", "date=*")))
    report = {"days_total": len(date_dirs), "days_read": 0,
              "files_total": 0, "files_read": 0}

    # 1. directory prune: a date dir covers [day 00:00, day 24:00)
    day_us = 86_400_000_000
    kept_dirs = []
    for d in date_dirs:
        day = datetime.date.fromisoformat(os.path.basename(d)[5:])
        d_lo = (day - datetime.date(1970, 1, 1)).days * day_us
        if (hi is not None and d_lo > hi) or (
            lo is not None and d_lo + day_us - 1 < lo
        ):
            continue
        kept_dirs.append(d)
    report["days_read"] = len(kept_dirs)

    # 2. zonemap prune on the surviving files
    files = [f for d in kept_dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    report["files_total"] = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in date_dirs)
    if files and (lo is not None or hi is not None):
        box_lo = lo if lo is not None else -(2**62)
        box_hi = hi if hi is not None else 2**62
        kept = []
        for f in files:
            for z in file_zonemaps(f, (time_col,)):
                fl, fh = z["ranges"][time_col]
                if fl is None or (fh >= box_lo and fl <= box_hi):
                    kept.append(z["path"])
        files = kept
    report["files_read"] = len(files)
    if not files:
        return None, report

    # tier=/date= are prune directories, not data columns — keep the
    # hive inference from bolting them onto every row.  (Ray 2.49's
    # columns= + partitioning=None path raises UnboundLocalError, so:
    # an explicit columns list already excludes them; the full-schema
    # read disables inference instead.)
    if columns is not None:
        ds = ray.data.read_parquet(files, columns=columns)
    else:
        ds = ray.data.read_parquet(files, partitioning=None)

    # 3. exact row filter (correctness never rests on the pruning)
    if lo is not None or hi is not None:

        def _filt(t: pd.DataFrame) -> pd.DataFrame:
            tus = t[time_col].to_numpy("datetime64[us]").view(np.int64)
            m = np.ones(len(t), dtype=bool)
            if lo is not None:
                m &= tus >= lo
            if hi is not None:
                m &= tus <= hi
            return t[m]

        ds = ds.map_batches(_filt, batch_format="pandas")
    return ds, report
