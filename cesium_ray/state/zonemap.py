"""Zonemap (min/max) file pruning — the data-skipping read path that
makes the Z-order layout (stages/partition.py::zorder_sort) pay off:
Parquet footers already carry per-row-group column statistics, so a
2-D box predicate can skip whole files without reading a data page.

At 100-TB scale this is the difference between "scan the day" and
"read the ~√cells files whose (key, time) zonemaps intersect the box":
the planner reads ONLY footers (KBs per file), the surviving file list
feeds ``ray.data.read_parquet`` unchanged, and correctness never
depends on the pruning (a kept-but-irrelevant file is filtered
row-level downstream; a wrongly-dropped file is impossible because the
intersection test is conservative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import ray.data


def _stat_to_int(v) -> int:
    """Normalize a Parquet stat value (int or timestamp) to int64
    comparison space (µs for timestamps)."""
    if hasattr(v, "value"):          # pandas Timestamp: .value is ns
        return int(v.value) // 1000
    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    import datetime

    if isinstance(v, datetime.datetime):
        return int(pd.Timestamp(v).value) // 1000
    return int(v)


def file_zonemaps(path: str, cols: tuple) -> list[dict]:
    """Footer-only scan: per Parquet fragment, the file-level
    [min, max] of each requested column (min over row groups of the
    row-group mins, max of maxes).  Columns without statistics map to
    an unbounded range (conservative — never prunes)."""
    dset = pads.dataset(path, format="parquet")
    out = []
    for frag in dset.get_fragments():
        md = frag.metadata
        names = [md.schema.column(j).path
                 for j in range(md.num_columns)]
        ranges: dict = {}
        for c in cols:
            if c not in names:
                ranges[c] = (None, None)
                continue
            j = names.index(c)
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(j).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                mn, mx = _stat_to_int(st.min), _stat_to_int(st.max)
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            ranges[c] = (lo, hi)
        out.append({"path": frag.path, "ranges": ranges})
    return out


def pruned_read(
    path: str,
    box: dict,
    columns: list | None = None,
) -> tuple[ray.data.Dataset | None, dict]:
    """Plan + read: keep only files whose zonemap intersects every
    ``box`` predicate (``{col: (lo, hi)}`` inclusive, int64 space —
    µs for timestamp columns).  Returns (dataset or None if nothing
    survives, plan report {'files_total', 'files_read'}).

    The row-level predicate must still be applied downstream —
    pruning is file-granular and conservative."""
    zm = file_zonemaps(path, tuple(box))
    keep = []
    for f in zm:
        ok = True
        for c, (lo, hi) in box.items():
            fl, fh = f["ranges"][c]
            if fl is None:
                continue                  # no stats: keep
            if fh < lo or fl > hi:
                ok = False
                break
        if ok:
            keep.append(f["path"])
    report = {"files_total": len(zm), "files_read": len(keep)}
    if not keep:
        return None, report
    return ray.data.read_parquet(keep, columns=columns), report
