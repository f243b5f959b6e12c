"""Cohort / funnel analytics over event streams — the two classic
product-analytics aggregations, built on the engine's one wide
primitive (user-keyed ``group_apply`` exchange) with exact int64-µs
arithmetic so the SQL twins are bit-identical.

Scale shape:
- cohort_retention: one user-keyed exchange; each partition reduces
  its users to distinct (cohort_day, age_days) cells WITH partial
  counts, so the second exchange (cohort-keyed) carries cells —
  bounded by days², not by users or rows.
- funnel_steps: one user-keyed exchange; per partition a constant
  number (len(steps)) of masked min-reduce passes — no per-user loop;
  output is len(steps) rows per partition, summed driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .partition import group_apply

_DAY_US = np.int64(86_400_000_000)


def cohort_retention(
    ds: ray.data.Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per (cohort day = a user's first-seen day, age in days): the
    number of distinct users active — the retention triangle.
    Returns (cohort_day, age_days, n_users) with cohort_day in epoch
    days."""

    def per_user_cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        g = df[key].to_numpy()
        day = df[ts_col].to_numpy("datetime64[us]").view(np.int64) // _DAY_US
        new = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(new) - 1
        cohort = day[new][gid]  # first row per user is its min day (sorted)
        age = day - cohort
        # distinct (user, age) cells, then partial-count per (cohort, age)
        cell = np.stack([gid, age])
        uniq = np.unique(cell, axis=1)
        out = (pd.DataFrame({
            "cohort_day": cohort[new][uniq[0]],
            "age_days": uniq[1],
        }).groupby(["cohort_day", "age_days"], as_index=False)
            .size().rename(columns={"size": "_n"}))
        return out

    cells = group_apply(ds, per_user_cells, num_partitions=num_partitions,
                        key=key)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_day", "age_days"], as_index=False)["_n"].sum()
        return out.rename(columns={"_n": "n_users"})

    # users are whole within a partition, so partial counts are already
    # distinct-user counts; the cohort-keyed exchange just sums them
    return group_apply(cells, merge, num_partitions=num_partitions,
                       key="cohort_day")


def funnel_steps(
    ds: ray.data.Dataset,
    steps: tuple = ("signup", "click", "purchase"),
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Strict-order funnel: a user reaches step i+1 only via an event
    of that type STRICTLY after their step-i time (earliest-completion
    semantics: each step's time is the min qualifying ts).  Returns
    one row per step: (step_idx, step, n_users)."""
    steps = tuple(steps)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key], kind="mergesort")
        g = df[key].to_numpy()
        tus = df[ts_col].to_numpy("datetime64[us]").view(np.int64)
        et = df[type_col].to_numpy()
        new = np.r_[True, g[1:] != g[:-1]]
        gid = np.cumsum(new) - 1
        n_users = int(gid[-1]) + 1 if len(gid) else 0
        prev = np.full(n_users, -(2**62), np.int64)  # step-0 gate: -inf
        alive = np.ones(n_users, bool)
        counts = []
        for s in steps:
            t = np.full(n_users, 2**62, np.int64)
            m = (et == s) & alive[gid] & (tus > prev[gid])
            np.minimum.at(t, gid[m], tus[m])
            alive = alive & (t < 2**62)
            counts.append(int(alive.sum()))
            prev = t
        return pd.DataFrame({
            "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
            "step": list(steps),
            "_n": np.array(counts, np.int64),
        })

    parts = group_apply(ds, per_part, num_partitions=num_partitions,
                        key=key).to_pandas()
    out = (parts.groupby(["step_idx", "step"], as_index=False)["_n"].sum()
           .rename(columns={"_n": "n_users"}))
    return out.sort_values("step_idx").reset_index(drop=True)
