"""Deterministic stratified sampling — up to ``n`` rows per key,
chosen by a seeded LCG hash of the row id (O3-adjacent: sampling whose
result is reproducible across processes AND expressible in SQL, unlike
``Dataset.random_sample``).

Order within a key is ``(lcg(id), id)``; the hash stays inside
[0, 2^31) so the identical arithmetic runs overflow-free as BIGINT in
the DuckDB oracle (``(id*1103515245 + 12345) % 2147483648``).

Distributed shape: ONE hash exchange on the key, vectorized rank
kernel per partition (lexsort + per-key positional rank — no per-key
Python).  Partitioning assumption: all rows of one key hash to one
partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .partition import group_apply

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def lcg_hash(ids: np.ndarray) -> np.ndarray:
    """The sampling order key: BIGINT-safe for ids < ~8.4e9 (the
    multiply peaks below 2^63); testdata ids are far below that."""
    return (ids.astype(np.int64) * _LCG_A + _LCG_C) % _LCG_M


def stratified_sample_pandas(
    df: pd.DataFrame,
    by: str = "user_id",
    id_col: str = "event_id",
    n_per_key: int = 5,
) -> pd.DataFrame:
    if not len(df):
        return df
    key = df[by].to_numpy()
    ids = df[id_col].to_numpy()
    h = lcg_hash(ids)
    order = np.lexsort((ids, h, key))
    k = key[order]
    first = np.r_[True, k[1:] != k[:-1]]
    kstarts = np.flatnonzero(first)
    kcounts = np.diff(np.r_[kstarts, len(k)])
    rank = np.arange(len(k)) - np.repeat(kstarts, kcounts) + 1
    keep = order[rank <= n_per_key]
    out = df.iloc[keep].copy()
    out["sample_rank"] = rank[rank <= n_per_key]
    return out.reset_index(drop=True)


def stratified_sample(
    ds: ray.data.Dataset,
    by: str = "user_id",
    id_col: str = "event_id",
    n_per_key: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    return group_apply(
        ds,
        lambda df: stratified_sample_pandas(df, by=by, id_col=id_col,
                                            n_per_key=n_per_key),
        num_partitions=num_partitions,
        key=by,
    )
