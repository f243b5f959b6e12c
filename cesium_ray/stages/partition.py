"""Hash partitioning (SURVEY.md §2.9 G1/G6).

The engine's one wide primitive: add a deterministic ``_part`` column
(stable hash of the key, mod P) in a stateless ``map_batches``, then
``groupby('_part').map_groups(fn)`` where ``fn`` is VECTORIZED pandas
over the whole partition — so the number of per-group Python calls is
P (a few hundred), not the number of conversations (billions at spec
scale).  Hot-conversation salting (G6) is expressed by including the
tier bucket in the partition key where semantics allow (rollups: each
(conv, channel, bucket) group stays intact within one partition, so
exact quantiles survive — SURVEY §7 hard-part (a)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _stable_hash(arr: np.ndarray) -> np.ndarray:
    """Deterministic cross-process uint64 hash of a key array
    (pandas' siphash with its fixed default key)."""
    return pd.util.hash_array(arr, categorize=False)


def with_partition(
    ds: ray.data.Dataset,
    num_partitions: int,
    key: str = "conv_id",
    bucket_us: np.ndarray | None = None,
    salt_tier_s: int | None = None,
    dict_cols: tuple = (),
) -> ray.data.Dataset:
    """Add ``_part = hash(key [, floor(ts, salt_tier)]) % P``.

    With ``salt_tier_s`` set, the partition key includes the tier
    bucket: a hot conversation's buckets spread over all partitions
    while every (key, bucket) group stays whole.

    ``dict_cols``: string columns to dictionary-encode in the same
    pass (AFTER hashing) — e.g. ``conv_id`` shrinks from ~17 B/row to
    ~2 B/row through the all-to-all exchange; Arrow unifies the
    per-block dictionaries on concat and pandas sees a Categorical
    (derive_channel_arrays has a codes fast path)."""

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        h = _stable_hash(np.asarray(k))
        if salt_tier_s is not None:
            ts_us = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
            step = np.int64(salt_tier_s) * 1_000_000
            h = h ^ _stable_hash((ts_us // step) * step)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        for c in dict_cols:
            i = batch.schema.get_field_index(c)
            if i >= 0 and pa.types.is_string(batch.schema.field(i).type):
                batch = batch.set_column(i, c, pc.dictionary_encode(batch[c]))
        return batch.append_column("_part", pa.array(part, pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow")


def group_apply(
    ds: ray.data.Dataset,
    fn,
    num_partitions: int = 64,
    key: str = "conv_id",
    salt_tier_s: int | None = None,
    batch_format: str = "pandas",
    **map_groups_kw,
) -> ray.data.Dataset:
    """Hash-partition by ``key`` and run ``fn(partition) -> block``
    once per partition (vectorized inside).  ``batch_format="pyarrow"``
    hands ``fn`` the partition as a ``pa.Table`` (no pandas conversion
    — int-with-null columns keep their Arrow types instead of
    float64-roundtripping)."""
    parted = with_partition(ds, num_partitions, key=key, salt_tier_s=salt_tier_s)

    if isinstance(fn, type):  # callable class → actor pool
        wrapped = fn
        if "concurrency" not in map_groups_kw:
            # AUTOSCALING pool (ncpu//2, ncpu): a fixed pool of ncpu
            # actors would reserve every CPU and deadlock the upstream
            # shuffle on small clusters; half-size min starts the stage
            # wide immediately while leaving CPUs for the exchange
            ncpu = int(ray.cluster_resources().get("CPU", 4))
            hi = max(1, min(ncpu, num_partitions))
            map_groups_kw["concurrency"] = (max(1, hi // 2), hi)
    elif batch_format == "pyarrow":
        def wrapped(tbl: pa.Table) -> pa.Table:
            return fn(tbl.drop_columns(["_part"]))
    else:
        def wrapped(df: pd.DataFrame) -> pd.DataFrame:
            return fn(df.drop(columns=["_part"]))

    return parted.groupby("_part").map_groups(
        wrapped, batch_format=batch_format, **map_groups_kw
    )
