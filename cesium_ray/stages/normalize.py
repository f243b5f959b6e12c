"""Input normalizer M1/M2 + channel derivation (SURVEY.md §2.2).

``normalize_turns`` is a stateless zero-copy-Arrow ``map_batches``
transform: casts ``ts`` to timestamp[us], adds ``text_len`` =
utf8_length(text) (the second measurement channel), validates column
presence.  Per-series time ordering (M2 — the text-equality invariant
ordering key (conv_id, turn_idx)) is enforced inside the grouped
stages, never assumed of input file order (SURVEY §2.11).

``derive_points`` = hash-partitioned groupby on conv_id (G1) +
vectorized latency/channel derivation (oracle/rollup.py::
derive_channels_pandas — shared kernel, parity by construction).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..oracle.rollup import derive_channels_pandas
from .partition import group_apply


def normalize_batch(batch: pa.Table) -> pa.Table:
    cols = set(batch.column_names)
    if "ts" not in cols or "conv_id" not in cols:
        raise ValueError(f"turns batch missing required columns: {batch.column_names}")
    if batch["ts"].type != pa.timestamp("us"):
        batch = batch.set_column(
            batch.schema.get_field_index("ts"),
            "ts",
            batch["ts"].cast(pa.timestamp("us")),
        )
    if "text" in cols and "text_len" not in cols:
        # int32, not float64: text_len rides the conv exchange in the
        # flagship — half the shuffled bytes; kernels upcast on use
        batch = batch.append_column(
            "text_len", pc.cast(pc.utf8_length(batch["text"]), pa.int32())
        )
    return batch


def normalize_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(normalize_batch, batch_format="pyarrow", zero_copy_batch=True)


def derive_points(
    turns: ray.data.Dataset,
    num_partitions: int = 64,
    by: str = "conv_id",
    order=("turn_idx",),
    **kw,
) -> ray.data.Dataset:
    """turns → long-format SERIES_POINTS (channels: turn_latency,
    text_len[, value]).  One conv_id-keyed hash shuffle."""
    keep = [by, *order, "ts"] + (
        ["text"] if "text" in turns.columns() else []
    ) + (["value"] if "value" in turns.columns() else [])
    pruned = turns.select_columns(list(dict.fromkeys(keep)))
    return group_apply(
        pruned,
        lambda df: derive_channels_pandas(df, by=by, order=order),
        num_partitions=num_partitions,
        key=by,
        **kw,
    )


def union_by_name(
    a: ray.data.Dataset, b: ray.data.Dataset
) -> ray.data.Dataset:
    """Schema-evolution-safe union (SQL ``UNION ALL BY NAME``):
    aligns both sides to the union of their column sets — columns
    missing on a side surface as nulls — so a pipeline can ingest old
    and new partition layouts in one pass.  Column order: left's
    columns, then right-only columns.  Note pandas represents a
    missing int column as NaN (float) — downstream casts decide the
    final type, as with any schema migration."""
    import pandas as pd

    ca = list(a.schema().names)
    cb = list(b.schema().names)
    cols = ca + [c for c in cb if c not in ca]

    def align(df: pd.DataFrame) -> pd.DataFrame:
        return df.reindex(columns=cols)

    return (a.map_batches(align, batch_format="pandas")
            .union(b.map_batches(align, batch_format="pandas")))
