"""Transcript readers (SURVEY.md §2.1).

``read_turns`` prunes columns at the read (only needed columns leave
storage).  ``events_as_turns`` adapts the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props — FIXTURES.md F6) to
the transcript shape so every pipeline also runs on /root/testdata.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_turns(path: str, columns=None, **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=columns or TURN_COLUMNS, **kw)


def _events_batch_to_turns(batch: pa.Table) -> pa.Table:
    """events → turns: user_id→conv_id, event_type→role, props→text,
    value rides along as an extra measurement channel."""
    return pa.table(
        {
            "conv_id": pc.cast(batch["user_id"], pa.string()),
            "turn_idx": pc.cast(batch["event_id"], pa.int32()),
            "role": batch["event_type"],
            "text": batch["props"],
            "tool": pa.nulls(len(batch), pa.string()),
            "ts": batch["ts"],
            "value": batch["value"],
        }
    )


def events_as_turns(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    return ds.map_batches(_events_batch_to_turns, batch_format="pyarrow")
