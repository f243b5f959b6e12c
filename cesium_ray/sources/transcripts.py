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


def read_turns_jsonl(path: str, **kw) -> ray.data.Dataset:
    """Read transcripts from JSONL (one turn object per line) into the
    canonical turns schema.  ``ray.data.read_json`` streams line-
    delimited JSON per block; we then coerce types (ts strings →
    timestamp[us], turn_idx → int32, missing tool → null) so downstream
    stages see exactly the Parquet schema."""

    def coerce(batch: pa.Table) -> pa.Table:
        cols = {}
        n = len(batch)
        names = set(batch.column_names)
        cols["conv_id"] = pc.cast(batch["conv_id"], pa.string())
        cols["turn_idx"] = pc.cast(batch["turn_idx"], pa.int32())
        cols["role"] = (pc.cast(batch["role"], pa.string())
                        if "role" in names else pa.nulls(n, pa.string()))
        cols["text"] = (pc.cast(batch["text"], pa.string())
                        if "text" in names else pa.nulls(n, pa.string()))
        cols["tool"] = (pc.cast(batch["tool"], pa.string())
                        if "tool" in names else pa.nulls(n, pa.string()))
        ts = batch["ts"]
        if pa.types.is_timestamp(ts.type):
            cols["ts"] = pc.cast(ts, pa.timestamp("us"))
        elif pa.types.is_integer(ts.type):
            # integer epoch micros
            cols["ts"] = pc.cast(ts, pa.timestamp("us"))
        else:
            # Arrow's string→timestamp cast parses ISO-8601 incl.
            # fractional seconds ("...T00:00:00.123456") directly
            cols["ts"] = pc.cast(pc.cast(ts, pa.string()),
                                 pa.timestamp("us"))
        return pa.table(cols)

    return ray.data.read_json(path, **kw).map_batches(
        coerce, batch_format="pyarrow")


def write_turns_jsonl(ds: ray.data.Dataset, out_dir: str, **kw) -> None:
    """Write turns as partitioned JSONL (one file per block) — the
    interchange format for non-Parquet consumers.  Timestamps are
    written as int64 epoch microseconds (NOT ISO strings) so the
    round-trip through ``read_turns_jsonl`` is µs-exact."""

    def intify(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        i = batch.schema.get_field_index("ts")
        return batch.set_column(i, "ts", ts)

    ds.map_batches(intify, batch_format="pyarrow").write_json(
        out_dir, **kw)
