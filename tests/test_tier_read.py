"""Pruned tier reader (sources/tiers.py): directory + zonemap
pruning must skip files on a date-range query while returning
bit-equal rows to a full scan + filter."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cesium_ray.pipelines import run_flagship
from cesium_ray.sources import read_tier
from cesium_ray.synth import generate_turns


@pytest.fixture(scope="module")
def tier_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tiers"))
    run_flagship(
        ray.data.from_arrow(generate_turns(300, seed=21)),
        root, num_partitions=8,
    )
    return root


def _full(root, tier):
    import glob
    import os

    files = sorted(glob.glob(os.path.join(root, f"tier={tier}", "date=*", "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def _key_sorted(df):
    cols = [c for c in ["conv_id", "channel", "bucket"] if c in df.columns]
    return (df.sort_values(cols, kind="mergesort")
            .reset_index(drop=True)[sorted(df.columns)])


def test_range_read_bit_equal_and_pruned(tier_root):
    full = _full(tier_root, "1h")
    days = sorted(full["bucket"].dt.date.unique())
    assert len(days) >= 3, "synth input must span several days"
    # a window covering the middle day only
    mid = days[len(days) // 2]
    lo = pd.Timestamp(mid)
    hi = lo + pd.Timedelta(days=1) - pd.Timedelta(microseconds=1)

    ds, rep = read_tier(tier_root, "1h", lo, hi)
    assert ds is not None
    got = _key_sorted(ds.to_pandas())
    want = _key_sorted(full[(full["bucket"] >= lo) & (full["bucket"] <= hi)])
    pd.testing.assert_frame_equal(got, want)
    # pruning must actually bite: fewer days AND fewer files than total
    assert rep["days_read"] < rep["days_total"]
    assert rep["files_read"] < rep["files_total"], rep


def test_unbounded_read_is_full_scan(tier_root):
    ds, rep = read_tier(tier_root, "1d")
    got = _key_sorted(ds.to_pandas())
    want = _key_sorted(_full(tier_root, "1d"))
    pd.testing.assert_frame_equal(got, want)
    assert rep["files_read"] == rep["files_total"]


def test_empty_window(tier_root):
    ds, rep = read_tier(tier_root, "1h",
                        "2050-01-01", "2050-01-02")
    assert ds is None
    assert rep["days_read"] == 0 and rep["files_read"] == 0


def test_columns_pruned_at_read(tier_root):
    ds, _ = read_tier(tier_root, "1h", columns=["conv_id", "bucket"])
    assert set(ds.schema().names) == {"conv_id", "bucket"}


def test_misaligned_window_never_drops_rows(tier_root):
    """A window that slices into days mid-bucket returns exactly the
    full-scan + filter rows (conservative pruning)."""
    full = _full(tier_root, "1m")
    t = full["bucket"].sort_values()
    lo = t.iloc[int(len(t) * 0.3)] + pd.Timedelta(minutes=7)
    hi = t.iloc[int(len(t) * 0.8)] + pd.Timedelta(seconds=31)
    ds, rep = read_tier(tier_root, "1m", lo, hi)
    got = _key_sorted(ds.to_pandas())
    want = _key_sorted(full[(full["bucket"] >= lo) & (full["bucket"] <= hi)])
    pd.testing.assert_frame_equal(got, want)
