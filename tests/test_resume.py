"""Checkpoint/resume + retention tests G5/G7 (SURVEY.md §7 step 6:
re-run must skip finished partitions and produce identical bytes)."""

import glob
import os
from datetime import datetime

import pandas as pd
import pytest
import ray.data

from cesium_ray.pipelines import run_flagship
from cesium_ray.state import Manifest, partition_fingerprint, retention_sweep
from cesium_ray.state.manifest import ManifestRow


def _tier_bytes(out):
    return {
        f: open(f, "rb").read()
        for f in sorted(glob.glob(f"{out}/tier=*/date=*/part-*.parquet"))
    }


def test_rerun_skips_and_is_identical(tiny_turns, tmp_path):
    out = str(tmp_path / "o")
    m1 = run_flagship(ray.data.from_arrow(tiny_turns), out, num_partitions=4,
                      features=None, codec=False)
    assert not m1.skipped.any()
    bytes1 = _tier_bytes(out)
    m2 = run_flagship(ray.data.from_arrow(tiny_turns), out, num_partitions=4,
                      features=None, codec=False)
    assert m2.skipped.all()
    assert _tier_bytes(out) == bytes1


def test_changed_input_recomputes(tiny_turns, tmp_path):
    out = str(tmp_path / "o")
    run_flagship(ray.data.from_arrow(tiny_turns), out, num_partitions=4,
                 features=None, codec=False)
    changed = tiny_turns.to_pandas()
    changed = pd.concat([changed, changed.iloc[[0]].assign(turn_idx=9999)])
    m = run_flagship(ray.data.from_pandas(changed), out, num_partitions=4,
                     features=None, codec=False)
    # only the partition holding that conv recomputes
    assert (~m.skipped).sum() == 1


def test_manifest_roundtrip(tmp_path):
    man = Manifest(str(tmp_path), "p")
    row = ManifestRow("00001", "abc", 10, 5, "ff", "done")
    man.mark(row)
    assert man.get("00001") == row
    assert man.is_done("00001", "abc")
    assert not man.is_done("00001", "other")
    assert not man.is_done("00002", "abc")
    assert len(man.rows()) == 1


def test_fingerprint_order_insensitive():
    df = pd.DataFrame({"conv_id": ["a", "b", "c"], "turn_idx": [1, 2, 3]})
    shuffled = df.sample(frac=1, random_state=1)
    assert partition_fingerprint(df) == partition_fingerprint(shuffled)
    assert partition_fingerprint(df) != partition_fingerprint(df.iloc[:2])


def test_retention_sweep(tmp_path):
    root = str(tmp_path)
    for tier, day in [("1m", "2026-01-01"), ("1m", "2026-02-25"),
                      ("1h", "2025-01-01"), ("1d", "2020-01-01")]:
        os.makedirs(f"{root}/tier={tier}/date={day}", exist_ok=True)
        open(f"{root}/tier={tier}/date={day}/x.parquet", "w").write("x")
    deleted = retention_sweep(root, now=datetime(2026, 3, 1))
    # 1m >30d old and 1h >365d old go; 1d keeps forever
    assert f"{root}/tier=1m/date=2026-01-01" in deleted
    assert os.path.exists(f"{root}/tier=1m/date=2026-02-25")
    assert f"{root}/tier=1h/date=2025-01-01" in deleted
    assert os.path.exists(f"{root}/tier=1d/date=2020-01-01")


def test_fingerprint_sensitive_to_value_columns():
    """ADVICE round 1: same keys + changed ts/value must change the
    fingerprint (key-only hashing silently kept stale outputs)."""
    df = pd.DataFrame({"conv_id": ["a", "b"], "turn_idx": [0, 0],
                       "ts": pd.to_datetime(["2026-01-01", "2026-01-02"]),
                       "value": [1.0, 2.0]})
    fp1 = partition_fingerprint(df)
    changed = df.copy()
    changed["value"] = [1.0, 99.0]
    assert partition_fingerprint(changed) != fp1
    shifted = df.copy()
    shifted["ts"] = shifted["ts"] + pd.Timedelta(hours=1)
    assert partition_fingerprint(shifted) != fp1
    # still order-insensitive
    assert partition_fingerprint(df.iloc[::-1].reset_index(drop=True)) == fp1


def test_fingerprint_multiset_not_pair_cancelling():
    """XOR alone cancels swapping one duplicated pair for another; the
    sum+xor combiner must not."""
    a = pd.DataFrame({"k": ["x", "x", "y"]})
    b = pd.DataFrame({"k": ["x", "y", "y"]})
    assert partition_fingerprint(a) != partition_fingerprint(b)


def test_recompute_sweeps_stale_date_files(tiny_turns, tmp_path):
    """ADVICE round 1: when a partition recomputes with fewer dates,
    the previous generation's tier=/date= files must disappear."""
    out = str(tmp_path / "o")
    pdf = tiny_turns.to_pandas()
    run_flagship(ray.data.from_pandas(pdf), out, num_partitions=2,
                 features=None, codec=False, gapfill_tier=None)
    before = set(glob.glob(f"{out}/tier=1d/date=*/part-*.parquet"))
    assert before
    # shift every timestamp far forward: all old dates become stale
    pdf2 = pdf.copy()
    pdf2["ts"] = pdf2["ts"] + pd.Timedelta(days=3650)
    run_flagship(ray.data.from_pandas(pdf2), out, num_partitions=2,
                 features=None, codec=False, gapfill_tier=None)
    after = set(glob.glob(f"{out}/tier=1d/date=*/part-*.parquet"))
    assert after and not (before & after), "old-generation date files survived"
