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
