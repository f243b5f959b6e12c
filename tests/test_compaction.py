"""Small-file compaction (state/compact.py): bit-preserving,
idempotent, crash-shaped (tmp-dir + rename) rewrite of tier/date
partitions."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data

from cesium_ray.pipelines import run_flagship
from cesium_ray.state.compact import compact_partitions
from cesium_ray.synth import generate_turns


def _read_all(root, tier):
    files = sorted(glob.glob(f"{root}/tier={tier}/date=*/part-*.parquet"))
    return (pd.concat([pd.read_parquet(f) for f in files])
            .sort_values(["conv_id", "channel", "bucket"], kind="mergesort")
            .reset_index(drop=True)), files


def test_compaction_bit_preserving_and_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "store")
    run_flagship(ray.data.from_arrow(generate_turns(100, seed=4)), out,
                 num_partitions=8, tiers=("1h",), features=None,
                 codec=False, gapfill_tier=None, resume=False)
    before, files0 = _read_all(out, "1h")
    assert len(files0) > len(glob.glob(f"{out}/tier=1h/date=*")), \
        "fixture must start with multiple part files per date"

    rep = compact_partitions(out, target_bytes=64 * 1024 * 1024)
    assert rep["compacted"].any()
    after, files1 = _read_all(out, "1h")
    pd.testing.assert_frame_equal(before, after, check_exact=True)
    assert len(files1) < len(files0)
    # every compacted date dir collapsed to one file at this size
    for d in glob.glob(f"{out}/tier=1h/date=*"):
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1
        assert not glob.glob(f"{d}/.tmp-*"), "no tmp debris"

    rep2 = compact_partitions(out, target_bytes=64 * 1024 * 1024)
    assert not rep2["compacted"].any(), "second run must be a no-op"
    again, _ = _read_all(out, "1h")
    pd.testing.assert_frame_equal(before, again, check_exact=True)


def test_compaction_target_splits_large_partitions(ray_session, tmp_path):
    out = str(tmp_path / "store")
    run_flagship(ray.data.from_arrow(generate_turns(120, seed=8)), out,
                 num_partitions=6, tiers=("1d",), features=None,
                 codec=False, gapfill_tier=None, resume=False)
    before, _ = _read_all(out, "1d")
    # tiny target: merged output must split into multiple ~target files
    compact_partitions(out, target_bytes=4096)
    after, files = _read_all(out, "1d")
    pd.testing.assert_frame_equal(before, after, check_exact=True)
    multi = [d for d in glob.glob(f"{out}/tier=1d/date=*")
             if len(glob.glob(f"{d}/part-*.parquet")) > 1]
    assert multi, "at least one partition should need several files"


def test_compaction_crash_recovery_and_tail_idempotence(ray_session,
                                                        tmp_path):
    import shutil

    from cesium_ray.state.compact import _plan_groups

    out = str(tmp_path / "store")
    run_flagship(ray.data.from_arrow(generate_turns(60, seed=5)), out,
                 num_partitions=6, tiers=("1h",), features=None,
                 codec=False, gapfill_tier=None, resume=False)
    compact_partitions(out, target_bytes=64 * 1024 * 1024)
    before, _ = _read_all(out, "1h")
    dates = sorted(glob.glob(f"{out}/tier=1h/date=*"))

    # crash window 1: displaced dir exists, live dir missing
    victim = dates[0]
    parent = os.path.dirname(victim)
    old = os.path.join(parent, "." + os.path.basename(victim) + ".old")
    os.replace(victim, old)
    assert not os.path.exists(victim)
    compact_partitions(out, target_bytes=64 * 1024 * 1024)
    assert os.path.exists(victim) and not os.path.exists(old)
    after, _ = _read_all(out, "1h")
    pd.testing.assert_frame_equal(before, after, check_exact=True)

    # crash window 2: stale .old beside a live dir is swept, and its
    # rows are never double-read (the dot prefix hides it from globs)
    shutil.copytree(victim, old)
    mid, _ = _read_all(out, "1h")
    pd.testing.assert_frame_equal(before, mid, check_exact=True)
    compact_partitions(out, target_bytes=64 * 1024 * 1024)
    assert not os.path.exists(old)

    # tail idempotence: [>=target, small-tail] plans one group per
    # file and must be skipped, not rewritten forever
    assert _plan_groups([130, 13], 128) == [0, 1]
    assert _plan_groups([13] * 11, 128) != list(range(11))
    assert _plan_groups([200, 200], 128) == [0, 1]
