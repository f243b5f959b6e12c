"""Kill-mid-job resume test (SURVEY.md §7 step 6): SIGKILL the driver
process partway through a flagship run, rerun into the same out_root,
and require byte-identical tier outputs vs an uninterrupted run, with
finished partitions skipped."""

import glob
import os
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = r"""
import sys
import cesium_ray
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data
from cesium_ray.pipelines import run_flagship
from cesium_ray.synth import generate_turns
out_root = sys.argv[1]
turns = generate_turns(n_convs=400, seed=21)
m = run_flagship(ray.data.from_arrow(turns), out_root, num_partitions=16,
                 features=None, codec=False, gapfill_tier=None)
print("DONE", int(m.skipped.sum()), len(m))
ray.shutdown()
"""


def _tier_bytes(root):
    return {
        os.path.relpath(f, root): open(f, "rb").read()
        for f in sorted(glob.glob(f"{root}/tier=*/date=*/part-*.parquet"))
    }


@pytest.mark.slow
def test_sigkill_midway_then_resume(tmp_path):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    chaos_root = str(tmp_path / "chaos")
    clean_root = str(tmp_path / "clean")

    # run 1: kill -9 once the first manifests land
    p = subprocess.Popen([sys.executable, "-c", SCRIPT, chaos_root], env=env,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 180
    manifest_glob = f"{chaos_root}/_manifest/flagship/*.json"
    while time.time() < deadline:
        done = glob.glob(manifest_glob)
        if len(done) >= 3:  # mid-flight: some partitions finished
            break
        if p.poll() is not None:
            break
        time.sleep(0.2)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
    n_done_after_kill = len(glob.glob(manifest_glob))
    assert n_done_after_kill < 16, "job finished before the kill — can't test resume"

    # run 2: resume to completion
    out = subprocess.run([sys.executable, "-c", SCRIPT, chaos_root], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "DONE" in out.stdout, out.stderr[-2000:]
    skipped = int(out.stdout.split("DONE")[1].split()[0])
    assert skipped >= n_done_after_kill - 1  # finished partitions were skipped

    # clean reference run
    out2 = subprocess.run([sys.executable, "-c", SCRIPT, clean_root], env=env,
                          capture_output=True, text=True, timeout=300)
    assert "DONE" in out2.stdout, out2.stderr[-2000:]

    assert _tier_bytes(chaos_root) == _tier_bytes(clean_root)
