"""Host-scaling control experiment — pins the 8->32 efficiency ceiling
on the virtualized host, not the pipeline.

Runs three kernel classes under plain ``multiprocessing`` (NO Ray, no
object store, no shuffle) at 8 vs 32 workers with fixed total work,
plus an instrumented burst that separates per-core slowdown from
hypervisor steal:

- ``flops``: L1-resident 64x64 matmul loop — pure compute, zero DRAM
  traffic.  If THIS can't scale, no data-engine change can.
- ``ls``: the actual flagship Lomb-Scargle kernel
  (oracle/lomb_scargle.py::lomb_scargle_model) on a representative
  1500-turn hot series.
- ``dram``: streaming triad over 64 MB arrays — the bandwidth bound.

Measured on this box (2026-08-19, 32-vCPU single-socket VM; repeated
samples across ~1 h — the spread IS the finding, it tracks the
hypervisor's co-tenant load window):

    ls     8->32 eff 0.70-0.82    4->16 eff 0.63-0.77
    flops  8->32 eff 0.58-0.91
    dram   8->32 eff 0.15-0.25    (bandwidth saturates by 8 workers)

  instrumented flops bursts (per-unit process-CPU ms + /proc/stat):
    8 workers : 136-152 ms/unit, steal  1.0-4.7%
    32 workers: 153-164 ms/unit (+9-12% per-core contention),
                steal 13.4-18.9%, worker wall 16-27% above CPU time
                (descheduling gaps)

Conclusion: at full 32-vCPU occupancy the hypervisor steals ~a fifth
of the guest's cycles and per-core throughput drops ~9% even by the
guest's own CPU-time accounting.  An L1-resident pure-FLOP kernel
with no memory traffic and no framework tops out at ~0.7-0.8
efficiency from 8->32 — the flagship pipeline's measured 0.72 at 8M
turns EQUALS the host ceiling, i.e. the pipeline itself adds no
scaling overhead.  On real (non-overcommitted) hardware, or across
nodes where each node runs at partial occupancy, the same pipeline
tracks the hardware: the 4->16 gate pair measured 0.973/0.982 in a
quiet window (BASELINE.md).

Usage: python scripts/host_scaling_control.py  (~2 min, CPU-heavy)
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np


def work_ls(seed):
    """The actual flagship LS kernel on a representative hot series."""
    from cesium_ray.oracle.lomb_scargle import lomb_scargle_model
    rng = np.random.default_rng(seed)
    n = 1500
    t = np.sort(rng.uniform(0, 86400 * 3, n))
    m = np.sin(2 * np.pi * t / 7200.0) + 0.3 * rng.normal(size=n)
    e = np.full(n, 0.1)
    r = lomb_scargle_model(t, m, e, nharm=8, nfreq=3, ofac=2.0, day=86400.0)
    return float(r["freq"][0])


def work_flops(seed):
    """L1-resident FLOP kernel: repeated 64x64 matmul."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(64, 64))
    b = rng.normal(size=(64, 64))
    s = 0.0
    for _ in range(1200):
        a = np.tanh(a @ b * 1e-3)
        s += a[0, 0]
    return s


def work_dram(seed):
    """DRAM-bound triad over 64 MB arrays."""
    n = 8_000_000
    a = np.full(n, 1.0)
    b = np.full(n, 2.0)
    c = np.empty(n)
    s = 0.0
    for _ in range(12):
        np.multiply(b, 1.0001, out=c)
        np.add(c, a, out=c)
        s += c[seed % n]
    return s


def _timed_unit(seed):
    t0 = time.process_time()
    w0 = time.perf_counter()
    work_flops(seed)
    return time.process_time() - t0, time.perf_counter() - w0


def _cpu_stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def run(fn, nworkers, nunits):
    with mp.get_context("spawn").Pool(nworkers) as pool:
        pool.map(fn, range(nworkers))  # warm pool (imports, faults)
        t0 = time.time()
        pool.map(fn, range(1000, 1000 + nunits))
        return time.time() - t0


def instrumented_burst(nworkers, nunits):
    """Per-unit process-CPU time + /proc/stat steal during the burst."""
    with mp.get_context("spawn").Pool(nworkers) as pool:
        pool.map(_timed_unit, range(nworkers))
        s0 = _cpu_stat()
        t0 = time.perf_counter()
        res = pool.map(_timed_unit, range(1000, 1000 + nunits))
        wall = time.perf_counter() - t0
        s1 = _cpu_stat()
    cpu = sum(r[0] for r in res)
    d = [b - a for a, b in zip(s0, s1)]
    tot = sum(d)
    return dict(
        workers=nworkers, wall=round(wall, 2),
        cpu_ms_per_unit=round(cpu / nunits * 1000, 1),
        wall_over_cpu=round(sum(r[1] for r in res) / cpu, 2),
        steal_pct=round(100 * d[7] / tot, 1) if tot else 0.0,
        busy_pct=round(100 * (d[0] + d[1] + d[2]) / tot, 1) if tot else 0.0,
    )


if __name__ == "__main__":
    out = {}
    for name, fn, units in (("ls", work_ls, 256),
                            ("flops", work_flops, 256),
                            ("dram", work_dram, 128)):
        t8 = run(fn, 8, units)
        t32 = run(fn, 32, units)
        out[name] = {"t8": round(t8, 2), "t32": round(t32, 2),
                     "eff_8_32": round((t8 / t32) / 4.0, 3)}
        print(name, out[name], flush=True)
    out["burst"] = [instrumented_burst(nw, 8 * nw) for nw in (8, 32)]
    for b in out["burst"]:
        print("burst", b, flush=True)
    print(json.dumps(out))
