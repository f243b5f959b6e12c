"""cesium_ray — a from-scratch Ray-Data-native time-series engine.

Capabilities (SURVEY.md §2):
  * cesium-style per-series feature extraction (cadence statistics,
    amplitude / flux-percentile features, Lomb-Scargle periodicity) —
    semantics of ``cesium/features/*`` re-expressed as vectorized NumPy
    inside Ray Data actor-pool ``map_groups`` stages;
  * a rollup + downsample + retention engine over conversation-transcript
    Parquet (gap-fill, Gorilla/delta-of-delta compression, continuous
    aggregates at 1m/1h/1d tiers) — axis B of BASELINE.json.

Nothing here calls ``ray.init()``: the driver / bench / test fixture owns
the Ray session.
"""

import os as _os

# glibc malloc tuning for Ray worker processes (inherited from the
# driver env when set before ray.init): without this, every large
# NumPy/pandas temporary is mmap'd and munmap'd, and at 32 concurrent
# workers the kernel page-table churn + TLB shootdowns put the box at
# ~90% system time (measured: 2.3× end-to-end on the flagship rollup).
# Keeping big allocations on the sbrk heap removes the storm.
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
_os.environ.setdefault("MALLOC_ARENA_MAX", "2")

# The env vars above only take effect at process START — they fix the
# forked Ray workers, not the process importing this module.  Apply the
# same tuning to the CURRENT process via mallopt(3) so driver-side
# kernels (bench codec, oracle checks) get the fix too.
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL(None, use_errno=True)
    _M_MMAP_THRESHOLD, _M_TRIM_THRESHOLD = -3, -1
    _libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
    _libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
except Exception:  # non-glibc platform — the env vars still help workers
    pass

__version__ = "0.1.0"

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
