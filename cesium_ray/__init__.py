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

# Two benign, Ray-internal log lines are demoted here (applies in every
# process that loads this library, workers included):
#   1. "RefBundle with a different schema ... new schema: ." — sort-based
#      map_groups never calls the UDF on an empty shuffle partition, so
#      Ray emits a schema-LESS empty block; the bundle is empty and
#      harmless.  Only the empty-new-schema form is dropped — a REAL
#      divergence (two different non-empty schemas) still warns, and the
#      stages that used to produce those (asof int dtypes, untyped empty
#      frames) now emit one declared schema per stage.
#   2. "Failed to hash the schemas (for deduplication)" — pandas block
#      schemas are unhashable dataclasses; Ray falls through to full
#      unification (transform_pyarrow.py:181), nothing is lost.
import logging as _logging


class _BenignRayDataNoise(_logging.Filter):
    def filter(self, rec: _logging.LogRecord) -> bool:  # True = keep
        m = rec.getMessage()
        if "new schema: ." in m and "different schema" in m:
            return False
        if "Failed to hash the schemas (for deduplication)" in m:
            return False
        return True


for _name in (
    "ray.data._internal.execution.streaming_executor_state",
    "ray.data._internal.arrow_ops.transform_pyarrow",
):
    _logging.getLogger(_name).addFilter(_BenignRayDataNoise())

__version__ = "0.1.0"

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
