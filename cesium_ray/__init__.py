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

__version__ = "0.1.0"

TIERS = {"1m": 60, "1h": 3600, "1d": 86400}
