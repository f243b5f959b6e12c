"""Single-node NumPy/pandas oracle engine (SURVEY.md §5.2).

Written first, tested with cesium-style analytic known-answer tests;
the Ray engine's rolled-up points and feature values must match this
module exactly (rollups) / to 1e-9 rtol (features).  Both sides import
the SAME per-series kernels from here so numerical parity holds by
construction (SURVEY.md §7 hard-part (c)).
"""

from .graphs import FEATURE_GRAPH, compute_features, feature_names  # noqa: F401
