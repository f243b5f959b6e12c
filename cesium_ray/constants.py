"""Dependency-free constants (import-cheap: safe inside per-series
kernels).

cesium defaulting constants (cesium/time_series.py::DEFAULT_MAX_TIME /
::DEFAULT_ERROR_VALUE semantics, SURVEY.md §1.1): a series without
timestamps gets a uniform grid on [0, DEFAULT_MAX_TIME]; without
errors, a constant DEFAULT_ERROR_VALUE — every feature is defined even
without t/e.
"""

DEFAULT_MAX_TIME = 1.0
DEFAULT_ERROR_VALUE = 1e-4
