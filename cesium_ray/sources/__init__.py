from .timeseries_io import (  # noqa: F401
    DEFAULT_ERROR_VALUE,
    DEFAULT_MAX_TIME,
    normalize_series,
    parse_headerfile,
    parse_ts_data,
)
from .transcripts import read_turns, events_as_turns  # noqa: F401
from .archive import extract_time_series, featurize_archive  # noqa: F401
from .tiers import read_tier  # noqa: F401
