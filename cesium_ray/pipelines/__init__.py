from .flagship import run_flagship, PartitionProcessor  # noqa: F401
from .featurize import (  # noqa: F401
    featurize_time_series,
    featurize_ts_files,
    featurize_npz_files,
    save_featureset,
    load_featureset,
)
