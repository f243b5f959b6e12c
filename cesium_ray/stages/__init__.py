from .partition import with_partition, group_apply  # noqa: F401
from .normalize import normalize_turns, derive_points  # noqa: F401
from .rollup import rollup_points, rollup_turns  # noqa: F401
from .features import FeatureExtractor, extract_features  # noqa: F401
from .gapfill import gapfill_points  # noqa: F401
from .codec import ChunkCodec, encode_points, decode_chunks  # noqa: F401
from .impute import impute_featureset  # noqa: F401
