from .manifest import Manifest, partition_fingerprint, retention_sweep  # noqa: F401
