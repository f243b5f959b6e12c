"""Multimodal (binary-payload) stages — Ray-side plumbing is real;
decode kernels are STUBBED (no image/audio libraries in this
container), clearly marked, and swappable per actor.

Schema convention: media rides as an opaque ``payload: binary`` column
with typed metadata columns (``media_type``, ``width``, ``height``,
``sample_rate``, …).  Batches stay in ``pyarrow`` format end-to-end —
binary columns round-trip zero-copy through the object store and do
NOT survive pandas object-dtype conversion well (see ray_guide
pitfalls).  Batch sizes must stay small for large payloads
(``batch_size`` parameter, default 64).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


class MediaDecodeStub:
    """Actor-pool decode stage.  A real deployment replaces
    ``_decode`` with PIL/libav calls loaded once per actor in
    ``__init__``; here it emits a deterministic fake feature vector
    derived from the payload bytes, so the pipeline shape (schema,
    actor signature, batch size, output layout) is fully testable."""

    def __init__(self, feature_dim: int = 8, real_decoder: bool = False):
        self.feature_dim = feature_dim
        if real_decoder:
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "container; run with real_decoder=False (deterministic stub)"
            )

    def _decode(self, payload: bytes) -> np.ndarray:
        # STUB: deterministic pseudo-features from a blake2b digest
        d = hashlib.blake2b(payload, digest_size=8 * self.feature_dim).digest()
        raw = np.frombuffer(d, dtype=np.uint64).astype(np.float64)
        return raw / 2**64

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p.as_py()) for p in batch["payload"]]
        arr = pa.array([f.tolist() for f in feats], pa.list_(pa.float64()))
        return batch.drop_columns(["payload"]).append_column("features", arr)


def decode_media(
    ds: ray.data.Dataset,
    feature_dim: int = 8,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """payload:binary (+metadata) → features:list<double>.  Small batch
    size: payload × batch_size × concurrency must fit worker heaps."""
    return ds.map_batches(
        MediaDecodeStub,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"feature_dim": feature_dim},
    )


def frame_sample(
    ds: ray.data.Dataset, every_n: int = 10, idx_col: str = "frame_idx"
) -> ray.data.Dataset:
    """Keep every n-th frame of a media stream (vectorized Arrow filter)."""
    def fn(batch: pa.Table) -> pa.Table:
        idx = batch[idx_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % every_n == 0))

    return ds.map_batches(fn, batch_format="pyarrow")
