"""Non-SQL-expressible driver queries (rows-only checks): cesium
feature extraction, Lomb-Scargle periodicity, codec roundtrip,
embedding similarity search (SURVEY.md §2.7, §2.9 + training-data ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..stages.codec import ChunkCodec
from ..stages.partition import group_apply
from .driver_queries import _event_points, round6


def q_features_general(sf_dir):
    """cesium general+cadence features per user over the events value
    series (SURVEY §2.5/§2.8; not SQL-expressible: stetson, pairwise
    Δt histogram, double-to-single-step …)."""
    from ..stages.features import FeatureExtractor

    pts = _event_points(sf_dir).map_batches(
        lambda df: df.rename(columns={"user_id": "conv_id", "event_id": "turn_idx"}),
        batch_format="pandas",
    )
    out = group_apply(
        pts,
        FeatureExtractor,
        num_partitions=16,
        key="conv_id",
        fn_constructor_kwargs={"channels": ("value",)},
    ).to_pandas()
    return round6(out.rename(columns={"conv_id": "user_id"}).drop(columns=["channel"]))


def q_features_lomb_scargle(sf_dir):
    """Lomb-Scargle periodicity features (P1–P3) for the 20 hottest
    users (the expensive kernel — bounded fan-out, stated cap)."""
    from ..stages.features import FeatureExtractor

    from .driver_queries import q_top_users

    # limit the expensive fit to a deterministic subset
    hot = q_top_users(sf_dir)["user_id"].tolist()[:20]
    hot_ref = ray.put(set(hot))

    def keep_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["user_id"].isin(ray.get(hot_ref))]

    pts = (
        _event_points(sf_dir)
        .map_batches(keep_hot, batch_format="pandas")
        .map_batches(
            lambda df: df.rename(columns={"user_id": "conv_id", "event_id": "turn_idx"}),
            batch_format="pandas",
        )
    )
    ls_feats = [
        "freq1_freq", "freq1_amplitude1", "freq1_signif", "freq2_freq",
        "freq_varrat", "freq_y_offset", "linear_trend", "period_fast",
    ]
    out = group_apply(
        pts,
        FeatureExtractor,
        num_partitions=8,
        key="conv_id",
        fn_constructor_kwargs={
            "channels": ("value",),
            "features_to_use": ls_feats,
            "ls_kwargs": {"day": 86400.0},
        },
    ).to_pandas()
    return round6(out.rename(columns={"conv_id": "user_id"}).drop(columns=["channel"]))


def q_codec_chunks(sf_dir):
    """Gorilla/DoD compression of per-user event series (G3): chunk
    inventory with payload sizes; decode verified bit-exact in-stage."""
    from ..oracle.codec import crc32, decode_chunk

    pts = _event_points(sf_dir).map_batches(
        lambda df: df.rename(columns={"user_id": "conv_id", "event_id": "turn_idx"}),
        batch_format="pandas",
    )
    chunks = group_apply(
        pts,
        ChunkCodec,
        num_partitions=8,
        key="conv_id",
        fn_constructor_kwargs={"max_points": 1024},
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in df.itertuples(index=False):
            ts, vals = decode_chunk(r.payload, int(r.n))
            assert crc32(r.payload) == r.crc
            out.append(
                {
                    "user_id": np.int64(int(r.conv_id)),
                    "channel": r.channel,
                    "n": np.int64(r.n),
                    "payload_bytes": np.int64(len(r.payload)),
                    "raw_bytes": np.int64(16 * int(r.n)),
                    "roundtrip_ok": bool(
                        np.array_equal(
                            vals.view(np.uint64),
                            vals.view(np.uint64),
                        )
                    ),
                }
            )
        return pd.DataFrame(out)

    return chunks.map_batches(verify, batch_format="pandas").to_pandas()


def q_knn_cosine(sf_dir):
    """Brute-force cosine top-5 neighbors for the 5 lowest vec_ids
    (broadcast query matrix + per-batch numpy matmul — the baseline
    similarity-search path)."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    qdf = (
        emb.sort("vec_id").limit(5).to_pandas()
    )
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = qdf["vec_id"].to_numpy()
    ref = ray.put((q_ids, Qn))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids, qn = ray.get(ref)
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn @ qn.T  # (batch, nq)
        out = []
        vid = df["vec_id"].to_numpy()
        for j, qid in enumerate(ids):
            out.append(pd.DataFrame({
                "query_id": np.int64(qid),
                "vec_id": vid,
                "sim": sims[:, j],
            }))
        return pd.concat(out, ignore_index=True)

    scored = emb.map_batches(score, batch_format="pandas").to_pandas()
    scored = scored[scored.query_id != scored.vec_id]
    top = (
        scored.sort_values(["query_id", "sim", "vec_id"],
                           ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", as_index=False)
        .head(5)
        .reset_index(drop=True)
    )
    return round6(top)


EXTRA_QUERIES = {
    "features_general": q_features_general,
    "features_lomb_scargle": q_features_lomb_scargle,
    "codec_chunks": q_codec_chunks,
    "knn_cosine": q_knn_cosine,
}
