"""Deduplication stages (training-data pipeline ops).

All flavors follow the same Ray-Data shape: vectorized per-batch
signature computation (``map_batches``) → hash-keyed ``groupby`` so
candidates co-locate → per-group verification.  No driver-side loops.

  * ``exact_dedup``        — hash-partition + per-group first.
  * ``minhash_lsh_dedup``  — shingle → minhash → band → bucket groupby
                             → verified Jaccard pairs.
  * ``simhash``            — 64-bit SimHash per doc (near-dup by
                             Hamming distance on band buckets).
  * ``ngram_jaccard``      — exact n-gram Jaccard for candidate pairs.
  * ``fingerprint``        — 64-bit rolling/content hash per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from .partition import group_apply

_PRIME = np.uint64((1 << 61) - 1)


def stable_hash64(data) -> int:
    """Deterministic cross-process 64-bit hash (Python's builtin
    ``hash()`` is salted per process — unusable across Ray workers)."""
    if isinstance(data, str):
        data = data.encode()
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def exact_dedup(
    ds: ray.data.Dataset, key: str = "text", id_col: str = "doc_id",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Keep the minimum-id row per distinct ``key`` value (O2-style
    hash-partitioned groupby; same content always lands in one
    partition)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col, kind="mergesort").groupby(
            key, as_index=False, sort=False
        ).first()

    return group_apply(ds, fn, num_partitions=num_partitions, key=key)


def _char_shingles(text: str, k: int = 5) -> set:
    if len(text) < k:
        return {text}
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def _minhash_sig(shingles: set, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhashes via universal hashing of shingle hash64s."""
    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    hv = np.array(
        [np.uint64(stable_hash64(s) & 0x7FFFFFFFFFFFFFFF) for s in shingles],
        dtype=np.uint64,
    )
    with np.errstate(over="ignore"):
        m = (a[:, None] * hv[None, :] + b[:, None]) % _PRIME
    return m.min(axis=1)


class MinHasher:
    """Actor-pool batch stage: permutation coefficients built once per
    actor (T-style stateful setup)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_PRIME), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_PRIME), num_perm, dtype=np.uint64)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            _minhash_sig(_char_shingles(t, self.k), self.a, self.b)
            for t in df[self.text_col]
        ]
        out = pd.DataFrame({self.id_col: df[self.id_col].to_numpy()})
        out["sig"] = [s.tobytes() for s in sigs]
        return out


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 32,
    concurrency=None,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup: per-doc signatures (actor pool) → explode
    to (band_id, band_hash, doc_id) rows → bucket groupby → candidate
    pairs verified by signature-estimated Jaccard.

    Returns a dataset of ``(doc_id, dup_of)`` pairs (doc_id > dup_of)
    whose estimated Jaccard ≥ threshold."""
    rows_per_band = num_perm // bands
    sigs = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        batch_format="pandas",
        fn_constructor_kwargs={
            "num_perm": num_perm, "k": k, "text_col": text_col, "id_col": id_col
        },
        concurrency=concurrency or (1, 8),
    )

    def explode_bands(df: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hash, sig_list = [], [], [], []
        for did, sb in zip(df[id_col], df["sig"]):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                ids.append(did)
                band_ids.append(bi)
                band_hash.append(stable_hash64(chunk.tobytes()))
                sig_list.append(sb)
        return pd.DataFrame(
            {id_col: ids, "band_id": band_ids, "band_hash": band_hash, "sig": sig_list}
        )

    exploded = sigs.map_batches(explode_bands, batch_format="pandas")
    exploded = exploded.map_batches(
        lambda df: df.assign(
            bucket=(pd.util.hash_pandas_object(
                df[["band_id", "band_hash"]], index=False
            ).to_numpy() % np.uint64(num_partitions)).astype(np.int32)
        ),
        batch_format="pandas",
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_, _), grp in df.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            g = grp.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            sigs_ = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    est = float(np.mean(sigs_[i] == sigs_[j]))
                    if est >= jaccard_threshold:
                        out.append((int(ids[j]), int(ids[i]), est))
        if not out:
            return pd.DataFrame(columns=[id_col, "dup_of", "est_jaccard"]).astype(
                {id_col: "int64", "dup_of": "int64", "est_jaccard": "float64"}
            )
        df2 = pd.DataFrame(out, columns=[id_col, "dup_of", "est_jaccard"])
        return df2.sort_values("dup_of").groupby(id_col, as_index=False).first()

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    # dedup pair list across bands: keep min dup_of per doc
    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["dup_of", "est_jaccard"]).groupby(
            id_col, as_index=False
        ).first()

    return group_apply(pairs, final, num_partitions=8, key=id_col)


def simhash64(tokens: list) -> int:
    """64-bit SimHash over token hashes."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = np.uint64(stable_hash64(tok))
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_stage(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "simhash": [
                    np.uint64(simhash64(str(t).lower().split())) for t in df[text_col]
                ],
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pandas")


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character n-gram Jaccard (verification kernel)."""
    sa, sb = _char_shingles(a, k), _char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def fingerprint_stage(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8,
) -> ray.data.Dataset:
    """Document fingerprint: min rolling-hash over ``window``-byte
    windows (winnowing-style) + full content hash."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fps, chs = [], []
        for t in df[text_col]:
            b = str(t).encode()
            if len(b) <= window:
                fps.append(np.uint64(stable_hash64(b)))
            else:
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                pw = np.uint64(31) ** np.arange(window, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    win = np.lib.stride_tricks.sliding_window_view(arr, window)
                    hv = (win * pw[None, :]).sum(axis=1)
                fps.append(np.uint64(hv.min()))
            chs.append(np.uint64(stable_hash64(b)))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "min_fingerprint": fps, "content_hash": chs}
        )

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pandas")
