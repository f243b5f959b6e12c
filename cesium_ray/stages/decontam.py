"""Benchmark decontamination (LLM-training-data op): flag corpus
documents that share any word n-gram with a (small) benchmark set.

Scale shape — the inverse of pairwise dedup: the benchmark side is
dimension-sized (eval suites are ≤ ~10⁶ grams), so its distinct gram
hashes ride ONE ``ray.put`` broadcast and the corpus streams through a
single stateless ``map_batches`` — no shuffle at all.  Per batch the
engine reuses the byte-level whitespace tokenizer + segmented
polynomial token hash from ``dedup`` (no per-token Python), combines
``n`` consecutive token hashes into gram hashes with ``n`` shifted
fused multiply-adds, dedupes per doc, and counts membership hits via
``searchsorted`` against the sorted benchmark array.

Hash membership alone is correct up to 64-bit collisions (~1e-10 at
benchmark scale); to make the result EXACT, every hash hit is
re-verified against a broadcast set of the actual benchmark gram
strings — the verify path touches only flagged docs' matching grams,
so the hot path stays fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .dedup import _doc_token_hashes, _LOWER_TAB, _WS_TAB

# mixing multiplier for combining consecutive token hashes into a gram
# hash (odd ⇒ invertible mod 2^64; distinct from the byte-hash base 31
# so token- and gram-level hash spaces don't align)
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)


def _gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word n-gram hashes for a batch of texts.

    Returns ``(flat gram hash64s in doc order, per-doc gram counts)``;
    windows never span documents.  One tokenizer pass for the whole
    batch, then ``n`` shifted multiply-add passes (O(n·tokens), no
    Python loop over rows or grams).
    """
    hs, counts = _doc_token_hashes(texts)
    n_docs = len(counts)
    gcounts = np.maximum(counts - (n - 1), 0).astype(np.int64)
    total = int(gcounts.sum())
    if total == 0:
        return np.array([], dtype=np.uint64), gcounts
    doc_tok_starts = np.r_[0, np.cumsum(counts)[:-1]]
    # flat index of each gram's FIRST token: for doc d, gram j ->
    # doc_tok_starts[d] + j
    first = (np.repeat(doc_tok_starts, gcounts)
             + (np.arange(total)
                - np.repeat(np.r_[0, np.cumsum(gcounts)[:-1]], gcounts)))
    g = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            g = g * _GRAM_MULT + hs[first + j]
    return g, gcounts


def _lower_tokens(text: str) -> list[bytes]:
    """ASCII-lowercased whitespace tokens, bit-identical to the
    vectorized tokenizer (``bytes.split()`` splits on the same ASCII
    whitespace class as ``_WS_TAB``)."""
    return bytes(_LOWER_TAB[np.frombuffer(str(text).encode(), np.uint8)]).split()


def _gram_strings(text: str, n: int) -> set[bytes]:
    toks = _lower_tokens(text)
    return {b" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def benchmark_grams(texts, n: int) -> tuple[np.ndarray, frozenset]:
    """Sorted unique gram hashes + the exact gram-string set for a
    benchmark corpus (both broadcast-sized)."""
    hs, _ = _gram_hashes(list(texts), n)
    strings = set()
    for t in texts:
        strings |= _gram_strings(t, n)
    return np.unique(hs), frozenset(strings)


def decontaminate(
    docs: ray.data.Dataset,
    benchmark_texts,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """One row per input doc: ``n_hits`` (distinct word ``n``-grams
    shared with the benchmark) and ``contaminated = n_hits > 0``.

    ``benchmark_texts``: an iterable of strings — dimension-sized by
    contract (an eval suite), broadcast once via ``ray.put``.
    """
    bench_ref = ray.put(benchmark_grams(list(benchmark_texts), n))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bench_hashes, bench_strings = ray.get(bench_ref)
        texts = list(df[text_col])
        g, gcounts = _gram_hashes(texts, n)
        starts = np.r_[0, np.cumsum(gcounts)[:-1]]
        n_hits = np.zeros(len(df), dtype=np.int64)
        if len(g):
            doc_of = np.repeat(np.arange(len(df)), gcounts)
            # distinct grams per doc: sort by (doc, hash), drop
            # consecutive equals within a doc
            order = np.lexsort((g, doc_of))
            gs, ds_ = g[order], doc_of[order]
            keep = np.r_[True, (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])]
            gs, ds_ = gs[keep], ds_[keep]
            idx = np.searchsorted(bench_hashes, gs)
            idx[idx == len(bench_hashes)] = 0
            hit = len(bench_hashes) > 0
            hit = bench_hashes[idx] == gs if hit else np.zeros(len(gs), bool)
            if hit.any():
                # exact-string verification of every hash hit (rare
                # path: flagged docs only) — kills 64-bit collisions
                for d in np.unique(ds_[hit]):
                    cand = _gram_strings(texts[int(d)], n) & bench_strings
                    n_hits[int(d)] = len(cand)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_hits": n_hits,
            "contaminated": n_hits > 0,
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")
