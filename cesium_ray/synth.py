"""Deterministic synthetic transcript generator (FIXTURES.md F1).

No external data: seeded NumPy only.  Shape is the authoritative input
table from BASELINE.json input_hint.  Properties exercised downstream:

  * Zipf(a≈1.3)-skewed conversation sizes → a few "hot" conversations
    (exercises salting, SURVEY.md §2.9 G6);
  * intra-conversation gaps Exponential(mean 45 s) modulated by a
    daily + weekly sinusoid (injects real periodicity for the
    Lomb-Scargle family, SURVEY.md §2.7);
  * per-turn text = seeded token strings (byte-equality invariant).

Replaces the reference's external dataset fetchers
(cesium/datasets.py::fetch_*) — SURVEY.md §2.1 S4.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TURNS

_EPOCH_US = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")

_VOCAB = np.array(
    [f"tok{i:03d}" for i in range(512)] + ["alpha", "beta", "gamma", "delta"],
    dtype=object,
)
_TOOLS = np.array(["search", "code", "db"], dtype=object)


def generate_turns(
    n_convs: int = 1000,
    seed: int = 42,
    mean_gap_s: float = 45.0,
    zipf_a: float = 1.3,
    max_turns: int = 2000,
    conv_offset: int = 0,
) -> pa.Table:
    """Return a ``turns`` Arrow table for ``n_convs`` conversations.

    Deterministic in (n_convs, seed, conv_offset); ``conv_offset``
    shifts conv_id numbering so shards are disjoint.
    """
    rng = np.random.default_rng(seed)

    sizes = np.minimum(rng.zipf(zipf_a, n_convs) + 1, max_turns).astype(np.int64)
    n_total = int(sizes.sum())

    conv_ids = np.repeat(
        np.array([f"conv-{conv_offset + i:08d}" for i in range(n_convs)], dtype=object),
        sizes,
    )
    # dense 0..n-1 turn_idx within each conversation
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n_total) - np.repeat(starts, sizes)).astype(np.int32)

    # conversation start uniform over 30 days; gaps exponential with a
    # daily + weekly sinusoidal rate modulation
    conv_start_s = rng.uniform(0, 30 * 86400, n_convs)
    base_gap = rng.exponential(mean_gap_s, n_total)
    t0 = np.repeat(conv_start_s, sizes)
    phase_d = 2 * np.pi * t0 / 86400.0
    phase_w = 2 * np.pi * t0 / (7 * 86400.0)
    rate = 1.0 + 0.6 * np.sin(phase_d) + 0.3 * np.sin(phase_w)
    gaps = base_gap / np.maximum(rate, 0.1)
    gaps[turn_idx == 0] = 0.0
    # cumulative within conversation: cumsum minus the carried-over offset
    cum = np.cumsum(gaps)
    cum_at_start = np.repeat(cum[starts] - gaps[starts], sizes)
    rel_t = cum - cum_at_start
    ts_us = (_EPOCH_US + ((t0 + rel_t) * 1e6).astype(np.int64)).astype("datetime64[us]")

    # roles: cycle user/assistant, ~15% tool turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = rng.random(n_total) < 0.15
    role[tool_mask] = "tool"
    tool = np.full(n_total, None, dtype=object)
    tool[tool_mask] = _TOOLS[rng.integers(0, len(_TOOLS), int(tool_mask.sum()))]

    # text: seeded token strings, length ~ lognormal(3, 0.6) tokens
    n_tok = np.maximum(1, rng.lognormal(1.6, 0.6, n_total).astype(np.int64))
    tok_flat = _VOCAB[rng.integers(0, len(_VOCAB), int(n_tok.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_tok)])
    text = np.array(
        [" ".join(tok_flat[bounds[i] : bounds[i + 1]]) for i in range(n_total)],
        dtype=object,
    )

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        },
        schema=TURNS,
    )


def write_turns(
    out_dir: str,
    n_convs: int = 1000,
    seed: int = 42,
    shards: int = 8,
    **kw,
) -> str:
    """Write a sharded turns dataset (one parquet file per shard) so the
    read stage parallelizes; deterministic per-shard seeds."""
    os.makedirs(out_dir, exist_ok=True)
    per = max(1, n_convs // shards)
    off = 0
    for s in range(shards):
        n = per if s < shards - 1 else n_convs - per * (shards - 1)
        if n <= 0:
            break
        tbl = generate_turns(n, seed=seed + s, conv_offset=off, **kw)
        pq.write_table(tbl, os.path.join(out_dir, f"turns-{s:04d}.parquet"))
        off += n
    return out_dir


def generate_documents(
    n_docs: int = 100_000,
    seed: int = 42,
    dup_frac: float = 0.05,
    near_dup_frac: float = 0.05,
) -> pa.Table:
    """Deterministic synthetic documents table (doc_id, text) with
    planted exact duplicates and near-duplicates (one token swapped) —
    benchmark/test corpus for the dedup/text stages.

    Vocabulary is wide (20k tokens) so unrelated documents are
    near-orthogonal in shingle space (real-corpus behavior — with a
    tiny vocab every pair has Jaccard ≈0.3 and LSH floods with false
    candidates)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)], dtype=object)
    n_tok = np.maximum(5, rng.lognormal(3.6, 0.5, n_docs).astype(np.int64))
    tok_flat = vocab[rng.integers(0, len(vocab), int(n_tok.sum()))]
    bounds = np.concatenate([[0], np.cumsum(n_tok)])
    texts = [
        " ".join(tok_flat[bounds[i] : bounds[i + 1]]) for i in range(n_docs)
    ]
    n_dup = int(n_docs * dup_frac)
    n_near = int(n_docs * near_dup_frac)
    src = rng.integers(0, n_docs - n_dup - n_near, n_dup + n_near)
    for j in range(n_dup):  # exact copies at the tail
        texts[n_docs - n_dup - n_near + j] = texts[src[j]]
    for j in range(n_near):  # near copies: one token replaced
        words = texts[src[n_dup + j]].split()
        words[int(rng.integers(0, len(words)))] = "mutated"
        texts[n_docs - n_near + j] = " ".join(words)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )


def regular_periodic(
    freq: float = 0.31, n: int = 500, T: float = 100.0, amplitudes=(1.0,), phase: float = 0.1
):
    """cesium-style regular periodic series fixture (FIXTURES.md F2;
    mirrors cesium/features/tests/util.py::regular_periodic semantics)."""
    t = np.linspace(0, T, n)
    m = np.zeros(n)
    for h, a in enumerate(amplitudes, start=1):
        m += a * np.sin(2 * np.pi * freq * h * t + phase)
    e = np.full(n, 1e-4)
    return t, m, e


def irregular_random(seed: int = 0, n: int = 500, T: float = 100.0):
    """cesium-style irregular random series fixture (FIXTURES.md F2)."""
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, T, n))
    m = rng.normal(0, 1, n)
    e = rng.uniform(0.1, 0.2, n)
    return t, m, e
