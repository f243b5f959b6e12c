"""Text-prep operators for training-data curation: sliding-window
chunking (the RAG/context-packing splitter), PII redaction, in-doc
repetition scoring, and semi-structured JSON field extraction.

All four are stateless vectorized ``map_batches`` transforms — no
shuffle at all; chunking is the only fan-out (flat_map-shaped, done
as one vectorized slice pass per chunk index, not a per-row loop).

Regex parity: pyarrow.compute's regex kernels are RE2 — the SAME
engine DuckDB uses — so the redaction / extraction oracles match the
engine byte-for-byte with identical patterns (no Python-re Unicode
class drift; see ADVICE r2 on QualityScorer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# applied in THIS order; later patterns see earlier placeholders
REDACT_RULES = (
    ("n_urls", r"https?://[^ ]+", "<URL>"),
    ("n_emails", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
    ("n_numbers", r"[0-9]+", "<NUM>"),
)


def redact(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Scrub URLs → emails → digit runs (sequentially, so counts are
    measured on the text as each rule sees it) and return
    (id, clean_text, n_urls, n_emails, n_numbers)."""

    def fn(tbl: pa.Table) -> pa.Table:
        s = tbl[col]
        cols = {id_col: tbl[id_col]}
        counts = {}
        for name, pat, repl in REDACT_RULES:
            counts[name] = pc.count_substring_regex(s, pattern=pat)
            s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
        cols["clean_text"] = s
        for name, _, _ in REDACT_RULES:
            cols[name] = pc.cast(counts[name], pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    size: int = 120,
    stride: int = 90,
    col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Character-window chunking with overlap: chunk i covers
    [i·stride, i·stride + size); the last chunk starts at the largest
    i·stride < len (every doc emits ≥1 chunk).  Vectorized as one
    ``utf8_slice_codeunits`` pass per chunk index over the docs still
    long enough — no per-row Python."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def fn(tbl: pa.Table) -> pa.Table:
        text = tbl[col].combine_chunks()
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        ln = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        # null text → NaN length; emit exactly one (null) chunk rather
        # than feeding NaN into the int cast (undefined result)
        ln = np.nan_to_num(ln.astype(np.float64), nan=0.0)
        n_chunks = np.maximum(
            1, np.ceil(np.maximum(ln - size, 0) / stride).astype(np.int64) + 1
        )
        out_ids, out_idx, out_chunks = [], [], []
        for ci in range(int(n_chunks.max()) if len(n_chunks) else 0):
            sel = np.flatnonzero(n_chunks > ci)
            sub = text.take(pa.array(sel, pa.int64()))
            sl = pc.utf8_slice_codeunits(
                sub, start=ci * stride, stop=ci * stride + size)
            out_ids.append(ids[sel])
            out_idx.append(np.full(len(sel), ci, np.int64))
            out_chunks.append(sl)
        if not out_ids:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "chunk_len": pa.array([], pa.int64())})
        chunk_arr = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in out_chunks])
        return pa.table({
            id_col: pa.array(np.concatenate(out_ids)),
            "chunk_idx": pa.array(np.concatenate(out_idx)),
            "chunk_text": chunk_arr,
            "chunk_len": pc.cast(pc.utf8_length(chunk_arr), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_score(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> ray.data.Dataset:
    """Per doc: token count, distinct-token count, duplicate-token
    ratio (1 − distinct/total) and top-token frequency fraction — the
    cheap in-document repetition signals.  Split semantics mirror SQL
    ``string_split`` (consecutive separators yield empty tokens).
    Vectorized: one whole-batch split + factorize + lexsort/reduceat,
    no per-doc loop."""

    def fn(tbl: pa.Table) -> pa.Table:
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(tbl[col].combine_chunks(), pattern=sep)
        lc = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = lc.offsets.to_numpy(zero_copy_only=False)
        flat = lc.flatten()
        n_tok = np.diff(offsets).astype(np.int64)
        doc_gid = np.repeat(np.arange(len(ids)), n_tok)
        codes = pd.factorize(flat.to_numpy(zero_copy_only=False))[0]
        pair = doc_gid * (codes.max() + 1 if len(codes) else 1) + codes
        order = np.argsort(pair, kind="stable")
        sp = pair[order]
        newp = np.r_[True, sp[1:] != sp[:-1]] if len(sp) else np.zeros(0, bool)
        starts = np.flatnonzero(newp)
        mult = np.r_[starts[1:], len(sp)] - starts  # per (doc, token) count
        pair_doc = doc_gid[order][starts]
        n_distinct = np.bincount(pair_doc, minlength=len(ids)).astype(np.int64)
        top = np.zeros(len(ids), np.int64)
        np.maximum.at(top, pair_doc, mult)
        with np.errstate(invalid="ignore", divide="ignore"):
            dup_ratio = 1.0 - n_distinct / n_tok.astype(np.float64)
            top_frac = top / n_tok.astype(np.float64)
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_distinct),
            "dup_ratio": pa.array(dup_ratio, pa.float64()),
            "top_token_frac": pa.array(top_frac, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_json_field(
    ds: ray.data.Dataset,
    col: str = "props",
    field: str = "k",
) -> ray.data.Dataset:
    """Pull an integer field out of a JSON-ish string column with one
    RE2 pass (``"field": (\\d+)``) — the cheap semi-structured
    projection; rows without the field yield null."""
    pat = '"' + field + '": (?P<v>[0-9]+)'

    def fn(tbl: pa.Table) -> pa.Table:
        m = pc.extract_regex(tbl[col], pattern=pat)
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return tbl.append_column(field, v)

    return ds.map_batches(fn, batch_format="pyarrow")
