"""Text-analysis stages (training-data pipeline ops): language ID
(n-gram heuristic), quality scoring, token counting.

All are actor-pool ``map_batches`` stages: profiles/regexes compiled
once per actor in ``__init__``, vectorized pandas string kernels per
batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# tiny per-language stopword/char profiles for the n-gram heuristic —
# deterministic, dependency-free (the environment has no langid libs)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "por"},
    "it": {"il", "la", "di", "che", "e", "un", "per", "una", "con", "del"},
}


class LangId:
    """Stopword-overlap language classifier; 'und' when nothing matches."""

    def __init__(self, text_col: str = "text"):
        self.word = re.compile(r"[a-zà-ÿ]+", re.IGNORECASE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.text_col = text_col

    def classify(self, text: str) -> str:
        toks = set(self.word.findall(str(text).lower()))
        best, score = "und", 0
        for lang, stop in self.profiles.items():
            s = len(toks & stop)
            if s > score:
                best, score = lang, s
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["lang_pred"] = [self.classify(t) for t in df[self.text_col]]
        return df


class QualityScorer:
    """Heuristic document quality features: length, punctuation ratio,
    stopword ratio, alpha ratio, mean word length, repetition ratio."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"\S+")
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].astype(str)
        n_chars = t.str.len().to_numpy(np.float64)
        toks = t.str.findall(self.word)
        n_tok = toks.map(len).to_numpy(np.float64)
        out = pd.DataFrame(index=df.index)
        for c in df.columns:
            if c != self.text_col:
                out[c] = df[c]
        out["n_chars"] = n_chars.astype(np.int64)
        out["token_count"] = n_tok.astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out["mean_word_len"] = np.where(
                n_tok > 0, toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0), 0.0
            )
            out["punct_ratio"] = t.str.count(r"[^\w\s]").to_numpy(np.float64) / np.maximum(n_chars, 1)
            out["alpha_ratio"] = t.str.count(r"[A-Za-z]").to_numpy(np.float64) / np.maximum(n_chars, 1)
            out["stopword_ratio"] = toks.map(
                lambda ws: sum(w.lower() in self.stop for w in ws) / max(1, len(ws))
            ).astype(np.float64)
            out["repetition_ratio"] = toks.map(
                lambda ws: 1.0 - len(set(ws)) / max(1, len(ws))
            ).astype(np.float64)
        return out


def bpe_ish_token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Token counting: whitespace tokens + a BPE-ish regex split
    (GPT-2-style pattern: word pieces / numbers / punctuation runs)."""
    pat = re.compile(r"\w+|[^\w\s]+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        out = df.drop(columns=[text_col]).copy()
        out["ws_tokens"] = t.str.count(r"\S+").astype("int64")
        out["bpe_ish_tokens"] = t.str.findall(pat).map(len).astype("int64")
        return out

    return ds.map_batches(fn, batch_format="pandas")


def language_id(ds: ray.data.Dataset, concurrency=(1, 8), **kw) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency,
                          fn_constructor_kwargs=kw)


def quality_score(ds: ray.data.Dataset, concurrency=(1, 8), **kw) -> ray.data.Dataset:
    return ds.map_batches(QualityScorer, batch_format="pandas", concurrency=concurrency,
                          fn_constructor_kwargs=kw)
