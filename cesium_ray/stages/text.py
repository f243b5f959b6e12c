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
    """Stopword-overlap language classifier; 'und' when nothing matches.

    Score = number of DISTINCT profile stopwords present as whole
    words.  Vectorized: one compiled whole-word regex per stopword
    (50 total), each a C-speed ``str.contains`` pass over the batch —
    no per-row Python in ``__call__`` (``classify`` kept for
    single-string API use)."""

    def __init__(self, text_col: str = "text"):
        self.word = re.compile(r"[a-zà-ÿ]+", re.IGNORECASE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.langs = list(_LANG_PROFILES)
        self.word_res = {
            lang: [re.compile(rf"(?<![a-zà-ÿ]){re.escape(w)}(?![a-zà-ÿ])")
                   for w in sorted(stop)]
            for lang, stop in _LANG_PROFILES.items()
        }
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
        low = df[self.text_col].astype(str).str.lower()
        scores = np.zeros((len(df), len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for rx in self.word_res[lang]:
                scores[:, j] += low.str.contains(rx, regex=True).to_numpy()
        best = np.asarray(self.langs + ["und"], dtype=object)[
            np.where(scores.max(axis=1) > 0, scores.argmax(axis=1), len(self.langs))
        ]
        df["lang_pred"] = best
        return df


class QualityScorer:
    """Heuristic document quality features: length, punctuation ratio,
    stopword ratio, alpha ratio, mean word length, repetition ratio.

    Fully vectorized pandas/C-regex kernels (no per-row ``.map(lambda)``
    in the ratio math — this stage runs on every document at 100 TB):
    mean word length = non-whitespace chars / tokens; stopword hits via
    one whole-token alternation regex; distinct-token counts via
    explode + grouped nunique."""

    # Explicit ASCII character classes (not \S/\w/\s) so the engine's
    # Python-regex semantics match DuckDB/RE2's ASCII-only classes in
    # QUALITY_SQL on non-ASCII input (e.g. U+00A0, Unicode letters).
    _WS = " \\t\\n\\r\\f\\v"
    _NONWS = f"[^{_WS}]"
    _WORDCH = "0-9A-Za-z_"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # whole-token stopword match: a token is a maximal nonws+ run,
        # so (?<!nonws)word(?!nonws) ≡ "token == word"
        alt = "|".join(sorted(_LANG_PROFILES["en"]))
        self.stop_re = re.compile(
            rf"(?<![^{self._WS}])(?:{alt})(?![^{self._WS}])")
        self.word = re.compile(self._NONWS + "+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = df[self.text_col].astype(str)
        n_chars = t.str.len().to_numpy(np.int64)
        n_tok = t.str.count(self._NONWS + "+").to_numpy(np.int64)
        nonws = t.str.count(self._NONWS).to_numpy(np.int64)
        out = pd.DataFrame(index=df.index)
        for c in df.columns:
            if c != self.text_col:
                out[c] = df[c]
        out["n_chars"] = n_chars
        out["token_count"] = n_tok
        denom_c = np.maximum(n_chars, 1).astype(np.float64)
        denom_t = np.maximum(n_tok, 1).astype(np.float64)
        out["mean_word_len"] = np.where(n_tok > 0, nonws / denom_t, 0.0)
        out["punct_ratio"] = (
            t.str.count(f"[^{self._WORDCH}{self._WS}]").to_numpy(np.float64)
            / denom_c)
        out["alpha_ratio"] = t.str.count(r"[A-Za-z]").to_numpy(np.float64) / denom_c
        out["stopword_ratio"] = (
            t.str.lower().str.count(self.stop_re).to_numpy(np.float64) / denom_t
        )
        # distinct tokens per row without per-row Python: explode the
        # token lists once, grouped nunique (C-speed hash agg)
        toks = t.str.findall(self.word)
        nun = toks.explode().groupby(level=0).nunique()
        nun = nun.reindex(toks.index, fill_value=0).to_numpy(np.float64)
        out["repetition_ratio"] = 1.0 - nun / denom_t
        return out


def bpe_ish_token_count(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Token counting: whitespace tokens + a BPE-ish regex split
    (GPT-2-style pattern: word pieces / numbers / punctuation runs)."""
    pat = re.compile(r"\w+|[^\w\s]+")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        out = df.drop(columns=[text_col]).copy()
        out["ws_tokens"] = t.str.count(r"\S+").astype("int64")
        # count matches without materializing per-row token lists
        out["bpe_ish_tokens"] = t.str.count(pat).astype("int64")
        return out

    return ds.map_batches(fn, batch_format="pandas")


def language_id(ds: ray.data.Dataset, concurrency=(1, 8), **kw) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency,
                          fn_constructor_kwargs=kw)


def quality_score(ds: ray.data.Dataset, concurrency=(1, 8), **kw) -> ray.data.Dataset:
    return ds.map_batches(QualityScorer, batch_format="pandas", concurrency=concurrency,
                          fn_constructor_kwargs=kw)


_PUNCT_RE = r"[!-/:-@\[-`{-~]"          # ASCII punctuation ranges
_WS_RE = r"[ \t\n\r\f\v]+"              # explicit ASCII whitespace


def canonicalize_text(s: pd.Series) -> pd.Series:
    """Casefold + strip-punctuation + collapse-whitespace canonical
    form, the usual key for near-trivial duplicate collapse ("Hello,
    world!" ≡ "hello   world").  Explicit ASCII classes (not \\w/\\s)
    keep Python-regex byte-identical to DuckDB/RE2's
    ``lower → regexp_replace → trim`` twin on ASCII input (same
    precondition as QualityScorer, documented there)."""
    return (s.str.lower()
             .str.replace(_PUNCT_RE, "", regex=True)
             .str.replace(_WS_RE, " ", regex=True)
             .str.strip(" "))


_WORD_RE = re.compile(r"\S+")
_SENT_RE = re.compile(r"[.!?]+")
_SYL_RE = re.compile(r"[aeiouy]+")


def readability(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Flesch reading-ease per document — the classic curation signal
    for filtering gibberish/boilerplate from a training corpus:
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    syllables approximated as [aeiouy]+ vowel groups (whitespace
    breaks groups, so the global count equals the per-word sum) and
    sentences as [.!?]+ runs (min 1).  Counts are exact ints from the
    same regex semantics DuckDB's RE2 applies, so the SQL twin matches
    bit-for-bit; stateless vectorized map."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].astype(str)
        words = texts.map(lambda t: len(_WORD_RE.findall(t))).to_numpy(
            np.int64)
        sents = np.maximum(
            texts.map(lambda t: len(_SENT_RE.findall(t))).to_numpy(
                np.int64), 1)
        syls = texts.map(
            lambda t: len(_SYL_RE.findall(t.lower()))).to_numpy(np.int64)
        w = np.maximum(words, 1)
        flesch = (206.835 - 1.015 * (words / sents)
                  - 84.6 * (syls / w))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "n_words": words,
            "n_sentences": sents,
            "n_syllables": syls,
            "flesch": flesch,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")


def cohen_kappa_langid(
    ds: ray.data.Dataset,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Cohen's κ between the corpus's labeled language and the
    language_id heuristic's prediction — chance-corrected
    agreement over the confusion matrix, the honest version of
    the raw accuracy a skewed-language corpus inflates
    (κ = (p_o − p_e)/(1 − p_e)).

    The predictor is the existing count-based LangId stage (SQL-
    exact); confusion cells, the diagonal and the row×column
    chance products are exact int64/Python-int, and κ is the one
    mirrored closing."""
    pred = language_id(ds.select_columns([id_col, text_col])) \
        .to_pandas()[[id_col, "lang_pred"]]
    truth = ds.select_columns([id_col, lang_col]).to_pandas()
    j = truth.merge(pred, on=id_col)
    cols = {"n_docs": pd.Series(dtype="int64"),
            "n_agree": pd.Series(dtype="int64"),
            "accuracy": pd.Series(dtype="float64"),
            "kappa": pd.Series(dtype="float64")}
    if j.empty:
        return pd.DataFrame(cols)
    n = len(j)
    agree = int((j[lang_col].to_numpy(object)
                 == j["lang_pred"].to_numpy(object)).sum())
    rows = j.groupby(lang_col).size()
    colc = j.groupby("lang_pred").size()
    pe_num = sum(int(rows.get(c, 0)) * int(colc.get(c, 0))
                 for c in sorted(set(rows.index) | set(colc.index)))
    po = float(agree) / float(n)
    pe = float(pe_num) / (float(n) * float(n))
    if pe >= 1.0:
        return pd.DataFrame(cols)
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "n_agree": np.array([agree], np.int64),
        "accuracy": [po],
        "kappa": [(po - pe) / (1.0 - pe)]})
