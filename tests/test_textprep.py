"""Text-prep operators (stages/textprep.py): redaction, chunking,
repetition scoring, JSON field extraction."""

import numpy as np
import pandas as pd
import ray.data


def test_redact_planted_pii(ray_session):
    from cesium_ray.stages.textprep import redact

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail bob@example.com or visit https://x.io/a?b=1 room 42",
            "no pii at all",
            "twice 1 and 2 and a@b.c d@e.f",
            "url http://h.com/p123 hides its digits",
        ],
    })
    got = (redact(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "clean_text"] == "mail <EMAIL> or visit <URL> room <NUM>"
    assert (got.loc[0, ["n_urls", "n_emails", "n_numbers"]] == [1, 1, 1]).all()
    assert got.loc[1, "clean_text"] == "no pii at all"
    assert (got.loc[2, ["n_urls", "n_emails", "n_numbers"]] == [0, 2, 2]).all()
    # digits inside the URL are redacted as part of the URL, not counted
    assert got.loc[3, "n_numbers"] == 0
    assert got.loc[3, "clean_text"] == "url <URL> hides its digits"


def test_chunks_reassemble_to_original(ray_session):
    from cesium_ray.stages.textprep import chunk_documents

    rng = np.random.default_rng(0)
    texts = ["".join(rng.choice(list("abcdefgh "), rng.integers(1, 400)))
             for _ in range(60)]
    texts += ["x" * 120, "y" * 121, "z" * 90, "w"]  # boundary lengths
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (chunk_documents(ray.data.from_pandas(df).repartition(4),
                           size=120, stride=90).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]))
    for did, g in got.groupby("doc_id"):
        orig = texts[did]
        # stitch: first chunk + tail (size-stride overlap) of each next
        rebuilt = g["chunk_text"].iloc[0]
        for c in g["chunk_text"].iloc[1:]:
            rebuilt = rebuilt[: len(rebuilt) - (120 - 90)] + c
        assert rebuilt == orig, did
        assert (g["chunk_len"] == g["chunk_text"].str.len()).all()
        # every chunk except possibly the last is full-size
        assert (g["chunk_len"].iloc[:-1] == 120).all()


def test_repetition_scores_bruteforce(ray_session):
    from cesium_ray.stages.textprep import repetition_score

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a b", "x y z", "q  q"],  # double space → empty token
    })
    got = (repetition_score(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_tokens"]) == [4, 3, 3]
    assert list(got["n_distinct"]) == [2, 3, 2]
    assert got.loc[0, "top_token_frac"] == 0.75
    assert got.loc[1, "dup_ratio"] == 0.0
    assert got.loc[2, "n_distinct"] == 2  # {"q", ""}


def test_extract_json_field(ray_session):
    from cesium_ray.stages.textprep import extract_json_field

    df = pd.DataFrame({"props": ['{"k": 7}', '{"j": 1}', '{"k": 123}']})
    got = (extract_json_field(ray.data.from_pandas(df), col="props")
           .to_pandas())
    assert got["k"].tolist()[0] == 7
    assert pd.isna(got["k"].tolist()[1])
    assert got["k"].tolist()[2] == 123


def test_chunk_documents_null_text(ray_session):
    import pyarrow as pa

    from cesium_ray.stages.textprep import chunk_documents

    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(["hello world", None, "x" * 300],
                                     pa.string())})
    got = (chunk_documents(ray.data.from_arrow(tbl), size=120, stride=90)
           .to_pandas())
    # null doc emits exactly one (null) chunk; others chunk normally
    assert (got.groupby("doc_id").size() == [1, 1, 3]).all()
    assert got.loc[got["doc_id"] == 1, "chunk_text"].isna().all()


def test_canonicalize_text_rules():
    import pandas as pd

    from cesium_ray.stages.text import canonicalize_text

    got = canonicalize_text(pd.Series([
        "  Hello,   WORLD!!  ",
        "hello world",
        "A\tB\nC...",
        "",
        "!!!",
    ])).tolist()
    assert got == ["hello world", "hello world", "a b c", "", ""]


def test_readability_known_answers(ray_session):
    """Flesch components on hand-checkable sentences; more complex
    text scores lower."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cesium_ray.stages.text import readability

    simple = "The cat sat. The dog ran. It was fun."
    complex_ = ("Notwithstanding considerable organizational "
                "sophistication, interdepartmental miscommunication "
                "proliferated extraordinarily.")
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1, 2], dtype=np.int64),
         "text": [simple, complex_]}))
    out = readability(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 9
    assert out.loc[1, "n_sentences"] == 3
    # "the cat sat" -> e,a,a ... count vowel groups by hand: the(1)
    # cat(1) sat(1) the(1) dog(1) ran(1) it(1) was(1) fun(1) = 9
    assert out.loc[1, "n_syllables"] == 9
    assert out.loc[1, "flesch"] > 90
    assert out.loc[2, "flesch"] < 0
