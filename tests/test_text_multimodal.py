"""Text-analysis + multimodal-stub stage tests."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cesium_ray.stages.multimodal import MediaDecodeStub, decode_media, frame_sample
from cesium_ray.stages.text import (
    LangId,
    QualityScorer,
    bpe_ish_token_count,
    language_id,
    quality_score,
)


def test_langid():
    l = LangId()
    assert l.classify("the quick brown fox is in the garden and it is fine") == "en"
    assert l.classify("der hund ist nicht mit der katze und das ist gut") == "de"
    assert l.classify("xyzzy 12345 !!!") == "und"


def test_langid_stage():
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "the cat and the dog"},
         {"doc_id": 2, "text": "le chat et les chiens pour la vie"}]
    )
    out = language_id(ds).to_pandas().set_index("doc_id")["lang_pred"]
    assert out[1] == "en" and out[2] == "fr"


def test_quality_scorer():
    df = pd.DataFrame({"doc_id": [1], "text": ["The cat, the hat!! aa aa aa"]})
    out = QualityScorer()(df)
    assert out["token_count"].iloc[0] == 7
    assert 0 < out["punct_ratio"].iloc[0] < 0.5
    assert out["repetition_ratio"].iloc[0] > 0  # repeated 'aa'
    assert out["stopword_ratio"].iloc[0] > 0


def test_quality_stage_on_documents():
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    out = quality_score(ds).to_pandas()
    assert {"n_chars", "token_count", "punct_ratio", "stopword_ratio"} <= set(out.columns)
    assert len(out) == ds.count()


def test_token_count():
    ds = ray.data.from_items([{"doc_id": 1, "text": "hello, world! it's 42"}])
    out = bpe_ish_token_count(ds).to_pandas()
    assert out["ws_tokens"].iloc[0] == 4
    assert out["bpe_ish_tokens"].iloc[0] == 8  # hello , world ! it ' s 42


def test_media_decode_stub_deterministic():
    stub = MediaDecodeStub(feature_dim=4)
    f1 = stub._decode(b"payload-bytes")
    f2 = stub._decode(b"payload-bytes")
    np.testing.assert_array_equal(f1, f2)
    assert len(f1) == 4 and ((0 <= f1) & (f1 < 1)).all()


def test_media_decode_stage():
    rows = [{"media_id": i, "media_type": "image/png",
             "payload": bytes([i]) * 100} for i in range(10)]
    ds = ray.data.from_items(rows)
    out = decode_media(ds, feature_dim=4, batch_size=4).to_pandas()
    assert len(out) == 10
    assert "payload" not in out.columns
    assert all(len(f) == 4 for f in out["features"])


def test_real_decoder_gated():
    with pytest.raises(NotImplementedError):
        MediaDecodeStub(real_decoder=True)


def test_frame_sample():
    ds = ray.data.from_items([{"frame_idx": i, "v": i} for i in range(30)])
    out = frame_sample(ds, every_n=10).to_pandas()
    assert sorted(out["frame_idx"]) == [0, 10, 20]


def test_curate_documents_flags(ray_session):
    """Composite curation: exact dup, near dup, short doc, repetitive
    doc, and non-profile-language doc are dropped; clean docs kept."""
    import numpy as np
    import pandas as pd
    import ray.data

    from cesium_ray.pipelines.curate import curate_documents

    base = ("the data pipeline is that good and it works for a test "
            + " ".join(f"tok{i}" for i in range(60)))
    near = base[:-30] + " with a different ending here now"
    rows = [
        (0, base),                       # keeper
        (1, base),                       # exact dup of 0
        (2, near),                       # near dup of 0 (jaccard >= .7)
        (3, "short text"),               # too few tokens
        (4, ("spam " * 80).strip()),     # repetition_ratio ~ 1
        (5, "zzz qqq xxx vvv kkk " * 10),  # no stopwords -> 'und'
        (6, "the data engine is that good and it works for the test "
            "of a very long and unique document that should be kept "
            "in the final corpus because it is clean and it is long"),
    ]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.array([r[0] for r in rows], dtype=np.int64),
         "text": [r[1] for r in rows]}))
    out = (curate_documents(ds, num_partitions=4).to_pandas()
           .set_index("doc_id").sort_index())
    assert bool(out.loc[1, "is_exact_dup"]) and not bool(out.loc[0, "is_exact_dup"])
    assert bool(out.loc[2, "is_near_dup"]) and not bool(out.loc[2, "is_exact_dup"])
    assert not bool(out.loc[3, "keep"])          # short
    assert not bool(out.loc[4, "keep"])          # repetitive
    assert out.loc[5, "lang_pred"] == "und" and not bool(out.loc[5, "keep"])
    assert bool(out.loc[0, "keep"]) and bool(out.loc[6, "keep"])
