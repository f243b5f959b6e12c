"""Deduplication / text-analysis stage tests (training-data ops)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cesium_ray.stages.dedup import (
    exact_dedup,
    fingerprint_stage,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash64,
    simhash_stage,
)


@pytest.fixture(scope="module")
def docs_ds():
    base = "the quick brown fox jumps over the lazy dog " * 5
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},  # exact dup of 1
        {"doc_id": 3, "text": base.replace("lazy", "sleepy")},  # near-dup of 1
        {"doc_id": 4, "text": "completely different content about ray data engines " * 5},
        {"doc_id": 5, "text": "another unrelated document talking about parquet files " * 5},
    ]
    return ray.data.from_items(rows)


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds, num_partitions=4).to_pandas()
    assert len(out) == 4  # 5 docs, one exact dup collapsed
    kept = set(out.doc_id)
    assert 1 in kept and 2 not in kept


def test_minhash_lsh_finds_near_dup(docs_ds):
    pairs = minhash_lsh_dedup(docs_ds, jaccard_threshold=0.5, num_partitions=4).to_pandas()
    got = {(r.doc_id, r.dup_of) for r in pairs.itertuples()}
    assert (2, 1) in got  # exact dup found
    assert (3, 1) in got  # near dup found
    assert not any(d in (4, 5) for d, _ in got)  # unrelated docs untouched


def test_ngram_jaccard():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "uvwxyz") == 0.0
    assert 0 < ngram_jaccard("abcdefgh", "abcdefxy") < 1


def test_simhash_properties():
    a = simhash64("the quick brown fox".split())
    b = simhash64("the quick brown fox".split())
    c = simhash64("totally different words here".split())
    assert a == b
    ham_ac = bin(a ^ c).count("1")
    assert ham_ac > 0


def test_simhash_stage_near_dup_closer(docs_ds):
    out = simhash_stage(docs_ds).to_pandas().set_index("doc_id")["simhash"]
    d_near = bin(int(out[1]) ^ int(out[3])).count("1")
    d_far = bin(int(out[1]) ^ int(out[4])).count("1")
    assert d_near < d_far


def test_fingerprint_stage(docs_ds):
    out = fingerprint_stage(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "content_hash"] == out.loc[2, "content_hash"]
    assert out.loc[1, "content_hash"] != out.loc[4, "content_hash"]
    assert out.loc[1, "min_fingerprint"] == out.loc[2, "min_fingerprint"]


def test_dedup_on_testdata_documents():
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
    n = ds.count()
    out = exact_dedup(ds, num_partitions=4).to_pandas()
    assert len(out) <= n
    # parity with a pandas groupby
    pdf = ds.to_pandas()
    want = pdf.sort_values("doc_id").groupby("text", as_index=False).first()
    assert len(out) == len(want)


def test_synthetic_corpus_planted_dups():
    """generate_documents plants exact+near dups that the dedup
    stages recover; deterministic in seed."""
    import pyarrow as pa

    from cesium_ray.synth import generate_documents

    t1 = generate_documents(400, seed=11)
    t2 = generate_documents(400, seed=11)
    assert t1.equals(t2)
    ds = ray.data.from_arrow(t1)
    kept = exact_dedup(ds, num_partitions=4).to_pandas()
    assert len(kept) == 400 - 20  # 5% exact dups collapsed
    pairs = minhash_lsh_dedup(ds, jaccard_threshold=0.7, num_partitions=4).to_pandas()
    # all 20 exact-dup docs and most one-token near-dups found
    assert len(pairs) >= 35
    assert (pairs.est_jaccard >= 0.7).all()
