"""Near-dup family: MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.neardup import (
    UnionFind,
    embedding_dedup,
    hamming64,
    losers_from_pairs,
    minhash_dedup,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_dedup,
    _perm_params,
)

pytestmark = pytest.mark.usefixtures("ray_session")

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the morning light"
)
NEAR = BASE.replace("morning", "evening")
FAR = "completely different content about databases and distributed systems design"


def docs_df():
    return pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [BASE, NEAR, FAR, BASE + " extra", "unrelated short text"],
        }
    )


def test_minhash_signature_similarity():
    a, b = _perm_params(128, seed=7)
    s1 = minhash_signature(BASE, a, b)
    s2 = minhash_signature(NEAR, a, b)
    s3 = minhash_signature(FAR, a, b)
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > 0.7 > sim13


def test_minhash_dedup_removes_near_dups():
    ds = rd.from_pandas(docs_df())
    kept = minhash_dedup(ds, jaccard_threshold=0.7).to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    # 1,2,4 are a near-dup cluster -> keep min id 1; 3 and 5 unaffected
    assert ids == [1, 3, 5]


def test_simhash_properties():
    h1, h2, h3 = simhash64(BASE), simhash64(NEAR), simhash64(FAR)
    assert simhash64(BASE) == h1  # deterministic
    assert hamming64(h1, h2) < hamming64(h1, h3)


def test_simhash_dedup():
    ds = rd.from_pandas(docs_df())
    kept = simhash_dedup(ds, max_hamming=3).to_pandas()
    ids = sorted(kept["doc_id"].tolist())
    assert 1 in ids and 3 in ids and 5 in ids
    assert 2 not in ids  # one-word change -> tiny hamming distance


def test_ngram_jaccard_pairs():
    ds = rd.from_pandas(docs_df())
    pairs = ngram_jaccard_pairs(ds, threshold=0.7)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in got and (1, 4) in got
    assert not any(3 in p or 5 in p for p in got)


def test_union_find_deterministic():
    assert losers_from_pairs([(3, 1), (1, 2), (7, 8)]) == {2, 3, 8}
    uf = UnionFind()
    uf.union("b", "a")
    uf.union("c", "b")
    assert uf.find("c") == "a"


def test_embedding_dedup():
    rng = np.random.default_rng(2)
    base = rng.standard_normal(16)
    near = base + rng.standard_normal(16) * 0.001
    far = rng.standard_normal(16)
    df = pd.DataFrame(
        {
            "vec_id": [10, 11, 12],
            "embedding": [base.tolist(), near.tolist(), far.tolist()],
        }
    )
    kept = embedding_dedup(rd.from_pandas(df), threshold=0.99).to_pandas()
    assert sorted(kept["vec_id"].tolist()) == [10, 12]
