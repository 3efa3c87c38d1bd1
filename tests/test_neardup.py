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


def test_propagate_min_labels_matches_union_find_oracle():
    """Distributed label propagation == single-process union-find on a
    graph with chains (multi-round convergence) and singleton pairs."""
    import ray.data as rd
    import pyarrow as pa

    from bitquery_kafka_streams_rust_ray.stages.neardup import propagate_min_labels

    # chain 10-2-7-5-9 (diameter 4), triangle 20-21-22, pair 30-31
    pairs = [(10, 2), (2, 7), (7, 5), (5, 9), (20, 21), (21, 22),
             (20, 22), (30, 31)]
    ds = rd.from_arrow(pa.table({
        "id_a": [a for a, _ in pairs],
        "id_b": [b for _, b in pairs],
    }))
    labels = propagate_min_labels(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))

    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    want = {x: uf.find(x) for x in uf.parent}
    assert got == want


def test_minhash_dedup_matches_single_process_oracle():
    """The fully distributed minhash pipeline (joined verify + label
    propagation) keeps exactly the docs the single-process oracle
    (driver-side verify + union-find, the round-1 semantics) keeps."""
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.functions.text import jaccard, word_ngrams
    from bitquery_kafka_streams_rust_ray.stages.neardup import minhash_candidates

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(60):
        base = " ".join(rng.choice(words, size=30))
        texts.append(base)
        ids.append(2 * i)
        if i % 3 == 0:  # a near-dup with one word changed
            toks = base.split()
            toks[5] = "CHANGED"
            texts.append(" ".join(toks))
            ids.append(2 * i + 1)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = rd.from_pandas(df)

    kept = sorted(minhash_dedup(ds, jaccard_threshold=0.7)
                  .to_pandas()["doc_id"].tolist())

    # single-process oracle: same candidates, driver verify + union-find
    cand = minhash_candidates(rd.from_pandas(df)).to_pandas()
    text_of = dict(zip(df["doc_id"], df["text"]))
    verified = [
        (a, b) for a, b, same in
        zip(cand["id_a"], cand["id_b"], cand["same_sig"])
        if same or jaccard(word_ngrams(text_of[a], 3),
                           word_ngrams(text_of[b], 3)) >= 0.7
    ]
    losers = losers_from_pairs(verified)
    want = sorted(set(df["doc_id"]) - losers)
    assert kept == want


def test_component_labels_cutoff_paths_agree():
    """component_labels' one-task union-find path (below the pair-count
    cutoff) and distributed propagation path (above it) produce the
    same min-id labels."""
    import pyarrow as pa
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.stages.neardup import component_labels

    pairs = [(10, 2), (2, 7), (7, 5), (5, 9), (20, 21), (21, 22),
             (20, 22), (30, 31), (40, 40)]
    ds = rd.from_arrow(pa.table({
        "id_a": [a for a, _ in pairs],
        "id_b": [b for _, b in pairs],
    }))
    small = component_labels(ds, task_limit=1_000_000).to_pandas()
    large = component_labels(ds, task_limit=0).to_pandas()
    to_map = lambda df: dict(zip(df["node"], df["label"]))  # noqa: E731
    assert to_map(small) == to_map(large)
    assert to_map(small)[9] == 2 and to_map(small)[22] == 20


def test_containment_pairs_excerpt_detection(ray_session):
    """A short excerpt pasted inside a long document has LOW Jaccard
    but containment 1.0; two unrelated texts stay below threshold; an
    empty doc never pairs; blocks separate langs."""
    import pandas as pd
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.stages.neardup import (
        ngram_containment_pairs, ngram_jaccard_pairs)

    excerpt = "the quick brown fox jumps over the lazy dog"
    long_doc = ("intro paragraph with plenty of unrelated framing text "
                + excerpt +
                " and a long tail of additional commentary that keeps "
                "going on about entirely different topics for a while")
    rows = [
        {"doc_id": 1, "text": excerpt, "lang": "en"},
        {"doc_id": 2, "text": long_doc, "lang": "en"},
        {"doc_id": 3, "text": "completely different words here", "lang": "en"},
        {"doc_id": 4, "text": excerpt, "lang": "fr"},  # other block
        {"doc_id": 5, "text": "", "lang": "en"},       # empty: never pairs
    ]
    ds = rd.from_items(rows)
    out = ngram_containment_pairs(ds, threshold=0.95, block_col="lang")
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in pairs            # excerpt contained in long doc
    assert (1, 4) not in pairs        # cross-block never compared
    assert not any(5 in p for p in pairs)
    row = out[(out["id_a"] == 1) & (out["id_b"] == 2)].iloc[0]
    assert row["containment"] == 1.0
    assert row["inter"] == row["min_sz"]

    jac = ngram_jaccard_pairs(rd.from_items(rows), threshold=0.8,
                              block_col="lang")
    assert (1, 2) not in set(zip(jac["id_a"], jac["id_b"]))  # Jaccard misses it


def test_simhash_batch_matches_scalar():
    """simhash64_batch must be bit-identical per doc to the scalar
    reference, including empty / whitespace-only / null texts."""
    import pyarrow as pa
    from bitquery_kafka_streams_rust_ray.stages.neardup import simhash64_batch

    texts = [BASE, NEAR, FAR, "", "   ", None,
             "one", "Mixed CASE tokens repeat repeat repeat",
             "tab\tand\nnewline separated tokens"]
    got = simhash64_batch(pa.array(texts, pa.string()))
    want = [int(simhash64(t or "")) for t in texts]
    assert [int(x) for x in got] == want
