"""Property pins for the vectorized chunking / featurize kernels: the
ListArray-grid + flat-gather implementations must agree with a naive
per-row Python reference on arbitrary inputs (empty texts, single
words, repeated separators — `string_split(' ')` semantics, where
doubled spaces yield empty tokens)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.usefixtures("ray_session")

words = st.text(alphabet="abcxyz ", min_size=0, max_size=40)
texts = st.lists(words, min_size=1, max_size=20)


def naive_chunks(doc_id, text, chunk=32, stride=24):
    ws = text.split(" ")
    out = []
    for ci, s in enumerate(range(0, len(ws), stride)):
        seg = ws[s:s + chunk]
        out.append((doc_id, ci, " ".join(seg), len(seg)))
    return out


@settings(deadline=None)
@given(texts=texts)
def test_chunk_kernel_matches_naive(texts, tmp_path_factory):
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    sf = str(tmp_path_factory.mktemp("chunk_prop"))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts,
                       "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    df.to_parquet(f"{sf}/documents.parquet")

    got = q.chunk_documents(sf)
    want = pd.DataFrame(
        [r for i, t in enumerate(texts) for r in naive_chunks(i, t)],
        columns=["doc_id", "chunk_idx", "chunk_text", "n_words"],
    ).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def naive_features(text, n_buckets=16):
    counts = [0] * n_buckets
    for w in text.split(" "):
        first = ord(w[0]) if w else 0
        counts[(first * 31 + len(w)) % n_buckets] += 1
    return counts


@settings(deadline=None)
@given(texts=texts)
def test_featurize_kernel_matches_naive(texts, tmp_path_factory):
    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    sf = str(tmp_path_factory.mktemp("feat_prop"))
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts,
                       "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    df.to_parquet(f"{sf}/documents.parquet")

    got = q.featurize_documents(sf)
    for i, t in enumerate(texts):
        row = got[got["doc_id"] == i].iloc[0]
        assert [int(row[f"f{j}"]) for j in range(16)] == naive_features(t), t
