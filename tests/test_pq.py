"""Product quantization: layout invariance, reconstruction quality,
ADC recall, and the two-stage rerank pin (measured margins noted)."""

import numpy as np
import pyarrow.parquet as pq_
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.ann import (ann_brute_force,
                                                        _normalize)
from bitquery_kafka_streams_rust_ray.stages.pq import (pq_encode, pq_topk,
                                                       pq_topk_rerank,
                                                       train_pq_codebooks)

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    t = pq_.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(7)
    Q = X[rng.choice(len(X), 8, replace=False)] \
        + rng.standard_normal((8, X.shape[1])) * 0.01
    return X, Q


def _ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _codes_frame(codes_ds):
    df = codes_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return df["vec_id"].tolist(), [tuple(c) for c in df["codes"]]


def test_encode_layout_invariant():
    """Codes are a pure function of (ids, vectors): training samples by
    id hash and encoding is per-row, so block layout must not matter."""
    ids_a, codes_a = _codes_frame(pq_encode(_ds())[0])
    ids_b, codes_b = _codes_frame(pq_encode(_ds().repartition(7))[0])
    assert ids_a == ids_b
    assert codes_a == codes_b


def test_reconstruction_beats_grid(corpus):
    """Learned codebooks must explain most of the variance: MSE of the
    PQ reconstruction <= 0.2x the per-component energy (measured 0.105
    at both sf0.001 and sf0.01 with m=8, ksub=256)."""
    X, _ = corpus
    codes_ds, books = pq_encode(_ds())
    df = codes_ds.to_pandas().sort_values("vec_id")
    C = np.asarray(df["codes"].tolist(), dtype=np.int64)
    m = books.shape[0]
    rec = np.concatenate([books[s][C[:, s]] for s in range(m)], axis=1)
    Xn = _normalize(X)
    assert ((Xn - rec) ** 2).mean() <= 0.2 * (Xn ** 2).mean()


def test_adc_recall_and_rerank_pin(corpus):
    """Quality pins at the documented operating point (m=8, ksub=256,
    8-byte codes = 32x compression): raw ADC recall@10 >= 0.6 (measured
    0.675 sf0.001 / 0.738 sf0.01), and the production two-stage path —
    ADC shortlist 5k + exact rerank — >= 0.9 (measured 0.988 at both
    scales). The rerank is the shipped answer to lossy-code recall, the
    same stage IVFADC+R adds."""
    _, Q = corpus
    exact = ann_brute_force(_ds(), Q, k=10)
    codes_ds, books = pq_encode(_ds())
    codes_ds = codes_ds.materialize()

    def recall(approx):
        r = []
        for qi in range(len(Q)):
            e = set(exact[exact.query_id == qi]["vec_id"])
            a = set(approx[approx.query_id == qi]["vec_id"])
            r.append(len(e & a) / len(e))
        return float(np.mean(r))

    assert recall(pq_topk(codes_ds, books, Q, k=10)) >= 0.6
    reranked = pq_topk_rerank(_ds(), codes_ds, books, Q, k=10)
    assert recall(reranked) >= 0.9
    # rerank scores are EXACT for returned ids: they must equal the
    # brute-force score wherever the id sets intersect
    merged = reranked.merge(exact, on=["query_id", "vec_id"],
                            suffixes=("_pq", "_exact"))
    assert len(merged) > 0
    np.testing.assert_allclose(merged["score_pq"], merged["score_exact"],
                               atol=1e-8)


def test_train_rejects_indivisible_dim():
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(np.zeros((32, 10)), m=3)


def test_encoder_empty_batch():
    """Zero-row batches pass through with the right schema (the empty
    final block every streaming run eventually produces)."""
    import pyarrow as pa
    import ray

    from bitquery_kafka_streams_rust_ray.stages.pq import _PqEncoder

    books = train_pq_codebooks(np.random.default_rng(0)
                               .standard_normal((64, 16)), m=4, ksub=4)
    enc = _PqEncoder(ray.put(books), "embedding", "vec_id")
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
    out = enc(empty)
    assert out.num_rows == 0
    assert out.column_names == ["vec_id", "codes"]


def test_ivfpq_recall_and_exact_scores(corpus):
    """End-to-end IVFADC+R pin: probed-lists ADC shortlist + exact
    rerank keeps recall@10 >= 0.9 vs brute force, and every returned
    score is exact. nprobe=nlist degrades to the plain rerank path, so
    the probe filter is the only recall dial being exercised."""
    from bitquery_kafka_streams_rust_ray.stages.pq import ivfpq_topk_rerank

    _, Q = corpus
    exact = ann_brute_force(_ds(), Q, k=10)
    got = ivfpq_topk_rerank(_ds(), Q, k=10, nlist=16, nprobe=12,
                            m=8, ksub=256)

    r = []
    for qi in range(len(Q)):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(got[got.query_id == qi]["vec_id"])
        r.append(len(e & a) / len(e))
    assert float(np.mean(r)) >= 0.9, r
    merged = got.merge(exact, on=["query_id", "vec_id"],
                       suffixes=("_pq", "_exact"))
    assert len(merged) > 0
    np.testing.assert_allclose(merged["score_pq"], merged["score_exact"],
                               atol=1e-8)
