"""ANN: brute-force cosine top-k vs numpy oracle; IVF recall sanity."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.ann import (
    ann_brute_force,
    ann_ivf,
    train_centroids,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(9)
    n, d = 400, 24
    embs = rng.standard_normal((n, d))
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [v.tolist() for v in embs]}
    )
    queries = rng.standard_normal((5, d))
    return df, embs, queries


def numpy_topk(embs, queries, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    scores = qn @ en.T
    out = {}
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(len(embs)), -scores[qi]))[:k]
        out[qi] = list(order)
    return out


def test_brute_force_matches_numpy(vectors):
    df, embs, queries = vectors
    got = ann_brute_force(rd.from_pandas(df), queries, k=10)
    want = numpy_topk(embs, queries, 10)
    for qi in range(len(queries)):
        ids = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert ids == want[qi], f"query {qi}"


def test_brute_force_scores_are_cosine(vectors):
    df, embs, queries = vectors
    got = ann_brute_force(rd.from_pandas(df), queries, k=3)
    row = got.iloc[0]
    q = queries[int(row["query_id"])]
    v = embs[int(row["vec_id"])]
    cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
    assert abs(cos - row["score"]) < 1e-6


def _mean_recall(df, queries, nlist, nprobe, exact=None):
    ds = rd.from_pandas(df) if isinstance(df, pd.DataFrame) else df
    if exact is None:
        exact = ann_brute_force(ds, queries, k=10)
    approx = ann_ivf(ds, queries, k=10, nlist=nlist, nprobe=nprobe)
    recalls = []
    for qi in range(len(queries)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    return float(np.mean(recalls))


def test_ivf_recall(vectors):
    """Quality pin at the retrieval operating point: recall@10 >= 0.9.
    The vectors are isotropic gaussian — IVF's worst case (no cluster
    structure), so the probed fraction is the recall dial; 6/8 lists
    clears 0.9 with margin (measured 0.92-0.94)."""
    df, embs, queries = vectors
    assert _mean_recall(df, queries, nlist=8, nprobe=6) >= 0.9


def test_ivf_low_nprobe_speed_point(vectors):
    """The documented speed/recall trade: probing 1/4 of the lists
    scores ~1/4 of the corpus and still finds over 40% of the true
    top-10 on structureless data (real clustered corpora do far
    better). Guards the dial's low end from silently collapsing."""
    df, embs, queries = vectors
    exact = ann_brute_force(rd.from_pandas(df), queries, k=10)
    low = _mean_recall(df, queries, nlist=8, nprobe=2, exact=exact)
    high = _mean_recall(df, queries, nlist=8, nprobe=6, exact=exact)
    assert 0.4 <= low < high


def test_train_centroids_deterministic(vectors):
    _, embs, _ = vectors
    c1 = train_centroids(embs, nlist=8, seed=5)
    c2 = train_centroids(embs, nlist=8, seed=5)
    np.testing.assert_array_equal(c1, c2)


def _sf_recall(sf: str) -> float:
    import os

    if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
        pytest.skip(f"testdata {sf} not present")
    ds = rd.read_parquet(os.path.join(sf, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    head = sorted(ds.take(5), key=lambda r: r["vec_id"])
    queries = np.asarray([r["embedding"] for r in head], dtype=np.float64)
    return _mean_recall(ds, queries, nlist=16, nprobe=12)


def test_ivf_recall_on_sf001_embeddings():
    """Quality pin on the real testdata: IVF with the query wrapper's
    own parameters (nlist=16, nprobe=12) must reach recall@10 >= 0.9
    against brute force on the sf0.01 embeddings table (measured
    0.96)."""
    assert _sf_recall("/root/testdata/sf0.01") >= 0.9


def test_ivf_recall_on_sf01():
    """The same >=0.9 pin must hold at 10x the corpus (sf0.1, measured
    0.96) — recall may not be an artifact of the small table."""
    assert _sf_recall("/root/testdata/sf0.1") >= 0.9


def test_similarity_join_matches_numpy(vectors):
    from bitquery_kafka_streams_rust_ray.stages.ann import similarity_join

    df, embs, _ = vectors
    ref_ids = np.arange(8, dtype=np.int64)
    ref = embs[:8]
    got = (similarity_join(rd.from_pandas(df), ref_ids, ref)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    rn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    want = (en @ rn.T).argmax(axis=1)
    assert got["ref_id"].tolist() == [int(ref_ids[i]) for i in want]
    # each row's score is the cosine against its chosen reference
    row = got.iloc[13]
    cos = float(en[int(row["vec_id"])] @ rn[int(row["ref_id"])])
    assert abs(cos - row["score"]) < 1e-6


def test_quantization_preserves_neighbors():
    """int8 quantization quality: per-component reconstruction error is
    bounded by scale/2, and brute-force top-10 neighbors over the
    DEQUANTIZED corpus overlap >= 0.9 with the float top-10 — the
    compressed corpus is still retrieval-grade."""
    import os

    from bitquery_kafka_streams_rust_ray.pipelines.queries import quantize_embeddings

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
        pytest.skip(f"testdata {sf} not present")
    q = quantize_embeddings(sf)
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    emb = emb.set_index("vec_id").loc[q["vec_id"]]
    orig = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    scales = q["scale_e6"].to_numpy() / 1e6
    qv = np.asarray([[int(x) for x in s.split(",")] for s in q["q_int8"]],
                    dtype=np.float64)
    deq = qv * scales[:, None]
    # reconstruction: |orig - deq| <= scale/2 + quantized-scale slack
    bound = (scales * 0.5 + 1e-6 * 127)[:, None]
    assert np.all(np.abs(orig - deq) <= bound)

    # neighbor preservation: float vs dequant top-10 per query
    queries = orig[:5]
    exact = numpy_topk(orig, queries, 10)
    approx = numpy_topk(deq, queries, 10)
    overlaps = [len(set(exact[i]) & set(approx[i])) / 10 for i in range(5)]
    assert np.mean(overlaps) >= 0.9, overlaps
