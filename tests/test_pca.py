"""Pins for the distributed PCA stage (stages/pca.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from bitquery_kafka_streams_rust_ray.stages.pca import pca_fit, pca_project

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _ds():
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _numpy_corpus():
    df = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    x = np.stack(df["embedding"].to_numpy())
    xq = np.floor(x.astype(np.float64) * 1e6 + 0.5)
    return df["vec_id"].to_numpy(), xq


def test_components_orthonormal_and_variance_conserved():
    model = pca_fit(_ds(), k=4)
    comps = model["components"]
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(len(comps)), atol=1e-9)
    # explained ratios are a decreasing prefix of a distribution
    r = model["explained_ratio"]
    assert (np.diff(r) <= 1e-12).all() and (r > 0).all() and r.sum() <= 1 + 1e-9
    # covariance trace equals total variance of the quantized corpus —
    # a wrong Sm cell or a mis-scaled divide would break this equality
    _, xq = _numpy_corpus()
    total = ((xq - xq.mean(axis=0)) ** 2).mean(axis=0).sum()
    assert model["total_var"] == pytest.approx(total, rel=1e-9)
    assert model["n"] == len(xq)


def test_matches_numpy_reference():
    """The distributed fit equals a single-process numpy PCA on the
    same quantized corpus (same covariance, same eigensolver)."""
    model = pca_fit(_ds(), k=3)
    _, xq = _numpy_corpus()
    mean = xq.mean(axis=0)
    cov = (xq.T @ xq) / len(xq) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    want = evecs[:, order].T
    for i in range(3):
        piv = int(np.argmax(np.abs(want[i])))
        if want[i, piv] < 0:
            want[i] = -want[i]
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], want, atol=1e-8)


def test_layout_invariance():
    """Bit-identical fit on a repartitioned input — the moment partials
    are exact ints, so block layout cannot move the covariance."""
    a = pca_fit(_ds(), k=2)
    b = pca_fit(_ds().repartition(7), k=2)
    assert np.array_equal(a["mean"], b["mean"])
    assert np.array_equal(a["components"], b["components"])


def test_projection_reconstruction_improves_with_k():
    ids, xq = _numpy_corpus()
    errs = []
    for k in (1, 2, 4):
        model = pca_fit(_ds(), k=k)
        proj = pca_project(_ds(), model).to_pandas().sort_values("vec_id")
        p = proj[[f"pc{i + 1}" for i in range(k)]].to_numpy(np.float64)
        recon = model["mean"] + p @ model["components"]
        order = np.argsort(ids)
        errs.append(float(((xq[order] - recon) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]


def test_query_runs_and_is_deterministic():
    from bitquery_kafka_streams_rust_ray.pipelines.queries import pca_embeddings
    a = pca_embeddings(SF)
    b = pca_embeddings(SF)
    pd.testing.assert_frame_equal(a, b)
    assert {"vec_id", "pc1", "pc2"} <= set(a.columns)
    assert len(a) > 0
