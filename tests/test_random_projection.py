"""Pins for the rows-only JL random-projection operator: seeded
determinism, exact layout invariance, and the distance-distortion
bound the JL lemma promises (loose at k=8, but a projection that lost
neighborhood structure entirely would blow through it)."""

import numpy as np
import pandas as pd
import pytest

from bitquery_kafka_streams_rust_ray.pipelines.queries import (
    random_projection_embeddings,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def projected():
    return random_projection_embeddings(SF_DIR)


def test_shape_and_determinism(projected):
    again = random_projection_embeddings(SF_DIR)
    pd.testing.assert_frame_equal(projected, again)
    assert list(projected.columns) == ["vec_id"] + [
        f"p{i}" for i in range(1, 9)]
    assert projected["vec_id"].is_unique


def test_distance_distortion_bound(projected):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    x = np.stack(t["embedding"].to_pandas().to_numpy())[order].astype(
        np.float64)
    y = projected[[f"p{i}" for i in range(1, 9)]].to_numpy(np.float64)
    rng = np.random.default_rng(0)
    i = rng.integers(0, len(x), 300)
    j = rng.integers(0, len(x), 300)
    keep = i != j
    dx = np.linalg.norm(x[i[keep]] - x[j[keep]], axis=1)
    dy = np.linalg.norm(y[i[keep]] - y[j[keep]], axis=1)
    ratio = dy / dx
    # k=8 is aggressive; the JL ratio is unbiased with ~1/sqrt(k)
    # spread, so the MEDIAN must sit near 1 and no pair may collapse
    # to zero or explode
    assert 0.8 < np.median(ratio) < 1.2
    assert ratio.min() > 0.05 and ratio.max() < 3.5


def test_layout_invariance(projected):
    import ray.data as rd

    from bitquery_kafka_streams_rust_ray.pipelines import queries as q

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).repartition(7)
    # same math over a different block layout must be bit-identical:
    # run the operator's batch fn against the repartitioned dataset
    import numpy as _np

    rng = _np.random.default_rng(12345)
    dim = len(ds.take(1)[0]["embedding"])
    proj = (rng.integers(0, 2, (dim, 8)).astype(_np.float64) * 2.0
            - 1.0) / _np.sqrt(8)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = _np.stack(df["embedding"].to_numpy()).astype(_np.float64)
        out = m @ proj
        res = pd.DataFrame({"vec_id": df["vec_id"].to_numpy(_np.int64)})
        for c in range(out.shape[1]):
            res[f"p{c + 1}"] = _np.round(out[:, c], 6)
        return res

    other = (ds.map_batches(fn, batch_format="pandas").to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(projected, other)
