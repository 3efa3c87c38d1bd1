"""Block-layout invariance of the vector-family operators.

A distributed operator's output must be a pure function of the DATA,
never of how Ray happened to split it into blocks — the determinism
contract every resume/replay guarantee in this repo leans on. Each
test rewrites the input at adversarial block layouts (one giant block
vs many tiny ones) and requires bit-identical results.
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import bitquery_kafka_streams_rust_ray.pipelines.queries as q

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def relaid_sf(tmp_path_factory):
    """A copy of sf0.001 whose embeddings table is re-written as many
    tiny row groups, forcing a different Ray block layout."""
    if not os.path.exists(os.path.join(SF, "embeddings.parquet")):
        pytest.skip("testdata not present")
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("relaid_sf")
    for name in os.listdir(SF):
        shutil.copy(os.path.join(SF, name), d / name)
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    pq.write_table(t, str(d / "embeddings.parquet"), row_group_size=7)
    return str(d)


@pytest.mark.parametrize("name", [
    "label_centroids_embeddings",
    "knn_classify_embeddings",
    "quantize_embeddings",
    "ann_topk",
])
def test_vector_ops_are_layout_invariant(name, relaid_sf):
    fn = getattr(q, name)
    a = fn(SF).reset_index(drop=True)
    b = fn(relaid_sf).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, obj=name)


def test_quantize_handles_empty_and_zero_blocks(tmp_path):
    """Typed-empty blocks and all-zero vectors flow through without
    crashing: zero vectors quarantine, others quantize."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "degen"
    d.mkdir()
    df = pd.DataFrame({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": [[0.0, 0.0], [1.0, -2.0], [0.5, 0.25], [0.0, 0.0]],
    })
    pq.write_table(pa.Table.from_pandas(df), str(d / "embeddings.parquet"),
                   row_group_size=1)  # 1-row blocks stress the guards
    out = q.quantize_embeddings(str(d))
    assert out["vec_id"].tolist() == [1, 2]  # zero vectors dropped
    assert out["q_int8"].tolist()[0].split(",")[1] == "-127"
