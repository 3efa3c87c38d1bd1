"""Sketch-quality evaluation operator: MinHash-LSH candidate recall
against the exact char-trigram Jaccard ground truth must meet the
collision-probability bound; precision is reported, not pinned (it is
the quantity the verify stage exists to fix)."""

import numpy as np
import pytest

from bitquery_kafka_streams_rust_ray.pipelines.queries import minhash_eval_documents

pytestmark = pytest.mark.usefixtures("ray_session")


def test_minhash_eval_recall_bound():
    out = minhash_eval_documents("/root/testdata/sf0.001").iloc[0]
    assert out["n_truth"] > 0, "fixture has no true near-dup pairs"
    # 1-(1-s^4)^16 at s=0.8 predicts ~0.9998; pin >= 0.95
    assert out["recall_ppm"] >= 950_000, dict(out)
    assert 0 <= out["precision_ppm"] <= 1_000_000
    assert out["true_positives"] <= out["n_candidates"]
    assert out["true_positives"] <= out["n_truth"]
