"""Distributed logistic regression: the integer-quantized Newton fold
(gradient + Hessian partials) must make training BIT-IDENTICAL to a
single-process numpy replay of the same algorithm (the same exactness
contract as the kmeans partials).
The synthetic features are deliberately signal-free, so the pin is the
optimization machinery, not model lift."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from bitquery_kafka_streams_rust_ray.pipelines.queries import logreg_purchase_events
from bitquery_kafka_streams_rust_ray.stages.timeops import series_ts_us

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _replay(sf_dir: str) -> pd.DataFrame:
    iters, nano = 8, 1_000_000_000
    triu = np.triu_indices(4)
    df = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type", "value", "ts"]).to_pandas()
    cents_i = np.round(df["value"].to_numpy(np.float64) * 100
                       ).astype(np.int64)
    n = len(df)
    mean_c = cents_i.sum() / n
    std_c = float(np.sqrt((cents_i * cents_i).sum() / n - mean_c ** 2)) or 1.0
    h = ((series_ts_us(df["ts"]).to_numpy() // (3600 * 1_000_000)) % 24
         ).astype(np.float64)
    x = np.column_stack([
        np.ones(n),
        (np.round(df["value"].to_numpy(np.float64) * 100) - mean_c) / std_c,
        np.sin(2 * np.pi * h / 24.0),
        np.cos(2 * np.pi * h / 24.0),
    ])
    y = (df["event_type"] == "purchase").to_numpy().astype(np.float64)
    w = np.zeros(4)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = np.round((p - y)[:, None] * x * nano
                     ).astype(np.int64).sum(axis=0) / nano
        wt = p * (1.0 - p)
        hrows = (x[:, triu[0]] * x[:, triu[1]]) * wt[:, None]
        hu = np.round(hrows * nano).astype(np.int64).sum(axis=0) / nano
        hess = np.zeros((4, 4))
        hess[triu] = hu
        hess.T[triu] = hu
        w = w - np.linalg.solve(hess + 1e-9 * np.eye(4), g)
    pred = (x @ w) > 0.0
    rows = [("w_bias", int(np.round(w[0] * nano))),
            ("w_value", int(np.round(w[1] * nano))),
            ("w_sin_hour", int(np.round(w[2] * nano))),
            ("w_cos_hour", int(np.round(w[3] * nano))),
            ("n_correct", int((pred == (y > 0.5)).sum())),
            ("n_total", n)]
    return pd.DataFrame({"metric": [r[0] for r in rows],
                         "value": np.array([r[1] for r in rows], np.int64)})


def test_logreg_matches_numpy_replay_exactly():
    got = logreg_purchase_events(SF)
    want = _replay(SF)
    pd.testing.assert_frame_equal(got, want)


def test_logreg_converges_to_base_rate():
    # signal-free features -> the optimum is the logit of the class
    # prior; the trained bias must be within 5% of it and the other
    # weights near zero (sanity that Newton actually descended)
    got = logreg_purchase_events(SF).set_index("metric")["value"]
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type"]).to_pandas()
    p = (df["event_type"] == "purchase").mean()
    logit = np.log(p / (1 - p))
    bias = got["w_bias"] / 1e9
    assert abs(bias - logit) < 0.3, (bias, logit)
    # non-bias weights are pure sample noise; at 1k rows spurious
    # correlations reach ~0.25, so the bound is loose but nonzero
    for k in ("w_value", "w_sin_hour", "w_cos_hour"):
        assert abs(got[k] / 1e9) < 0.5
    assert got["n_correct"] / got["n_total"] >= max(p, 1 - p) - 1e-9
