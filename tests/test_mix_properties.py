"""Property pins for the corpus mixing / weighted sampling operators:
the distributed partial-top-k (mix) and vectorized-mask (weighted
sample) implementations must agree with naive per-row references on
arbitrary corpora — skewed source counts, cap-zero sources, single-doc
corpora — independent of block layout."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from bitquery_kafka_streams_rust_ray.pipelines.queries import (
    mix_documents,
    weighted_sample_documents,
)
from bitquery_kafka_streams_rust_ray.stages.hashing import multiplicative_hash_u32

pytestmark = pytest.mark.usefixtures("ray_session")

rows_strategy = st.lists(
    st.tuples(st.integers(0, 10 ** 6),   # doc_id
              st.integers(0, 7),         # source index
              st.integers(0, 900)),      # n_chars
    min_size=1, max_size=50, unique_by=lambda t: t[0])


def write_docs(tmpdir: str, rows) -> pd.DataFrame:
    df = pd.DataFrame({
        "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
        "text": "w",
        "lang": "en",
        "source": [f"src{r[1]}" for r in rows],
        "n_chars": np.array([r[2] for r in rows], dtype=np.int64),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmpdir, "documents.parquet"))
    return df


def naive_mix(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("source").size()
    wt = {s: int(s[3:]) % 4 + 1 for s in g.index}
    total_w = sum(wt.values())
    t_max = min((c * total_w) // wt[s] for s, c in g.items())
    caps = {s: wt[s] * t_max // total_w for s in g.index}
    d = df.assign(_h=multiplicative_hash_u32(
        df["doc_id"].to_numpy()).astype(np.int64))
    parts = [grp.sort_values(["_h", "doc_id"]).head(caps[s])
             for s, grp in d.groupby("source")]
    out = pd.concat(parts)[["doc_id", "source"]]
    return out.sort_values("doc_id").reset_index(drop=True)


@settings(deadline=None)
@given(rows=rows_strategy)
def test_mix_matches_naive(rows, tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("mixprop"))
    df = write_docs(tmpdir, rows)
    got = mix_documents(tmpdir)
    want = naive_mix(df)
    pd.testing.assert_frame_equal(got, want)
    # never upsamples: per-source kept <= available
    avail = df.groupby("source").size()
    kept = got.groupby("source").size()
    for s, k in kept.items():
        assert k <= avail[s]


@settings(deadline=None)
@given(rows=rows_strategy)
def test_weighted_sample_matches_naive(rows, tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("wsprop"))
    df = write_docs(tmpdir, rows)
    got = weighted_sample_documents(tmpdir)
    w = (df["n_chars"].to_numpy(np.int64) // 100) % 4 + 1
    keep = (multiplicative_hash_u32(df["doc_id"].to_numpy())
            < w.astype(np.uint64) * (np.uint64(2 ** 32) // np.uint64(8)))
    want = df[keep][["doc_id", "n_chars"]].copy()
    want["weight"] = w[keep]
    want = want.sort_values("doc_id").reset_index(drop=True)
    want["weight"] = want["weight"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
