"""Distributed PCA over an embedding column.

The dimensionality-reduction primitive a training-data pipeline runs
before indexing/ANN (and the de-correlation step of whitening). The
scale shape mirrors the k-means/covariance family
(``stages/cluster.py``): second-moment partials fold inside every block
— each block contributes ONE (dim² + dim + 1)-sized summary regardless
of row count — ride an O(dim²)-row groupby reduce, and only the
dim×dim eigenproblem runs on the driver. The corpus itself never
shuffles and is read once.

Determinism contract (same as the vector family): elements quantize to
e6 ints FIRST (floor(x·1e6 + 0.5)), so the moment sums are EXACT int64
on any block layout — the covariance matrix is bit-identical however
Ray splits the input, and the eigensolver sees the same matrix every
run. Eigenvector sign is fixed by making each component's
largest-|value| element positive. int64 moment capacity: |x_q| ≤ 2e6
(unit-ish embeddings) gives per-pair products ≤ 4e12, exact to ~2e6
rows per partial and ~9e18 total — far past fixture scale; a 1e12-row
corpus would shard the reduce by block-range first.

No reference analog (the reference computes no linear algebra); this is
a north-rule training-data addition alongside k-means
(``stages/cluster.py``) and PQ (``stages/pq.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["pca_fit", "pca_project"]


def _quantized(t: pa.Table) -> tuple[np.ndarray, int]:
    flat = pc.list_flatten(t["embedding"].combine_chunks())
    dim = len(flat) // len(t)
    x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(x * 1e6 + 0.5).astype(np.int64).reshape(len(t), dim), dim


def pca_fit(ds: rd.Dataset, k: int) -> dict:
    """Fit top-``k`` principal components.

    Returns ``{"mean": (dim,), "components": (k, dim),
    "explained_ratio": (k,), "n": int}`` — mean/components are float64
    in e6-quantized units.
    """

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("j", pa.int64()), ("l", pa.int64()),
                              ("val", pa.int64())]).empty_table()
        xq, dim = _quantized(t)
        # second moments, first moments and the count share one frame:
        # (j, l) indexes S[j, l]; (j, -1) carries s[j]; (-1, -1) carries n
        S = xq.T @ xq  # int64 exact
        s = xq.sum(axis=0)
        j = np.repeat(np.arange(dim, dtype=np.int64), dim)
        l = np.tile(np.arange(dim, dtype=np.int64), dim)
        rows_j = np.concatenate([j, np.arange(dim, dtype=np.int64), [-1]])
        rows_l = np.concatenate([l, np.full(dim, -1, dtype=np.int64), [-1]])
        vals = np.concatenate([S.ravel(), s, [np.int64(len(t))]])
        return pa.table({"j": pa.array(rows_j), "l": pa.array(rows_l),
                         "val": pa.array(vals)})

    red = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["j", "l"]).aggregate(Sum("val", alias_name="val"))
           .to_pandas())
    n = int(red.loc[(red["j"] == -1) & (red["l"] == -1), "val"].iloc[0])
    sv = (red[(red["l"] == -1) & (red["j"] >= 0)]
          .sort_values("j")["val"].to_numpy(np.int64))
    dim = len(sv)
    Sm = np.zeros((dim, dim), dtype=np.int64)
    body = red[red["l"] >= 0]
    Sm[body["j"].to_numpy(np.int64), body["l"].to_numpy(np.int64)] = (
        body["val"].to_numpy(np.int64))
    mean = sv.astype(np.float64) / n
    cov = Sm.astype(np.float64) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, dim)
    # deterministic sign: the largest-|v| element of each component
    # is positive (ties broken by lowest index via argmax)
    for i in range(comps.shape[0]):
        piv = int(np.argmax(np.abs(comps[i])))
        if comps[i, piv] < 0:
            comps[i] = -comps[i]
    total = float(np.clip(evals.sum(), 1e-30, None))
    return {"mean": mean, "components": comps,
            "explained_ratio": evals[order] / total, "n": n,
            "total_var": float(np.trace(cov))}


def pca_project(ds: rd.Dataset, model: dict,
                out_cols: list[str] | None = None) -> rd.Dataset:
    """Project each embedding onto the fitted components (a pure map —
    the model broadcasts once per task via closure capture of the small
    arrays; no shuffle)."""
    mean = model["mean"]
    comps = model["components"]
    names = out_cols or [f"pc{i + 1}" for i in range(comps.shape[0])]

    def fn(t: pa.Table) -> pa.Table:
        cols = {"vec_id": t["vec_id"]}
        if len(t) == 0:
            empty = pa.schema([("vec_id", pa.int64())]
                              + [(nm, pa.float64()) for nm in names])
            return empty.empty_table()
        xq, _ = _quantized(t)
        proj = (xq.astype(np.float64) - mean) @ comps.T
        for i, nm in enumerate(names):
            cols[nm] = pa.array(proj[:, i])
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
