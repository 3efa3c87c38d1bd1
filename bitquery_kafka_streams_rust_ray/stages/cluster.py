"""Distributed k-means over an embedding column (iterative Lloyd's).

The IVF index (stages/ann.py) trains centroids on a driver-side sample;
this is the full-data path: every Lloyd iteration is one streaming pass
— a ``map_batches`` stage assigns each vector to its nearest centroid
and emits ONE partial row per (centroid) per block (sum vector +
count), the driver folds the tiny partial set and re-broadcasts the
updated centroids. Per-iteration exchange volume is
``k × blocks × dim`` numbers, independent of row count.

Determinism across block layouts / cluster sizes: float addition is
not associative, so partial sums are integer-scaled (micro-units,
round(v·1e6)) — integer addition commutes exactly, so the folded
centroid is bit-identical no matter how Ray splits the blocks. (At
true 100 TB scale the driver fold should promote to Python ints /
int128 to dodge int64 overflow; per-block sums stay comfortably in
int64.)

The input Dataset is materialized once up front: an iterative
algorithm re-reads its input T times, and Ray's object store (with
spill) is the right cache for that — re-planning the read per
iteration would re-pay the I/O instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_SCALE = 1_000_000.0


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _assign_partial(batch: pa.Table, centroids_ref: ray.ObjectRef,
                    emb_col: str) -> pa.Table:
    """One Lloyd assignment pass: per-block (centroid, int-scaled sum,
    count) partials. A plain task fn, not an actor class — the only
    per-task state is the centroid matrix, which ``ray.get`` reads
    zero-copy from the local object store, so an actor pool would add
    per-iteration spin-up for nothing."""
    centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
    embs = _normalize(np.asarray(batch[emb_col].to_pylist(),
                                 dtype=np.float64))
    # nearest centroid by cosine; ties -> lowest index (argmax)
    assign = (embs @ centroids.T).argmax(axis=1)
    scaled = np.round(embs * _SCALE).astype(np.int64)
    ks, sums, counts = [], [], []
    for c in np.unique(assign):
        member = scaled[assign == c]
        ks.append(int(c))
        sums.append(member.sum(axis=0))
        counts.append(len(member))
    return pa.table({
        "cluster_id": pa.array(ks, type=pa.int64()),
        "vec_sum": pa.array([s.tolist() for s in sums],
                            type=pa.list_(pa.int64())),
        "n": pa.array(counts, type=pa.int64()),
    })


def kmeans_embeddings(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 8,
    seed: int = 5,
) -> pd.DataFrame:
    """Full-data Lloyd's k-means; returns per-cluster sizes and the
    integer-scaled centroid checksum (a compact deterministic signature
    of the fit, stable across block layouts and cluster sizes)."""
    from .hashing import deterministic_sample

    ds = ds.materialize()  # iterative: pay the read once

    # deterministic init: hash-keyed sample (NOT ds.limit(), whose row
    # set depends on block completion order run to run)
    first = deterministic_sample(ds, id_col, max(k * 8, 256),
                                 columns=[id_col, emb_col])
    init = _normalize(np.asarray(first[emb_col].tolist(),
                                 dtype=np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(init), size=min(k, len(init)), replace=False)
    centroids = init[np.sort(idx)].copy()

    sizes: pd.Series | None = None
    for _ in range(iters):
        ref = ray.put(centroids)
        partials = ds.map_batches(
            _assign_partial,
            fn_kwargs={"centroids_ref": ref, "emb_col": emb_col},
            batch_format="pyarrow",
        ).to_pandas()
        # driver fold: k rows of integer sums — tiny and exact
        folded = {}
        for cid, vs, n in zip(partials["cluster_id"], partials["vec_sum"],
                              partials["n"]):
            s, c = folded.get(cid, (0, 0))
            folded[cid] = (np.asarray(vs, dtype=np.int64) + s, c + int(n))
        new = centroids.copy()
        for cid, (s, c) in folded.items():
            new[cid] = (s / _SCALE) / c
        centroids = _normalize(new)
        sizes = pd.Series({cid: c for cid, (_, c) in folded.items()})

    checksum = np.round(centroids * _SCALE).astype(np.int64).sum(axis=1)
    out = pd.DataFrame({
        "cluster_id": np.arange(len(centroids), dtype=np.int64),
        "n_vecs": [int(sizes.get(i, 0)) for i in range(len(centroids))],
        "centroid_checksum": checksum,
    })
    return out.sort_values("cluster_id").reset_index(drop=True)
