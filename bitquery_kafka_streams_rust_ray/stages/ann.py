"""Approximate nearest neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch computes a vectorized ``Q @ X^T`` and emits
only its local top-k per query, so the driver merges tiny partials
(``num_queries * k`` rows per batch), never raw scores.

Scale path: IVF — k-means centroids trained on a seeded sample, each
vector assigned to its nearest list in one pass, queries probe only the
``nprobe`` nearest lists. Same partial top-k merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor-pool stage: per-batch cosine vs the broadcast query matrix,
    emitting the batch-local top-k per query."""

    def __init__(self, queries_ref: ray.ObjectRef, emb_col: str, id_col: str,
                 k: int):
        self.queries = _normalize(np.asarray(ray.get(queries_ref),
                                             dtype=np.float64))
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _normalize(
            np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        )
        ids = np.asarray(batch[self.id_col].to_pylist())
        scores = self.queries @ embs.T  # (q, n)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        q_idx = np.repeat(np.arange(len(self.queries)), k)
        v_idx = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(q_idx.astype(np.int64)),
                "vec_id": pa.array(ids[v_idx]),
                "score": pa.array(np.round(scores[q_idx, v_idx], 8)),
            }
        )


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Final top-k per query from per-batch partials (deterministic
    tie-break by (-score, vec_id))."""
    partials = partials.sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def ann_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, score, rank).

    Plain tasks by default (the scorer instance is the normalized query
    matrix — KBs here; per-pipeline actor-pool spin-up costs more than
    it saves). Pass ``concurrency`` to switch to an actor pool when the
    query matrix is big enough that a per-actor ``ray.get`` of the
    broadcast ref beats shipping the matrix inside the task closure."""
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    kwargs = {"queries_ref": ref, "emb_col": emb_col,
              "id_col": id_col, "k": k}
    if concurrency:
        stage = ds.map_batches(
            BruteForceScorer, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", concurrency=(1, concurrency),
        )
    else:
        stage = ds.map_batches(BruteForceScorer(**kwargs),
                               batch_format="pyarrow")
    partials = stage.to_pandas()
    return _merge_topk(partials, k)


def train_centroids(
    sample: np.ndarray, nlist: int, seed: int = 5, iters: int = 10
) -> np.ndarray:
    """Plain seeded k-means on a sample (deterministic)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)
    centroids = sample[np.sort(idx)].copy()
    for _ in range(iters):
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IvfScorer:
    """Actor-pool stage: score only vectors whose IVF list is probed by
    some query; emit batch-local top-k per query."""

    def __init__(self, queries_ref, centroids_ref, emb_col, id_col, k, nprobe):
        self.queries = _normalize(np.asarray(ray.get(queries_ref),
                                             dtype=np.float64))
        self.centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        sims = self.queries @ self.centroids.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        self.probe_lists = [set(row.tolist()) for row in order]
        self.all_probed = set().union(*self.probe_lists) if len(order) else set()
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _normalize(
            np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        )
        ids = np.asarray(batch[self.id_col].to_pylist())
        assign = (embs @ self.centroids.T).argmax(axis=1)
        mask = np.isin(assign, list(self.all_probed))
        embs, ids, assign = embs[mask], ids[mask], assign[mask]
        out_q, out_v, out_s = [], [], []
        if len(ids):
            scores = self.queries @ embs.T
            for qi, probed in enumerate(self.probe_lists):
                qmask = np.isin(assign, list(probed))
                if not qmask.any():
                    continue
                qscores = scores[qi][qmask]
                qids = ids[qmask]
                k = min(self.k, len(qids))
                top = np.argpartition(-qscores, kth=k - 1)[:k]
                out_q.extend([qi] * k)
                out_v.extend(qids[top].tolist())
                out_s.extend(np.round(qscores[top], 8).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def ann_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 5,
    train_sample: int = 2048,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """IVF-approximate cosine top-k per query (same output shape as
    brute force; recall < 1.0 by construction when nprobe < nlist)."""
    # NOT ds.limit(): limit's row set depends on block completion order,
    # which varies run to run — centroids (and therefore recall) would
    # silently drift. The hash-keyed sample is a pure function of ids.
    from .hashing import deterministic_sample

    sample_rows = deterministic_sample(ds, id_col, train_sample,
                                       columns=[id_col, emb_col])
    centroids = train_centroids(
        np.asarray(sample_rows[emb_col].tolist(), dtype=np.float64),
        nlist, seed,
    )
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    c_ref = ray.put(centroids)
    kwargs = {
        "queries_ref": q_ref, "centroids_ref": c_ref, "emb_col": emb_col,
        "id_col": id_col, "k": k, "nprobe": nprobe,
    }
    # plain tasks by default (see ann_brute_force); the IVF scorer's
    # state is the probe-list sets + two small matrices
    if concurrency:
        stage = ds.map_batches(
            IvfScorer, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", concurrency=(1, concurrency),
        )
    else:
        stage = ds.map_batches(IvfScorer(**kwargs), batch_format="pyarrow")
    partials = stage.to_pandas()
    return _merge_topk(partials, k)


class NearestRefJoiner:
    """Per-batch cosine argmax vs a broadcast reference matrix — the
    transposed-broadcast ANN direction: instead of a few queries probing
    the whole corpus, every corpus row finds its nearest member of a
    small reference set (centroid assignment, eval-set matching). Pure
    map: no shuffle, output is one row per input row.

    Tie-break = smallest reference id: reference rows arrive sorted by
    id, and ``argmax`` returns the first maximum.
    """

    def __init__(self, ref_ref: ray.ObjectRef, emb_col: str, id_col: str):
        ref_ids, ref_mat = ray.get(ref_ref)
        self.ref_ids = np.asarray(ref_ids)
        self.ref_mat = _normalize(np.asarray(ref_mat, dtype=np.float64))
        self.emb_col, self.id_col = emb_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = _normalize(
            np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        )
        scores = embs @ self.ref_mat.T  # (n, r)
        best = np.argmax(scores, axis=1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ref_id": pa.array(self.ref_ids[best]),
                "score": pa.array(
                    np.round(scores[np.arange(len(best)), best], 8)
                ),
            }
        )


def similarity_join(
    ds: ray.data.Dataset,
    ref_ids: np.ndarray,
    ref_mat: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Broadcast similarity join: each row of ``ds`` gains the id of its
    nearest (cosine) reference vector. The reference side ships once via
    ``ray.put``; the big side streams through plain map tasks. Reference
    rows must be sorted by id (deterministic smallest-id tie-break)."""
    order = np.argsort(np.asarray(ref_ids))
    ref = ray.put((np.asarray(ref_ids)[order],
                   np.asarray(ref_mat, dtype=np.float64)[order]))
    return ds.map_batches(
        NearestRefJoiner(ref_ref=ref, emb_col=emb_col, id_col=id_col),
        batch_format="pyarrow",
    )
