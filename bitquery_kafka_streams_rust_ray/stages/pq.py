"""Product quantization (PQ) for embedding columns.

The vector-compression scale path beyond the symmetric int8 quantizer
(``queries.py::quantize_embeddings``): split each d-dim vector into
``m`` subvectors, learn a ``ksub``-word codebook per subspace on a
deterministic sample, and store each vector as ``m`` uint8 code ids —
dim-64 float32 corpora compress 32x (8 bytes/vector at m=8), which is
what makes a 10^12-vector index fit a cluster's RAM at all (Jegou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
public method, no external code used).

Scale shape mirrors ``stages/ann.py``:

- **Training** runs on a hash-deterministic sample (pure function of
  ids, layout-invariant) on the driver — codebooks are m x ksub x dsub
  floats, kilobytes, the canonical broadcast-small-side.
- **Encoding** is a pure streaming ``map_batches`` (one ``ray.put`` of
  the codebooks, vectorized distance argmin per batch, no shuffle).
- **Search** is asymmetric-distance computation (ADC): each query
  builds an (m, ksub) inner-product lookup table once, then every
  corpus code scores with ``m`` table gathers — no decode. Same
  broadcast + per-batch partial top-k shape as
  ``ann.py::ann_brute_force``; the final k-merge sees blocks x k rows.

Reference parity note: the reference engine has no vector ops; this is
part of the training-data family the north rule adds (compression tier
between exact float search and IVF pruning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .ann import _merge_topk, _normalize


def train_pq_codebooks(
    sample: np.ndarray, m: int = 8, ksub: int = 16,
    seed: int = 5, iters: int = 10,
) -> np.ndarray:
    """Seeded per-subspace L2 Lloyd's on a sample -> (m, ksub, dsub).

    Deterministic: init picks sorted random rows, iteration count is
    fixed, and empty cells keep their previous word (no reseeding
    randomness mid-run). Plain L2 k-means — NOT the spherical
    ``ann.train_centroids`` — because subvectors of a normalized vector
    are not themselves unit-norm.
    """
    sample = np.asarray(sample, dtype=np.float64)
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample[:, s * dsub:(s + 1) * dsub]
        idx = rng.choice(n, size=min(ksub, n), replace=False)
        cb = sub[np.sort(idx)].copy()
        for _ in range(iters):
            # ||x - c||^2 argmin == argmax(x.c - ||c||^2/2)
            assign = (sub @ cb.T - 0.5 * (cb * cb).sum(axis=1)).argmax(axis=1)
            for c in range(len(cb)):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[s, :len(cb)] = cb
        if len(cb) < ksub:          # tiny sample: pad with repeats
            books[s, len(cb):] = cb[-1]
    return books


class _PqEncoder:
    """Per-batch PQ encode: argmin subspace distance -> uint8 codes.

    Plain-task form (state = one small codebook tensor read zero-copy
    from the object store); pure map, output one row per input row.
    """

    def __init__(self, books_ref: ray.ObjectRef, emb_col: str, id_col: str):
        self.books = ray.get(books_ref)        # (m, ksub, dsub)
        self.emb_col, self.id_col = emb_col, id_col
        # precompute ||c||^2/2 per subspace word for the argmin form
        self.cnorm = 0.5 * (self.books * self.books).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({self.id_col: batch[self.id_col],
                             "codes": pa.array([], pa.list_(pa.uint8()))})
        m, ksub, dsub = self.books.shape
        # fixed-dim list column: flatten + reshape, no per-row Python
        flat = pc.list_flatten(batch[self.emb_col].combine_chunks())
        x = _normalize(flat.to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(len(batch), m * dsub))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            sub = x[:, s * dsub:(s + 1) * dsub]
            codes[:, s] = (sub @ self.books[s].T
                           - self.cnorm[s]).argmax(axis=1).astype(np.uint8)
        return pa.table({
            self.id_col: batch[self.id_col],
            "codes": pa.array(list(codes), type=pa.list_(pa.uint8())),
        })


def pq_encode(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 256,
    seed: int = 5,
    train_sample: int = 2048,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Train codebooks on a deterministic sample, encode the corpus.

    Returns ``(codes_dataset, codebooks)``; the dataset streams
    (id, codes:list<uint8>) rows. Vectors are unit-normalized before
    encoding so ADC inner product approximates cosine.
    """
    from .hashing import deterministic_sample

    rows = deterministic_sample(ds, id_col, train_sample,
                                columns=[id_col, emb_col])
    books = train_pq_codebooks(
        _normalize(np.asarray(rows[emb_col].tolist(), dtype=np.float64)),
        m=m, ksub=ksub, seed=seed)
    books_ref = ray.put(books)
    out = ds.map_batches(
        _PqEncoder(books_ref, emb_col, id_col), batch_format="pyarrow")
    return out, books


class _AdcScorer:
    """Per-batch ADC top-k: (m, ksub) lookup tables per query, m gathers
    per corpus code — never reconstructs a vector."""

    def __init__(self, books_ref, queries_ref, id_col, k):
        books = ray.get(books_ref)                     # (m, ksub, dsub)
        q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        m, ksub, dsub = books.shape
        # tables[qi, s, c] = <q_sub, codeword> ; score = sum_s table gather
        self.tables = np.einsum(
            "qsd,scd->qsc", q.reshape(len(q), m, dsub), books)
        self.id_col, self.k = id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        nq, m = self.tables.shape[0], self.tables.shape[1]
        if not len(batch):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        flat = pc.list_flatten(batch["codes"].combine_chunks())
        codes = (flat.to_numpy(zero_copy_only=False).astype(np.int64)
                 .reshape(len(batch), m))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        out_q, out_v, out_s = [], [], []
        cols = np.arange(m)
        for qi in range(nq):
            scores = self.tables[qi][cols, codes].sum(axis=1)
            k = min(self.k, n)
            top = np.argpartition(-scores, kth=k - 1)[:k]
            out_q.extend([qi] * k)
            out_v.extend(ids[top].tolist())
            out_s.extend(np.round(scores[top], 8).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v),
                         "score": pa.array(out_s, pa.float64())})


def pq_topk(
    codes_ds: ray.data.Dataset,
    books: np.ndarray,
    queries: np.ndarray,
    id_col: str = "vec_id",
    k: int = 10,
) -> pd.DataFrame:
    """ADC cosine-approximate top-k per query over a PQ-encoded corpus
    (same output shape / partial-top-k merge as ``ann_brute_force``)."""
    books_ref, q_ref = ray.put(books), ray.put(np.asarray(queries))
    partials = codes_ds.map_batches(
        _AdcScorer(books_ref, q_ref, id_col, k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


def pq_topk_rerank(
    ds: ray.data.Dataset,
    codes_ds: ray.data.Dataset,
    books: np.ndarray,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    shortlist: int | None = None,
) -> pd.DataFrame:
    """Two-stage PQ search (IVFADC+R shape, Jegou et al. §V): ADC
    produces a ``shortlist`` (default 5k) of candidates per query from
    the 8-byte codes alone, then ONLY those rows' float vectors are
    re-scored exactly. The second pass is a broadcast-membership filter
    (``pc.is_in`` on the shortlist id set — a few hundred ids) plus an
    exact partial-top-k over the surviving sliver, so the full float
    corpus is read once and never shuffled; at 10^12 vectors the float
    read is the cost, and a parquet row-group filter on ``id_col``
    ranges (or storing floats sorted by id) turns it into point reads.
    Final top-k scores are exact for every returned id; recall is the
    probability the true neighbor made the shortlist (0.988 measured at
    shortlist=5k on the test corpora — see tests/test_pq.py)."""
    from .ann import BruteForceScorer

    shortlist = shortlist or 5 * k
    adc = pq_topk(codes_ds, books, queries, id_col=id_col, k=shortlist)
    cand = pa.array(sorted(set(adc["vec_id"].tolist())))
    cand_ref = ray.put(cand)
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    def keep(t: pa.Table) -> pa.Table:
        from .broadcast import broadcast_get

        return t.filter(pc.is_in(t[id_col], broadcast_get(cand_ref)))

    sliver = ds.map_batches(keep, batch_format="pyarrow")
    partials = sliver.map_batches(
        BruteForceScorer(q_ref, emb_col, id_col, k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


class _IvfPqEncoder:
    """Per-batch IVF assignment + PQ encode: (id, list_id, codes).

    One corpus pass produces both the inverted-list key and the 8-bit
    codes — the IVFADC layout (Jegou et al. §IV): at 10^12 vectors the
    codes table is what persists (id + m bytes per vector), partitioned
    by ``list_id`` so a probe touches only its lists' partitions.
    """

    def __init__(self, books_ref, centroids_ref, emb_col, id_col):
        self.books = ray.get(books_ref)               # (m, ksub, dsub)
        self.centroids = np.asarray(ray.get(centroids_ref),
                                    dtype=np.float64)
        self.cnorm = 0.5 * (self.books * self.books).sum(axis=2)
        self.emb_col, self.id_col = emb_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({self.id_col: batch[self.id_col],
                             "list_id": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.list_(pa.uint8()))})
        m, ksub, dsub = self.books.shape
        flat = pc.list_flatten(batch[self.emb_col].combine_chunks())
        x = _normalize(flat.to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(len(batch), m * dsub))
        assign = (x @ self.centroids.T).argmax(axis=1).astype(np.int64)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for s in range(m):
            sub = x[:, s * dsub:(s + 1) * dsub]
            codes[:, s] = (sub @ self.books[s].T
                           - self.cnorm[s]).argmax(axis=1).astype(np.uint8)
        return pa.table({
            self.id_col: batch[self.id_col],
            "list_id": pa.array(assign),
            "codes": pa.array(list(codes), type=pa.list_(pa.uint8())),
        })


class _IvfAdcScorer:
    """Per-batch ADC top-k restricted to each query's probed IVF lists
    (the IVFADC probe: only rows whose ``list_id`` is among the query's
    ``nprobe`` nearest centroids are table-gathered)."""

    def __init__(self, books_ref, centroids_ref, queries_ref, id_col, k,
                 nprobe):
        books = ray.get(books_ref)
        q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        m, ksub, dsub = books.shape
        self.tables = np.einsum(
            "qsd,scd->qsc", q.reshape(len(q), m, dsub), books)
        order = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
        self.probe_lists = [np.asarray(sorted(row.tolist()))
                            for row in order]
        self.all_probed = (np.unique(order) if len(order)
                           else np.empty(0, np.int64))
        self.id_col, self.k = id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        nq, m = self.tables.shape[0], self.tables.shape[1]
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if not len(batch):
            return empty
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(lists, self.all_probed)
        if not keep.any():
            return empty
        flat = pc.list_flatten(
            batch.filter(pa.array(keep))["codes"].combine_chunks())
        codes = (flat.to_numpy(zero_copy_only=False).astype(np.int64)
                 .reshape(-1, m))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)[keep]
        lists = lists[keep]
        out_q, out_v, out_s = [], [], []
        cols = np.arange(m)
        for qi in range(nq):
            qmask = np.isin(lists, self.probe_lists[qi])
            if not qmask.any():
                continue
            qcodes, qids = codes[qmask], ids[qmask]
            scores = self.tables[qi][cols, qcodes].sum(axis=1)
            k = min(self.k, len(qids))
            top = np.argpartition(-scores, kth=k - 1)[:k]
            out_q.extend([qi] * k)
            out_v.extend(qids[top].tolist())
            out_s.extend(np.round(scores[top], 8).tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v),
                         "score": pa.array(out_s, pa.float64())})


def ivfpq_topk_rerank(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 12,
    m: int = 8,
    ksub: int = 16,
    shortlist: int | None = None,
    seed: int = 5,
    train_sample: int = 2048,
) -> pd.DataFrame:
    """IVFADC + exact rerank, end to end (Jegou et al. §V, IVFADC+R):

    1. one deterministic sample trains BOTH the IVF centroids and the
       PQ codebooks;
    2. one corpus pass emits the inverted-codes table
       ``(id, list_id, codes)``;
    3. ADC scores ONLY the probed lists' codes into a per-query
       ``shortlist`` (default 5k) — table gathers on m uint8 codes, no
       float vector is touched;
    4. only shortlist rows' float vectors are re-scored exactly
       (broadcast ``is_in`` membership filter + partial top-k).

    Returned scores are exact for every returned id; recall is the
    probability the true neighbor's list was probed AND it made the
    ADC shortlist (pinned >= 0.9 at both scales by
    tests/test_pq.py::test_ivfpq_recall*).  At 10^12 vectors the codes
    table is the only full-corpus artifact (id + m bytes/vector,
    partitionable by ``list_id``), and step 4's float read is a
    point-lookup sliver.
    """
    from .ann import BruteForceScorer, train_centroids
    from .hashing import deterministic_sample

    shortlist = shortlist or 5 * k
    rows = deterministic_sample(ds, id_col, train_sample,
                                columns=[id_col, emb_col])
    sample = _normalize(np.asarray(rows[emb_col].tolist(),
                                   dtype=np.float64))
    centroids = train_centroids(sample, nlist, seed)
    books = train_pq_codebooks(sample, m=m, ksub=ksub, seed=seed)
    books_ref, cent_ref = ray.put(books), ray.put(centroids)
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    codes_ds = ds.map_batches(
        _IvfPqEncoder(books_ref, cent_ref, emb_col, id_col),
        batch_format="pyarrow")
    adc = codes_ds.map_batches(
        _IvfAdcScorer(books_ref, cent_ref, q_ref, id_col,
                      shortlist, nprobe),
        batch_format="pyarrow").to_pandas()
    adc = _merge_topk(adc, shortlist)

    cand = pa.array(sorted(set(adc["vec_id"].tolist())))
    cand_ref = ray.put(cand)

    def keep(t: pa.Table) -> pa.Table:
        from .broadcast import broadcast_get

        return t.filter(pc.is_in(t[id_col], broadcast_get(cand_ref)))

    sliver = ds.map_batches(keep, batch_format="pyarrow")
    partials = sliver.map_batches(
        BruteForceScorer(q_ref, emb_col, id_col, k),
        batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)
