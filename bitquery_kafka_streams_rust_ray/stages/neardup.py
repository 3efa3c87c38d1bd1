"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup family a training-data pipeline needs.

Scale shape (per the candidate-pair pattern): signatures are computed
vectorized inside ``map_batches``; docs explode to ``(band_id,
band_hash, doc_id)`` rows; a ``groupby`` on the band key co-locates
collision buckets; buckets yield candidate pairs; pairs are verified
with the exact metric (Jaccard / Hamming / cosine); verified pairs are
clustered and every non-minimum member of a cluster is dropped.

Clustering here is driver-side union-find over the *verified pair* set,
which is small (near-dup pairs, not docs). At 10^12-doc scale swap the
final step for a few rounds of min-label propagation (groupby-min over
pair endpoints) — the surrounding stages are unchanged; the pair
datasets produced by :func:`minhash_candidates` et al. are exactly the
input that iteration needs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.text import char_ngrams, jaccard
from .hashing import hash_strings

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(
    text: str, a: np.ndarray, b: np.ndarray, ngram: int = 3
) -> np.ndarray:
    """MinHash signature (uint64 per permutation) of a text's char
    n-gram shingle set."""
    shingles = char_ngrams(text, ngram)
    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    base = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in shingles),
        dtype=np.int64,
        count=len(shingles),
    )
    # (num_perm, |S|) universal hashing, min over shingles
    hashed = (a[:, None] * base[None, :] + b[:, None]) % _MERSENNE
    return hashed.min(axis=1).astype(np.uint64)


class MinHashStage:
    """Actor-pool stage: text -> (doc_id, band_id, band_hash) LSH rows.

    Permutation parameters are derived once per actor in ``__init__``
    from the seed (deterministic across the cluster).
    """

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int,
                 ngram: int, seed: int):
        if num_perm % bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        rows_per_band = self.num_perm // self.bands
        out_ids, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text or "", self.a, self.b, self.ngram)
            for band in range(self.bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                out_ids.append(doc_id)
                out_band.append(band)
                out_hash.append(zlib.crc32(chunk.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All candidate pairs inside one LSH bucket (sorted ids)."""
    ids = sorted(g["doc_id"].unique().tolist())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"id_a": a, "id_b": b})


def minhash_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Candidate near-dup pairs via MinHash banding (deduplicated)."""
    sig = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col, "num_perm": num_perm,
            "bands": bands, "ngram": ngram, "seed": seed,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    pairs = (
        sig.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return pairs.drop_duplicates().reset_index(drop=True)


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            # deterministic: smaller root wins
            lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            self.parent[hi] = lo


def losers_from_pairs(pairs: list[tuple]) -> set:
    """Union-find the verified pairs; every non-minimum member of a
    cluster is a loser (the kept representative is the min id)."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    clusters: dict = {}
    for x in list(uf.parent):
        clusters.setdefault(uf.find(x), set()).add(x)
    losers = set()
    for root, members in clusters.items():
        keep = min(members)
        losers |= members - {keep}
    return losers


def _texts_for_ids(ds, id_col, text_col, ids) -> dict:
    import ray

    from .join import semi_join

    sub = semi_join(ds.select_columns([id_col, text_col]), list(ids), id_col)
    out = sub.to_pandas()
    return dict(zip(out[id_col], out[text_col]))


def minhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 7,
) -> ray.data.Dataset:
    """Drop near-duplicate docs (keep the min-id representative of each
    verified cluster). Pairs are verified with exact n-gram Jaccard."""
    from .join import semi_join

    cand = minhash_candidates(ds, text_col, id_col, num_perm, bands, ngram, seed)
    if not len(cand):
        return ds
    ids = set(cand["id_a"]) | set(cand["id_b"])
    texts = _texts_for_ids(ds, id_col, text_col, ids)
    verified = [
        (a, b)
        for a, b in zip(cand["id_a"], cand["id_b"])
        if jaccard(char_ngrams(texts.get(a) or "", ngram),
                   char_ngrams(texts.get(b) or "", ngram)) >= jaccard_threshold
    ]
    losers = losers_from_pairs(verified)
    if not losers:
        return ds
    return semi_join(ds, list(losers), id_col, anti=True)


# --- SimHash -----------------------------------------------------------


def simhash64(text: str) -> np.uint64:
    """64-bit SimHash over whitespace tokens (deterministic hashing)."""
    toks = text.lower().split()
    if not toks:
        return np.uint64(0)
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = hash_strings(uniq)
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")  # (n, 64)
    weights = counts.astype(np.int64)[:, None]
    score = (bits.astype(np.int64) * 2 - 1) * weights
    fp_bits = (score.sum(axis=0) > 0).astype(np.uint8)
    return np.uint64(np.packbits(fp_bits, bitorder="little").view(np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")


class SimHashStage:
    """Actor-pool stage: text -> (doc_id, simhash, band_id, band_hash)."""

    def __init__(self, text_col: str, id_col: str, bands: int = 4):
        self.text_col, self.id_col, self.bands = text_col, id_col, bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        width = 64 // self.bands
        mask = (1 << width) - 1
        out = {"doc_id": [], "simhash": [], "band_id": [], "band_hash": []}
        for doc_id, text in zip(ids, texts):
            fp = int(simhash64(text or ""))
            for band in range(self.bands):
                out["doc_id"].append(doc_id)
                out["simhash"].append(fp)
                out["band_id"].append(band)
                out["band_hash"].append((fp >> (band * width)) & mask)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"]),
                "simhash": pa.array(np.array(out["simhash"], dtype=np.uint64)),
                "band_id": pa.array(out["band_id"], type=pa.int32()),
                "band_hash": pa.array(out["band_hash"], type=pa.int64()),
            }
        )


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Near-dup removal via SimHash banding + exact Hamming verification.

    Two docs are duplicates iff Hamming(simhash) <= max_hamming; with 4
    bands any pair within distance 3 shares at least one exact band
    (pigeonhole), so banding loses no candidates.
    """
    from .join import semi_join

    sig = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col,
                               "bands": bands},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].tolist()
        fps = sub["simhash"].tolist()
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if hamming64(fps[i], fps[j]) <= max_hamming:
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = (
        sig.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    losers = losers_from_pairs(list(zip(pairs["id_a"], pairs["id_b"])))
    if not losers:
        return ds
    return semi_join(ds, list(losers), id_col, anti=True)


# --- exact n-gram Jaccard within blocks --------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> pd.DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold, within blocks.

    ``block_col`` bounds the quadratic comparison (e.g. ``lang`` or a
    length bucket); None compares everything — only for small inputs.
    Returns (id_a, id_b, jaccard) sorted.
    """
    cols = [id_col, text_col] + ([block_col] if block_col else [])
    df = ds.select_columns(cols).to_pandas()
    out = []
    groups = df.groupby(block_col) if block_col else [(None, df)]
    for _, g in groups:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        shingle_sets = [char_ngrams(t or "", ngram) for t in g[text_col]]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                sim = jaccard(shingle_sets[i], shingle_sets[j])
                if sim >= threshold:
                    out.append((ids[i], ids[j], round(sim, 6)))
    out.sort()
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# --- embedding cosine near-dup -----------------------------------------


class HyperplaneLshStage:
    """Actor-pool stage: embedding -> (vec_id, bucket) via random
    hyperplane signs (seeded, deterministic)."""

    def __init__(self, emb_col: str, id_col: str, planes: int, dim: int,
                 seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, planes))
        self.emb_col, self.id_col = emb_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = np.asarray(batch[self.emb_col].to_pylist(), dtype=np.float64)
        signs = (embs @ self.planes) > 0
        buckets = np.packbits(signs, axis=1, bitorder="little")
        width = buckets.shape[1]
        bucket_ids = np.zeros(len(embs), dtype=np.int64)
        for i in range(width):
            bucket_ids |= buckets[:, i].astype(np.int64) << (8 * i)
        return pa.table(
            {
                "vec_id": batch[self.id_col],
                "bucket": pa.array(bucket_ids),
            }
        )


def embedding_dedup(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.98,
    planes: int = 12,
    seed: int = 11,
) -> ray.data.Dataset:
    """Drop embeddings whose cosine similarity to a kept representative
    is >= threshold. LSH hyperplane buckets bound the pairwise work; the
    exact cosine verifies every candidate pair."""
    from .join import semi_join

    first = ds.take(1)
    dim = len(first[0][emb_col])
    lsh = ds.map_batches(
        HyperplaneLshStage,
        fn_constructor_kwargs={"emb_col": emb_col, "id_col": id_col,
                               "planes": planes, "dim": dim, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).to_pandas()

    # fetch vectors only for ids sharing a bucket (the candidate set)
    sizes = lsh.groupby("bucket")["vec_id"].transform("nunique")
    cand = lsh[sizes > 1]
    cand_ids = set(cand["vec_id"])
    if not cand_ids:
        return ds
    sub = semi_join(ds.select_columns([id_col, emb_col]), list(cand_ids),
                    id_col).to_pandas()
    emb_map = {
        i: np.asarray(e, dtype=np.float64)
        for i, e in zip(sub[id_col], sub[emb_col])
    }
    pairs = []
    for _, g in cand.groupby("bucket"):
        ids = sorted(g["vec_id"].unique().tolist())
        for i in range(len(ids)):
            va = emb_map[ids[i]]
            na = np.linalg.norm(va)
            for j in range(i + 1, len(ids)):
                vb = emb_map[ids[j]]
                denom = na * np.linalg.norm(vb)
                if denom > 0 and float(va @ vb / denom) >= threshold:
                    pairs.append((ids[i], ids[j]))
    losers = losers_from_pairs(pairs)
    if not losers:
        return ds
    return semi_join(ds, list(losers), id_col, anti=True)
