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

from ..functions.text import char_ngrams, jaccard, word_ngrams
from .hashing import hash_strings

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingles(text: str, ngram: int, shingle: str) -> set[str]:
    return (word_ngrams(text, ngram) if shingle == "word"
            else char_ngrams(text, ngram))


def minhash_signature(
    text: str, a: np.ndarray, b: np.ndarray, ngram: int = 3,
    shingle: str = "word",
) -> np.ndarray:
    """MinHash signature (uint64 per permutation) of a text's word
    (default) or char n-gram shingle set."""
    shingles = _shingles(text, ngram, shingle)
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
                 ngram: int, seed: int, shingle: str = "word"):
        if num_perm % bands != 0:
            raise ValueError("num_perm must be divisible by bands")
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.shingle = shingle
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        rows_per_band = self.num_perm // self.bands
        out_ids, out_band, out_hash, out_sig = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text or "", self.a, self.b, self.ngram,
                                    self.shingle)
            sig_hash = zlib.crc32(sig.tobytes())
            for band in range(self.bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                out_ids.append(doc_id)
                out_band.append(band)
                out_hash.append(zlib.crc32(chunk.tobytes()))
                out_sig.append(sig_hash)
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "sig_hash": pa.array(out_sig, type=pa.int64()),
            }
        )


def _shard_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for every LSH bucket in one bucket-shard.

    One ``map_groups`` call handles a whole shard of buckets (a pandas
    groupby inside), because a Ray-level group per bucket means tens of
    thousands of sub-millisecond tasks' worth of per-group overhead —
    the classic many-tiny-groups trap.

    Docs with an IDENTICAL full signature are collapsed to their min-id
    representative before pair expansion: they chain to the
    representative linearly with ``same_sig=True`` (estimated Jaccard
    1.0 at 64 perms — no exact verification needed), and only the
    representatives cross-pair quadratically (``np.triu_indices``).
    Without this, adversarial inputs where every doc collides cost
    O(n^2) pairs; with it they cost O(n).
    """
    out_a, out_b, out_same = [], [], []
    for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
        sub = sub.drop_duplicates("doc_id")
        if len(sub) < 2:
            continue
        reps = sub.groupby("sig_hash", sort=False)["doc_id"].min()
        rep_of = sub["sig_hash"].map(reps)
        members = sub["doc_id"].to_numpy()
        chain = members != rep_of.to_numpy()
        if chain.any():
            out_a.append(rep_of.to_numpy()[chain])
            out_b.append(members[chain])
            out_same.append(np.ones(int(chain.sum()), dtype=bool))
        rep_ids = np.sort(reps.to_numpy())
        if len(rep_ids) >= 2:
            i, j = np.triu_indices(len(rep_ids), k=1)
            out_a.append(rep_ids[i])
            out_b.append(rep_ids[j])
            out_same.append(np.zeros(len(i), dtype=bool))
    if not out_a:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "same_sig": pd.Series([], dtype=bool)})
    return pd.DataFrame({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b),
                         "same_sig": np.concatenate(out_same)})


_BUCKET_SHARDS = 32


def _bucketed_pairs(sig: ray.data.Dataset, pair_fn) -> pd.DataFrame:
    """Shard the (band_id, band_hash) bucket space coarsely, then run
    ``pair_fn`` once per shard (two-level grouping)."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        key = (df["band_hash"].to_numpy(np.uint64)
               * np.uint64(31) + df["band_id"].to_numpy(np.uint64))
        df["_bshard"] = (key % np.uint64(_BUCKET_SHARDS)).astype(np.int32)
        return df

    return (
        sig.map_batches(add_shard, batch_format="pandas")
        .groupby("_bshard")
        .map_groups(pair_fn, batch_format="pandas")
        .to_pandas()
    )


def minhash_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    concurrency: int = 4,
    shingle: str = "word",
) -> pd.DataFrame:
    """Candidate near-dup pairs via MinHash banding (deduplicated).

    ``same_sig=True`` pairs share the full signature (auto-verified);
    the rest need exact-Jaccard verification.
    """
    sig = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col, "num_perm": num_perm,
            "bands": bands, "ngram": ngram, "seed": seed, "shingle": shingle,
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
    pairs = _bucketed_pairs(sig, _shard_bucket_pairs)
    # same-sig chains replicate per band; keep one row per pair (a
    # same_sig=True copy wins over an unverified one)
    pairs = (pairs.sort_values(["id_a", "id_b", "same_sig"],
                               ascending=[True, True, False])
             .drop_duplicates(["id_a", "id_b"]))
    return pairs.reset_index(drop=True)


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
    shingle: str = "word",
) -> ray.data.Dataset:
    """Drop near-duplicate docs (keep the min-id representative of each
    verified cluster). Identical-signature pairs are accepted directly;
    the rest are verified with exact n-gram Jaccard."""
    from .join import semi_join

    cand = minhash_candidates(ds, text_col, id_col, num_perm, bands, ngram,
                              seed, shingle=shingle)
    if not len(cand):
        return ds
    unv = cand[~cand["same_sig"]]
    ids = set(unv["id_a"]) | set(unv["id_b"])
    texts = _texts_for_ids(ds, id_col, text_col, ids) if ids else {}
    verified = [
        (a, b)
        for a, b in zip(unv["id_a"], unv["id_b"])
        if jaccard(_shingles(texts.get(a) or "", ngram, shingle),
                   _shingles(texts.get(b) or "", ngram, shingle))
        >= jaccard_threshold
    ]
    verified += list(zip(cand.loc[cand["same_sig"], "id_a"],
                         cand.loc[cand["same_sig"], "id_b"]))
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

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": []}
        for _, bucket in g.groupby(["band_id", "band_hash"], sort=False):
            sub = bucket.drop_duplicates("doc_id").sort_values("doc_id")
            ids = sub["doc_id"].tolist()
            fps = sub["simhash"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if hamming64(fps[i], fps[j]) <= max_hamming:
                        out["id_a"].append(ids[i])
                        out["id_b"].append(ids[j])
        return pd.DataFrame(out, dtype=object)

    pairs = _bucketed_pairs(sig, shard_pairs).drop_duplicates()
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
