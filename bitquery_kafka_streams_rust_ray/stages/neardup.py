"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the dedup family a training-data pipeline needs.

Scale shape (per the candidate-pair pattern): signatures are computed
vectorized inside ``map_batches``; docs explode to ``(band_id,
band_hash, doc_id)`` rows; a ``groupby`` on a coarse shard of the band
key co-locates collision buckets (two-level grouping — one Ray group
per bucket would be the many-tiny-groups trap); buckets yield candidate
pairs; pairs are verified with the exact metric (Jaccard / Hamming /
cosine); verified pairs are clustered; every non-minimum member of a
cluster is dropped.

Every stage is distributed — the driver holds only per-round scalars:

- pair **verification** joins the payload (text / embedding) onto the
  pair dataset with a partitioned hash join and applies the exact
  metric inside ``map_batches`` — candidate payloads never land on the
  driver;
- **clustering** is min-label propagation (:func:`propagate_min_labels`)
  — each round every node takes the min of its own and its neighbors'
  component labels via one hash join + one ``groupby`` aggregate,
  converging in O(component diameter) rounds. ``UnionFind`` /
  :func:`losers_from_pairs` remain as the single-process oracle the
  tests pin the distributed result against;
- the final **drop** broadcasts the loser-id set when it is small and
  falls back to a partitioned anti join when it is not.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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
    """Candidate pairs for every LSH bucket in one frame (a whole
    bucket-shard, or the whole signature set on the single-task path).

    Docs with an IDENTICAL full signature are collapsed to their min-id
    representative before pair expansion: they chain to the
    representative linearly with ``same_sig=True`` (estimated Jaccard
    1.0 at 64 perms — no exact verification needed), and only the
    representatives cross-pair quadratically. Without this, adversarial
    inputs where every doc collides cost O(n^2) pairs; with it O(n).

    Fully vectorized — no per-bucket Python loop: the chain step is a
    groupby-transform(min); the rep cross-pairing is a per-bucket
    self-merge (C-level), upper-triangled by id order.
    """
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                          "id_b": pd.Series([], dtype=object),
                          "same_sig": pd.Series([], dtype=bool)})
    if not len(g):
        return empty
    key = ["band_id", "band_hash"]
    g = g.drop_duplicates([*key, "doc_id"])
    rep = g.groupby([*key, "sig_hash"], sort=False)["doc_id"].transform("min")
    chain = g["doc_id"].to_numpy() != rep.to_numpy()
    chain_pairs = pd.DataFrame({
        "id_a": rep.to_numpy()[chain],
        "id_b": g["doc_id"].to_numpy()[chain],
        "same_sig": True,
    })
    rep_df = g.assign(_rep=rep)[[*key, "_rep"]].drop_duplicates()
    m = rep_df.merge(rep_df, on=key)
    cross = m[m["_rep_x"] < m["_rep_y"]]
    cross_pairs = pd.DataFrame({
        "id_a": cross["_rep_x"].to_numpy(),
        "id_b": cross["_rep_y"].to_numpy(),
        "same_sig": False,
    })
    out = pd.concat([chain_pairs, cross_pairs], ignore_index=True)
    return out if len(out) else empty


_BUCKET_SHARDS = 32

# signature-row cutoff for the single-task pairing fast path: below it,
# ONE worker task runs the whole bucket pass (pandas groupby inside) on
# the materialized signature blocks — no shuffle, and cross-band pair
# dedupe happens in the same task for free. Above it, the bucket space
# is sharded coarsely and a sort shuffle co-locates each shard
# (two-level grouping). Like the union-find cutoff, the switch never
# changes output — only where the grouping work runs.
_SINGLE_TASK_SIG_LIMIT = 2_000_000


@ray.remote
def _single_task_pairs(pair_fn, local_dedupe, *blocks) -> pa.Table:
    frames = []
    for b in blocks:
        if isinstance(b, pd.DataFrame):
            frames.append(b)
        elif b.num_rows:
            frames.append(b.to_pandas())
    df = (pd.concat(frames, ignore_index=True) if frames
          else pd.DataFrame())
    out = pair_fn(df) if len(df) else pd.DataFrame()
    if local_dedupe is not None and len(out):
        out = local_dedupe(out)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def _bucketed_pairs(
    sig: ray.data.Dataset, pair_fn, local_dedupe=None,
    single_task_limit: int = _SINGLE_TASK_SIG_LIMIT,
) -> tuple[ray.data.Dataset, bool]:
    """Candidate pairs from LSH rows; pairs never land on the driver.

    Returns ``(pairs, deduped)`` — ``deduped`` is True when the
    single-task path already applied ``local_dedupe`` in the worker."""
    sig = sig.materialize()
    if sig.count() <= single_task_limit:
        refs = [ref for bundle in sig.iter_internal_ref_bundles()
                for ref, _meta in bundle.blocks]
        out = _single_task_pairs.remote(pair_fn, local_dedupe, *refs)
        return ray.data.from_arrow_refs([out]), local_dedupe is not None

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        key = (df["band_hash"].to_numpy(np.uint64)
               * np.uint64(31) + df["band_id"].to_numpy(np.uint64))
        df["_bshard"] = (key % np.uint64(_BUCKET_SHARDS)).astype(np.int32)
        return df

    pairs = (
        sig.map_batches(add_shard, batch_format="pandas")
        .groupby("_bshard")
        .map_groups(pair_fn, batch_format="pandas")
    )
    return pairs, False


# Ray Data (2.49) quirk this module must design around: map_batches
# SKIPS empty blocks, replacing them with zero-COLUMN blocks, and
# Dataset.join fails on any input containing such a block ("No match
# ... for key field reference"). repartition() merges blocks and drops
# the zero-column empties, so every dataset that feeds a join gets a
# repartition as its LAST op (a later map would re-introduce the
# hazard on the 0-row splits repartition can produce).
_PAIR_PARTITIONS = 8


def _dedupe_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Collapse band-replicated candidate pairs to one row per (id_a,
    id_b). A pair's ``same_sig`` flag is a function of the pair, so any
    surviving replica carries the right value (Max is over identical
    values; it exists to reduce, not to choose)."""
    from ray.data.aggregate import Max

    def as_int(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("same_sig"), "same_sig",
            pc.cast(t["same_sig"], pa.int8()),
        )

    agg = (
        pairs.map_batches(as_int, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Max("same_sig", alias_name="same_sig"))
    )
    return agg.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("same_sig"), "same_sig",
            pc.cast(t["same_sig"], pa.bool_()),
        ),
        batch_format="pyarrow",
    ).repartition(_PAIR_PARTITIONS)


# --- distributed clustering --------------------------------------------


def propagate_min_labels(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int = 8,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Connected-component labels of the pair graph, distributed.

    Returns ``(node, label)`` for every node that appears in a pair,
    with ``label`` = the component's minimum node id — exactly what
    :func:`losers_from_pairs` computes single-process (kept as the test
    oracle).

    Min-label propagation: every round each node takes the min of its
    own label and all neighbors' labels (one hash join edges⋈labels +
    one ``groupby(node)`` with a Min aggregate). Labels only decrease,
    so the round count is bounded by the largest component's diameter —
    near-dup graphs post same-signature-collapse are star-like and
    converge in 2-3 rounds. Convergence is detected from the same
    aggregate (a node changed iff new < own), so the driver sees one
    scalar per round and never the labels themselves.
    """
    from ray.data.aggregate import Min, Max

    def to_edges(t: pa.Table) -> pa.Table:
        fwd = pa.table({"src": t[id_a], "dst": t[id_b]})
        rev = pa.table({"src": t[id_b], "dst": t[id_a]})
        return pa.concat_tables([fwd, rev])

    # repartition-as-last-op: both join inputs must be free of the
    # zero-column empty blocks map_batches leaves behind (see
    # _PAIR_PARTITIONS note)
    edges = (
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    # initial labels: every distinct endpoint labels itself. Labels
    # keep the column name "src" so the per-round join needs no rename
    # map between the laundering repartition and the join.
    labels = (
        edges.groupby("src").count()
        .map_batches(
            lambda t: pa.table({"src": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )

    for _ in range(max_rounds):
        # neighbor messages: edge (src->dst) delivers label(src) to dst
        msgs = edges.join(
            labels, "inner", num_partitions=num_partitions, on=("src",)
        ).map_batches(
            lambda t: pa.table({
                "src": t["dst"],
                "label": t["label"],
                "own_label": pa.nulls(t.num_rows, type=t["label"].type),
            }),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda t: pa.table({"src": t["src"], "label": t["label"],
                                "own_label": t["label"]}),
            batch_format="pyarrow",
        )
        agg = (
            msgs.union(own)
            .groupby("src")
            .aggregate(Min("label", alias_name="new_label"),
                       Max("own_label", alias_name="old_label"))
            .materialize()
        )
        changed = agg.map_batches(
            lambda t: pa.table({"c": pa.array(
                [int(pc.sum(pc.cast(pc.less(t["new_label"], t["old_label"]),
                                    pa.int64())).as_py() or 0)],
                type=pa.int64())}),
            batch_format="pyarrow",
        ).sum("c")
        labels = agg.map_batches(
            lambda t: pa.table({"src": t["src"], "label": t["new_label"]}),
            batch_format="pyarrow",
        ).repartition(num_partitions).materialize()
        if not changed:
            return labels.map_batches(
                lambda t: pa.table({"node": t["src"], "label": t["label"]}),
                batch_format="pyarrow",
            )
    raise RuntimeError(
        f"label propagation did not converge in {max_rounds} rounds "
        "(component diameter exceeds the bound; raise max_rounds)"
    )


# broadcast-vs-join switch for the final loser drop: below this many
# loser ids the id set ships via ray.put (no shuffle of the big side);
# above it a partitioned anti join avoids a driver-resident id set
_BROADCAST_LOSERS_LIMIT = 2_000_000


def drop_cluster_losers(
    ds: ray.data.Dataset,
    labels: ray.data.Dataset,
    id_col: str,
    broadcast_limit: int = _BROADCAST_LOSERS_LIMIT,
    buckets: int = 16,
) -> ray.data.Dataset:
    """Drop every row whose id is a non-representative cluster member
    (``node != label``), keeping the min-id representative."""
    from .join import semi_join

    def pick_losers(t: pa.Table) -> pa.Table:
        ids = pc.filter(t["node"], pc.not_equal(t["node"], t["label"]))
        # the join marker is built here, in the same map, so the
        # laundering repartition below stays the dataset's last op
        return pa.table({
            id_col: ids,
            "_loser": pa.array(np.ones(len(ids), dtype=np.int8)),
        })

    losers = (
        labels.map_batches(pick_losers, batch_format="pyarrow")
        .repartition(buckets)
        .materialize()
    )
    n = losers.count()
    if n == 0:
        return ds
    if n <= broadcast_limit:
        ids = losers.to_pandas()[id_col].tolist()  # ids only, never payloads
        return semi_join(ds, ids, id_col, anti=True)
    # scale path: partitioned left-outer join + null-marker filter
    joined = ds.join(losers, "left_outer", num_partitions=buckets,
                     on=(id_col,))
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["_loser"])).drop_columns(["_loser"]),
        batch_format="pyarrow",
    )


# pair-count cutoff for single-task clustering: below it, one Ray task
# union-finds the whole (ids-only) pair set — pairs never touch the
# driver, and the fixed cost is one task instead of 2-4 shuffle rounds.
# Above it, label propagation shards the work.
_TASK_UNIONFIND_PAIR_LIMIT = 2_000_000


@ray.remote
def _unionfind_labels(*blocks) -> pa.Table:
    """Single-task component labels over pair blocks: (node, label)
    for every endpoint, label = the component's min id — the same
    contract as :func:`propagate_min_labels`."""
    uf = UnionFind()
    for t in blocks:
        if isinstance(t, pd.DataFrame):
            if len(t) == 0 or "id_a" not in t.columns:
                continue
            ab = zip(t["id_a"].tolist(), t["id_b"].tolist())
        else:
            if t.num_rows == 0 or "id_a" not in t.column_names:
                continue
            ab = zip(t.column("id_a").to_pylist(),
                     t.column("id_b").to_pylist())
        for a, b in ab:
            uf.union(a, b)
    nodes = sorted(uf.parent)
    return pa.table({
        "node": pa.array(nodes),
        "label": pa.array([uf.find(x) for x in nodes]),
    })


def component_labels(
    pairs: ray.data.Dataset,
    task_limit: int = _TASK_UNIONFIND_PAIR_LIMIT,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Connected-component labels of a pair graph: ``(node, label)``
    with label = the component's min node id.

    Same cutoff switch as :func:`cluster_and_drop`: small pair sets
    label in ONE worker task (union-find over block refs — pairs never
    touch the driver, and the fixed cost is one task instead of the
    2-4 shuffle rounds each propagation round costs); large ones run
    distributed :func:`propagate_min_labels`. Both keep min-id labels,
    so the switch never changes output."""
    pairs = pairs.materialize()
    if pairs.count() <= task_limit:
        refs = [ref for bundle in pairs.iter_internal_ref_bundles()
                for ref, _meta in bundle.blocks]
        return ray.data.from_arrow_refs([_unionfind_labels.remote(*refs)])
    return propagate_min_labels(pairs, num_partitions=num_partitions)


@ray.remote
def _unionfind_losers(*blocks) -> pa.Array:
    """Single-task clustering over pair blocks (Arrow or pandas —
    map_groups emits pandas blocks); returns the loser ids."""
    uf = UnionFind()
    for t in blocks:
        if isinstance(t, pd.DataFrame):
            if len(t) == 0 or "id_a" not in t.columns:
                continue
            ab = zip(t["id_a"].tolist(), t["id_b"].tolist())
        else:
            if t.num_rows == 0 or "id_a" not in t.column_names:
                continue  # zero-column empties (see _PAIR_PARTITIONS note)
            ab = zip(t.column("id_a").to_pylist(),
                     t.column("id_b").to_pylist())
        for a, b in ab:
            uf.union(a, b)
    losers = sorted(x for x in uf.parent if uf.find(x) != x)
    return pa.array(losers)


def cluster_and_drop(pairs: ray.data.Dataset, ds: ray.data.Dataset,
                     id_col: str,
                     task_limit: int = _TASK_UNIONFIND_PAIR_LIMIT,
                     ) -> ray.data.Dataset:
    """Verified pairs -> component labels -> drop non-representatives.

    Small pair sets cluster in ONE Ray worker task (union-find over the
    id pairs; the driver only passes block refs around); large ones use
    :func:`propagate_min_labels`. Both keep the representative = the
    component's min id, so the switch never changes output."""
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ds
    if pairs.count() <= task_limit:
        refs = [ref for bundle in pairs.iter_internal_ref_bundles()
                for ref, _meta in bundle.blocks]
        losers_ref = _unionfind_losers.remote(*refs)

        def mask(batch: pa.Table) -> pa.Table:
            losers = ray.get(losers_ref)
            if len(losers) == 0:
                return batch
            m = pc.fill_null(pc.is_in(batch[id_col], losers), False)
            return batch.filter(pc.invert(m))

        return ds.map_batches(mask, batch_format="pyarrow")
    labels = propagate_min_labels(pairs)
    return drop_cluster_losers(ds, labels, id_col)


# --- single-process clustering oracle (kept for tests) ------------------


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
    cluster is a loser (the kept representative is the min id).

    Single-process oracle for :func:`propagate_min_labels` — tests pin
    the distributed labels against this."""
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


# --- MinHash end-to-end --------------------------------------------------


def minhash_candidates(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 7,
    concurrency: int | None = None,
    shingle: str = "word",
) -> ray.data.Dataset:
    """Candidate near-dup pairs via MinHash banding, one row per pair.

    ``same_sig=True`` pairs share the full signature (auto-verified);
    the rest need exact-Jaccard verification. Returns a Dataset —
    pairs stay distributed.

    The signature stage runs as plain tasks (the stage instance — a
    few KB of permutation params — is built once on the driver and
    ships with each task): per-pipeline actor-pool spin-up costs more
    than it saves when the only per-actor state is two small arrays.
    ``concurrency`` switches back to an actor pool when given."""
    stage_kwargs = {
        "text_col": text_col, "id_col": id_col, "num_perm": num_perm,
        "bands": bands, "ngram": ngram, "seed": seed, "shingle": shingle,
    }
    if concurrency:
        sig = ds.map_batches(
            MinHashStage, fn_constructor_kwargs=stage_kwargs,
            batch_format="pyarrow", concurrency=(1, concurrency),
        )
    else:
        sig = ds.map_batches(MinHashStage(**stage_kwargs),
                             batch_format="pyarrow")

    def local_dedupe(df: pd.DataFrame) -> pd.DataFrame:
        # a same_sig=True replica wins over an unverified one
        return (df.sort_values(["id_a", "id_b", "same_sig"],
                               ascending=[True, True, False])
                .drop_duplicates(["id_a", "id_b"]))

    pairs, deduped = _bucketed_pairs(sig, _shard_bucket_pairs, local_dedupe)
    return pairs if deduped else _dedupe_pairs(pairs)


def _join_pair_payloads(
    pairs: ray.data.Dataset,
    ds: ray.data.Dataset,
    id_col: str,
    payload_col: str,
    buckets: int = 8,
) -> ray.data.Dataset:
    """Attach each pair endpoint's payload (text / embedding) via two
    partitioned hash joins — only candidate payloads move, none to the
    driver. Output columns: id_a, id_b, _payload_a, _payload_b."""
    from .join import hash_join

    side_a = ds.select_columns([id_col, payload_col]).map_batches(
        lambda t: t.rename_columns(["id_a", "_payload_a"]),
        batch_format="pyarrow",
    )
    side_b = ds.select_columns([id_col, payload_col]).map_batches(
        lambda t: t.rename_columns(["id_b", "_payload_b"]),
        batch_format="pyarrow",
    )
    out = hash_join(pairs, side_a, on="id_a", buckets=buckets)
    return hash_join(out, side_b, on="id_b", buckets=buckets)


class PairJaccardVerifier:
    """Pair acceptance by exact shingle-set Jaccard. Used per joined
    batch on the scale path and per pair on the single-task path;
    scalar shingling is inherent to the metric either way."""

    def __init__(self, ngram: int, shingle: str, threshold: float):
        self.ngram, self.shingle, self.threshold = ngram, shingle, threshold

    def accept(self, a: str | None, b: str | None) -> bool:
        return jaccard(
            _shingles(a or "", self.ngram, self.shingle),
            _shingles(b or "", self.ngram, self.shingle),
        ) >= self.threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch["_payload_a"].to_pylist()
        tb = batch["_payload_b"].to_pylist()
        keep = [self.accept(a, b) for a, b in zip(ta, tb)]
        return batch.select(["id_a", "id_b"]).filter(
            pa.array(keep, type=pa.bool_())
        )


# pair-count cutoff for single-task verification: below it, candidate
# texts are broadcast-filtered (semi join — ids only ever touch the
# driver) and ONE worker task verifies every pair; above it, texts are
# hash-joined onto the pair set and verified per batch (the scale path)
_TASK_VERIFY_PAIR_LIMIT = 100_000


@ray.remote
def _verify_pairs_task(verifier, n_pair_blocks, *blocks) -> pa.Table:
    def cols(b, names):
        if isinstance(b, pd.DataFrame):
            return [b[n].tolist() for n in names] if len(b) else [[] for _ in names]
        if b.num_rows == 0 or names[0] not in b.column_names:
            return [[] for _ in names]
        return [b.column(n).to_pylist() for n in names]

    texts: dict = {}
    for b in blocks[n_pair_blocks:]:
        ids, ts = cols(b, ["_vid", "_vtext"])
        texts.update(zip(ids, ts))
    out_a, out_b = [], []
    for b in blocks[:n_pair_blocks]:
        ids_a, ids_b = cols(b, ["id_a", "id_b"])
        for a, bb in zip(ids_a, ids_b):
            if verifier.accept(texts.get(a), texts.get(bb)):
                out_a.append(a)
                out_b.append(bb)
    return pa.table({"id_a": pa.array(out_a), "id_b": pa.array(out_b)})


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
    the rest are verified with exact n-gram Jaccard inside
    ``map_batches`` after a hash join of the texts onto the pair set."""
    cand = minhash_candidates(ds, text_col, id_col, num_perm, bands, ngram,
                              seed, shingle=shingle).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return ds

    def split(t: pa.Table, want_same: bool) -> pa.Table:
        m = t["same_sig"] if want_same else pc.invert(t["same_sig"])
        return t.filter(m).select(["id_a", "id_b"])

    direct = cand.map_batches(lambda t: split(t, True),
                              batch_format="pyarrow")
    verifier = PairJaccardVerifier(ngram, shingle, jaccard_threshold)

    if n_cand <= _TASK_VERIFY_PAIR_LIMIT:
        # single-task verify: ids (only) come back for the broadcast
        # text filter; texts flow storage -> one worker, never the driver
        from .join import semi_join

        unv = cand.map_batches(lambda t: split(t, False),
                               batch_format="pyarrow").materialize()
        unv_ids = unv.to_pandas()
        ids = pd.concat([unv_ids["id_a"], unv_ids["id_b"]
                         ]).drop_duplicates().tolist()
        sub = semi_join(ds.select_columns([id_col, text_col]), ids, id_col
                        ).map_batches(
            lambda t: t.rename_columns(["_vid", "_vtext"]),
            batch_format="pyarrow",
        ).materialize()
        pair_refs = [r for bun in unv.iter_internal_ref_bundles()
                     for r, _m in bun.blocks]
        text_refs = [r for bun in sub.iter_internal_ref_bundles()
                     for r, _m in bun.blocks]
        verified = ray.data.from_arrow_refs([
            _verify_pairs_task.remote(verifier, len(pair_refs),
                                      *pair_refs, *text_refs)
        ])
    else:
        # scale path: repartition (the split map re-creates the
        # zero-column hazard on empty splits, and this feeds a join),
        # hash-join texts onto pairs, verify per batch
        unverified = cand.map_batches(
            lambda t: split(t, False), batch_format="pyarrow"
        ).repartition(_PAIR_PARTITIONS)
        verified = _join_pair_payloads(
            unverified, ds, id_col, text_col
        ).map_batches(verifier, batch_format="pyarrow")
    return cluster_and_drop(direct.union(verified), ds, id_col)


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


def simhash64_batch(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Whole-block SimHash: one fingerprint per input string, no
    per-doc Python loop.  Each distinct token in the block is hashed
    ONCE (shared vocabulary across docs — strictly less hashing than
    the scalar path), per-(doc, token) counts come from one np.unique
    over composite int64 keys, and the 64 bit-majority sums are 64
    bincounts over the pair rows.  Bit-identical to ``simhash64`` per
    doc (pinned by tests/test_neardup.py)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(texts, "")))
    flat = toks.flatten()
    doc_idx = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    doc_idx = doc_idx.filter(mask).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if isinstance(enc, pa.ChunkedArray):  # chunk-size edge
        vocab_arr = enc.chunk(0).dictionary
    else:
        vocab_arr = enc.dictionary
    vocab = len(vocab_arr)
    tok_hash = hash_strings(vocab_arr.to_numpy(zero_copy_only=False))
    keys, counts = np.unique(doc_idx * vocab + codes,
                             return_counts=True)
    d = keys // vocab
    bits = np.unpackbits(
        tok_hash[keys % vocab].view(np.uint8).reshape(-1, 8),
        axis=1, bitorder="little")  # (n_pairs, 64)
    contrib = (bits.astype(np.int64) * 2 - 1) * counts.astype(
        np.int64)[:, None]
    score = np.empty((n_docs, 64), dtype=np.float64)
    for j in range(64):
        score[:, j] = np.bincount(d, weights=contrib[:, j],
                                  minlength=n_docs)
    fp_bits = (score > 0).astype(np.uint8)
    return np.packbits(fp_bits, axis=1,
                       bitorder="little").view(np.uint64).ravel()


class SimHashStage:
    """Actor-pool stage: text -> (doc_id, simhash, band_id, band_hash).

    Fingerprints come from one ``simhash64_batch`` call per block; the
    bands expansion is pure index arithmetic (repeat/tile), so the
    whole stage is loop-free."""

    def __init__(self, text_col: str, id_col: str, bands: int = 4):
        self.text_col, self.id_col, self.bands = text_col, id_col, bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = simhash64_batch(batch[self.text_col])
        n_docs = len(fps)
        width = 64 // self.bands
        mask = np.uint64((1 << width) - 1)
        doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64),
                            self.bands)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
        shifts = (band_id.astype(np.uint64) * np.uint64(width))
        band_hash = ((fps[doc_rep] >> shifts) & mask).astype(np.int64)
        ids = batch[self.id_col].combine_chunks() \
            if isinstance(batch[self.id_col], pa.ChunkedArray) \
            else batch[self.id_col]
        return pa.table(
            {
                "doc_id": ids.take(pa.array(doc_rep)),
                "simhash": pa.array(fps[doc_rep]),
                "band_id": pa.array(band_id),
                "band_hash": pa.array(band_hash),
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
    (pigeonhole), so banding loses no candidates. Verification happens
    inside the bucket pass (fingerprints ride along with the LSH rows);
    clustering is distributed label propagation.
    """
    # plain tasks: the stage instance holds three scalars (see
    # minhash_candidates note on actor pools vs tasks)
    sig = ds.map_batches(
        SimHashStage(text_col=text_col, id_col=id_col, bands=bands),
        batch_format="pyarrow",
    )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: per-bucket self-merge (C-level) then one XOR +
        unpackbits popcount over every candidate pair at once."""
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object)})
        if not len(g):
            return empty
        key = ["band_id", "band_hash"]
        g = g.drop_duplicates([*key, "doc_id"])[[*key, "doc_id", "simhash"]]
        m = g.merge(g, on=key)
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty
        x = (m["simhash_x"].to_numpy(np.uint64)
             ^ m["simhash_y"].to_numpy(np.uint64))
        ham = np.unpackbits(x.view(np.uint8)).reshape(len(m), 8 * 8).sum(axis=1)
        keep = ham <= max_hamming
        out = pd.DataFrame({"id_a": m["doc_id_x"].to_numpy()[keep],
                            "id_b": m["doc_id_y"].to_numpy()[keep]})
        return out.drop_duplicates() if len(out) else empty

    pairs, _ = _bucketed_pairs(
        sig, shard_pairs,
        local_dedupe=lambda df: df.drop_duplicates(["id_a", "id_b"]),
    )
    return cluster_and_drop(pairs, ds, id_col)


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
    length bucket); each block's pass runs as one distributed
    ``map_groups`` task — the dataset is never materialized on the
    driver; only the (small, by construction) matching pair list is.
    ``block_col=None`` compares everything in ONE task — only for small
    inputs; at scale always provide a block key.
    Returns (id_a, id_b, jaccard) sorted.
    """
    cols = [id_col, text_col] + ([block_col] if block_col else [])
    sub = ds.select_columns(cols)
    if block_col is None:
        block_col = "_block"
        sub = sub.map_batches(
            lambda t: t.append_column(
                "_block", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow",
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All-pairs pass with an EXACT size-ratio prune: J(A,B) <=
        min(|A|,|B|)/max(|A|,|B|), so after sorting by shingle-set size
        each doc only compares against the window of docs within
        1/threshold of its size — no qualifying pair is ever skipped,
        and for threshold 0.8 the quadratic work typically drops by an
        order of magnitude."""
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        shingle_sets = [char_ngrams(t or "", ngram) for t in g[text_col]]
        sizes = np.array([len(s) for s in shingle_sets], dtype=np.int64)
        order = np.argsort(sizes, kind="stable")
        out = []
        # empty shingle sets are mutually jaccard 1.0 (and 0 vs any
        # non-empty set) — handled apart from the ratio window
        zeros = [int(p) for p in order if sizes[p] == 0]
        for x in range(len(zeros)):
            for y in range(x + 1, len(zeros)):
                zi, zj = ids[zeros[x]], ids[zeros[y]]
                a, b = (zi, zj) if zi <= zj else (zj, zi)
                out.append((a, b, 1.0, 0, 0))
        for a_pos in range(len(order)):
            i = order[a_pos]
            if sizes[i] == 0:
                continue
            max_size = sizes[i] / threshold
            for b_pos in range(a_pos + 1, len(order)):
                j = order[b_pos]
                if sizes[j] > max_size:
                    break  # sorted by size: nothing further qualifies
                # integer intersection/union alongside the double: the
                # ratio of the same two ints is bit-identical in any
                # engine, which is what lets a SQL oracle hash-match
                inter = len(shingle_sets[i] & shingle_sets[j])
                uni = int(sizes[i] + sizes[j]) - inter
                sim = inter / uni
                if sim >= threshold:
                    a, b = (ids[i], ids[j]) if ids[i] <= ids[j] else (ids[j], ids[i])
                    out.append((a, b, sim, inter, uni))
        # pin id dtypes too: an empty block otherwise yields object
        # columns, which Ray's block size estimator warns on noisily
        return pd.DataFrame(
            out, columns=["id_a", "id_b", "jaccard", "inter", "uni"],
        ).astype({"id_a": g[id_col].dtype, "id_b": g[id_col].dtype,
                  "jaccard": "float64", "inter": "int64", "uni": "int64"})

    pairs = (
        sub.groupby(block_col)
        .map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty and "id_a" not in pairs.columns:
        # an all-empty map_groups output collapses to a zero-column
        # frame on the driver; restore the contract schema
        pairs = pd.DataFrame(columns=["id_a", "id_b", "jaccard",
                                      "inter", "uni"])
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> pd.DataFrame:
    """Exact all-pairs n-gram CONTAINMENT >= threshold within blocks —
    the excerpt/quote detector that resemblance (Jaccard) misses: a
    short document pasted inside a long one has low Jaccard but
    containment ~1.0 of the smaller shingle set,
    ``C = |S(A) ∩ S(B)| / min(|S(A)|, |S(B)|)`` (Broder's containment,
    symmetrized by taking the smaller side as the contained one).

    Same distributed shape as :func:`ngram_jaccard_pairs` (one
    ``map_groups`` task per block, only matching pairs reach the
    driver) but WITHOUT the size-ratio prune — containment is
    size-asymmetric by design (a tiny excerpt can sit inside any
    larger document), so the block key alone bounds the quadratic
    pass; at scale use a finer block (lang x source) than Jaccard
    needs. Documents whose shingle set is empty are skipped (they
    contain nothing and are contained in everything, vacuously).
    Returns (id_a, id_b, containment, inter, min_sz) sorted.
    """
    cols = [id_col, text_col] + ([block_col] if block_col else [])
    sub = ds.select_columns(cols)
    if block_col is None:
        block_col = "_block"
        sub = sub.map_batches(
            lambda t: t.append_column(
                "_block", pa.array(np.zeros(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow",
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        shingle_sets = [char_ngrams(t or "", ngram) for t in g[text_col]]
        out = []
        nonempty = [p for p in range(len(ids)) if shingle_sets[p]]
        for x in range(len(nonempty)):
            i = nonempty[x]
            for y in range(x + 1, len(nonempty)):
                j = nonempty[y]
                inter = len(shingle_sets[i] & shingle_sets[j])
                min_sz = min(len(shingle_sets[i]), len(shingle_sets[j]))
                # integer numerator/denominator beside the double: the
                # ratio of the same two ints is bit-identical anywhere
                c = inter / min_sz
                if c >= threshold:
                    a, b = ((ids[i], ids[j]) if ids[i] <= ids[j]
                            else (ids[j], ids[i]))
                    out.append((a, b, c, inter, min_sz))
        return pd.DataFrame(
            out, columns=["id_a", "id_b", "containment", "inter", "min_sz"],
        ).astype({"id_a": g[id_col].dtype, "id_b": g[id_col].dtype,
                  "containment": "float64", "inter": "int64",
                  "min_sz": "int64"})

    pairs = (
        sub.groupby(block_col)
        .map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty and "id_a" not in pairs.columns:
        pairs = pd.DataFrame(columns=["id_a", "id_b", "containment",
                                      "inter", "min_sz"])
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


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
        # the vector rides along: verification happens inside the
        # bucket groupby (list<double> columns shuffle fine through a
        # sort exchange but are unsupported as acero join payloads)
        return pa.table(
            {
                "vec_id": batch[self.id_col],
                "bucket": pa.array(bucket_ids),
                "embedding": batch[self.emb_col],
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
    is >= threshold. LSH hyperplane buckets bound the pairwise work;
    exact cosine verifies every candidate pair with a vectorized
    ``X @ X.T`` inside the distributed bucket pass (vectors ride the
    groupby shuffle — list<double> is unsupported as an acero join
    payload, so pair+verify happen in one pass instead of a re-join)."""
    first = ds.take(1)
    dim = len(first[0][emb_col])
    # plain tasks: the plane matrix is dim x planes floats (KBs)
    lsh = ds.map_batches(
        HyperplaneLshStage(emb_col=emb_col, id_col=id_col, planes=planes,
                           dim=dim, seed=seed),
        batch_format="pyarrow",
    )

    # verified pairs per bucket (buckets are expected tiny; the
    # pandas-groupby-inside-map_groups two-level pattern again)
    def bucket_verified_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": []}
        for _, sub in g.groupby("bucket", sort=False):
            sub = sub.drop_duplicates("vec_id").sort_values("vec_id")
            if len(sub) < 2:
                continue
            ids = sub["vec_id"].to_numpy()
            x = np.asarray(sub["embedding"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(x, axis=1)
            denom = np.outer(norms, norms)
            cos = np.divide(x @ x.T, denom, out=np.zeros_like(denom),
                            where=denom > 0)
            i, j = np.triu_indices(len(ids), k=1)
            hit = cos[i, j] >= threshold
            out["id_a"].extend(ids[i[hit]])
            out["id_b"].extend(ids[j[hit]])
        return pd.DataFrame(out, dtype=object)

    # single-task fast path mirrors _bucketed_pairs, with a lower row
    # cutoff because each row carries the full vector
    lsh = lsh.materialize()
    if lsh.count() <= 200_000:
        refs = [ref for bundle in lsh.iter_internal_ref_bundles()
                for ref, _meta in bundle.blocks]
        verified = ray.data.from_arrow_refs(
            [_single_task_pairs.remote(bucket_verified_pairs, None, *refs)]
        )
        return cluster_and_drop(verified, ds, id_col)

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_bshard"] = (
            df["bucket"].to_numpy(np.uint64) % np.uint64(_BUCKET_SHARDS)
        ).astype(np.int32)
        return df

    verified = (
        lsh.map_batches(add_shard, batch_format="pandas")
        .groupby("_bshard")
        .map_groups(bucket_verified_pairs, batch_format="pandas")
    )
    return cluster_and_drop(verified, ds, id_col)
