"""Deterministic vectorized key hashing / sharding.

Python's builtin ``hash`` is per-process salted, so every shuffle key in
this engine goes through ``pandas.util.hash_array`` (SipHash with a
pinned key) — stable across processes, runs, and cluster layouts, which
is what makes checkpoint/resume and two-cluster-size determinism hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "0123456789123456"  # pandas default, pinned explicitly


def hash_strings(values: np.ndarray | list[str]) -> np.ndarray:
    """uint64 deterministic hash of a string array (vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def shard_of(values: np.ndarray | list[str], shards: int) -> np.ndarray:
    """Stable shard id in ``[0, shards)`` for each key."""
    return (hash_strings(values) % np.uint64(shards)).astype(np.int64)


def add_shard_column(
    batch: pa.Table, key_col: str, shards: int, out_col: str = "_shard"
) -> pa.Table:
    """map_batches helper: append the shard id of ``key_col``."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    return batch.append_column(out_col, pa.array(shard_of(keys, shards)))


def multiplicative_hash_u32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash of integer ids into [0, 2^32) —
    deterministic, order-free, and exactly reproducible in ANSI SQL as
    ``(id * 2654435761) % 4294967296``. THE one copy of this
    load-bearing constant: deterministic_sample, split/balance queries
    and their DuckDB oracles all key off it."""
    return ((ids.astype(np.uint64) * np.uint64(2654435761))
            & np.uint64(0xFFFFFFFF))


def deterministic_sample(
    ds, id_col: str, n: int, columns: list[str] | None = None
):
    """Layout-independent n-row sample of a Dataset as pandas.

    ``Dataset.limit(n)`` is NOT stable across runs: which rows arrive
    first depends on block completion order, so any model trained on a
    ``limit`` sample (IVF centroids, k-means init) silently varies run
    to run. This sampler keys each row by a multiplicative hash of
    ``id_col`` and keeps the globally smallest ``n`` — a uniform-ish
    pseudo-random subset that is a pure function of the ids: same input
    rows -> same sample, regardless of block layout, cluster size, or
    scheduling. Per-batch partial bottom-n keeps the driver merge
    output-sized.
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        if np.issubdtype(ids.dtype, np.integer):
            h = multiplicative_hash_u32(ids)
        else:
            h = hash_strings(ids)
        df = df.assign(_h=h.astype(np.uint64))
        return df.nsmallest(min(n, len(df)), ["_h", id_col])

    if columns is not None:
        ds = ds.select_columns(columns)
    reduced = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = reduced.nsmallest(min(n, len(reduced)), ["_h", id_col])
    return out.drop(columns=["_h"]).reset_index(drop=True)
