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
