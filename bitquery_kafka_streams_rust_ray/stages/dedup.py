"""Exact and windowed deduplication as Dataset operators (T1/T2 analogs).

Batch-complete variants of the streaming dedup: the whole input is
available, so dedup is one hash shuffle on the key followed by a
vectorized per-shard pass. Partitioning contract: all rows of a key land
in one shard (``crc``-stable hash, ``stages.hashing``), so per-key
sequential semantics hold without any cross-shard coordination; shard
count bounds the size of the largest group a single task must sort.

Callers should project away wide columns (``html``) *before* deduping —
the shuffle moves every surviving column.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import ray.data

from .hashing import add_shard_column
from .timeops import series_ts_us

_SHARD = "_dedup_shard"


def exact_dedup(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    shards: int = 64,
) -> ray.data.Dataset:
    """Keep the first row per key, ordered by ``order_cols``.

    The columnar form of the reference's insert-if-absent signature set
    (``src/consumer.rs:235-248``) — without its clear-on-overflow data
    loss. "First" is deterministic: min over ``order_cols`` with the
    key as final tiebreak.
    """
    key_cols = list(key_cols)
    order_cols = list(order_cols)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols + key_cols, kind="mergesort")
        return g.drop_duplicates(subset=key_cols, keep="first").drop(columns=[_SHARD])

    return (
        ds.map_batches(
            lambda t: add_shard_column(t, key_cols[0], shards, _SHARD),
            batch_format="pyarrow",
        )
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )


def windowed_dedup(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    window_s: float,
    shards: int = 64,
    tiebreak_cols: Sequence[str] = (),
) -> ray.data.Dataset:
    """Event-time windowed dedup (MessageDeduplicator semantics).

    A row is a duplicate iff the *previous* sighting of its key is less
    than ``window`` before it (strict ``<``, deduplicator.rs:63); every
    sighting refreshes the stored timestamp (deduplicator.rs:65, 72), so
    the relevant predecessor is always the immediately preceding row in
    ts order — which makes the per-key pass a vectorized ``diff``.

    ``tiebreak_cols`` pins the order of equal-``ts`` rows within a key
    (e.g. an event id). Without it, which of two tied rows survives
    depends on block arrival order — nondeterministic across runs.
    """
    window_us = int(window_s * 1_000_000)
    sort_cols = [key_col, ts_col, *tiebreak_cols]

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        ts = series_ts_us(g[ts_col])
        same_key = g[key_col].eq(g[key_col].shift())
        delta = ts - ts.shift()
        dup = same_key & (delta < window_us)
        return g.loc[~dup].drop(columns=[_SHARD])

    return (
        ds.map_batches(
            lambda t: add_shard_column(t, key_col, shards, _SHARD),
            batch_format="pyarrow",
        )
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )
