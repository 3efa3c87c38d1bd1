"""Shared worker-side broadcast utilities.

Two idioms that every broadcast stage in the engine needs, kept in ONE
place so a fix propagates everywhere:

* :func:`broadcast_get` — the "``ray.get`` once per worker process"
  cache for ``ray.put`` broadcast objects. A plain-task stage that
  fetched its broadcast side per batch would deserialize it hundreds of
  times per worker; an actor pool gets load-once for free but pays
  spin-up. This cache gives plain tasks the actor-pool fetch behavior.
* :func:`asof_merge_batch` — the as-of merge kernel (sort by event ts,
  backward ``pd.merge_asof`` against a pre-sorted versioned side,
  restore input order, fill defaults) used by the broadcast as-of join
  (both its plain-task and actor-pool forms) and the streaming
  engine's metadata enrichment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .timeops import series_ts_us

# keyed by ObjectRef.hex(); bounded so stale broadcast versions
# (e.g. per-epoch metadata slices) age out of worker heaps
_CACHE: dict[str, object] = {}


def broadcast_get(ref, cap: int = 4):
    """Fetch a broadcast object once per worker process."""
    key = ref.hex()
    val = _CACHE.get(key)
    if val is None:
        import ray

        while len(_CACHE) >= cap:
            _CACHE.pop(next(iter(_CACHE)))
        val = _CACHE[key] = ray.get(ref)
    return val


def sort_versioned(small: pd.DataFrame, on: str,
                   version_ts_col: str) -> pd.DataFrame:
    """Normalize a versioned small side for :func:`asof_merge_batch`:
    version timestamps to int us in ``_version_ts``, rows sorted by
    (version ts, key)."""
    small = small.copy()
    small["_version_ts"] = series_ts_us(small[version_ts_col])
    return small.drop(columns=[version_ts_col]).sort_values(
        ["_version_ts", on], kind="mergesort"
    )


def asof_merge_batch(batch: pd.DataFrame, right: pd.DataFrame, on: str,
                     ts_col: str, defaults: dict | None,
                     direction: str = "backward") -> pd.DataFrame:
    """As-of merge of one batch against a pre-sorted versioned side
    (``right`` as produced by :func:`sort_versioned`), preserving the
    batch's row order and filling absent matches with defaults.
    ``direction="backward"`` takes the latest version at-or-before each
    row's ts (metadata enrichment); ``"forward"`` takes the earliest
    at-or-after (next-occurrence lookup)."""
    order = np.arange(len(batch))
    left = batch.assign(_order=order, _ts=series_ts_us(batch[ts_col]))
    left = left.sort_values("_ts", kind="mergesort")
    out = pd.merge_asof(
        left, right, left_on="_ts", right_on="_version_ts",
        by=on, direction=direction,
    )
    out = out.sort_values("_order", kind="mergesort").drop(
        columns=["_order", "_ts", "_version_ts"]
    )
    for col, val in (defaults or {}).items():
        if col in out.columns:
            out[col] = out[col].fillna(val)
    return out.reset_index(drop=True)
