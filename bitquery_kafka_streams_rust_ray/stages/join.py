"""Joins and lookups (§2.5): broadcast, as-of, semi/anti, partitioned hash.

The reference never joins at runtime — its enrichment (token/market
metadata embedded in every trade, ``schemas/dex_block_message.proto:
14-18``) was pre-joined upstream. The north rule re-expresses that
enrichment as explicit joins:

- **broadcast join** — the small side (host metadata; Currency/DexInfo
  analog) is ``ray.put`` once and read once per actor, so it ships to
  each worker process once, never per batch, and no shuffle happens.
- **broadcast as-of join** — the versioned variant: latest metadata
  version with ``updated_ts <= warc_ts`` wins (the symbol-table
  semantics of the upstream producer).
- **semi/anti join** — broadcast key-set membership (the
  ``EventFilter.signatures`` allow-list analog, ``src/filters.rs:
  110-114``).
- **partitioned hash join** — both sides large: tag + union + hash
  shuffle on the key + per-group pandas merge. Used when the small-side
  assumption breaks; B buckets bound per-task memory.
- **partitioned as-of join** — the both-sides-large as-of: typed-null
  union + one hash co-partition + merge_asof per group. Assumes one
  key's history fits a worker; salt/range-split hot keys upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .broadcast import asof_merge_batch, broadcast_get, sort_versioned
from .hashing import add_shard_column, shard_of
from .timeops import series_ts_us


class _BroadcastJoiner:
    """Actor-pool stage: fetch the broadcast side once per actor."""

    def __init__(self, small_ref: ray.ObjectRef, on: str, how: str,
                 defaults: dict | None):
        self.small: pd.DataFrame = ray.get(small_ref)
        self.on = on
        self.how = how
        self.defaults = defaults or {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(self.small, on=self.on, how=self.how, sort=False)
        for col, val in self.defaults.items():
            if col in out.columns:
                out[col] = out[col].fillna(val)
        return out


def broadcast_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    on: str,
    how: str = "left",
    defaults: dict | None = None,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Left/inner join against a broadcast small side; no shuffle.

    ``defaults`` fills unmatched rows (e.g. ``{"category": "unknown"}``,
    mirroring the reference's null-safe ``unknown`` defaults,
    ``src/consumer.rs:316-327``).

    ``concurrency`` is the pool MAX: the (1, max) range autoscales, so
    a max above the cluster's CPU count degrades instead of
    deadlocking (a bare int would demand that many actors up front).
    """
    ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how,
                               "defaults": defaults},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class _BroadcastAsofJoiner:
    """As-of join against a broadcast *versioned* small side.

    The small side is pre-sorted by (key, version_ts) in ``__init__``
    (once per actor); each batch is sorted by event ts, merged with
    ``pd.merge_asof`` (backward: latest version <= event ts), and
    restored to input order.
    """

    def __init__(self, small_ref: ray.ObjectRef, on: str, ts_col: str,
                 version_ts_col: str, defaults: dict | None,
                 direction: str = "backward"):
        self.small = sort_versioned(ray.get(small_ref), on, version_ts_col)
        self.on = on
        self.ts_col = ts_col
        self.defaults = defaults or {}
        self.direction = direction

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return asof_merge_batch(batch, self.small, self.on, self.ts_col,
                                self.defaults, self.direction)


def broadcast_asof_join(
    ds: ray.data.Dataset,
    versioned_small: pd.DataFrame,
    on: str,
    ts_col: str,
    version_ts_col: str = "updated_ts",
    defaults: dict | None = None,
    concurrency: int | tuple[int, int] | None = 4,
    batch_size: int = 4096,
    direction: str = "backward",
) -> ray.data.Dataset:
    """Enrich each row with the latest small-side version at its ts
    (``direction="forward"`` flips to the earliest version at-or-after
    — the next-occurrence join).

    ``concurrency=None`` runs the join as plain tasks instead of an
    actor pool: the pre-sorted small side is ``ray.put`` once and each
    task fetches it from the local object store — no per-pipeline actor
    spin-up cost, which matters when a micro-batch driver builds a fresh
    Dataset per epoch.
    """
    if concurrency is None:
        ref = ray.put(sort_versioned(versioned_small, on, version_ts_col))
        defaults = defaults or {}

        def asof(batch: pd.DataFrame) -> pd.DataFrame:
            # broadcast_get: the sorted small side deserializes once per
            # worker process, not per batch
            return asof_merge_batch(batch, broadcast_get(ref), on,
                                    ts_col, defaults, direction)

        return ds.map_batches(asof, batch_format="pandas",
                              batch_size=batch_size)

    ref = ray.put(versioned_small)
    if isinstance(concurrency, int):
        # autoscaling range: a bare int demands a fixed-size pool up
        # front and deadlocks when it exceeds the cluster's CPUs
        concurrency = (1, concurrency)
    return ds.map_batches(
        _BroadcastAsofJoiner,
        fn_constructor_kwargs={
            "small_ref": ref, "on": on, "ts_col": ts_col,
            "version_ts_col": version_ts_col, "defaults": defaults,
            "direction": direction,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def semi_join(ds: ray.data.Dataset, keys: Sequence, col: str,
              anti: bool = False) -> ray.data.Dataset:
    """Broadcast semi (or anti) join: membership mask, no shuffle.

    An EMPTY key set is a legal degenerate (a filter stage that kept
    nothing): ``pa.array([])`` is null-typed and ``is_in`` rejects it,
    so the mask constant-folds instead — semi keeps nothing, anti
    keeps everything."""
    keys = list(keys)
    key_ref = ray.put(pa.array(keys)) if keys else None

    def mask(batch: pa.Table) -> pa.Table:
        if key_ref is None:
            if anti:
                return batch
            return batch.slice(0, 0)
        m = pc.is_in(batch[col], ray.get(key_ref))
        m = pc.fill_null(m, False)
        return batch.filter(pc.invert(m) if anti else m)

    return ds.map_batches(mask, batch_format="pyarrow")


def join_buckets(input_bytes: int, per_bucket_bytes: int = 2 << 27,
                 lo: int = 1, hi: int = 1024) -> int:
    """Size hash-join partition count to the data, not a constant.

    Each bucket is a shuffle aggregator actor whose spin-up is paid at
    job start (~1-2 s each, measured), so a fixed large count taxes
    small inputs; too few buckets at 100 TB blows per-task memory.
    ``per_bucket_bytes`` targets ~256 MB of (compressed) input per
    partition — each join partition materializes its hash table, so
    this bounds the per-actor working set on a real cluster.

    The floor is 1, not a parallelism constant: when the key domain is
    SMALLER than the partition count, some partitions receive no blocks
    from one side and Ray 2.49's native hash-shuffle join builds them
    as schema-less tables, which crashes the pyarrow join ("No match
    ... for key field reference") — found by the adversarial fuzz
    harness on low-cardinality keys (months, tiny vocabularies).
    Partition count should follow bytes; measured at sf0.1, lo=1 vs
    lo=4 is inside run-to-run noise on every join-heavy query.
    """
    return max(lo, min(hi, int(input_bytes // per_bucket_bytes) + 1))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    buckets: int = 64,
) -> ray.data.Dataset:
    """Partitioned hash join for two large sides.

    Delegates to Ray Data's native hash-shuffle ``Dataset.join`` —
    both sides are hash-partitioned on the key into ``buckets``
    independent partitions, which bounds per-task memory; salt hot keys
    upstream if one key exceeds a bucket. Column collisions get
    ``_x/_y`` suffixes (pandas convention). Size ``buckets`` with
    ``join_buckets(total_input_bytes)`` — partition count should grow
    with the data, not sit at a constant.
    """
    join_type = {
        "inner": "inner",
        "left": "left_outer",
        "right": "right_outer",
        "outer": "full_outer",
    }[how]
    return left.join(
        right,
        join_type,
        num_partitions=buckets,
        on=(on,),
        left_suffix="_x",
        right_suffix="_y",
    )


def partitioned_asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    defaults: dict | None = None,
    shards: int = 32,
    right_tiebreak: Sequence[str] = (),
) -> ray.data.Dataset:
    """As-of join where BOTH sides are large: hash-co-partition by the
    key and merge-asof inside each group.

    The broadcast as-of assumes the versioned side fits in one object;
    at 100 TB of versions it doesn't. Here each side is tagged, the two
    streams union (one schema: left columns + right columns, the absent
    side's columns null), and a key-SHARD groupby co-locates every
    key's rows from both sides (two-level grouping — one Ray group per
    key would be the many-tiny-groups trap); inside each shard ONE
    ``pd.merge_asof(by=on, direction="backward")`` handles every key
    vectorized. One hash shuffle total; per-shard memory is its keys'
    rows only — the partitioning assumption is per-shard history fits
    a worker; raise ``shards`` (or salt hot keys upstream) if not.
    """
    from .timeops import column_ts_us

    lschema, rschema = left.schema(), right.schema()
    lcols = [c for c in lschema.names if c not in (on, left_ts)]
    rcols = [c for c in rschema.names if c not in (on, right_ts)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    defaults = defaults or {}

    # one explicit Arrow schema for both sides — the absent side's
    # columns are TYPED nulls, otherwise per-block dtype drift (object
    # None vs float NaN) breaks the shuffle's schema unification
    def tag(side: int):
        ts_col = left_ts if side == 0 else right_ts

        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {on: t[on],
                    "_ts": column_ts_us(t[ts_col]),
                    "_side": pa.array(np.full(n, side, dtype=np.int8))}
            for c in lcols:
                cols[c] = t[c] if side == 0 else pa.nulls(n, ltypes[c])
            for c in rcols:
                cols[c] = t[c] if side == 1 else pa.nulls(n, rtypes[c])
            return pa.table(cols)
        return fn

    from .hashing import add_shard_column

    u = (left.map_batches(tag(0), batch_format="pyarrow")
         .union(right.map_batches(tag(1), batch_format="pyarrow"))
         .map_batches(lambda t: add_shard_column(t, on, shards),
                      batch_format="pyarrow"))

    def asof_shard(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0]
        if not len(l):
            return pd.DataFrame(columns=[on, "_ts", *lcols, *rcols])
        r = g[g["_side"] == 1]
        # merge_asof(by=on) runs every key in this shard in one
        # vectorized pass; both frames need only the _ts sort.
        # right_tiebreak pins which of several same-(key, ts) version
        # rows wins (merge_asof backward takes the LAST in sort order)
        # — e.g. tiebreak on the value column == take its max, which
        # lets callers skip a whole pre-collapse groupby shuffle.
        l = l.sort_values("_ts", kind="mergesort")[[on, "_ts", *lcols]]
        if len(r):
            r = r.sort_values(["_ts", *right_tiebreak],
                              kind="mergesort")[[on, "_ts", *rcols]]
            out = pd.merge_asof(l, r, on="_ts", by=on,
                                direction="backward")
        else:
            out = l.copy()
            for c in rcols:
                out[c] = None
        for col, val in defaults.items():
            if col in out.columns:
                out[col] = out[col].astype("float64").fillna(val) \
                    if isinstance(val, float) else out[col].fillna(val)
        return out

    return u.groupby("_shard").map_groups(asof_shard, batch_format="pandas")


def interval_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_start: str,
    right_end: str,
) -> ray.data.Dataset:
    """Range (interval) join: left row matches every right row of the
    same key whose ``[start, end]`` interval contains the left ts
    (inclusive both ends).

    Same co-partition machinery as :func:`partitioned_asof_join` — one
    hash shuffle on a key shard, then per-key vectorized sweeps inside
    each shard task: right
    intervals sort by start; ``searchsorted`` bounds the candidate
    window per left ts (starts <= ts), and an end >= ts mask finishes
    the containment test. Output is one row per (left, matching right)
    pair. Per-key work is O(L log R + pairs); the documented
    partitioning assumption is per-key rows fit a worker — salt hot
    keys upstream when they don't.
    """
    from .timeops import column_ts_us

    lschema, rschema = left.schema(), right.schema()
    lcols = [c for c in lschema.names if c not in (on, left_ts)]
    rcols = [c for c in rschema.names
             if c not in (on, right_start, right_end)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {on: t[on], "_side": pa.array(
                np.full(n, side, dtype=np.int8))}
            if side == 0:
                cols["_ts"] = column_ts_us(t[left_ts])
                cols["_end"] = pa.nulls(n, pa.int64())
            else:
                cols["_ts"] = column_ts_us(t[right_start])
                cols["_end"] = column_ts_us(t[right_end])
            for c in lcols:
                cols[c] = t[c] if side == 0 else pa.nulls(n, ltypes[c])
            for c in rcols:
                cols[c] = t[c] if side == 1 else pa.nulls(n, rtypes[c])
            return pa.table(cols)
        return fn

    from .hashing import add_shard_column

    u = (left.map_batches(tag(0), batch_format="pyarrow")
         .union(right.map_batches(tag(1), batch_format="pyarrow"))
         .map_batches(lambda t: add_shard_column(t, on, 32),
                      batch_format="pyarrow"))

    def sweep_shard(g: pd.DataFrame) -> pd.DataFrame:
        """All keys of one shard in one numpy pass: both sides sort by
        (key, ts); per distinct key the right segment comes from ONE
        pair of searchsorted calls on the key array, the per-left-row
        candidate counts from one searchsorted on that segment's
        starts, and the pair expansion + end>=ts containment mask run
        vectorized over the whole shard — no per-key pandas frames.
        Output order is (key, left ts)-major: a pure function of the
        data, independent of block layout."""
        empty = pd.DataFrame(columns=[on, *lcols, *rcols])
        l = g[g["_side"] == 0]
        r = g[g["_side"] == 1]
        if not len(l) or not len(r):
            return empty
        l = l.sort_values([on, "_ts"], kind="mergesort")
        r = r.sort_values([on, "_ts", "_end"], kind="mergesort")
        keys_l, keys_r = l[on].to_numpy(), r[on].to_numpy()
        ts_l = l["_ts"].to_numpy()
        starts, ends = r["_ts"].to_numpy(), r["_end"].to_numpy()

        uk, l_first = np.unique(keys_l, return_index=True)
        lbounds = np.append(l_first, len(l))
        rlo = np.searchsorted(keys_r, uk, side="left")
        rhi = np.searchsorted(keys_r, uk, side="right")
        counts = np.zeros(len(l), dtype=np.int64)
        lo_of = np.zeros(len(l), dtype=np.int64)
        for i in range(len(uk)):  # one small searchsorted per key
            if rlo[i] == rhi[i]:
                continue
            a, b = lbounds[i], lbounds[i + 1]
            counts[a:b] = np.searchsorted(
                starts[rlo[i]:rhi[i]], ts_l[a:b], side="right")
            lo_of[a:b] = rlo[i]
        total = int(counts.sum())
        if not total:
            return empty
        idx_l = np.repeat(np.arange(len(l)), counts)
        idx_r = (np.arange(total)
                 - np.repeat(np.cumsum(counts) - counts, counts)
                 + np.repeat(lo_of, counts))
        keep = ends[idx_r] >= ts_l[idx_l]
        out_l, out_r = idx_l[keep], idx_r[keep]
        if not len(out_l):
            return empty
        lrows = l.iloc[out_l].reset_index(drop=True)
        rrows = r.iloc[out_r].reset_index(drop=True)
        out = pd.DataFrame({on: lrows[on]})
        for c in lcols:
            out[c] = lrows[c].values
        for c in rcols:
            out[c] = rrows[c].values
        return out

    return u.groupby("_shard").map_groups(sweep_shard, batch_format="pandas")


def salted_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    salts: int = 8,
    how: str = "inner",
    buckets: int = 64,
) -> ray.data.Dataset:
    """Hash join under key skew: a hot key overwhelms whichever single
    partition owns it, so the LEFT (skewed) side splits each key into
    ``salts`` sub-keys by a row hash, and the RIGHT side replicates
    each row once per salt — the hot key's work then lands on ``salts``
    partitions instead of one. Classic salted-join; correct for
    inner/left joins because every left row still meets every matching
    right row exactly once (its own salt's replica).

    Cost: right side inflates x ``salts`` — use only when the right
    side is the smaller (but still shuffle-scale) side and the left
    carries the skew.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted join supports inner/left only")

    def salt_left(t: pa.Table) -> pa.Table:
        # deterministic per-row salt: hash of the row's position-
        # independent payload (the key + a cheap row fingerprint would
        # do; a uniform split only needs decorrelation from the key)
        h = np.arange(len(t), dtype=np.uint64)  # within-block spread
        base = shard_of(t[on].to_numpy(zero_copy_only=False), 1 << 16)
        salt = ((h + base.astype(np.uint64)) % np.uint64(salts))
        return t.append_column("_salt", pa.array(salt.astype(np.int64)))

    def replicate_right(t: pa.Table) -> pa.Table:
        n = len(t)
        idx = np.repeat(np.arange(n), salts)
        rep = t.take(pa.array(idx))
        salt = np.tile(np.arange(salts, dtype=np.int64), n)
        return rep.append_column("_salt", pa.array(salt))

    l = left.map_batches(salt_left, batch_format="pyarrow")
    r = right.map_batches(replicate_right, batch_format="pyarrow")
    join_type = {"inner": "inner", "left": "left_outer"}[how]
    out = l.join(r, join_type, num_partitions=buckets,
                 on=(on, "_salt"), left_suffix="_x", right_suffix="_y")
    return out.drop_columns(["_salt"])
