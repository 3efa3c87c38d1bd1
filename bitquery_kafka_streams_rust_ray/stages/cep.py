"""CEP pattern operators: ordered-sequence (funnel) and absence matching.

The reference is a complex-event-processing consumer — its core loop
extracts typed events and reacts to *combinations* of them (the
monitor examples chain a filter over extracted trade events with
per-key stats, ``examples/dex_monitor.rs:31-51``; the processor wiring
in ``src/consumer.rs:267-304`` picks the first matching event of a
group). These operators re-express the two canonical CEP primitives
over a Ray ``Dataset``:

- ``funnel_match`` — per key, the *earliest greedy chain* of events
  whose types follow ``pattern`` with strictly increasing timestamps:
  stage 0 matches at the key's earliest ``pattern[0]`` event, stage i
  at the earliest ``pattern[i]`` event strictly after stage i-1. The
  key matches iff the full chain exists and spans ≤ ``within``.
  (Greedy-earliest is the standard funnel semantic: deterministic,
  O(n) per key, and exactly SQL-expressible — the driver oracle is a
  chain of per-stage ``min(ts)`` joins.)
- ``absence_match`` — per key, events of a trigger type with NO
  follow-up type within ``(ts, ts + within]`` — the "A not followed
  by B" timeout pattern (abandoned-cart detection).

Scale shape: both shuffle once on a stable hash shard of the key (all
events of a key land in one task — the same co-location contract as
session windows) and run vectorized sweeps per shard; no driver-side
work, output is per-key (funnel) or per-trigger-event (absence) sized.
The streaming engine hosts the same chain semantics incrementally in
``state/store.py::FunnelState``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .hashing import add_shard_column
from .timeops import US, series_ts_us

_SHARD = "_cep_shard"


def _chain_times(
    g: pd.DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: Sequence[str],
    tiebreak_col: str | None,
) -> pd.DataFrame:
    """Per-key greedy earliest chain stage times over one shard's rows.

    Returns one row per key with a stage-0 event: columns ``key,
    _t0.._t{k-1}`` (float us; NaN where the chain never reached that
    stage). No ``within`` filter here.
    """
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    g = g.sort_values(sort_cols, kind="mergesort")
    ts = series_ts_us(g[ts_col]).to_numpy()
    keys = g[key_col].to_numpy()
    types = g[type_col].to_numpy()

    # stage 0: earliest pattern[0] per key
    m0 = types == pattern[0]
    s0 = pd.DataFrame({"_k": keys[m0], "_t": ts[m0]})
    cur = s0.groupby("_k", sort=False)["_t"].min()  # key -> chain ts
    stage_times = [cur]
    for stage in pattern[1:]:
        if cur.empty:
            stage_times.append(cur)
            continue
        mi = types == stage
        cand = pd.DataFrame({"_k": keys[mi], "_t": ts[mi]})
        cand = cand.join(cur.rename("_prev"), on="_k", how="inner")
        cand = cand[cand["_t"] > cand["_prev"]]
        cur = cand.groupby("_k", sort=False)["_t"].min()
        stage_times.append(cur)
    out = pd.DataFrame(
        {f"_t{i}": s for i, s in enumerate(stage_times)}
    ).reindex(stage_times[0].index)
    out.index.name = None
    return out.reset_index(names=key_col)


def _chain_earliest(
    g: pd.DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: Sequence[str],
    tiebreak_col: str | None,
) -> pd.DataFrame:
    """Per-key greedy earliest COMPLETE chains (no ``within`` filter):
    ``key, _start_us, _end_us``."""
    times = _chain_times(g, key_col, ts_col, type_col, pattern,
                         tiebreak_col)
    last = f"_t{len(pattern) - 1}"
    done = times[times[last].notna()]
    return pd.DataFrame(
        {
            key_col: done[key_col].to_numpy(),
            "_start_us": done["_t0"].to_numpy(),
            "_end_us": done[last].to_numpy(),
        }
    )


def funnel_match(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: Sequence[str],
    within_s: float,
    tiebreak_col: str | None = None,
    shards: int = 64,
    start_name: str = "start_ts",
    end_name: str = "end_ts",
    veto_type: str | None = None,
) -> ray.data.Dataset:
    """Keys whose events contain the pattern chain within ``within_s``.

    Output: one row per matching key — ``key_col, {start_name},
    {end_name}`` (timestamps of the chain's first and last stage).
    Ties on equal timestamps are broken by ``tiebreak_col`` for a
    deterministic scan order; the chain itself uses strict ``>`` so
    equal-ts rows never satisfy consecutive stages (matching the SQL
    oracle's ``e.ts > prev`` join condition).

    ``veto_type`` adds negation (Flink CEP notFollowedBy): a veto-type
    event STRICTLY inside ``(start, end)`` kills the key's match — the
    batch equivalent of the streaming fold killing an incomplete chain
    (a veto at exactly the completing timestamp loses the tie, exactly
    as ``FunnelState``'s (ts, stage)-ordered fold resolves it).
    """
    pattern = list(pattern)
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two stages")
    if veto_type is not None and veto_type in pattern:
        raise ValueError("veto_type cannot be a pattern stage")
    within_us = int(within_s * US)
    keep = [key_col, ts_col, type_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    wanted = pattern + ([veto_type] if veto_type else [])

    def pre(t: pa.Table) -> pa.Table:
        # prune non-pattern event types before the shuffle
        mask = pa.compute.is_in(t[type_col], value_set=pa.array(wanted))
        return add_shard_column(
            t.select(keep).filter(mask), key_col, shards, _SHARD
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        out = _chain_earliest(g, key_col, ts_col, type_col, pattern,
                              tiebreak_col)
        out = out[out["_end_us"] - out["_start_us"] <= within_us]
        if veto_type is not None and len(out):
            v = g[g[type_col] == veto_type]
            vts = pd.DataFrame({
                "_k": v[key_col].to_numpy(),
                "_v": series_ts_us(v[ts_col]).to_numpy(),
            }).merge(out.rename(columns={key_col: "_k"}), on="_k")
            killed = set(
                vts.loc[(vts["_v"] > vts["_start_us"])
                        & (vts["_v"] < vts["_end_us"]), "_k"])
            out = out[~out[key_col].isin(killed)]
        res = pd.DataFrame(
            {
                key_col: out[key_col].to_numpy(),
                start_name: pd.to_datetime(out["_start_us"], unit="us"),
                end_name: pd.to_datetime(out["_end_us"], unit="us"),
            }
        )
        return res.sort_values(key_col, kind="mergesort")

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )


def funnel_timeouts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    pattern: Sequence[str],
    within_s: float,
    tiebreak_col: str | None = None,
    shards: int = 64,
) -> ray.data.Dataset:
    """Timed-out partial matches: keys whose greedy chain STARTED but
    did not complete within ``within_s`` — the batch analog of the
    streaming engine's ``funnel_timeouts`` output (abandoned-funnel
    analytics). Output: ``key_col, start_ts, timeout_ts,
    reached_stage`` where ``reached_stage`` counts chain stages at or
    below ``start + within`` (matching ``FunnelState.pop_timeouts``).
    """
    pattern = list(pattern)
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two stages")
    within_us = int(within_s * US)
    keep = [key_col, ts_col, type_col] + (
        [tiebreak_col] if tiebreak_col else []
    )

    def pre(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t[type_col], value_set=pa.array(pattern))
        return add_shard_column(
            t.select(keep).filter(mask), key_col, shards, _SHARD
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        times = _chain_times(g, key_col, ts_col, type_col, pattern,
                             tiebreak_col)
        last = f"_t{len(pattern) - 1}"
        matched = (times[last].notna()
                   & (times[last] - times["_t0"] <= within_us))
        out = times[~matched].copy()
        bound = out["_t0"] + within_us
        tcols = [f"_t{i}" for i in range(len(pattern))]
        reached = sum(
            (out[c].notna() & (out[c] <= bound)).astype("int64")
            for c in tcols
        )
        res = pd.DataFrame(
            {
                key_col: out[key_col].to_numpy(),
                "start_ts": pd.to_datetime(out["_t0"], unit="us"),
                "timeout_ts": pd.to_datetime(bound, unit="us"),
                "reached_stage": reached.to_numpy(),
            }
        )
        return res.sort_values(key_col, kind="mergesort")

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )


def absence_match(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    trigger: str,
    followup: str,
    within_s: float,
    id_cols: Sequence[str] = (),
    shards: int = 64,
) -> ray.data.Dataset:
    """Trigger events with no follow-up on the key in ``(ts, ts+within]``.

    The timeout/absence CEP pattern: emit each ``trigger``-type event
    (with ``id_cols`` carried through) for which no ``followup``-type
    event of the same key lands strictly after it and within
    ``within_s``. Vectorized per shard with a forward ``merge_asof``
    (nearest follow-up after each trigger, bounded by tolerance) — the
    absence of a match IS the result row.
    """
    within_us = int(within_s * US)
    keep = list(dict.fromkeys([key_col, ts_col, type_col, *id_cols]))

    def pre(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(
            t[type_col], value_set=pa.array([trigger, followup])
        )
        return add_shard_column(
            t.select(keep).filter(mask), key_col, shards, _SHARD
        )

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_ts_us=series_ts_us(g[ts_col]).to_numpy())
        trig = g[g[type_col] == trigger].sort_values("_ts_us",
                                                     kind="mergesort")
        fol = (
            g[g[type_col] == followup][[key_col, "_ts_us"]]
            .rename(columns={"_ts_us": "_fol_us"})
            .sort_values("_fol_us", kind="mergesort")
        )
        hit = pd.merge_asof(
            trig,
            fol,
            left_on="_ts_us",
            right_on="_fol_us",
            by=key_col,
            direction="forward",
            allow_exact_matches=False,
            tolerance=within_us,
        )
        out = hit[hit["_fol_us"].isna()]
        sort_cols = list(id_cols) if id_cols else [key_col, "_ts_us"]
        out = out.sort_values(sort_cols, kind="mergesort")
        return out[[key_col, ts_col, *id_cols]]

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(_SHARD)
        .map_groups(per_shard, batch_format="pandas")
    )
