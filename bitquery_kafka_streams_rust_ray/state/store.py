"""Pure-Python keyed state components hosted inside state-shard actors.

These are the RocksDB-style sorted in-actor stores the north rule calls
for: per-key dedup timestamps, per-(key, window) aggregate accumulators,
and per-key open-session lists — all with watermark-driven eviction and
cheap snapshot/restore for per-epoch checkpointing.

Semantics ported from the reference:

- ``DedupState`` re-expresses ``MessageDeduplicator``
  (``src/core/utils/deduplicator.rs:50-75``) on event time: a key is a
  duplicate iff seen within ``window`` of its *most recent* sighting,
  and every sighting — duplicate or not — refreshes the stored
  timestamp. Eviction is by watermark age instead of LRU capacity
  (the capacity-based clear at ``src/consumer.rs:244-247`` is exactly
  the kind of correctness-losing shortcut the watermark makes
  unnecessary).
- ``WindowState``/``SessionState`` generalize the per-minute
  tumbling stats of ``examples/dex_monitor.rs:31-51`` to event-time
  tumbling / sliding / session windows.
- ``FunnelState`` hosts the CEP ordered-sequence (funnel) match of
  ``stages/cep.py::funnel_match`` incrementally: the greedy earliest
  chain per key, folded in event-time order as the watermark advances.

All methods are deterministic given the same sequence of (sorted)
inputs and watermark advances; none look at the wall clock.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


class DedupState:
    """Keyed windowed dedup: key -> last_seen event-time (us)."""

    def __init__(self, window_us: int):
        self.window_us = window_us
        self.last_seen: dict[str, int] = {}

    def process(self, keys: list[str], ts_us: np.ndarray) -> np.ndarray:
        """Keep-mask for rows sorted by (key, ts) within this shard.

        Sequential per key: row kept iff first sighting or
        ``ts - last_seen >= window`` (strict duplicate iff ``< window``,
        deduplicator.rs:63); the stored timestamp refreshes either way
        (deduplicator.rs:65, 72).
        """
        keep = np.empty(len(keys), dtype=bool)
        last_seen = self.last_seen
        window = self.window_us
        for i, key in enumerate(keys):
            ts = int(ts_us[i])
            prev = last_seen.get(key)
            keep[i] = prev is None or ts - prev >= window
            last_seen[key] = ts
        return keep

    def size(self) -> int:
        return len(self.last_seen)

    def evict(self, watermark_us: int) -> int:
        """Drop keys that can no longer mark any future row duplicate."""
        horizon = watermark_us - self.window_us
        stale = [k for k, v in self.last_seen.items() if v < horizon]
        for k in stale:
            del self.last_seen[k]
        return len(stale)

    def snapshot(self) -> dict:
        return {"window_us": self.window_us, "last_seen": dict(self.last_seen)}

    @classmethod
    def restore(cls, snap: dict) -> "DedupState":
        st = cls(snap["window_us"])
        st.last_seen = dict(snap["last_seen"])
        return st


_KEEP_FILE = object()  # sentinel: db_path already holds the state file


class SpillDedupState:
    """Disk-backed ``DedupState``: identical semantics and snapshot
    contract, but the key -> last_seen map lives in a sqlite B-tree
    (the stdlib stand-in for the RocksDB-style store the north star
    names) instead of a Python dict. RAM per ``process`` call is
    bounded by the batch's unique keys, not the key domain — the
    10^12-url path where a shard's window of distinct keys exceeds
    actor memory.

    Durability is NOT sqlite's job here (journaling off): the engine's
    correctness contract is per-epoch snapshots + replay, so the file
    is a cache of state whose authoritative copy is the last committed
    checkpoint. ``snapshot()`` uses ``Connection.serialize()`` — the
    blob is a verbatim database image and rides the same pickle path
    as the dict store's snapshot.
    """

    def __init__(self, window_us: int, db_path: str | None = None,
                 _image: bytes | None = None):
        import os
        import sqlite3

        self.window_us = window_us
        self.db_path = db_path
        if db_path:
            os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
            if _image is _KEEP_FILE:
                pass  # restore_from_sidecar already copied the file in
            elif _image is not None:
                with open(db_path, "wb") as f:
                    f.write(_image)
            elif os.path.exists(db_path):
                os.remove(db_path)  # a fresh run starts with empty state
        self.con = sqlite3.connect(db_path or ":memory:")
        if _image is not None and _image is not _KEEP_FILE and not db_path:
            self.con.deserialize(_image)
        self.con.execute("PRAGMA journal_mode=OFF")
        self.con.execute("PRAGMA synchronous=OFF")
        self.con.execute(
            "CREATE TABLE IF NOT EXISTS kv "
            "(k TEXT PRIMARY KEY, ts INTEGER NOT NULL) WITHOUT ROWID")
        # key count maintained incrementally (inserts in process(),
        # deletes in evict()) so the per-epoch size gauge never walks
        # the B-tree; one COUNT(*) only when adopting an existing image
        self._nkeys = (
            self.con.execute("SELECT count(*) FROM kv").fetchone()[0]
            if _image is not None else 0)

    def process(self, keys: list[str], ts_us: np.ndarray) -> np.ndarray:
        """Same keep-mask recurrence as ``DedupState.process``; reads
        touch only this batch's unique keys, writes are one upsert per
        unique key."""
        uniq = list(dict.fromkeys(keys))
        local: dict[str, int] = {}
        cur = self.con.cursor()
        for i in range(0, len(uniq), 500):  # sqlite parameter cap
            chunk = uniq[i:i + 500]
            marks = ",".join("?" * len(chunk))
            local.update(cur.execute(
                f"SELECT k, ts FROM kv WHERE k IN ({marks})", chunk))
        found = len(local)
        keep = np.empty(len(keys), dtype=bool)
        window = self.window_us
        for i, key in enumerate(keys):
            ts = int(ts_us[i])
            prev = local.get(key)
            keep[i] = prev is None or ts - prev >= window
            local[key] = ts
        cur.executemany(
            "INSERT INTO kv VALUES (?, ?) "
            "ON CONFLICT(k) DO UPDATE SET ts = excluded.ts",
            local.items())
        self.con.commit()
        self._nkeys += len(local) - found
        return keep

    def size(self) -> int:
        """O(1) key count for the state-size gauge (incrementally
        maintained; a 10^12-key B-tree is never walked per epoch)."""
        return self._nkeys

    def evict(self, watermark_us: int) -> int:
        cur = self.con.execute("DELETE FROM kv WHERE ts < ?",
                               (watermark_us - self.window_us,))
        self.con.commit()
        self._nkeys -= cur.rowcount
        return cur.rowcount

    def close(self) -> None:
        self.con.close()

    def snapshot(self) -> dict:
        """In-blob snapshot (full DB image in memory). Used for the
        ``:memory:`` configuration and unit-scale states — a key domain
        that fits this blob fits RAM anyway. File-backed shards inside
        the engine use ``snapshot_to_file`` (page-streamed) instead."""
        return {"window_us": self.window_us,
                "db": bytes(self.con.serialize())}

    def snapshot_to_file(self, path: str) -> dict:
        """Page-streamed checkpoint: sqlite's backup API copies the
        B-tree directly to ``path`` without ever holding the full image
        in actor memory — the snapshot analog of the class's bounded-RAM
        process(). Returns the (tiny) dict that rides the pickle blob."""
        import os
        import sqlite3

        if os.path.exists(path):
            os.remove(path)
        dst = sqlite3.connect(path)
        with dst:
            self.con.backup(dst)
        dst.close()
        return {"window_us": self.window_us,
                "db_sidecar": os.path.basename(path)}

    @classmethod
    def restore(cls, snap: dict,
                db_path: str | None = None) -> "SpillDedupState":
        return cls(snap["window_us"], db_path, _image=snap["db"])

    @classmethod
    def restore_from_sidecar(cls, snap: dict, sidecar_path: str,
                             db_path: str | None = None) -> "SpillDedupState":
        """Restore from a ``snapshot_to_file`` checkpoint: chunked file
        copy into the working path (RAM-bounded), then connect."""
        import shutil

        if db_path:
            import os
            os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
            shutil.copyfile(sidecar_path, db_path)
            return cls(snap["window_us"], db_path, _image=_KEEP_FILE)
        with open(sidecar_path, "rb") as f:  # :memory: config — small
            return cls(snap["window_us"], None, _image=f.read())


def restore_dedup(snap: dict, db_path: str | None = None,
                  sidecar_dir: str | None = None):
    """Restore whichever dedup backend wrote the snapshot — snapshots
    are self-describing, so resume stays correct even if the config's
    ``dedup_spill_dir`` changed between the runs. ``sidecar_dir`` is
    where ``db_sidecar`` checkpoint files live (the committed epoch
    dir)."""
    if "db_sidecar" in snap:
        if sidecar_dir is None:
            raise ValueError("sidecar snapshot needs its checkpoint dir")
        import os
        return SpillDedupState.restore_from_sidecar(
            snap, os.path.join(sidecar_dir, snap["db_sidecar"]), db_path)
    if "db" in snap:
        return SpillDedupState.restore(snap, db_path)
    return DedupState.restore(snap)


@dataclass
class _Acc:
    count: int = 0
    total: float = 0.0

    def add(self, count: int, total: float) -> None:
        self.count += count
        self.total += total


class WindowState:
    """Accumulators for tumbling/sliding windows.

    Keyed by ``(kind, key, window_start_us)`` where *kind* names the
    window family (e.g. ``"tumbling:lang"``). Inputs are pre-aggregated
    partials (count, total) — the two-level aggregation that keeps the
    shuffle narrow — and windows close when the watermark passes
    ``window_end``.
    """

    def __init__(self, update_horizon_us: int = 0):
        self.acc: dict[tuple[str, str, int], _Acc] = {}
        self.window_end: dict[tuple[str, str, int], int] = {}
        # allowed-lateness update mode: emitted windows are RETAINED here
        # for update_horizon_us past their end, as [end, count, total,
        # revision]; partials landing on a retained window mark it dirty
        # and pop_updates re-emits it with revision+1 (Flink-style
        # window corrections). horizon 0 = off: nothing is retained.
        self.update_horizon_us = int(update_horizon_us)
        self.closed: dict[tuple[str, str, int], list] = {}
        self.dirty: set[tuple[str, str, int]] = set()

    def add_partials(
        self,
        kind: str,
        keys: list[str],
        window_start_us: np.ndarray,
        window_end_us: np.ndarray,
        counts: np.ndarray,
        totals: np.ndarray,
    ) -> None:
        acc = self.acc
        closed = self.closed
        for i, key in enumerate(keys):
            k = (kind, key, int(window_start_us[i]))
            c = closed.get(k) if closed else None
            if c is not None:
                # correction for an already-emitted window
                c[1] += int(counts[i])
                c[2] += float(totals[i])
                self.dirty.add(k)
                continue
            a = acc.get(k)
            if a is None:
                a = acc[k] = _Acc()
                self.window_end[k] = int(window_end_us[i])
            a.add(int(counts[i]), float(totals[i]))

    def close(self, watermark_us: int) -> list[tuple]:
        """Emit and evict all windows with ``window_end <= watermark``.

        Returns rows ``(kind, key, window_start_us, window_end_us,
        count, total)`` sorted for deterministic epoch output. With a
        nonzero update horizon the emitted accumulators move to the
        retained ``closed`` store (revision 0) instead of vanishing.
        """
        out = []
        for k, end in list(self.window_end.items()):
            if end <= watermark_us:
                a = self.acc.pop(k)
                del self.window_end[k]
                out.append((k[0], k[1], k[2], end, a.count, a.total))
                if self.update_horizon_us > 0:
                    self.closed[k] = [end, a.count, a.total, 0]
        out.sort()
        return out

    def preview(self) -> list[tuple]:
        """Speculative (early-firing) view of every still-open window:
        ``(kind, key, window_start_us, window_end_us, count, total)``
        sorted. Pure read — nothing is emitted or evicted; the final
        ``close`` emission supersedes any preview of the same window."""
        out = [
            (k[0], k[1], k[2], self.window_end[k], a.count, a.total)
            for k, a in self.acc.items()
        ]
        out.sort()
        return out

    def pop_updates(self, watermark_us: int) -> list[tuple]:
        """Emit correction rows for retained windows that received
        late partials since the last call: ``(kind, key, start_us,
        end_us, count, total, revision)`` with revision starting at 1.
        Retained windows age out once ``end + horizon <= watermark``
        (a correction beyond the horizon can no longer arrive — the
        mapper already classified such rows LATE)."""
        out = []
        for k in self.dirty:
            c = self.closed[k]
            c[3] += 1
            out.append((k[0], k[1], k[2], c[0], c[1], c[2], c[3]))
        self.dirty.clear()
        if self.closed:
            horizon = self.update_horizon_us
            for k, c in list(self.closed.items()):
                if c[0] + horizon <= watermark_us:
                    del self.closed[k]
        out.sort()
        return out

    def snapshot(self) -> dict:
        return {
            "acc": [
                [list(k), a.count, a.total, self.window_end[k]]
                for k, a in self.acc.items()
            ],
            "closed": [[list(k), *c] for k, c in self.closed.items()],
            "dirty": [list(k) for k in sorted(self.dirty)],
        }

    @classmethod
    def restore(cls, snap: dict,
                update_horizon_us: int = 0) -> "WindowState":
        st = cls(update_horizon_us)
        for key_list, count, total, end in snap["acc"]:
            k = (key_list[0], key_list[1], int(key_list[2]))
            st.acc[k] = _Acc(count, total)
            st.window_end[k] = int(end)
        for key_list, end, count, total, rev in snap.get("closed", []):
            k = (key_list[0], key_list[1], int(key_list[2]))
            st.closed[k] = [int(end), int(count), float(total), int(rev)]
        st.dirty = {(k[0], k[1], int(k[2]))
                    for k in snap.get("dirty", [])}
        return st


class FunnelState:
    """Streaming CEP funnel: greedy earliest stage chain per key.

    Exactly the batch semantics of ``stages/cep.py::funnel_match``,
    computed incrementally: events buffer until the watermark passes
    their timestamp, then fold in global event-time order (accepted
    events are never late, so "folded when the watermark passes" IS
    timestamp order across epochs). The greedy chain recurrence
    ``t[i] = min ts of a stage-i event with ts > t[i-1]`` is exact
    under this fold because chain times, once set, can only be set by
    strictly earlier folds and never decrease afterwards.

    Emission is exactly-once and deterministic: a key's match surfaces
    in ``close()`` of the first watermark that passes its chain-end
    timestamp. Keys whose chain completed (matched or not) or whose
    open chain can no longer finish within the bound
    (``watermark > t[0] + within``) collapse to a tombstone in
    ``done`` — without it a restarted chain could emit a second match
    the batch semantics forbids. Per-key steady-state memory is the
    tombstone entry; open state is O(stages + pending buffer).
    """

    def __init__(self, n_stages: int, within_us: int,
                 veto_stage: int | None = None,
                 emit_timeouts: bool = False):
        if n_stages < 2:
            raise ValueError("funnel needs at least two stages")
        self.n = n_stages
        self.within_us = within_us
        # negation (Flink CEP notFollowedBy): an event of this stage
        # index folding strictly after chain start while the chain is
        # incomplete KILLS the match (no row; counted in ``vetoes``)
        self.veto_stage = veto_stage
        # timed-out partial matches: when True, a started chain that can
        # no longer complete within the bound emits
        # (key, start_us, timeout_us, reached_stage) via pop_timeouts()
        self.emit_timeouts = emit_timeouts
        self.chains: dict[str, list[int | None]] = {}
        self.pending: dict[str, list[tuple[int, int]]] = {}  # (ts, stage)
        self.done: set[str] = set()
        self.vetoes = 0
        self._timeouts: list[tuple[str, int, int, int]] = []

    def add(self, keys: list[str], stages: np.ndarray,
            ts_us: np.ndarray) -> None:
        """Buffer (key, stage, ts) observations until watermark fold."""
        pending = self.pending
        done = self.done
        for i, key in enumerate(keys):
            if key in done:
                continue
            pending.setdefault(key, []).append(
                (int(ts_us[i]), int(stages[i]))
            )

    def close(self, watermark_us: int) -> list[tuple[str, int, int]]:
        """Fold buffered events below the watermark; emit completed
        matches ``(key, start_us, end_us)`` sorted, evict dead keys."""
        out: list[tuple[str, int, int]] = []
        n, within = self.n, self.within_us
        for key in list(self.pending):
            buf = self.pending[key]
            ripe = [e for e in buf if e[0] < watermark_us]
            if not ripe:
                continue
            rest = [e for e in buf if e[0] >= watermark_us]
            chain = self.chains.get(key)
            if chain is None:
                chain = self.chains[key] = [None] * n
            ripe.sort()
            vetoed = False
            for ts, stage in ripe:
                if stage == self.veto_stage:
                    # notFollowedBy: a veto event strictly after chain
                    # start while the chain is incomplete kills the key.
                    # Bounded by the pattern window (ts <= start +
                    # within, like Flink's notFollowedBy inside
                    # .within()): past the bound the chain has already
                    # timed out in event time, and honoring a later
                    # veto would make the emitted timeout row depend on
                    # the epoch layout (sweep-vs-fold race). On an
                    # equal-ts tie with the completing event the
                    # completion folds first: pending sorts (ts, stage)
                    # and the veto index is the largest stage.
                    if (chain[0] is not None and ts > chain[0]
                            and ts <= chain[0] + within):
                        vetoed = True
                        break
                    continue
                if stage == 0:
                    if chain[0] is None:
                        chain[0] = ts
                elif chain[stage] is None:
                    prev = chain[stage - 1]
                    if prev is not None and ts > prev:
                        chain[stage] = ts
                if chain[n - 1] is not None:
                    break
            if rest:
                self.pending[key] = rest
            else:
                del self.pending[key]
            if vetoed:
                self.vetoes += 1
                self._tombstone(key)
                continue
            if chain[n - 1] is not None:
                if chain[n - 1] - chain[0] <= within:
                    out.append((key, chain[0], chain[n - 1]))
                    self._tombstone(key)
                # else: complete but beyond the bound — leave it for the
                # timeout sweep below (watermark > start + within holds,
                # since the completing event has already folded)
        # timeout eviction: an open chain whose completion would now
        # violate the bound can never match; with emit_timeouts the
        # partial progress surfaces as a timed-out-match row.
        # All-None chains (keys that have only seen post-start stages)
        # hold zero information — the fold recreates them identically
        # when the next event arrives — so they are dropped rather than
        # held forever: per-key steady state stays the tombstone or
        # nothing, never a dormant empty array.
        for key, chain in list(self.chains.items()):
            if chain[0] is None:
                del self.chains[key]
                continue
            if watermark_us > chain[0] + within:
                if self.emit_timeouts:
                    bound = chain[0] + within
                    reached = sum(1 for t in chain
                                  if t is not None and t <= bound)
                    self._timeouts.append((key, chain[0], bound, reached))
                self._tombstone(key)
        out.sort()
        return out

    def pop_timeouts(self) -> list[tuple[str, int, int, int]]:
        """Drain timed-out partial matches accumulated by ``close``:
        ``(key, start_us, timeout_us, reached_stage)`` sorted. Rows are
        deterministic across epoch layouts: a key times out at the
        first close whose watermark passes ``start + within``, and
        ``reached_stage`` counts only chain entries at or below that
        bound (all folded by then)."""
        out = sorted(self._timeouts)
        self._timeouts = []
        return out

    def _tombstone(self, key: str) -> None:
        self.done.add(key)
        self.chains.pop(key, None)
        self.pending.pop(key, None)

    def snapshot(self) -> dict:
        snap = {
            "n": self.n,
            "within_us": self.within_us,
            "chains": {k: list(v) for k, v in self.chains.items()},
            "pending": {k: [list(e) for e in v]
                        for k, v in self.pending.items()},
            "done": sorted(self.done),
        }
        if (self.veto_stage is not None or self.emit_timeouts
                or self.vetoes or self._timeouts):
            snap["veto_stage"] = self.veto_stage
            snap["emit_timeouts"] = self.emit_timeouts
            snap["vetoes"] = self.vetoes
            snap["timeouts"] = [list(r) for r in self._timeouts]
        return snap

    @classmethod
    def restore(cls, snap: dict) -> "FunnelState":
        st = cls(snap["n"], snap["within_us"],
                 veto_stage=snap.get("veto_stage"),
                 emit_timeouts=snap.get("emit_timeouts", False))
        st.chains = {k: list(v) for k, v in snap["chains"].items()}
        st.pending = {
            k: [tuple(e) for e in v] for k, v in snap["pending"].items()
        }
        st.done = set(snap["done"])
        st.vetoes = snap.get("vetoes", 0)
        st._timeouts = [tuple(r) for r in snap.get("timeouts", [])]
        return st


class IntervalJoinState:
    """Streaming dual-buffer interval self-join: per key, every pair of
    rows whose event times lie within ``bound_us`` of each other —
    the stateful form of the batch interval join (Flink intervalJoin).

    Exactly-once pairing without a pair log: a pair is emitted when its
    LATER-ARRIVING row folds in, matched against the key's buffer of
    already-arrived rows. Buffered rows evict once ``ts + bound <
    watermark`` — safe because any row still to arrive is non-late
    (``ts >= watermark``), so it could not have paired with the evicted
    row anyway; the same argument makes the emitted pair set (and each
    pair's emission epoch) independent of how arrivals split into
    epochs. Pair identity orders the two rows by (ts, url).

    Buffers stay sorted by ts (binary-search window per arrival), so
    per-arrival cost is O(log B + matches) and eviction is a prefix
    drop. Accepted-late correction rows must NOT be fed here (same
    exclusion as the funnel): their counterparts may already be
    evicted, which would make output depend on the epoch layout.
    """

    def __init__(self, bound_us: int):
        self.bound_us = bound_us
        # key -> list[(ts_us, url)] sorted ascending
        self.buffers: dict[str, list[tuple[int, str]]] = {}
        self._pairs: list[tuple] = []

    def add(self, keys: list[str], urls: list[str], ts_us) -> None:
        bound = self.bound_us
        df = {}
        for k, u, t in zip(keys, urls, ts_us):
            df.setdefault(k, []).append((int(t), u))
        for key, new in df.items():
            new.sort()
            nts = np.fromiter((r[0] for r in new), dtype=np.int64,
                              count=len(new))
            nurl = np.array([r[1] for r in new], dtype=object)
            buf = self.buffers.get(key)
            if buf is not None and len(buf):
                bts = np.fromiter((r[0] for r in buf), dtype=np.int64,
                                  count=len(buf))
                burl = np.array([r[1] for r in buf], dtype=object)
                # new x buffered: window [ts - bound, ts + bound] per
                # new row, enumerated without a per-pair Python loop
                lo = np.searchsorted(bts, nts - bound, side="left")
                hi = np.searchsorted(bts, nts + bound, side="right")
                cnt = hi - lo
                if cnt.sum():
                    ni = np.repeat(np.arange(len(new)), cnt)
                    # concatenated ranges lo[i]..hi[i) per new row
                    bi = (np.arange(cnt.sum())
                          - np.repeat(cnt.cumsum() - cnt, cnt)
                          + np.repeat(lo, cnt))
                    self._emit(key, bts[bi], burl[bi], nts[ni], nurl[ni])
            if len(new) > 1:
                # new x earlier-new (j pairs with i < j within bound)
                lo = np.searchsorted(nts, nts - bound, side="left")
                cnt = np.arange(len(new)) - lo
                if cnt.sum():
                    nj = np.repeat(np.arange(len(new)), cnt)
                    ii = (np.arange(cnt.sum())
                          - np.repeat(cnt.cumsum() - cnt, cnt)
                          + np.repeat(lo, cnt))
                    self._emit(key, nts[ii], nurl[ii], nts[nj], nurl[nj])
            merged = (buf or []) + new
            merged.sort()
            self.buffers[key] = merged

    def _emit(self, key, ats, aurl, bts, burl) -> None:
        """Append a COLUMNAR pair chunk with canonical (ts, url)
        ordering (the earlier row, ties by url, is side a) — pairs
        never exist as per-row Python objects inside the state."""
        swap = (ats > bts) | ((ats == bts) & (aurl > burl))
        self._pairs.append((
            np.full(len(ats), key, dtype=object),
            np.where(swap, burl, aurl),
            np.where(swap, bts, ats).astype(np.int64),
            np.where(swap, aurl, burl),
            np.where(swap, ats, bts).astype(np.int64),
        ))

    def size(self) -> int:
        return sum(len(v) for v in self.buffers.values())

    def drain_frame(self, watermark_us: int):
        """Evict unreachable buffered rows and drain the pairs emitted
        since the last drain as a SORTED pandas frame (host, url_a,
        ts_a, url_b, ts_b) — the shard writes this straight to its own
        parquet file, so pair volume never rides through the driver
        (hot hosts make interval joins quadratic in the worst case;
        the driver must stay O(counts))."""
        import pandas as pd

        horizon = watermark_us - self.bound_us
        for key, buf in list(self.buffers.items()):
            from bisect import bisect_left

            cut = bisect_left(buf, (horizon, ""))
            if cut:
                kept = buf[cut:]
                if kept:
                    self.buffers[key] = kept
                else:
                    del self.buffers[key]
        cols = ["host", "url_a", "ts_a", "url_b", "ts_b"]
        if not self._pairs:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64" if c.startswith("ts")
                              else object) for c in cols})
        df = pd.DataFrame({
            c: np.concatenate([chunk[i] for chunk in self._pairs])
            for i, c in enumerate(cols)
        })
        self._pairs = []
        return (df.sort_values(cols, kind="mergesort")
                .reset_index(drop=True))

    def close(self, watermark_us: int) -> list[tuple]:
        """Tuple view of ``drain_frame`` (oracle / unit-test path)."""
        return list(map(tuple, self.drain_frame(watermark_us)
                        .itertuples(index=False)))

    def snapshot(self) -> dict:
        pairs = []
        for chunk in self._pairs:  # columnar chunks -> row lists
            pairs.extend(
                [chunk[0][i], chunk[1][i], int(chunk[2][i]),
                 chunk[3][i], int(chunk[4][i])]
                for i in range(len(chunk[0])))
        return {
            "bound_us": self.bound_us,
            "buffers": {k: [list(r) for r in v]
                        for k, v in self.buffers.items()},
            "pairs": pairs,
        }

    @classmethod
    def restore(cls, snap: dict) -> "IntervalJoinState":
        st = cls(snap["bound_us"])
        st.buffers = {k: [tuple(r) for r in v]
                      for k, v in snap["buffers"].items()}
        rows = snap["pairs"]
        if rows:
            st._pairs = [(
                np.array([r[0] for r in rows], dtype=object),
                np.array([r[1] for r in rows], dtype=object),
                np.array([r[2] for r in rows], dtype=np.int64),
                np.array([r[3] for r in rows], dtype=object),
                np.array([r[4] for r in rows], dtype=np.int64),
            )]
        return st


class TopKState:
    """Running per-key counts with top-k extraction — the cross-epoch
    "leaderboard" emission mode (re-emitted every epoch as counts grow),
    versus the watermark-closed emission of windows/sessions.

    Hosted per state shard with keys owner-partitioned, each shard's
    counts are complete for its keys, so the global top-k is exactly the
    k-merge of per-shard ``top()`` candidates. ``max_keys > 0`` bounds
    per-shard memory Misra-Gries style (periodic shrink; counts become
    lower bounds with the classic error <= total/(max_keys+1)) for
    unbounded key domains — the streaming sibling of
    ``stages/sketches.py::heavy_hitters``.
    """

    def __init__(self, k: int, max_keys: int = 0):
        if k < 1:
            raise ValueError("top-k needs k >= 1")
        self.k = k
        self.max_keys = max_keys
        self.counts: dict[str, int] = {}

    def add(self, keys: list[str], counts: np.ndarray) -> None:
        c = self.counts
        for key, n in zip(keys, counts):
            c[key] = c.get(key, 0) + int(n)
        if self.max_keys and len(c) > 2 * self.max_keys:
            # amortized MG shrink: subtract the (max_keys+1)-th largest
            # count, drop non-positives (error bound per sketches.py)
            cut = sorted(c.values(), reverse=True)[self.max_keys]
            self.counts = {key: v - cut for key, v in c.items() if v > cut}

    def top(self) -> list[tuple[str, int]]:
        """Local top-k candidates, count-desc then key-asc (deterministic)."""
        return sorted(self.counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[: self.k]

    @staticmethod
    def merge_top(candidates: list[tuple[str, int]],
                  k: int) -> list[tuple[str, int]]:
        """Global top-k from per-shard candidate lists (exact when key
        ownership is disjoint across shards)."""
        return sorted(candidates, key=lambda kv: (-kv[1], kv[0]))[:k]

    def snapshot(self) -> dict:
        return {"k": self.k, "max_keys": self.max_keys,
                "counts": dict(self.counts)}

    @classmethod
    def restore(cls, snap: dict) -> "TopKState":
        st = cls(snap["k"], snap.get("max_keys", 0))
        st.counts = dict(snap["counts"])
        return st


@dataclass
class _Session:
    start: int
    last: int
    count: int
    total: float
    # update-mode correction provenance: the previously-EMITTED sessions
    # this open session absorbed (as emitted tuples with their revision)
    # and the highest absorbed revision. retracts is None on the default
    # path so the non-update engine pays nothing.
    retracts: list | None = None
    rev: int = 0


class SessionState:
    """Per-key open sessions merged on a gap threshold.

    A session covers ``[start, last + gap)``; an event extends it iff
    its ts is within ``gap`` of the covered range, and one event can
    bridge (merge) two sessions. A session closes when the watermark
    passes ``last + gap`` strictly — at that point no non-late event
    can extend it.

    With ``update_horizon_us > 0`` (allowed-lateness update mode) emitted
    sessions are RETAINED for the horizon past their end. An accepted-late
    run that falls within ``gap`` of a retained session REOPENS it: the
    retained emission is pulled back into the open set (possibly bridging
    two retained sessions, or a retained and an open one) and, when the
    merged session re-closes, ``pop_updates`` emits a retract/add
    changelog — one ``retract`` row per previously-emitted session it
    absorbed (byte-equal to the original emission) plus one ``add`` row
    for the corrected session. In-place revisions (the tumbling-window
    contract) cannot express session MERGES, which is why the session
    correction contract is a changelog.
    """

    def __init__(self, gap_us: int, update_horizon_us: int = 0):
        self.gap_us = gap_us
        self.sessions: dict[str, list[_Session]] = {}
        self.update_horizon_us = int(update_horizon_us)
        # key -> retained emitted sessions [start, last, count, total, rev]
        # (gap-separated by construction; kept sorted by start)
        self.closed: dict[str, list[list]] = {}
        # changelog rows pending pop_updates:
        # (key, start_us, end_us, count, total, action, revision)
        self._updates: list[tuple] = []

    def add(self, keys: list[str], ts_us: np.ndarray, totals: np.ndarray) -> None:
        """Fold events into open sessions (each event is a 1-element run)."""
        self.add_runs(keys, ts_us, ts_us, np.ones(len(keys), dtype=np.int64), totals)

    def add_runs(
        self,
        keys: list[str],
        starts_us: np.ndarray,
        lasts_us: np.ndarray,
        counts: np.ndarray,
        totals: np.ndarray,
    ) -> None:
        """Fold pre-merged per-batch session runs into open sessions.

        Session merge is associative, so upstream tasks can collapse each
        batch's events into gap-consistent runs and ship only the runs —
        the scale path that keeps actor RPC payloads tiny.
        """
        gap = self.gap_us
        per_key: dict[str, list[_Session]] = {}
        for i, key in enumerate(keys):
            per_key.setdefault(key, []).append(
                _Session(int(starts_us[i]), int(lasts_us[i]), int(counts[i]),
                         float(totals[i]))
            )
        for key, runs in per_key.items():
            retained = self.closed.get(key) if self.closed else None
            if not retained:
                items = self.sessions.get(key, []) + runs
                items.sort(key=lambda s: (s.start, s.last))
                merged: list[_Session] = []
                for s in items:
                    if merged and s.start - merged[-1].last <= gap:
                        self._absorb(merged[-1], s)
                    else:
                        merged.append(s)
                self.sessions[key] = merged
            else:
                self._add_runs_with_retained(key, runs, retained)

    def _absorb(self, m: _Session, s: _Session) -> None:
        m.last = max(m.last, s.last)
        m.count += s.count
        m.total += s.total
        if s.retracts:
            m.retracts = (m.retracts or []) + s.retracts
            m.rev = max(m.rev, s.rev)

    def _add_runs_with_retained(self, key: str, runs: list[_Session],
                                retained: list[list]) -> None:
        """Merge open sessions + new runs + retained emissions with
        provenance. A merge group that is exactly one untouched retained
        session stays retained; any group that mixes a retained session
        with anything else reopens it (retract recorded on the group's
        open session, emitted with the add on re-close)."""
        gap = self.gap_us
        # (session, retained_entry_or_None); retained entries become
        # candidate sessions so one late run can bridge two of them
        items: list[tuple[_Session, list | None]] = (
            [(s, None) for s in self.sessions.get(key, [])]
            + [(s, None) for s in runs]
            + [(_Session(r[0], r[1], r[2], r[3]), r) for r in retained]
        )
        items.sort(key=lambda it: (it[0].start, it[0].last))
        # groups: [session, retained_entries, n_members]
        groups: list[list] = []
        for s, rent in items:
            if groups and s.start - groups[-1][0].last <= gap:
                g = groups[-1]
                self._absorb(g[0], s)
                if rent is not None:
                    g[1].append(rent)
                g[2] += 1
            else:
                groups.append([s, [rent] if rent is not None else [], 1])
        still_retained: list[list] = []
        open_out: list[_Session] = []
        for s, rents, n in groups:
            if rents and n == len(rents):
                # untouched retained emission(s): by construction retained
                # sessions are gap-separated, so this is a single entry
                still_retained.extend(rents)
                continue
            if rents:
                # reopened: record the exact prior emissions as retracts
                s.retracts = (s.retracts or []) + [
                    (r[0], r[1] + gap, r[2], r[3], r[4]) for r in rents
                ]
                s.rev = max([s.rev] + [r[4] for r in rents])
            open_out.append(s)
        if open_out:
            self.sessions[key] = open_out
        else:
            self.sessions.pop(key, None)
        if still_retained:
            self.closed[key] = still_retained
        else:
            self.closed.pop(key, None)

    def close(self, watermark_us: int) -> list[tuple]:
        """Emit ``(key, session_start, session_end, count, total)`` for
        sessions with ``last + gap < watermark`` (strict), sorted.

        Under update mode a closing session that reopened prior emissions
        routes to the correction changelog instead (retracts + add with a
        bumped revision), and every emission is retained for the horizon.
        """
        out = []
        horizon = self.update_horizon_us
        for key, items in list(self.sessions.items()):
            still_open = []
            for s in items:
                if s.last + self.gap_us < watermark_us:
                    end = s.last + self.gap_us
                    if s.retracts:
                        rev = s.rev + 1
                        for r in sorted(s.retracts):
                            self._updates.append(
                                (key, r[0], r[1], r[2], r[3], "retract",
                                 r[4]))
                        self._updates.append(
                            (key, s.start, end, s.count, s.total, "add",
                             rev))
                        self.closed.setdefault(key, []).append(
                            [s.start, s.last, s.count, s.total, rev])
                        self.closed[key].sort()
                    else:
                        out.append((key, s.start, end, s.count, s.total))
                        if horizon > 0:
                            self.closed.setdefault(key, []).append(
                                [s.start, s.last, s.count, s.total, 0])
                            self.closed[key].sort()
                else:
                    still_open.append(s)
            if still_open:
                self.sessions[key] = still_open
            else:
                self.sessions.pop(key, None)
        if self.closed:
            # age out retained emissions the horizon can no longer touch.
            # Kept on EQUALITY: an accepted-late row satisfies
            # ts >= watermark - horizon, and a row at exactly ts ==
            # session_end still merges (extension allows ts - last ==
            # gap), so a session is only unreachable once
            # end + horizon < watermark — dropping at == would fragment
            # a merge the batch semantics performs
            for key, rents in list(self.closed.items()):
                kept = [r for r in rents
                        if (r[1] + self.gap_us) + horizon >= watermark_us]
                if kept:
                    self.closed[key] = kept
                else:
                    del self.closed[key]
        out.sort()
        return out

    def preview(self) -> list[tuple]:
        """Speculative (early-firing) view of every still-open session:
        ``(key, start_us, provisional_end_us, count, total)`` sorted,
        where the provisional end is ``last + gap`` (what the session
        would close as if no further event arrived). Pure read —
        nothing emitted or evicted; the final close (or a correction
        add) supersedes previews. Unlike window previews a session's
        identity can shift between previews (a bridging event can move
        ``start`` earlier), so supersession is by containment, not by
        key equality."""
        out = [
            (key, s.start, s.last + self.gap_us, s.count, s.total)
            for key, items in self.sessions.items()
            for s in items
        ]
        out.sort()
        return out

    def pop_updates(self, _watermark_us: int = 0) -> list[tuple]:
        """Drain the correction changelog: ``(key, start_us, end_us,
        count, total, action, revision)`` rows, tuple-sorted for
        deterministic epoch output. Consumers match by ``action``, not
        row order: drop every retracted emission, append every add."""
        out = sorted(self._updates)
        self._updates = []
        return out

    def snapshot(self) -> dict:
        snap = {
            "gap_us": self.gap_us,
            "sessions": {
                k: [[s.start, s.last, s.count, s.total, s.rev,
                     s.retracts] for s in v]
                for k, v in self.sessions.items()
            },
        }
        if self.update_horizon_us > 0 or self.closed or self._updates:
            snap["update_horizon_us"] = self.update_horizon_us
            snap["closed"] = {k: [list(r) for r in v]
                              for k, v in self.closed.items()}
            snap["updates"] = [list(r) for r in self._updates]
        return snap

    @classmethod
    def restore(cls, snap: dict) -> "SessionState":
        st = cls(snap["gap_us"], snap.get("update_horizon_us", 0))
        st.sessions = {
            k: [
                _Session(row[0], row[1], row[2], row[3],
                         retracts=([tuple(t) for t in row[5]]
                                   if len(row) > 5 and row[5] else None),
                         rev=row[4] if len(row) > 4 else 0)
                for row in v
            ]
            for k, v in snap["sessions"].items()
        }
        st.closed = {k: [list(r) for r in v]
                     for k, v in snap.get("closed", {}).items()}
        st._updates = [tuple(r) for r in snap.get("updates", [])]
        return st


class DistinctWindowState:
    """Per-(key, window) distinct-value accumulators for the flagship's
    sketch path (SURVEY §2 A6 at 100-TB scale).

    Holds TWO representations side by side:

    * HLL registers (``2**p`` bytes, elementwise-max mergeable) — the
      scale path: exchange volume is constant per (key, window, shard)
      regardless of cardinality;
    * the exact value set — the validation companion that lets the
      engine report the sketch's accuracy delta as a lineage metric.
      A production 10^12-row deployment would disable the companion;
      at test/bench scale it is cheap and keeps the sketch honest.

    Windows close at the same watermark as ``WindowState``, emitting
    ``(key, window_start_us, window_end_us, exact, approx)``.
    """

    def __init__(self, p: int = 12):
        self.p = p
        self.regs: dict[tuple[str, int], np.ndarray] = {}
        self.exact: dict[tuple[str, int], set] = {}
        self.window_end: dict[tuple[str, int], int] = {}

    def add_partials(self, keys: list[str], starts, ends,
                     reg_blobs: list[bytes], value_lists: list[list]) -> None:
        for i, key in enumerate(keys):
            k = (key, int(starts[i]))
            r = np.frombuffer(reg_blobs[i], dtype=np.uint8)
            cur = self.regs.get(k)
            if cur is None:
                self.regs[k] = r.copy()
                self.exact[k] = set(value_lists[i])
                self.window_end[k] = int(ends[i])
            else:
                np.maximum(cur, r, out=cur)
                self.exact[k].update(value_lists[i])

    def close(self, watermark_us: int) -> list[tuple]:
        from ..stages.sketches import _hll_estimate

        out = []
        for k, end in list(self.window_end.items()):
            if end <= watermark_us:
                regs = self.regs.pop(k)
                exact = self.exact.pop(k)
                del self.window_end[k]
                out.append((k[0], k[1], end, len(exact),
                            int(round(_hll_estimate(regs)))))
        out.sort()
        return out

    def snapshot(self) -> dict:
        return {
            "p": self.p,
            "rows": [
                [k[0], k[1], self.window_end[k], self.regs[k].tobytes(),
                 sorted(self.exact[k])]
                for k in sorted(self.window_end)
            ],
        }

    @classmethod
    def restore(cls, snap: dict) -> "DistinctWindowState":
        st = cls(snap["p"])
        for key, start, end, blob, vals in snap["rows"]:
            k = (key, int(start))
            st.regs[k] = np.frombuffer(blob, dtype=np.uint8).copy()
            st.exact[k] = set(vals)
            st.window_end[k] = int(end)
        return st
