"""The micro-batch streaming driver (§3 lifecycle, re-expressed on Ray Data).

One ``StreamingPagesPipeline.run()`` is the analog of the reference's
``run_service`` loop (``src/main.rs:357-398``): it consumes the
partitioned pages log slice by slice (micro-batch epochs = the Kafka
poll loop), pushes each epoch through a streaming Dataset pipeline, and
owns watermarks, state checkpoints and the exactly-once sink commit.

Per-epoch dataflow (direct keyed exchange, NO sort/groupby shuffle):

    read_parquet(slice files, pruned columns)
      -> map_batches(ExtractEnrich, actor pool, Arrow)   # M1-M4: decompress+extract+host
      -> broadcast as-of join (host metadata)            # §2.5 enrichment
      -> map_batches(exchange)                           # split each batch by
                                                         # hash(url) shard, push
                                                         # sub-tables straight to
                                                         # the owning StateShard
                                                         # actor; count lineage
      -> tiny per-batch stats table back to the driver
    driver: finalize_epoch on every StateShard           # sort (url, ts), dedup,
                                                         # window/session partials
                                                         # from survivors, sorted
                                                         # per-shard page output
    driver: route partials to owning shards, close windows, 2PC commit

The exchange replaces a Ray Data ``groupby(shard).map_groups`` — an
all-to-all sort shuffle — with direct actor messaging: each upstream
task `take()`s its batch into per-shard compact Arrow sub-tables and
ships them to the K state actors (this is exactly what a streaming
hash exchange does, minus the sort nobody needs). Fault model: the
exchange stage runs with task retries disabled; any task failure fails
the epoch, the driver drops the epoch's actor buffers and replays the
whole epoch — with the idempotent 2PC sink this keeps exactly-once.

Cross-epoch mutable keyed state (dedup last-seen, open windows, open
sessions) is the one thing the Dataset API cannot express, so it lives
in ``StateShard`` Ray actors — K actors, each owning the hash shard k of
every state kind. All other stages are plain Dataset transforms.

Determinism contract (the oracle in ``pipelines/oracle.py`` replicates
it exactly): rows are processed per epoch; within an epoch, per-key
ordering is (url, warc_ts); the watermark after epoch e is
``max(warc_ts of non-late parsed rows in epochs <= e) - lateness``;
windows close when ``window_end <= watermark``; sessions close when
``last + gap < watermark``. None of this depends on cluster size,
actor count, or shard count.
"""

from __future__ import annotations

import os
import pickle
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import EngineConfig
from ..functions.compression import decompress_safe
from ..functions.extract import html_to_text
from ..functions.filters import PageFilter
from ..observability.health import (
    ActorLivenessChecker,
    BreakerHealthChecker,
    EpochLagHealthChecker,
    HealthMonitor,
    WatermarkHealthChecker,
)
from ..observability.logging import StructuredLogger
from ..observability.metrics import MetricsRegistry
from ..reliability import (HalfOpenCircuitBreaker, RetryConfig,
                           RetryStrategy)
from ..sinks.exactly_once import EpochSink, LockLostError
from ..sources.pages import pages_files
from ..state.store import (DedupState, DistinctWindowState, FunnelState,
                           IntervalJoinState,
                           SessionState, SpillDedupState, TopKState,
                           restore_dedup, WindowState)
from ..state.watermark import PartitionedWatermarkTracker, WatermarkTracker


class _CommitTailError(RuntimeError):
    """A failure in epoch e-1's overlapped commit tail. Wrapped so the
    exchange RetryStrategy treats it as fatal (complete_epoch is not
    replay-idempotent) and the driver re-raises the original cause."""
from ..stages.broadcast import (asof_merge_batch, broadcast_get,
                                sort_versioned)
from ..stages.hashing import shard_of
from ..stages.timeops import NEG_INF_TS, US, column_ts_us, series_ts_us

# _status codes carried through the shuffle so drop reasons are counted
# at one collection point (F7/F8 lineage: quarantined, never crashing)
OK, PARSE_ERROR, FILTERED, LATE = 0, 1, 2, 3

# attempt-fence value for finalized epochs: any late push carries a
# real attempt number far below this and is discarded
_EPOCH_DONE = 1 << 30


@ray.remote(num_cpus=0)
class StateShard:
    """One hash shard of all cross-epoch keyed state (T1/T2/T7 analogs).

    Also the reduce side of the epoch exchange: upstream tasks push this
    shard's rows in via ``accept_rows``; ``finalize_epoch`` then sorts,
    dedups against the shard's own ``DedupState`` (rows were routed by
    the same ``hash(url)`` the dedup state is sharded by, so the lookup
    is local), writes the shard's page output, and returns window /
    session partials grouped by their *owning* shard for the driver to
    route (driver routing avoids actor->actor ``ray.get`` deadlocks).
    """

    def __init__(self, shard_id: int, config: EngineConfig):
        self.shard_id = shard_id
        self.cfg = config
        self._dedup_db = (
            None if config.dedup_spill_dir in (None, ":memory:")
            else os.path.join(config.dedup_spill_dir,
                              f"dedup_shard{shard_id}.sqlite"))
        self.dedup = (
            SpillDedupState(config.dedup_window_s * US, self._dedup_db)
            if config.dedup_spill_dir is not None
            else DedupState(config.dedup_window_s * US))
        self._upd_horizon_us = (config.update_horizon_s * US
                                if config.update_mode else 0)
        self.windows = WindowState(self._upd_horizon_us)
        self.sessions = SessionState(config.windows.session_gap_s * US,
                                     self._upd_horizon_us)
        self.funnel = (
            FunnelState(config.funnel.n_stages, config.funnel.within_s * US,
                        veto_stage=config.funnel.veto_stage,
                        emit_timeouts=config.funnel.emit_timeouts)
            if config.funnel.enabled else None
        )
        self.topk = (TopKState(config.topk_hosts, config.topk_max_keys)
                     if config.topk_hosts > 0 else None)
        self.distinct = (DistinctWindowState(config.sketch_distinct_p)
                         if config.sketch_distinct else None)
        self.intervals = (IntervalJoinState(config.interval_join_s * US)
                          if config.interval_join_s > 0 else None)
        self.buffers: dict[int, list[pa.Table]] = {}
        self.qbuffers: dict[int, list[pa.Table]] = {}  # dead-letter rows
        self.epoch_attempt: dict[int, int] = {}  # replay fence per epoch
        self.push_rows: dict[int, int] = {}  # rows buffered per epoch
        # (current attempt only) — read back by the exchange barrier
        # K shards finalize concurrently on one node; Arrow kernels on
        # ~100k-row shard tables gain nothing from intra-actor threads,
        # and K actors x N threads convoy badly (measured 0.7s -> 6s
        # finalize). Single-threaded Arrow per state actor.
        pa.set_cpu_count(1)

    def accept_rows(self, epoch: int, table: pa.Table,
                    attempt: int = 0) -> int:
        """Buffer one exchange push. ``attempt`` fences replay races:
        after a failed exchange attempt the driver bumps the epoch's
        attempt via ``drop_epoch``; in-flight pushes from the failed
        attempt that land afterwards carry a stale attempt id and are
        discarded instead of duplicating rows in the replay."""
        if attempt < self.epoch_attempt.get(epoch, 0):
            return 0
        self.buffers.setdefault(epoch, []).append(table)
        self.push_rows[epoch] = self.push_rows.get(epoch, 0) + table.num_rows
        return table.num_rows

    def received_rows(self, epoch: int) -> int:
        """Rows buffered for this epoch's CURRENT attempt — the driver's
        exchange barrier compares this against the per-shard pushed
        counts carried home in the stats rows (async pushes are only
        settled when every pushed row is provably buffered)."""
        return self.push_rows.get(epoch, 0)

    def accept_quarantine(self, epoch: int, table: pa.Table,
                          attempt: int = 0) -> int:
        """Buffer dead-letter rows (poison pills the row path rejected,
        F7/F8) for this epoch — same replay fence as ``accept_rows``."""
        if attempt < self.epoch_attempt.get(epoch, 0):
            return 0
        self.qbuffers.setdefault(epoch, []).append(table)
        return table.num_rows

    def drop_epoch(self, epoch: int, next_attempt: int = 1) -> bool:
        self.epoch_attempt[epoch] = next_attempt
        self.qbuffers.pop(epoch, None)
        self.push_rows.pop(epoch, None)
        return self.buffers.pop(epoch, None) is not None

    def finalize_epoch(self, epoch: int, stage_dir: str) -> dict:
        """Dedup + write this shard's epoch output; return stats and
        per-owner window/session partials computed from the survivors."""
        import pyarrow.parquet as pq

        chunks = self.buffers.pop(epoch, [])
        qchunks = self.qbuffers.pop(epoch, [])
        # permanent fence, NOT a pop: with async pushes a straggler from
        # a pre-replay attempt can land after finalize; popping the
        # fence would re-accept it into a dead epoch's buffer forever
        # (one int per epoch is the price of never leaking a table)
        self.epoch_attempt[epoch] = _EPOCH_DONE
        self.push_rows.pop(epoch, None)
        stats = {"rows_deduped": 0, "rows_written": 0}
        if qchunks:
            # dead-letter output (F7/F8 poison pills): sorted for
            # byte-identical replays, committed with the epoch
            qt = pa.concat_tables(qchunks)
            qt = qt.take(pc.sort_indices(
                qt, sort_keys=[("url", "ascending"),
                               ("warc_ts", "ascending")]))
            pq.write_table(
                qt,
                os.path.join(stage_dir,
                             f"quarantine-{self.shard_id:04d}.parquet"),
            )
        if not chunks:
            return {"stats": stats, "windows": {}, "sessions": {},
                    "funnels": {}, "hostcounts": {}, "distincts": {},
                    "intervals": {}}

        # pure Arrow end to end: the buffered chunks are zero-copy views
        # into the object store, and a pandas round-trip of the full
        # (text-heavy) table costs multiples of everything else combined
        import time as _time
        _t0 = _time.time()
        tbl = pa.concat_tables(chunks)
        idx = pc.sort_indices(
            tbl, sort_keys=[("url", "ascending"), ("_ts_us", "ascending")]
        )
        tbl = tbl.take(idx)
        _t1 = _time.time()
        keep = self.dedup.process(
            tbl.column("url").to_pylist(),
            tbl.column("_ts_us").to_numpy(),
        )
        stats["rows_deduped"] = int((~keep).sum())
        tbl = tbl.filter(pa.array(keep))
        _t2 = _time.time()
        windows, sessions, funnels, hostcounts, distincts, intervals = (
            {}, {}, {}, {}, {}, {})
        if tbl.num_rows:
            (windows, sessions, funnels, hostcounts,
             distincts, intervals) = self._partials(tbl)
            _t3 = _time.time()
            path = os.path.join(stage_dir, f"pages-{self.shard_id:04d}.parquet")
            drop = ["_ts_us"] + (["_upd"] if "_upd" in tbl.column_names
                                 else [])
            pq.write_table(tbl.drop_columns(drop), path)
            if os.environ.get("GRAFT_DEBUG_TIMING"):
                print(f"[shard {self.shard_id}] sort={_t1-_t0:.2f} "
                      f"dedup={_t2-_t1:.2f} partials={_t3-_t2:.2f} "
                      f"write={_time.time()-_t3:.2f} rows={tbl.num_rows}",
                      flush=True)
            if self.cfg.fsync_output:
                with open(path, "rb+") as f:
                    os.fsync(f.fileno())
            stats["rows_written"] = tbl.num_rows
        return {"stats": stats, "windows": windows, "sessions": sessions,
                "funnels": funnels, "hostcounts": hostcounts,
                "distincts": distincts, "intervals": intervals}

    def _partials(
            self, tbl: pa.Table
    ) -> tuple[dict, dict, dict, dict, dict, dict]:
        """Pre-aggregate survivors into per-owner window partials and
        session runs — the two-level aggregation that keeps the exchange
        narrow (counts per (key, window), not rows). Only the four
        narrow columns leave Arrow."""
        cfg = self.cfg
        n = cfg.state_shards
        # order-sensitive state (funnel chain fold, distinct-sketch
        # windows) must not see accepted-late correction rows: their
        # correctness invariant is "folded when the watermark passes ==
        # event-time order", which a row behind the watermark breaks.
        # Windows/sessions/topk are commutative merges and take all rows.
        otbl = tbl
        if "_upd" in tbl.column_names:
            otbl = tbl.filter(pc.equal(tbl.column("_upd"),
                                       pa.scalar(0, pa.int8())))
        ts = tbl.column("_ts_us").to_numpy()
        lens = tbl.column("text_len").to_numpy().astype(np.float64)
        # null-fill in Arrow, land in numpy once, reuse everywhere —
        # no pandas column bounce in the exchange hot path
        lang_np = pc.fill_null(tbl.column("lang"), "").to_numpy(
            zero_copy_only=False)
        host_np = pc.fill_null(tbl.column("host"), "").to_numpy(
            zero_copy_only=False)
        windows: dict[int, list] = {}
        tum = cfg.windows.tumbling_size_s * US
        for owner, payload in _window_partials(
            lang_np, ts, lens, tum, tum, n
        ).items():
            windows.setdefault(owner, []).append(("tumbling:lang", *payload))
        sld_size = cfg.windows.sliding_size_s * US
        sld_slide = cfg.windows.sliding_slide_s * US
        for owner, payload in _window_partials(
            lang_np, ts, lens, sld_size, sld_slide, n
        ).items():
            windows.setdefault(owner, []).append(("sliding:lang", *payload))
        sessions = _session_runs(host_np, ts, lens,
                                 cfg.windows.session_gap_s * US, n)
        funnels: dict[int, tuple] = {}
        if self.funnel is not None:
            # CEP stage per page: text_len size class (0..n_stages-1;
            # index n_stages = the veto class when veto_min_len is set).
            # The chain fold is order-sensitive so raw (key, stage, ts)
            # triples ride to the key's owner — three narrow columns,
            # already deduped, the one partial here that can't pre-reduce.
            # (otbl: correction rows excluded — see comment above)
            stages = np.searchsorted(
                np.asarray(cfg.funnel.stage_bounds, dtype=np.int64),
                otbl.column("text_len").to_numpy(), side="right",
            ).astype(np.int64)
            hosts = host_np if otbl is tbl else pc.fill_null(
                otbl.column("host"), "").to_numpy(zero_copy_only=False)
            fts = otbl.column("_ts_us").to_numpy()
            owner = shard_of(hosts, n)
            for o in np.unique(owner):
                m = owner == o
                funnels[int(o)] = (hosts[m].tolist(), stages[m], fts[m])
        hostcounts: dict[int, tuple] = {}
        if self.topk is not None:
            # running top-k partial: pre-reduce to (host, count) pairs —
            # the exchange ships one row per distinct host per shard
            # (downstream merge is a count dict, so order is free).
            # value_counts over the already-landed numpy strings: the
            # pandas hashtable beats sort-based np.unique on object
            # keys (measured in the round-5 interleaved A/B)
            vc = pd.Series(host_np).value_counts()
            hs = vc.index.to_numpy()
            cnts = vc.to_numpy()
            owner = shard_of(hs, n)
            for o in np.unique(owner):
                m = owner == o
                hostcounts[int(o)] = (hs[m].tolist(), cnts[m])
        distincts: dict[int, tuple] = {}
        if self.distinct is not None:
            # per-(lang, tumbling-window) distinct-host partial: one
            # 2**p-byte HLL register array per group (constant-size,
            # mergeable by elementwise max — THE 100-TB shape for
            # per-window distinct) plus the shard-local unique host
            # list as the exact validation companion
            from ..stages.hashing import hash_strings
            from ..stages.sketches import _hll_registers, _splitmix64

            # (otbl: correction rows excluded — a closed distinct
            # window's host set cannot be revised; see comment above)
            dts = otbl.column("_ts_us").to_numpy()
            grp = pd.DataFrame({
                "k": lang_np if otbl is tbl else pc.fill_null(
                    otbl.column("lang"), "").to_numpy(
                        zero_copy_only=False),
                "w": (dts // tum) * tum,
                "h": host_np if otbl is tbl else pc.fill_null(
                    otbl.column("host"), "").to_numpy(
                        zero_copy_only=False),
            })
            keys, starts, blobs, hostlists = [], [], [], []
            for (k, w), sub in grp.groupby(["k", "w"], sort=True):
                hosts = sub["h"].unique()
                keys.append(k)
                starts.append(int(w))
                blobs.append(_hll_registers(
                    _splitmix64(hash_strings(hosts)),
                    self.cfg.sketch_distinct_p).tobytes())
                hostlists.append(hosts.tolist())
            if keys:
                starts_np = np.asarray(starts, dtype=np.int64)
                owner = shard_of(np.asarray(keys, dtype=object), n)
                for o in np.unique(owner):
                    m = owner == o
                    distincts[int(o)] = (
                        [keys[i] for i in np.nonzero(m)[0]],
                        starts_np[m], starts_np[m] + tum,
                        [blobs[i] for i in np.nonzero(m)[0]],
                        [hostlists[i] for i in np.nonzero(m)[0]],
                    )
        intervals: dict[int, tuple] = {}
        if self.intervals is not None:
            # interval self-join feed: raw (host, url, ts) survivor
            # triples to the host's owner (order-sensitive state, so
            # accepted-late correction rows are excluded like the
            # funnel; empty hosts carry no co-crawl meaning)
            ih = pd.Series(otbl.column("host").to_pandas()).fillna("")
            keep_m = (ih != "").to_numpy()
            if keep_m.any():
                ihosts = ih.to_numpy()[keep_m]
                iurls = np.asarray(otbl.column("url").to_pylist(),
                                   dtype=object)[keep_m]
                its = otbl.column("_ts_us").to_numpy()[keep_m]
                owner = shard_of(ihosts, n)
                for o in np.unique(owner):
                    m = owner == o
                    intervals[int(o)] = (ihosts[m].tolist(),
                                         iurls[m].tolist(), its[m])
        return windows, sessions, funnels, hostcounts, distincts, intervals

    def add_window_partials(self, batches: list[tuple]) -> None:
        for kind, keys, starts, ends, counts, totals in batches:
            self.windows.add_partials(kind, keys, starts, ends, counts, totals)

    def add_session_runs(self, batches: list[tuple]) -> None:
        for keys, starts, lasts, counts, totals in batches:
            self.sessions.add_runs(keys, starts, lasts, counts, totals)

    def add_funnel_events(self, batches: list[tuple]) -> None:
        for keys, stages, ts in batches:
            self.funnel.add(keys, stages, ts)

    def add_host_counts(self, batches: list[tuple]) -> None:
        for keys, counts in batches:
            self.topk.add(keys, counts)

    def add_distinct_partials(self, batches: list[tuple]) -> None:
        for keys, starts, ends, blobs, hostlists in batches:
            self.distinct.add_partials(keys, starts, ends, blobs, hostlists)

    def add_interval_rows(self, batches: list[tuple]) -> None:
        for keys, urls, ts in batches:
            self.intervals.add(keys, urls, ts)

    def ping(self) -> int:
        """Liveness probe for the health monitor."""
        return self.shard_id

    def node_id(self) -> str:
        """Placement introspection (multi-node spread assertions)."""
        return ray.get_runtime_context().get_node_id()

    def close(self, watermark_us: int, stage_dir: str | None = None
              ) -> dict:
        closed_windows = self.windows.close(watermark_us)
        # correction re-emissions for retained windows that got late
        # partials (empty list when update mode is off)
        updated_windows = self.windows.pop_updates(watermark_us)
        # early firing: speculative previews of windows still open after
        # this close (empty when off — pure view, nothing checkpointed)
        early_windows = (self.windows.preview()
                         if self.cfg.early_fire else [])
        closed_sessions = self.sessions.close(watermark_us)
        # session retract/add changelog (empty when update mode is off)
        updated_sessions = self.sessions.pop_updates(watermark_us)
        # early firing: previews of sessions still open after this close
        early_sessions = (self.sessions.preview()
                          if self.cfg.early_fire else [])
        closed_funnels = (self.funnel.close(watermark_us)
                          if self.funnel is not None else [])
        # timed-out partial matches + this epoch's veto count (empty/0
        # unless the funnel CEP extensions are configured); vetoes drain
        # on read so the driver's additive counter merge stays exact
        funnel_timeouts = (self.funnel.pop_timeouts()
                           if self.funnel is not None else [])
        vetoes = 0
        if self.funnel is not None:
            vetoes, self.funnel.vetoes = self.funnel.vetoes, 0
        topk = self.topk.top() if self.topk is not None else []
        closed_distinct = (self.distinct.close(watermark_us)
                           if self.distinct is not None else [])
        # interval-join pairs write straight from the shard (hot hosts
        # make interval joins quadratic in the worst case — the driver
        # only ever sees the COUNT, exactly like the page outputs)
        interval_count = 0
        if self.intervals is not None:
            frame = self.intervals.drain_frame(watermark_us)
            interval_count = len(frame)
            if stage_dir is not None and interval_count:
                import pyarrow.parquet as pq

                t = pa.Table.from_pandas(frame, preserve_index=False)
                t = t.set_column(
                    t.schema.get_field_index("ts_a"), "ts_a",
                    t.column("ts_a").cast(pa.timestamp("us")))
                t = t.set_column(
                    t.schema.get_field_index("ts_b"), "ts_b",
                    t.column("ts_b").cast(pa.timestamp("us")))
                pq.write_table(t, os.path.join(
                    stage_dir,
                    f"copage_pairs-{self.shard_id:04d}.parquet"))
        evicted = self.dedup.evict(watermark_us)
        # post-close state sizes — the gauges an operator watches at
        # 10^12 rows: keyed state that fails to evict shows up here as
        # monotone growth long before an actor OOMs (reference exports
        # the same style of Prometheus gauges)
        sizes = {
            "dedup_keys": self.dedup.size(),
            "open_windows": len(self.windows.acc),
            "retained_windows": len(self.windows.closed),
            "open_sessions": sum(len(v)
                                 for v in self.sessions.sessions.values()),
            "retained_sessions": sum(len(v)
                                     for v in self.sessions.closed.values()),
            "funnel_open": (len(self.funnel.chains)
                            if self.funnel is not None else 0),
            "funnel_done": (len(self.funnel.done)
                            if self.funnel is not None else 0),
            "topk_keys": (len(self.topk.counts)
                          if self.topk is not None else 0),
            "distinct_open": (len(self.distinct.window_end)
                              if self.distinct is not None else 0),
            "interval_buffer": (self.intervals.size()
                                if self.intervals is not None else 0),
        }
        return {"windows": closed_windows, "window_updates": updated_windows,
                "sizes": sizes,
                "window_early": early_windows, "sessions": closed_sessions,
                "session_updates": updated_sessions,
                "session_early": early_sessions,
                "funnels": closed_funnels,
                "funnel_timeouts": funnel_timeouts, "vetoes": vetoes,
                "topk": topk, "distinct": closed_distinct,
                "interval_count": interval_count,
                "evicted": evicted}

    def _snapshot_rest(self) -> dict:
        return {
            "windows": self.windows.snapshot(),
            "sessions": self.sessions.snapshot(),
            "funnel": (self.funnel.snapshot()
                       if self.funnel is not None else None),
            "topk": (self.topk.snapshot()
                     if self.topk is not None else None),
            "distinct": (self.distinct.snapshot()
                         if self.distinct is not None else None),
            "intervals": (self.intervals.snapshot()
                          if self.intervals is not None else None),
        }

    def snapshot(self) -> dict:
        return {"dedup": self.dedup.snapshot(), **self._snapshot_rest()}

    def restore(self, snap: dict, sidecar_dir: str | None = None) -> bool:
        if hasattr(self.dedup, "close"):
            # release the outgoing sqlite connection BEFORE the restore
            # truncates its backing file (fd hygiene; mandatory-locking
            # filesystems would otherwise refuse the rewrite)
            self.dedup.close()
        self.dedup = restore_dedup(snap["dedup"], self._dedup_db, sidecar_dir)
        self.windows = WindowState.restore(snap["windows"],
                                           self._upd_horizon_us)
        self.sessions = SessionState.restore(snap["sessions"])
        fun = snap.get("funnel")
        self.funnel = FunnelState.restore(fun) if fun is not None else None
        tk = snap.get("topk")
        self.topk = TopKState.restore(tk) if tk is not None else None
        di = snap.get("distinct")
        self.distinct = (DistinctWindowState.restore(di)
                         if di is not None else None)
        iv = snap.get("intervals")
        self.intervals = (IntervalJoinState.restore(iv)
                          if iv is not None else None)
        return True

    def write_snapshot(self, path: str) -> int:
        """Checkpoint this shard's state to ``path`` (K parallel writes
        instead of the driver serializing every shard's state itself).

        A file-backed spill dedup store checkpoints via sqlite's
        page-streamed backup into a ``.dedup.sqlite`` sidecar beside the
        pickle (committed in the same 2PC epoch dir) — actor RAM stays
        bounded by the batch, never the key domain, through snapshot as
        well as process()."""
        if isinstance(self.dedup, SpillDedupState) and self.dedup.db_path:
            sidecar = path + ".dedup.sqlite"
            dedup_snap = self.dedup.snapshot_to_file(sidecar)
            if self.cfg.fsync_output:
                with open(sidecar, "rb+") as f:
                    os.fsync(f.fileno())
            snap = {"dedup": dedup_snap, **self._snapshot_rest()}
        else:
            snap = self.snapshot()
        blob = pickle.dumps(snap, protocol=4)
        with open(path, "wb") as f:
            f.write(blob)
            if self.cfg.fsync_output:
                f.flush()
                os.fsync(f.fileno())
        return len(blob)

    def restore_from_file(self, path: str) -> bool:
        with open(path, "rb") as f:
            return self.restore(pickle.load(f),
                                sidecar_dir=os.path.dirname(path))

    def restore_fragments(self, frags: list[dict]) -> bool:
        """Rescaled resume: become the merged state of this shard's
        fragments, one from each OLD shard (see ``state/rescale.py``).
        Fragment keys are disjoint, so the merge is plain insertion."""
        from ..state.rescale import build_dedup, merge_fragments

        if hasattr(self.dedup, "close"):
            self.dedup.close()
        self.dedup = build_dedup([f["dedup"] for f in frags],
                                 self._dedup_db)
        merged = merge_fragments(frags)
        self.windows = WindowState.restore(merged["windows"],
                                           self._upd_horizon_us)
        self.sessions = SessionState.restore(merged["sessions"])
        fun = merged["funnel"]
        self.funnel = FunnelState.restore(fun) if fun is not None else None
        tk = merged["topk"]
        self.topk = TopKState.restore(tk) if tk is not None else None
        di = merged["distinct"]
        self.distinct = (DistinctWindowState.restore(di)
                         if di is not None else None)
        iv = merged.get("intervals")
        self.intervals = (IntervalJoinState.restore(iv)
                          if iv is not None else None)
        return True


@ray.remote
def _split_state_file(path: str, new_shards: int,
                      scratch_dir: str, old_shard: int) -> list[dict]:
    """Rescale worker: split one old shard's checkpoint into per-new-
    owner fragments (K of these run in parallel, one per old file;
    disk-backed dedup B-trees stream through in bounded chunks)."""
    from ..state.rescale import split_snapshot

    with open(path, "rb") as f:
        snap = pickle.load(f)
    return split_snapshot(snap, new_shards,
                          sidecar_dir=os.path.dirname(path),
                          scratch_dir=scratch_dir, old_shard=old_shard)


def _window_partials(keys, ts, totals, size_us, slide_us, nshards) -> dict:
    """Collapse rows to per-(key, window_start) (count, sum) partials,
    replicated across the ⌈size/slide⌉ covering windows, grouped by the
    key's owning state shard."""
    slide_start = (ts // slide_us) * slide_us
    df = pd.DataFrame({"k": np.asarray(keys), "s": slide_start,
                       "v": totals})
    part = df.groupby(["k", "s"], sort=True).agg(
        c=("v", "size"), t=("v", "sum")
    ).reset_index()
    reps = int(size_us // slide_us)
    frames = []
    for i in range(reps):
        f = part.copy()
        f["s"] = f["s"] - i * slide_us
        frames.append(f)
    part = pd.concat(frames, ignore_index=True)
    part = part.groupby(["k", "s"], sort=True).agg(
        c=("c", "sum"), t=("t", "sum")
    ).reset_index()
    part["owner"] = shard_of(part["k"].to_numpy(), nshards)
    out = {}
    for owner, sub in part.groupby("owner"):
        out[int(owner)] = (
            sub["k"].tolist(),
            sub["s"].to_numpy(),
            sub["s"].to_numpy() + size_us,
            sub["c"].to_numpy(),
            sub["t"].to_numpy(),
        )
    return out


def _session_runs(hosts, ts, totals, gap_us, nshards) -> dict:
    """Collapse rows to gap-consistent per-key session runs (merge is
    associative, so runs fold correctly into open sessions), grouped by
    the key's owning state shard."""
    df = pd.DataFrame({"k": np.asarray(hosts), "ts": ts, "v": totals})
    df = df.sort_values(["k", "ts"], kind="mergesort")
    tsv = df["ts"].to_numpy()
    new_key = ~df["k"].eq(df["k"].shift()).to_numpy()
    brk = np.empty(len(df), dtype=bool)
    brk[:1] = True
    if len(df) > 1:
        brk[1:] = (tsv[1:] - tsv[:-1]) > gap_us
    df["run"] = np.cumsum(new_key | brk)
    runs = df.groupby(["k", "run"], sort=True).agg(
        s=("ts", "min"), l=("ts", "max"), c=("ts", "size"), t=("v", "sum")
    ).reset_index()
    runs["owner"] = shard_of(runs["k"].to_numpy(), nshards)
    out = {}
    for owner, sub in runs.groupby("owner"):
        out[int(owner)] = (
            sub["k"].tolist(), sub["s"].to_numpy(), sub["l"].to_numpy(),
            sub["c"].to_numpy(), sub["t"].to_numpy(),
        )
    return out


class ExtractEnrich:
    """Actor-pool stage: decompress + extract + host + status (M1-M4, F1).

    Construction happens once per actor (``__init__``); per batch it is
    pure Arrow work plus the per-row decompress/extract scalar calls.
    The page filter and the epoch's frozen watermark are plain
    constructor args, so each epoch's pool is immutable state.
    """

    def __init__(self, page_filter: PageFilter | None, watermark_us: int,
                 update_horizon_us: int = 0):
        self.filter = page_filter
        self.watermark_us = watermark_us
        # update mode: rows within [wm - horizon, wm) are ACCEPTED as
        # corrections (flagged _upd) instead of classified LATE
        self.update_horizon_us = update_horizon_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        # The ONLY per-row Python here is decompress+extract (regex
        # over bytes — inherently scalar). Host parsing, text length
        # and the status lattice are Arrow/numpy kernels: at 10^12
        # rows every interpreter op in this stage is paid per document.
        htmls = batch["html"].to_pylist()
        texts = [html_to_text(decompress_safe(raw) if raw else raw)
                 for raw in htmls]
        text_arr = pa.array(texts, type=pa.string())
        status = np.where(
            np.asarray(pc.equal(text_arr, pa.scalar(""))),
            PARSE_ERROR, OK).astype(np.int8)

        # host = part between '://' and the next '/'. ONE split pass
        # over the urls: each row's last list element is taken by flat
        # offset (zero-copy gather), and rows without '://' (length-1
        # lists, whose last element is the whole url) are masked to ''
        # — matching netloc_of's scalar semantics.
        sp = pc.split_pattern(batch["url"], "://", max_splits=1)
        la = (sp.combine_chunks() if isinstance(sp, pa.ChunkedArray)
              else sp)
        offs = la.offsets.to_numpy()
        has_proto = pa.array(np.diff(offs) == 2)
        rest = pc.if_else(
            has_proto, la.values.take(pa.array(offs[1:] - 1)),
            pa.scalar(""))
        hosts = pc.list_element(
            pc.split_pattern(rest, "/", max_splits=1), 0)

        ts_us = series_ts_us(pd.Series(batch["warc_ts"].to_pandas())).to_numpy()
        late = ts_us < self.watermark_us - self.update_horizon_us
        status = np.where((status == OK) & late, LATE, status)
        upd = None
        if self.update_horizon_us > 0:
            upd = ((ts_us < self.watermark_us) & ~late
                   & (status == OK)).astype(np.int8)

        out = batch.drop_columns(["html"])
        out = out.append_column(
            "host", hosts.combine_chunks() if isinstance(
                hosts, pa.ChunkedArray) else hosts)
        out = out.append_column("text", text_arr)
        out = out.append_column(
            "text_len", pc.cast(pc.utf8_length(text_arr), pa.int64()))
        if self.filter is not None:
            keep = self.filter.mask(out)
            keep_np = np.asarray(keep.to_pandas(), dtype=bool)
            status = np.where((status == OK) & ~keep_np, FILTERED, status)
        out = out.append_column("_status", pa.array(status))
        if upd is not None:
            out = out.append_column(
                "_upd", pa.array(np.where(status == OK, upd, 0)))
        return out


class ExchangeToShards:
    """Map stage that routes each batch's clean rows to their owning
    StateShard actor (the streaming hash exchange) and emits one lineage
    stats row per batch.

    Runs as plain tasks with retries DISABLED: a retried task would
    double-push its rows, so any task failure fails the epoch and the
    driver replays it after dropping the epoch's actor buffers (see
    module docstring — with the idempotent sink this stays exactly-once).
    """

    def __init__(self, actors: list, epoch: int, state_shards: int,
                 attempt: int = 0, quarantine_late: bool = False):
        self.actors = actors
        self.epoch = epoch
        self.state_shards = state_shards
        self.attempt = attempt
        self.quarantine_late = quarantine_late
        # async pushes, depth-1 pipelined: batch i's pushes are awaited
        # only when batch i+1 arrives, so the push round-trip overlaps
        # the next batch's extract/join compute instead of serializing
        # after it. The LAST batch's pushes are settled by the driver's
        # counter barrier (pushed_per_shard in the stats rows vs
        # StateShard.received_rows), which keeps the attempt fence: a
        # replay bumps the attempt, making stale in-flight pushes no-ops.
        self._pending: list = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        status = batch.column("_status").to_numpy(zero_copy_only=False)
        stats = {
            "rows_read": len(status),
            "parse_errors": int((status == PARSE_ERROR).sum()),
            "rows_filtered_out": int((status == FILTERED).sum()),
            "late_dropped": int((status == LATE).sum()),
            "max_ts_us": NEG_INF_TS,
        }
        if "_upd" in batch.column_names:
            stats["late_accepted"] = int(
                batch.column("_upd").to_numpy(zero_copy_only=False).sum())
        dead = [("parse_error", np.nonzero(status == PARSE_ERROR)[0])]
        if self.quarantine_late:
            # late-data DLQ: late rows are dropped from every window
            # either way (they're behind the frozen watermark), but with
            # this flag they surface as committed quarantine rows for
            # offline reprocessing instead of existing only as a counter
            dead.append(("late", np.nonzero(status == LATE)[0]))
        err_idx = np.concatenate([ix for _, ix in dead])
        if err_idx.size:
            # dead-letter routing (F7/F8): poison rows ride to their
            # url-owner shard as three narrow columns and surface as a
            # committed quarantine table instead of vanishing into a
            # counter
            bad = batch.take(err_idx)
            qt = pa.table({
                "url": bad.column("url"),
                "warc_ts": bad.column("warc_ts"),
                "reason": pa.array(
                    np.repeat([r for r, _ in dead],
                              [len(ix) for _, ix in dead]),
                    type=pa.string()),
            })
            qshards = shard_of(qt.column("url").to_numpy(zero_copy_only=False),
                               self.state_shards)
            ray.get([
                self.actors[int(k)].accept_quarantine.remote(
                    self.epoch, qt.take(np.nonzero(qshards == k)[0]),
                    self.attempt,
                )
                for k in np.unique(qshards)
            ])
        ok_idx = np.nonzero(status == OK)[0]
        pushed = np.zeros(self.state_shards, dtype=np.int64)
        if ok_idx.size:
            ok = batch.take(ok_idx).drop_columns(["_status"])
            # column_ts_us casts to timestamp("us") first: a bare
            # int64 cast would mis-scale if an upstream pandas
            # round-trip re-coerced the unit to ns/s
            ts_us = column_ts_us(ok.column("warc_ts"))
            stats["max_ts_us"] = int(ts_us.max())
            ok = ok.append_column("_ts_us", pa.array(ts_us))
            shards = shard_of(ok.column("url").to_numpy(zero_copy_only=False),
                              self.state_shards)
            pushed = np.bincount(shards, minlength=self.state_shards
                                 ).astype(np.int64)
            if self._pending:  # settle the PREVIOUS batch's pushes
                ray.get(self._pending)
            self._pending = [
                self.actors[int(k)].accept_rows.remote(
                    self.epoch, ok.take(np.nonzero(shards == k)[0]),
                    self.attempt,
                )
                for k in np.unique(shards)
            ]
        out = {k: [v] for k, v in stats.items()}
        out["pushed_per_shard"] = pa.array([pushed.tolist()],
                                           type=pa.list_(pa.int64()))
        return pa.table(out)


# one-time per-worker-process Arrow thread pinning: N map workers x M
# Arrow threads convoy on this box (measured: 21-22s -> 15s wall at 32
# CPUs on the 2M-row bench just from this); each task is already the
# parallelism unit, so intra-task Arrow threads only fight each other
_ARROW_PINNED = False


def _pin_arrow_single_thread() -> None:
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        pa.set_cpu_count(1)
        _ARROW_PINNED = True


class EpochMapper:
    """The whole per-epoch row path as ONE fused task operator:
    extract/enrich (M1-M4, F1) -> broadcast as-of join (§2.5) ->
    keyed exchange into the state shards.

    Ray Data would fuse the three map stages itself were it not for the
    exchange's retry-disabling remote args; fusing by hand keeps the
    pipeline at two operators (read -> this), so every task is CPU-bound
    end-to-end and the streaming executor keeps all cores busy instead
    of trickling blocks through three short task pools.
    """

    def __init__(self, page_filter, watermark_us: int,
                 meta_ref, defaults: dict | None,
                 actors: list, epoch: int, state_shards: int,
                 attempt: int = 0, quarantine_late: bool = False,
                 update_horizon_us: int = 0):
        self.extract = ExtractEnrich(page_filter, watermark_us,
                                     update_horizon_us)
        self.meta_ref = meta_ref
        self.defaults = defaults or {}
        self.exchange = ExchangeToShards(actors, epoch, state_shards,
                                         attempt, quarantine_late)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time
        _pin_arrow_single_thread()
        _t0 = _time.time()
        t = self.extract(batch)
        _t1 = _time.time()
        if self.meta_ref is not None:
            # broadcast metadata deserializes once per worker process
            # (stages/broadcast.py); the shared as-of kernel joins the
            # latest metadata version at each row's event time
            out = asof_merge_batch(
                t.to_pandas(), broadcast_get(self.meta_ref),
                "host", "warc_ts", self.defaults)
            t = pa.Table.from_pandas(out, preserve_index=False)
        _t2 = _time.time()
        res = self.exchange(t)
        if os.environ.get("GRAFT_DEBUG_TIMING") == "3":
            print(f"[mapper] n={batch.num_rows} extract={_t1-_t0:.2f} "
                  f"join={_t2-_t1:.2f} push={_time.time()-_t2:.2f}",
                  flush=True)
        return res


class StreamingPagesPipeline:
    """Micro-batch streaming over a partitioned pages log with
    exactly-once output and checkpoint/resume."""

    def __init__(
        self,
        input_dir: str,
        output_dir: str,
        config: EngineConfig = EngineConfig(),
        page_filter: PageFilter | None = None,
        host_metadata: pd.DataFrame | None = None,
        metadata_slices: dict[int, pd.DataFrame] | None = None,
        logger: StructuredLogger | None = None,
    ):
        """``host_metadata`` is the static (fully-known-upfront) slow
        side of the enrichment join. ``metadata_slices`` makes the slow
        side a STREAM instead: epoch -> batch of new metadata versions
        that become visible once that epoch is ingested (the
        symbol-table stream-stream join: versions accumulate in keyed
        state, fast-side rows join as-of by ``updated_ts <= warc_ts``
        against every version that has ARRIVED). Both may be combined;
        slices for epochs the resume path skips are replayed into the
        accumulated state so the broadcast side is identical on resume.
        """
        config.validate()
        self.input_dir = input_dir
        self.output_dir = output_dir
        if config.dedup_spill_dir not in (None, ":memory:"):
            # Namespace spill state by output dir: the run lock only
            # guards out_dir, so two pipelines sharing a literal spill
            # dir would otherwise clobber each other's live sqlite
            # files (and a fresh run os.remove()s them). A pure
            # function of out_dir keeps resume deterministic while the
            # lock transitively covers the spill files too.
            import dataclasses
            import hashlib

            ns = hashlib.md5(
                os.path.abspath(output_dir).encode()).hexdigest()[:12]
            config = dataclasses.replace(
                config,
                dedup_spill_dir=os.path.join(
                    config.dedup_spill_dir, f"run_{ns}"),
            )
        self.cfg = config
        self.page_filter = page_filter
        self.host_metadata = host_metadata
        self.metadata_slices = metadata_slices or {}
        self.sink = EpochSink(output_dir)
        self.metrics = MetricsRegistry()
        # structured JSON-lines logging (logging.rs/tracing.rs analog);
        # silent unless GRAFT_LOG_LEVEL lowers the gate or a logger is
        # injected — replay/refusal paths log at warn/error regardless
        self.log = logger or StructuredLogger(
            "streaming", level=os.environ.get("GRAFT_LOG_LEVEL", "warn"),
        )
        # sink FS ops are the one external dependency: retried with
        # backoff (commit is idempotent), fenced by a breaker so a
        # persistently failing filesystem fails fast instead of
        # hammering (SURVEY §2.10 mapping). Half-open variant
        # (circuit_breaker_sdk.rs:34-440): after the reset timeout ONE
        # trial commit is admitted — success closes the circuit,
        # failure re-opens it with a fresh backoff window, so a still-
        # broken filesystem is probed once per window, never hammered.
        self.sink_breaker = HalfOpenCircuitBreaker(
            threshold=config.sink_breaker_threshold,
            reset_timeout_s=config.sink_breaker_reset_s,
        )
        # a fenced run lock is fatal: retrying cannot re-own the lock,
        # and every wasted attempt risks racing the new owner
        self._sink_retry = RetryStrategy(
            RetryConfig(max_retries=2, initial_delay_s=0.1, max_delay_s=5.0),
            seed=1, fatal=(LockLostError,),
        )
        # health surface (health.rs analog): stateful checkers observe
        # per-epoch facts; the folded report lands in _observability/
        self.health = HealthMonitor(version="2")
        self._wm_check = WatermarkHealthChecker()
        self._lag_check = EpochLagHealthChecker()
        self._liveness = ActorLivenessChecker([])
        for c in (self._wm_check, self._lag_check,
                  BreakerHealthChecker(self.sink_breaker), self._liveness):
            self.health.add_checker(c)
        self._plan_len = 0
        self._meta_ref = None   # broadcast ref of the accumulated slow side
        self._meta_acc: pd.DataFrame | None = None  # accumulated versions
        self._meta_ingested_until = -1  # highest epoch already folded in
        self._ds_stats: dict[int, str] = {}  # epoch -> Dataset.stats()
        # deferred commit: (epoch, tables, snap_refs, wm_us, counters,
        # blob, drain) — the snapshot-wait + manifest write of epoch e
        # overlaps epoch e+1's exchange; flushed before the next
        # settle/replay/drain (see _flush_commit)
        self._pending_commit = None
        self._prune_cursor = 0  # retention scan watermark (epoch id)
        # distributed tracing (tracing.rs:1-467 analog): per-epoch trace
        # with exchange/finalize/commit child spans; ids derive from
        # (config_fp, epoch) so a resumed run re-emits identical ids.
        # Serialized per epoch into the _observability/ sidecar and
        # served in-memory on /trace.
        from ..observability.tracing import Tracer

        self.tracer = Tracer("bitquery_kafka_streams_rust_ray", version="2")
        self._trace_marks: dict[int, dict] = {}
        self._traces: deque = deque(maxlen=64)
        if self.metadata_slices and self.host_metadata is None:
            # schema-stable empty base: epochs before the first arrival
            # still run the join (all defaults) so output schema never
            # changes mid-stream
            first = next(iter(self.metadata_slices.values()))
            self.host_metadata = first.iloc[0:0]

    def _ingest_metadata(self, epoch: int) -> None:
        """Fold this epoch's slow-side arrivals into the accumulated
        versioned table and refresh the broadcast ref when it changed.

        Idempotent per epoch: the in-run replay path re-calls
        ``_exchange_epoch`` (and therefore this) for the same epoch —
        re-folding would duplicate the slice into the broadcast state
        and re-broadcast it on every replay."""
        if epoch <= self._meta_ingested_until:
            return
        self._meta_ingested_until = epoch
        changed = False
        if self._meta_acc is None and self.host_metadata is not None:
            self._meta_acc = self.host_metadata
            changed = True
        sl = self.metadata_slices.get(epoch)
        if sl is not None and len(sl):
            self._meta_acc = (
                sl.copy() if self._meta_acc is None
                else pd.concat([self._meta_acc, sl], ignore_index=True)
            )
            changed = True
        if changed:
            self._meta_ref = ray.put(
                sort_versioned(self._meta_acc, "host", "updated_ts"))

    # --- epoch plan ------------------------------------------------------
    def epoch_plan(self) -> list[list[str]]:
        """Group input files into epochs: ``files_per_epoch`` arrival
        slices per epoch (all shards of those slices)."""
        files = pages_files(self.input_dir)
        slices: dict[int, list[str]] = {}
        for f in files:
            s = int(os.path.basename(f).split("-")[1])
            slices.setdefault(s, []).append(f)
        ordered = [slices[s] for s in sorted(slices)]
        fpe = self.cfg.files_per_epoch
        return [
            sum(ordered[i : i + fpe], [])
            for i in range(0, len(ordered), fpe)
        ]

    # --- main loop -------------------------------------------------------
    def run(self, resume: bool = True, drain: bool = True) -> dict:
        cfg = self.cfg
        if cfg.http_port is not None:
            # probe surface for the duration of the run
            # (http_server.rs:41-87); ephemeral port lands in
            # self.http_server.port
            from ..observability.http_server import ObservabilityServer

            self.http_server = ObservabilityServer(
                self.health, self.metrics, port=cfg.http_port,
                version="2", state_reader=self._queryable_state,
                traces=lambda: list(self._traces)).start()
            try:
                return self._run_inner(resume=resume, drain=drain)
            finally:
                self.http_server.stop()
        return self._run_inner(resume=resume, drain=drain)

    def _config_fp(self) -> str:
        """Stable hash of every OUTPUT-SHAPING knob: semantic config
        fields, the filter spec, and whether an enrichment side exists.
        Recorded in each epoch manifest; resume refuses a changed
        fingerprint — epochs committed under one filter/window config
        must never silently mix with epochs produced under another
        (the committed output would be a chimera of two contracts).
        Operational knobs (concurrency, batch sizes, ports, timeouts)
        deliberately excluded: they are free to change across resumes."""
        import hashlib
        import json as _json

        cfg = self.cfg
        sem = {
            "dedup_window_s": cfg.dedup_window_s,
            "allowed_lateness_s": cfg.allowed_lateness_s,
            "windows": [cfg.windows.tumbling_size_s,
                        cfg.windows.sliding_size_s,
                        cfg.windows.sliding_slide_s,
                        cfg.windows.session_gap_s],
            "funnel": [cfg.funnel.enabled, cfg.funnel.within_s,
                       list(cfg.funnel.bounds), cfg.funnel.veto_min_len,
                       cfg.funnel.emit_timeouts],
            "topk": [cfg.topk_hosts, cfg.topk_max_keys],
            "sketch_distinct": [cfg.sketch_distinct, cfg.sketch_distinct_p],
            # files_per_epoch deliberately absent: the plan guard below
            # checks epoch grouping per-epoch against the recorded
            # input_files — strictly more precise than a config compare
            "quarantine_late": cfg.quarantine_late,
            "update_mode": [cfg.update_mode, cfg.update_horizon_s],
            "early_fire": cfg.early_fire,
            "per_partition_watermark": cfg.per_partition_watermark,
            # added only when on, so fingerprints of every config that
            # predates the knob (and every config not using it) are
            # unchanged — resumes across this engine version stay legal
            **({"watermark_idle_epochs": cfg.watermark_idle_epochs}
               if cfg.watermark_idle_epochs else {}),
            **({"interval_join_s": cfg.interval_join_s}
               if cfg.interval_join_s else {}),
            "min_text_len": cfg.min_text_len,
            "min_weighted_len": cfg.min_weighted_len,
            # construction-time facts only (the accumulated slow side
            # grows during the run and must not shift the fp)
            "has_metadata": self.host_metadata is not None
                            or bool(self.metadata_slices),
        }
        f = self.page_filter
        if f is not None:
            sem["filter"] = {
                "langs": sorted(f.langs) if f.langs else None,
                "min_ts": str(f.min_ts) if f.min_ts is not None else None,
                "max_ts": str(f.max_ts) if f.max_ts is not None else None,
                "hosts": sorted(f.hosts) if f.hosts else None,
                "min_text_len": f.min_text_len,
                "urls": sorted(f.urls) if f.urls else None,
                # a custom closure's logic is unhashable: its PRESENCE
                # is pinned, and changing its body across a resume is
                # on the caller (documented)
                "custom": f.custom is not None,
            }
        blob = _json.dumps(sem, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def _queryable_state(self, subpath: str):
        """Interactive queries (Kafka Streams queryable-state analog)
        over the LATEST COMMITTED epoch — reads can never observe an
        uncommitted 2PC, so they are exactly-once-consistent. Views:
        ``""`` (commit summary), ``"topk"`` (current leaderboard),
        ``"window/<key>"`` (that key's windows closed in the latest
        epoch), ``"watermark"`` (per-partition maxes, idle counters and
        the monotone floor — where the min-combine stands and which
        streams are holding it back or excluded). Served from the
        sink's manifest + committed parquet, so the surface also works
        for a separate monitoring process pointed at the same output
        dir."""
        import pyarrow.parquet as _pq

        epochs = self.sink.committed_epochs()
        if not epochs:
            return {"epoch": None} if subpath == "" else None
        last = epochs[-1]
        man = self.sink.read_manifest(last)
        if subpath == "":
            return {"epoch": last, "watermark_us": man["watermark_us"],
                    "counters": man["counters"]}
        d = self.sink.epoch_dir(last)
        if subpath == "topk":
            p = os.path.join(d, "topk_host.parquet")
            if not os.path.exists(p):
                return []
            return _pq.read_table(p).to_pylist()
        if subpath.startswith("window/"):
            key = subpath[len("window/"):]
            p = os.path.join(d, "tumbling_lang.parquet")
            if not os.path.exists(p):
                return []
            t = _pq.read_table(p)
            t = t.filter(pc.equal(t.column("key"), key))
            out = t.to_pylist()
            for r in out:  # timestamps -> epoch-us ints (JSON-able)
                for c in ("window_start", "window_end"):
                    r[c] = int(pd.Timestamp(r[c]).value // 1000)
            return out
        if subpath == "updates":
            # update-mode corrections committed in the latest epoch
            p = os.path.join(d, "window_updates.parquet")
            if not os.path.exists(p):
                return []
            out = _pq.read_table(p).to_pylist()
            for r in out:
                for c in ("window_start", "window_end"):
                    r[c] = int(pd.Timestamp(r[c]).value // 1000)
            return out
        if subpath == "session_updates":
            # session retract/add changelog committed in the latest epoch
            p = os.path.join(d, "session_updates.parquet")
            if not os.path.exists(p):
                return []
            out = _pq.read_table(p).to_pylist()
            for r in out:
                for c in ("session_start", "session_end"):
                    r[c] = int(pd.Timestamp(r[c]).value // 1000)
            return out
        if subpath == "funnel_timeouts":
            # abandoned funnels committed in the latest epoch
            p = os.path.join(d, "funnel_timeouts.parquet")
            if not os.path.exists(p):
                return []
            out = _pq.read_table(p).to_pylist()
            for r in out:
                for c in ("start_ts", "timeout_ts"):
                    r[c] = int(pd.Timestamp(r[c]).value // 1000)
            return out
        if subpath == "copage_pairs":
            # interval-join pairs committed in the latest epoch
            # (per-shard files, like the page outputs)
            import glob as _glob

            files = sorted(_glob.glob(
                os.path.join(d, "copage_pairs-*.parquet")))
            out = []
            for p in files:
                out.extend(_pq.read_table(p).to_pylist())
            for r in out:
                for c in ("ts_a", "ts_b"):
                    r[c] = int(pd.Timestamp(r[c]).value // 1000)
            return out
        if subpath == "watermark":
            # where the watermark stands and why: per-partition maxes
            # under min-combine, idle counters (which streams are
            # excluded / aging toward exclusion) and the monotone floor
            out = {"watermark_us": man["watermark_us"]}
            p = os.path.join(d, "state.pkl")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    snap = pickle.load(f)["watermark"]
                out["allowed_lateness_us"] = snap["allowed_lateness_us"]
                if snap.get("partitioned"):
                    out["partitions"] = snap["max_per_partition"]
                    out["epochs_idle"] = snap.get("epochs_idle", {})
                    out["floor_us"] = snap.get("floor_us")
                    out["idle_epochs_threshold"] = \
                        self.cfg.watermark_idle_epochs
            return out
        return None

    def _run_inner(self, resume: bool, drain: bool) -> dict:
        # one driver per output dir (the Kafka one-consumer-per-
        # partition analog); released on return. The lease is a config
        # knob so epochs longer than the default 1h can keep the lock
        # un-stealable.
        self.sink.acquire_lock(lease_s=self.cfg.lock_lease_s)
        try:
            return self._run_locked(resume=resume, drain=drain)
        finally:
            self.sink.release_lock()

    def _run_locked(self, resume: bool, drain: bool) -> dict:
        cfg = self.cfg
        import time as _time
        _phase_t0 = _time.time()
        _dbg = os.environ.get("GRAFT_DEBUG_TIMING")
        # SPREAD: on a multi-node cluster the K num_cpus=0 state actors
        # must land on distinct nodes (default packing would co-locate
        # them on the head node, making finalize K-way on one box).
        # Shard->key hashing is layout-independent, so placement never
        # affects output.
        actors = [
            StateShard.options(scheduling_strategy="SPREAD").remote(i, cfg)
            for i in range(cfg.state_shards)
        ]
        watermark = (PartitionedWatermarkTracker(
                         cfg.allowed_lateness_s * US,
                         idle_epochs=cfg.watermark_idle_epochs)
                     if cfg.per_partition_watermark
                     else WatermarkTracker(cfg.allowed_lateness_s * US))
        self._liveness.actors = actors

        plan = self.epoch_plan()
        self._plan_len = len(plan)
        self._plan_files = [[os.path.basename(f) for f in files]
                            for files in plan]
        start_epoch = 0
        if resume:
            committed = self.sink.committed_epochs()
            if committed:
                last = committed[-1]
                manifest = self.sink.read_manifest(last)
                # config guard: epochs committed under one filter/window
                # contract must never mix with epochs produced under
                # another — refuse a changed semantic fingerprint.
                # (Manifests from before this guard lack the key; those
                # resumes stay permitted.)
                recorded_fp = manifest.get("config_fp")
                if recorded_fp is not None:
                    fp = self._config_fp()
                    if recorded_fp != fp:
                        self.log.error("resume_refused_config_mismatch",
                                       recorded=recorded_fp, current=fp)
                        raise RuntimeError(
                            "refusing to resume: the committed epochs "
                            f"were produced under config {recorded_fp} "
                            f"but this run is configured as {fp} — a "
                            "changed filter/window/dedup/trigger setting "
                            "would make the output a mix of two "
                            "contracts. Resume with the original config "
                            "or start a fresh output dir.")
                # epoch-plan guard: a resumed run must group files into
                # epochs exactly as the original did — a changed
                # files_per_epoch (or a mutated input layout) would make
                # "epoch last+1" cover different files, silently
                # skipping or double-processing data. Manifests record
                # each epoch's input files; verify every committed data
                # epoch against the new plan.
                for e in committed:
                    m = manifest if e == last else self.sink.read_manifest(e)
                    recorded = m.get("input_files")
                    if m.get("drain") or recorded is None:
                        continue
                    planned = (self._plan_files[e]
                               if e < len(self._plan_files) else [])
                    if recorded != planned:
                        self.log.error("resume_refused_plan_mismatch",
                                       epoch=e, recorded=len(recorded),
                                       planned=len(planned))
                        raise RuntimeError(
                            f"refusing to resume: committed epoch {e} "
                            f"covered {recorded} but the current plan "
                            f"groups {planned} into that epoch — "
                            "files_per_epoch and the input layout must "
                            "match the original run")
                if manifest.get("drain"):
                    # The drain commit is final: it occupies epoch id
                    # len(old_plan) and advanced the watermark past
                    # every window. Resuming over a GROWN input would
                    # silently lose data (the first new epoch's id
                    # collides with the drain commit; later rows are
                    # all late vs the post-drain watermark) — refuse.
                    if len(plan) > last:
                        self.log.error("resume_refused_after_drain",
                                       drain_epoch=last,
                                       planned_epochs=len(plan))
                        raise RuntimeError(
                            f"refusing to resume: the last commit (epoch "
                            f"{last}) is a drain — this run is finished — "
                            f"but the input now plans {len(plan)} data "
                            "epochs. Write new data to a fresh output "
                            "dir (or start a new run with resume=False)."
                        )
                    return {
                        "epochs": committed,
                        "watermark_us": manifest.get("watermark_us", 0),
                        "metrics": self.metrics.to_dict(),
                    }
                self._restore(actors, watermark, last)
                start_epoch = last + 1
                # replay skipped epochs' slow-side arrivals so the
                # accumulated broadcast state matches the original run
                for e in range(start_epoch):
                    self._ingest_metadata(e)

        # Pipelined micro-batches: epoch e's finalize (K-way, on the
        # state actors) overlaps epoch e+1's exchange (N-way, on the
        # task pool), and (overlap_commit) so does e's ENTIRE commit
        # tail — finalize-merge, close, snapshot, 2PC manifest — which
        # runs on the driver thread while the exchange streams on a
        # worker thread. Safe because (a) actor task order is enforced
        # by completion (close/snapshot ray.gets return before
        # finalize(e+1) is submitted), so state mutations happen
        # strictly in finalize(e) -> close(e) -> snapshot(e) ->
        # finalize(e+1) order on every actor, and (b) epoch-(e+1)
        # accept_rows landing during e's tail only touch the per-epoch
        # buffers, never state — and snapshots exclude those buffers,
        # so a resume at e+1 replays epoch e+1 from its input, not from
        # half-buffered pushes.
        pending = None  # (epoch, counters, fin_refs, wm_us, wm_snapshot)
        replay_cfg = RetryConfig(
            max_retries=cfg.epoch_replay_budget,
            initial_delay_s=0.05, max_delay_s=5.0,
        )
        exchange_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="epoch_exchange")
        try:
            for epoch in range(start_epoch, len(plan)):
                # exchange-phase task failure: nothing durable or stateful
                # has happened for THIS epoch yet (state mutates only in
                # finalize) -> settle the previous epoch, fence + drop this
                # epoch's actor buffers and replay with exponential backoff
                # up to the budget (T11 analog; retry.rs semantics)
                attempt = [0]

                def _on_replay(_name, _n, err, delay,
                               epoch=epoch, attempt=attempt):
                    nonlocal pending
                    self.log.warn("epoch_replay", epoch=epoch,
                                  attempt=attempt[0] + 1, error=repr(err),
                                  backoff_s=delay)
                    if pending is not None:
                        self._complete_epoch(actors, *pending)
                        pending = None
                    self._flush_commit()
                    attempt[0] += 1
                    # the bumped attempt id makes StateShards discard any
                    # in-flight pushes still arriving from the failed try
                    ray.get([a.drop_epoch.remote(epoch, attempt[0])
                             for a in actors])

                def _attempt(epoch=epoch, attempt=attempt):
                    nonlocal pending
                    if not cfg.overlap_commit or pending is None:
                        return self._exchange_epoch(
                            epoch, plan[epoch], actors, watermark, attempt[0])
                    # overlap: the exchange streams on the worker thread
                    # while this (driver) thread settles epoch e-1's commit
                    # tail. A commit-tail failure must NOT route into the
                    # exchange replay path (complete is not idempotent), so
                    # it is wrapped fatal and re-raised unwrapped below.
                    fut = exchange_pool.submit(
                        self._exchange_epoch, epoch, plan[epoch], actors,
                        watermark, attempt[0])
                    settled, pending = pending, None
                    try:
                        self._complete_epoch(actors, *settled)
                    except BaseException as exc:
                        try:
                            fut.result(timeout=cfg.exchange_ack_timeout_s)
                        except BaseException:
                            pass  # the commit-tail failure wins
                        raise _CommitTailError(repr(exc)) from exc
                    return fut.result()

                try:
                    counters, max_ts = RetryStrategy(
                        replay_cfg, seed=epoch, on_retry=_on_replay,
                        # fenced driver / failed commit tail: die, don't replay
                        fatal=(LockLostError, _CommitTailError),
                    ).call(f"exchange_epoch_{epoch}", _attempt)
                except _CommitTailError as exc:
                    raise exc.__cause__  # surface the original commit error
                if cfg.per_partition_watermark:
                    # footer-stat maxes per key-shard stream, min-combined
                    # inside the tracker (a lagging partition holds the
                    # global watermark back — the Kafka/Flink rule)
                    from ..sources.pages import file_event_maxes
                    maxes = file_event_maxes(plan[epoch])
                    for pid, mx in maxes:
                        watermark.observe_partition(pid, mx)
                    # epoch-counted idleness: partitions absent from this
                    # epoch's plan age toward exclusion (no-op when the
                    # idle knob is 0 — counters stay, combine ignores them)
                    watermark.advance_epoch({pid for pid, _ in maxes})
                else:
                    watermark.observe(max_ts)
                # settle the previous epoch BEFORE submitting this epoch's
                # finalize: the committed snapshot of epoch e must not
                # contain epoch e+1's state mutations, or a resume at e+1
                # would double-apply them (dedup refreshes are not
                # replay-idempotent). finalize(e) itself already overlapped
                # exchange(e+1) above — that was the long pole.
                if pending is not None:
                    self._complete_epoch(actors, *pending)
                fin_refs = [
                    a.finalize_epoch.remote(epoch, self.sink.stage_path(epoch))
                    for a in actors
                ]
                pending = (epoch, counters, fin_refs, watermark.watermark_us,
                           watermark.snapshot())

            if pending is not None:
                self._complete_epoch(actors, *pending)
            self._flush_commit()
        finally:
            exchange_pool.shutdown(wait=False, cancel_futures=True)

        if _dbg:
            print(f"[run] epochs_done={_time.time() - _phase_t0:.2f}s",
                  flush=True)
        if drain:
            self._drain_epoch(len(plan), actors, watermark)
            if _dbg:
                print(f"[run] drained={_time.time() - _phase_t0:.2f}s",
                      flush=True)
            if cfg.compact_after_drain:
                # post-drain maintenance: merge the many per-epoch/
                # per-shard files into bounded-size files (own 2PC
                # manifest; readers prefer compacted generations). Only
                # after a drain — the run is finished, so the per-epoch
                # resume layout is no longer needed.
                from ..sinks.compaction import compact_all

                compacted = compact_all(self.sink,
                                        cfg.compact_target_bytes)
                self.log.info("compacted_outputs", outputs=sorted(
                    n for n, m in compacted.items() if m is not None))

        summary = {
            "epochs": self.sink.committed_epochs(),
            "watermark_us": watermark.watermark_us,
            "metrics": self.metrics.to_dict(),
        }
        return summary

    def _exchange_epoch(self, epoch, files, actors, watermark, attempt=0):
        """Stream one epoch through read -> fused map -> keyed exchange;
        returns (lineage counters, max event ts). No state mutation."""
        import ray.data as rd

        cfg = self.cfg
        self.sink.stage_dir(epoch)  # fresh staging dir (clears any
        # half-written previous attempt before finalize writes into it)
        wm_before = watermark.watermark_us

        # prune at the read: the stored `text` column is the generator's
        # oracle — the engine recomputes extraction from `html`
        ds = rd.read_parquet(
            files, columns=["url", "warc_ts", "html", "lang"],
            override_num_blocks=cfg.read_num_blocks,
        )
        # plain tasks, not an actor pool: the fused stage's only state
        # (filter spec + frozen watermark + broadcast ref + actor
        # handles) is a tiny picklable object, and a micro-batch driver
        # builds a fresh Dataset per epoch — per-epoch actor-pool
        # spin-up would dominate at exactly the epoch sizes where
        # latency matters. Truly stateful stages (StateShard) stay on
        # actors; the broadcast side ships via ray.put once and is
        # cached per worker process.
        self._ingest_metadata(epoch)
        meta_ref = self._meta_ref

        import time as _time
        if os.environ.get("GRAFT_DEBUG_TIMING"):
            print(f"[epoch {epoch}] exchange_start t={_time.time():.3f}",
                  flush=True)
        _t0 = _time.time()
        stats_ds = ds.map_batches(
            EpochMapper(
                self.page_filter, wm_before, meta_ref,
                {"category": "unknown", "weight": 0.0},
                actors, epoch, cfg.state_shards, attempt,
                cfg.quarantine_late,
                cfg.update_horizon_s * US if cfg.update_mode else 0,
            ),
            batch_format="pyarrow",
            batch_size=cfg.read_batch_size,
            # a retried exchange task would double-push its rows: fail the
            # epoch instead; the driver replays it from scratch (run())
            max_retries=0,
            retry_exceptions=False,
        )
        stats = stats_ds.to_pandas()
        _t1 = _time.time()
        if os.environ.get("GRAFT_DEBUG_TIMING") == "2":
            print(stats_ds.stats(), flush=True)
        if cfg.collect_dataset_stats:
            self._ds_stats[epoch] = stats_ds.stats()

        counters = {
            c: int(stats[c].sum())
            for c in ("rows_read", "parse_errors", "rows_filtered_out",
                      "late_dropped")
        }
        if "late_accepted" in stats.columns:
            counters["late_accepted"] = int(stats["late_accepted"].sum())
        # exchange barrier: pushes are async inside the map tasks (the
        # last batch of each task is never awaited there), so finalize
        # may only proceed once every pushed row is provably buffered.
        # Counts are per-attempt (drop_epoch resets them), preserving
        # the replay fence; a mismatch past the deadline fails the
        # epoch into the normal replay path.
        if len(stats):
            expected = np.sum(np.vstack(stats["pushed_per_shard"]), axis=0)
            deadline = _time.monotonic() + cfg.exchange_ack_timeout_s
            # stall grace: an unobserved lost push (e.g. the owning map
            # worker exited before the shard fetched the args of a
            # fire-and-forget final push) never converges — detect it
            # by NO PROGRESS for a short grace window and fail into the
            # replay path immediately instead of burning the full
            # timeout
            grace = min(cfg.exchange_stall_grace_s,
                        cfg.exchange_ack_timeout_s)
            last = None
            last_progress = _time.monotonic()
            while True:
                got = np.asarray(ray.get(
                    [a.received_rows.remote(epoch) for a in actors]))
                if (got == expected).all():
                    break
                if (got > expected).any():
                    raise RuntimeError(
                        f"epoch {epoch}: shard received more rows than "
                        f"pushed ({got.tolist()} > {expected.tolist()}) — "
                        "double-push; replaying")
                now = _time.monotonic()
                if last is None or (got != last).any():
                    last, last_progress = got, now
                elif now - last_progress > grace:
                    raise RuntimeError(
                        f"epoch {epoch}: exchange pushes stalled for "
                        f"{grace}s short of the pushed counts "
                        f"({got.tolist()} != {expected.tolist()}) — "
                        "lost push; replaying")
                if now > deadline:
                    raise RuntimeError(
                        f"epoch {epoch}: exchange pushes not settled "
                        f"after {cfg.exchange_ack_timeout_s}s "
                        f"({got.tolist()} != {expected.tolist()})")
                _time.sleep(0.01)
        if os.environ.get("GRAFT_DEBUG_TIMING"):
            print(f"[epoch {epoch}] exchange_end t={_time.time():.3f}",
                  flush=True)
        max_ts = int(stats["max_ts_us"].max()) if len(stats) else NEG_INF_TS
        self.metrics.observe("epoch_exchange_seconds", _t1 - _t0)
        self._trace_marks.setdefault(epoch, {})["exchange"] = (_t0, _t1)
        self._trace_marks[epoch]["attempt"] = attempt
        self.log.debug("epoch_exchange", epoch=epoch, attempt=attempt,
                       duration_ms=(_t1 - _t0) * 1e3, **counters)
        if os.environ.get("GRAFT_DEBUG_TIMING"):
            print(f"[epoch {epoch}] exchange={_t1-_t0:.2f}s", flush=True)
        return counters, max_ts

    def _complete_epoch(self, actors, epoch, counters, fin_refs,
                        wm_us, wm_snapshot) -> None:
        """Settle one finalized epoch: merge finalize stats, route
        window/session partials to their owning shards (driver-mediated
        — actors never block on each other), close at the epoch's own
        frozen watermark, and 2PC-commit."""
        import time as _time
        # settle the PREVIOUS epoch's deferred commit first (its
        # snapshot writes ran under the exchange that just finished)
        self._flush_commit()
        _t1 = _time.time()
        results = ray.get(fin_refs)
        win_calls: dict[int, list] = {}
        sess_calls: dict[int, list] = {}
        fun_calls: dict[int, list] = {}
        host_calls: dict[int, list] = {}
        dist_calls: dict[int, list] = {}
        iv_calls: dict[int, list] = {}
        for r in results:
            for c in ("rows_deduped", "rows_written"):
                counters[c] = counters.get(c, 0) + r["stats"][c]
            for owner, batches in r["windows"].items():
                win_calls.setdefault(owner, []).extend(batches)
            for owner, payload in r["sessions"].items():
                sess_calls.setdefault(owner, []).append(payload)
            for owner, payload in r.get("funnels", {}).items():
                fun_calls.setdefault(owner, []).append(payload)
            for owner, payload in r.get("hostcounts", {}).items():
                host_calls.setdefault(owner, []).append(payload)
            for owner, payload in r.get("distincts", {}).items():
                dist_calls.setdefault(owner, []).append(payload)
            for owner, payload in r.get("intervals", {}).items():
                iv_calls.setdefault(owner, []).append(payload)
        ray.get(
            [actors[o].add_window_partials.remote(b)
             for o, b in win_calls.items()]
            + [actors[o].add_session_runs.remote(b)
               for o, b in sess_calls.items()]
            + [actors[o].add_funnel_events.remote(b)
               for o, b in fun_calls.items()]
            + [actors[o].add_host_counts.remote(b)
               for o, b in host_calls.items()]
            + [actors[o].add_distinct_partials.remote(b)
               for o, b in dist_calls.items()]
            + [actors[o].add_interval_rows.remote(b)
               for o, b in iv_calls.items()]
        )

        _t2 = _time.time()
        self._trace_marks.setdefault(epoch, {})["finalize"] = (_t1, _t2)
        self._close_and_commit(epoch, actors, wm_us, counters, wm_snapshot)
        # stage-latency histograms (metrics.rs:226-248 analog): exported
        # as p50-p99 summaries in Prometheus text and the run summary
        self.metrics.observe("epoch_finalize_seconds", _t2 - _t1)
        self.metrics.observe("epoch_commit_seconds", _time.time() - _t2)
        self.log.info("epoch_committed", epoch=epoch,
                      rows_written=counters.get("rows_written", 0),
                      finalize_ms=(_t2 - _t1) * 1e3,
                      commit_ms=(_time.time() - _t2) * 1e3)
        if os.environ.get("GRAFT_DEBUG_TIMING"):
            print(f"[epoch {epoch}] finalize={_t2-_t1:.2f}s "
                  f"commit={_time.time()-_t2:.2f}s", flush=True)

    def _drain_epoch(self, epoch, actors, watermark) -> None:
        """Final epoch with no input: advance the watermark past every
        open window and flush remaining state (finite-run semantics)."""
        if self.sink.is_committed(epoch):
            return
        self.sink.stage_dir(epoch)
        cfg = self.cfg
        margin_us = (
            cfg.allowed_lateness_s
            + cfg.windows.tumbling_size_s
            + cfg.windows.sliding_size_s
            + cfg.windows.session_gap_s
            # funnel chains time out at start + within: without this
            # term a chain started near stream end stays open past the
            # drain (its timeout row would never emit)
            + (cfg.funnel.within_s if cfg.funnel.enabled else 0)
            + 1
        ) * US
        watermark.observe(watermark.drain_base_us + cfg.allowed_lateness_s * US
                          + margin_us)
        self._close_and_commit(epoch, actors, watermark.watermark_us, {},
                               watermark.snapshot(), drain=True)

    def _close_and_commit(self, epoch, actors, wm_us, counters,
                          wm_snapshot=None, drain=False) -> None:
        import time as _time
        _tc0 = _time.time()
        self._trace_marks.setdefault(epoch, {})["commit_start"] = _tc0
        stage = self.sink.stage_path(epoch)
        closed = ray.get([a.close.remote(wm_us, stage) for a in actors])
        _tc1 = _time.time()
        window_rows: list = []
        update_rows: list = []
        early_rows: list = []
        session_rows: list = []
        session_update_rows: list = []
        session_early_rows: list = []
        funnel_rows: list = []
        funnel_timeout_rows: list = []
        vetoes_total = 0
        topk_cands: list = []
        distinct_rows: list = []
        interval_count = 0
        size_tot: dict[str, int] = {}
        size_max: dict[str, int] = {}
        for c in closed:
            for k, v in c["sizes"].items():
                size_tot[k] = size_tot.get(k, 0) + v
                size_max[k] = max(size_max.get(k, 0), v)
            window_rows.extend(c["windows"])
            update_rows.extend(c["window_updates"])
            early_rows.extend(c["window_early"])
            session_rows.extend(c["sessions"])
            session_update_rows.extend(c["session_updates"])
            session_early_rows.extend(c["session_early"])
            funnel_rows.extend(c["funnels"])
            funnel_timeout_rows.extend(c["funnel_timeouts"])
            vetoes_total += c["vetoes"]
            topk_cands.extend(c["topk"])
            distinct_rows.extend(c["distinct"])
            interval_count += c["interval_count"]
        window_rows.sort()
        update_rows.sort()
        early_rows.sort()
        session_rows.sort()
        session_update_rows.sort()
        session_early_rows.sort()
        funnel_rows.sort()
        funnel_timeout_rows.sort()

        tables = {}
        for kind_prefix, name in (("tumbling:lang", "tumbling_lang"),
                                  ("sliding:lang", "sliding_lang")):
            rows = [r for r in window_rows if r[0] == kind_prefix]
            tables[name] = pa.table(
                {
                    "key": pa.array([r[1] for r in rows], type=pa.string()),
                    "window_start": pa.array(
                        np.array([r[2] for r in rows], dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "window_end": pa.array(
                        np.array([r[3] for r in rows], dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "doc_count": pa.array([r[4] for r in rows], type=pa.int64()),
                    "total_chars": pa.array([r[5] for r in rows], type=pa.float64()),
                }
            )
        if self.cfg.update_mode:
            # allowed-lateness corrections: re-emissions of windows that
            # received accepted-late rows after their revision-0 emission.
            # Consumers reduce by max(revision) per (kind, key, start);
            # always committed (possibly empty) so the output schema is
            # stable across epochs.
            tables["window_updates"] = pa.table(
                {
                    "kind": pa.array([r[0] for r in update_rows],
                                     type=pa.string()),
                    "key": pa.array([r[1] for r in update_rows],
                                    type=pa.string()),
                    "window_start": pa.array(
                        np.array([r[2] for r in update_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "window_end": pa.array(
                        np.array([r[3] for r in update_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "doc_count": pa.array([r[4] for r in update_rows],
                                          type=pa.int64()),
                    "total_chars": pa.array(
                        [r[5] for r in update_rows], type=pa.float64()),
                    "revision": pa.array([r[6] for r in update_rows],
                                         type=pa.int64()),
                }
            )
            # session retract/add changelog: an accepted-late row that
            # reopens an already-emitted session (possibly MERGING two
            # emissions one late event bridged) retracts the exact prior
            # rows and adds the corrected session. Changelog, not
            # in-place revision, because merges change the row identity
            # (start/end), which a revision column cannot express.
            tables["session_updates"] = pa.table(
                {
                    "host": pa.array([r[0] for r in session_update_rows],
                                     type=pa.string()),
                    "session_start": pa.array(
                        np.array([r[1] for r in session_update_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "session_end": pa.array(
                        np.array([r[2] for r in session_update_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "doc_count": pa.array(
                        [r[3] for r in session_update_rows],
                        type=pa.int64()),
                    "total_chars": pa.array(
                        [float(r[4]) for r in session_update_rows],
                        type=pa.float64()),
                    "action": pa.array([r[5] for r in session_update_rows],
                                       type=pa.string()),
                    "revision": pa.array(
                        [r[6] for r in session_update_rows],
                        type=pa.int64()),
                }
            )
        if self.cfg.early_fire:
            # speculative previews of still-open windows, tagged with the
            # emitting epoch; monotone per key and superseded by the final
            # emission (and any update-mode correction)
            tables["window_early"] = pa.table(
                {
                    "epoch": pa.array([epoch] * len(early_rows),
                                      type=pa.int64()),
                    "kind": pa.array([r[0] for r in early_rows],
                                     type=pa.string()),
                    "key": pa.array([r[1] for r in early_rows],
                                    type=pa.string()),
                    "window_start": pa.array(
                        np.array([r[2] for r in early_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "window_end": pa.array(
                        np.array([r[3] for r in early_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "doc_count": pa.array([r[4] for r in early_rows],
                                          type=pa.int64()),
                    "total_chars": pa.array(
                        [r[5] for r in early_rows], type=pa.float64()),
                }
            )
            # session previews complete the trigger triple for sessions
            # (early / on-time / late changelog). The provisional end is
            # last + gap; supersession is by CONTAINMENT (a bridging
            # event can move start earlier), not key equality.
            tables["session_early"] = pa.table(
                {
                    "epoch": pa.array([epoch] * len(session_early_rows),
                                      type=pa.int64()),
                    "host": pa.array([r[0] for r in session_early_rows],
                                     type=pa.string()),
                    "session_start": pa.array(
                        np.array([r[1] for r in session_early_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "session_end": pa.array(
                        np.array([r[2] for r in session_early_rows],
                                 dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "doc_count": pa.array(
                        [r[3] for r in session_early_rows],
                        type=pa.int64()),
                    "total_chars": pa.array(
                        [float(r[4]) for r in session_early_rows],
                        type=pa.float64()),
                }
            )
        if self.cfg.sketch_distinct:
            # per-(lang, window) distinct hosts: exact companion next to
            # the HLL estimate (the 100-TB path), plus the accuracy
            # delta as a lineage metric. Both families closed at the
            # same watermark from the same survivors, so keys align.
            dmap = {(k, s): (ex, ap)
                    for k, s, _end, ex, ap in distinct_rows}
            tl = tables["tumbling_lang"]
            pairs = [
                dmap.get((k, s), (None, None))
                for k, s in zip(
                    tl.column("key").to_pylist(),
                    tl.column("window_start").cast(pa.int64()).to_pylist())
            ]
            tables["tumbling_lang"] = tl.append_column(
                "distinct_hosts",
                pa.array([p[0] for p in pairs], type=pa.int64()),
            ).append_column(
                "approx_hosts",
                pa.array([p[1] for p in pairs], type=pa.int64()),
            )
            errs = [abs(ap - ex) / ex
                    for ex, ap in pairs if ex]
            if errs:
                self.metrics.observe("sketch_distinct_rel_err",
                                     float(np.mean(errs)))

        tables["session_host"] = pa.table(
            {
                "host": pa.array([r[0] for r in session_rows], type=pa.string()),
                "session_start": pa.array(
                    np.array([r[1] for r in session_rows], dtype=np.int64)
                ).cast(pa.timestamp("us")),
                "session_end": pa.array(
                    np.array([r[2] for r in session_rows], dtype=np.int64)
                ).cast(pa.timestamp("us")),
                "doc_count": pa.array([r[3] for r in session_rows], type=pa.int64()),
                "total_chars": pa.array([r[4] for r in session_rows], type=pa.float64()),
            }
        )

        if self.cfg.funnel.enabled:
            tables["funnel_host"] = pa.table(
                {
                    "host": pa.array([r[0] for r in funnel_rows],
                                     type=pa.string()),
                    "start_ts": pa.array(
                        np.array([r[1] for r in funnel_rows], dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                    "end_ts": pa.array(
                        np.array([r[2] for r in funnel_rows], dtype=np.int64)
                    ).cast(pa.timestamp("us")),
                }
            )
            if self.cfg.funnel.emit_timeouts:
                # abandoned funnels: chains that started but could no
                # longer complete within the bound when the watermark
                # passed start + within (Flink timed-out partial matches)
                tables["funnel_timeouts"] = pa.table(
                    {
                        "host": pa.array(
                            [r[0] for r in funnel_timeout_rows],
                            type=pa.string()),
                        "start_ts": pa.array(
                            np.array([r[1] for r in funnel_timeout_rows],
                                     dtype=np.int64)
                        ).cast(pa.timestamp("us")),
                        "timeout_ts": pa.array(
                            np.array([r[2] for r in funnel_timeout_rows],
                                     dtype=np.int64)
                        ).cast(pa.timestamp("us")),
                        "reached_stage": pa.array(
                            [r[3] for r in funnel_timeout_rows],
                            type=pa.int64()),
                    }
                )

        if self.cfg.topk_hosts > 0:
            # exact global top-k: keys are owner-partitioned, so the
            # k-merge of per-shard candidates is the true leaderboard
            top = TopKState.merge_top(topk_cands, self.cfg.topk_hosts)
            tables["topk_host"] = pa.table(
                {
                    "epoch": pa.array([epoch] * len(top), type=pa.int64()),
                    "rank": pa.array(range(1, len(top) + 1),
                                     type=pa.int64()),
                    "host": pa.array([h for h, _ in top], type=pa.string()),
                    "doc_count": pa.array([c for _, c in top],
                                          type=pa.int64()),
                }
            )

        # state-size gauges: total across shards plus the hottest shard
        # (total/max divergence = key skew made visible)
        for k, v in size_tot.items():
            self.metrics.set_gauge(f"state_{k}", float(v))
            self.metrics.set_gauge(f"state_{k}_max_shard",
                                   float(size_max[k]))

        counters = dict(counters)
        counters["windows_emitted"] = sum(
            t.num_rows for n, t in tables.items()
            if n not in ("funnel_host", "topk_host", "window_updates",
                         "window_early", "session_updates",
                         "session_early", "funnel_timeouts")
        )
        if "window_updates" in tables:
            counters["windows_updated"] = tables["window_updates"].num_rows
        if "session_updates" in tables:
            counters["sessions_updated"] = \
                tables["session_updates"].num_rows
        if "funnel_host" in tables:
            counters["funnels_matched"] = tables["funnel_host"].num_rows
        if "funnel_timeouts" in tables:
            counters["funnels_timed_out"] = \
                tables["funnel_timeouts"].num_rows
        if self.cfg.interval_join_s > 0:
            counters["interval_pairs_emitted"] = interval_count
        if self.cfg.funnel.enabled and self.cfg.funnel.veto_min_len \
                is not None:
            counters["funnels_vetoed"] = vetoes_total  # per-epoch delta

        stage = self.sink.stage_path(epoch)
        _tc2 = _time.time()
        # submit the K snapshot writes but do NOT wait: the 1-2 s of
        # parallel state pickling overlaps the next epoch's exchange.
        # Per-actor FIFO ordering (finalize(e) -> close(e) ->
        # write_snapshot(e) -> finalize(e+1), all submitted by this
        # driver in that order) still guarantees the snapshot captures
        # exactly epoch e's state.
        snap_refs = [
            a.write_snapshot.remote(
                os.path.join(stage, f"state-{i:04d}.pkl")
            )
            for i, a in enumerate(actors)
        ]
        blob = pickle.dumps(
            {"watermark": wm_snapshot, "state_shards": len(actors)},
            protocol=4,
        )
        self.metrics.merge_counts(counters)
        if os.environ.get("GRAFT_DEBUG_TIMING") == "2":
            print(f"[epoch {epoch}] close={_tc1-_tc0:.2f}s "
                  f"tables={_tc2-_tc1:.2f}s "
                  f"snapshot_submit={_time.time()-_tc2:.2f}s", flush=True)
        self._pending_commit = (epoch, tables, snap_refs, wm_us,
                                counters, blob, drain)
        if drain:
            # the drain commit is the run's final word — make it durable
            # before returning
            self._flush_commit()

    def _flush_commit(self) -> None:
        """Settle the deferred commit: wait for the snapshot writes
        (usually already resolved — they ran under the next epoch's
        exchange) and write the manifest. Widens the replay-on-crash
        window by one epoch; replay is deterministic, so output bytes
        are unchanged."""
        if self._pending_commit is None:
            return
        (epoch, tables, snap_refs, wm_us, counters, blob,
         drain) = self._pending_commit
        self._pending_commit = None
        import time as _time
        _tf0 = _time.time()
        ray.get(snap_refs)
        _tf1 = _time.time()
        # commit is idempotent (manifest-exists short-circuit), so the
        # retry is safe; the breaker fails fast once the sink
        # filesystem is persistently down
        self.sink_breaker.guard(
            lambda: self._sink_retry.call(
                f"commit_epoch_{epoch}",
                lambda: self.sink.commit_epoch(
                    epoch,
                    tables=tables,
                    watermark_us=wm_us,
                    counters=counters,
                    blobs={"state.pkl": blob},
                    extra={"drain": drain,
                           "config_fp": self._config_fp(),
                           "input_files": (
                               self._plan_files[epoch]
                               if epoch < len(self._plan_files) else [])},
                ),
            )
        )
        if os.environ.get("GRAFT_DEBUG_TIMING") == "2":
            print(f"[epoch {epoch}] snapshot_wait={_tf1-_tf0:.2f}s "
                  f"sink_commit={_time.time()-_tf1:.2f}s", flush=True)
        if self.cfg.state_snapshot_retention:
            # checkpoint retention: older epochs' per-shard snapshots
            # are pure storage cost once a newer commit exists (resume
            # restores from the LAST committed epoch only). The cursor
            # keeps each scan O(newly prunable), not O(all epochs).
            removed, self._prune_cursor = self.sink.prune_state_snapshots(
                self.cfg.state_snapshot_retention,
                start_epoch=self._prune_cursor)
            if removed:
                self.metrics.merge_counts(
                    {"state_snapshots_pruned": removed})
        # telemetry snapshot after the commit (never part of the 2PC
        # byte-identity contract — it carries wall-clock values)
        import json as _json

        self._wm_check.observe(wm_us)
        self._lag_check.observe(self._plan_len, epoch + 1)
        obs = {
            "health.json": _json.dumps(self.health.check_health(),
                                       indent=1, sort_keys=True).encode(),
            "metrics.prom": self.metrics.export_prometheus().encode(),
        }
        ds_stats = self._ds_stats.pop(epoch, None)
        if ds_stats is not None:
            obs["dataset_stats.txt"] = ds_stats.encode()
        # per-epoch trace (tracing.rs analog): the commit span closes
        # HERE — the manifest write above is the last act of the epoch.
        # Resume-stable ids (derived from config_fp + epoch), serialized
        # beside the manifest and kept in memory for the /trace route.
        from ..observability.tracing import epoch_trace_spans

        marks = self._trace_marks.pop(epoch, {})
        marks["commit"] = (marks.pop("commit_start", _tf0), _time.time())
        spans = epoch_trace_spans(
            self.tracer, self._config_fp(), epoch,
            {k: marks.get(k)
             for k in ("exchange", "finalize", "commit")},
            tags={"drain": str(bool(drain)).lower(),
                  "attempts": str(marks.get("attempt", 0) + 1),
                  "watermark_us": str(wm_us)})
        if spans:
            self._traces.extend(spans)
            obs["trace.jsonl"] = ("\n".join(
                _json.dumps(s, sort_keys=True) for s in spans)
                + "\n").encode()
        self.sink.write_observability(epoch, obs)

    def _restore_rescaled(self, actors, epoch_dir: str,
                          old_shards: int) -> None:
        """Repartition a K-shard checkpoint across ``len(actors)``
        shards: K parallel split tasks (one per old snapshot file),
        then each new actor merges its K fragments. Scratch fragment
        files live under the locked output dir and are removed once
        every actor has restored."""
        import shutil

        new_shards = len(actors)
        scratch = os.path.join(self.sink.out_dir, "_rescale_tmp")
        shutil.rmtree(scratch, ignore_errors=True)
        os.makedirs(scratch, exist_ok=True)
        try:
            parts = ray.get([
                _split_state_file.remote(
                    os.path.join(epoch_dir, f"state-{i:04d}.pkl"),
                    new_shards, scratch, i)
                for i in range(old_shards)
            ])
            ray.get([
                actors[j].restore_fragments.remote([p[j] for p in parts])
                for j in range(new_shards)
            ])
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        self.log.info("state_rescaled", old_shards=old_shards,
                      new_shards=new_shards)
        self.metrics.merge_counts({"state_rescales": 1})

    def _restore(self, actors, watermark, last_epoch) -> None:
        epoch_dir = self.sink.epoch_dir(last_epoch)
        with open(os.path.join(epoch_dir, "state.pkl"), "rb") as f:
            snap = pickle.load(f)
        if not os.path.exists(os.path.join(epoch_dir, "state-0000.pkl")):
            # normal operation never hits this (retention always keeps
            # the last committed epoch); it means newer manifests were
            # deleted by hand past the retention depth
            raise RuntimeError(
                f"cannot resume from epoch {last_epoch}: its per-shard "
                "state snapshots were pruned (state_snapshot_retention) "
                "— resume from a retained epoch or restart the run")
        if snap["state_shards"] != len(actors):
            # cluster resize (the N -> 4N path): repartition the
            # checkpointed keyed state across the new shard count.
            # Hash ownership is layout-independent, so the rescaled run
            # emits bit-identical window/session/funnel/top-k rows and
            # the identical union of page rows — only the per-shard
            # page-file layout changes. See state/rescale.py.
            self._restore_rescaled(actors, epoch_dir,
                                   snap["state_shards"])
        else:
            ray.get([
                a.restore_from_file.remote(
                    os.path.join(epoch_dir, f"state-{i:04d}.pkl")
                )
                for i, a in enumerate(actors)
            ])
        if snap["watermark"].get("partitioned"):
            restored = PartitionedWatermarkTracker.restore(
                snap["watermark"], idle_epochs=self.cfg.watermark_idle_epochs)
            watermark.allowed_lateness_us = restored.allowed_lateness_us
            watermark.max_per_partition = restored.max_per_partition
            watermark.epochs_idle = restored.epochs_idle
            watermark.floor_us = restored.floor_us
        else:
            restored = WatermarkTracker.restore(snap["watermark"])
            watermark.allowed_lateness_us = restored.allowed_lateness_us
            watermark.max_event_ts_us = restored.max_event_ts_us
