"""The micro-batch streaming driver (§3 lifecycle, re-expressed on Ray Data).

One ``StreamingPagesPipeline.run()`` is the analog of the reference's
``run_service`` loop (``src/main.rs:357-398``): it consumes the
partitioned pages log slice by slice (micro-batch epochs = the Kafka
poll loop), pushes each epoch through a streaming Dataset pipeline, and
owns watermarks, state checkpoints and the exactly-once sink commit.

Per-epoch dataflow (ONE hash shuffle per epoch):

    read_parquet(slice files, pruned columns)
      -> map_batches(ExtractEnrich, actor pool, Arrow)   # M1-M4: decompress+extract+host
      -> broadcast as-of join (host metadata)            # §2.5 enrichment
      -> map_batches(add stable url-shard column)
      -> groupby(shard).map_groups(ShardFinalize)        # T1/T2 dedup via state
                                                         # actors, window/session
                                                         # partial push, sorted
                                                         # per-shard page output
      -> tiny per-shard stats table back to the driver

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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import EngineConfig
from ..functions.compression import decompress_safe
from ..functions.extract import html_to_text
from ..functions.filters import PageFilter
from ..observability.metrics import MetricsRegistry
from ..sinks.exactly_once import EpochSink
from ..sources.pages import pages_files
from ..state.store import DedupState, SessionState, WindowState
from ..state.watermark import WatermarkTracker
from ..stages.hashing import shard_of
from ..stages.timeops import NEG_INF_TS, US, series_ts_us

# _status codes carried through the shuffle so drop reasons are counted
# at one collection point (F7/F8 lineage: quarantined, never crashing)
OK, PARSE_ERROR, FILTERED, LATE = 0, 1, 2, 3


@ray.remote(num_cpus=0)
class StateShard:
    """One hash shard of all cross-epoch keyed state (T1/T2/T7 analogs)."""

    def __init__(self, shard_id: int, dedup_window_us: int, session_gap_us: int):
        self.shard_id = shard_id
        self.dedup = DedupState(dedup_window_us)
        self.windows = WindowState()
        self.sessions = SessionState(session_gap_us)

    def dedup_batch(self, keys: list[str], ts_us: np.ndarray) -> np.ndarray:
        return self.dedup.process(keys, ts_us)

    def add_window_partials(self, kind, keys, starts, ends, counts, totals) -> None:
        self.windows.add_partials(kind, keys, starts, ends, counts, totals)

    def add_session_runs(self, keys, starts, lasts, counts, totals) -> None:
        self.sessions.add_runs(keys, starts, lasts, counts, totals)

    def close(self, watermark_us: int) -> tuple[list, list, int]:
        closed_windows = self.windows.close(watermark_us)
        closed_sessions = self.sessions.close(watermark_us)
        evicted = self.dedup.evict(watermark_us)
        return closed_windows, closed_sessions, evicted

    def snapshot(self) -> dict:
        return {
            "dedup": self.dedup.snapshot(),
            "windows": self.windows.snapshot(),
            "sessions": self.sessions.snapshot(),
        }

    def restore(self, snap: dict) -> bool:
        self.dedup = DedupState.restore(snap["dedup"])
        self.windows = WindowState.restore(snap["windows"])
        self.sessions = SessionState.restore(snap["sessions"])
        return True


class ExtractEnrich:
    """Actor-pool stage: decompress + extract + host + status (M1-M4, F1).

    Construction happens once per actor (``__init__``); per batch it is
    pure Arrow work plus the per-row decompress/extract scalar calls.
    The page filter and the epoch's frozen watermark are plain
    constructor args, so each epoch's pool is immutable state.
    """

    def __init__(self, page_filter: PageFilter | None, watermark_us: int):
        self.filter = page_filter
        self.watermark_us = watermark_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        n = len(urls)
        texts: list[str] = [""] * n
        hosts: list[str] = [""] * n
        status = np.zeros(n, dtype=np.int8)
        for i in range(n):
            raw = htmls[i]
            text = html_to_text(decompress_safe(raw) if raw else raw)
            if not text:
                status[i] = PARSE_ERROR
            texts[i] = text
            _, sep, rest = urls[i].partition("://")
            hosts[i] = rest.split("/", 1)[0] if sep else ""

        ts_us = series_ts_us(pd.Series(batch["warc_ts"].to_pandas())).to_numpy()
        late = ts_us < self.watermark_us
        status = np.where((status == OK) & late, LATE, status)

        out = batch.drop_columns(["html"])
        out = out.append_column("host", pa.array(hosts, type=pa.string()))
        out = out.append_column("text", pa.array(texts, type=pa.string()))
        out = out.append_column(
            "text_len",
            pa.array([len(t) for t in texts], type=pa.int64()),
        )
        if self.filter is not None:
            keep = self.filter.mask(out)
            keep_np = np.asarray(keep.to_pandas(), dtype=bool)
            status = np.where((status == OK) & ~keep_np, FILTERED, status)
        return out.append_column("_status", pa.array(status))


class ShardFinalize:
    """Per-shard epoch finalizer: dedup via state actor, window/session
    partial push, sorted per-shard page output, stats row back.

    Runs as ``groupby(shard).map_groups`` — all rows of a url shard for
    this epoch arrive in one call, giving the per-key sequential
    semantics the dedup contract needs.
    """

    def __init__(
        self,
        actors: list,
        epoch: int,
        stage_dir: str,
        config: EngineConfig,
        state_shards: int,
    ):
        self.actors = actors
        self.epoch = epoch
        self.stage_dir = stage_dir
        self.cfg = config
        self.state_shards = state_shards

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        cfg = self.cfg
        shard = int(g["_shard"].iloc[0])
        stats = {
            "shard": shard,
            "rows_read": len(g),
            "parse_errors": int((g["_status"] == PARSE_ERROR).sum()),
            "rows_filtered_out": int((g["_status"] == FILTERED).sum()),
            "late_dropped": int((g["_status"] == LATE).sum()),
            "rows_deduped": 0,
            "rows_written": 0,
            "max_ts_us": NEG_INF_TS,
        }
        ok = g[g["_status"] == OK].copy()
        if len(ok):
            ok["_ts_us"] = series_ts_us(ok["warc_ts"])
            stats["max_ts_us"] = int(ok["_ts_us"].max())
            ok = ok.sort_values(["url", "_ts_us"], kind="mergesort")
            actor = self.actors[shard % self.state_shards]
            keep = ray.get(
                actor.dedup_batch.remote(
                    ok["url"].tolist(), ok["_ts_us"].to_numpy()
                )
            )
            stats["rows_deduped"] = int((~keep).sum())
            ok = ok.loc[keep]

        if len(ok):
            self._push_partials(ok)
            out = ok.drop(columns=["_shard", "_status", "_ts_us"])
            path = os.path.join(self.stage_dir, f"pages-{shard:04d}.parquet")
            table = pa.Table.from_pandas(out, preserve_index=False)
            pq.write_table(table, path)
            with open(path, "rb+") as f:
                os.fsync(f.fileno())
            stats["rows_written"] = len(out)

        return pd.DataFrame([stats])

    # -- helpers ---------------------------------------------------------
    def _push_partials(self, ok: pd.DataFrame) -> None:
        """Pre-aggregate this shard's survivors and push them to the
        owning state shards (synchronously: state must be in place
        before the driver closes the epoch)."""
        cfg = self.cfg
        calls = []
        ts = ok["_ts_us"].to_numpy()
        lens = ok["text_len"].to_numpy(dtype=np.float64)

        tum = cfg.windows.tumbling_size_s * US
        calls += self._window_calls("tumbling:lang", ok["lang"].fillna(""), ts,
                                    lens, tum, tum)
        sld_size = cfg.windows.sliding_size_s * US
        sld_slide = cfg.windows.sliding_slide_s * US
        calls += self._window_calls("sliding:lang", ok["lang"].fillna(""), ts,
                                    lens, sld_size, sld_slide)
        calls += self._session_calls(ok["host"], ts, lens)
        if calls:
            ray.get(calls)

    def _window_calls(self, kind, keys, ts, totals, size_us, slide_us):
        slide_start = (ts // slide_us) * slide_us
        df = pd.DataFrame({"k": keys.to_numpy(), "s": slide_start, "v": totals})
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
        part["shard"] = shard_of(part["k"].to_numpy(), self.state_shards)
        calls = []
        for sh, sub in part.groupby("shard"):
            calls.append(
                self.actors[int(sh)].add_window_partials.remote(
                    kind,
                    sub["k"].tolist(),
                    sub["s"].to_numpy(),
                    sub["s"].to_numpy() + size_us,
                    sub["c"].to_numpy(),
                    sub["t"].to_numpy(),
                )
            )
        return calls

    def _session_calls(self, hosts, ts, totals):
        gap_us = self.cfg.windows.session_gap_s * US
        df = pd.DataFrame({"k": hosts.to_numpy(), "ts": ts, "v": totals})
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
        runs["shard"] = shard_of(runs["k"].to_numpy(), self.state_shards)
        calls = []
        for sh, sub in runs.groupby("shard"):
            calls.append(
                self.actors[int(sh)].add_session_runs.remote(
                    sub["k"].tolist(), sub["s"].to_numpy(), sub["l"].to_numpy(),
                    sub["c"].to_numpy(), sub["t"].to_numpy(),
                )
            )
        return calls


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
    ):
        config.validate()
        self.input_dir = input_dir
        self.output_dir = output_dir
        self.cfg = config
        self.page_filter = page_filter
        self.host_metadata = host_metadata
        self.sink = EpochSink(output_dir)
        self.metrics = MetricsRegistry()

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
        k = cfg.state_shards
        actors = [
            StateShard.remote(i, cfg.dedup_window_s * US,
                              cfg.windows.session_gap_s * US)
            for i in range(k)
        ]
        watermark = WatermarkTracker(cfg.allowed_lateness_s * US)

        plan = self.epoch_plan()
        start_epoch = 0
        if resume:
            committed = self.sink.committed_epochs()
            if committed:
                last = committed[-1]
                self._restore(actors, watermark, last)
                start_epoch = last + 1

        for epoch in range(start_epoch, len(plan)):
            self._run_epoch(epoch, plan[epoch], actors, watermark)

        if drain:
            self._drain_epoch(len(plan), actors, watermark)

        summary = {
            "epochs": self.sink.committed_epochs(),
            "watermark_us": watermark.watermark_us,
            "metrics": self.metrics.to_dict(),
        }
        return summary

    def _run_epoch(self, epoch, files, actors, watermark) -> None:
        import ray.data as rd

        cfg = self.cfg
        stage = self.sink.stage_dir(epoch)
        wm_before = watermark.watermark_us

        # prune at the read: the stored `text` column is the generator's
        # oracle — the engine recomputes extraction from `html`
        ds = rd.read_parquet(files, columns=["url", "warc_ts", "html", "lang"])
        ds = ds.map_batches(
            ExtractEnrich,
            fn_constructor_kwargs={
                "page_filter": self.page_filter,
                "watermark_us": wm_before,
            },
            batch_format="pyarrow",
            batch_size=cfg.read_batch_size,
            # autoscaling pool: shrinks to 1 actor when CPUs are scarce so
            # small sessions never deadlock on pre-allocated pools
            concurrency=(1, cfg.extract_concurrency),
            num_cpus=1,
        )
        if self.host_metadata is not None:
            from ..stages.join import broadcast_asof_join

            ds = broadcast_asof_join(
                ds, self.host_metadata, on="host", ts_col="warc_ts",
                defaults={"category": "unknown", "weight": 0.0},
                concurrency=(1, cfg.join_concurrency), batch_size=cfg.batch_size,
            )

        def add_shard(df: pd.DataFrame) -> pd.DataFrame:
            df["_shard"] = shard_of(df["url"].to_numpy(), cfg.state_shards)
            return df

        finalizer = ShardFinalize(actors, epoch, stage, cfg, cfg.state_shards)

        def finalize_shard(g: pd.DataFrame) -> pd.DataFrame:
            return finalizer(g)

        stats = (
            ds.map_batches(add_shard, batch_format="pandas",
                           batch_size=cfg.batch_size)
            .groupby("_shard")
            .map_groups(finalize_shard, batch_format="pandas")
            .to_pandas()
        )

        counters = {
            c: int(stats[c].sum())
            for c in ("rows_read", "parse_errors", "rows_filtered_out",
                      "late_dropped", "rows_deduped", "rows_written")
        }
        max_ts = int(stats["max_ts_us"].max()) if len(stats) else NEG_INF_TS
        watermark.observe(max_ts)
        self._close_and_commit(epoch, actors, watermark, counters)

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
            + 1
        ) * US
        watermark.observe(watermark.max_event_ts_us + cfg.allowed_lateness_s * US
                          + margin_us)
        self._close_and_commit(epoch, actors, watermark, {}, drain=True)

    def _close_and_commit(self, epoch, actors, watermark, counters,
                          drain=False) -> None:
        wm = watermark.watermark_us
        closed = ray.get([a.close.remote(wm) for a in actors])
        window_rows: list = []
        session_rows: list = []
        for cw, cs, _ in closed:
            window_rows.extend(cw)
            session_rows.extend(cs)
        window_rows.sort()
        session_rows.sort()

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

        counters = dict(counters)
        counters["windows_emitted"] = sum(
            t.num_rows for n, t in tables.items() if n != "session_host"
        ) + tables["session_host"].num_rows

        snaps = ray.get([a.snapshot.remote() for a in actors])
        blob = pickle.dumps(
            {"shards": snaps, "watermark": watermark.snapshot()}, protocol=4
        )
        self.metrics.merge_counts(counters)
        self.sink.commit_epoch(
            epoch,
            tables=tables,
            watermark_us=wm,
            counters=counters,
            blobs={"state.pkl": blob},
            extra={"drain": drain},
        )

    def _restore(self, actors, watermark, last_epoch) -> None:
        path = os.path.join(self.sink.epoch_dir(last_epoch), "state.pkl")
        with open(path, "rb") as f:
            snap = pickle.load(f)
        ray.get([
            a.restore.remote(s) for a, s in zip(actors, snap["shards"])
        ])
        restored = WatermarkTracker.restore(snap["watermark"])
        watermark.allowed_lateness_us = restored.allowed_lateness_us
        watermark.max_event_ts_us = restored.max_event_ts_us
