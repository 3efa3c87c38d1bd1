"""Single-process oracle for the streaming pipeline.

Replays the exact determinism contract of ``StreamingPagesPipeline``
(same epoch plan, same watermark schedule, same per-key ordering) with
plain pandas and the in-process state stores — no Ray. Golden tests
compare the distributed engine's committed outputs against this, which
pins down the orchestration (shuffles, actor routing, partial pushes,
commit protocol) rather than the state-store math (unit-tested
separately).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..functions.compression import decompress_safe
from ..functions.extract import html_to_text
from ..functions.filters import PageFilter
from ..sources.pages import pages_files
from ..state.store import (DedupState, FunnelState, IntervalJoinState,
                           SessionState, TopKState,
                           WindowState)
from ..state.watermark import PartitionedWatermarkTracker, WatermarkTracker
from ..stages.timeops import NEG_INF_TS, US, series_ts_us


def run_oracle(
    input_dir: str,
    config: EngineConfig = EngineConfig(),
    page_filter: PageFilter | None = None,
    host_metadata: pd.DataFrame | None = None,
    metadata_slices: dict[int, pd.DataFrame] | None = None,
) -> dict:
    """Returns dict with keys ``pages`` (surviving rows, per-epoch order),
    ``tumbling_lang`` / ``sliding_lang`` / ``session_host`` (window rows
    tagged with the committing epoch) and ``counters``."""
    cfg = config
    files = pages_files(input_dir)
    slices: dict[int, list[str]] = {}
    for f in files:
        s = int(os.path.basename(f).split("-")[1])
        slices.setdefault(s, []).append(f)
    ordered = [slices[s] for s in sorted(slices)]
    fpe = cfg.files_per_epoch
    plan = [sum(ordered[i:i + fpe], []) for i in range(0, len(ordered), fpe)]

    dedup = DedupState(cfg.dedup_window_s * US)
    upd_horizon_us = cfg.update_horizon_s * US if cfg.update_mode else 0
    windows = WindowState(upd_horizon_us)
    sessions = SessionState(cfg.windows.session_gap_s * US,
                            upd_horizon_us)
    funnel = (FunnelState(cfg.funnel.n_stages, cfg.funnel.within_s * US,
                          veto_stage=cfg.funnel.veto_stage,
                          emit_timeouts=cfg.funnel.emit_timeouts)
              if cfg.funnel.enabled else None)
    topk = (TopKState(cfg.topk_hosts, cfg.topk_max_keys)
            if cfg.topk_hosts > 0 else None)
    intervals = (IntervalJoinState(cfg.interval_join_s * US)
                 if cfg.interval_join_s > 0 else None)
    watermark = (PartitionedWatermarkTracker(cfg.allowed_lateness_s * US)
                 if cfg.per_partition_watermark
                 else WatermarkTracker(cfg.allowed_lateness_s * US))

    metadata_slices = metadata_slices or {}
    if metadata_slices and host_metadata is None:
        host_metadata = next(iter(metadata_slices.values())).iloc[0:0]
    meta_acc = host_metadata
    meta = None

    def prep(acc: pd.DataFrame) -> pd.DataFrame:
        m = acc.copy()
        m["_v_us"] = series_ts_us(m["updated_ts"])
        # merge_asof requires the right on-key globally sorted, even with by=
        return m.sort_values(["_v_us", "host"], kind="mergesort")

    if meta_acc is not None:
        meta = prep(meta_acc)

    pages_out = []
    win_rows, sess_rows, fun_rows, topk_rows = [], [], [], []
    funto_rows: list[tuple] = []
    interval_rows: list[tuple] = []
    quarantine_rows: list[tuple] = []
    counters = {
        "rows_read": 0, "parse_errors": 0, "rows_filtered_out": 0,
        "late_dropped": 0, "rows_deduped": 0, "rows_written": 0,
    }
    upd_rows: list[tuple] = []
    sess_upd_rows: list[tuple] = []
    early_rows: list[tuple] = []
    sess_early_rows: list[tuple] = []
    if cfg.update_mode:
        counters["late_accepted"] = 0
    if funnel is not None:
        counters["funnels_matched"] = 0
        if cfg.funnel.emit_timeouts:
            counters["funnels_timed_out"] = 0
        if cfg.funnel.veto_min_len is not None:
            counters["funnels_vetoed"] = 0

    def close(epoch: int) -> None:
        wm = watermark.watermark_us
        for r in windows.close(wm):
            win_rows.append((epoch, *r))
        for r in windows.pop_updates(wm):
            upd_rows.append((epoch, *r))
        if cfg.early_fire:
            for r in windows.preview():
                early_rows.append((epoch, *r))
        for r in sessions.close(wm):
            sess_rows.append((epoch, *r))
        for r in sessions.pop_updates(wm):
            sess_upd_rows.append((epoch, *r))
        if cfg.early_fire:
            # preview AFTER the close, like windows (and StateShard):
            # only sessions still open leave a speculative row
            for r in sessions.preview():
                sess_early_rows.append((epoch, *r))
        if funnel is not None:
            for r in funnel.close(wm):
                fun_rows.append((epoch, *r))
                counters["funnels_matched"] += 1
            for r in funnel.pop_timeouts():
                funto_rows.append((epoch, *r))
            if cfg.funnel.emit_timeouts:
                counters["funnels_timed_out"] = len(funto_rows)
            if cfg.funnel.veto_min_len is not None:
                counters["funnels_vetoed"] = funnel.vetoes
        if intervals is not None:
            for r in intervals.close(wm):
                interval_rows.append((epoch, *r))
        if topk is not None:
            for rank, (host, c) in enumerate(topk.top(), start=1):
                topk_rows.append((epoch, rank, host, c))
        dedup.evict(wm)

    for epoch, epoch_files in enumerate(plan):
        sl = metadata_slices.get(epoch)
        if sl is not None and len(sl):
            meta_acc = (sl.copy() if meta_acc is None
                        else pd.concat([meta_acc, sl], ignore_index=True))
            meta = prep(meta_acc)
        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in epoch_files],
            ignore_index=True,
        )
        counters["rows_read"] += len(df)
        wm_before = watermark.watermark_us

        df["text"] = [
            html_to_text(decompress_safe(h) if h else h) for h in df["html"]
        ]
        df = df.drop(columns=["html"])
        df["host"] = [
            u.partition("://")[2].split("/", 1)[0] if "://" in u else ""
            for u in df["url"]
        ]
        df["text_len"] = df["text"].str.len().astype("int64")
        df["_ts_us"] = series_ts_us(df["warc_ts"])

        parse_err = df["text"].eq("")
        counters["parse_errors"] += int(parse_err.sum())
        for _, r in df[parse_err].iterrows():
            quarantine_rows.append(
                (epoch, r["url"], r["warc_ts"], "parse_error"))
        df = df[~parse_err]
        late = df["_ts_us"] < wm_before - upd_horizon_us
        counters["late_dropped"] += int(late.sum())
        df = df[~late]
        if cfg.update_mode:
            # rows behind the frozen watermark but within the horizon are
            # accepted as corrections (mirrors ExtractEnrich); the flag
            # rides as a column so downstream row filters keep it aligned
            df = df.assign(_upd=(df["_ts_us"] < wm_before).astype(np.int8))
        if page_filter is not None and len(df):
            import pyarrow as pa

            keep = np.asarray(
                page_filter.mask(
                    pa.Table.from_pandas(df.drop(columns=["_ts_us"]),
                                         preserve_index=False)
                ).to_pandas(),
                dtype=bool,
            )
            counters["rows_filtered_out"] += int((~keep).sum())
            df = df[keep]
        if cfg.update_mode:
            # engine counts accepted-late on post-filter OK rows
            # (ExtractEnrich zeroes _upd where status != OK)
            counters["late_accepted"] += int(df["_upd"].sum())

        if cfg.per_partition_watermark:
            # footer-stat maxes per key-shard stream (mirrors the
            # engine's plan-time metastore scan; min-combine in tracker)
            from ..sources.pages import file_event_maxes
            for pid, mx in file_event_maxes(epoch_files):
                watermark.observe_partition(pid, mx)
        if len(df):
            # watermark advances on OK rows (post parse/late/filter, pre-dedup),
            # matching ShardFinalize's max_ts_us
            if not cfg.per_partition_watermark:
                watermark.observe(int(df["_ts_us"].max()))
            df = df.sort_values(["url", "_ts_us"], kind="mergesort")
            keep = dedup.process(df["url"].tolist(), df["_ts_us"].to_numpy())
            counters["rows_deduped"] += int((~keep).sum())
            df = df.loc[keep]

        if meta is not None and len(df):
            order = np.arange(len(df))
            left = df.assign(_order=order).sort_values("_ts_us", kind="mergesort")
            joined = pd.merge_asof(
                left, meta.drop(columns=["updated_ts"]),
                left_on="_ts_us", right_on="_v_us", by="host",
                direction="backward",
            ).sort_values("_order", kind="mergesort")
            joined["category"] = joined["category"].fillna("unknown")
            joined["weight"] = joined["weight"].fillna(0.0)
            df = joined.drop(columns=["_order", "_v_us"])

        if len(df):
            lens = df["text_len"].to_numpy(dtype=np.float64)
            ts = df["_ts_us"].to_numpy()
            tum = cfg.windows.tumbling_size_s * US
            _add_window(windows, "tumbling:lang", df["lang"].fillna(""), ts,
                        lens, tum, tum)
            sld = cfg.windows.sliding_size_s * US
            slide = cfg.windows.sliding_slide_s * US
            _add_window(windows, "sliding:lang", df["lang"].fillna(""), ts,
                        lens, sld, slide)
            sessions.add(df["host"].tolist(), ts, lens)
            if intervals is not None:
                # interval self-join feed mirrors _partials: survivors,
                # correction rows excluded, empty hosts dropped
                idf = (df[df["_upd"] == 0] if cfg.update_mode else df)
                idf = idf[idf["host"] != ""]
                if len(idf):
                    intervals.add(idf["host"].tolist(),
                                  idf["url"].tolist(),
                                  idf["_ts_us"].to_numpy())
            if topk is not None:
                vc = df["host"].fillna("").value_counts()
                topk.add(vc.index.tolist(), vc.to_numpy())
            if funnel is not None:
                # order-sensitive CEP state ignores accepted-late
                # corrections (mirrors StateShard._partials' otbl)
                fdf = (df[df["_upd"] == 0] if cfg.update_mode else df)
                stages = np.searchsorted(
                    np.asarray(cfg.funnel.stage_bounds, dtype=np.int64),
                    fdf["text_len"].to_numpy(), side="right",
                ).astype(np.int64)
                funnel.add(fdf["host"].fillna("").tolist(), stages,
                           fdf["_ts_us"].to_numpy())
            counters["rows_written"] += len(df)
            drop = ["_ts_us"] + (["_upd"] if cfg.update_mode else [])
            pages_out.append(
                df.drop(columns=drop).assign(_epoch=epoch)
            )

        close(epoch)

    # drain (must mirror StreamingPagesPipeline._drain_epoch)
    margin_us = (
        cfg.allowed_lateness_s + cfg.windows.tumbling_size_s
        + cfg.windows.sliding_size_s + cfg.windows.session_gap_s
        + (cfg.funnel.within_s if cfg.funnel.enabled else 0) + 1
    ) * US
    watermark.observe(
        watermark.drain_base_us + cfg.allowed_lateness_s * US + margin_us
    )
    close(len(plan))

    return {
        "pages": pd.concat(pages_out, ignore_index=True)
        if pages_out else pd.DataFrame(),
        "windows": win_rows,
        "window_updates": upd_rows,
        "session_updates": sess_upd_rows,
        "window_early": early_rows,
        "session_early": sess_early_rows,
        "sessions": sess_rows,
        "funnels": fun_rows,
        "funnel_timeouts": funto_rows,
        "copage_pairs": interval_rows,
        "topk": topk_rows,
        "quarantine": quarantine_rows,
        "counters": counters,
    }


def _add_window(windows, kind, keys, ts, totals, size_us, slide_us):
    slide_start = (ts // slide_us) * slide_us
    df = pd.DataFrame({"k": keys.to_numpy(), "s": slide_start, "v": totals})
    part = df.groupby(["k", "s"], sort=True).agg(
        c=("v", "size"), t=("v", "sum")
    ).reset_index()
    for i in range(int(size_us // slide_us)):
        windows.add_partials(
            kind,
            part["k"].tolist(),
            part["s"].to_numpy() - i * slide_us,
            part["s"].to_numpy() - i * slide_us + size_us,
            part["c"].to_numpy(),
            part["t"].to_numpy(),
        )
